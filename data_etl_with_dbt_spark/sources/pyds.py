"""Spark 4 Python Data Source API: a deterministic synthetic-corpus
generator source ("synthetic_docs") with batch + streaming readers.

Why a generator source in an analytics engine: scale testing. The engine's
operators are designed for 100 TB corpora, but fixtures are small — a
partitioned, splittable source that materializes an arbitrary number of
documents deterministically from a seed (no storage, no driver memory)
lets any operator be load-tested at any scale with
``spark.read.format("synthetic_docs").option("rows", 10**9)``. It also
exercises the engine's newest extension surface: custom sources written in
Python against ``pyspark.sql.datasource`` (Spark 4's Python Data Source
API) plug into Catalyst like any DSv2 source — partition planning and
exactly-once streaming offsets included.

Design:
* Every row is a pure function of ``(seed, doc_id)`` — generation order,
  partitioning, and batch boundaries cannot change content. That is what
  makes the streaming reader's ``readBetweenOffsets`` replay (exactly-once
  recovery contract) trivially correct.
* NO ``pushFilters``, deliberately. Spark 4.1's Python-source planning
  caches the planned partitions per load() relation and a filtered
  query's pushdown OVERWRITES that shared cache: after
  ``df.where("doc_id >= 450").count()`` on a 500-row source, a plain
  ``df.count()`` on the SAME DataFrame returned 50 (measured here;
  ``partitions()`` was never re-invoked for the filterless query). Any
  result-changing pushdown is therefore unsafe for reused DataFrames, so
  this reader plans the full range and lets Spark filter post-scan —
  ``tests/test_pyds.py`` pins the interleaved-query correctness that the
  pushdown variant violated.
* The schema matches the ``documents`` fixture table, so every corpus
  operator in the engine runs on this source unchanged.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_VOCAB = (
    "the a value table row key part line sort merge batch stream window "
    "join filter scan agg group order query data column hash fast slow "
    "small big customer spark vector"
).split()
_LANGS = ["en", "en", "en", "es", "zh", "de"]


def _doc_row(doc_id: int, seed: int, min_words: int, max_words: int) -> tuple:
    rng = random.Random((seed << 32) ^ doc_id)
    n = rng.randint(min_words, max_words)
    text = " ".join(rng.choice(_VOCAB) for _ in range(n))
    return (
        doc_id,
        text,
        rng.choice(_LANGS),
        f"src{rng.randrange(8)}",
        len(text),
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))
        self.min_words = int(options.get("min_words", 10))
        self.max_words = int(options.get("max_words", 80))

    def partitions(self) -> list[InputPartition]:
        lo, hi = 0, self.rows
        total = hi - lo
        per = max(1, -(-total // self.parts))  # ceil; >=1 so ranges advance
        bounds = list(range(lo, hi, per)) + [hi]
        if total == 0:
            return [_Range(lo, lo)]
        return [_Range(s, e) for s, e in zip(bounds, bounds[1:])]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(doc_id, self.seed, self.min_words, self.max_words)


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch generator: each batch is the next ``rows_per_batch``
    doc_ids. Offsets are doc_id watermarks, so ``readBetweenOffsets``
    replays any committed batch bit-identically (rows are functions of
    ``(seed, doc_id)`` alone) — the exactly-once recovery contract."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.min_words = int(options.get("min_words", 10))
        self.max_words = int(options.get("max_words", 80))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # a LIST, not a generator: the simple-stream harness prefetches the
        # batch on the driver and pickles it for replay — generators can't
        # pickle (TypeError at planPartitions)
        return [
            _doc_row(doc_id, self.seed, self.min_words, self.max_words)
            for doc_id in range(start, end)
        ]

    def read(self, start: dict):
        s = int(start["next"])
        e = s + self.rows_per_batch
        return iter(self._rows(s, e)), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows(int(start["next"]), int(end["next"])))


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticCorpusStreamReader:
        return SyntheticCorpusStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Register the source on a session. Ships this module by value so the
    executor Python workers need no importable package on their path (the
    same self-containment trick as the multimodal decoders)."""
    import sys

    from pyspark.cloudpickle import register_pickle_by_value

    register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SyntheticCorpusDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


@dataclass
class _ShardCommit(WriterCommitMessage):
    path: str
    rows: int


class JsonlSinkWriter(DataSourceWriter):
    """Task-side JSONL shard writer with a driver-side commit manifest.

    The two-phase contract the Python Data Source write API exists for:
    each task writes a UNIQUELY-NAMED temp shard and returns a commit
    message; only the driver's ``commit`` publishes the manifest naming the
    shards that belong to the table (task retries/speculative duplicates
    write orphan files but are never referenced — the same
    publish-by-manifest idea transactional table formats use). ``abort``
    removes every written shard.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a path option")
        self.overwrite = overwrite

    def write(self, iterator) -> _ShardCommit:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        # attempt-unique name: a retried task never clobbers another attempt
        shard = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(shard, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(path=shard, rows=n)

    def commit(self, messages) -> None:
        """Publish the manifest honoring the save MODE: 'append' merges
        this job's shards into the existing manifest (previously they
        REPLACED it, silently dropping every earlier shard from any
        manifest-driven reader); 'overwrite' unlinks the superseded
        shard files so a directory-globbing reader can't see old+new
        mixed."""
        import json
        import os

        shards = [
            {"path": os.path.basename(m.path), "rows": m.rows}
            for m in messages
            if m is not None
        ]
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        prior = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                prior = json.load(fh).get("shards", [])
        if self.overwrite:
            new_names = {s["path"] for s in shards}
            for s in prior:
                old = os.path.join(self.path, s["path"])
                if s["path"] not in new_names and os.path.exists(old):
                    os.remove(old)
        else:
            shards = prior + shards
        manifest = {
            "shards": sorted(shards, key=lambda s: s["path"]),
            "total_rows": sum(s["rows"] for s in shards),
        }
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=2)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    """Batch write target: ``df.write.format("jsonl_sink").option("path",
    d).mode("append").save()`` — JSONL shards + a commit manifest."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)
