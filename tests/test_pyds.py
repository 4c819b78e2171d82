"""Spark 4 Python Data Source: the synthetic corpus generator source —
batch read determinism, partition planning, interleaved filtered/
unfiltered correctness (the reason the source has NO pushFilters: Spark
4.1 caches planned partitions per relation and pushdown overwrites the
shared cache — see the module docstring), and the streaming reader's
exactly-once replay contract."""

from __future__ import annotations

import pytest

from data_etl_with_dbt_spark.sources.pyds import (
    SyntheticCorpusReader,
    SyntheticCorpusStreamReader,
    register_synthetic_source,
)


@pytest.fixture(scope="module")
def registered(spark):
    register_synthetic_source(spark)
    return spark


class TestBatchSource:
    def test_read_rows_partitions_schema(self, registered):
        df = (
            registered.read.format("synthetic_docs")
            .option("rows", 300)
            .option("partitions", 5)
            .load()
        )
        assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        assert df.count() == 300
        assert df.rdd.getNumPartitions() == 5
        assert df.select("doc_id").distinct().count() == 300

    def test_deterministic_across_reads(self, registered):
        def snap():
            return sorted(
                map(
                    tuple,
                    registered.read.format("synthetic_docs")
                    .option("rows", 50)
                    .option("seed", 7)
                    .load()
                    .collect(),
                )
            )

        assert snap() == snap()

    def test_seed_changes_content_not_ids(self, registered):
        a = registered.read.format("synthetic_docs").option("rows", 20).option("seed", 1).load()
        b = registered.read.format("synthetic_docs").option("rows", 20).option("seed", 2).load()
        assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
        assert sorted(r.text for r in a.collect()) != sorted(r.text for r in b.collect())

    def test_interleaved_filtered_and_unfiltered_queries(self, registered):
        """Regression pin for the measured Spark 4.1 partition-cache leak:
        with pushFilters implemented, the filtered query's narrowed
        partitions were reused by the NEXT unfiltered count on the same
        DataFrame (returned 50, not 500). Without pushdown, every
        interleaving must be exact."""
        df = (
            registered.read.format("synthetic_docs")
            .option("rows", 500)
            .option("partitions", 4)
            .load()
        )
        assert df.count() == 500
        assert df.where("doc_id >= 450").count() == 50
        assert df.count() == 500  # the leak made this 50
        assert df.where("doc_id = 5").count() == 1
        assert df.where("doc_id < 0").count() == 0
        assert df.count() == 500


class TestReaderPlanning:
    def test_partitions_tile_the_row_range(self):
        r = SyntheticCorpusReader({"rows": "100", "partitions": "4"})
        spans = [(p.start, p.end) for p in r.partitions()]
        assert spans == sorted(spans)
        assert spans[0][0] == 0 and spans[-1][1] == 100
        assert sum(e - s for s, e in spans) == 100

    def test_more_partitions_than_rows(self):
        r = SyntheticCorpusReader({"rows": "3", "partitions": "8"})
        spans = [(p.start, p.end) for p in r.partitions()]
        assert sum(e - s for s, e in spans) == 3
        assert all(e > s for s, e in spans)


class TestStreamingSource:
    def test_offsets_and_replay_are_deterministic(self):
        r = SyntheticCorpusStreamReader({"rows_per_batch": "25", "seed": "3"})
        assert r.initialOffset() == {"next": 0}
        rows1, off1 = r.read({"next": 0})
        rows1 = list(rows1)
        assert off1 == {"next": 25} and len(rows1) == 25
        # exactly-once recovery: replaying the committed range is identical
        assert list(r.readBetweenOffsets({"next": 0}, {"next": 25})) == rows1
        rows2, off2 = r.read(off1)
        assert off2 == {"next": 50}
        assert [t[0] for t in rows2] == list(range(25, 50))

    def test_stream_end_to_end_one_batch(self, registered, tmp_path):
        q = (
            registered.readStream.format("synthetic_docs")
            .option("rows_per_batch", 40)
            .load()
            .writeStream.format("memory")
            .queryName("synth_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = registered.sql("SELECT count(*) AS n FROM synth_stream").first().n
        assert got >= 40 and got % 40 == 0


class TestJsonlSink:
    def test_write_shards_and_manifest(self, registered, tmp_path):
        import json
        import os

        out = str(tmp_path / "sink")
        df = (
            registered.read.format("synthetic_docs")
            .option("rows", 200)
            .option("partitions", 4)
            .load()
        )
        df.write.format("jsonl_sink").option("path", out).mode("append").save()
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest["total_rows"] == 200
        assert len(manifest["shards"]) == 4
        # manifest-listed shards reassemble the exact rows
        seen = []
        for s in manifest["shards"]:
            with open(os.path.join(out, s["path"])) as fh:
                lines = [json.loads(l) for l in fh]
            assert len(lines) == s["rows"]
            seen.extend(lines)
        assert sorted(r["doc_id"] for r in seen) == list(range(200))

    def test_requires_path(self, registered, tmp_path):
        df = registered.read.format("synthetic_docs").option("rows", 5).load()
        with pytest.raises(Exception, match="path"):
            df.write.format("jsonl_sink").mode("append").save()


class TestJsonlSinkModes:
    """Round-5 review: the sink's commit used to rewrite the manifest with
    only the current job's shards — append dropped every prior shard from
    manifest-driven readers, and overwrite left stale files for globbers."""

    @staticmethod
    def _manifest(path):
        import json
        import os

        with open(os.path.join(path, "_MANIFEST.json")) as fh:
            return json.load(fh)

    def test_append_merges_manifest(self, spark, tmp_path):
        import glob

        from data_etl_with_dbt_spark.sources.pyds import register_synthetic_source

        register_synthetic_source(spark)
        path = str(tmp_path / "sink")
        spark.range(3).write.format("jsonl_sink").option("path", path).mode(
            "append"
        ).save()
        spark.range(3, 5).write.format("jsonl_sink").option("path", path).mode(
            "append"
        ).save()
        m = self._manifest(path)
        assert m["total_rows"] == 5
        listed = {s["path"] for s in m["shards"]}
        on_disk = {p.split("/")[-1] for p in glob.glob(f"{path}/part-*.jsonl")}
        assert listed == on_disk  # every committed shard stays referenced

    def test_overwrite_replaces_manifest_and_removes_stale_shards(
        self, spark, tmp_path
    ):
        import glob

        from data_etl_with_dbt_spark.sources.pyds import register_synthetic_source

        register_synthetic_source(spark)
        path = str(tmp_path / "sink2")
        spark.range(10).write.format("jsonl_sink").option("path", path).mode(
            "append"
        ).save()
        spark.range(2).write.format("jsonl_sink").option("path", path).mode(
            "overwrite"
        ).save()
        m = self._manifest(path)
        assert m["total_rows"] == 2
        on_disk = {p.split("/")[-1] for p in glob.glob(f"{path}/part-*.jsonl")}
        assert on_disk == {s["path"] for s in m["shards"]}  # no stale files
