"""dbt-style model DAG: registry, ref()/source() resolution, topological run.

The reference's transformation layer is a dbt project: named SELECT models
materialized as tables, with dependencies declared via ``{{ ref(...) }}`` /
``{{ source(...) }}`` (reference ``models/raw_texi.sql:3-6``,
``models/core_texi.sql:2-5,52``, ``dbt_project.yml:14``). dbt parses Jinja,
topo-sorts the manifest, and ships ``CREATE TABLE AS`` per node to Postgres
(SURVEY.md §3.1).

Spark-first re-architecture: a model is a Python function
``(ctx) -> DataFrame``; ``ref``/``source`` are method calls on the run context
(which also records DAG edges); materialization is a Parquet
``saveAsTable``/temp-view. Catalyst then owns parse→optimize→execute — there
is no SQL templating layer to maintain, and independent models could run
concurrently (the runner is sequential like dbt's single MainThread, but the
topo order makes parallel dispatch a drop-in change).
"""

from __future__ import annotations

import graphlib
import threading
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Dynamic partition overwrite is a SESSION conf: Spark ignores the
# per-writer .option("partitionOverwriteMode", ...) for v1 insertInto
# (verified on 4.1 — the option form wiped untouched partitions). Under
# run(threads>1) an unguarded save/set/restore races: writer B can read
# A's temporary DYNAMIC as its "previous" value, or run its own overwrite
# after A restored STATIC — a STATIC insertInto REPLACES THE WHOLE TABLE,
# losing every untouched partition. All conf-sensitive writes in this
# repo go through _insert_overwrite_dynamic, so holding this one lock
# across set -> write -> restore removes the race; only simultaneous
# dynamic overwrites serialize, everything else stays parallel.
_DYNAMIC_OVERWRITE_LOCK = threading.Lock()


def _insert_overwrite_dynamic(
    spark: SparkSession, df: DataFrame, table: str
) -> None:
    """Replace exactly ``df``'s partitions of ``table`` (dynamic partition
    overwrite), thread-safe. insertInto matches by POSITION and wants
    partition columns last — align to the table's physical column order."""
    aligned = df.select(*spark.table(table).columns)
    with _DYNAMIC_OVERWRITE_LOCK:
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "STATIC"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
        try:
            aligned.write.mode("overwrite").insertInto(table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


@dataclass
class ModelSpec:
    name: str
    fn: Callable[["RunContext"], DataFrame]
    materialized: str = "view"  # 'table' | 'view' | 'ephemeral' | 'incremental'
    unique_key: str | None = None
    description: str = ""
    tests: list = field(default_factory=list)  # (test_fn, column, kwargs)
    # incremental only: 'append' (new keys only), 'merge' (key upsert),
    # 'insert_overwrite' (replace touched partitions; needs partition_by),
    # 'additive' (rollup maintenance: sum measure columns per key)
    incremental_strategy: str = "append"
    partition_by: list[str] | None = None
    # additive only: measure columns summed during the merge
    additive_cols: list[str] | None = None
    # incremental only: what to do when the fresh build's columns differ from
    # the existing table's (dbt on_schema_change): 'ignore' (project onto the
    # table schema, missing columns null), 'fail', 'append_new_columns',
    # 'sync_all_columns'
    on_schema_change: str = "ignore"
    # dbt model contract (contract: enforced): {column: spark type string}.
    # Enforced BEFORE materialization — a drifting model fails the build,
    # never the downstream consumers.
    contract: dict | None = None
    # dbt tags: selectable labels (``dbt run --select tag:nightly``).
    tags: list[str] = field(default_factory=list)


def _enforce_contract(df: DataFrame, spec: "ModelSpec") -> None:
    """dbt model contract (``contract: enforced``): the built frame must
    carry EXACTLY the declared columns with the declared Spark types.
    Checked on the unexecuted plan's schema — no data moves — and BEFORE
    materialization, so a drifting model fails its own build instead of
    breaking every downstream consumer at read time. Raises with the full
    diff (missing / unexpected / mistyped)."""
    declared = {k: v.lower().strip() for k, v in spec.contract.items()}
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = sorted(set(declared) - set(actual))
    unexpected = sorted(set(actual) - set(declared))
    mistyped = sorted(
        f"{c}: declared {declared[c]}, got {actual[c]}"
        for c in set(declared) & set(actual)
        if declared[c] != actual[c]
    )
    if missing or unexpected or mistyped:
        raise ValueError(
            f"model '{spec.name}' violates its contract: "
            f"missing={missing} unexpected={unexpected} mistyped={mistyped}"
        )


class RunContext:
    """Passed to each model function; resolves refs and records DAG edges.

    During a microbatch run (``ModelRegistry.run_microbatch``)
    ``batch_start``/``batch_end`` carry the current event-time window —
    the model filters its sources to ``[batch_start, batch_end)`` (the
    explicit form of dbt microbatch's automatic event_time filtering).
    Outside microbatch runs both are None."""

    def __init__(
        self,
        registry: "ModelRegistry",
        spark: SparkSession,
        current: str,
        batch_start=None,
        batch_end=None,
    ):
        self._registry = registry
        self.spark = spark
        self._current = current
        self.batch_start = batch_start
        self.batch_end = batch_end

    def source(self, name: str) -> DataFrame:
        """Resolve a declared external source (reference `source()` macro)."""
        return self._registry.resolve_source(self.spark, name)

    def ref(self, name: str) -> DataFrame:
        """Resolve an upstream model (reference `ref()` macro). During a run
        the upstream is already materialized; edges were recorded at
        registration time via the `deps` argument."""
        return self._registry.materialized_df(self.spark, name)


class ModelRegistry:
    """Holds sources, models and their dependency edges; runs them in
    topological order and materializes each per its config."""

    def __init__(self):
        self._models: dict[str, ModelSpec] = {}
        self._deps: dict[str, set[str]] = {}
        self._sources: dict[str, Callable[[SparkSession], DataFrame] | str] = {}
        self._seeds: dict[str, tuple[str, object]] = {}
        self._cache: dict[str, DataFrame] = {}
        #: per-model one-pass write metrics from the latest run() —
        #: n_rows + nulls_<col>, observed on the write job itself
        self.run_metrics: dict[str, dict] = {}

    # -- registration -----------------------------------------------------
    def add_source(self, name: str, loader: Callable[[SparkSession], DataFrame] | str) -> None:
        """A source is a table name in the session catalog or a loader fn
        (e.g. a parquet/CSV path reader)."""
        self._sources[name] = loader

    def model(
        self,
        name: str | None = None,
        *,
        materialized: str = "view",
        unique_key: str | None = None,
        deps: list[str] | None = None,
        description: str = "",
        incremental_strategy: str = "append",
        partition_by: list[str] | None = None,
        on_schema_change: str = "ignore",
        additive_cols: list[str] | None = None,
        contract: dict | None = None,
        tags: list[str] | None = None,
    ):
        """Decorator registering a model function ``(ctx) -> DataFrame``."""

        def deco(fn: Callable[[RunContext], DataFrame]):
            mname = name or fn.__name__
            self._models[mname] = ModelSpec(
                name=mname,
                fn=fn,
                materialized=materialized,
                unique_key=unique_key,
                description=description or (fn.__doc__ or ""),
                incremental_strategy=incremental_strategy,
                partition_by=partition_by,
                on_schema_change=on_schema_change,
                additive_cols=additive_cols,
                contract=contract,
                tags=list(tags or []),
            )
            self._deps[mname] = set(deps or [])
            return fn

        return deco

    def add_seed(self, name: str, csv_path: str, schema=None) -> None:
        """Register a dbt-style seed: a small CSV materialized as a table at
        the START of every run (reference lookup data — mappings, rates,
        enum tables). Seeds load before any model, so models ref() them
        like any table; pass ``schema`` to skip the inference pass."""
        self._seeds[name] = (csv_path, schema)

    def add_test(self, model_name: str, test_fn, column: str, **kwargs) -> None:
        self._models[model_name].tests.append((test_fn, column, kwargs))

    # -- resolution --------------------------------------------------------
    def resolve_source(self, spark: SparkSession, name: str) -> DataFrame:
        loader = self._sources[name]
        if callable(loader):
            return loader(spark)
        return spark.table(loader)

    def materialized_df(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve a model/seed to its materialized relation.

        Resolution order matters: an un-cached TABLE-materialized model (or
        seed) must resolve through a catalog-qualified identifier, because a
        bare ``spark.table(name)`` lets any session temp view with the same
        name shadow the materialized table — in a shared session (notebook
        user ran ``createOrReplaceTempView``, or a slim-CI rebuild in a
        long-lived session) ``ref()`` would silently read the WRONG relation.
        Temp views cannot shadow a three-part ``catalog.db.table`` name, so
        qualifying restores the dbt contract that ``ref()`` is unambiguous.
        View-materialized models ARE temp views, so the bare lookup is the
        correct (and only) path for them.
        """
        if name in self._cache:
            return self._cache[name]
        spec = self._models.get(name)
        table_backed = name in self._seeds or (
            spec is not None and spec.materialized in ("table", "incremental")
        )
        if table_backed:
            cat = spark.catalog.currentCatalog()
            db = spark.catalog.currentDatabase()
            qualified = f"`{cat}`.`{db}`.`{name}`"
            if spark.catalog.tableExists(qualified):
                return spark.table(qualified)
        return spark.table(name)

    # -- execution ---------------------------------------------------------
    def topo_order(self) -> list[str]:
        ts = graphlib.TopologicalSorter(self._deps)
        return [n for n in ts.static_order() if n in self._models]

    # -- dbt node selection ------------------------------------------------
    def _ancestors_of(self, name: str, depth: int | None = None) -> set[str]:
        seen: set[str] = set()
        frontier = {name}
        hops = 0
        while frontier and (depth is None or hops < depth):
            frontier = {
                d for n in frontier for d in self._deps.get(n, ())
            } - seen
            seen |= frontier
            hops += 1
        return seen & set(self._models)

    def _descendants_of(self, name: str, depth: int | None = None) -> set[str]:
        children: dict[str, set[str]] = {}
        for child, parents in self._deps.items():
            for p in parents:
                children.setdefault(p, set()).add(child)
        seen: set[str] = set()
        frontier = {name}
        hops = 0
        while frontier and (depth is None or hops < depth):
            frontier = {
                c for n in frontier for c in children.get(n, ())
            } - seen
            seen |= frontier
            hops += 1
        return seen & set(self._models)

    def fingerprints(self) -> dict[str, str]:
        """Stable per-model definition fingerprints — the 'state' that
        dbt's slim-CI ``state:modified`` selector compares against. A
        fingerprint covers everything that changes what a model BUILDS:
        the function's compiled code (or the SQL text for sql_model),
        materialization config, contract, tags, and declared dependencies.
        Persist the dict as JSON alongside a deployment; a later session's
        ``select_nodes("state:modified+", state=old)`` rebuilds exactly
        the changed models and their descendants."""
        import hashlib

        out = {}
        for name, s in self._models.items():
            fn = s.fn
            sql_text = getattr(fn, "__sql__", None)
            if sql_text is not None:
                code_sig = sql_text
            else:
                # Normalize recursively instead of repr()ing raw values:
                # a nested lambda/def appears in co_consts as a code object
                # whose repr embeds a memory address and the absolute file
                # path — process- and checkout-dependent, so state:modified
                # would flag every model containing a lambda on every run.
                # Code objects hash by their STABLE fields (bytecode, names,
                # normalized consts); defaults and closure cells are NOT in
                # co_consts — a model parameterized via `def fn(ctx,
                # _t=threshold)` or a closure variable changes behavior
                # without changing bytecode, so both join the signature.
                # Functions reached through cells/defaults hash their
                # __code__ the same recursive way (a `seen` set breaks
                # self-referential closures).
                import types as _types

                def norm(v, seen):
                    if isinstance(v, _types.CodeType):
                        return norm_code(v, seen)
                    if isinstance(v, _types.FunctionType):
                        if id(v) in seen:
                            return "<recursive-fn>"
                        seen = seen | {id(v)}
                        return (
                            "fn",
                            norm_code(v.__code__, seen),
                            tuple(norm(d, seen) for d in (v.__defaults__ or ())),
                            tuple(
                                norm(_cell(c), seen)
                                for c in (v.__closure__ or ())
                            ),
                        )
                    if isinstance(v, tuple):
                        return tuple(norm(x, seen) for x in v)
                    if isinstance(v, frozenset):
                        return ("fs",) + tuple(
                            sorted(repr(norm(x, seen)) for x in v)
                        )
                    try:
                        return repr(v)
                    except Exception:
                        return f"<{type(v).__name__}>"

                def _cell(c):
                    try:
                        return c.cell_contents
                    except ValueError:  # empty cell
                        return "<empty-cell>"

                def norm_code(c, seen):
                    return (
                        "code",
                        c.co_code,
                        tuple(norm(k, seen) for k in c.co_consts),
                        c.co_names,
                        c.co_varnames,
                        c.co_freevars,
                        c.co_cellvars,
                        c.co_argcount,
                        c.co_flags,
                    )

                code_sig = repr(norm(fn, frozenset()))
            sig = repr(
                (
                    code_sig,
                    s.materialized,
                    s.unique_key,
                    s.incremental_strategy,
                    s.partition_by,
                    s.on_schema_change,
                    s.additive_cols,
                    s.contract,
                    sorted(s.tags),
                    sorted(self._deps.get(name, ())),
                )
            )
            out[name] = hashlib.md5(sig.encode()).hexdigest()
        return out

    def _match_atom(self, atom: str, state: dict | None = None) -> set[str]:
        """Resolve one selection atom to model names: ``tag:pat`` matches
        declared tags, anything else is an fnmatch pattern over names
        (``stg_*``). Patterns may match zero nodes (dbt warns; here the
        empty set just contributes nothing), but a LITERAL name that
        doesn't exist is an error — silent typos in a --select are how
        production models quietly stop building."""
        import fnmatch

        if atom.startswith("tag:"):
            pat = atom[4:]
            return {
                n
                for n, s in self._models.items()
                if any(fnmatch.fnmatchcase(t, pat) for t in s.tags)
            }
        if atom.startswith("config."):
            # dbt config method: config.materialized:incremental,
            # config.incremental_strategy:merge, ...
            key, _, want = atom[7:].partition(":")
            return {
                n
                for n, s in self._models.items()
                if str(getattr(s, key, None)) == want
            }
        if atom.startswith("state:"):
            # dbt slim CI: compare definitions to a saved fingerprint dict.
            if state is None:
                raise ValueError(
                    "state:* selectors need state= (a fingerprints() dict "
                    "from the comparison manifest)"
                )
            mode = atom[6:]
            current = self.fingerprints()
            if mode == "new":
                return {n for n in current if n not in state}
            if mode == "modified":
                return {n for n in current if current[n] != state.get(n)}
            raise ValueError(f"--select: unknown state method 'state:{mode}'")
        hits = set(fnmatch.filter(self._models.keys(), atom))
        if not hits and not any(ch in atom for ch in "*?["):
            raise KeyError(f"--select: no model named '{atom}'")
        return hits

    def _resolve_spec(self, spec: str, state: dict | None = None) -> set[str]:
        """One selection spec: dbt graph-operator grammar
        ``[N+]atom[+[N]]`` or ``@atom``. ``+model`` adds ancestors,
        ``model+`` descendants, a leading/trailing integer bounds the hop
        count (``1+model``), ``@model`` is the model, its descendants, and
        every ancestor of those descendants (dbt's build-everything-needed
        operator)."""
        import re

        m = re.fullmatch(r"(?:(\d*)(\+))?(@)?(.+?)(?:(\+)(\d*))?", spec)
        if not m or not m.group(4):
            raise ValueError(f"--select: cannot parse spec '{spec}'")
        up_n, up, at, atom, down, down_n = m.groups()
        if at and (up or down):
            raise ValueError(f"--select: '@' cannot combine with '+' in '{spec}'")
        base = self._match_atom(atom, state)
        out = set(base)
        if up:
            depth = int(up_n) if up_n else None
            for n in base:
                out |= self._ancestors_of(n, depth)
        if down:
            depth = int(down_n) if down_n else None
            for n in base:
                out |= self._descendants_of(n, depth)
        if at:
            desc = set(base)
            for n in base:
                desc |= self._descendants_of(n)
            out = set(desc)
            for n in desc:
                out |= self._ancestors_of(n)
        return out

    def select_nodes(
        self,
        select: str | list[str] | None = None,
        exclude: str | list[str] | None = None,
        state: dict | None = None,
    ) -> list[str]:
        """dbt node selection over the registered DAG, in topological order.

        ``select`` is dbt's ``--select`` surface: a string of
        whitespace-separated specs (union) where each spec may be a
        comma-separated intersection — ``"stg_* tag:nightly"`` is union,
        ``"tag:nightly,core+"`` is intersection. A list unions its items.
        ``exclude`` (dbt ``--exclude``) subtracts its selection afterwards.
        None selects every model."""

        def resolve(arg) -> set[str]:
            specs: list[str] = []
            for part in [arg] if isinstance(arg, str) else list(arg):
                specs.extend(part.split())
            picked: set[str] = set()
            for spec in specs:
                sets = [self._resolve_spec(s, state) for s in spec.split(",") if s]
                if sets:
                    inter = set.intersection(*sets)
                    picked |= inter
            return picked

        chosen = set(self._models) if select is None else resolve(select)
        if exclude is not None:
            chosen -= resolve(exclude)
        return [n for n in self.topo_order() if n in chosen]

    def run(
        self,
        spark: SparkSession,
        select: str | list[str] | None = None,
        threads: int = 1,
        exclude: str | list[str] | None = None,
        state: dict | None = None,
    ) -> dict[str, DataFrame]:
        """Materialize every model in dependency order.

        'table' → Parquet ``saveAsTable`` overwrite (the reference's
        full-refresh CTAS, ``raw_texi.sql:3``); 'view' → session temp view;
        'ephemeral' → kept only in the run cache (Catalyst inlines it into
        downstream plans, mirroring dbt ephemeral CTE inlining);
        'incremental' → append only rows whose ``unique_key`` isn't already
        present (dbt incremental with the append+dedupe strategy) — first
        run behaves like 'table'.

        Every 'table' materialization observes its own write
        (``plans/observe.observed_write``): row count + per-column null
        tallies ride the write job — free at 100 TB — and land in
        ``self.run_metrics[name]`` for the monitor / DQ triage.

        ``threads`` is dbt's ``threads:`` knob: with ``threads > 1``,
        models whose dependencies are complete dispatch CONCURRENTLY —
        Spark's scheduler interleaves the independent jobs (FAIR/FIFO per
        session), which matters exactly when a DAG has wide independent
        branches of small-to-medium models where per-job overhead, not
        data, bounds wall time (measured on PQ codebooks: near-linear).
        Results, caches, and run_metrics are identical to the sequential
        run (asserted in tests); dependency order is enforced by a
        TopologicalSorter wave schedule, not timing."""
        out: dict[str, DataFrame] = {}
        for seed_name, (csv_path, schema) in self._seeds.items():
            from data_etl_with_dbt_spark.sources.io import read_csv, write_table

            seed_df = read_csv(spark, csv_path, schema=schema)
            write_table(seed_df, seed_name, mode="overwrite")
            self._cache[seed_name] = spark.table(seed_name)
            out[seed_name] = self._cache[seed_name]
        # dbt node selection (``--select``/``--exclude`` grammar: graph
        # operators +model/model+/@model, tag:, wildcards, union/
        # intersection — see select_nodes). Ancestors of the selection
        # always build too: unlike dbt (whose warehouse persists between
        # invocations) a fresh session has no materialized views to defer
        # to, so prerequisites are part of the run set by construction.
        if select is None and exclude is None:
            targets = self.topo_order()
        else:
            targets = self.select_nodes(select, exclude, state=state)
        wanted = [
            name
            for name in self.topo_order()
            if name in targets or self._is_upstream_of_any(name, targets)
        ]
        if threads <= 1:
            for name in wanted:
                out[name] = self._build_model(spark, name)
            return out

        import concurrent.futures as cf

        ts = graphlib.TopologicalSorter(
            {n: self._deps.get(n, set()) & set(wanted) for n in wanted}
        )
        ts.prepare()
        with cf.ThreadPoolExecutor(max_workers=threads) as pool:
            pending: dict = {}
            while ts.is_active() or pending:
                for name in ts.get_ready():
                    pending[pool.submit(self._build_model, spark, name)] = name
                if not pending:
                    break
                done, _ = cf.wait(pending, return_when=cf.FIRST_COMPLETED)
                for fut in done:
                    name = pending.pop(fut)
                    out[name] = fut.result()  # re-raises model failures
                    ts.done(name)
        return out

    def _build_model(self, spark: SparkSession, name: str) -> DataFrame:
        """Build + materialize one model (deps must already be built)."""
        spec = self._models[name]
        df = spec.fn(RunContext(self, spark, name))
        if spec.contract:
            _enforce_contract(df, spec)
        if spec.materialized == "table":
            from data_etl_with_dbt_spark.plans.observe import observed_write
            from data_etl_with_dbt_spark.sources.io import write_table

            self.run_metrics[name] = observed_write(
                df, lambda d: write_table(d, name, mode="overwrite")
            )
            df = spark.table(name)
        elif spec.materialized == "incremental":
            df = self._materialize_incremental(spark, spec, df)
        elif spec.materialized == "view":
            df.createOrReplaceTempView(name)
        self._cache[name] = df
        return df

    def run_microbatch(
        self,
        spark: SparkSession,
        name: str,
        start,
        end,
        batch_days: int = 1,
    ) -> DataFrame:
        """dbt-1.9-style microbatch incremental run: split ``[start, end)``
        into ``batch_days`` windows, build the model once per window with
        ``ctx.batch_start``/``ctx.batch_end`` set, and replace exactly that
        window's partitions via dynamic partition overwrite.

        Why it scales: each window's build reads only its slice (the model
        filters sources on the event-time bounds → partition-pruned scans),
        writes only its partitions, and is IDEMPOTENT — re-running a window
        (late data, code fix) replaces it without touching neighbors. A
        backfill is just a wider [start, end); no state beyond the table.

        The model must be ``materialized='incremental'`` with
        ``incremental_strategy='insert_overwrite'`` and a ``partition_by``
        that derives from the event time (the window↔partition contract).
        """
        import datetime as _dt

        spec = self._models[name]
        if spec.incremental_strategy != "insert_overwrite" or not spec.partition_by:
            raise ValueError(
                f"microbatch model {name} requires "
                "incremental_strategy='insert_overwrite' with partition_by"
            )
        step = _dt.timedelta(days=batch_days)
        cur = start
        out = None
        while cur < end:
            nxt = min(cur + step, end)
            ctx = RunContext(self, spark, name, batch_start=cur, batch_end=nxt)
            df = spec.fn(ctx)
            if not spark.catalog.tableExists(name):
                from data_etl_with_dbt_spark.sources.io import write_table

                write_table(df, name, mode="overwrite", partition_by=spec.partition_by)
            else:
                df = self._reconcile_schema(spark, spec, df)
                _insert_overwrite_dynamic(spark, df, name)
            cur = nxt
        out = spark.table(name)
        self._cache[name] = out
        return out

    def _materialize_incremental(self, spark: SparkSession, spec: ModelSpec, df: DataFrame) -> DataFrame:
        """Incremental materialization, three dbt-shaped strategies:

        * 'append' — anti-join the fresh build against existing keys and
          append only new ones. The key projection (not full rows) is what
          joins — at scale the existing side is a column-pruned scan of just
          the unique_key, broadcast when small.
        * 'merge' — key upsert: existing rows whose key reappears in the
          fresh build are replaced. On plain Parquet (no transactional
          format in this container) that is keep = existing ⟕̸ fresh-keys,
          then overwrite with keep ∪ fresh. The union is localCheckpoint'd
          before the overwrite (can't overwrite a table still being read).
          A full rewrite is what merge costs on plain Parquet; at 100 TB
          use 'insert_overwrite' with a partition key instead, or a
          transactional table format.
        * 'insert_overwrite' — dynamic partition overwrite: only the
          partitions present in the fresh build are replaced. Needs
          ``partition_by``; this is the scale-native strategy (rewrites
          touched partitions, never the whole table).
        * 'additive' — rollup-table maintenance: the delta's measure
          columns (``additive_cols``) SUM into the snapshot per
          ``unique_key`` (union → one map-side-combined groupBy). The
          incremental form of maintaining sums/counts metric tables —
          dbt has no native analogue; at 100 TB this is the batch kernel
          of streaming metric maintenance (partial aggregates merge, the
          fact table is never rescanned).

        First run always behaves like 'table'.
        """
        from data_etl_with_dbt_spark.sources.io import write_table

        strategy = spec.incremental_strategy
        if strategy in ("append", "merge", "additive") and not spec.unique_key:
            raise ValueError(f"incremental model {spec.name} requires unique_key")
        if strategy == "additive" and not spec.additive_cols:
            raise ValueError(f"additive model {spec.name} requires additive_cols")
        if strategy == "insert_overwrite" and not spec.partition_by:
            raise ValueError(
                f"insert_overwrite model {spec.name} requires partition_by"
            )

        if not spark.catalog.tableExists(spec.name):
            write_table(df, spec.name, mode="overwrite", partition_by=spec.partition_by)
            return spark.table(spec.name)

        df = self._reconcile_schema(spark, spec, df)

        if strategy == "append":
            existing_keys = spark.table(spec.name).select(spec.unique_key)
            fresh = df.join(existing_keys, on=spec.unique_key, how="left_anti")
            fresh.write.mode("append").format("parquet").saveAsTable(spec.name)
        elif strategy == "merge":
            existing = spark.table(spec.name)
            fresh_keys = df.select(spec.unique_key)
            keep = existing.join(fresh_keys, on=spec.unique_key, how="left_anti")
            merged = keep.unionByName(df).localCheckpoint(eager=True)
            write_table(merged, spec.name, mode="overwrite", partition_by=spec.partition_by)
        elif strategy == "additive":
            from data_etl_with_dbt_spark.operators.relational import additive_merge

            existing = spark.table(spec.name)
            keys = [spec.unique_key] if isinstance(spec.unique_key, str) else list(spec.unique_key)
            merged = additive_merge(
                existing, df, keys, spec.additive_cols
            ).localCheckpoint(eager=True)
            write_table(merged, spec.name, mode="overwrite", partition_by=spec.partition_by)
        elif strategy == "insert_overwrite":
            _insert_overwrite_dynamic(spark, df, spec.name)
        else:
            raise ValueError(f"unknown incremental_strategy {strategy!r}")
        return spark.table(spec.name)

    def _reconcile_schema(self, spark: SparkSession, spec: ModelSpec, df: DataFrame) -> DataFrame:
        """dbt ``on_schema_change`` for incremental models, on plain Parquet:

        * 'ignore' — project the fresh build onto the existing table schema;
          columns the fresh build lacks become typed nulls, extra ones drop.
        * 'fail' — raise on any column-set difference.
        * 'append_new_columns' — widen the table with the fresh build's new
          columns (existing rows read back as nulls). Plain Parquet can't
          evolve a catalog schema in place, so the widening is a one-time
          rewrite; a transactional format makes it a metadata op.
        * 'sync_all_columns' — the fresh build's schema wins: rewrite the
          table projected onto it (adds AND removes columns).
        """
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.sources.io import write_table

        existing = spark.table(spec.name)
        old_cols = existing.columns
        new_cols = df.columns
        if old_cols == new_cols:
            return df
        mode = spec.on_schema_change
        added = [c for c in new_cols if c not in old_cols]
        removed = [c for c in old_cols if c not in new_cols]
        if mode == "fail":
            raise ValueError(
                f"incremental model {spec.name}: schema changed "
                f"(added={added}, removed={removed}) and on_schema_change='fail'"
            )

        def project(frame: DataFrame, target: DataFrame) -> DataFrame:
            cols = []
            have = set(frame.columns)
            for f in target.schema.fields:
                if f.name in have:
                    cols.append(F.col(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            return frame.select(*cols)

        if mode == "ignore":
            return project(df, existing)
        if mode == "append_new_columns":
            target = existing
            for f in df.schema.fields:
                if f.name in added:
                    target = target.withColumn(f.name, F.lit(None).cast(f.dataType))
            widened = target.localCheckpoint(eager=True)
            write_table(widened, spec.name, mode="overwrite", partition_by=spec.partition_by)
            return project(df, widened)
        if mode == "sync_all_columns":
            synced = project(existing, df).localCheckpoint(eager=True)
            write_table(synced, spec.name, mode="overwrite", partition_by=spec.partition_by)
            return df
        raise ValueError(f"unknown on_schema_change {mode!r}")

    def sql_model(self, name: str, sql: str, *, deps: list[str] | None = None, **overrides):
        """Register a SQL-text model (the dbt authoring surface): macros
        ``config/ref/source/this/is_incremental`` are supported, DAG edges
        come from the ``ref()``/``source()`` calls in the text, and the
        materialization spec comes from ``{{ config(...) }}`` (keyword
        ``overrides`` win). See ``plans/sql.py`` for the exact dialect."""
        from data_etl_with_dbt_spark.plans import sql as sqlmod

        cfg, body = sqlmod.parse_config(sql)
        cfg.update(overrides)
        refs, _sources = sqlmod.parse_deps(body)

        def fn(ctx, _body=body, _name=name):
            # qualified existence check: a bare tableExists(name) returns
            # True for a session temp view shadowing the model name,
            # forcing incremental_run against a table that may not exist
            cat = ctx.spark.catalog.currentCatalog()
            db = ctx.spark.catalog.currentDatabase()
            incremental_run = (
                cfg.get("materialized") == "incremental"
                and ctx.spark.catalog.tableExists(f"`{cat}`.`{db}`.`{_name}`")
            )
            rendered = sqlmod.render(_body, ctx, _name, incremental_run)
            return ctx.spark.sql(rendered)

        fn.__sql__ = sql  # definition text, for state:modified fingerprints

        spec_kwargs = {
            k: v
            for k, v in cfg.items()
            if k in ("materialized", "unique_key", "incremental_strategy",
                     "partition_by", "on_schema_change", "description",
                     "additive_cols")
        }
        unknown = set(cfg) - set(spec_kwargs)
        if unknown:
            raise ValueError(f"sql model {name}: unsupported config keys {sorted(unknown)}")
        self._models[name] = ModelSpec(name=name, fn=fn, **spec_kwargs)
        self._deps[name] = set(deps if deps is not None else refs)
        return fn

    def docs(self) -> dict:
        """dbt-docs-shaped manifest of the registered DAG: per model, its
        materialization, strategy, declared tests, dependencies, and
        docstring-derived description. Serializable as JSON for catalog /
        lineage tooling (the reference ships dbt's generated docs site; this
        is the data behind it)."""
        out = {}
        for name, spec in self._models.items():
            out[name] = {
                "materialized": spec.materialized,
                "incremental_strategy": (
                    spec.incremental_strategy
                    if spec.materialized == "incremental"
                    else None
                ),
                "unique_key": spec.unique_key,
                "partition_by": spec.partition_by,
                "description": (spec.description or "").strip(),
                "tags": list(spec.tags),
                "depends_on": sorted(self._deps.get(name, ())),
                "tests": [
                    {"test": getattr(t[0], "__name__", str(t[0])), "column": t[1]}
                    for t in spec.tests
                ],
            }
        return out

    def manifest(self) -> list[dict]:
        """The project manifest (dbt ``manifest.json`` shape, trimmed to
        what this runner tracks): one dict per model with materialization,
        declared dependencies, strategy, contract, and test count, in
        topological order — the docs/lineage surface tools build on."""
        return [
            {
                "name": n,
                "materialized": self._models[n].materialized,
                "depends_on": sorted(self._deps.get(n, ())),
                "unique_key": self._models[n].unique_key,
                "incremental_strategy": (
                    self._models[n].incremental_strategy
                    if self._models[n].materialized == "incremental"
                    else None
                ),
                "contract": self._models[n].contract,
                "n_tests": len(self._models[n].tests),
                "description": self._models[n].description.strip(),
            }
            for n in self.topo_order()
        ]

    def _is_upstream_of_any(self, name: str, targets: list[str]) -> bool:
        seen: set[str] = set()

        def up(t: str):
            for d in self._deps.get(t, ()):
                if d not in seen:
                    seen.add(d)
                    up(d)

        for t in targets:
            up(t)
        return name in seen

    def build(
        self,
        spark: SparkSession,
        select: str | list[str] | None = None,
        exclude: str | list[str] | None = None,
        state: dict | None = None,
    ) -> dict:
        """dbt ``build``: materialize each selected model IN DEPENDENCY
        ORDER and run its declared tests immediately after — a BLOCKING
        test failure (severity 'error') marks the model failed and every
        downstream model is SKIPPED, never built on known-bad data (dbt's
        skip-descendants-of-failures semantics; 'warn' failures report but
        don't block). ``run()`` + ``test()`` check quality only after the
        whole DAG ran; ``build()`` is the guardrail form.

        Returns ``{"results": {name: DataFrame}, "tests": [TestResult],
        "failed": [names], "skipped": [names]}``."""
        from data_etl_with_dbt_spark.plans.dq import run_test

        targets = (
            self.topo_order()
            if select is None and exclude is None
            else self.select_nodes(select, exclude, state=state)
        )
        wanted = [
            n
            for n in self.topo_order()
            if n in targets or self._is_upstream_of_any(n, targets)
        ]
        for seed_name, (csv_path, schema) in self._seeds.items():
            from data_etl_with_dbt_spark.sources.io import read_csv, write_table

            seed_df = read_csv(spark, csv_path, schema=schema)
            write_table(seed_df, seed_name, mode="overwrite")
            self._cache[seed_name] = spark.table(seed_name)
        results: dict[str, DataFrame] = {}
        test_results: list = []
        failed: list[str] = []
        skipped: list[str] = []
        bad: set[str] = set()
        for name in wanted:
            if self._deps.get(name, set()) & bad:
                skipped.append(name)
                bad.add(name)  # descendants of a skip are skipped too
                continue
            df = self._build_model(spark, name)
            results[name] = df
            blocking_failure = False
            for test_fn, column, kwargs in self._models[name].tests:
                res = run_test(test_fn, df, column, model=name, **kwargs)
                test_results.append(res)
                blocking_failure = blocking_failure or res.blocking
            if blocking_failure:
                failed.append(name)
                bad.add(name)
        return {
            "results": results,
            "tests": test_results,
            "failed": failed,
            "skipped": skipped,
        }

    def test(self, spark: SparkSession, only=None) -> list:
        """Run declared data-quality tests (dbt-test protocol: a test
        passes iff its violation query returns zero rows — SURVEY.md §2.12).

        ``only`` restricts to that iterable of model names. The CLI's
        ``test --select X`` passes the names its run phase actually built
        (selection + prerequisites): without the restriction, a selected
        run in a fresh session would try to test NEVER-materialized models
        and crash on TABLE_OR_VIEW_NOT_FOUND instead of testing the
        selection."""
        from data_etl_with_dbt_spark.plans.dq import run_test

        results = []
        wanted = None if only is None else set(only)
        for name, spec in self._models.items():
            if not spec.tests:
                continue
            if wanted is not None and name not in wanted:
                continue
            df = self.materialized_df(spark, name)
            for test_fn, column, kwargs in spec.tests:
                results.append(run_test(test_fn, df, column, model=name, **kwargs))
        return results


#: Default process-wide registry (imports register into this one).
default_registry = ModelRegistry()
model = default_registry.model
