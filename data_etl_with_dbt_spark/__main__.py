"""dbt-shaped command line for the engine: ``python -m data_etl_with_dbt_spark``.

The reference project is driven as ``dbt run`` / ``dbt test`` / ``dbt
build`` over a directory of SQL models (reference ``models/*.sql`` +
``schema.yml``); this CLI is that invocation surface on the Spark engine,
backed by ``plans.dag.ModelRegistry``:

    python -m data_etl_with_dbt_spark ls    --project-dir proj
    python -m data_etl_with_dbt_spark run   --project-dir proj --select 'core+'
    python -m data_etl_with_dbt_spark test  --project-dir proj
    python -m data_etl_with_dbt_spark build --project-dir proj --threads 4
    python -m data_etl_with_dbt_spark docs  --project-dir proj   # manifest JSON

A project directory holds ``models/*.sql`` (file stem = model name, dbt
macros per plans/sql: config/ref/source/this/is_incremental) and optional
``seeds/*.csv``. Sources come from ``--source name=path`` flags (parquet or
CSV by extension) — the moral equivalent of sources.yml. Alternatively
``--project module:callable`` imports a Python registration function
(``fn(registry)``), the surface the examples use.

Exit code: 0 on success; 1 if any model fails, any blocking test fails, or
build skips descendants.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _load_project(args, registry) -> None:
    if args.project:
        mod_name, _, fn_name = args.project.partition(":")
        sys.path.insert(0, os.getcwd())
        import importlib

        fn = getattr(importlib.import_module(mod_name), fn_name or "register")
        fn(registry)
    if args.project_dir:
        models_dir = os.path.join(args.project_dir, "models")
        for path in sorted(glob.glob(os.path.join(models_dir, "*.sql"))):
            name = os.path.splitext(os.path.basename(path))[0]
            with open(path) as f:
                registry.sql_model(name, f.read())
        for path in sorted(
            glob.glob(os.path.join(args.project_dir, "seeds", "*.csv"))
        ):
            registry.add_seed(os.path.splitext(os.path.basename(path))[0], path)
    for spec in args.source or []:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--source must be name=path, got {spec!r}")
        registry.add_source(name, _loader_for(path))


def _loader_for(path: str):
    def load(spark):
        from data_etl_with_dbt_spark.sources.io import read_csv, read_parquet

        if path.endswith(".csv"):
            return read_csv(spark, path)
        return read_parquet(spark, path)

    return load


def _spark(args):
    from data_etl_with_dbt_spark.session import get_spark

    return get_spark("cli", master=args.master)


def main(argv: list[str] | None = None, spark=None) -> int:
    """CLI entry point. ``spark`` injects an existing session (tests, REPL
    embedding); when None a session is created and stopped per invocation."""
    p = argparse.ArgumentParser(prog="data_etl_with_dbt_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--project-dir", help="directory with models/*.sql (+ seeds/*.csv)")
    common.add_argument("--project", help="python registration 'module:callable'")
    common.add_argument(
        "--source", action="append", metavar="NAME=PATH",
        help="register a source table from a parquet/csv path (repeatable)",
    )
    common.add_argument("--select", default=None, help="dbt --select grammar")
    common.add_argument("--exclude", default=None, help="dbt --exclude grammar")
    common.add_argument("--master", default=os.environ.get("SPARK_MASTER", "local[*]"))
    sub.add_parser("ls", parents=[common], help="list selected models in topo order")
    runp = sub.add_parser("run", parents=[common], help="materialize models")
    runp.add_argument("--threads", type=int, default=1)
    sub.add_parser("test", parents=[common], help="run declared DQ tests")
    buildp = sub.add_parser(
        "build", parents=[common], help="run + test, skipping descendants of failures"
    )
    buildp.add_argument("--threads", type=int, default=1)  # parity flag; build is ordered
    sub.add_parser("docs", parents=[common], help="print the manifest as JSON")
    args = p.parse_args(argv)

    from data_etl_with_dbt_spark.plans.dag import ModelRegistry

    registry = ModelRegistry()
    _load_project(args, registry)

    if args.cmd == "ls":
        for name in registry.select_nodes(args.select, args.exclude):
            print(name)
        return 0
    if args.cmd == "docs":
        print(json.dumps(registry.manifest(), indent=2))
        return 0

    owns_session = spark is None
    if owns_session:
        spark = _spark(args)
    try:
        if args.cmd == "run":
            out = registry.run(
                spark, select=args.select, exclude=args.exclude, threads=args.threads
            )
            for name in out:
                n = registry.run_metrics.get(name, {}).get("n_rows")
                print(f"OK {name}" + (f"  rows={n}" if n is not None else ""))
            return 0
        if args.cmd == "test":
            built = registry.run(spark, select=args.select, exclude=args.exclude)
            # test exactly what this invocation materialized (selection +
            # prerequisites) — unselected models may not exist in a fresh
            # session and must not be looked up
            results = registry.test(spark, only=built)
            bad = 0
            for r in results:
                status = "PASS" if r.passed else ("WARN" if not r.blocking else "FAIL")
                bad += int((not r.passed) and r.blocking)
                # count violations only on failure: run_test's pass probe
                # is limit(1), and dbt prints PASS without a count — an
                # unconditional count() re-runs the full violation query
                # (scan + shuffle) once per PASSING test
                tail = "" if r.passed else f"  failures={r.violations.count()}"
                print(f"{status} {r.model}.{r.column}:{r.test}{tail}")
            return 1 if bad else 0
        # build
        res = registry.build(spark, select=args.select, exclude=args.exclude)
        for name in res["results"]:
            print(f"OK   {name}")
        for r in res["tests"]:
            status = "PASS" if r.passed else ("WARN" if not r.blocking else "FAIL")
            tail = "" if r.passed else f"  failures={r.violations.count()}"
            print(f"{status} {r.model}.{r.column}:{r.test}{tail}")
        for name in res["skipped"]:
            print(f"SKIP {name}")
        return 1 if res["failed"] or res["skipped"] else 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
