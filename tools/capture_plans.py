"""Capture .explain("formatted") for bench-headline (and named extra)
queries into plans/<tag>/<name>_<suffix>.txt so plan-shape claims in
OPTIMIZATION notes are checkable without running Spark.

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]

With no query names, captures every bench=True query. SPARK_GRAFT_SF_DIR
selects the fixture dir (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_with_dbt_spark.session import get_spark
from data_etl_with_dbt_spark.suite import QUERIES


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or [n for n, q in sorted(QUERIES.items()) if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("capture_plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")

    spark.stop()


if __name__ == "__main__":
    main()
