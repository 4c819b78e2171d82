"""Driver correctness-window rotation helper.

The driver checks the first 50 exposed query names (alphabetical). After a
round, run this to fold the round's green rows into the verified set and
promote queued entries into the next window:

    python tools/rotate_window.py            # report what WOULD rotate
    python tools/rotate_window.py --apply    # rewrite __spark_entry__.py tiers

Reads every CORRECTNESS_r*.json in the repo root; a query is "verified"
once any round shows hash_match=true (oracle queries) — rows-only entries
stay queued behind the window by policy (zr_), since a rows-only driver row
adds little over the in-repo pytest coverage.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def strip_tier(name: str) -> str:
    return re.sub(r"^z[vqr]_", "", name)


def verified_from_correctness() -> set[str]:
    """Names with a green hash_match row in any round's CORRECTNESS file."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                green.add(strip_tier(name))
    return green


def plan_rotation() -> dict:
    sys.path.insert(0, REPO)
    from data_etl_with_dbt_spark.suite import QUERIES

    verified = verified_from_correctness() & set(QUERIES)
    rows_only = {n for n, q in QUERIES.items() if not q.oracle}
    # unverified oracle queries compete for the window, alphabetically;
    # beyond 50 they queue. rows-only entries always park behind (zr_).
    candidates = sorted(set(QUERIES) - verified - rows_only)
    window = candidates[:WINDOW]
    queued = candidates[WINDOW:]
    return {
        "verified": sorted(verified),
        "window": window,
        "queued": queued,
        "rows_only": sorted(rows_only),
    }


def render_sets(plan: dict) -> str:
    def fmt(names: list[str], indent: str = "    ") -> str:
        out, line = [], indent
        for n in names:
            tok = f'"{n}", '
            if len(line) + len(tok) > 78:
                out.append(line.rstrip())
                line = indent
            line += tok
        if line.strip():
            out.append(line.rstrip())
        return "\n".join(out)

    return (
        "ZV_VERIFIED = {\n" + fmt(plan["verified"]) + "\n}\n\n"
        "ZQ_DEFERRED = {\n" + fmt(plan["queued"]) + "\n}\n\n"
        "ZR_ROWSONLY_DEFERRED = {\n" + fmt(plan["rows_only"]) + "\n}\n"
    )


def main() -> None:
    plan = plan_rotation()
    print(
        f"verified (zv_): {len(plan['verified'])}   "
        f"window (bare): {len(plan['window'])}   "
        f"queued (zq_): {len(plan['queued'])}   "
        f"rows-only (zr_): {len(plan['rows_only'])}"
    )
    print("\nnext window:")
    for n in plan["window"]:
        print(f"  {n}")
    if plan["queued"]:
        print("\nstill queued:")
        for n in plan["queued"]:
            print(f"  {n}")
    if "--apply" in sys.argv:
        print("\n-- paste into __spark_entry__.py --\n")
        print(render_sets(plan))


if __name__ == "__main__":
    main()
