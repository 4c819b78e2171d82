"""Audit the driver-window rotation (see __spark_entry__.py tier comments).

The rotation is only defensible if (a) the tiers partition the registry
exactly, (b) nothing is ever rotated OUT of the window without a green
driver row in some CORRECTNESS_r*.json, and (c) the window holds exactly 50
oracle-bearing entries inserted first. These tests pin all three, so any
future re-tiering that hides an unverified or failing query breaks CI.
"""

from __future__ import annotations

import importlib
import itertools

import __spark_entry__ as entry_mod
from data_etl_with_dbt_spark.suite import QUERIES
from tools.rotate_window import verified_from_correctness


def test_tiers_partition_registry():
    tiers = [
        entry_mod.WINDOW,
        entry_mod.ZQ_QUEUED,
        entry_mod.ZV_VERIFIED,
        entry_mod.ZR_ROWS_ONLY,
    ]
    names = list(itertools.chain.from_iterable(tiers))
    assert len(names) == len(set(names)), "a query appears in two tiers"
    assert set(names) == set(QUERIES), (
        "tiers must cover the registry exactly; untiered: "
        f"{sorted(set(QUERIES) - set(names))}, stale: "
        f"{sorted(set(names) - set(QUERIES))}"
    )


def test_rotated_out_only_while_green():
    """Every ZV_VERIFIED name has a hash_match=true driver row on record."""
    green = verified_from_correctness()
    not_green = sorted(set(entry_mod.ZV_VERIFIED) - green)
    assert not not_green, (
        f"rotated out of the window without a green driver row: {not_green}"
    )


def test_window_is_full_and_mostly_oracle_bearing():
    """The window is always exactly 50; at most ROWS_ONLY_SMOKE_SLOTS of
    them may be rows-only smoke rotations (drained-queue backfill policy —
    round-5 verdict items 1 and 5), the rest must carry oracles."""
    from tools.rotate_window import ROWS_ONLY_SMOKE_SLOTS

    assert len(entry_mod.WINDOW) == 50
    no_oracle = [n for n in entry_mod.WINDOW if not QUERIES[n].oracle]
    assert len(no_oracle) <= ROWS_ONLY_SMOKE_SLOTS, (
        f"too many window slots on rows-only entries: {no_oracle}"
    )


def test_rows_only_tier_matches_registry():
    """Every oracle-less query is either in the ZR tier or rotating through
    the window as a smoke pick — and only oracle-less queries are in ZR."""
    expected = {n for n, q in QUERIES.items() if not q.oracle}
    in_window_smokes = {n for n in entry_mod.WINDOW if not QUERIES[n].oracle}
    assert set(entry_mod.ZR_ROWS_ONLY) | in_window_smokes == expected
    assert set(entry_mod.ZR_ROWS_ONLY) <= expected
    assert not (set(entry_mod.ZR_ROWS_ONLY) & in_window_smokes)


def test_insertion_order_window_first():
    """queries() must yield the window in positions 1-50, rows-only last."""
    names = [entry_mod.exposed_name(n) for n in entry_mod.ordered_names()]
    q = entry_mod.queries()
    assert list(q) == names
    assert [n for n in list(q)[:50]] == entry_mod.WINDOW  # bare names, no prefix
    n_rows_only = len(entry_mod.ZR_ROWS_ONLY)
    assert all(n.startswith("zr_") for n in list(q)[-n_rows_only:])


def test_exposed_prefix_agrees_with_insertion_order():
    """Belt-and-braces: if the driver sorted by exposed name instead, the
    window SET would be unchanged (bare < zq_ < zr_ < zv_)."""
    q = entry_mod.queries()
    by_name = sorted(q)
    assert set(by_name[:50]) == set(list(q)[:50])


def test_oracle_sql_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every window entry except rows-only smoke rotations carries an oracle
    for n in list(q)[:50]:
        if QUERIES[n].oracle:
            assert n in o


def test_reimport_stable():
    importlib.reload(entry_mod)
    assert len(entry_mod.queries()) == len(QUERIES)


def test_write_entry_file_round_trips(tmp_path):
    """--write rewrites only the four tier lists: the regenerated file
    still imports, exposes the same registry, keeps WINDOW at 50
    oracle-bearing entries first, and leaves the module docstring and
    functions untouched."""
    import os
    import shutil

    from tools.rotate_window import plan_rotation, write_entry_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = tmp_path / "__spark_entry__.py"
    shutil.copy(os.path.join(repo, "__spark_entry__.py"), target)

    plan = plan_rotation()
    write_entry_file(plan, str(target))

    src = target.read_text()
    assert src.count("WINDOW = [") == 1
    assert src.count("ZR_ROWS_ONLY = [") == 1
    assert "def queries()" in src and "def oracle_sql()" in src

    scope = {"__file__": str(target)}
    exec(compile(src, str(target), "exec"), scope)
    names = list(scope["queries"]().keys())
    assert len(names) == len(set(names))
    assert names[:50] == scope["WINDOW"]
    assert len(scope["WINDOW"]) == 50


def test_vacuous_green_rows_do_not_verify(tmp_path, monkeypatch):
    """A hash_match=true row with spark_rows=0 (empty result matching an
    empty oracle) must NOT count as driver verification — the round-3
    judge's q8/q22 finding, generalized. Non-vacuous greens still count;
    the tier prefix is stripped either way."""
    import json

    import tools.rotate_window as rw

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "real_green": {"hash_match": True, "spark_rows": 7},
        "zv_prefixed_green": {"hash_match": True, "spark_rows": 1},
        "vacuous_green": {"hash_match": True, "spark_rows": 0},
        "red_row": {"hash_match": False, "spark_rows": 5},
        "legacy_no_rows_field": {"hash_match": True},
    }))
    monkeypatch.setattr(rw, "REPO", str(tmp_path))
    assert rw.verified_from_correctness() == {"real_green", "prefixed_green"}


def test_priority_respects_hold_and_rows_only(monkeypatch):
    """Round-5 review: a judge-PRIORITY name that is also HELD (or
    rows-only) must not enter the window — previously it was emitted in
    BOTH tiers, breaking the hold invariant. HOLD_QUEUED is empty in
    round 6 (freeze over), so the hold is synthesized: un-verify one
    oracle-bearing name and hold it."""
    import tools.rotate_window as RW

    held_name = next(n for n in sorted(QUERIES) if QUERIES[n].oracle)
    real_verified = RW.verified_from_correctness()
    monkeypatch.setattr(
        RW, "verified_from_correctness",
        lambda: real_verified - {held_name},
    )
    monkeypatch.setattr(RW, "HOLD_QUEUED", [held_name])
    monkeypatch.setattr(RW, "PRIORITY", [held_name])
    plan = RW.plan_rotation()
    assert held_name not in plan["window"]
    assert held_name in plan["queued"]
    # no name appears in two tiers
    all_names = plan["window"] + plan["queued"] + plan["verified"] + plan["rows_only"]
    assert len(all_names) == len(set(all_names))


def test_drained_queue_backfills_window_to_50():
    """Round-5 verdict item 1: with fewer than 50 unverified oracle
    candidates (the state round 6 starts in), the window must still have
    exactly 50 entries — unverified candidates first, then at most
    ROWS_ONLY_SMOKE_SLOTS rows-only smoke rotations, then ZV
    re-verifications stalest-green-first. Runs against the REAL
    CORRECTNESS history, so this is live whenever the queue is drained."""
    from tools.rotate_window import (
        ROWS_ONLY_SMOKE_SLOTS,
        last_green_round,
        plan_rotation,
        verified_from_correctness,
    )

    plan = plan_rotation()
    assert len(plan["window"]) == 50
    # partition + dedup across all four tiers still holds
    all_names = (
        plan["window"] + plan["queued"] + plan["verified"] + plan["rows_only"]
    )
    assert len(all_names) == len(set(all_names))
    assert set(all_names) == set(QUERIES)
    # backfill composition
    assert len(plan["smokes"]) <= ROWS_ONLY_SMOKE_SLOTS
    verified = verified_from_correctness()
    n_unverified = len(plan["window"]) - len(plan["smokes"]) - len(plan["reverify"])
    head = plan["window"][:n_unverified]
    assert not (set(head) & verified), "unverified slots must come first"
    assert all(not QUERIES[n].oracle for n in plan["smokes"])
    # re-verification picks are stalest-green-first: no verified name left
    # in the ZV tier may be staler than a picked one
    if plan["reverify"]:
        green = last_green_round()
        picked_max = max(green.get(n, 0) for n in plan["reverify"])
        left_min = min(
            (green.get(n, 0) for n in plan["verified"]), default=picked_max
        )
        assert picked_max <= left_min
