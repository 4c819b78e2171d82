"""Crawl-governance operators (sources/robots): robots.txt audit/filter
over a broadcast host-rules relation, robots extraction from WARC
archives, and sitemap/sitemapindex parsing — stdlib semantics, fixtures
written by the module's own counterparts (the codec convention)."""

from __future__ import annotations

import pytest

from data_etl_with_dbt_spark.sources.robots import (
    audit_robots,
    filter_robots_allowed,
    parse_sitemap,
    robots_allows,
    robots_from_warc,
    sitemap_entries,
)

ROBOTS_A = """
User-agent: *
Disallow: /private/
Disallow: /tmp/

User-agent: trainbot
Disallow: /
"""

ROBOTS_B = """
User-agent: *
Allow: /
"""


class TestRobotsRules:
    def test_single_url_semantics(self):
        assert robots_allows(ROBOTS_A, "https://a.example.com/page")
        assert not robots_allows(ROBOTS_A, "https://a.example.com/private/x")
        # agent-specific block: trainbot is banned everywhere on A
        assert not robots_allows(ROBOTS_A, "https://a.example.com/page", agent="trainbot")
        # absence of rules is not a prohibition
        assert robots_allows(None, "https://x/y")
        assert robots_allows("   ", "https://x/y")

    def test_audit_and_filter_over_spark(self, spark):
        urls = spark.createDataFrame(
            [
                (1, "https://a.example.com/page"),
                (2, "https://a.example.com/private/doc"),
                (3, "https://b.example.com/anything"),
                (4, "https://norules.example.com/x"),  # no robots row
            ],
            "id long, url string",
        )
        robots = spark.createDataFrame(
            [("a.example.com", ROBOTS_A), ("b.example.com", ROBOTS_B)],
            "host string, robots_txt string",
        )
        audited = {r.id: r.robots_allowed for r in audit_robots(urls, robots).collect()}
        assert audited == {1: True, 2: False, 3: True, 4: True}
        kept = sorted(
            r.id for r in filter_robots_allowed(urls, robots).collect()
        )
        assert kept == [1, 3, 4]
        # per-agent evaluation flows through
        banned = {r.id: r.robots_allowed
                  for r in audit_robots(urls, robots, agent="trainbot").collect()}
        assert banned[1] is False and banned[3] is True

    def test_robots_from_warc_keeps_last_capture(self, spark, tmp_path):
        from data_etl_with_dbt_spark.sources.warc import encode_warc

        def http(body: bytes, status=200):
            return (
                f"HTTP/1.1 {status} OK\r\nContent-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n".encode() + body
            )

        records = [
            {"warc_type": "response", "uri": "https://a.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "block": http(b"User-agent: *\nDisallow: /old/\n")},
            {"warc_type": "response", "uri": "https://a.example.com/page",
             "content_type": "application/http;msgtype=response",
             "block": http(b"<html>not robots</html>")},
            # re-fetch of A's robots later in the archive supersedes
            {"warc_type": "response", "uri": "https://a.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "block": http(ROBOTS_A.encode())},
            {"warc_type": "response", "uri": "https://c.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "block": http(b"gone", status=404)},  # non-2xx: skipped
        ]
        p = tmp_path / "gov.warc.gz"
        p.write_bytes(encode_warc(records, gzip_members=True))
        files = spark.read.format("binaryFile").load(str(tmp_path))
        got = {r.host: r.robots_txt for r in robots_from_warc(files).collect()}
        assert set(got) == {"a.example.com"}
        assert "Disallow: /private/" in got["a.example.com"]
        assert "/old/" not in got["a.example.com"]  # superseded capture

        # end-to-end: the recovered rules audit the same crawl's URLs
        urls = spark.createDataFrame(
            [(1, "https://a.example.com/private/x"),
             (2, "https://a.example.com/ok")],
            "id long, url string",
        )
        robots = robots_from_warc(files)
        flags = {r.id: r.robots_allowed for r in audit_robots(urls, robots).collect()}
        assert flags == {1: False, 2: True}

    def test_robots_from_nondefault_port_still_joins(self, spark, tmp_path):
        """ADVICE r5: robots captured from a :8080 (or userinfo-bearing)
        URI must key by hostname — netloc keeps the port, so the rules
        never joined url_host's HOST value and the gate failed OPEN."""
        from data_etl_with_dbt_spark.sources.warc import encode_warc

        body = b"User-agent: *\nDisallow: /private/\n"
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        records = [
            {"warc_type": "response",
             "uri": "https://A.Example.com:8080/robots.txt",
             "content_type": "application/http;msgtype=response",
             "block": http},
        ]
        (tmp_path / "port.warc").write_bytes(encode_warc(records))
        files = spark.read.format("binaryFile").load(str(tmp_path))
        robots = robots_from_warc(files)
        got = {r.host for r in robots.collect()}
        assert got == {"a.example.com"}  # lowercased, port stripped
        urls = spark.createDataFrame(
            [(1, "https://a.example.com/private/x")], "id long, url string"
        )
        flags = {r.id: r.robots_allowed
                 for r in audit_robots(urls, robots).collect()}
        assert flags == {1: False}  # the gate no longer fails open

    def test_robots_dedup_orders_mixed_precision_dates_chronologically(
        self, spark, tmp_path
    ):
        """ADVICE r6: WARC 1.1 allows sub-second timestamps, and mixed-
        precision ISO strings do not string-sort chronologically
        ('...00Z' > '...00.900Z' because 'Z' > '.'). The dedup must
        compare as TIMESTAMPS so the sub-second-dated NEWER capture wins
        over a whole-second-dated older one within the same second."""
        from data_etl_with_dbt_spark.sources.warc import encode_warc

        def http(body: bytes) -> bytes:
            return (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n".encode() + body
            )

        (tmp_path / "mixed.warc").write_bytes(encode_warc([
            {"warc_type": "response",
             "uri": "https://sub.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "date": "2024-03-01T00:00:00Z",  # string-sorts ABOVE .900Z
             "block": http(b"User-agent: *\nDisallow: /old/\n")},
            {"warc_type": "response",
             "uri": "https://sub.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "date": "2024-03-01T00:00:00.900Z",  # chronologically newer
             "block": http(b"User-agent: *\nDisallow: /new/\n")},
        ]))
        files = spark.read.format("binaryFile").load(str(tmp_path))
        got = {r.host: r.robots_txt for r in robots_from_warc(files).collect()}
        assert "/new/" in got["sub.example.com"]
        assert "/old/" not in got["sub.example.com"]

    def test_robots_cross_file_dedup_is_by_warc_date(self, spark, tmp_path):
        """ADVICE r5: duplicate captures across WARC FILES must resolve by
        warc-date (offsets only order within one file). The newer-dated
        capture wins even when it sits at a SMALLER offset in a file whose
        path sorts lower."""
        from data_etl_with_dbt_spark.sources.warc import encode_warc

        def http(body: bytes) -> bytes:
            return (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n".encode() + body
            )

        pad = {"warc_type": "response", "uri": "https://pad.example.com/x",
               "content_type": "application/http;msgtype=response",
               "date": "2024-01-01T00:00:00Z",
               "block": http(b"<html>pad</html>" * 64)}
        # file "a": the NEWER capture, first record (small offset)
        (tmp_path / "a.warc").write_bytes(encode_warc([
            {"warc_type": "response",
             "uri": "https://dup.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "date": "2024-03-01T00:00:00Z",
             "block": http(b"User-agent: *\nDisallow: /new/\n")},
        ]))
        # file "z": the OLDER capture, pushed to a LARGER offset
        (tmp_path / "z.warc").write_bytes(encode_warc([
            pad,
            {"warc_type": "response",
             "uri": "https://dup.example.com/robots.txt",
             "content_type": "application/http;msgtype=response",
             "date": "2024-01-15T00:00:00Z",
             "block": http(b"User-agent: *\nDisallow: /old/\n")},
        ]))
        files = spark.read.format("binaryFile").load(str(tmp_path))
        got = {r.host: r.robots_txt for r in robots_from_warc(files).collect()}
        assert "/new/" in got["dup.example.com"]
        assert "/old/" not in got["dup.example.com"]


SITEMAP = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example.com/p1</loc><lastmod>2024-01-05</lastmod></url>
  <url><loc>https://a.example.com/p2</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

SITEMAP_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example.com/sitemap-1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


class TestSitemaps:
    def test_parse_urlset_and_index(self):
        entries = parse_sitemap(SITEMAP)
        assert [(e["loc"], e["lastmod"], e["is_index"]) for e in entries] == [
            ("https://a.example.com/p1", "2024-01-05", False),
            ("https://a.example.com/p2", None, False),
        ]  # the loc-less <url> contributes nothing
        idx = parse_sitemap(SITEMAP_INDEX)
        assert all(e["is_index"] for e in idx) and len(idx) == 2
        assert parse_sitemap(b"<not xml") == []  # triage, not fail

    def test_entries_relation_over_spark(self, spark):
        sitemaps = spark.createDataFrame(
            [(1, bytearray(SITEMAP)), (2, bytearray(SITEMAP_INDEX)),
             (3, bytearray(b"torn <xml"))],
            "sitemap_id long, content binary",
        )
        rows = sitemap_entries(sitemaps).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.sitemap_id, []).append(r)
        assert len(by_id[1]) == 2 and not any(r.is_index for r in by_id[1])
        assert len(by_id[2]) == 2 and all(r.is_index for r in by_id[2])
        assert 3 not in by_id  # malformed blob skipped, task alive
        assert {r.lastmod for r in by_id[2]} == {"2024-02-01", None}


class TestRecrawlSchedule:
    def test_classes_dedup_and_date_only_lastmod(self, spark):
        from data_etl_with_dbt_spark.sources.robots import recrawl_schedule

        seeds = spark.createDataFrame(
            [
                # repeated seed: max lastmod wins (date-only string parses)
                ("https://a/x", "2024-01-05"),
                ("https://a/x", "2024-02-01"),
                ("https://a/y", "2024-01-01"),        # older than fetch
                ("https://a/new", None),              # never fetched, no lastmod
                ("https://a/new2", "2024-01-20"),     # never fetched, lastmod
            ],
            "loc string, lastmod string",
        )
        snapshot = spark.createDataFrame(
            [
                # re-fetches: latest wins
                ("https://a/x", "2024-01-10 00:00:00"),
                ("https://a/x", "2024-01-15 00:00:00"),
                ("https://a/y", "2024-01-25 00:00:00"),
                ("https://a/old", "2023-12-01 00:00:00"),  # unlisted, aged out
            ],
            "url string, fetched_at string",
        )
        out = {
            r.url: (r.reason, r.priority, r.staleness_seconds)
            for r in recrawl_schedule(
                seeds, snapshot, now="2024-02-10 00:00:00", ttl_days=30
            ).collect()
        }
        # lastmod 2024-02-01 > latest fetch 2024-01-15 -> newer by 17 days
        assert out["https://a/x"] == ("lastmod_newer", 2, 17 * 86400)
        # lastmod older, fetched 16 days ago (< ttl) -> fresh
        assert out["https://a/y"] == ("fresh", 0, 0)
        assert out["https://a/new"] == ("never_fetched", 3, 0)
        # never fetched with lastmod: staleness = now - lastmod = 21 days
        assert out["https://a/new2"] == ("never_fetched", 3, 21 * 86400)
        # unlisted snapshot URL past the ttl: 71 days old, 41 past ttl
        assert out["https://a/old"] == ("ttl_expired", 1, 41 * 86400)
        assert len(out) == 5


class TestRobotsDirectives:
    def test_crawl_delay_sitemaps_and_slotting(self, spark):
        from data_etl_with_dbt_spark.sources.robots import (
            crawl_slots,
            robots_directives,
        )

        robots = spark.createDataFrame(
            [
                ("slow.example.com",
                 "User-agent: *\nCrawl-delay: 10\nDisallow: /x/\n"
                 "Sitemap: https://slow.example.com/sitemap.xml\n"),
                ("fast.example.com", "User-agent: *\nAllow: /\n"),
            ],
            "host string, robots_txt string",
        )
        d = {r.host: (r.crawl_delay_s, r.sitemap_urls)
             for r in robots_directives(robots).collect()}
        assert d["slow.example.com"] == (
            10.0, ["https://slow.example.com/sitemap.xml"]
        )
        assert d["fast.example.com"][0] is None  # no declared delay
        assert d["fast.example.com"][1] == []

        # slots honor the per-host declared delay; undeclared hosts use
        # the default
        sched = spark.createDataFrame(
            [(f"https://{h}/p{i}", 1, 0)
             for h in ("slow.example.com", "fast.example.com")
             for i in range(3)],
            "url string, priority int, staleness_seconds long",
        )
        out = crawl_slots(
            sched, per_host_delay_s=2, delays=robots_directives(robots)
        )
        offsets = {
            (r.host, r.slot): r.scheduled_offset_seconds
            for r in out.collect()
        }
        assert offsets[("slow.example.com", 3)] == 20  # 2 * 10 s declared
        assert offsets[("fast.example.com", 3)] == 4   # 2 * 2 s default

    def test_fetch_plan_budget_quota_and_slots(self, spark):
        """Budgeted daily fetch plan: priority-ordered global truncation,
        per-host quota, fresh rows dropped, and politeness slots assigned
        over the SURVIVORS (never counting budget-dropped URLs)."""
        from data_etl_with_dbt_spark.sources.robots import fetch_plan

        sched = spark.createDataFrame(
            # big.example.com: 5 candidate URLs, staleness descending by i
            [(f"https://big.example.com/p{i}", 2, 100 - i) for i in range(5)]
            # small.example.com: one top-priority URL
            + [("https://small.example.com/x", 3, 1)]
            # fresh rows must not consume budget at all
            + [(f"https://fresh.example.com/f{i}", 0, 0) for i in range(4)],
            "url string, priority int, staleness_seconds long",
        )
        out = fetch_plan(
            sched, budget=4, per_host_quota=3, per_host_delay_s=10
        ).collect()
        assert len(out) == 4  # global budget held (6 candidates post-quota)
        by_url = {r.url: r for r in out}
        # priority 3 beats every priority-2 row regardless of staleness
        assert "https://small.example.com/x" in by_url
        # big's quota keeps its top-3 by staleness (p0, p1, p2); the
        # budget then keeps all of small + big's top 3
        assert sorted(u for u in by_url if "big" in u) == [
            "https://big.example.com/p0",
            "https://big.example.com/p1",
            "https://big.example.com/p2",
        ]
        assert not any("fresh" in u for u in by_url)
        # slots count survivors only: big's 3 URLs get slots 1..3
        big_slots = sorted(
            (r.slot, r.scheduled_offset_seconds)
            for r in out if "big" in r.url
        )
        assert big_slots == [(1, 0), (2, 10), (3, 20)]
        assert by_url["https://small.example.com/x"].slot == 1
        assert all(r.quota_rank <= 3 for r in out)
        # the two-phase (salted pre-cap) quota path is EXACT: same plan
        # output under mega-host skew handling
        out2 = fetch_plan(
            sched, budget=4, per_host_quota=3, per_host_delay_s=10,
            two_phase_quota=True,
        ).collect()
        key = lambda r: (r.url, r.quota_rank, r.slot,  # noqa: E731
                         r.scheduled_offset_seconds)
        assert sorted(map(key, out2)) == sorted(map(key, out))

    def test_crawl_slots_tolerates_duplicate_delay_rows(self, spark):
        """ADVICE r6: a delays relation with two rows for one host (a
        rules input that skipped per-host dedup) must NOT fan out that
        host's URL rows — crawl_slots collapses delays to one row per
        host (max = the most conservative interval) before the join."""
        from data_etl_with_dbt_spark.sources.robots import crawl_slots

        sched = spark.createDataFrame(
            [(f"https://Dup.example.com/p{i}", 1, 0) for i in range(4)],
            "url string, priority int, staleness_seconds long",
        )
        delays = spark.createDataFrame(
            [("dup.example.com", 3.0),
             ("DUP.example.com", 7.0),   # duplicate host, differing case
             ("dup.example.com", None)],  # and a NULL-delay duplicate
            "host string, crawl_delay_s double",
        )
        rows = crawl_slots(sched, per_host_delay_s=1, delays=delays).collect()
        assert len(rows) == 4  # no fan-out
        offsets = {r.slot: r.scheduled_offset_seconds for r in rows}
        # slots stay a permutation of 1..4 and use the max (7 s) delay
        assert sorted(r.slot for r in rows) == [1, 2, 3, 4]
        assert offsets == {1: 0, 2: 7, 3: 14, 4: 21}


def test_warc_ingest_example_runs(spark, tmp_path, capsys):
    """The crawl-loop example end to end (round-8 verdict item 4): WARC →
    documents → robots gate → quality/dedup → recrawl schedule → budgeted
    fetch plan → the CONTINUOUS daily cycle (sitemap deltas maintain the
    versioned seed state via recrawl_seed_sink; each day re-plans from the
    updated state), closing with the N-day == one-shot assert inside the
    example."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "warc_ingest_example",
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "warc_ingest.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(str(tmp_path / "wd"))  # asserts every stage internally
    out = capsys.readouterr().out
    assert "daily crawl loop:" in out
    assert "N-day incremental == one-shot" in out
    assert "warc ingest OK" in out


def test_fetch_plan_two_phase_modes_result_identical(spark):
    """two_phase_quota False / True / 'auto' must return the SAME rows on
    a skewed-host schedule (one host holds half the URLs) — the salted
    pre-cap is exact (any global top-n row is in its salted group's
    top-n), and auto only changes WHICH plan runs, never the result.
    Round-8 crossover probe context lives in the fetch_plan docstring and
    BENCH_NOTES: the pre-cap is a shuffle-ingest guard for 1e8+-row
    hosts, not a local-mode win, hence the auto row floor."""
    from pyspark.sql import functions as F

    from data_etl_with_dbt_spark.sources.robots import fetch_plan

    n = 4000
    base = spark.range(n).withColumn(
        "h",
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 37),
    )
    sched = base.select(
        F.format_string("https://h%d.example.com/p%d", "h", "id").alias("url"),
        (F.col("id") % 3 + 1).cast("int").alias("priority"),
        (F.col("id") % 86400).cast("bigint").alias("staleness_seconds"),
    ).repartition(8)
    results = {}
    for mode in (False, True, "auto"):
        rows = sorted(
            tuple(r)
            for r in fetch_plan(
                sched, budget=300, per_host_quota=20, two_phase_quota=mode
            ).collect()
        )
        results[str(mode)] = rows
    assert results["False"] == results["True"] == results["auto"]
    assert len(results["False"]) == 300  # budget bound, non-vacuous
    # a tiny auto_row_floor forces the pre-cap path through auto too —
    # still identical
    forced = sorted(
        tuple(r)
        for r in fetch_plan(
            sched, budget=300, per_host_quota=20,
            two_phase_quota="auto", auto_row_floor=1,
        ).collect()
    )
    assert forced == results["False"]


def test_fetch_plan_auto_stays_lazy_for_small_inputs(spark, monkeypatch):
    """ADVICE-r8: two_phase_quota='auto' must NOT launch a Spark job at
    call time for small candidate sets — the Catalyst plan-stats screen
    (driver-side sizeInBytes bound, no job) decides two_phase=False
    without ever invoking the skew_stats probe, keeping fetch_plan a
    lazy plan builder in per-batch loops (the daily-cycle example)."""
    from pyspark.sql import functions as F

    from data_etl_with_dbt_spark.operators import relational
    from data_etl_with_dbt_spark.sources.robots import fetch_plan

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError(
            "skew_stats probe ran for a small candidate set"
        )

    monkeypatch.setattr(relational, "skew_stats", _boom)
    sched = spark.range(200).select(
        F.format_string("https://h%d.example.com/p%d", F.col("id") % 7,
                        "id").alias("url"),
        F.lit(2).alias("priority"),
        F.col("id").cast("bigint").alias("staleness_seconds"),
    )
    plan = fetch_plan(sched, budget=50, per_host_quota=10)  # default auto
    assert plan.count() == 50  # plan builds AND executes, probe never ran
