"""WARC → corpus ingestion — the crawl-side entry point of the training
pipeline: web-archive files land as the ``documents`` relation, then flow
straight into the corpus operators (quality → dedup) the nightly pipeline
runs (examples/corpus_pipeline.py).

    1. synthesize a few ``.warc.gz`` files (per-record gzip members, the
       layout crawls ship) with the module's own deterministic writer
    2. ``spark.read.format("binaryFile")`` — the parallel unit is the
       FILE; a real crawl's thousands of ~1 GB files are the partitions
    3. ``warc_to_documents`` — 2xx text responses only, HTML reduced to
       visible text, deterministic xxhash64 doc ids
    4. crawl governance: recover the archive's own robots.txt
       (``robots_from_warc``) and drop the pages the host had disallowed
       (``filter_robots_allowed``) — the compliance gate training
       pipelines run before anything else touches the text
    5. chain into text_stats (quality) + exact dedup, proving the landed
       relation is pipeline-ready
    6. close the crawl loop: parse the site's sitemap for lastmod seeds,
       emit the recrawl priority relation (``recrawl_schedule`` — which
       URLs to fetch next, and why), and assign per-host politeness slots
       (``crawl_slots``) — tomorrow's fetch plan from today's archive

Run:  python examples/warc_ingest.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark.operators.dedup import exact_duplicate_groups
from data_etl_with_dbt_spark.operators.textan import text_stats
from data_etl_with_dbt_spark.sources.robots import (
    filter_robots_allowed,
    robots_from_warc,
)
from data_etl_with_dbt_spark.sources.warc import encode_warc, warc_to_documents


def _http(body: bytes, ctype="text/html; charset=utf-8", status=200) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n\r\n".encode() + body
    )


def _page(i: int) -> bytes:
    return (
        f"<html><head><title>p{i}</title><script>track();</script></head>"
        f"<body><h1>Page {i}</h1><p>Spark-first corpus build, doc {i % 4}."
        f"</p></body></html>"
    ).encode()


def main(workdir: str) -> None:
    crawl = os.path.join(workdir, "crawl")
    os.makedirs(crawl, exist_ok=True)
    for f in range(3):
        records = [
            {
                "warc_type": "response",
                "uri": f"https://example.com/{f}/{i}",
                "date": f"2024-03-0{f + 1}T00:00:0{i}Z",
                "content_type": "application/http;msgtype=response",
                "block": _http(_page(f * 4 + i)),
            }
            for i in range(4)
        ]
        if f == 0:
            # the crawler archived the host's robots.txt alongside the
            # pages: path segment /2/ was disallowed at fetch time
            records.insert(0, {
                "warc_type": "response",
                "uri": "https://example.com/robots.txt",
                "date": "2024-03-01T00:00:00Z",
                "content_type": "application/http;msgtype=response",
                "block": _http(
                    b"User-agent: *\nDisallow: /2/\n", ctype="text/plain"
                ),
            })
        with open(os.path.join(crawl, f"crawl-{f}.warc.gz"), "wb") as fh:
            fh.write(encode_warc(records, gzip_members=True))

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("warc-ingest")
    try:
        files = spark.read.format("binaryFile").load(crawl)
        docs = warc_to_documents(files)
        n = docs.count()
        print(f"landed documents: {n}")
        assert n == 13  # 12 pages + the robots.txt body (text/plain)

        # compliance gate: the archive's own rules drop the /2/ pages
        rules = robots_from_warc(files)
        docs = filter_robots_allowed(docs, rules, url_col="url")
        n = docs.count()
        print(f"after robots gate: {n}")
        assert n == 9  # 4 disallowed /2/* pages removed

        stats = text_stats(docs, id_col="doc_id", text_col="text")
        ok = stats.where("n_tokens >= 5").count()
        print(f"quality-scorable docs: {ok}")

        groups = exact_duplicate_groups(docs, "doc_id", "text")
        n_groups = groups.count()
        print(f"distinct contents after exact dedup: {n_groups}")
        # _page repeats every 4 docs modulo the page number -> near-unique
        assert n_groups <= n

        # tomorrow's fetch plan from today's archive: sitemap lastmod
        # seeds vs the fetch snapshot -> recrawl classes -> politeness slots
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.sources.robots import (
            crawl_slots,
            recrawl_schedule,
            robots_directives,
            sitemap_entries,
        )

        sitemap_xml = (
            '<?xml version="1.0"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            # /0/0 re-published AFTER the crawl fetched it -> lastmod_newer
            "<url><loc>https://example.com/0/0</loc>"
            "<lastmod>2024-03-05</lastmod></url>"
            # /1/1 unchanged since before the fetch -> fresh (within ttl)
            "<url><loc>https://example.com/1/1</loc>"
            "<lastmod>2024-02-01</lastmod></url>"
            # never crawled at all -> never_fetched
            "<url><loc>https://example.com/brand-new</loc>"
            "<lastmod>2024-03-04</lastmod></url>"
            "</urlset>"
        ).encode()
        seeds = sitemap_entries(
            spark.createDataFrame(
                [(0, bytearray(sitemap_xml))], "sitemap_id long, content binary"
            )
        ).where(~F.col("is_index"))
        snapshot = docs.select("url", "fetched_at")
        plan = recrawl_schedule(
            seeds, snapshot, now="2024-03-06 00:00:00", ttl_days=30
        )
        # hosts honor their own declared Crawl-delay (none here -> the
        # 2 s default), per-host via the archive's recovered robots.txt
        slotted = crawl_slots(
            plan, per_host_delay_s=2, delays=robots_directives(rules)
        )
        print("recrawl plan (priority desc):")
        for r in slotted.orderBy(
            F.desc("priority"), "scheduled_offset_seconds", "url"
        ).collect()[:6]:
            print(
                f"  t+{r.scheduled_offset_seconds:>3}s p{r.priority} "
                f"{r.reason:<14} {r.url}"
            )
        by_reason = {
            r.reason: r["count"]
            for r in plan.groupBy("reason").count().collect()
        }
        assert by_reason.get("never_fetched") == 1  # /brand-new
        assert by_reason.get("lastmod_newer") == 1  # re-published /0/0

        # the day's executable fetch list: global budget + per-host quota
        # over the recrawl relation, politeness-slotted — fetch_plan is
        # recrawl_schedule ∘ per_key_cap ∘ crawl_slots in one call
        from data_etl_with_dbt_spark.sources.robots import fetch_plan

        day = fetch_plan(
            plan,
            budget=3,
            per_host_quota=2,
            per_host_delay_s=2,
            delays=robots_directives(rules),
        )
        day_rows = day.orderBy(F.desc("priority"), "url").collect()
        print(f"budgeted fetch list ({len(day_rows)} of "
              f"{plan.where(F.col('priority') >= 1).count()} candidates):")
        for r in day_rows:
            print(f"  t+{r.scheduled_offset_seconds:>3}s p{r.priority} "
                  f"q{r.quota_rank} {r.url}")
        assert len(day_rows) <= 3  # global budget held
        assert all(r.quota_rank <= 2 for r in day_rows)  # host quota held
        # highest-priority work survives the truncation
        assert any(r.url == "https://example.com/brand-new" for r in day_rows)

        # 7. the CONTINUOUS daily cycle: sitemap DELTAS maintain a
        #    versioned seed state (recrawl_seed_sink — earlier days never
        #    re-read), and each day re-derives schedule → budgeted fetch
        #    plan from the UPDATED state. The closing assert is the
        #    N-day == one-shot contract: the final day's schedule equals
        #    the schedule over all deltas unioned.
        from data_etl_with_dbt_spark.sources import versioned as V
        from data_etl_with_dbt_spark.streaming.intake import recrawl_seed_sink

        seeds_path = os.path.join(workdir, "seed_state")
        sink = recrawl_seed_sink(seeds_path, loc_col="loc",
                                 lastmod_col="lastmod")
        day_deltas = [
            # day 0: today's full sitemap is the first delta
            seeds.select("loc", "lastmod"),
            # day 1: /1/1 re-published + a brand-new URL appears
            spark.createDataFrame(
                [("https://example.com/1/1", "2024-03-07"),
                 ("https://example.com/two", "2024-03-07")],
                "loc string, lastmod string",
            ),
            # day 2: stale lastmod for a known URL (must NOT regress the
            # state — max-lastmod wins) + another new URL
            spark.createDataFrame(
                [("https://example.com/1/1", "2024-01-01"),
                 ("https://example.com/three", "2024-03-08")],
                "loc string, lastmod string",
            ),
        ]
        print("daily crawl loop:")
        for day, delta in enumerate(day_deltas):
            sink(delta, day)
            state = V.read_version(
                spark, seeds_path, V.list_versions(seeds_path)[-1]
            )
            now = f"2024-03-0{6 + day} 00:00:00"
            sched = recrawl_schedule(
                state, snapshot, now=now, ttl_days=30,
                loc_col="url", lastmod_col="lastmod",
            )
            todo = fetch_plan(
                sched, budget=3, per_host_quota=3, per_host_delay_s=2,
                delays=robots_directives(rules),
            )
            n_cand = sched.where(F.col("priority") >= 1).count()
            urls = [r.url for r in todo.orderBy("scheduled_offset_seconds",
                                                "url").collect()]
            print(f"  day {day}: state={state.count()} urls, "
                  f"{n_cand} candidates -> fetch {urls}")
        # day 1's republish survives day 2's stale echo: max-lastmod state
        # keeps 2024-03-07 for /1/1, so it still classifies lastmod_newer
        # (day 2's three never_fetched p3 URLs rightfully win the budget)
        final_11 = V.read_version(
            spark, seeds_path, V.list_versions(seeds_path)[-1]
        ).where(F.col("url") == "https://example.com/1/1").first()
        assert str(final_11.lastmod).startswith("2024-03-07")
        # N-day incremental == one-shot: the accumulated state's schedule
        # equals the schedule over ALL deltas unioned (per-URL max lastmod)
        oneshot_seeds = (
            day_deltas[0]
            .unionByName(day_deltas[1])
            .unionByName(day_deltas[2])
            .select(F.col("loc"), F.to_timestamp("lastmod").alias("lastmod"))
            .groupBy("loc")
            .agg(F.max("lastmod").alias("lastmod"))
        )
        oneshot = recrawl_schedule(
            oneshot_seeds, snapshot, now="2024-03-08 00:00:00", ttl_days=30,
        )
        final_state = V.read_version(
            spark, seeds_path, V.list_versions(seeds_path)[-1]
        )
        incremental = recrawl_schedule(
            final_state, snapshot, now="2024-03-08 00:00:00", ttl_days=30,
            loc_col="url", lastmod_col="lastmod",
        )
        a = sorted(tuple(r) for r in incremental.collect())
        b = sorted(tuple(r) for r in oneshot.collect())
        assert a == b, "N-day incremental state diverged from one-shot"
        print(f"  N-day incremental == one-shot over {len(a)} URLs ✓")
        print("warc ingest OK")
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/warc_ingest_wd")
