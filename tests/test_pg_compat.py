"""Unit tests for the PG-compatibility helpers (SURVEY.md §2.9 F1/F2/F4 —
the byte-exact surrogate-key hazards)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_etl_with_dbt_spark.functions.pg_compat import (
    epoch_seconds,
    pg_concat_sep,
    pg_text,
    surrogate_key,
)


def test_pg_text_double_integral_renders_without_fraction(spark):
    df = spark.createDataFrame([(1.0, 1.5, -73.99, 0.0, None)], "a double, b double, c double, d double, e double")
    row = df.select(
        *[pg_text(F.col(c), T.DoubleType()).alias(c) for c in df.columns]
    ).first()
    assert row.a == "1"  # PG: SELECT 1.0::float8::text -> '1'
    assert row.b == "1.5"
    assert row.c == "-73.99"
    assert row.d == "0"
    assert row.e is None


def test_pg_text_timestamp_and_bool(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2015, 1, 15, 19, 5, 39), True, False)],
        "ts timestamp, t boolean, f boolean",
    )
    row = df.select(
        pg_text(F.col("ts"), T.TimestampType()).alias("ts"),
        pg_text(F.col("t"), T.BooleanType()).alias("t"),
        pg_text(F.col("f"), T.BooleanType()).alias("f"),
    ).first()
    assert row.ts == "2015-01-15 19:05:39"
    assert row.t == "true"
    assert row.f == "false"


def test_pg_concat_null_keeps_separator(spark):
    # PG concat('a','-',NULL,'-','c') = 'a--c'; Spark concat would be NULL,
    # concat_ws would drop a separator ('a-c'). We must produce 'a--c'.
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    row = df.select(pg_concat_sep([F.col("x"), F.col("y"), F.col("z")]).alias("k")).first()
    assert row.k == "a--c"


def test_surrogate_key_matches_reference_md5(spark):
    # Reproduce PG: md5(concat(1, '-', '2015-01-15 19:05:39', '-', 2.5))
    df = spark.createDataFrame(
        [(1, dt.datetime(2015, 1, 15, 19, 5, 39), 2.5)],
        "a int, ts timestamp, d double",
    )
    row = df.select(surrogate_key(df.schema, ["a", "ts", "d"]).alias("k")).first()
    expected = hashlib.md5(b"1-2015-01-15 19:05:39-2.5").hexdigest()
    assert row.k == expected


def test_surrogate_key_null_and_integral_double(spark):
    df = spark.createDataFrame(
        [(2, None, 3.0)],
        "a int, ts timestamp, d double",
    )
    row = df.select(surrogate_key(df.schema, ["a", "ts", "d"]).alias("k")).first()
    expected = hashlib.md5(b"2--3").hexdigest()  # NULL -> '', 3.0 -> '3'
    assert row.k == expected


def test_epoch_seconds_fractional(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2015, 1, 1, 0, 0, 0, 500000), dt.datetime(2015, 1, 1, 0, 1, 0))],
        "a timestamp, b timestamp",
    )
    row = df.select(epoch_seconds("b", "a").alias("s")).first()
    assert row.s == 59.5  # unix_timestamp() would have truncated to 60-0=60... wrong


def test_non_ansi_cast_nulls_malformed_input(spark):
    """Engine semantics decision (SURVEY §1.3 / session.py): PG raises on
    malformed casts, Spark non-ANSI nulls them — we pin null-on-error and
    let data-quality tests catch the rows."""
    df = spark.createDataFrame([("12", "oops", "3.5x")], "a string, b string, c string")
    row = df.select(
        F.col("a").cast("int").alias("a"),
        F.col("b").cast("int").alias("b"),
        F.col("c").cast("double").alias("c"),
    ).first()
    assert row.a == 12
    assert row.b is None
    assert row.c is None


class TestWebFunctions:
    """functions/web: canonical URL dedup keys — pure Catalyst (no Python
    eval in the plan, asserted), adversarial crawl URLs."""

    def test_canonicalize_url(self, spark):
        from data_etl_with_dbt_spark.functions.web import canonicalize_url

        cases = [
            # tracking params drop, survivors sort, default port + case
            ("http://Example.com:80/a/?utm_source=x&b=2&a=1#s",
             "http://example.com/a?a=1&b=2"),
            ("http://example.com/a?a=1&b=2", "http://example.com/a?a=1&b=2"),
            # https default port, trailing slash, fragment
            ("https://A.com:443/", "https://a.com"),
            ("https://a.com", "https://a.com"),
            ("https://a.com/p/#x", "https://a.com/p"),
            # all-tracking query drops its '?'
            ("https://a.com/p?utm_campaign=c&fbclid=z", "https://a.com/p"),
            # non-default port kept; userinfo stripped
            ("http://u:pw@a.com:8080/x", "http://a.com:8080/x"),
            # non-URL garbage passes through unchanged
            ("not a url", "not a url"),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
        assert got == [want for _, want in cases]

    def test_host_and_registered_domain(self, spark):
        from data_etl_with_dbt_spark.functions.web import (
            url_host,
            url_registered_domain,
        )

        df = spark.createDataFrame(
            [("https://Sub.News.Example.COM/x?q=1",), ("https://a.com/",)],
            "url string",
        )
        out = df.select(
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
            url_registered_domain("url", levels=3).alias("d3"),
        ).collect()
        assert (out[0].h, out[0].d, out[0].d3) == (
            "sub.news.example.com", "example.com", "news.example.com",
        )
        assert (out[1].h, out[1].d) == ("a.com", "a.com")

    def test_url_features_shapes(self, spark):
        from data_etl_with_dbt_spark.functions.web import url_features

        df = spark.createDataFrame(
            [
                (1, "https://10.0.3.1/p9"),
                (2, "https://shop.example.com:8443/a/b/c?x=1&y=2"),
                (3, "https://example.com"),
                (4, "https://a1b2c.www.example.co.uk/deep/a/b/c/d/e"),
            ],
            "id long, url string",
        )
        out = {
            r.id: r for r in df.select("id", *url_features("url")).collect()
        }
        r = out[1]
        assert (r.host, r.path_depth, r.n_query_params) == ("10.0.3.1", 1, 0)
        assert r.is_ip_host and not r.has_port
        assert r.n_host_digits == 5 and r.n_host_labels == 4
        r = out[2]
        assert (r.host, r.path_depth, r.n_query_params) == (
            "shop.example.com", 3, 2)
        assert r.has_port and not r.is_ip_host
        r = out[3]
        assert (r.path_depth, r.n_query_params, r.n_host_labels) == (0, 0, 2)
        r = out[4]
        assert (r.path_depth, r.n_host_labels, r.n_host_digits) == (6, 5, 2)

    def test_url_features_unparseable_host_yields_nulls_not_sentinels(
        self, spark
    ):
        """Java parse_url REJECTS a dotted quad with an octet > 255 (a
        regex would match it) — host-derived features must come back
        NULL, never size(NULL)'s -1 sentinel (subset70 regression)."""
        from data_etl_with_dbt_spark.functions.web import url_features

        df = spark.createDataFrame(
            [(1, "https://10.0.273.1/p")], "id long, url string"
        )
        r = df.select("id", *url_features("url")).collect()[0]
        assert r.host is None
        assert r.n_host_labels is None and r.n_host_digits is None
        assert r.is_ip_host is None
        assert r.has_port is None  # same failure mode as the other flags
        assert r.path_depth == 1 and r.url_len == 20

    def test_stays_jvm_side(self, spark):
        from data_etl_with_dbt_spark.functions.web import canonicalize_url
        from data_etl_with_dbt_spark.plans import lint

        df = spark.range(10).select(
            canonicalize_url(
                F.concat(F.lit("https://h.com/p?utm_a=1&k="), F.col("id"))
            ).alias("c")
        )
        assert not any(
            f.code == "python-eval" for f in lint.lint_plan(df)
        )
        got = {r.c for r in df.collect()}
        assert "https://h.com/p?k=3" in got


def test_epoch_seconds_matches_pg_interval_decomposition(spark):
    """Round-5 review: PG evaluates EXTRACT(EPOCH FROM e - s) on the
    interval's (days, microseconds) decomposition — fl(days*86400 +
    fl(us/1e6)) — which differs from fl(fl(e) - fl(s)) by 1 ULP on many
    pairs. Pin the exact decomposition bit-for-bit on pairs spanning
    sub-second to multi-century gaps (including one where the old
    double-cast spelling provably diverges)."""
    import datetime as dt

    pairs = [
        (dt.datetime(2024, 1, 1, 0, 0, 0, 1), dt.datetime(2024, 1, 1, 0, 0, 1, 500001)),
        (dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 15, 7, 13, 59, 123457)),
        (dt.datetime(1971, 7, 4, 1, 2, 3, 400000), dt.datetime(2244, 11, 30, 23, 59, 59, 999999)),
        (dt.datetime(2024, 6, 1, 12), dt.datetime(2024, 6, 1, 11, 59, 59, 999999)),  # negative
    ]
    us_day = 86_400_000_000
    epoch = dt.datetime(1970, 1, 1)

    def micros(t):
        d = t - epoch
        return d.days * us_day + d.seconds * 10**6 + d.microseconds

    def pg_epoch(s, e):
        dus = micros(e) - micros(s)
        # Spark's % follows the dividend sign; mirror that here
        rem = dus % us_day if dus >= 0 else -((-dus) % us_day)
        days_us = dus - rem
        return (days_us / us_day) * 86400 + rem / 1e6

    df = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(pairs)], "i long, s timestamp, e timestamp"
    )
    got = {r.i: r.sec for r in df.select("i", epoch_seconds("e", "s").alias("sec")).collect()}
    diverged = 0
    for i, (s, e) in enumerate(pairs):
        expect = pg_epoch(s, e)
        assert got[i] == expect, (i, got[i].hex(), expect.hex())
        naive = (e - epoch).total_seconds() - (s - epoch).total_seconds()
        if naive != expect:
            diverged += 1
    assert diverged >= 1  # at least one pair shows the 1-ULP class is real
