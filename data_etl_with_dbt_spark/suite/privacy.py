"""Privacy-pipeline operators: right-to-be-forgotten impact analysis and a
seeded differential-privacy noise mechanism. Together with the masking
policy views (``masked_customer_view``) and entity redaction
(``redact_entities``) these cover the privacy surface a data platform is
asked for first: what would a deletion touch, and how to publish counts
without publishing users.

Determinism: the DP mechanism derives its noise from md5 of the release
label + cell key (the repo's md5→uniform bridge), making the release
reproducible and oracle-checkable. A PRODUCTION DP release must use fresh
secret randomness — a rerunnable seed voids the privacy guarantee by
definition; the operator documents this and takes the seed explicitly so
callers can't stumble into it silently."""

from __future__ import annotations

from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize

from data_etl_with_dbt_spark.suite.registry import big, dec6, load, query


@query(
    "cascade_delete_impact",
    oracle="""
    WITH subjects AS (
        SELECT c_custkey, c_nationkey FROM customer
        WHERE substr(md5('forget:' || CAST(c_custkey AS VARCHAR)), 1, 3) < '0cc'
    ),
    ord AS (
        SELECT s.c_nationkey, o.o_orderkey
        FROM subjects s JOIN orders o ON o.o_custkey = s.c_custkey
    ),
    subs_n AS (
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_subjects
        FROM subjects GROUP BY c_nationkey
    ),
    ord_n AS (
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM ord GROUP BY c_nationkey
    ),
    li_n AS (
        SELECT o.c_nationkey, CAST(count(*) AS BIGINT) AS n_lineitems
        FROM ord o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.c_nationkey
    )
    SELECT n.n_name AS nation,
           s.n_subjects,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(li.n_lineitems, 0) AS n_lineitems
    FROM subs_n s
    JOIN nation n ON n.n_nationkey = s.c_nationkey
    LEFT JOIN ord_n o ON o.c_nationkey = s.c_nationkey
    LEFT JOIN li_n li ON li.c_nationkey = s.c_nationkey
    """,
    description=(
        "Right-to-be-forgotten impact plan: for a deterministic ~5% subject "
        "cohort, rows to cascade-delete per nation across customer -> "
        "orders -> lineitem"
    ),
)
def cascade_delete_impact(spark, sf_dir):
    """The deletion planner a GDPR/CCPA erasure job runs before touching
    data: subjects semi-drive the fact tables through their FK chain. Each
    hop joins on the key the previous hop grouped on; at 100 TB the subject
    set broadcasts and the facts never shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    gate = (
        F.substring(
            F.md5(F.concat(F.lit("forget:"), F.col("c_custkey").cast("string"))), 1, 3
        )
        < "0cc"
    )
    # subjects feeds THREE consumers and ords feeds TWO — without lineage
    # cuts the md5 gate over customer evaluates three times and the
    # subjects⋈orders join twice (no cross-consumer CSE)
    subjects = (
        c.where(gate).select("c_custkey", "c_nationkey").transform(materialize)
    )
    ords = (
        subjects.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_nationkey", "o_orderkey")
        .transform(materialize)
    )
    subs_n = subjects.groupBy("c_nationkey").agg(
        big(F.count(F.lit(1))).alias("n_subjects")
    )
    ord_n = ords.groupBy("c_nationkey").agg(big(F.count(F.lit(1))).alias("n_orders"))
    li_n = (
        ords.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_nationkey")
        .agg(big(F.count(F.lit(1))).alias("n_lineitems"))
    )
    # nation-keyed rollups (25 rows each) join without fan-out; with the
    # cuts above each fact table is genuinely touched once per action.
    return (
        subs_n.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(ord_n.withColumnRenamed("c_nationkey", "nk2")), F.col("nk2") == F.col("c_nationkey"), "left")
        .join(F.broadcast(li_n.withColumnRenamed("c_nationkey", "nk3")), F.col("nk3") == F.col("c_nationkey"), "left")
        .select(
            F.col("n_name").alias("nation"),
            "n_subjects",
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce("n_lineitems", F.lit(0)).cast("bigint").alias("n_lineitems"),
        )
    )


@query(
    "dp_noisy_counts",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_true FROM events GROUP BY event_type
    ),
    noise AS (
        SELECT event_type, n_true,
               (CAST(CAST('0x' || substr(md5('dp-release-1:' || event_type), 1, 6) AS BIGINT) AS DOUBLE)
                + CAST(0.5 AS DOUBLE)) / CAST(16777216 AS DOUBLE) AS u
        FROM cells
    )
    SELECT event_type, n_true,
           CAST(CAST(
               CAST(n_true AS DOUBLE)
               - (CAST(1 AS DOUBLE) / CAST(1.0 AS DOUBLE))
                 * CASE WHEN u >= CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
                 * ln(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) * abs(u - CAST(0.5 AS DOUBLE)))
           AS DECIMAL(38,6)) AS DOUBLE) AS noisy_count
    FROM noise
    """,
    description=(
        "Laplace-mechanism count release (eps=1, sensitivity 1) with "
        "md5-seeded inverse-CDF noise — reproducible for the oracle check; "
        "audit mode emits the true count beside it"
    ),
)
def dp_noisy_counts(spark, sf_dir):
    """The Laplace mechanism on a count query: noise = -(1/eps) * sgn(U-.5)
    * ln(1-2|U-.5|) with U from the md5-uniform bridge keyed by (release
    label, cell). Seeded noise makes the release rerunnable and testable;
    a real DP deployment must draw U fresh and secret per release (a
    reproducible draw has zero privacy value) — this entry is the
    mechanism's engine plumbing plus an audit view, not a DP guarantee."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy("event_type").agg(big(F.count(F.lit(1))).alias("n_true"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp-release-1:"), F.col("event_type"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint").cast("double")
        + F.lit(0.5)
    ) / F.lit(16777216).cast("double")
    sgn = F.when(u >= F.lit(0.5), F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = (F.lit(1.0) / F.lit(1.0)) * sgn * F.log(
        F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    )
    return cells.select(
        "event_type",
        "n_true",
        dec6(F.col("n_true").cast("double") - noise).alias("noisy_count"),
    )


# ---------------------------------------------------------------------------
# Structured PII scrubbing (textan.scrub_pii): residue-coded PII injection
# (the fixture text carries no emails/phones, so each doc gets synthetic
# PII derived from its id) -> per-kind counts + masked-text digest. A
# per-row pass with no key assumptions, so it is dup2-safe by construction.
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b"
_PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"


@query(
    "pii_scrub_documents",
    oracle=rf"""
    WITH injected AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@example.com' ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN ' tel 555-010-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.0.1' ELSE '' END AS t
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(
               t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                  '{_PII_PHONE}', '<PHONE>', 'g'),
                  '{_PII_IPV4}', '<IPV4>', 'g')) AS scrubbed_hash
    FROM injected
    """,
    description=(
        "Structured PII scrubbing (textan.scrub_pii — the C4-style "
        "pre-training redaction pass): emails/phones/IPv4s injected into "
        "each document by id residues, per-kind counts audited on the "
        "original text, masks applied in kind order; patterns stay in the "
        "Java-regex∩RE2 subset so the oracle re-runs them verbatim — "
        "pure per-row JVM codegen, no shuffle, dup2-safe by construction"
    ),
)
def pii_scrub_documents(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.textan import scrub_pii

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" contact u"), did.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit(" tel 555-010-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" from 10."), (did % 256).cast("string"),
                    F.lit(".0.1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = scrub_pii(injected, "doc_id", "text")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_email",
        "n_phone",
        "n_ipv4",
        F.md5("scrubbed_text").alias("scrubbed_hash"),
    )
