"""Web/URL expressions — pure Catalyst (JVM-side, codegen-friendly; no
Python in the hot path), built for the crawl-side operators
(sources/warc) and the URL-dedup family (suite/llm_ops
url_dedup_documents keeps the cruder strip-everything form as its
oracle-verified baseline).

``canonicalize_url`` is the first-pass dedup key real pipelines use: the
same page fetched as ``http://Example.com:80/a/?utm_source=x&b=2&a=1#s``
and ``http://example.com/a?a=1&b=2`` must collapse. Everything is
string/array expressions — ``parse_url`` + higher-order filters — so the
canonicalization runs inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page content — the strip list every
#: crawl pipeline carries (analytics/click attribution)
TRACKING_PARAMS_PATTERN = (
    r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src"
    r"|spm|yclid|_ga|s_cid|vero_id|wickedid|oly_enc_id|oly_anon_id)="
)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an http(s) URL, as one Catalyst expression:

    * scheme and host lowercased; explicit default ports dropped
      (``:80`` for http, ``:443`` for https)
    * fragment dropped (never names a distinct resource)
    * tracking query parameters dropped (:data:`TRACKING_PARAMS_PATTERN`);
      the survivors SORTED so parameter order stops mattering; empty
      query drops its ``?``
    * trailing slash normalized off the path (bare host keeps no slash:
      ``https://a.com/`` == ``https://a.com``)

    Non-URL strings (no ``://``) pass through lowercased-scheme-less —
    garbage in, stable garbage out; the dedup key stays deterministic.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    authority = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    # strip userinfo if present, then the scheme's default port
    host_port = F.regexp_replace(authority, r"^[^@]*@", "")
    host_port = F.when(
        scheme == "http", F.regexp_replace(host_port, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host_port, r":443$", "")
    ).otherwise(host_port)
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    # trailing slash off ('/a/' == '/a'); the bare-root path '/' drops too
    path = F.regexp_replace(path, r"/+$", "")
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS_PATTERN),
        )
    )
    # reference the sorted-filter subtree ONCE: higher-order functions are
    # interpreted with no common-subexpression elimination, so a CASE that
    # tests qs and then concats qs would evaluate the sort twice per row.
    # concat('?', qs) collapsed back to '' when the query was empty does
    # the conditional with a single evaluation.
    qs = F.regexp_replace(
        F.concat(F.lit("?"), F.array_join(kept, "&")), r"^\?$", ""
    )
    canon = F.concat(scheme, F.lit("://"), host_port, path, qs)
    # the passthrough guard re-derives host presence from parse_url(HOST)
    # instead of repeating the host_port regexp chain
    return F.when(
        scheme.isNull() | F.parse_url(u, F.lit("HOST")).isNull(), u
    ).otherwise(canon)


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL (``parse_url`` JVM-side) — the grouping
    key for domain quotas, host link graphs, and per-site stats."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(u, F.lit("HOST")))


def url_registered_domain(url: Column | str, levels: int = 2) -> Column:
    """Last ``levels`` host labels (``example.co.uk`` needs levels=3 for
    ccTLD registries — a full public-suffix list is a data file, not an
    expression; two levels is the common-crawl-style default). Grouping
    key one notch coarser than :func:`url_host`."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= levels, host).otherwise(
        F.array_join(F.slice(parts, n - levels + 1, levels), ".")
    )


def url_features(url: Column | str) -> list[Column]:
    """URL-SHAPE features for crawl filtering — the Dolma/RefinedWeb-style
    URL rules pipelines apply BEFORE fetching or scoring content (deep
    machine-generated paths, parameter farms, raw-IP hosts, and
    digit-heavy subdomains are the classic spam shapes): a list of named
    Columns to splice next to the url in one projection.

    * ``host`` — lowercased, port-less (:func:`url_host`)
    * ``path_depth`` — non-empty path segments
    * ``n_query_params`` — non-empty ``&``-separated params
    * ``n_host_labels`` — dot-separated host labels (subdomain depth)
    * ``n_host_digits`` — ASCII digits in the host
    * ``url_len`` — raw string length
    * ``is_ip_host`` — dotted-quad host
    * ``has_port`` — explicit port in the authority

    All ``parse_url`` + array expressions — JVM codegen beside the scan,
    the canonicalize_url convention. Counts BIGINT, flags BOOLEAN, so a
    downstream gate composes thresholds without float traffic.

    Unparseable-host URLs (Java's ``parse_url`` REJECTS e.g. a dotted
    quad with an octet > 255, returning NULL where a regex would match)
    yield NULL host and NULL host-derived counts/flags — never ``-1``
    (``size(NULL)``'s legacy sentinel must not leak into a feature
    column a threshold gate would compare against)."""
    u = F.col(url) if isinstance(url, str) else url
    host = url_host(u)
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda p: p != "")
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    # NO coalesce, and gated on host validity below: Java's parse_url
    # returns an AUTHORITY even for URLs whose HOST it rejects (octet >
    # 255 dotted quads), so an ungated rlike would claim "no port" about
    # a URL the other host-derived flags (is_ip_host, n_host_labels)
    # call unparseable — has_port must share their NULL failure mode
    authority = F.parse_url(u, F.lit("AUTHORITY"))
    n_labels = F.when(
        host.isNotNull(), F.size(F.split(host, r"\."))
    )
    return [
        host.alias("host"),
        F.size(segs).cast("bigint").alias("path_depth"),
        F.size(params).cast("bigint").alias("n_query_params"),
        n_labels.cast("bigint").alias("n_host_labels"),
        F.regexp_count(host, F.lit(r"\d")).cast("bigint").alias(
            "n_host_digits"
        ),
        F.length(u).cast("bigint").alias("url_len"),
        host.rlike(r"^(\d{1,3}\.){3}\d{1,3}$").alias("is_ip_host"),
        F.when(host.isNotNull(), authority.rlike(r":\d+$")).alias(
            "has_port"
        ),
    ]
