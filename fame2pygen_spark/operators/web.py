"""URL / domain operators for web-corpus curation.

Not present in the reference — north-star training-pipeline surface.
Web pipelines (C4, RefinedWeb — public papers) filter documents by the
domains they reference or originate from: extract URLs, reduce to
registrable domains, aggregate per-domain counts, drop documents whose
domains hit a blocklist.

Scale shape: URL extraction and domain reduction are pure column
algebra (`regexp_extract_all` + `transform`) inside the scan stage; the
per-domain aggregate is one uniform-key shuffle; the blocklist is
broadcast (blocklists are KBs — a literal array or a tiny frame).
Patterns avoid lookarounds so Java regex (Spark) and RE2 (DuckDB
oracle) match identically — the portability is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: scheme://host[:port][/path] — host captured by a later extract
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\s]*)?"

#: host inside a single URL string
_HOST_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(col: Column) -> Column:
    """All URLs in the text (array<string>, document order)."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), 0)


def url_domain(url: Column) -> Column:
    """Lower-cased host of one URL (empty string if malformed)."""
    return F.lower(F.regexp_extract(url, _HOST_PATTERN, 1))


def doc_domains(col: Column) -> Column:
    """Distinct lower-cased domains referenced by the text."""
    return F.array_distinct(
        F.transform(extract_urls(col), lambda u: url_domain(u))
    )


def domain_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``(domain, n_docs, n_urls)`` — how often each domain appears.

    ``n_docs`` counts documents referencing the domain at least once
    (distinct per doc before the explode); ``n_urls`` counts every URL
    occurrence.  One explode, one uniform-key aggregation.
    """
    urls = df.select(
        F.explode(extract_urls(F.col(text_col))).alias("url")
    ).select(url_domain(F.col("url")).alias("domain"))
    n_urls = urls.groupBy("domain").agg(F.count("*").alias("n_urls"))
    docs = df.select(
        F.explode(doc_domains(F.col(text_col))).alias("domain")
    ).groupBy("domain").agg(F.count("*").alias("n_docs"))
    return docs.join(n_urls, on="domain", how="inner")


def flag_blocked_domains(
    df: DataFrame,
    text_col: str,
    blocklist: list[str],
) -> DataFrame:
    """*df* plus ``n_blocked_domains`` and boolean ``blocked`` — true
    when the text references any blocklisted domain.

    The blocklist rides as a literal array (map-side `array_intersect`,
    no join, no shuffle); for blocklists beyond a few thousand entries
    switch to a broadcast-join variant.
    """
    bl = F.array(*[F.lit(d.lower()) for d in blocklist])
    hits = F.size(F.array_intersect(doc_domains(F.col(text_col)), bl))
    return df.withColumns(
        {
            "n_blocked_domains": hits.cast("long"),
            "blocked": hits > 0,
        }
    )


#: query parameters stripped by canonicalize_url (tracking only)
TRACKING_PARAM_PATTERN = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of one URL for dedup/aggregation: lower-cased
    host without ``www.`` or default port, path without trailing
    slashes, query without tracking parameters (``utm_*``, ``gclid``,
    ``fbclid``), fragment dropped, scheme dropped.

    Built from anchored extracts plus an array filter over the split
    query string — deliberately NO regex backreferences (Java and RE2
    spell them differently, which would break oracle parity) and no
    positional replace (Spark's regexp_replace replaces all matches,
    DuckDB's replaces the first).  Row-local; rides inside the scan.
    """
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(url, r"https?://([^/?#]+)", 1)),
            r"^www\.",
            "",
        ),
        r":(80|443)$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"https?://[^/?#]+([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    return F.concat(
        host,
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )


def canonical_url_counts(
    df: DataFrame, text_col: str, *, top_n: int = 100
) -> DataFrame:
    """Reference counts per canonical URL across a corpus:
    ``(canonical_url, n_refs)``, top-*top_n* by count (URL as
    tie-break) — the dedup view of outbound links that raw-string
    counting fragments across tracking params, schemes, and casing.

    One explode + canonicalization inside the scan stage, one
    uniform-key count, a top-n heap.
    """
    urls = df.select(
        F.explode(extract_urls(F.col(text_col))).alias("url")
    ).select(canonicalize_url(F.col("url")).alias("canonical_url"))
    return (
        urls.where(F.col("canonical_url") != "")
        .groupBy("canonical_url")
        .agg(F.count("*").cast("long").alias("n_refs"))
        .orderBy(F.col("n_refs").desc(), F.col("canonical_url").asc())
        .limit(int(top_n))
    )


def robots_rules_eval(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str,
    path_col: str = "path",
    allow_col: str = "allow",
) -> DataFrame:
    """robots.txt-style longest-match evaluation (REP, RFC 9309 §2.2.2):
    each URL path is checked against a prefix-rule table and the
    LONGEST matching rule wins (allow beats disallow only by being
    more specific; an empty-match URL is allowed by default).  The
    crawler-side gate every web-scale corpus ingest runs before
    fetching — rules are a tiny broadcast table, the match is a
    broadcast join + ``startswith`` + a longest-prefix rank, never a
    regex engine in the hot path.

    *rules* columns: *path_col* (the prefix) and *allow_col*
    (boolean-ish).  Ties on length break toward ALLOW (RFC 9309's
    least-restrictive rule).

    Output: ``(url, matched_rule, allowed)`` one row per input URL,
    ordered by url.
    """
    u = urls.select(F.col(url_col).alias("url")).where(
        F.col("url").isNotNull()
    )
    r = rules.select(
        F.col(path_col).alias("rp"),
        F.col(allow_col).cast("int").alias("ra"),
    )
    cand = u.join(
        F.broadcast(r), F.col("url").startswith(F.col("rp")), "left"
    )
    wm = Window.partitionBy("url").orderBy(
        F.desc(F.length(F.coalesce(F.col("rp"), F.lit("")))),
        F.desc(F.coalesce(F.col("ra"), F.lit(1))),
    )
    return (
        cand.withColumn("rk", F.row_number().over(wm))
        .where(F.col("rk") == 1)
        .select(
            "url",
            F.col("rp").alias("matched_rule"),
            F.coalesce(F.col("ra"), F.lit(1)).alias("allowed"),
        )
        .orderBy("url")
    )
