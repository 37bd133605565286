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

from pyspark.sql import Column, DataFrame, functions as F

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
