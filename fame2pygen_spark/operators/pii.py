"""PII detection and redaction over a text column.

Not present in the reference — north-star training-pipeline surface
(public pipelines scrub emails / IPs / phone numbers before training;
see e.g. the BigCode/StarCoder data-processing reports).  Everything
here is pure column algebra: `regexp_extract_all` for counts,
`regexp_replace` for redaction — JVM-side, whole-stage-codegen, zero
shuffles, so the scrub rides inside the parquet scan stage at 100 TB.

Pattern notes: the regexes avoid lookarounds and backreferences so the
same pattern text runs identically under Java regex (Spark) and RE2
(DuckDB oracle) — that portability is part of the operator contract,
since the oracle must reproduce redaction byte-for-byte.  Patterns are
applied in declaration order; replacement tokens (`<EMAIL>` etc.)
contain no digits or ``@`` so later patterns cannot re-match earlier
redactions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (name, pattern, replacement) in application order.  Order matters:
#: emails before phones (an email's digits must not be phone-matched),
#: SSN before generic phone shapes.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type match counts (dict of name → int Column)."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def redact_text(col: Column) -> Column:
    """*col* with every PII pattern replaced by its token, in order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str) -> DataFrame:
    """*df* with *text_col* redacted in place, plus per-type
    ``n_pii_<type>`` counts (measured pre-redaction) and a total
    ``n_pii``.  One scan, no shuffle.
    """
    t = F.col(text_col)
    counts = pii_counts(t)
    named = {f"n_pii_{k}": v.cast("long") for k, v in counts.items()}
    total = None
    for v in named.values():
        total = v if total is None else total + v
    # one withColumns call: every expression below references the
    # *input* frame's text_col, so counts see pre-redaction text
    return df.withColumns(
        {**named, "n_pii": total, text_col: redact_text(t)}
    )
