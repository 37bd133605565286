"""Declarative data-quality audit: a Deequ-style expectation report
computed in ONE stacked scan.

The reference engine has no validation surface (caller supplies a
clean frame, /root/reference/README.md:359-364); at 100 TB nothing
arrives clean, and a pipeline that silently ingests violations
poisons every downstream aggregate.  The production pattern is a
rule-set evaluated as a single pass over the fact table — NOT one
job per rule: N rules as N conditional counters inside one hash
aggregation costs the same scan as one rule, while N separate
``df.filter(...).count()`` jobs cost N full scans.

Each rule is ``(checked, violated)`` — two boolean Columns.  A row
enters the denominator only when *checked* is true (e.g. a
cross-table rule only applies to rows where the join found a match),
and counts as a violation when *violated* is also true.  The report
is one row per rule: ``(rule, n_checked, n_violations,
violation_rate)`` — the shape a data-quality dashboard ingests.

Scale: the aggregation is a 1-row global combine (map-side partials,
singleton reduce); the unpivot to per-rule rows is a driver-free
``stack`` over that single row.  Adding rules never adds scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["dq_report", "standard_rules"]


def dq_report(
    df: DataFrame,
    rules: dict[str, tuple[Column, Column]],
) -> DataFrame:
    """Evaluate *rules* (name -> (checked, violated)) in one scan.

    Returns ``(rule, n_checked, n_violations, violation_rate)`` with
    the rate rounded to 6 dp (null when nothing was checked), ordered
    by rule name.  Counts are exact longs — integer aggregation is
    accumulation-order-insensitive, so the report is bitwise
    reproducible across partitionings.
    """
    if not rules:
        raise ValueError("need at least one rule")
    aggs = []
    for name, (checked, violated) in rules.items():
        aggs.append(
            F.count(F.when(checked, 1)).cast("long").alias(f"__c_{name}")
        )
        aggs.append(
            F.count(F.when(checked & violated, 1))
            .cast("long")
            .alias(f"__v_{name}")
        )
    one = df.agg(*aggs)

    stack_args = []
    for name in rules:
        stack_args += [
            F.lit(name),
            F.col(f"__c_{name}"),
            F.col(f"__v_{name}"),
        ]
    n = len(rules)
    stacked = one.select(
        F.stack(F.lit(n), *stack_args).alias("rule", "n_checked", "n_violations")
    )
    return stacked.select(
        "rule",
        "n_checked",
        "n_violations",
        F.round(
            F.try_divide(
                F.col("n_violations").cast("double"),
                F.col("n_checked").cast("double"),
            ),
            6,
        ).alias("violation_rate"),
    ).orderBy("rule")


def standard_rules(
    *,
    not_null: list[str] = (),
    positive: list[str] = (),
    domains: dict[str, list[str]] | None = None,
) -> dict[str, tuple[Column, Column]]:
    """Build common single-column rules: completeness, positivity,
    and value-domain membership.  Null handling: a null value VIOLATES
    positivity and domain rules (an unknown value is not a valid one),
    matching the completeness convention."""
    rules: dict[str, tuple[Column, Column]] = {}
    for c in not_null:
        rules[f"{c}__not_null"] = (F.lit(True), F.col(c).isNull())
    for c in positive:
        rules[f"{c}__positive"] = (
            F.lit(True),
            F.coalesce(F.col(c) <= 0, F.lit(True)),
        )
    for c, vals in (domains or {}).items():
        rules[f"{c}__domain"] = (
            F.lit(True),
            F.coalesce(~F.col(c).isin(list(vals)), F.lit(True)),
        )
    return rules


def k_anonymity(
    df: DataFrame, qi_cols: list[str], *, k: int
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one row
    per distinct QI group with its size and whether it violates the
    anonymity threshold (``group_size < k`` — individuals in such a
    group are re-identifiable by joining public attributes).

    The standard pre-release privacy gate: before publishing or
    sharing a derived dataset, every QI equivalence class must reach
    size >= k, else those rows need suppression or generalization
    (coarser buckets).  Complements the content-level PII scrub
    (operators/pii.py) — that removes identifiers IN values, this
    measures identifiability FROM attribute combinations.

    One hash aggregation keyed by the QI columns; the output is
    |distinct QI combos|, not rows — safe to collect for dimension-
    sized QI spaces and still a DataFrame for wide ones.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
    ).withColumn("violates_k", F.col("group_size") < F.lit(int(k)))
