"""OLAP summary operators: hierarchical rollup / cube aggregation.

Classic multidimensional reporting over a star schema — subtotals at
every prefix of the dimension hierarchy (ROLLUP) or every dimension
subset (CUBE), computed in one pass.

Scale shape: Spark expands rollup/cube into a single Expand + hash
aggregation — one shuffle keyed by (grouping-set id, dims), NOT one
job per level; dimension tables join broadcast before the expansion so
the fact scan is the only large input.  Subtotal rows carry NULL in
the rolled-up dimensions plus an explicit ``grouping_id`` so they are
distinguishable from genuine NULL dimension values (the ANSI
GROUPING() semantics — engine-portable).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["rollup_summary", "cube_summary", "association_rules"]


def _summarize(
    grouped, measures: Mapping[str, Column], dims: Sequence[str]
) -> DataFrame:
    aggs = [c.alias(name) for name, c in measures.items()]
    return grouped.agg(
        F.grouping_id(*dims).cast("long").alias("grouping_id"), *aggs
    )


def rollup_summary(
    df: DataFrame,
    dims: Sequence[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """Hierarchical subtotals: one row per group at every prefix level
    of *dims* (full detail → per-first-dim → grand total).

    *measures* maps output column name → aggregate Column expression.
    Output: *dims* (NULL where rolled up) + ``grouping_id`` + measures.
    """
    dims = list(dims)
    return _summarize(df.rollup(*dims), measures, dims)


def cube_summary(
    df: DataFrame,
    dims: Sequence[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """Subtotals for EVERY subset of *dims* (2^n grouping sets) — same
    output contract as :func:`rollup_summary`."""
    dims = list(dims)
    return _summarize(df.cube(*dims), measures, dims)


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_count: int = 2,
    max_items_per_basket: int = 32,
) -> DataFrame:
    """Market-basket association rules (Agrawal & Srikant 1994):
    for every ordered item pair (A → B) co-occurring in at least
    *min_pair_count* baskets, the classic support / confidence / lift
    triple — the co-purchase / co-occurrence miner that complements
    PMI (x39) with basket-level (not window-level) semantics and the
    support-pruned rule form BI tools expect.

    ``support = n(A,B)/N``, ``confidence = n(A,B)/n(A)``,
    ``lift = confidence / (n(B)/N)`` — lift > 1 ⇒ positive
    association beyond item popularity.

    Scale shape: baskets deduplicate to distinct (basket, item) rows
    first (one keyed shuffle); each basket is capped at
    *max_items_per_basket* items (deterministic lexical cut via a
    basket-keyed row_number) so pair generation is bounded by
    C(cap, 2) per basket — the same quadratic-guard rule as the PMI
    per-doc term cap; item marginals are one keyed agg joined on the
    item key, and the basket total is a 1-row broadcast.  All counts
    are exact BIGINTs; the three ratios are single double
    compositions.

    Output: ``(antecedent, consequent, n_both, n_ante, n_cons,
    support, confidence, lift)``, both rule directions per pair.
    """
    items = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    wb = Window.partitionBy("basket").orderBy("item")
    items = (
        items.withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") <= max_items_per_basket)
        .drop("__rn")
    )
    items = items.localCheckpoint(eager=True)
    n_baskets = items.select(
        F.countDistinct("basket").alias("__nb")
    )
    marg = items.groupBy("item").agg(F.count(F.lit(1)).alias("__ni"))
    a = items.select("basket", F.col("item").alias("ia"))
    b = items.select("basket", F.col("item").alias("ib"))
    pairs = (
        a.join(b, on="basket")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("__nab"))
        .where(F.col("__nab") >= F.lit(int(min_pair_count)))
    )
    # both rule directions from each canonical pair
    rules = pairs.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "__nab",
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"),
            "__nab",
        )
    )
    ma = marg.select(F.col("item").alias("antecedent"), F.col("__ni").alias("__na"))
    mc = marg.select(F.col("item").alias("consequent"), F.col("__ni").alias("__nc"))
    out = (
        rules.join(ma, on="antecedent")
        .join(mc, on="consequent")
        .crossJoin(F.broadcast(n_baskets))
    )
    support = F.col("__nab").cast("double") / F.col("__nb").cast("double")
    confidence = F.col("__nab").cast("double") / F.col("__na").cast("double")
    lift = F.try_divide(
        confidence, F.col("__nc").cast("double") / F.col("__nb").cast("double")
    )
    return out.select(
        "antecedent",
        "consequent",
        F.col("__nab").cast("long").alias("n_both"),
        F.col("__na").cast("long").alias("n_ante"),
        F.col("__nc").cast("long").alias("n_cons"),
        F.round(support, 6).alias("support"),
        F.round(confidence, 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
    )
