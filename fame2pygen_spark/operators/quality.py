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

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "dq_report", "standard_rules", "cohens_kappa", "auc_rank",
    "kappa_from_confusion", "t_closeness", "average_precision",
    "calibration_report", "krippendorff_alpha", "conformal_threshold",
    "clustering_agreement", "woe_iv", "normal_p_two_sided", "normal_sf", "bh_fdr",
    "smd_balance", "wilson_intervals", "isotonic_fit",
]


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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed reconciliation of two table snapshots: every key tagged
    ``added | removed | changed | unchanged`` with per-column change
    flags — the diff a data-reconciliation / CDC-validation job
    publishes after each load (and the inverse check for
    :func:`~fame2pygen_spark.operators.temporal.cdc_apply`: applying a
    changelog then diffing against the expected snapshot must yield
    all-unchanged).

    One full outer join on the key — the only scalable formulation;
    comparisons are null-safe (``<=>``) so NULL→value transitions
    count as changes, not as matches.

    Returns ``(key_cols..., change_type, changed_cols)`` where
    changed_cols is a sorted comma-joined list (empty string when not
    'changed').
    """
    keys = list(key_cols)
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_arr = F.array_sort(
        F.filter(F.array(*diffs), lambda x: x.isNotNull())
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_arr) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in keys
        ],
        change_type.alias("change_type"),
        F.when(
            change_type == "changed", F.array_join(changed_arr, ",")
        )
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def cohens_kappa(
    df: DataFrame,
    label_a_col: str,
    label_b_col: str,
    *,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Cohen's kappa chance-corrected agreement between two labelers
    over paired items (Cohen 1960) — the standard QC statistic for
    annotation pipelines: raw percent-agreement overstates label
    quality when the class distribution is skewed (two raters who
    both answer the majority class 90% of the time "agree" 81% by
    luck); kappa = (p_o − p_e)/(1 − p_e) subtracts that chance floor.
    For RLHF/preference datasets this is the per-task gate before
    labels are trusted for reward-model training.

    Input: one row per doubly-labeled item with the two labels (rows
    where either label is null are excluded — not co-labeled).

    Scale shape: three map-side-combinable aggregations (the agree/n
    counts, and one marginal count per rater), joined on the tiny
    (group × label) key set — no shuffle touches item granularity
    twice, nothing is quadratic.  Engine-exactness: p_e is assembled
    from the INTEGER cross-moment Σ_k nA_k·nB_k divided once by n²
    (integer sums are order-insensitive; one double division is
    deterministic), p_o = agree/n likewise — no float accumulation
    anywhere.

    Output: ``*group_cols, n_items, po, pe, kappa`` (6 dp), one row
    per group.  Degenerate group where p_e = 1 (both raters constant
    and identical): kappa is null (0/0 chance correction).
    """
    g = [F.col(c) for c in group_cols]
    a, b = F.col(label_a_col), F.col(label_b_col)
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        *g, a.alias("__a"), b.alias("__b")
    )
    gnames = list(group_cols)

    def by(keys):
        return base.groupBy(*keys) if keys else base.groupBy()

    totals = by(gnames).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(F.when(F.col("__a") == F.col("__b"), 1)).alias("__agree"),
    )
    ma = base.groupBy(*gnames, F.col("__a").alias("__lbl")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    mb = base.groupBy(*gnames, F.col("__b").alias("__lbl")).agg(
        F.count(F.lit(1)).alias("__nb")
    )
    cross = (
        ma.join(mb, on=[*gnames, "__lbl"])
        .groupBy(*gnames)
        .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__cross"))
    )
    # LEFT join + coalesce: raters with fully DISJOINT label sets have
    # an empty marginal intersection — the group must surface with
    # pe = 0 (and kappa = po), not vanish or go null; a label-schema
    # mismatch is exactly what this gate exists to flag
    joined = (
        totals.join(cross, on=gnames, how="left")
        if gnames
        else totals.crossJoin(cross)
    )
    n = F.col("__n")
    po = F.col("__agree").cast("double") / n
    pe = F.coalesce(F.col("__cross"), F.lit(0)).cast("double") / (n * n)
    return joined.select(
        *gnames,
        n.alias("n_items"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(F.try_divide(po - pe, F.lit(1.0) - pe), 6).alias("kappa"),
    )


def corpus_manifest(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Content-addressed corpus manifest: per group (source/partition),
    the document count, byte/char totals, and an ORDER-INSENSITIVE
    content checksum — the attestation row a data-versioning layer
    stores so "same manifest ⇒ same corpus" holds across reruns,
    engine versions, and partitionings without sorting anything.

    The checksum is ``Σ md5-prefix(id ‖ fingerprint) mod 2⁶³`` — an
    integer sum, so it commutes across partitions and engines (the
    repo's md5 idiom), and binding the doc id into the hash makes id
    reassignment visible, not just content membership.  A second
    text-only checksum (content regardless of ids) distinguishes
    "re-keyed" from "re-crawled".

    Scale shape: ONE map-side-combinable aggregate riding the scan —
    the same cost as a count.

    Output per group: ``n_docs, n_chars, content_sum, text_sum``.
    """
    g = [F.col(c) for c in group_cols]
    fp = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.col(text_col))
    )
    tfp = F.md5(F.col(text_col))
    h = F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")
    th = F.conv(F.substring(tfp, 1, 15), 16, 10).cast("long")
    base = df.select(
        *g,
        F.length(F.col(text_col)).cast("long").alias("__len"),
        h.alias("__h"),
        th.alias("__th"),
    )
    grouped = base.groupBy(*g) if group_cols else base.groupBy()
    m = 9_223_372_036_854_775_783  # largest prime < 2^63
    return grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__len").cast("long").alias("n_chars"),
        (F.sum(F.col("__h").cast("decimal(38,0)")) % F.lit(m))
        .cast("long")
        .alias("content_sum"),
        (F.sum(F.col("__th").cast("decimal(38,0)")) % F.lit(m))
        .cast("long")
        .alias("text_sum"),
    )


def l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    *,
    l: int,
) -> DataFrame:
    """Distinct-l-diversity audit (Machanavajjhala et al. 2007): a
    quasi-identifier equivalence class whose *sensitive_col* takes
    fewer than *l* distinct values leaks the sensitive attribute to
    anyone who can place an individual in the class — even when
    k-anonymity holds (a size-50 class where everyone shares one
    diagnosis is k-anonymous and fully disclosive).  The companion
    gate to :func:`k_anonymity`, run together before any release.

    One aggregation over the QI key (map-side combinable count +
    distinct); output one row per class: ``*qi_cols, group_size,
    n_sensitive, violates_l``.
    """
    return df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct(F.col(sensitive_col)).cast("long").alias(
            "n_sensitive"
        ),
    ).withColumn("violates_l", F.col("n_sensitive") < F.lit(int(l)))


def auc_rank(
    df: DataFrame,
    score_col: str,
    label_col,
    group_cols=(),
) -> DataFrame:
    """Mann–Whitney AUC of *score_col* as a ranker for the boolean
    *label_col* — the probability a random positive outscores a random
    negative, ties counted half (exactly the rank-sum estimator, so it
    equals the ROC area with trapezoidal tie handling).  The standard
    one-number audit for a quality-classifier score before using it as
    a corpus filter threshold.

    Exactness: AUC = (2·Σ_s pos_s·neg_below_s + Σ_s pos_s·neg_s)
    / (2·P·N).  Every term is an INTEGER product, so the whole
    computation stays in integers until one final division — bitwise
    reproducible in any engine with no decimal tricks needed.

    Shape: one hash aggregation to per-(group, score) pos/neg counts
    (map-side combine does the heavy lifting), then a cumulative
    window over the DISTINCT scores of each group — never the fact
    table.  At 100 TB quantize or bin continuous scores first (e.g.
    ``F.round(score, 3)``) so the distinct support stays bounded; AUC
    over binned scores is the same trapezoidal ROC area at bin
    resolution.

    Output per group: ``(*group_cols, n_pos, n_neg, auc)`` (6 dp);
    null AUC when a group lacks both classes.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols)
    lbl = label_col if not isinstance(label_col, str) else F.col(label_col)
    per_score = (
        df.where(F.col(score_col).isNotNull())
        .groupBy(*group_cols, score_col)
        .agg(
            F.count(F.when(lbl, 1)).cast("long").alias("__pos"),
            F.count(F.when(~lbl, 1)).cast("long").alias("__neg"),
        )
    )
    wg = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy()
    )
    w = wg.orderBy(F.col(score_col).asc())
    cum = per_score.select(
        *group_cols,
        "__pos",
        "__neg",
        (F.sum("__neg").over(w) - F.col("__neg")).alias("__neg_below"),
    )
    agg = cum.groupBy(*group_cols).agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("__pos") * (2 * F.col("__neg_below") + F.col("__neg"))
        ).cast("long").alias("__num2"),
    )
    auc = F.try_divide(
        F.col("__num2").cast("double"),
        2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"),
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.round(auc, 6)
        ).alias("auc"),
    )


def kappa_from_confusion(
    cells: DataFrame,
    label_a_col: str = "label_a",
    label_b_col: str = "label_b",
    n_col: str = "n",
) -> DataFrame:
    """Finalize Cohen's kappa from an aggregated confusion table —
    ``(label_a, label_b, n)`` cells — instead of raw paired rows:
    the streaming-twin finalizer (``streaming.core.
    streaming_label_agreement`` emits exactly this shape) and the
    path for auditing a published confusion matrix.  Identical
    moments to :func:`cohens_kappa`: p_o = agree/n and the integer
    cross-moment Σ_k nA_k·nB_k for p_e, with one double division
    each — bitwise equal to the raw-row operator on the same data.

    Output: one row ``(n_items, po, pe, kappa)`` (6 dp); kappa null
    when p_e = 1 (both raters constant and identical).
    """
    a, b = F.col(label_a_col), F.col(label_b_col)
    n = F.col(n_col).cast("long")
    base = cells.select(a.alias("__a"), b.alias("__b"), n.alias("__n"))
    ma = base.groupBy(F.col("__a").alias("__k")).agg(
        F.sum("__n").alias("__na")
    )
    mb = base.groupBy(F.col("__b").alias("__k")).agg(
        F.sum("__n").alias("__nb")
    )
    cross = (
        ma.join(mb, "__k", "inner")
        .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__cross"))
    )
    tot = base.agg(
        F.sum("__n").cast("long").alias("n_items"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")))
        .cast("long")
        .alias("__agree"),
    ).select(
        "n_items", F.coalesce(F.col("__agree"), F.lit(0)).alias("__agree")
    )
    out = tot.crossJoin(F.broadcast(cross))
    po = F.col("__agree").cast("double") / F.col("n_items").cast("double")
    # coalesce, same as cohens_kappa: raters with fully disjoint label
    # sets must surface with pe = 0 (kappa = po), not a null
    pe = F.coalesce(F.col("__cross"), F.lit(0)).cast("double") / (
        F.col("n_items").cast("double") * F.col("n_items").cast("double")
    )
    return out.select(
        "n_items",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(F.try_divide(po - pe, F.lit(1.0) - pe), 6).alias("kappa"),
    )


def t_closeness(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    *,
    n_bins: int = 10,
    threshold: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li et al. 2007), completing the
    k-anonymity / l-diversity / t-closeness release-gate trio: a
    quasi-identifier class leaks even with many distinct sensitive
    values when its DISTRIBUTION skews from the table's (a class
    whose salaries are all in the top decile discloses plenty).  The
    numeric sensitive attribute is quantized into ``n_bins``
    equal-width bins and each class is scored by the ordinal Earth
    Mover's Distance to the global distribution:
    ``t = sum_i |CDF_class(i) - CDF_global(i)| / (n_bins - 1)``.

    Scale shape: one 2-row min/max aggregate (broadcast), one
    ``(class, bin)`` count aggregation, a broadcast bin spine so
    empty bins contribute, and per-class cumulative windows over the
    ``n_bins``-row spine — no global window, no quadratic step.  The
    prefix |CDF| gaps are decimal-cast before the final sum
    (order-insensitive).

    Output per class: ``*qi_cols, group_size, t, breach`` (6 dp;
    ``breach = t > threshold``).
    """
    from pyspark.sql import Window

    n_bins = int(n_bins)
    s = F.col(sensitive_col).cast("double")
    base = df.where(s.isNotNull()).select(
        *[F.col(c) for c in qi_cols], s.alias("__s")
    )
    mm = base.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi"),
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    j = base.crossJoin(F.broadcast(mm))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    binc = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.floor((F.col("__s") - F.col("__lo")) / width).cast("long"),
    )
    binned = j.select(
        *qi_cols, binc.alias("__bin"), F.col("__n")
    )
    per = binned.groupBy(*qi_cols, "__bin").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.max("__n").alias("__n"),
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").alias("__bin"))
    glob = bins.join(
        binned.groupBy("__bin").agg(
            F.count(F.lit(1)).cast("long").alias("__g")
        ),
        "__bin",
        "left",
    ).withColumn("__g", F.coalesce(F.col("__g"), F.lit(0).cast("long")))
    classes = per.groupBy(*qi_cols).agg(
        F.sum("__c").cast("long").alias("group_size"),
        F.max("__n").alias("__n"),
    )
    spine = classes.crossJoin(
        F.broadcast(
            glob.select("__bin", "__g")
        )
    )
    full = spine.join(per.select(*qi_cols, "__bin", "__c"),
                      [*qi_cols, "__bin"], "left").withColumn(
        "__c", F.coalesce(F.col("__c"), F.lit(0).cast("long"))
    )
    w = Window.partitionBy(*[F.col(c) for c in qi_cols]).orderBy("__bin")
    cum_c = F.sum("__c").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_g = F.sum("__g").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = F.abs(
        cum_c.cast("double") / F.col("group_size").cast("double")
        - cum_g.cast("double") / F.col("__n").cast("double")
    ).cast("decimal(38,18)")
    out = full.withColumn("__gap", gap).groupBy(
        *qi_cols, "group_size"
    ).agg(F.sum("__gap").alias("__t"))
    t = F.col("__t").cast("double") / F.lit(float(n_bins - 1))
    return out.select(
        *qi_cols,
        "group_size",
        F.round(t, 6).alias("t"),
        (F.round(t, 6) > F.lit(float(threshold))).alias("breach"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """Per-class average precision (the PR-curve summary, Zhu 2004):
    one global ranking by score, then for each class AP = mean over
    its positives of precision@rank — the retrieval-quality
    companion to the ROC-style :func:`auc_rank` (x146), and the
    better metric under class imbalance (AUC saturates, AP doesn't).

    Scale shape: ONE global row_number window establishes the
    ranking (the same bounded-support caveat as x146 — quantize
    scores first at 100 TB scale), after which everything is
    per-class partitioned: within-class row_number over the global
    rank gives the positive count at each hit, so precision@rank =
    k/rank needs no cross join.  Per-positive precisions are
    decimal-cast before the class sum (order-insensitive).

    Output per class: ``n_pos, best_rank, ap`` (6 dp).
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(label_col).alias("__lbl"),
        F.col(score_col).cast("double").alias("__s"),
        F.col(id_col).alias("__id"),
    ).withColumn(
        "__rank",
        F.row_number().over(
            Window.orderBy(F.desc("__s"), F.asc("__id"))
        ),
    )
    k = F.row_number().over(
        Window.partitionBy("__lbl").orderBy("__rank")
    )
    prec = (
        k.cast("double") / F.col("__rank").cast("double")
    ).cast("decimal(38,18)")
    per = ranked.select(
        "__lbl", "__rank", prec.alias("__p")
    )
    out = per.groupBy("__lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.min("__rank").cast("long").alias("best_rank"),
        F.sum("__p").alias("__sp"),
    )
    ap = F.col("__sp").cast("double") / F.col("n_pos").cast("double")
    return out.select(
        F.col("__lbl").alias(label_col),
        "n_pos",
        "best_rank",
        F.round(ap, 6).alias("ap"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col,
    group_cols: Sequence[str] = (),
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Probability-calibration audit (Brier 1950; ECE of Naeini 2015)
    of a scorer against binary outcomes: equal-width score bins give
    expected calibration error ECE = Σ_b (n_b/n)·|mean_score_b −
    rate_b|, alongside the Brier mean-squared error — the gate run on
    quality/toxicity classifier scores before they drive corpus
    filtering (a miscalibrated 0.9 means the threshold is lying).

    Scale shape: one (group, bin) hash aggregation then one group
    aggregation, both map-side combinable; scores clamped to [0, 1];
    all float sums decimal-cast (order-insensitive).

    Output per group: ``n, n_bins_used, brier, ece`` (6 dp).
    """
    lbl = label_col if not isinstance(label_col, str) else F.col(label_col)
    parts = [F.col(c) for c in group_cols]
    nb = int(n_bins)
    dec = "decimal(38,18)"
    s = F.least(F.greatest(F.col(score_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    y = F.when(lbl, 1.0).otherwise(0.0)
    base = df.select(
        *parts,
        s.alias("__s"),
        y.alias("__y"),
        F.least(F.floor(s * nb).cast("int"), F.lit(nb - 1)).alias("__b"),
    ).where(F.col("__s").isNotNull())
    bins = base.groupBy(*parts, "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__nb"),
        F.sum(F.col("__s").cast(dec)).alias("__ss"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum(
            ((F.col("__s") - F.col("__y")) * (F.col("__s") - F.col("__y"))).cast(dec)
        ).alias("__sq"),
    )
    nbd = F.col("__nb").cast("double")
    gap = F.abs(F.col("__ss").cast("double") / nbd - F.col("__sy").cast("double") / nbd)
    out = bins.groupBy(*parts).agg(
        F.sum("__nb").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum("__sq").alias("__tsq"),
        F.sum((nbd * gap).cast(dec)).alias("__te"),
    )
    n = F.col("n").cast("double")
    return out.select(
        *group_cols,
        "n",
        "n_bins_used",
        F.round(F.col("__tsq").cast("double") / n, 6).alias("brier"),
        F.round(F.col("__te").cast("double") / n, 6).alias("ece"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    rater_col: str,
    label_col: str,
) -> DataFrame:
    """Krippendorff's alpha for nominal labels (Krippendorff 1970) —
    the multi-rater, missing-tolerant generalization of Cohen's kappa
    (:func:`cohens_kappa`): agreement over ALL rater pairs within
    each unit, chance-corrected by the pooled label marginals.  Units
    with a single rating are unpairable and drop out, so ragged
    annotation tables need no alignment step.

    alpha = 1 − (n−1)·Σ_u Σ_c n_uc(m_u − n_uc)/(m_u−1) / (n² − Σ_c n_c²)
    with n_uc the unit×label counts, m_u the unit totals, n_c the
    marginals, n the pairable-rating total — every term an integer
    count or a decimal-cast ratio, engine-exact.

    Scale shape: two hash aggregations (unit×label, then totals) and
    two 1-row broadcast combines — no pair join materializes.

    Output (one row): ``n_units, n_ratings, n_labels, alpha`` (6 dp).
    """
    dec = "decimal(38,18)"
    uc = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(F.col(unit_col).alias("__u"), F.col(label_col).alias("__c"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    mu = uc.groupBy("__u").agg(F.sum("__n").cast("long").alias("__m"))
    pair = uc.join(mu, "__u").where(F.col("__m") >= 2)
    disagree = pair.select(
        "__u",
        "__c",
        "__n",
        "__m",
        # per-row double division (identical bits in both engines),
        # THEN the decimal cast — decimal/decimal division scale
        # rules differ across engines, double->decimal rounding does
        # not
        (
            (F.col("__n") * (F.col("__m") - F.col("__n"))).cast("double")
            / (F.col("__m") - 1).cast("double")
        )
        .cast(dec)
        .alias("__do"),
    )
    marg = disagree.groupBy("__c").agg(F.sum("__n").cast("long").alias("__nc"))
    tot = disagree.agg(
        F.count_distinct(F.col("__u")).alias("n_units"),
        F.sum("__n").cast("long").alias("n_ratings"),
        F.sum("__do").alias("__dosum"),
    )
    mtot = marg.agg(
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum(F.col("__nc") * F.col("__nc")).cast("long").alias("__sc2"),
    )
    j = tot.crossJoin(F.broadcast(mtot))
    n = F.col("n_ratings").cast("double")
    alpha = F.lit(1.0) - F.try_divide(
        (n - 1.0) * F.col("__dosum").cast("double"),
        n * n - F.col("__sc2").cast("double"),
    )
    return j.select(
        "n_units",
        "n_ratings",
        "n_labels",
        F.round(alpha, 6).alias("alpha"),
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
    *,
    alpha: float = 0.1,
    calib_frac: float = 0.5,
    salt: str = "conformal",
) -> DataFrame:
    """Split-conformal threshold with a coverage audit (Vovk 2005;
    the split recipe of Lei 2018): a deterministic hash band carves a
    calibration set, the threshold is the ⌈(n+1)(1−α)⌉-th smallest
    calibration score (exact order statistic), and the held-out rows
    report achieved coverage — turns any nonconformity score into a
    filter cutoff with a finite-sample guarantee, per group.

    Scale shape: membership is the same md5 uniform draw as
    ``mixing.split_corpus`` (no shuffle, reproducible); the order
    statistic is a group-keyed window over calibration rows only;
    coverage is a broadcast threshold probe of the eval side.

    Output per group: ``n_calib, n_eval, threshold, target,
    coverage`` (6 dp).
    """
    from .mixing import uniform_hash01

    parts = [F.col(c) for c in group_cols]
    from pyspark.sql import Window

    base = df.select(
        *parts,
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("double").alias("__s"),
        (uniform_hash01(F.col(id_col), salt) < F.lit(float(calib_frac))).alias(
            "__cal"
        ),
    ).where(F.col("__s").isNotNull())
    calib = base.where(F.col("__cal"))
    nc = calib.groupBy(*parts).agg(F.count(F.lit(1)).cast("long").alias("n_calib"))
    k = F.least(
        F.ceil((F.col("n_calib") + 1) * F.lit(1.0 - float(alpha))).cast("long"),
        F.col("n_calib"),
    )
    rn = F.row_number().over(
        Window.partitionBy(*parts).orderBy(F.asc("__s"), F.asc("__id"))
    )
    ranked = calib.withColumn("__rn", rn)
    join_cols = list(group_cols)
    thr = (
        ranked.join(nc.withColumn("__k", k), join_cols)
        if join_cols
        else ranked.crossJoin(F.broadcast(nc.withColumn("__k", k)))
    )
    thr = thr.where(F.col("__rn") == F.col("__k")).select(
        *group_cols, "n_calib", F.col("__s").alias("__thr")
    )
    ev = base.where(~F.col("__cal"))
    evt = (
        ev.join(thr, join_cols) if join_cols else ev.crossJoin(F.broadcast(thr))
    )
    out = evt.groupBy(*parts, "n_calib", "__thr").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.when(F.col("__s") <= F.col("__thr"), 1).otherwise(0))
        .cast("long")
        .alias("__cov"),
    )
    return out.select(
        *group_cols,
        "n_calib",
        "n_eval",
        F.round(F.col("__thr"), 6).alias("threshold"),
        F.round(F.lit(1.0 - float(alpha)), 6).alias("target"),
        F.round(
            F.col("__cov").cast("double") / F.col("n_eval").cast("double"), 6
        ).alias("coverage"),
    )


def clustering_agreement(
    df: DataFrame,
    label_a: str,
    label_b: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Adjusted Rand Index between two cluster assignments (Hubert &
    Arabie 1985) — the standard agreement score for comparing a cheap
    clustering (LSH buckets, prefix keys, blocking keys) against a
    reference clustering (exact-duplicate groups, gold labels).
    ARI = 0 ⇒ chance-level agreement, 1 ⇒ identical partitions.

    Pair-counting form from the contingency table: with ``n_ij`` the
    size of cell (a=i, b=j), ``a_i``/``b_j`` the marginals and
    ``P(x) = x(x−1)/2``::

        index     = Σ_ij P(n_ij)
        expected  = Σ_i P(a_i) · Σ_j P(b_j) / P(n)
        ARI       = (index − expected) / ((ΣP(a_i)+ΣP(b_j))/2 − expected)

    Output: one row per *group_cols* group: ``(…, n, n_clusters_a,
    n_clusters_b, ari)`` (6 dp).

    Scale shape: three keyed hash aggregations (cell, marginal a,
    marginal b) that combine map-side, then 1-row-per-group combines —
    never materializes pairs (the naive pair formulation is O(n²); the
    contingency form is O(#cells)).  Engine-exactness: every Σ is an
    exact BIGINT sum of integer pair counts; the ARI division is one
    double expression over those exact integers, composed identically
    in the oracle.
    """
    g = list(group_cols)

    def pairs2(c: Column) -> Column:
        # 2·P(c) = c(c−1): keep everything integral (halving once at
        # the end avoids fractional intermediates)
        return (c * (c - F.lit(1))).cast("long")

    cells = df.groupBy(*g, label_a, label_b).agg(
        F.count(F.lit(1)).alias("__nij")
    )
    idx = cells.groupBy(*g).agg(
        F.sum(pairs2(F.col("__nij"))).alias("__idx2"),
        F.sum("__nij").alias("__n"),
    )
    ma = (
        df.groupBy(*g, label_a).agg(F.count(F.lit(1)).alias("__ai"))
        .groupBy(*g)
        .agg(
            F.sum(pairs2(F.col("__ai"))).alias("__a2"),
            F.count(F.lit(1)).alias("n_clusters_a"),
        )
    )
    mb = (
        df.groupBy(*g, label_b).agg(F.count(F.lit(1)).alias("__bj"))
        .groupBy(*g)
        .agg(
            F.sum(pairs2(F.col("__bj"))).alias("__b2"),
            F.count(F.lit(1)).alias("n_clusters_b"),
        )
    )
    joined = idx.join(ma, on=g or None, how="inner") if g else idx.crossJoin(ma)
    joined = joined.join(mb, on=g or None, how="inner") if g else joined.crossJoin(mb)
    t2 = pairs2(F.col("__n")).cast("double")
    expected2 = F.col("__a2").cast("double") * F.col("__b2") / t2
    ari = F.try_divide(
        F.col("__idx2").cast("double") - expected2,
        (F.col("__a2") + F.col("__b2")).cast("double") / F.lit(2.0)
        - expected2,
    )
    return joined.select(
        *g,
        F.col("__n").cast("long").alias("n"),
        F.col("n_clusters_a").cast("long").alias("n_clusters_a"),
        F.col("n_clusters_b").cast("long").alias("n_clusters_b"),
        F.round(ari, 6).alias("ari"),
    )


def woe_iv(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tie_col: str,
    group_cols: Sequence[str] = (),
    *,
    n_bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value binning (the credit-
    scoring standard, Siddiqi 2006) — the monotonic-signal audit for a
    quality/filter score against a binary outcome: per equal-depth
    score bin, ``WOE = ln(good_share / bad_share)``; the feature's
    ``IV = Σ (good_share − bad_share)·WOE`` summarizes predictive
    power (rule of thumb: <0.02 useless, >0.3 strong).  Run it on a
    corpus-quality score vs a downstream keep/drop label before
    trusting the score as a filter.

    Shares are add-*smooth* smoothed (``(g_i + s)/(G + s·n_bins)``) so
    empty cells yield finite WOE instead of ±∞.  Binning is ntile
    over (score, tie_col) — a total deterministic order both engines
    reproduce, with ntile's identical extra-row rule.

    Engine-exactness: bin counts are exact BIGINTs; shares and WOE are
    one double composition (ln is correctly-rounded-enough and
    composed identically — the x179 exp/ln precedent); the IV sum is
    decimal-cast per-bin contributions, accumulation-order-free.

    Scale shape: the ntile window is keyed by *group_cols* (per
    segment / per language); one (group, bin) agg; group totals are a
    group-keyed 1-row combine joined back on the group key.

    Output: one row per (group, bin): ``(*group_cols, bin, n, n_good,
    n_bad, good_share, bad_share, woe, iv_total)`` — *iv_total* is
    repeated on each of the group's rows (6 dp).
    """
    g = list(group_cols)
    w = (
        Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    ).orderBy(score_col, tie_col)
    binned = df.select(
        *g,
        F.col(score_col),
        F.col(tie_col),
        F.col(label_col).cast("long").alias("__y"),
    ).withColumn("bin", F.ntile(n_bins).over(w))
    per = binned.groupBy(*g, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("__y")).alias("n_bad"),
    )
    tot = per.groupBy(*g).agg(
        F.sum("n_good").alias("__G"), F.sum("n_bad").alias("__B")
    )
    j = per.join(tot, on=g or None) if g else per.crossJoin(F.broadcast(tot))
    s = float(smooth)
    gs = (F.col("n_good").cast("double") + F.lit(s)) / (
        F.col("__G").cast("double") + F.lit(s * n_bins)
    )
    bs = (F.col("n_bad").cast("double") + F.lit(s)) / (
        F.col("__B").cast("double") + F.lit(s * n_bins)
    )
    woe = F.log(gs / bs)
    contrib = ((gs - bs) * woe).cast("decimal(38,18)")
    wiv = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    return j.select(
        *g,
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        F.round(gs, 6).alias("good_share"),
        F.round(bs, 6).alias("bad_share"),
        F.round(woe, 6).alias("woe"),
        F.round(F.sum(contrib).over(wiv).cast("double"), 6).alias(
            "iv_total"
        ),
    )


#: Abramowitz & Stegun 7.1.26 erf coefficients (max abs err 1.5e-7)
_AS_ERF = (0.254829592, -0.284496736, 1.421413741,
           -1.453152027, 1.061405429)
_AS_P = 0.3275911
_INV_SQRT2 = 0.7071067811865476


def normal_sf(z: Column) -> Column:
    """Upper-tail normal survival ``P(Z > z)`` for signed *z*, via the
    same Abramowitz–Stegun 7.1.26 erf polynomial as
    :func:`normal_p_two_sided` (the polynomial only covers x ≥ 0, so
    the signed tail reflects: ``sf(z) = 1 − sf(−z)``).  Needed by the
    Wilson–Hilferty chi-square tail (x213), which is one-sided."""
    x = F.abs(z) * F.lit(_INV_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    a1, a2, a3, a4, a5 = (F.lit(c) for c in _AS_ERF)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    erf = F.lit(1.0) - poly * F.exp(-(x * x))
    upper = F.lit(0.5) * (F.lit(1.0) - erf)  # P(Z > |z|)
    return F.when(z >= 0, upper).otherwise(F.lit(1.0) - upper)


def normal_p_two_sided(z: Column) -> Column:
    """Two-sided normal p-value ``2·(1 − Φ(|z|))`` via the
    Abramowitz–Stegun 7.1.26 erf polynomial — plain arithmetic plus
    one ``exp``, so both engines evaluate the identical composition
    (erf itself is not in either engine's SQL surface).  Max absolute
    error 1.5e-7, far below any decision threshold FDR control uses.
    """
    x = F.abs(z) * F.lit(_INV_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    a1, a2, a3, a4, a5 = (F.lit(c) for c in _AS_ERF)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    erf = F.lit(1.0) - poly * F.exp(-(x * x))
    phi = F.lit(0.5) * (F.lit(1.0) + erf)
    return F.lit(2.0) * (F.lit(1.0) - phi)


def bh_fdr(
    tests: DataFrame,
    p_col: str,
    id_cols: Sequence[str],
    *,
    q: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment (1995) over a family of
    hypothesis tests: rank p-values ascending, adjusted_i =
    ``min_{j ≥ i} (p_j · m / j)`` clamped to 1 — the multiple-testing
    guard an experimentation platform applies before declaring any of
    m simultaneous segment tests significant (at m = 35 strata, a raw
    0.05 threshold yields ~1.75 false positives per sweep by
    construction; BH caps the FALSE DISCOVERY RATE at *q* instead).

    Deterministic: ranking ties broken by *id_cols*; the adjustment
    is a reverse running MIN (order-insensitive) over exact ranks.

    Scale shape: both windows run over the m test rows — the raw
    per-row data was already reduced by the upstream test operator
    (mann_whitney_u / ab_test); m is dashboard-sized by construction.

    Output: ``(*id_cols, p_value, rank, m, p_adjusted, significant)``
    ordered by rank (p and adjustment at 6 dp).
    """
    ids = [F.col(c) for c in id_cols]
    m_w = Window.partitionBy(F.lit(1))
    rank_w = m_w.orderBy(F.col(p_col).asc(), *ids)
    ranked = tests.select(
        *id_cols,
        F.col(p_col).alias("__p"),
        F.row_number().over(rank_w).alias("rank"),
        F.count(F.lit(1)).over(m_w).alias("m"),
    ).withColumn(
        "__step",
        F.col("__p") * F.col("m").cast("double") / F.col("rank").cast("double"),
    )
    rev = m_w.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = F.least(F.lit(1.0), F.min("__step").over(rev))
    return (
        ranked.withColumn("p_adjusted", adj)
        .select(
            *id_cols,
            F.round(F.col("__p"), 6).alias("p_value"),
            F.col("rank").cast("long").alias("rank"),
            F.col("m").cast("long").alias("m"),
            F.round(F.col("p_adjusted"), 6).alias("p_adjusted"),
            (F.col("p_adjusted") <= F.lit(float(q))).alias("significant"),
        )
        .orderBy("rank")
    )


def smd_balance(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    covariate_cols: Sequence[str],
    *,
    threshold: float = 0.1,
) -> DataFrame:
    """Standardized-mean-difference covariate balance check (the
    propensity-score / A-B randomization audit, Austin 2009): per
    covariate, ``SMD = (μ_a − μ_b) / √((σ²_a + σ²_b)/2)`` with the
    |SMD| > *threshold* imbalance flag (0.1 is the published rule of
    thumb).  Run it BEFORE reading any treatment effect — an
    imbalanced covariate means the split, not the treatment, may
    explain the difference.

    Engine-exactness: per-group moments are decimal power sums with
    the square formed as a (25,12)×(12,6) product — (38,18), inside
    both engines' exact multiply range (the x192 width lesson); the
    (12,6) operand quantizes values at 6 dp identically in both
    engines.  μ, σ² (population), and the SMD are then one double
    composition over those exact sums.

    Scale shape: covariates melt to (covariate, value) rows in one
    projection (no extra scan per covariate), then a single
    (covariate, group) hash agg and a covariate-keyed 1-row combine.

    Output: ``(covariate, n_a, n_b, mean_a, mean_b, sd_pooled, smd,
    balanced)`` (6 dp).
    """
    cases = []
    for c in covariate_cols:
        cases += [F.lit(c), F.col(c).cast("double")]
    melted = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(group_col).alias("__g"),
        F.stack(F.lit(len(covariate_cols)), *cases).alias("cov", "__v"),
    ).where(F.col("__v").isNotNull())
    xd = F.col("__v").cast("decimal(25,12)")
    xw = F.col("__v").cast("decimal(12,6)")
    per = melted.groupBy("cov", "__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(xd).alias("__s1"),
        F.sum(xd * xw).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    mu = F.col("__s1").cast("double") / n
    var = F.col("__s2").cast("double") / n - mu * mu
    sided = per.select(
        "cov",
        F.when(F.col("__g") == group_a, F.col("__n")).alias("__na"),
        F.when(F.col("__g") == group_b, F.col("__n")).alias("__nb"),
        F.when(F.col("__g") == group_a, mu).alias("__ma"),
        F.when(F.col("__g") == group_b, mu).alias("__mb"),
        F.when(F.col("__g") == group_a, var).alias("__va"),
        F.when(F.col("__g") == group_b, var).alias("__vb"),
    )
    both = sided.groupBy("cov").agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.max("__ma").alias("__ma"),
        F.max("__mb").alias("__mb"),
        F.max("__va").alias("__va"),
        F.max("__vb").alias("__vb"),
    )
    sd_pool = F.sqrt((F.col("__va") + F.col("__vb")) / F.lit(2.0))
    smd = F.try_divide(F.col("__ma") - F.col("__mb"), sd_pool)
    return both.select(
        F.col("cov").alias("covariate"),
        "n_a",
        "n_b",
        F.round(F.col("__ma"), 6).alias("mean_a"),
        F.round(F.col("__mb"), 6).alias("mean_b"),
        F.round(sd_pool, 6).alias("sd_pooled"),
        F.round(smd, 6).alias("smd"),
        # an undefined SMD (zero pooled variance — e.g. a deterministic
        # fully-confounded covariate, or a side missing entirely) is
        # the WORST case, not a pass: propagate null, never coalesce
        # it into "balanced"
        F.when(
            smd.isNotNull(), F.abs(smd) <= F.lit(float(threshold))
        ).alias("balanced"),
    )


def wilson_intervals(
    df: DataFrame,
    success: Column,
    group_cols: Sequence[str],
    *,
    z: float = 1.959964,
) -> DataFrame:
    """Wilson score interval for a proportion per group (Wilson 1927)
    — the rate CI that behaves at the boundaries where the naive
    normal interval fails (p̂ near 0/1, small n): the dashboard
    default for conversion/violation/flag rates.

    ``center = (p̂ + z²/2n) / (1 + z²/n)``;
    ``half = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)``.

    Engine-exactness: counts are exact; the interval is one double
    composition with *z* a shared literal.  Scale: one hash agg.

    Output: ``(*group_cols, n, successes, rate, ci_lo, ci_hi)``
    (6 dp).
    """
    g = list(group_cols)
    agg = df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(success.cast("long")).alias("__s"),
    )
    n = F.col("__n").cast("double")
    p = F.col("__s").cast("double") / n
    z2 = float(z) * float(z)
    denom = F.lit(1.0) + F.lit(z2) / n
    center = (p + F.lit(z2) / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + F.lit(z2) / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return agg.select(
        *g,
        F.col("__n").cast("long").alias("n"),
        F.col("__s").cast("long").alias("successes"),
        F.round(p, 6).alias("rate"),
        # + 0.0 normalizes the −0.0 that center−half produces at p̂ = 0
        # (the two sides differ by an ulp; stringified −0.0 ≠ 0.0)
        (F.round(center - half, 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(center + half, 6) + F.lit(0.0)).alias("ci_hi"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table for a scorer against a binary
    outcome — the decile view every targeting model ships with: sort
    by score descending, cut into *n_bins* equal-count bins, and ask
    "how much of the positive class do the top k bins capture, and
    at what lift over base rate".  The rank-free companion to AUC
    (x146: one number) and the calibration curve (x109/x170:
    probability quality) — gains answer the operational question
    "where do I set the budget cutoff".

    Binning discipline: rows collapse to the distinct-score support
    first (the ``mann_whitney_u`` bounded-support shape), bins come
    from integer arithmetic on the DESCENDING cumulative count
    (``bin = 1 + prior·n_bins div N``), and a whole tie-group lands
    in ONE bin (the bin of its first row) — deterministic in both
    engines, no per-row ntile over a global sort (the skew_profile
    lesson: a row-level global window dies at 10⁹ rows; the distinct
    support after 6-dp score rounding is the bounded object).  Bin
    sizes are therefore equal only up to tie-group granularity —
    the honest behavior when a score has mass points.

    Scale shape: one keyed agg to (group, score) cells, one window
    over the distinct support per group, one n_bins-row window for
    the cumulative columns.

    Output per (group, bin): ``(*group_cols, bin, n, n_pos,
    pos_rate, lift, cum_n, cum_pos, cum_capture, cum_lift)`` (6 dp);
    lift null when the group has no positives.
    """
    g = list(group_cols)
    score = F.round(F.col(score_col).cast("double"), 6)
    lab = F.col(label_col).cast("boolean")
    cells = (
        df.where(score.isNotNull() & lab.isNotNull())
        .groupBy(*g, score.alias("__s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("__p"),
        )
    )
    wdesc = Window.partitionBy(*[F.col(c) for c in g]).orderBy(
        F.desc("__s")
    )
    prior = F.coalesce(
        F.sum("__n").over(wdesc.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    wall = Window.partitionBy(*[F.col(c) for c in g])
    binned = (
        cells.withColumn("__prior", prior)
        .withColumn("__tot", F.sum("__n").over(wall))
        .withColumn("__totp", F.sum("__p").over(wall))
        .withColumn(
            "bin",
            (
                F.lit(1)
                + F.expr(f"(__prior * {int(n_bins)}) div __tot")
            ).cast("long"),
        )
    )
    per_bin = binned.groupBy(*g, "bin").agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum("__p").cast("long").alias("n_pos"),
        F.max("__tot").cast("long").alias("__tot"),
        F.max("__totp").cast("long").alias("__totp"),
    )
    wcum = Window.partitionBy(*[F.col(c) for c in g]).orderBy("bin")
    cum = per_bin.withColumn(
        "__cn",
        F.sum("n").over(wcum.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn(
        "__cp",
        F.sum("n_pos").over(
            wcum.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    base = F.try_divide(
        F.col("__totp").cast("double"), F.col("__tot").cast("double")
    )
    pos_rate = F.try_divide(
        F.col("n_pos").cast("double"), F.col("n").cast("double")
    )
    cum_rate = F.try_divide(
        F.col("__cp").cast("double"), F.col("__cn").cast("double")
    )
    return cum.select(
        *g,
        "bin",
        "n",
        "n_pos",
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.try_divide(pos_rate, base), 6).alias("lift"),
        F.col("__cn").cast("long").alias("cum_n"),
        F.col("__cp").cast("long").alias("cum_pos"),
        F.round(
            F.try_divide(
                F.col("__cp").cast("double"), F.col("__totp").cast("double")
            ),
            6,
        ).alias("cum_capture"),
        F.round(F.try_divide(cum_rate, base), 6).alias("cum_lift"),
    ).orderBy(*g, "bin")


def cronbach_alpha(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    value_col: Column | None = None,
) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient over a
    (subject × item) score matrix: ``α = k/(k−1) · (1 − Σσ²_i/σ²_T)``
    where σ²_i is the per-item score variance and σ²_T the variance
    of per-subject totals (Cronbach 1951) — "do these k signals
    measure one underlying trait", the reliability gate a composite
    quality score (k heuristic columns summed into one number) needs
    before the composite is trusted.

    *value_col* defaults to a count of rows (a (subject, item)
    event-count matrix); missing cells are ZERO, implemented without
    densifying — the zero cells change neither Σx nor Σx² per item,
    and the per-subject totals are sums over observed cells only, so
    no subject×item grid is ever materialized.

    Engine-exactness: scores are integers (counts or an integer
    measure) so every moment is an exact decimal(38,0) sum; only the
    final variance ratio is double.  Population (N-denominator)
    variances — the α value is denominator-invariant since the n's
    cancel.

    Scale shape: one (subject, item) hash agg, then one k-row item
    agg + one |subjects|-row total agg, both map-side combinable.
    k (items) must be small (it is a questionnaire width, not data
    scale); subjects are unbounded.

    Output: one row ``(k_items, n_subjects, sum_item_var,
    total_var, alpha)`` (6 dp).
    """
    v = (F.lit(1) if value_col is None else value_col).cast("decimal(19,0)")
    cell = (
        df.where(F.col(subject_col).isNotNull()
                 & F.col(item_col).isNotNull())
        .groupBy(
            F.col(subject_col).alias("__s"), F.col(item_col).alias("__i")
        )
        .agg(F.sum(v).alias("__x"))
    )
    # distinct subject count first: items may not all touch every
    # subject, and zero cells must count in every item's N
    n_subj = cell.select(
        F.countDistinct("__s").cast("long").alias("n_subjects")
    )
    items = (
        cell.groupBy("__i")
        .agg(
            F.sum("__x").alias("__s1"),
            F.sum(F.col("__x") * F.col("__x")).alias("__s2"),
        )
        .crossJoin(F.broadcast(n_subj))
        .select(
            F.col("n_subjects"),
            (
                F.col("__s2").cast("double")
                / F.col("n_subjects").cast("double")
                - (
                    F.col("__s1").cast("double")
                    / F.col("n_subjects").cast("double")
                )
                ** 2
            )
            .cast("decimal(38,18)")
            .alias("__var_i"),
        )
        .groupBy("n_subjects")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_items"),
            F.sum("__var_i").cast("double").alias("__sum_var"),
        )
    )
    totals = (
        cell.groupBy("__s")
        .agg(F.sum("__x").alias("__t"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__t").alias("__t1"),
            F.sum(F.col("__t") * F.col("__t")).alias("__t2"),
        )
        .select(
            (
                F.col("__t2").cast("double") / F.col("__n").cast("double")
                - (
                    F.col("__t1").cast("double")
                    / F.col("__n").cast("double")
                )
                ** 2
            ).alias("__tot_var")
        )
    )
    out = items.crossJoin(F.broadcast(totals))
    k = F.col("k_items").cast("double")
    alpha = F.try_divide(k, k - 1.0) * (
        F.lit(1.0) - F.try_divide(F.col("__sum_var"), F.col("__tot_var"))
    )
    return out.select(
        "k_items",
        "n_subjects",
        F.round(F.col("__sum_var"), 6).alias("sum_item_var"),
        F.round(F.col("__tot_var"), 6).alias("total_var"),
        F.round(alpha, 6).alias("alpha"),
    )


def hash_width_audit(
    df: DataFrame,
    key_col: str,
    *,
    bit_widths: Sequence[int] = (16, 24, 32, 40, 48),
    salt: str = "hw",
) -> DataFrame:
    """Join-key hash-width audit: for each candidate truncation width
    b, the EXACT number of colliding distinct keys when the key is
    replaced by a b-bit hash — the empirical answer to "can this
    pipeline carry 32-bit surrogate keys", next to the birthday
    expectation ``E[collisions] ≈ n²/2^(b+1)`` it should track.  At
    100 TB every byte of join key is shuffle bandwidth; this is the
    measurement that licenses (or forbids) the truncation.

    One distinct pass over the keys, then per width one md5-prefix
    hash agg: ``n_colliding = Σ_buckets (size − 1)`` over occupied
    buckets (keys that would silently merge with another key).
    Widths are hex-prefix truncations of the same md5, so the audit
    costs |widths| hash aggs over the DISTINCT key set, not the fact
    table.

    Output per width: ``(bits, n_keys, n_colliding, collision_rate,
    birthday_expected)`` (6 dp).
    """
    widths = sorted({int(b) for b in bit_widths})
    for b in widths:
        if b % 4 != 0 or not 4 <= b <= 60:
            raise ValueError(f"bit width {b} must be a multiple of 4 in [4, 60]")
    keys = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("__k"))
        .distinct()
        .select(
            F.md5(F.concat_ws(":", F.lit(salt), F.col("__k"))).alias("__h")
        )
        .localCheckpoint(eager=True)
    )
    outs = None
    for b in widths:
        bucket = F.substring(F.col("__h"), 1, b // 4)
        per = (
            keys.groupBy(bucket.alias("__b"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy()
            .agg(
                F.sum("__c").cast("long").alias("n_keys"),
                F.sum(F.col("__c") - 1).cast("long").alias("n_colliding"),
            )
            .select(
                F.lit(b).cast("long").alias("bits"),
                "n_keys",
                "n_colliding",
            )
        )
        outs = per if outs is None else outs.union(per)
    n = F.col("n_keys").cast("double")
    return outs.select(
        "bits",
        "n_keys",
        "n_colliding",
        F.round(
            F.try_divide(F.col("n_colliding").cast("double"), n), 6
        ).alias("collision_rate"),
        F.round(
            n * n / F.pow(F.lit(2.0), (F.col("bits") + 1).cast("double")),
            6,
        ).alias("birthday_expected"),
    )


def holm_bonferroni(
    tests: DataFrame,
    p_col: str,
    id_cols: Sequence[str],
    *,
    alpha: float = 0.05,
) -> DataFrame:
    """Holm step-down familywise-error control (Holm 1979, Scand. J.
    Statist.): ascending p-ranks get thresholds ``α/(m−i+1)``;
    adjusted p is the FORWARD running max of ``(m−i+1)·p_i`` clamped
    at 1, and significance stops at the FIRST failure (every later
    test is non-significant regardless of its own p).  The FWER
    companion to ``bh_fdr``: Holm bounds the chance of ANY false
    positive — what you want for ship/no-ship gates — where BH bounds
    the false-discovery RATE — what you want for screening sweeps.
    Uniformly more powerful than plain Bonferroni at identical
    guarantees, so there is no reason to ever use the unadjusted
    Bonferroni cut.

    Deterministic: rank ties broken by *id_cols*; forward running max
    over exact ranks (the mirror image of BH's reverse running min).
    m is dashboard-sized — both windows run over already-reduced test
    rows.

    Output: ``(*id_cols, p_value, rank, m, p_adjusted, significant)``
    ordered by rank (6 dp).
    """
    ids = [F.col(c) for c in id_cols]
    m_w = Window.partitionBy(F.lit(1))
    rank_w = m_w.orderBy(F.col(p_col).asc(), *ids)
    ranked = tests.select(
        *id_cols,
        F.col(p_col).alias("__p"),
        F.row_number().over(rank_w).alias("rank"),
        F.count(F.lit(1)).over(m_w).alias("m"),
    ).withColumn(
        "__step",
        F.col("__p")
        * (F.col("m") - F.col("rank") + 1).cast("double"),
    )
    fwd = m_w.orderBy(F.col("rank").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = F.least(F.lit(1.0), F.max("__step").over(fwd))
    return (
        ranked.withColumn("p_adjusted", adj)
        .select(
            *id_cols,
            F.round(F.col("__p"), 6).alias("p_value"),
            F.col("rank").cast("long").alias("rank"),
            F.col("m").cast("long").alias("m"),
            F.round(F.col("p_adjusted"), 6).alias("p_adjusted"),
            (F.col("p_adjusted") < F.lit(float(alpha))).alias(
                "significant"
            ),
        )
        .orderBy("rank")
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score (Brier 1950; Murphy
    1973): with forecasts binned into *n_bins* equal-width bins,

    ``BS ≈ REL − RES + UNC``  where
    ``REL = Σ n_k(p̄_k − ȳ_k)²/N`` (reliability: calibration error),
    ``RES = Σ n_k(ȳ_k − ȳ)²/N`` (resolution: discrimination),
    ``UNC = ȳ(1 − ȳ)`` (irreducible base-rate uncertainty).

    The diagnosis the raw calibration curve (x109/x170) doesn't
    summarize: a model can be perfectly calibrated (REL = 0) and
    useless (RES = 0 — it always predicts the base rate), or sharp
    but miscalibrated; the decomposition separates the two failure
    modes.  With binned forecasts the identity carries a within-bin
    variance remainder, reported as ``wbv = BS − (REL − RES + UNC)``
    (≥ 0, shrinks with finer bins).

    Scale shape: ONE bin-keyed hash agg of exact decimal moments plus
    a 1-row overall reduce — scores arrive already computed, so this
    runs over N rows once regardless of model complexity.

    Output (single row): ``n, base_rate, brier, reliability,
    resolution, uncertainty, wbv`` (6 dp).
    """
    dec12 = "decimal(38,12)"
    p = F.col(score_col).cast("double")
    y = F.col(outcome_col).cast("double")
    nb = int(n_bins)
    base = df.where(p.isNotNull() & y.isNotNull()).select(
        p.alias("__p"),
        y.alias("__y"),
        F.least(
            F.floor(p * F.lit(float(nb))).cast("int"), F.lit(nb - 1)
        ).alias("__b"),
    )
    bins = base.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__p").cast(dec12)).cast("double").alias("__sp"),
        F.sum(F.col("__y").cast(dec12)).cast("double").alias("__sy"),
        F.sum(
            ((F.col("__p") - F.col("__y")) * (F.col("__p") - F.col("__y")))
            .cast(dec12)
        )
        .cast("double")
        .alias("__sq"),
    )
    tot = bins.agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum(F.col("__sy").cast(dec12)).cast("double").alias("__ty"),
        F.sum(F.col("__sq").cast(dec12)).cast("double").alias("__tsq"),
    )
    t = bins.crossJoin(F.broadcast(tot))
    nd = F.col("__n").cast("double")
    pbar = F.col("__sp") / nd
    ybar_k = F.col("__sy") / nd
    ybar = F.col("__ty") / F.col("n").cast("double")
    terms = t.select(
        "n",
        F.col("__ty"),
        F.col("__tsq"),
        (nd * (pbar - ybar_k) * (pbar - ybar_k)).cast(dec12).alias("__rel"),
        (nd * (ybar_k - ybar) * (ybar_k - ybar)).cast(dec12).alias("__res"),
    )
    agg = terms.groupBy("n", "__ty", "__tsq").agg(
        F.sum("__rel").cast("double").alias("__srel"),
        F.sum("__res").cast("double").alias("__sres"),
    )
    ndn = F.col("n").cast("double")
    br = F.col("__tsq") / ndn
    rel = F.col("__srel") / ndn
    res = F.col("__sres") / ndn
    yb = F.col("__ty") / ndn
    unc = yb * (F.lit(1.0) - yb)
    return agg.select(
        "n",
        F.round(yb, 6).alias("base_rate"),
        F.round(br, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(br - (rel - res + unc), 6).alias("wbv"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    *,
    grid_decimals: int = 3,
) -> DataFrame:
    """Operating-point selection by exhaustive threshold sweep:
    Youden's J (Youden 1950, ``J = TPR − FPR`` — the balanced
    epidemiology cut) and the F1-optimal point (the retrieval cut),
    from ONE cumulative pass over the score grid.  AUC (x146) ranks
    the model; gains (x224) describe capture by decile; this picks
    the actual deployment threshold, with both criteria reported so
    the imbalance-sensitivity of F1 vs J is visible side by side.

    Scores are quantized to *grid_decimals* before the sweep: the
    candidate-threshold table is then bounded (≤ 10^d + 1 rows), so
    the descending-cumulative window runs over a FIXED-size frame
    instead of the raw distinct support — the ``skew_profile`` lesson
    applied to ROC sweeps (an unquantized sweep over 100 TB of
    distinct floats would single-partition-sort billions of rows).

    Output: two rows — ``criterion ∈ {youden, f1}`` with
    ``threshold, tp, fp, fn, tn, tpr, fpr, precision, f1, j``
    (6 dp; ties broken toward the LOWER threshold).
    """
    p = F.col(score_col).cast("double")
    y = F.col(outcome_col).cast("double")
    grid = df.where(p.isNotNull() & y.isNotNull()).select(
        F.round(p, int(grid_decimals)).alias("__t"),
        y.alias("__y"),
    )
    cells = grid.groupBy("__t").agg(
        F.sum(F.when(F.col("__y") > 0, 1).otherwise(0)).alias("__pos"),
        F.sum(F.when(F.col("__y") > 0, 0).otherwise(1)).alias("__neg"),
    )
    tot = cells.agg(
        F.sum("__pos").cast("long").alias("__P"),
        F.sum("__neg").cast("long").alias("__N"),
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.desc("__t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "__t",
        F.sum("__pos").over(w).cast("long").alias("tp"),
        F.sum("__neg").over(w).cast("long").alias("fp"),
    ).crossJoin(F.broadcast(tot))
    tpr = F.try_divide(F.col("tp").cast("double"), F.col("__P"))
    fpr = F.try_divide(F.col("fp").cast("double"), F.col("__N"))
    prec = F.try_divide(
        F.col("tp").cast("double"), (F.col("tp") + F.col("fp")).cast("double")
    )
    f1 = F.try_divide(
        F.lit(2.0) * F.col("tp").cast("double"),
        (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("__P") - F.col("tp"))
        .cast("double"),
    )
    j = tpr - fpr
    scored = cum.select(
        "__t",
        "tp",
        "fp",
        (F.col("__P") - F.col("tp")).cast("long").alias("fn"),
        (F.col("__N") - F.col("fp")).cast("long").alias("tn"),
        F.round(tpr, 6).alias("tpr"),
        F.round(fpr, 6).alias("fpr"),
        F.round(prec, 6).alias("precision"),
        F.round(f1, 6).alias("f1"),
        F.round(j, 6).alias("j"),
    )
    outs = []
    for crit, key in (("youden", "j"), ("f1", "f1")):
        wb = Window.partitionBy(F.lit(1)).orderBy(
            F.desc(key), F.asc("__t")
        )
        outs.append(
            scored.withColumn("__rn", F.row_number().over(wb))
            .where(F.col("__rn") == 1)
            .select(
                F.lit(crit).alias("criterion"),
                F.col("__t").alias("threshold"),
                "tp",
                "fp",
                "fn",
                "tn",
                "tpr",
                "fpr",
                "precision",
                "f1",
                "j",
            )
        )
    return outs[0].unionByName(outs[1])


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    epsilons: Sequence[float] = (0.1, 1.0, 10.0),
    salt: str = "dp",
    sensitivity: float = 1.0,
) -> DataFrame:
    """Differential-privacy utility gauge: release per-group counts
    under the Laplace mechanism (Dwork-McSherry-Nissim-Smith 2006) at
    an epsilon ladder and measure what each privacy level costs in
    count accuracy — run on NON-sensitive calibration data to pick
    the epsilon a production release can afford.

    Count queries have L1 sensitivity *sensitivity* (=1: one
    individual moves one group), so adding ``Laplace(sensitivity/eps)``
    noise to every group count is eps-DP.  The noise draw is
    derandomized: uniform ``u = (h64(salt:eps_idx:groupkey)+0.5)/2^32``
    through the Laplace inverse CDF ``-b*sgn(u-.5)*ln(1-2|u-.5|)`` —
    reproducible across engines and partitionings, the repo's standard
    md5 derandomization (cf. sketch._hash64).  Release is clamped at 0
    and rounded to an integer, the usual post-processing (both DP-safe:
    post-processing cannot leak).

    THIS IS THE AUDIT HARNESS: it emits true and released counts side
    by side to measure utility.  A production release keeps only
    ``(group, epsilon, n_released)`` — never ship ``n_true`` or the
    error columns next to a release of actually-sensitive data.

    Scale: one hash aggregation for the counts, then a tiny
    literal-array explode (|epsilons| rows per group) of pure per-row
    column algebra — no extra shuffle, no float accumulation at all,
    so the result is trivially partition-invariant."""
    parts = [F.col(c) for c in group_cols]
    counts = df.groupBy(*parts).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    eps_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("ei"), F.lit(float(e)).alias("epsilon")
            )
            for i, e in enumerate(epsilons)
        ]
    )
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in group_cols]
    )
    expl = counts.select(
        *[F.col(c) for c in group_cols],
        "n_true",
        F.explode(eps_structs).alias("e"),
        key.alias("__key"),
    ).select(
        *[F.col(c) for c in group_cols],
        "n_true",
        F.col("e.ei").alias("__ei"),
        F.col("e.epsilon").alias("epsilon"),
        "__key",
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("__ei").cast("string"),
                        F.col("__key"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = (
        F.lit(-float(sensitivity))
        / F.col("epsilon")
        * F.when(u < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    released = F.greatest(
        F.lit(0.0), F.round(F.col("n_true") + noise, 0)
    ).cast("long")
    return expl.select(
        *[F.col(c) for c in group_cols],
        "epsilon",
        "n_true",
        released.alias("n_released"),
        F.abs(released - F.col("n_true")).cast("long").alias("abs_err"),
        F.round(
            F.try_divide(
                F.abs(released - F.col("n_true")).cast("double"),
                F.col("n_true").cast("double"),
            ),
            6,
        ).alias("rel_err"),
    )


def randomized_response_gauge(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    p_truths: Sequence[float] = (0.6, 0.75, 0.9),
    salt: str = "rr",
) -> DataFrame:
    """Local-DP frequency estimation gauge (Warner 1965 randomized
    response — the mechanism behind RAPPOR-style telemetry): each
    respondent reports their binary attribute TRUTHFULLY with
    probability ``p`` and FLIPPED otherwise, so no individual report
    is trustworthy (local privacy: ``eps = ln(p/(1-p))``), yet the
    population rate debiases exactly:
    ``pi_hat = (lambda - (1-p)) / (2p - 1)`` for observed rate
    ``lambda``.

    The local-DP counterpart of :func:`dp_noisy_counts` (central
    model): there the curator sees truth and noises the AGGREGATE;
    here each row is noised BEFORE collection — the right model when
    the collector itself is untrusted.  Flips are derandomized per
    (respondent, ladder index) through the repo's md5-uniform, so the
    gauge is reproducible across engines and partitionings.

    AUDIT HARNESS: emits true vs estimated rate side by side to pick
    the p (privacy level) a telemetry rollout can afford — run it on
    non-sensitive calibration data; a production collector never sees
    ``true_rate``.

    Scale shape: one |ladder|-way literal explode of per-row column
    algebra, one integer count aggregate per ladder rung — no float
    accumulation anywhere (rates are ratios of exact integers).

    Returns one row per rung: ``(p_truth, epsilon, n, true_rate,
    observed_rate, est_rate, abs_err)`` at 6 dp."""
    rungs = F.array(
        *[
            F.struct(
                F.lit(i).alias("ri"), F.lit(float(p)).alias("p_truth")
            )
            for i, p in enumerate(p_truths)
        ]
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("ri").cast("string"),
                        F.col("__id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    truth = (F.col(value_col).cast("long") > 0).cast("long")
    expl = df.select(
        F.col(id_col).alias("__id"), truth.alias("__v"),
        F.explode(rungs).alias("r"),
    ).select(
        "__id",
        "__v",
        F.col("r.ri").alias("ri"),
        F.col("r.p_truth").alias("p_truth"),
    )
    report = F.when(u < F.col("p_truth"), F.col("__v")).otherwise(
        F.lit(1) - F.col("__v")
    )
    agg = expl.groupBy("ri", "p_truth").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").cast("long").alias("n_true"),
        F.sum(report).cast("long").alias("n_obs"),
    )
    lam = F.col("n_obs").cast("double") / F.col("n").cast("double")
    p = F.col("p_truth")
    est = (lam - (F.lit(1.0) - p)) / (F.lit(2.0) * p - F.lit(1.0))
    true_rate = F.col("n_true").cast("double") / F.col("n").cast(
        "double"
    )
    return agg.select(
        "p_truth",
        F.round(F.log(p / (F.lit(1.0) - p)), 6).alias("epsilon"),
        "n",
        F.round(true_rate, 6).alias("true_rate"),
        F.round(lam, 6).alias("observed_rate"),
        F.round(est, 6).alias("est_rate"),
        F.round(F.abs(est - true_rate), 6).alias("abs_err"),
    ).orderBy("p_truth")


def corrected_prevalence(
    df: DataFrame,
    group_cols: Sequence[str],
    pred_col: str,
    truth_col: str,
    calib_col: str,
) -> DataFrame:
    """Misclassification-corrected prevalence (Rogan-Gladen 1978 —
    the two-class case of BBSE label-shift correction, Lipton et al.
    2018): a cheap classifier's APPARENT positive rate on a target
    group mixes true prevalence with the classifier's error rates;
    with sensitivity and specificity measured once on a labeled
    calibration slice, ``pi = (apparent + spec - 1)/(sens + spec - 1)``
    recovers the true rate — the standard way to track a label's
    prevalence across 100 TB with a classifier you only trust enough
    to calibrate.

    Rows where *calib_col* is true form the calibration slice (truth
    labels required there); every other row is target, grouped by
    *group_cols*.  The correction needs a better-than-chance
    classifier: Youden ``sens + spec - 1 <= 0`` yields NULL corrected
    rates, not a sign-flipped estimate.  Estimates clamp to [0, 1]
    (the usual truncation) and carry the delta-method SE
    ``sqrt(apparent(1-apparent)/n) / (sens + spec - 1)``.

    Plan shape: ONE 1-row integer aggregate for (sens, spec),
    broadcast onto one integer aggregate per target group — counts
    only, no float accumulation, so the result is trivially
    partition-invariant.

    Returns one row per target group: ``(..., n, apparent, sens,
    spec, corrected, se)`` at 6 dp."""
    parts = [F.col(c) for c in group_cols]
    pred = (F.col(pred_col).cast("long") > 0).cast("long")
    truth = (F.col(truth_col).cast("long") > 0).cast("long")
    base = df.select(
        *parts,
        pred.alias("__p"),
        truth.alias("__t"),
        F.col(calib_col).cast("boolean").alias("__cal"),
    )
    cal = base.where(F.col("__cal")).agg(
        F.try_divide(
            F.sum(F.col("__p") * F.col("__t")).cast("double"),
            F.sum("__t").cast("double"),
        ).alias("__sens"),
        F.try_divide(
            F.sum((1 - F.col("__p")) * (1 - F.col("__t"))).cast(
                "double"
            ),
            F.sum(F.lit(1) - F.col("__t")).cast("double"),
        ).alias("__spec"),
    )
    tgt = (
        base.where(~F.col("__cal"))
        .groupBy(*parts)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__p").cast("long").alias("__np"),
        )
    )
    j = tgt.crossJoin(F.broadcast(cal))
    apparent = F.col("__np").cast("double") / F.col("n").cast("double")
    youden = F.col("__sens") + F.col("__spec") - F.lit(1.0)
    corrected = F.when(
        youden > 0,
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                (apparent + F.col("__spec") - F.lit(1.0)) / youden,
            ),
        ),
    )
    se = F.when(
        youden > 0,
        F.sqrt(apparent * (F.lit(1.0) - apparent) / F.col("n"))
        / youden,
    )
    return j.select(
        *parts,
        "n",
        F.round(apparent, 6).alias("apparent"),
        F.round(F.col("__sens"), 6).alias("sens"),
        F.round(F.col("__spec"), 6).alias("spec"),
        F.round(corrected, 6).alias("corrected"),
        F.round(se, 6).alias("se"),
    )


def hbos_scores(
    df: DataFrame,
    id_col: str,
    feature_cols: list,
    *,
    bins: int = 16,
    top_n: int = 20,
) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel 2012): per
    feature, an equal-width histogram over the observed range turns
    each value into a bin density ``p``; a row's outlier score is
    ``Σ_f log10(1/p_f)`` — high where the row sits in thin bins on
    many features at once.  The O(n) unsupervised outlier gauge to
    run over a 100 TB metrics table BEFORE paying for anything
    quadratic (isolation forests, kNN distances): density estimation
    per feature is one aggregation, scoring is a broadcast join.

    Plan shape: per feature one 1-row min/max broadcast + one ≤*bins*-
    row count table broadcast back — no shuffle of the data by
    feature, no window.  Rows with any null feature are excluded (a
    null has no density).  Degenerate constant features (min == max)
    collapse to one bin with p = 1, contributing 0 to every score.

    Output: the *top_n* highest-scoring rows ``(id, score)`` at 6 dp,
    score desc / id asc — deterministic under any partitioning.
    """
    b = int(bins)
    if b < 2:
        raise ValueError("bins must be >= 2")
    feats = list(feature_cols)
    if not feats:
        raise ValueError("feature_cols must be non-empty")
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c).cast("double").alias(f"__f{i}") for i, c in enumerate(feats)],
    )
    for i in range(len(feats)):
        base = base.where(F.col(f"__f{i}").isNotNull())
    rng = base.agg(
        *[
            agg
            for i in range(len(feats))
            for agg in (
                F.min(f"__f{i}").alias(f"__lo{i}"),
                F.max(f"__f{i}").alias(f"__hi{i}"),
            )
        ]
    )
    binned = base.crossJoin(F.broadcast(rng))
    score_terms = []
    n_total = None
    for i in range(len(feats)):
        lo, hi = F.col(f"__lo{i}"), F.col(f"__hi{i}")
        width = (hi - lo) / F.lit(b)
        raw = F.floor(F.try_divide(F.col(f"__f{i}") - lo, width)).cast("long")
        bucket = F.coalesce(
            F.least(F.greatest(raw, F.lit(0)), F.lit(b - 1)), F.lit(0)
        )
        binned = binned.withColumn(f"__b{i}", bucket)
    counted = binned
    for i in range(len(feats)):
        hist = (
            binned.groupBy(F.col(f"__b{i}").alias(f"__hb{i}"))
            .agg(F.count(F.lit(1)).alias(f"__hc{i}"))
        )
        counted = counted.join(
            F.broadcast(hist),
            counted[f"__b{i}"] == hist[f"__hb{i}"],
        ).drop(f"__hb{i}")
    total = counted.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    # count the SCORED frame once (post-join row count equals the
    # null-filtered base by construction: every bin has a hist row)
    scored = counted.crossJoin(F.broadcast(total))
    terms = [
        F.round(
            -F.log10(
                F.col(f"__hc{i}").cast("double")
                / F.col("__n").cast("double")
            ),
            9,
        ).cast("decimal(28,12)")
        for i in range(len(feats))
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    out = scored.select(
        "id", F.round(expr.cast("double"), 6).alias("score")
    )
    return out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(
        int(top_n)
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    bins: int = 20,
) -> DataFrame:
    """Weighted isotonic regression of *label_col* on binned
    *score_col* (Barlow et al. 1972; the calibration map behind
    isotonic probability calibration, Zadrozny & Elkan 2002) — the
    monotone step function closest in weighted L2 to the per-bin
    label means.

    Computed via the minimax identity rather than the sequential PAVA
    sweep: ``iso(i) = max_{a<=i} min_{b>=i} wmean(a..b)`` where
    ``wmean(a..b)`` is the n-weighted label mean of the bin block
    ``[a, b]`` — block means come from prefix sums, the max-min folds
    over a bounded (i, a, b) grid.  Equivalent to PAVA's pooled
    solution but expressible as pure relational algebra on BOTH
    engines, so the oracle reproduces the math independently instead
    of simulating a sequential pool loop.

    Scale shape: ONE data shuffle (groupBy bin, map-side partial
    aggs); everything after operates on <= *bins* rows, and the
    (i, a, b) grid is <= bins^3 metadata rows (8k at the default 20)
    — never data-sized.  This is why the operator bins first: exact
    isotonic regression on raw points is inherently sequential, while
    the binned fit is what a 100 TB calibration pass actually wants
    (the monotone map is applied per bin anyway).

    Determinism: block means are double/double divisions of exact
    decimal prefix sums (IEEE-identical cross-engine); min/max are
    exact selections; outputs round via the tie-safe ``*1e6``
    multiply.  Rows with null score/label are excluded.

    Output per non-empty bin: ``(bin, bin_lo, n, raw_mean,
    iso_mean)`` ordered by bin; ``iso_mean`` is non-decreasing in
    ``bin`` by construction.
    """
    b = int(bins)
    if b < 2:
        raise ValueError("bins must be >= 2")
    dec = "decimal(38,9)"

    def _r6(x: Column) -> Column:
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        s.alias("__s"), y.alias("__y")
    )
    rng = base.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    binned = base.crossJoin(F.broadcast(rng)).select(
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(b - 1),
                F.floor(
                    (F.col("__s") - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / F.lit(float(b)))
                ),
            )
        )
        .cast("long")
        .alias("bin"),
        F.col("__lo"),
        F.col("__hi"),
        F.col("__y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("__y"), 9).cast(dec)).alias("__sy"),
        F.first("__lo").alias("__lo"),
        F.first("__hi").alias("__hi"),
    )
    wb = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = per_bin.select(
        "bin",
        "n",
        "__sy",
        "__lo",
        "__hi",
        F.sum("n").over(wb).cast("long").alias("__cn"),
        F.sum(F.col("__sy").cast(dec)).over(wb).alias("__cs"),
    )
    lohi = pref.select(
        F.col("bin").alias("__a"),
        (F.col("__cn") - F.col("n")).alias("__n_before"),
        (F.col("__cs") - F.col("__sy")).cast(dec).alias("__s_before"),
    )
    ends = pref.select(
        F.col("bin").alias("__b"),
        F.col("__cn").alias("__n_upto"),
        F.col("__cs").alias("__s_upto"),
    )
    # all blocks a <= b over the <= bins-row aggregate: bounded grid
    blocks = lohi.join(ends, F.col("__a") <= F.col("__b")).select(
        "__a",
        "__b",
        (
            (F.col("__s_upto") - F.col("__s_before")).cast("double")
            / (F.col("__n_upto") - F.col("__n_before")).cast("double")
        ).alias("__bm"),
    )
    idx = pref.select(F.col("bin").alias("__i"))
    inner = (
        idx.join(
            blocks,
            (F.col("__a") <= F.col("__i")) & (F.col("__b") >= F.col("__i")),
        )
        .groupBy("__i", "__a")
        .agg(F.min("__bm").alias("__minb"))
        .groupBy("__i")
        .agg(F.max("__minb").alias("__iso"))
    )
    return (
        pref.join(inner, pref["bin"] == inner["__i"])
        .select(
            "bin",
            _r6(
                F.when(F.col("__hi") == F.col("__lo"), F.col("__lo"))
                .otherwise(
                    F.col("__lo")
                    + F.col("bin").cast("double")
                    * ((F.col("__hi") - F.col("__lo")) / F.lit(float(b)))
                )
            ).alias("bin_lo"),
            "n",
            _r6(
                F.col("__sy").cast("double") / F.col("n").cast("double")
            ).alias("raw_mean"),
            _r6(F.col("__iso")).alias("iso_mean"),
        )
        .orderBy("bin")
    )


def ransac_line(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    tol: float,
    n_hypotheses: int = 16,
    salt: str = "ransac",
) -> DataFrame:
    """RANSAC line fit (Fischler & Bolles 1981) with DETERMINISTIC
    hypothesis sampling: the 2·H hypothesis points are the rows with
    the smallest md5-derived hash of their id (the engine-portable
    sampling idiom shared with the minhash family — both engines pick
    identical points), paired in hash order into H two-point line
    hypotheses; each point then votes for every hypothesis whose
    line passes within *tol* of it, the hypothesis with the most
    inliers wins (ties → lowest hypothesis id), and an ordinary
    least-squares REFIT over the winner's inliers gives the final
    line — the standard robust-fit answer when up to ~50% of the
    rows are gross outliers that poison plain OLS (x254's
    Cook's-distance readout flags them; this fits through them).

    Scale shape: hypothesis selection is a TakeOrdered of 2·H ≤ 128
    rows; scoring is ONE broadcast of the H-row hypothesis frame
    against the data (n·H residual evaluations, map-side — the same
    linear-in-n shape as x78's capped slopes); the winner reduces to
    1 row broadcast back for the refit moments.  No data-sized
    shuffle beyond the two aggregations; refit moments stage at 9 dp
    into DECIMAL(38,9) so the fit is partitioning-invariant.

    Output (ONE row): ``(best_hyp, n_points, n_inliers, inlier_rate,
    hyp_slope, hyp_intercept, refit_slope, refit_intercept)``
    (6 dp, tie-safe).
    """
    from .sketch import _hash64

    h = int(n_hypotheses)
    if not (1 <= h <= 64):
        raise ValueError("n_hypotheses must be in 1..64")
    if not (float(tol) > 0.0):
        raise ValueError("tol must be positive")
    dec = "decimal(38,9)"
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    seeds = (
        base.select(
            "__id", "__x", "__y",
            _hash64(F.col("__id"), salt).alias("__h"),
        )
        .orderBy("__h", "__id")
        .limit(2 * h)
    )
    wseed = Window.orderBy("__h", "__id")  # <= 2H rows — bounded
    ranked = seeds.select(
        "__x", "__y", F.row_number().over(wseed).alias("__rn")
    )
    hyps = (
        ranked.groupBy(
            F.expr("(__rn - 1) div 2").alias("__hyp")
        )
        .agg(
            F.max(F.when(F.col("__rn") % 2 == 1, F.col("__x"))).alias(
                "__x1"
            ),
            F.max(F.when(F.col("__rn") % 2 == 1, F.col("__y"))).alias(
                "__y1"
            ),
            F.max(F.when(F.col("__rn") % 2 == 0, F.col("__x"))).alias(
                "__x2"
            ),
            F.max(F.when(F.col("__rn") % 2 == 0, F.col("__y"))).alias(
                "__y2"
            ),
        )
        .where(
            F.col("__x2").isNotNull() & (F.col("__x2") != F.col("__x1"))
        )
        .select(
            "__hyp", "__x1", "__y1",
            (
                (F.col("__y2") - F.col("__y1"))
                / (F.col("__x2") - F.col("__x1"))
            ).alias("__slope"),
        )
        .select(
            "__hyp",
            "__slope",
            (F.col("__y1") - F.col("__slope") * F.col("__x1")).alias(
                "__icept"
            ),
        )
    )
    scored = base.crossJoin(F.broadcast(hyps)).where(
        F.abs(
            F.col("__y")
            - (F.col("__slope") * F.col("__x") + F.col("__icept"))
        )
        <= F.lit(float(tol))
    )
    counts = scored.groupBy("__hyp", "__slope", "__icept").agg(
        F.count(F.lit(1)).alias("__ninl")
    )
    best = (
        counts.orderBy(F.col("__ninl").desc(), F.col("__hyp").asc())
        .limit(1)
    )
    refit = (
        base.crossJoin(F.broadcast(best))
        .where(
            F.abs(
                F.col("__y")
                - (F.col("__slope") * F.col("__x") + F.col("__icept"))
            )
            <= F.lit(float(tol))
        )
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.round(F.col("__x"), 9).cast(dec)).alias("__sx"),
            F.sum(F.round(F.col("__y"), 9).cast(dec)).alias("__sy"),
            F.sum(
                F.round(F.col("__x") * F.col("__y"), 9).cast(dec)
            ).alias("__sxy"),
            F.sum(
                F.round(F.col("__x") * F.col("__x"), 9).cast(dec)
            ).alias("__sxx"),
        )
    )
    npts = base.agg(F.count(F.lit(1)).alias("__np"))

    def _r6(v):
        return F.round(v * F.lit(1e6)) / F.lit(1e6)

    nd = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    det = nd * sxx - sx * sx
    rslope = (nd * sxy - sx * sy) / det
    return (
        best.crossJoin(refit)
        .crossJoin(F.broadcast(npts))
        .select(
            F.col("__hyp").alias("best_hyp"),
            F.col("__np").alias("n_points"),
            F.col("__ninl").alias("n_inliers"),
            _r6(
                F.col("__ninl").cast("double")
                / F.col("__np").cast("double")
            ).alias("inlier_rate"),
            _r6(F.col("__slope")).alias("hyp_slope"),
            _r6(F.col("__icept")).alias("hyp_intercept"),
            _r6(rslope).alias("refit_slope"),
            _r6((sy - rslope * sx) / nd).alias("refit_intercept"),
        )
    )


def jarque_bera(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Jarque–Bera normality test per group (Jarque & Bera 1980):
    sample skewness S and excess kurtosis K−3 from central moments,

        ``JB = n/6 · (S² + (K−3)²/4)``,  JB ~ χ²(2) under normality
        (5 % critical value 5.991465 — flag above it).

    Two passes: a decimal-exact mean, then central moments over
    INTEGER-rounded deviations (``d = round(v − mean)`` — whole-unit
    deviations keep d⁴ ≤ ~1e14 exactly representable in doubles AND
    decimal-exact in the sums, so both engines fold identical
    integers; the quantization error is O(1/|d|) ≪ the test's own
    sampling noise for the panel magnitudes this runs on, and the
    SAME definition is computed by the oracle — no approximation gap
    between engines).  The moments-based companion to x99's KS
    distribution distance: KS compares to an empirical reference,
    JB asks the shape question directly from S and K.

    Output: ``(group, n, skewness, kurtosis, jb_stat, non_normal)``
    at 6 dp, ordered by group; NULL stats when the variance
    collapses (m2 = 0) or n < 8.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    means = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (dec(F.col("v")) / F.count(F.lit(1))).alias("mean"),
    )
    d = F.round(F.col("v") - F.col("mean"))
    dev = base.join(F.broadcast(means), "g").select(
        "g", "n", d.alias("d")
    )
    mom = dev.groupBy("g", "n").agg(
        dec(F.col("d") * F.col("d")).alias("s2"),
        dec(F.col("d") * F.col("d") * F.col("d")).alias("s3"),
        dec(
            F.col("d") * F.col("d") * F.col("d") * F.col("d")
        ).alias("s4"),
    )
    n = F.col("n")
    m2 = F.col("s2") / n
    m3 = F.col("s3") / n
    m4 = F.col("s4") / n
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2)
    jb = (
        n / F.lit(6.0)
        * (
            skew * skew
            + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
        )
    )
    ok = (F.col("s2") > 0) & (n >= 8)
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return mom.select(
        F.col("g").alias("group"),
        n.cast("long").alias("n"),
        r6(F.when(ok, skew)).alias("skewness"),
        r6(F.when(ok, kurt)).alias("kurtosis"),
        r6(F.when(ok, jb)).alias("jb_stat"),
        F.when(ok, (jb > F.lit(5.991465)).cast("int")).alias(
            "non_normal"
        ),
    ).orderBy("group")


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    bucket_width: float,
    max_buckets: int = 4096,
) -> DataFrame:
    """Jonckheere-Terpstra trend test against an ORDERED alternative
    (Jonckheere 1954; Terpstra 1952): where Kruskal-Wallis (x217)
    asks "do the groups differ at all", JT asks "do they INCREASE
    with the group order" (dose-response, priority tiers, cohort
    vintages) — strictly more powerful when the order is real.

    ``JT = Σ_{i<j} U_ij`` over group pairs in *order_col* order, with
    the tie convention ``U = #less + ½·#equal`` carried as the
    integer ``2·U = 2·#less + #equal``.  Values bucket to
    ``floor(v / bucket_width)`` first, so the pair term collapses to
    a join of per-(group, bucket) COUNT frames — O(pairs·buckets²)
    with a loud-fail bucket cap, never row-quadratic (document the
    bucketing; it is part of the statistic's definition here).  The
    normal approximation uses the no-tie moments
    ``E = (N² − Σn_k²)/4`` and
    ``Var = (N²(2N+3) − Σn_k²(2n_k+3))/72`` — integer numerators,
    one shared float division for z.

    Output (one row): ``jt2`` (= 2·JT, integer), ``e2`` (= 2·E),
    ``n_total``, ``n_groups``, ``z`` (6 dp).
    """
    b = float(bucket_width)
    if b <= 0:
        raise ValueError("jonckheere_terpstra: bucket_width must be > 0")
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(order_col).cast("long").alias("ord"),
        F.floor(F.col(value_col).cast("double") / b)
        .cast("long")
        .alias("bk"),
    ).where(F.col("bk").isNotNull() & F.col("ord").isNotNull())
    nb = base.select("bk").distinct().count()
    if nb > int(max_buckets):
        raise ValueError(
            f"jonckheere_terpstra: {nb} buckets exceeds "
            f"max_buckets={max_buckets} — widen bucket_width"
        )
    cnt = base.groupBy("g", "ord", "bk").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = cnt.select(
        F.col("ord").alias("oi"), F.col("bk").alias("bi"),
        F.col("n").alias("ni"),
    )
    bb = cnt.select(
        F.col("ord").alias("oj"), F.col("bk").alias("bj"),
        F.col("n").alias("nj"),
    )
    pairs = a.join(bb, a.oi < bb.oj)
    jt2 = pairs.agg(
        F.sum(
            F.when(F.col("bi") < F.col("bj"), 2 * F.col("ni") * F.col("nj"))
            .when(F.col("bi") == F.col("bj"), F.col("ni") * F.col("nj"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("jt2")
    )
    sizes = base.groupBy("ord").agg(
        F.count(F.lit(1)).cast("long").alias("nk")
    )
    moments = sizes.agg(
        F.sum("nk").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("nk") * F.col("nk")).cast("long").alias("s2"),
        F.sum(
            F.col("nk") * F.col("nk") * (2 * F.col("nk") + 3)
        )
        .cast("long")
        .alias("s3"),
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    out = jt2.crossJoin(F.broadcast(moments))
    e2 = (F.col("n_total") * F.col("n_total") - F.col("s2")) / 2
    var = (
        F.col("n_total")
        * F.col("n_total")
        * (2 * F.col("n_total") + 3)
        - F.col("s3")
    ) / 72.0
    return out.select(
        "jt2",
        e2.cast("long").alias("e2"),
        "n_total",
        "n_groups",
        r6(
            F.try_divide(
                (F.col("jt2") - e2) / 2.0, F.sqrt(var)
            )
        ).alias("z"),
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    x_bucket: float,
    y_bucket: float,
    max_cells: int = 65536,
) -> DataFrame:
    """Kendall's τ-b rank correlation (Kendall 1945 tie-corrected
    form) over bucketed supports — the robust monotone-association
    complement to Spearman (x119): concordant/discordant PAIR counts
    instead of rank moments, which makes it exactly computable from a
    contingency-style count frame with NO row-quadratic term.

    Values bucket to ``floor(v / bucket)`` per axis (part of the
    statistic's definition here, as in x406); the (x, y) cell-count
    frame self-joins once (``Σ cells²`` bounded by *max_cells*
    loud-fail) and every pair of rows lands in exactly one of
    concordant / discordant / tie-x / tie-y / tie-both — all
    integers.  τ-b = (C − D)/√((P − Tx)(P − Ty)) with P = n(n−1)/2,
    Tx/Ty the within-axis tie pair counts; one shared float
    expression for the final ratio.

    Output (one row): ``n, concordant, discordant, tie_x, tie_y,
    tau_b`` (6 dp).
    """
    bx, by = float(x_bucket), float(y_bucket)
    if bx <= 0 or by <= 0:
        raise ValueError("kendall_tau_b: buckets must be > 0")
    base = df.select(
        F.floor(F.col(x_col).cast("double") / bx).cast("long").alias("xb"),
        F.floor(F.col(y_col).cast("double") / by).cast("long").alias("yb"),
    ).where(F.col("xb").isNotNull() & F.col("yb").isNotNull())
    cells = base.groupBy("xb", "yb").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ncells = cells.count()
    if ncells > int(max_cells):
        raise ValueError(
            f"kendall_tau_b: {ncells} cells exceeds "
            f"max_cells={max_cells} — widen the buckets"
        )
    a = cells.select(
        F.col("xb").alias("x1"), F.col("yb").alias("y1"),
        F.col("n").alias("n1"),
    )
    b = cells.select(
        F.col("xb").alias("x2"), F.col("yb").alias("y2"),
        F.col("n").alias("n2"),
    )
    # unordered pairs of distinct cells, counted once via a total
    # order on (x, y); same-cell pairs are tie-both and drop out
    pairs = a.join(
        b,
        (F.col("x1") < F.col("x2"))
        | ((F.col("x1") == F.col("x2")) & (F.col("y1") < F.col("y2"))),
    )
    agg = pairs.agg(
        F.sum(
            F.when(
                (F.col("x1") != F.col("x2"))
                & (
                    ((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
                    | ((F.col("x1") > F.col("x2")) & (F.col("y1") > F.col("y2")))
                ),
                F.col("n1") * F.col("n2"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(
                (F.col("x1") != F.col("x2"))
                & (F.col("y1") != F.col("y2"))
                & (
                    ((F.col("x1") < F.col("x2")) & (F.col("y1") > F.col("y2")))
                    | ((F.col("x1") > F.col("x2")) & (F.col("y1") < F.col("y2")))
                ),
                F.col("n1") * F.col("n2"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("discordant"),
        F.sum(
            F.when(
                (F.col("x1") == F.col("x2")) & (F.col("y1") != F.col("y2")),
                F.col("n1") * F.col("n2"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("tie_x_cross"),
        F.sum(
            F.when(
                (F.col("y1") == F.col("y2")) & (F.col("x1") != F.col("x2")),
                F.col("n1") * F.col("n2"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("tie_y_cross"),
    )
    nn = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    same = cells.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2)
        .cast("long")
        .alias("tie_both")
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    out = agg.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(same))
    p_tot = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    tx = F.col("tie_x_cross") + F.col("tie_both")
    ty = F.col("tie_y_cross") + F.col("tie_both")
    return out.select(
        "n",
        "concordant",
        "discordant",
        tx.cast("long").alias("tie_x"),
        ty.cast("long").alias("tie_y"),
        r6(
            F.try_divide(
                (F.col("concordant") - F.col("discordant")).cast(
                    "double"
                ),
                F.sqrt(
                    (p_tot - tx).cast("double")
                    * (p_tot - ty).cast("double")
                ),
            )
        ).alias("tau_b"),
    )


def breslow_day(
    tables: DataFrame,
    *,
    stratum_col: str = "stratum",
    a_col: str = "a",
    b_col: str = "b",
    c_col: str = "c",
    d_col: str = "d",
) -> DataFrame:
    """Breslow-Day homogeneity-of-odds-ratios test (Breslow & Day
    1980 §IV.4) over per-stratum 2×2 tables — the companion question
    to Mantel-Haenszel (x251): MH estimates the COMMON odds ratio,
    Breslow-Day asks whether a common one is even defensible
    (treatment-by-segment interaction detection).

    Per stratum with margins (r1 = a+b, r2 = c+d, c1 = a+c) and the
    MH pooled odds ratio ψ̂, the expected count Â solves the quadratic
    ``ψ̂ = Â(r2−c1+Â) / ((r1−Â)(c1−Â))`` — the root inside
    ``(max(0, c1−r2), min(r1, c1))``, selected by the same closed
    form and range test in both engines; the variance is the
    harmonic term ``1/(1/Â + 1/(r1−Â) + 1/(c1−Â) + 1/(r2−c1+Â))``
    and ``X² = Σ (a−Â)²/V``.

    Cross-engine determinism: all counts integer; ψ̂'s two cross-
    product sums and the X² fold re-enter DECIMAL(38,12) per term
    (bounded strata), every other float is one shared expression.

    Output (one row): ``n_strata, or_mh, bd_chi2`` (6 dp) plus the
    degrees of freedom ``df = n_strata − 1``.
    """
    t = tables.select(
        F.col(stratum_col).alias("s"),
        F.col(a_col).cast("double").alias("a"),
        F.col(b_col).cast("double").alias("b"),
        F.col(c_col).cast("double").alias("c"),
        F.col(d_col).cast("double").alias("d"),
    ).withColumn("tt", F.col("a") + F.col("b") + F.col("c") + F.col("d"))
    mh = t.agg(
        F.sum(
            (F.col("a") * F.col("d") / F.col("tt")).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("num"),
        F.sum(
            (F.col("b") * F.col("c") / F.col("tt")).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
    ).withColumn("psi", F.try_divide(F.col("num"), F.col("den")))
    j = t.crossJoin(F.broadcast(mh))
    r1 = F.col("a") + F.col("b")
    r2 = F.col("c") + F.col("d")
    c1 = F.col("a") + F.col("c")
    # quadratic (psi-1)A^2 - (psi(r1+c1) + r2 - c1)A + psi*r1*c1 = 0
    qa = F.col("psi") - 1.0
    qb = -(F.col("psi") * (r1 + c1) + (r2 - c1))
    qc = F.col("psi") * r1 * c1
    disc = F.sqrt(F.greatest(qb * qb - 4.0 * qa * qc, F.lit(0.0)))
    root1 = F.try_divide(-qb - disc, 2.0 * qa)
    root2 = F.try_divide(-qb + disc, 2.0 * qa)
    lin = F.try_divide(-qc, qb)  # psi == 1 degenerate: linear case
    lo = F.greatest(F.lit(0.0), c1 - r2)
    hi = F.least(r1, c1)
    def _valid(r):
        return r.isNotNull() & (r > lo) & (r < hi)
    ahat = (
        F.when(F.abs(qa) < 1e-12, lin)
        .when(_valid(root1), root1)
        .otherwise(root2)
    )
    var = F.try_divide(
        F.lit(1.0),
        1.0 / ahat
        + 1.0 / (r1 - ahat)
        + 1.0 / (c1 - ahat)
        + 1.0 / (r2 - c1 + ahat),
    )
    terms = j.select(
        "n_strata",
        "psi",
        (
            F.try_divide(
                (F.col("a") - ahat) * (F.col("a") - ahat), var
            )
        ).cast("decimal(38,12)").alias("term"),
    )
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return terms.groupBy("n_strata", "psi").agg(
        F.sum("term").cast("double").alias("chi2")
    ).select(
        "n_strata",
        (F.col("n_strata") - 1).cast("long").alias("df"),
        r6(F.col("psi")).alias("or_mh"),
        r6(F.col("chi2")).alias("bd_chi2"),
    )
