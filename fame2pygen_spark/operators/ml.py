"""Training-adjacent ML primitives, Spark-first.

The reference engine (botlhale/Fame2PyGen) stops at series math; a
100 TB training-data pipeline also needs the model-side primitives
that grade and shape the data.  Four canonical ones live here, each
expressed as keyed joins/aggregations (never a driver loop, never a
per-row Python UDF):

* ``lof_grid`` — Local Outlier Factor over a 2-D grid-bucketed kNN
  (Breunig et al. 2000): the density-ratio outlier score that flags
  points whose local density is low RELATIVE to their neighbours' —
  catches outliers sitting between clusters that a global z-score
  (x38) or histogram score (x143 HBOS) misses.
* ``gmm_em_step`` — one exact EM iteration of a two-component 1-D
  Gaussian mixture from literal initial parameters: the E-step
  responsibility is a single logistic of the quadratic
  log-likelihood gap, the M-step is decimal-exact weighted moments.
* ``decision_stump_hist`` — LightGBM-style histogram split finding:
  bin the feature map-side, ONE groupBy, and scan the ≤ n_bins
  aggregate rows for the Gini-optimal binary split.
* ``logistic_newton_step`` — the first Newton step of logistic
  regression from w = 0 in closed form: ``w1 = 4 (X'X)^{-1} X'(y-½)``
  via the 3×3 adjugate on decimal-exact sufficient statistics.

All four share the repo's cross-engine exactness discipline: float
folds re-enter DECIMAL(38,12), literals are injected identically into
the Spark plan and the SQL oracle, and tie-breaks are total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "lof_grid",
    "gmm_em_step",
    "decision_stump_hist",
    "logistic_newton_step",
    "shapley_r2_3",
    "pav_fit",
    "split_conformal_interval",
    "james_stein_shrinkage",
]

_r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
_dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731


def lof_grid(
    df: DataFrame,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
    k: int = 5,
    cell: float = 1.0,
    max_cell_points: int = 4096,
) -> DataFrame:
    """Local Outlier Factor with exact kNN restricted to the 3×3
    grid-cell neighborhood (the geo_radius_join bucketing applied to
    density estimation): LOF(p) = mean(lrd(o), o ∈ kNN(p)) / lrd(p)
    with lrd(p) = k / Σ reach-dist and reach-dist(p,o) =
    max(k-dist(o), d(p,o)).  LOF ≈ 1 inside uniform regions, ≫ 1 for
    density outliers.

    Semantics are the deterministic grid variant: candidate
    neighbours come from the point's own and 8 adjacent cells (choose
    *cell* ≥ the expected kNN radius so the truncation is vacuous for
    inliers — exactly the cell-size contract of geo_radius_join), and
    kNN takes EXACTLY k neighbours under the total order
    (distance, neighbour id) so ties never make |N_k| data-dependent.
    Points with fewer than k in-neighborhood candidates, or whose
    neighbours lack a k-dist, emit NULL lof (auditable, never
    silently wrong).

    Scale shape: the candidate join is ONE equi-join on the packed
    cell id after a map-side 9-way neighbor-cell explode — cost is
    Σ per-neighborhood |cell|·|block|, loud-fail past
    *max_cell_points* per cell (re-cell, don't densify); the two
    follow-up joins run on the k·n edge frame keyed by point id.  No
    cartesian, no global window, no Python.

    Output: ``(id, n_cand, k_dist, lrd, lof)`` at 6 dp, ordered by
    id.
    """
    if k < 1:
        raise ValueError("lof_grid: k must be >= 1")
    c = float(cell)
    if c <= 0:
        raise ValueError("lof_grid: cell must be positive")
    pts = df.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(
        F.col("pid").isNotNull()
        & F.col("x").isNotNull()
        & F.col("y").isNotNull()
    )
    cellify = lambda col: F.floor(col / F.lit(c)).cast("long")  # noqa: E731
    pts = pts.withColumn("cx", cellify(F.col("x"))).withColumn(
        "cy", cellify(F.col("y"))
    )
    dense = (
        pts.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()
    )
    if dense["mx"] is None:
        raise ValueError("lof_grid: input is empty")
    if dense["mx"] > int(max_cell_points):
        raise ValueError(
            f"lof_grid: densest cell holds {dense['mx']} points "
            f"(max_cell_points={max_cell_points}) — enlarge `cell` "
            "resolution or pre-aggregate"
        )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = pts.select(
        F.col("pid").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(offs).alias("o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "a_id", "ax", "ay",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    cands = pts.select(
        F.col("pid").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    pairs = (
        probes.join(cands, ["jx", "jy"])
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.sqrt(
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by"))
                * (F.col("ay") - F.col("by"))
            ).alias("dist"),
        )
    )
    wk = Window.partitionBy("a_id").orderBy("dist", "b_id")
    edges = pairs.withColumn("rk", F.row_number().over(wk)).where(
        F.col("rk") <= k
    )
    per_pt = edges.groupBy("a_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cand"),
        F.max("dist").alias("k_dist"),
    )
    kdist_full = per_pt.where(F.col("n_cand") == k).select(
        F.col("a_id").alias("b_id"), F.col("k_dist").alias("kd_b")
    )
    # reach-dist needs the NEIGHBOUR's k-dist; inner join drops edges
    # whose neighbour has no full kNN -> those points surface as
    # NULL lrd below via the count check
    reach = (
        edges.join(kdist_full, "b_id")
        .select(
            "a_id",
            "b_id",
            F.greatest(F.col("kd_b"), F.col("dist")).alias("rd"),
        )
    )
    lrd = (
        reach.groupBy("a_id")
        .agg(
            F.count(F.lit(1)).alias("n_rd"),
            _dec(F.col("rd")).alias("s_rd"),
        )
        .select(
            "a_id",
            F.when(
                (F.col("n_rd") == k) & (F.col("s_rd") > 0),
                F.lit(float(k)) / F.col("s_rd"),
            ).alias("lrd"),
        )
    )
    nbr_lrd = lrd.select(
        F.col("a_id").alias("b_id"), F.col("lrd").alias("lrd_b")
    )
    lof = (
        edges.join(nbr_lrd, "b_id")
        .where(F.col("lrd_b").isNotNull())
        .groupBy("a_id")
        .agg(
            F.count(F.lit(1)).alias("n_l"),
            _dec(F.col("lrd_b")).alias("s_l"),
        )
    )
    out = (
        pts.select("pid")
        .join(per_pt.withColumnRenamed("a_id", "pid"), "pid", "left")
        .join(lrd.withColumnRenamed("a_id", "pid"), "pid", "left")
        .join(lof.withColumnRenamed("a_id", "pid"), "pid", "left")
    )
    return out.select(
        F.col("pid").alias("id"),
        F.coalesce(F.col("n_cand"), F.lit(0)).alias("n_cand"),
        _r6(F.when(F.col("n_cand") == k, F.col("k_dist"))).alias(
            "k_dist"
        ),
        _r6(F.col("lrd")).alias("lrd"),
        _r6(
            F.when(
                F.col("lrd").isNotNull() & (F.col("n_l") == k),
                (F.col("s_l") / F.lit(float(k))) / F.col("lrd"),
            )
        ).alias("lof"),
    ).orderBy("id")


def gmm_em_step(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    mu1: float,
    mu2: float,
    sigma: float,
    pi2: float = 0.5,
) -> DataFrame:
    """One exact EM iteration of a two-component equal-variance 1-D
    Gaussian mixture per group, from LITERAL initial parameters
    (Dempster–Laird–Rubin 1977).  The E-step responsibility of
    component 2 collapses to a single logistic,

    ``g = 1 / (1 + exp(((x-mu2)^2 - (x-mu1)^2) / (2 sigma^2) + ln((1-pi2)/pi2)))``

    (one exp per row, identical expression in both engines — the
    shared-libm discipline), and the M-step re-estimates
    ``pi, mu_c, var_c`` from decimal-exact weighted moments in ONE
    groupBy pass.  Iterating = re-calling with the emitted
    parameters; one step is the distributed unit of work (the
    kmeans_step x76 idiom).

    Output per group: ``(group, n, pi2_new, mu1_new, mu2_new,
    var1_new, var2_new)`` at 6 dp; degenerate groups (a component
    receives zero total responsibility) emit NULL for that
    component's moments.
    """
    import math

    s = float(sigma)
    if s <= 0:
        raise ValueError("gmm_em_step: sigma must be positive")
    p = float(pi2)
    if not (0.0 < p < 1.0):
        raise ValueError("gmm_em_step: pi2 must be in (0, 1)")
    logit = math.log((1.0 - p) / p)
    x = F.col("v")
    a = (
        (x - F.lit(float(mu2))) * (x - F.lit(float(mu2)))
        - (x - F.lit(float(mu1))) * (x - F.lit(float(mu1)))
    ) / F.lit(2.0 * s * s) + F.lit(logit)
    g = F.lit(1.0) / (F.lit(1.0) + F.exp(a))
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    agg = base.select("grp", "v", g.alias("g")).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _dec(F.col("g")).alias("sg"),
        _dec(F.col("g") * F.col("v")).alias("sgx"),
        _dec(F.col("g") * F.col("v") * F.col("v")).alias("sgxx"),
        _dec(F.lit(1.0) - F.col("g")).alias("sh"),
        _dec((F.lit(1.0) - F.col("g")) * F.col("v")).alias("shx"),
        _dec(
            (F.lit(1.0) - F.col("g")) * F.col("v") * F.col("v")
        ).alias("shxx"),
    )
    mu2n = F.col("sgx") / F.col("sg")
    mu1n = F.col("shx") / F.col("sh")
    return agg.select(
        F.col("grp").alias("group"),
        "n",
        _r6(F.col("sg") / F.col("n")).alias("pi2_new"),
        _r6(F.when(F.col("sh") > 0, mu1n)).alias("mu1_new"),
        _r6(F.when(F.col("sg") > 0, mu2n)).alias("mu2_new"),
        _r6(
            F.when(
                F.col("sh") > 0,
                F.col("shxx") / F.col("sh") - mu1n * mu1n,
            )
        ).alias("var1_new"),
        _r6(
            F.when(
                F.col("sg") > 0,
                F.col("sgxx") / F.col("sg") - mu2n * mu2n,
            )
        ).alias("var2_new"),
    ).orderBy("group")


def decision_stump_hist(
    df: DataFrame,
    *,
    label_col: str,
    feature_col: str,
    bin_width: float,
    n_bins: int = 32,
) -> DataFrame:
    """Histogram decision stump (the LightGBM/XGBoost `hist` split
    search, one feature, one depth): clamp the feature into
    ``n_bins`` fixed-width bins map-side, ONE groupBy for per-bin
    (count, positives), then scan the ≤ n_bins aggregate rows for
    the split minimizing weighted Gini impurity.  The candidate set
    is the bin boundaries — the formulation that scales to 100 TB
    because the only ordered pass runs over metadata-sized histogram
    rows (the x318 isotonic precedent), never over the data.

    Determinism: counts are exact integers; Gini is closed-form
    double algebra on them; the argmin tie-breaks on the lower bin.

    Output: ONE row ``(best_bin, threshold, n_left, n_right,
    pos_left, pos_right, gini_root, gini_split, gain)`` — threshold
    is the upper edge of the left bin; NULL best (row of NULLs with
    counts) when no split separates both sides.
    """
    if n_bins < 2:
        raise ValueError("decision_stump_hist: n_bins must be >= 2")
    bw = float(bin_width)
    if bw <= 0:
        raise ValueError("decision_stump_hist: bin_width must be > 0")
    base = df.select(
        F.col(label_col).cast("int").alias("y"),
        F.col(feature_col).cast("double").alias("f"),
    ).where(F.col("y").isNotNull() & F.col("f").isNotNull())
    binned = base.select(
        "y",
        F.least(
            F.greatest(
                F.floor(F.col("f") / F.lit(bw)).cast("long"), F.lit(0)
            ),
            F.lit(int(n_bins) - 1),
        ).alias("bin"),
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("pos_b"),
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        hist.withColumn("nl", F.sum("n_b").over(wcum))
        .withColumn("pl", F.sum("pos_b").over(wcum))
        .withColumn("n", F.sum("n_b").over(wall))
        .withColumn("pos", F.sum("pos_b").over(wall))
    )

    def gini(p, n):
        pr = p / n
        return F.lit(1.0) - pr * pr - (F.lit(1.0) - pr) * (
            F.lit(1.0) - pr
        )

    splits = (
        cum.where((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
        .select(
            "bin", "nl", "pl", "n", "pos",
            (F.col("n") - F.col("nl")).alias("nr"),
            (F.col("pos") - F.col("pl")).alias("pr_cnt"),
        )
        .withColumn(
            "gini_split",
            (F.col("nl") / F.col("n"))
            * gini(F.col("pl"), F.col("nl"))
            + (F.col("nr") / F.col("n"))
            * gini(F.col("pr_cnt"), F.col("nr")),
        )
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy("gini_split", "bin")),
        )
        .where(F.col("rk") == 1)
    )
    return splits.select(
        F.col("bin").cast("long").alias("best_bin"),
        _r6((F.col("bin") + 1) * F.lit(bw)).alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.col("pl").alias("pos_left"),
        F.col("pr_cnt").alias("pos_right"),
        _r6(gini(F.col("pos"), F.col("n"))).alias("gini_root"),
        _r6(F.col("gini_split")).alias("gini_split"),
        _r6(
            gini(F.col("pos"), F.col("n")) - F.col("gini_split")
        ).alias("gain"),
    )


def logistic_newton_step(
    df: DataFrame,
    *,
    label_col: str,
    f1_col: str,
    f2_col: str,
) -> DataFrame:
    """The first Newton–Raphson step of logistic regression
    ``P(y=1) = sigmoid(w0 + w1 x1 + w2 x2)`` from ``w = 0``, in
    closed form: at the origin the gradient is ``X'(y - 1/2)`` and
    the Hessian is ``X'X / 4``, so

        ``w_1 = 4 (X'X)^{-1} X'(y - 1/2)``

    — one decimal-exact aggregation pass for the 9 sufficient
    statistics, then the 3×3 system solved by the adjugate/Cramer
    expansion in pinned-order double algebra (no iteration, no
    driver loop; further steps re-call with reweighted labels).
    This is the scalable "one Newton step per job" unit that a
    distributed IRLS would chain.

    Cross-engine note: feed INTEGER-quantized features (LightGBM-bin
    them first) when bit parity matters — integer features keep every
    sufficient statistic an exact integer/half-integer, so the
    decimal→double handoff is exact and the cubic determinant cannot
    amplify a conversion ulp (observed with raw 7-dp features: DuckDB
    and the JVM disagree by 1 ulp converting 15-digit decimal sums).

    Output: ONE row ``(n, det, w0, w1, w2)`` at 6 dp; NULL weights
    when the design matrix is singular (|det| = 0).
    """
    base = df.select(
        F.col(label_col).cast("double").alias("y"),
        F.col(f1_col).cast("double").alias("x1"),
        F.col(f2_col).cast("double").alias("x2"),
    ).where(
        F.col("y").isNotNull()
        & F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
    )
    r = F.col("y") - F.lit(0.5)
    agg = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _dec(F.col("x1")).alias("s1"),
        _dec(F.col("x2")).alias("s2"),
        _dec(F.col("x1") * F.col("x1")).alias("s11"),
        _dec(F.col("x2") * F.col("x2")).alias("s22"),
        _dec(F.col("x1") * F.col("x2")).alias("s12"),
        _dec(r).alias("g0"),
        _dec(F.col("x1") * r).alias("g1"),
        _dec(F.col("x2") * r).alias("g2"),
    )

    def det3(a, b, c, d, e, f_, g_, h, i):
        # pinned expansion order: a(ei-fh) - b(di-fg) + c(dh-eg)
        return (
            a * (e * i - f_ * h) - b * (d * i - f_ * g_)
            + c * (d * h - e * g_)
        )

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    g0, g1, g2 = F.col("g0"), F.col("g1"), F.col("g2")
    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    d0 = det3(g0, s1, s2, g1, s11, s12, g2, s12, s22)
    d1 = det3(n, g0, s2, s1, g1, s12, s2, g2, s22)
    d2 = det3(n, s1, g0, s1, s11, g1, s2, s12, g2)
    ok = F.abs(det) > 0
    return agg.select(
        F.col("n").cast("long").alias("n"),
        _r6(det).alias("det"),
        _r6(F.when(ok, F.lit(4.0) * d0 / det)).alias("w0"),
        _r6(F.when(ok, F.lit(4.0) * d1 / det)).alias("w1"),
        _r6(F.when(ok, F.lit(4.0) * d2 / det)).alias("w2"),
    )


def shapley_r2_3(
    df: DataFrame,
    *,
    f1_col: str,
    f2_col: str,
    f3_col: str,
    y_col: str,
) -> DataFrame:
    """Exact Shapley decomposition of R² across three features (the
    LMG / dominance-analysis estimator, Lindeman–Merenda–Gold 1980):
    fit OLS on every subset of {x1, x2, x3} in closed form from ONE
    sufficient-statistic pass, then average each feature's marginal
    R² contribution over all orderings with the exact 3-player
    Shapley weights (1/3, 1/6, 1/6, 1/3).  The three shares sum to
    the full-model R² by construction (asserted in tests) — the
    answer to "which feature drives the fit" that raw per-feature
    R²s double-count under correlation.

    All seven subset R²s come from centered moments via 1×1 / 2×2 /
    Cramer-3×3 solves in pinned-order double algebra; singular
    subsets NULL their value and propagate (the x351 safe-denominator
    discipline).  Feed INTEGER-quantized features and outcome for
    bit parity (the x344 lesson — quantization is the caller's
    binning choice, the estimator is exact for whatever it is fed).

    Output: ONE row ``(n, r2_full, shap1, shap2, shap3)`` at 6 dp.
    """
    base = df.select(
        F.col(f1_col).cast("double").alias("x1"),
        F.col(f2_col).cast("double").alias("x2"),
        F.col(f3_col).cast("double").alias("x3"),
        F.col(y_col).cast("double").alias("y"),
    ).where(
        F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
        & F.col("x3").isNotNull()
        & F.col("y").isNotNull()
    )
    names = ["x1", "x2", "x3", "y"]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i, a in enumerate(names):
        aggs.append(_dec(F.col(a)).alias(f"s_{a}"))
        for b in names[i:]:
            aggs.append(_dec(F.col(a) * F.col(b)).alias(f"s_{a}{b}"))
    agg = base.agg(*aggs)
    n = F.col("n")

    def c(a, b):
        key = f"s_{a}{b}" if f"s_{a}{b}" in agg.columns else f"s_{b}{a}"
        return F.col(key) - F.col(f"s_{a}") * F.col(f"s_{b}") / n

    cyy = c("y", "y")
    cyy_safe = F.when(cyy > 0, cyy)

    def v1(i):
        cii = c(i, i)
        ciy = c(i, "y")
        return (ciy * ciy / F.when(cii > 0, cii)) / cyy_safe

    def v2(i, j):
        cii, cjj, cij = c(i, i), c(j, j), c(i, j)
        ciy, cjy = c(i, "y"), c(j, "y")
        det2 = cii * cjj - cij * cij
        det2_safe = F.when(F.abs(det2) > 0, det2)
        expl = (
            ciy * (cjj * ciy - cij * cjy)
            + cjy * (cii * cjy - cij * ciy)
        ) / det2_safe
        return expl / cyy_safe

    def v3():
        c11, c22, c33 = c("x1", "x1"), c("x2", "x2"), c("x3", "x3")
        c12, c13, c23 = c("x1", "x2"), c("x1", "x3"), c("x2", "x3")
        g1, g2, g3 = c("x1", "y"), c("x2", "y"), c("x3", "y")

        def det3(a, b, cc, d, e, f_, g_, h, i):
            return (
                a * (e * i - f_ * h) - b * (d * i - f_ * g_)
                + cc * (d * h - e * g_)
            )

        detC = det3(c11, c12, c13, c12, c22, c23, c13, c23, c33)
        detC_safe = F.when(F.abs(detC) > 0, detC)
        b1 = det3(g1, c12, c13, g2, c22, c23, g3, c23, c33) / detC_safe
        b2 = det3(c11, g1, c13, c12, g2, c23, c13, g3, c33) / detC_safe
        b3 = det3(c11, c12, g1, c12, c22, g2, c13, c23, g3) / detC_safe
        return (g1 * b1 + g2 * b2 + g3 * b3) / cyy_safe

    va, vb, vc_ = v1("x1"), v1("x2"), v1("x3")
    vab, vac, vbc = v2("x1", "x2"), v2("x1", "x3"), v2("x2", "x3")
    vabc = v3()
    third, sixth = F.lit(1.0 / 3.0), F.lit(1.0 / 6.0)
    shap1 = (
        third * va
        + sixth * ((vab - vb) + (vac - vc_))
        + third * (vabc - vbc)
    )
    shap2 = (
        third * vb
        + sixth * ((vab - va) + (vbc - vc_))
        + third * (vabc - vac)
    )
    shap3 = (
        third * vc_
        + sixth * ((vac - va) + (vbc - vb))
        + third * (vabc - vab)
    )
    return agg.select(
        n.cast("long").alias("n"),
        _r6(vabc).alias("r2_full"),
        _r6(shap1).alias("shap1"),
        _r6(shap2).alias("shap2"),
        _r6(shap3).alias("shap3"),
    )


def pav_fit(
    df: DataFrame,
    *,
    entity_col: str,
    t_col: str,
    value_col: str,
    max_len: int = 4096,
) -> DataFrame:
    """EXACT isotonic (non-decreasing) least-squares fit per entity
    via pool-adjacent-violators (Barlow et al. 1972) at full point
    resolution — the stack-cascade complement to ``quality.
    isotonic_fit`` (x318), which solves the BINNED problem through
    the minimax identity over <= 16 aggregate cells: blocks of consecutive points merge while a
    block mean drops below its predecessor's, and every point's fit
    is its final block's mean.

    Execution: the hp_filter/kalman shape — ONE entity-keyed groupBy
    into bounded sorted arrays, the sequential PAV stack inside
    Arrow-batched ``mapInPandas``, loud-fail past *max_len*.  At
    100 TB the unit of parallelism is the entity (one calibration
    curve per segment/model/cohort), each an O(n) stack pass.

    Cross-engine exactness: violation tests compare block means as
    cross-products (``s_top·w_prev < s_prev·w_top``) — with 6-dp
    inputs and n ≤ max_len these products are integer-exact in
    float64, so the oracle's recursive-CTE state machine (one push OR
    one merge per recursion step) replays the identical branch
    sequence; the final division is the only rounding, identical on
    both sides.

    Output: ``(entity, t, value, fit)`` at 6 dp, ordered by
    (entity, t).
    """
    per_ent = (
        df.select(
            F.col(entity_col).cast("string").alias("e"),
            F.col(t_col).cast("long").alias("o"),
            F.col(value_col).cast("double").alias("v"),
        )
        .where(F.col("o").isNotNull() & F.col("v").isNotNull())
        .groupBy("e")
        .agg(F.sort_array(F.collect_list(F.struct("o", "v"))).alias("ovs"))
    )
    stats = per_ent.agg(
        F.count(F.lit(1)).alias("k"), F.max(F.size("ovs")).alias("ml")
    ).first()
    if stats["k"] == 0:
        raise ValueError("pav_fit: input is empty")
    if stats["ml"] > int(max_len):
        raise ValueError(
            f"pav_fit: longest series ({stats['ml']}) exceeds "
            f"max_len={max_len} — window the series first"
        )

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            out = {"entity": [], "t": [], "value": [], "fit": []}
            for ent, ovs in zip(pdf["e"], pdf["ovs"]):
                ts = [int(s["o"]) for s in ovs]
                ys = [float(s["v"]) for s in ovs]
                ss: list = []  # block sums
                ws: list = []  # block widths
                for y in ys:
                    ss.append(y)
                    ws.append(1.0)
                    # merge while the top block's mean violates
                    while (
                        len(ss) >= 2
                        and ss[-1] * ws[-2] < ss[-2] * ws[-1]
                    ):
                        ss[-2] += ss[-1]
                        ws[-2] += ws[-1]
                        ss.pop()
                        ws.pop()
                fits = []
                for s, w_ in zip(ss, ws):
                    fits.extend([s / w_] * int(w_))
                out["entity"].extend([ent] * len(ts))
                out["t"].extend(ts)
                out["value"].extend(ys)
                out["fit"].extend(fits)
            yield pd.DataFrame(
                {
                    "entity": pd.Series(out["entity"], dtype="object"),
                    "t": pd.Series(out["t"], dtype="int64"),
                    "value": pd.Series(out["value"], dtype="float64"),
                    "fit": pd.Series(out["fit"], dtype="float64"),
                }
            )

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("entity", StringType()),
            StructField("t", LongType()),
            StructField("value", DoubleType()),
            StructField("fit", DoubleType()),
        ]
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return (
        per_ent.mapInPandas(compute, schema=schema)
        .select(
            "entity", "t",
            r6(F.col("value")).alias("value"),
            r6(F.col("fit")).alias("fit"),
        )
        .orderBy("entity", "t")
    )


def split_conformal_interval(
    df: DataFrame,
    *,
    entity_col: str,
    t_col: str,
    value_col: str,
    alpha: float = 0.1,
    train_frac: float = 0.6,
    cal_frac: float = 0.2,
) -> DataFrame:
    """Split conformal prediction audit per entity (Vovk et al. 2005;
    Lei et al. 2018 — the distribution-free interval recipe): fit the
    simplest point model (the train-window mean, decimal-exact) on
    the first *train_frac* of each series, take the
    ``ceil((1−α)(n_cal+1))``-th smallest absolute calibration
    residual as the interval half-width ``qhat`` (the NATIVE rank
    rule — an actual residual, no interpolation, so both engines
    select the identical value), and measure empirical coverage of
    ``mean ± qhat`` on the held-out tail.  The finite-sample theorem
    says coverage ≥ 1−α in expectation under exchangeability — this
    operator MEASURES it per entity instead of assuming it, which is
    the monitoring question ("are my intervals still valid on this
    segment?").

    Fully declarative: entity-keyed row numbers split the series,
    one decimal aggregate per entity fits the model, rank selection
    is one keyed window with a total (residual, t) order, coverage
    one conditional aggregate.  Output per entity: ``n, n_cal,
    n_test, qhat, covered, coverage`` (6 dp).
    """
    a, tf, cf = float(alpha), float(train_frac), float(cal_frac)
    if not 0 < a < 1 or not 0 < tf < 1 or not 0 < cf < 1 or tf + cf >= 1:
        raise ValueError("split_conformal_interval: bad fractions")
    base = df.select(
        F.col(entity_col).cast("string").alias("e"),
        F.col(t_col).cast("long").alias("o"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("o").isNotNull() & F.col("v").isNotNull())
    w_rn = Window.partitionBy("e").orderBy("o")
    w_e = Window.partitionBy("e")
    rn = base.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "n", F.count(F.lit(1)).over(w_e)
    )
    rn = rn.withColumn(
        "n_train", F.floor(F.col("n") * tf).cast("long")
    ).withColumn("n_cal", F.floor(F.col("n") * cf).cast("long"))
    mu = (
        rn.where(F.col("rn") <= F.col("n_train"))
        .groupBy("e")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
    )
    scored = rn.join(F.broadcast(mu), on="e").withColumn(
        "resid", F.abs(F.col("v") - F.col("mu"))
    )
    cal = scored.where(
        (F.col("rn") > F.col("n_train"))
        & (F.col("rn") <= F.col("n_train") + F.col("n_cal"))
    )
    w_rank = Window.partitionBy("e").orderBy(
        F.col("resid").asc(), F.col("o").asc()
    )
    qhat = (
        cal.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "k",
            F.least(
                F.ceil((1.0 - a) * (F.col("n_cal") + 1)).cast("long"),
                F.col("n_cal"),
            ),
        )
        .where(F.col("rk") == F.col("k"))
        .select("e", F.col("resid").alias("qhat"))
    )
    test = scored.where(
        F.col("rn") > F.col("n_train") + F.col("n_cal")
    ).join(F.broadcast(qhat), on="e")
    return (
        test.groupBy("e")
        .agg(
            F.max("n").alias("n"),
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("qhat").alias("__q"),
            F.sum(
                F.when(F.col("resid") <= F.col("qhat"), 1).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
        .select(
            F.col("e").alias("entity"),
            "n",
            "n_cal",
            "n_test",
            (F.round(F.col("__q") * F.lit(1e6)) / F.lit(1e6)).alias(
                "qhat"
            ),
            "covered",
            (
                F.round(
                    F.col("covered").cast("double")
                    / F.col("n_test")
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("coverage"),
        )
        .orderBy("entity")
    )


def james_stein_shrinkage(
    df: DataFrame,
    *,
    entity_col: str,
    value_col: str,
    value_decimals: int = 2,
) -> DataFrame:
    """Positive-part James-Stein shrinkage of per-entity means toward
    the grand mean (James & Stein 1961; Efron & Morris 1975 — the
    small-area / empirical-Bayes estimator that dominates the raw
    per-entity means whenever there are ≥ 4 entities): with k entity
    means, pooled within-entity variance σ̂² and between-entity sum of
    squares SSB,

        w = max(0, 1 − (k−3)·(σ̂²/n̄) / SSB),
        shrunk_i = grand + w·(m_i − grand)

    — noisy segment estimates borrow strength from the ensemble, the
    everyday fix for per-segment metrics with wildly different
    support.

    Determinism discipline: per-entity means come from decimal-exact
    sums; the CROSS-ENTITY folds (grand mean, SSB) re-enter
    DECIMAL(38,12) after rounding each term to 6 dp, so accumulation
    order cannot move them; every remaining float op is one shared
    expression with the oracle.

    ``value_decimals`` stages the squared sums (the matrix-profile
    int64-product constraint: |v|·10^s must stay < ~3e9 for the
    oracle's DECIMAL(18) multiply).

    Output per entity: ``entity, n_i, mean, shrunk, w`` (6 dp), plus
    one ``__grand__`` row carrying (N, grand, w).
    """
    base = df.select(
        F.col(entity_col).cast("string").alias("e"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    per = base.groupBy("e").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        (
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m_raw"),
        F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("sy"),
        F.sum(
            (
                F.col("v").cast(f"decimal(18,{int(value_decimals)})")
                * F.col("v").cast(f"decimal(18,{int(value_decimals)})")
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("syy"),
    ).withColumn("m6", r6(F.col("m_raw")))
    stats = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("n_total"),
        (
            F.sum(F.col("m6").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("grand"),
        F.sum(
            (
                F.col("syy")
                - F.col("sy") * F.col("sy") / F.col("n_i")
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("within_ss"),
    )
    joined = per.crossJoin(F.broadcast(stats)).withColumn(
        "dev2",
        (
            (F.col("m6") - F.col("grand"))
            * (F.col("m6") - F.col("grand"))
        ).cast("decimal(38,12)"),
    )
    ssb = joined.agg(
        F.sum("dev2").cast("double").alias("ssb")
    )
    full = joined.crossJoin(F.broadcast(ssb))
    sigma2 = F.col("within_ss") / (F.col("n_total") - F.col("k"))
    nbar = F.col("n_total") / F.col("k")
    w = F.greatest(
        F.lit(0.0),
        1.0
        - F.try_divide(
            (F.col("k") - 3) * (sigma2 / nbar), F.col("ssb")
        ),
    )
    ent = full.select(
        F.col("e").alias("entity"),
        "n_i",
        F.col("m6").alias("mean"),
        r6(F.col("grand") + w * (F.col("m6") - F.col("grand"))).alias(
            "shrunk"
        ),
        r6(w).alias("w"),
    )
    grand_row = (
        stats.crossJoin(F.broadcast(ssb))
        .select(
            F.lit("__grand__").alias("entity"),
            F.col("n_total").alias("n_i"),
            r6(F.col("grand")).alias("mean"),
            r6(F.col("grand")).alias("shrunk"),
            r6(
                F.greatest(
                    F.lit(0.0),
                    1.0
                    - F.try_divide(
                        (F.col("k") - 3)
                        * (
                            F.col("within_ss")
                            / (F.col("n_total") - F.col("k"))
                            / (F.col("n_total") / F.col("k"))
                        ),
                        F.col("ssb"),
                    ),
                )
            ).alias("w"),
        )
    )
    return ent.unionByName(grand_row).orderBy("entity")
