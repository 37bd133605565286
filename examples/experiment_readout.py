"""Experiment readout the way an analysis platform gates it — the
round-4 statistics operators chained in decision order:

1. SMD covariate balance — is the randomization sound, or does a
   covariate (|SMD| > 0.1) explain the difference before any
   treatment effect is read?
2. Mann-Whitney U per stratum — robust nonparametric effect tests.
3. Portable normal p-values (Abramowitz–Stegun erf) +
   Benjamini–Hochberg FDR — the multiple-testing guard across the
   stratum family.
4. Wald SPRT — the sequential monitor that would have stopped the
   clearly-shifted stratum early, with controlled error.

Run standalone: ``python examples/experiment_readout.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _events(spark: SparkSession) -> DataFrame:
    # 4 strata × 2 arms; stratum s3 carries a real +8 shift, the rest
    # are null effects; values are deterministic pseudo-noise
    rows = []
    for s in range(4):
        for i in range(300):
            noise = (i * 37 + s * 11) % 20
            base = 50.0 + noise
            rows.append((f"s{s}", "a", i, float(base)))
            lift = 8.0 if s == 3 else 0.0
            rows.append(
                (f"s{s}", "b", 1000 + i, float(base + lift + (i * 13) % 3))
            )
    return spark.createDataFrame(
        rows, "stratum string, arm string, unit long, value double"
    )


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.behavior import sprt_decision
    from fame2pygen_spark.operators.quality import (
        bh_fdr, normal_p_two_sided, smd_balance,
    )
    from fame2pygen_spark.operators.sketch import mann_whitney_u

    ev = _events(spark)

    balance = smd_balance(ev, "arm", "a", "b", ("unit",))
    print("covariate balance (unit id — should be imbalanced-by-design):")
    balance.show(truncate=False)

    mw = mann_whitney_u(
        ev, "value", "arm", "a", "b", partition_cols=("stratum",)
    )
    tests = mw.select(
        "stratum", normal_p_two_sided(F.col("z")).alias("p")
    ).where(F.col("p").isNotNull())
    fdr = bh_fdr(tests, "p", ("stratum",), q=0.05)
    print("BH-FDR readout (only the planted s3 shift should survive):")
    fdr.show(truncate=False)

    sprt = sprt_decision(
        ev.where(F.col("arm") == "b"),
        F.col("value") > 62.0,
        ("stratum",),
        ("unit",),
        p0=0.45,
        p1=0.55,
    )
    print("SPRT sequential monitor:")
    sprt.orderBy("stratum").show(truncate=False)

    return fdr


if __name__ == "__main__":
    from _data import demo_spark

    main(demo_spark())
