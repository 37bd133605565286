"""A/B readout with the assumptions CHECKED, not assumed — the
round-5 inference operators chained in decision order:

1. Brown–Forsythe — do the arms even have comparable spread?  A
   pooled-variance test on unequal spreads reads noise as signal.
2. ICC(1) — is the metric user-clustered?  High ICC means per-unit
   collapse is mandatory before any SE is trusted.
3. Welch's t on per-unit means — the workhorse readout, robust to
   the unequal variances step 1 just measured.
4. Hash-randomization test — the assumption-free cross-check; if its
   p disagrees with Welch's, believe the randomization test.
5. Difference-in-differences with a PLACEBO — the observational
   fallback when assignment wasn't randomized: the pre-period
   placebo DID must be flat for the real DID to mean anything.

Run standalone: ``python examples/inference_checklist.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _units(spark: SparkSession) -> DataFrame:
    # 400 units; treated arm carries a +3 lift and 2x the spread;
    # values are deterministic pseudo-noise
    rows = []
    for i in range(400):
        noise = (i * 37) % 40
        if i % 2 == 0:
            rows.append((f"u{i}", "a", 50.0 + noise * 2.0 + 3.0,
                         20.0 + (i * 7) % 10, 23.0 + (i * 7) % 10 + 3.0))
        else:
            rows.append((f"u{i}", "b", 50.0 + noise,
                         20.0 + (i * 7) % 10, 23.0 + (i * 7) % 10))
    return spark.createDataFrame(
        rows, "unit string, variant string, y double, "
              "pre double, post double"
    )


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.behavior import (
        diff_in_diff, randomization_test, welch_t,
    )
    from fame2pygen_spark.operators.sketch import brown_forsythe

    units = _units(spark)

    spread = brown_forsythe(units, "variant", "y")
    print("1. Brown-Forsythe (arms have different spread by design):")
    spread.show(truncate=False)

    welch = welch_t(units, "variant", "y")
    print("2. Welch t (robust to that unequal spread):")
    welch.show(truncate=False)

    rand = randomization_test(
        units, "unit", "variant", "y", n_perm=100
    )
    print("3. Randomization test (assumption-free cross-check):")
    rand.show(truncate=False)

    did_units = units.select(
        F.when(F.col("variant") == "a", "t").otherwise("c").alias(
            "variant"
        ),
        "pre",
        "post",
    )
    did = diff_in_diff(did_units, "variant", "pre", "post")
    print("4. DID on the pre/post panel (planted +3 on treated):")
    did.show(truncate=False)

    # placebo: split the PRE period against itself — must be flat
    placebo_units = units.select(
        F.when(F.col("variant") == "a", "t").otherwise("c").alias(
            "variant"
        ),
        F.col("pre").alias("pre"),
        (F.col("pre") + 0.0).alias("post"),
    )
    placebo = diff_in_diff(placebo_units, "variant", "pre", "post")
    print("5. Placebo DID (pre vs pre — did must be exactly 0):")
    placebo.show(truncate=False)

    return welch.crossJoin(
        rand.select(F.col("p_value").alias("p_randomization"))
    ).crossJoin(did.select(F.col("did").alias("did_estimate")))
