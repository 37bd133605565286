"""The pre-training data-drift checklist — the round-5 operators
chained the way a data team gates a corpus refresh before spending a
training run on it:

1. RFF kernel-MMD² between yesterday's and today's embedding slices —
   distribution drift in embedding space, no pair stage.
2. Energy distance on a scalar quality metric — "how far apart", where
   a KS test only says "different".
3. HBOS outlier triage — which specific rows sit in thin histogram
   bins across features at once.
4. CV fold audit — unit-hashed folds with leave-one-fold-out means:
   any fold drifting from its complement means a unit-correlated
   batch effect leaked into the split.
5. Qini curve — if a targeting model decides which units receive the
   new data treatment, the incremental impact per budget decile.

Run standalone: ``python examples/drift_and_uplift.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _embeddings(spark: SparkSession, shift: float, tag: int) -> DataFrame:
    rows = [
        (tag * 1000 + i,
         [((i * 7 + j * 3) % 11) / 11.0 + shift for j in range(16)])
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.mixing import cv_fold_stats
    from fame2pygen_spark.operators.quality import hbos_scores
    from fame2pygen_spark.operators.similarity import mmd_rff
    from fame2pygen_spark.operators.sketch import energy_distance
    from fame2pygen_spark.operators.behavior import qini_curve

    yesterday = _embeddings(spark, 0.0, 0)
    today_ok = _embeddings(spark, 0.0, 1)
    today_shifted = _embeddings(spark, 0.4, 2)

    print("MMD² same distribution (expect ~0) vs shifted (expect > 0):")
    mmd_rff(yesterday, today_ok, dim=16, n_features=8).show()
    mmd_rff(yesterday, today_shifted, dim=16, n_features=8).show()

    qual_a = spark.range(400).select(
        (F.col("id") % 13).cast("double").alias("q")
    )
    qual_b = spark.range(400).select(
        ((F.col("id") % 13) + 2.5).cast("double").alias("q")
    )
    print("Energy distance of the quality metric (location shift 2.5):")
    energy_distance(qual_a, qual_b, "q").show()

    metrics = spark.range(500).select(
        F.col("id"),
        (10 + (F.col("id") % 5)).cast("double").alias("len_chars"),
        (100 + (F.col("id") % 7)).cast("double").alias("tokens"),
    ).union(
        spark.createDataFrame([(9999, 500.0, 9000.0)],
                              "id long, len_chars double, tokens double")
    )
    print("HBOS: the planted outlier leads the triage list:")
    hbos_scores(metrics, "id", ["len_chars", "tokens"], top_n=5).show()

    events = spark.createDataFrame(
        [(u, float(u % 7)) for u in range(300) for _ in range(3)],
        "user long, metric double",
    )
    print("CV fold audit (fold_mean vs loo_mean — no batch effect):")
    cv_fold_stats(events, "user", "metric", k=5).show()

    units = spark.createDataFrame(
        [
            (i % 2,
             1.0 if (i % 2 == 1 and i < 100) else 0.0,
             1.0 - i / 400.0)
            for i in range(400)
        ],
        "t int, y double, score double",
    )
    qini = qini_curve(units, "t", "y", "score", n_bins=10)
    print("Qini deciles (uplift front-loaded in the top bins):")
    qini.show()
    return qini


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from _data import demo_spark

    main(demo_spark())
