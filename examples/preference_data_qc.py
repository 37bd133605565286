"""Preference-data QC for reward-model training — the round-4
operators chained the way a labeling-pipeline gate would run them:

1. Cohen's kappa over doubly-annotated items — is inter-rater
   agreement above the chance floor before anyone trusts the labels?
2. Bradley–Terry strengths over the aggregated win matrix — do the
   pairwise comparisons admit a consistent strength scale, and which
   responses actually win?
3. DSIR log-importance weights — which raw candidate prompts look
   like the curated target domain, for importance resampling the next
   labeling batch.

Run standalone: ``python examples/preference_data_qc.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _annotations(spark: SparkSession) -> DataFrame:
    # 300 doubly-labeled items over 3 classes, ~80% agreement
    rows = [
        (i, ["good", "bad", "unsure"][i % 3],
         ["good", "bad", "unsure"][(i % 3) if i % 5 else (i + 1) % 3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "item long, rater_a string, rater_b string")


def _comparisons(spark: SparkSession) -> DataFrame:
    # aggregated pairwise wins between 4 candidate responses
    rows = [
        ("resp_a", "resp_b", 61, 39),
        ("resp_a", "resp_c", 70, 30),
        ("resp_a", "resp_d", 80, 20),
        ("resp_b", "resp_c", 55, 45),
        ("resp_b", "resp_d", 66, 34),
        ("resp_c", "resp_d", 58, 42),
    ]
    return spark.createDataFrame(
        rows, "item_a string, item_b string, wins_a int, wins_b int"
    )


def _prompts(spark: SparkSession) -> DataFrame:
    target = "explain the tradeoffs of this design and justify the choice"
    offdom = "click here to win a free prize now limited offer act fast"
    # the curated subset is (almost) all on-domain — that contrast vs
    # the 1/3-spam raw pool is what DSIR turns into importance weights
    rows = [(i, target if i % 3 else offdom,
             1 if (i % 4 == 0 and i % 3 != 0) else 0)
            for i in range(200)]
    return spark.createDataFrame(rows, "prompt_id long, text string, curated int")


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.behavior import bradley_terry
    from fame2pygen_spark.operators.mixing import dsir_logweights
    from fame2pygen_spark.operators.quality import cohens_kappa

    kappa = cohens_kappa(_annotations(spark), "rater_a", "rater_b").collect()[0]
    print(f"label agreement: po={kappa['po']} pe={kappa['pe']} "
          f"kappa={kappa['kappa']} over {kappa['n_items']} items")
    if kappa["kappa"] is not None and kappa["kappa"] < 0.2:
        print("WARNING: agreement barely above chance - relabel before training")

    weights = dsir_logweights(
        _prompts(spark), "text", "prompt_id",
        F.col("curated") == 1, n_buckets=128, alpha=0.1,
    )
    n_target_like = weights.where(F.col("logw") > 0).count()
    print(f"DSIR: {n_target_like} of {weights.count()} raw prompts score target-like")

    strengths = bradley_terry(
        _comparisons(spark), "item_a", "item_b", "wins_a", "wins_b"
    ).orderBy(F.desc("s2"))
    strengths.show()
    return strengths


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    main(spark)
