"""Pre-flight planning for a big keyed join — the measurements you
run BEFORE keying a 100 TB shuffle, chained in decision order:

1. AMS join-size gauge (x248) — will ``A ⋈ B`` on this key produce
   10⁶ or 10¹² rows?  Two single-pass ±1 counter sketches answer
   without running the join.
2. Skew profile (x55) — is the key hot-headed?  A top key holding 5%
   of rows single-partitions the shuffle; salting (x86) is the cure.
3. Hash-width audit (x242) — can the shuffle key be truncated to 8
   bytes without colliding distinct keys?
4. The decision: broadcast (small side), salted repartition (skewed),
   or plain shuffle join — printed as a one-row verdict.

Run standalone: ``python examples/join_planning.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fame2pygen_spark.operators.quality import hash_width_audit
from fame2pygen_spark.operators.sketch import ams_join_size, skew_profile


def _tables(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    # fact side: zipf-ish key distribution with one hot key
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(7))  # ~30% on key 7
        .otherwise((F.col("id") % 997).cast("long"))
        .alias("k"),
        (F.col("id") * 17 % 1000).alias("payload"),
    )
    dim = spark.range(0, 997).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("grp")
    )
    return fact, dim


def main(spark: SparkSession) -> DataFrame:
    fact, dim = _tables(spark)

    est = ams_join_size(fact, "k", dim, "k", rows=9).collect()[0]
    print(
        f"1. AMS gauge: est |fact ⋈ dim| = {est['est_join_size']:.0f} "
        f"(exact {est['exact_join_size']}, rel_err {est['rel_err']})"
    )

    top = skew_profile(fact, ["k"], top_k=3).orderBy("rank").collect()
    print("2. skew: top keys", [(r["key"], r["n"]) for r in top])

    widths = hash_width_audit(fact, "k", bit_widths=(16, 32)).collect()
    print(
        "3. hash widths:",
        [(r["bits"], r["n_colliding"]) for r in widths],
    )

    hot_share = top[0]["n"] / fact.count()
    dim_rows = dim.count()
    verdict = (
        "broadcast dim"
        if dim_rows < 100_000
        else ("salt fact key" if hot_share > 0.05 else "plain shuffle join")
    )
    print(f"4. verdict: {verdict} (hot-key share {hot_share:.2f})")
    return spark.createDataFrame(
        [(float(est["est_join_size"]), int(est["exact_join_size"]), verdict)],
        "est double, exact long, verdict string",
    )


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("join_planning")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    main(spark).show(truncate=False)
    spark.stop()
