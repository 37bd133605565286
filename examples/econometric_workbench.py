"""The official-statistics workbench a national-accounts or
macro-metrics team runs over a fleet of indicator series — the
round-7 econometric operators chained in production order:

1. Exact HP filter (x336) — split each series into trend and cycle
   with the pentadiagonal LDL' solve (no fixed kernel, no iteration
   residue).
2. Baxter–King band-pass (x335) — cross-check the HP cycle against
   the 6–32-period band-pass extraction; agreement = the cycle is
   real, disagreement = revisit λ.
3. Chow break test (x337) — did the trend regime change at the
   midpoint?  (Feeds revision policy.)
4. Granger causality (x351) — does the leading indicator actually
   lead?
5. Kalman local-level (x355) — the publication-ready smoothed level
   with adaptive gain for the latest, most uncertain observations.
6. Smooth disaggregation (x356) — publish the annual aggregate as
   minimal-curvature quarters that re-sum exactly.

Run standalone: ``python examples/econometric_workbench.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fame2pygen_spark.operators.temporal import (
    bandpass_filter,
    chow_break_test,
    granger_1lag,
    hp_filter,
    kalman_level,
    smooth_disagg,
)


def _series(spark: SparkSession) -> DataFrame:
    import math

    rows = []
    for t in range(96):
        noise = ((t * 2654435761) % 97) / 97.0
        cycle = 6.0 * math.sin(2 * math.pi * t / 12)
        # "lead" turns two periods before "lag" follows it
        lead = 100.0 + 0.8 * t + cycle + noise
        lag_driver = 100.0 + 0.8 * max(t - 2, 0) + 0.9 * (
            6.0 * math.sin(2 * math.pi * max(t - 2, 0) / 12)
        )
        lag = lag_driver + noise / 2.0
        # "broken" changes slope at the midpoint
        broken = 50.0 + (0.2 * t if t < 48 else 0.2 * 48 + 2.0 * (t - 48))
        rows.append(("lead", t, round(lead, 2)))
        rows.append(("lag", t, round(lag, 2)))
        rows.append(("broken", t, round(broken, 2)))
    return spark.createDataFrame(rows, "g string, t long, y double")


def main(spark: SparkSession) -> DataFrame:
    df = _series(spark)

    hp = hp_filter(
        df, entity_col="g", t_col="t", value_col="y", lam=1600.0
    )
    cyc_sd = {
        r["entity"]: r["sd"]
        for r in hp.groupBy("entity")
        .agg(F.round(F.stddev("cycle"), 3).alias("sd"))
        .collect()
    }
    print("1. HP cycle stddev:", cyc_sd)

    bk = bandpass_filter(
        df, entity_col="g", t_col="t", value_col="y",
        low=6, high=32, k=12,
    )
    bk_sd = {
        r["g"]: r["sd"]
        for r in bk.groupBy(F.col("g"))
        .agg(F.round(F.stddev("cycle"), 3).alias("sd"))
        .collect()
    }
    print("2. BK cycle stddev:", bk_sd)

    chow = {
        r["entity"]: r
        for r in chow_break_test(
            df, entity_col="g", t_col="t", value_col="y"
        ).collect()
    }
    print("3. Chow:", {
        g: (r["f_stat"], r["break_flag"]) for g, r in chow.items()
    })

    granger = {
        (r["entity_y"], r["entity_x"]): r["causes"]
        for r in granger_1lag(
            df.where(F.col("g").isin("lead", "lag")),
            entity_col="g", t_col="t", value_col="y",
        ).collect()
    }
    print("4. Granger causes:", granger)

    kal = kalman_level(
        df, entity_col="g", t_col="t", value_col="y",
        q=4.0, r=16.0, p0=100.0,
    )
    last = kal.where(F.col("t") == 95).select(
        "entity", "level", "gain"
    ).collect()
    print("5. Kalman latest:", {
        r["entity"]: (r["level"], r["gain"]) for r in last
    })

    annual = df.groupBy(
        "g", F.floor(F.col("t") / 12).alias("yr")
    ).agg(
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("a")
    )
    q = smooth_disagg(
        annual, entity_col="g", year_col="yr", value_col="a"
    )
    n_q = q.count()
    print("6. disaggregated quarter rows:", n_q)

    verdicts = []
    for g in ("lead", "lag", "broken"):
        broke = chow[g]["break_flag"] == 1
        verdicts.append(
            (
                g,
                "regime break" if broke else "stable trend",
                float(cyc_sd.get(g, 0.0) or 0.0),
            )
        )
    return spark.createDataFrame(
        verdicts, "series string, verdict string, hp_cycle_sd double"
    )


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    main(spark).show(truncate=False)
