"""Time-series triage the way a metrics platform gates a fleet of
series before modeling any of them — the round-6 diagnostics chained
in decision order:

1. MASE screen (x259) — is the weekly pattern real? (seasonal-naive
   vs naive error; mase < 1 ⇒ model seasonality)
2. Decomposition strength (x275) — how much variance do trend and
   season actually explain?
3. Segmented trend (x268) — did the trend BEND, and when?
4. Cook's distance (x254) — or is the "trend" one influential day?
5. PACF (x266) — where does the memory stop (AR-order license)?

Run standalone: ``python examples/series_triage.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fame2pygen_spark.operators.temporal import (
    cooks_distance,
    decomposition_strength,
    forecast_mase,
    pacf_profile,
    seasonal_decompose,
    segmented_trend,
)


def _series(spark: SparkSession) -> DataFrame:
    season = [6.0, -1.0, -3.0, -2.0, 0.0, 2.0, -2.0]
    rows = []
    for t in range(56):
        noise = ((t * 2654435761) % 89) / 89.0
        # "bend": flat for 4 weeks, then climbing; weekly seasonal
        trend = 0.0 if t < 28 else 1.5 * (t - 28)
        rows.append(("bend", t, 50.0 + trend + season[t % 7] + noise))
        # "spike": flat with one corrupted day
        spike = 40.0 if t == 30 else 0.0
        rows.append(("spike", t, 20.0 + spike + noise))
    return spark.createDataFrame(rows, "g string, t long, y double")


def main(spark: SparkSession) -> DataFrame:
    df = _series(spark)

    mase = {r["g"]: r for r in forecast_mase(
        df, ["g"], "t", "y", season=7
    ).collect()}
    print("1. MASE:", {g: r["mase"] for g, r in mase.items()})

    dec = seasonal_decompose(df, "t", "y", ("g",), period=7)
    strength = {r["g"]: r for r in decomposition_strength(
        dec, ("g",)
    ).collect()}
    print("2. strength:", {
        g: (r["trend_strength"], r["seasonal_strength"])
        for g, r in strength.items()
    })

    seg = {r["g"]: r for r in segmented_trend(
        df, ["g"], "t", "y"
    ).collect()}
    print("3. bend:", {
        g: (r["knot"], r["slope_left"], r["slope_right"], r["improvement"])
        for g, r in seg.items()
    })

    cook = cooks_distance(df, ["g"], "t", "y", top_n=1).collect()
    print("4. influence:", {r["g"]: (r["x"], r["cooks_d"]) for r in cook})

    pacf = {r["g"]: r for r in pacf_profile(df, ["g"], "t", "y").collect()}
    print("5. pacf1:", {g: r["pacf1"] for g, r in pacf.items()})

    verdicts = []
    for g in ("bend", "spike"):
        if seg[g]["improvement"] and seg[g]["improvement"] > 0.5:
            v = f"trend bend at t={seg[g]['knot']}"
        elif any(r["g"] == g and r["cooks_d"] > 1 for r in cook):
            v = "single influential day, not a trend"
        else:
            v = "stable"
        verdicts.append((g, v, float(mase[g]["mase"] or 0.0)))
    return spark.createDataFrame(verdicts, "series string, verdict string, mase double")


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("series_triage")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    main(spark).show(truncate=False)
    spark.stop()
