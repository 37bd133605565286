"""Temporal join operators (operators/temporal.py): as-of join and
bucketed range join — semantics on hand cases, determinism, and the
scale invariants (no cross product, exact bucket boundaries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fame2pygen_spark.operators.temporal import asof_join, range_join_points


def _left(spark):
    return spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "a", 300), (4, "b", 150),
         (5, "c", 50)],
        "lid long, k string, t long",
    )


def _right(spark):
    return spark.createDataFrame(
        [(10, "a", 100, 1.0), (11, "a", 200, 2.0), (12, "a", 205, 3.0),
         (13, "a", 400, 4.0), (14, "b", 150, 5.0), (15, "b", 150, 6.0)],
        "rid long, k string, rt long, v double",
    )


def test_asof_backward_inclusive_and_nulls(spark):
    out = asof_join(
        _left(spark), _right(spark),
        on=["k"], left_time="t", right_time="rt",
        value_cols=["v"], right_order="rid",
    ).orderBy("lid")
    rows = {r["lid"]: (r["rt_asof"], r["v_asof"]) for r in out.collect()}
    assert rows[1] == (100, 1.0)      # tie at t=100 is inclusive
    assert rows[2] == (205, 3.0)      # equal-ts right beats earlier one
    assert rows[3] == (205, 3.0)      # rt=400 is in the future, skipped
    assert rows[4] == (150, 6.0)      # tied rights: greatest rid wins
    assert rows[5] == (None, None)    # no prior right for key c
    assert out.count() == 5           # left rows preserved exactly


def test_asof_carries_multiple_value_cols(spark):
    right = _right(spark).withColumn("w", F.col("v") * 10)
    out = asof_join(
        _left(spark), right,
        on=["k"], left_time="t", right_time="rt",
        value_cols=["v", "w"], right_order="rid",
    )
    r = {x["lid"]: (x["v_asof"], x["w_asof"]) for x in out.collect()}
    # both carried columns come from the same winning right row
    assert r[4] == (6.0, 60.0)


def test_asof_plan_has_no_join(spark):
    """The union+window formulation must not plan any join operator —
    that absence IS the scale guarantee (no candidate pairs)."""
    out = asof_join(
        _left(spark), _right(spark),
        on=["k"], left_time="t", right_time="rt",
        value_cols=["v"], right_order="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def _naive_pairs(points, intervals, pc, sc, ec):
    return (
        intervals.crossJoin(points)
        .where((F.col(pc) >= F.col(sc)) & (F.col(pc) < F.col(ec)))
    )


def test_range_join_matches_naive(spark):
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 7, 21), (4, 30, 30), (5, 8, 3)],
        "ivid long, s long, e long",
    )
    pts = spark.createDataFrame(
        [(i, p) for i, p in enumerate([0, 3, 5, 6, 7, 9, 10, 13, 20, 21, 29, 30])],
        "pid long, p long",
    )
    for width in (1, 3, 7, 100):
        got = sorted(
            (r["ivid"], r["pid"])
            for r in range_join_points(
                pts, iv, point_col="p", start_col="s", end_col="e",
                bucket_width=width,
            ).collect()
        )
        want = sorted(
            (r["ivid"], r["pid"])
            for r in _naive_pairs(pts, iv, "p", "s", "e").collect()
        )
        assert got == want, f"width={width}"
    # empty (4) and inverted (5) intervals match nothing
    assert all(ivid not in (4, 5) for ivid, _ in got)


def test_range_join_exact_epoch_boundaries(spark):
    """µs-scale epochs at exact bucket multiples — the case float
    division misrounds; the operator must use integer div."""
    day_us = 86_400_000_000
    base = 1_700_000_000_000_000
    iv = spark.createDataFrame(
        [(1, base, base + 7 * day_us)], "ivid long, s long, e long"
    )
    pts = spark.createDataFrame(
        [(1, base), (2, base + 7 * day_us - 1), (3, base + 7 * day_us)],
        "pid long, p long",
    )
    got = sorted(
        r["pid"]
        for r in range_join_points(
            pts, iv, point_col="p", start_col="s", end_col="e",
            bucket_width=day_us,
        ).collect()
    )
    assert got == [1, 2]  # end-exclusive


def test_range_join_replication_is_bounded(spark):
    """Interval copies = ceil(span/width)+1 at most — the shuffle-size
    contract; no point duplication ever."""
    iv = spark.createDataFrame([(1, 0, 70)], "ivid long, s long, e long")
    pts = spark.createDataFrame([(1, 35)], "pid long, p long")
    out = range_join_points(
        pts, iv, point_col="p", start_col="s", end_col="e", bucket_width=7
    )
    assert out.count() == 1  # matched once despite 10 interval copies


def test_fill_gaps_daily_scaffold_and_ffill(spark):
    from fame2pygen_spark.operators.temporal import fill_gaps_daily

    D = 86_400_000_000
    rows = [
        # u1: day 0 (two events, later one closes at 9.0), gap, day 3
        (1, 1, 0 * D + 100, 5.0), (2, 1, 0 * D + 200, 9.0),
        (3, 1, 3 * D, 7.0),
        # u2: single day
        (4, 2, 10 * D, 1.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {(r["entity"], r["day"]): r for r in fill_gaps_daily(ev).collect()}
    assert len(out) == 5  # u1 days 0..3, u2 day 10
    assert out[(1, 0)]["value_filled"] == 9.0   # day close, not first event
    assert out[(1, 0)]["is_observed"] is True
    assert out[(1, 1)]["value_filled"] == 9.0   # forward-filled
    assert out[(1, 1)]["is_observed"] is False
    assert out[(1, 2)]["value_filled"] == 9.0
    assert out[(1, 3)]["value_filled"] == 7.0
    assert out[(2, 10)]["value_filled"] == 1.5


def test_cusum_scan_finds_level_shift(spark):
    from fame2pygen_spark.operators.temporal import cusum_scan

    # u1: 10 values at 0, then 10 at 10 -> cusum peaks exactly at the
    # shift (idx 10): sum of (0 - 5) over first 10 = -50
    rows = [(i, 1, i * 100, 0.0) for i in range(10)]
    rows += [(i + 10, 1, (i + 10) * 100, 10.0) for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    r = cusum_scan(ev).collect()[0]
    assert r["n"] == 20
    assert r["change_idx"] == 10 and r["max_abs_cusum"] == 50.0
    assert r["change_ts"] == 900


def test_autocorrelation_alternating_and_constant(spark):
    from fame2pygen_spark.operators.temporal import autocorrelation

    # u1 alternates +1/-1 -> lag-1 acf = -1
    rows = [(i, 1, i * 10, 1.0 if i % 2 == 0 else -1.0) for i in range(20)]
    # u2 constant -> null acf
    rows += [(100 + i, 2, i * 10, 7.0) for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {r["entity"]: r for r in autocorrelation(ev, lag=1).collect()}
    assert out[1]["acf"] == -1.0 and out[1]["n_pairs"] == 19
    assert out[2]["acf"] is None
    # lag-2 on the alternating series: perfectly positive
    out2 = {r["entity"]: r for r in autocorrelation(ev, lag=2).collect()}
    assert out2[1]["acf"] == 1.0


def test_theil_sen_robust_to_outlier(spark):
    """A single wild outlier day shifts the OLS slope but leaves the
    Theil-Sen median slope at the true trend."""
    from fame2pygen_spark.operators.temporal import group_trend, theil_sen_trend

    day_us = 86_400_000_000
    rows = []
    for d in range(10):
        v = 2.0 * d + 1.0  # clean slope 2/day
        if d == 5:
            v = 1000.0  # outlier
        rows.append((1, d * day_us, v))
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    ts = theil_sen_trend(df).collect()[0]
    ols = group_trend(df).collect()[0]
    assert ts["n_days"] == 10
    assert ts["n_pairs"] == 45
    assert abs(ts["ts_slope"] - 2.0) < 0.3
    assert abs(ols["slope_per_day"] - 2.0) > 5.0  # OLS chased the spike


def test_theil_sen_max_days_cap(spark):
    from fame2pygen_spark.operators.temporal import theil_sen_trend

    day_us = 86_400_000_000
    rows = [(1, d * day_us, float(d)) for d in range(100)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    out = theil_sen_trend(df, max_days=40).collect()[0]
    assert out["n_days"] == 40
    assert out["n_pairs"] == 40 * 39 // 2
    assert out["ts_slope"] == 1.0


def test_ewma_matches_pandas_adjusted(spark):
    """Within the horizon, the finite EWMA equals pandas
    ewm(alpha, adjust=True); a planted step responds geometrically."""
    import pandas as pd

    from fame2pygen_spark.operators.temporal import ewma_smooth

    vals = [1.0, 2.0, 4.0, 8.0, 8.0, 8.0, 0.0, 0.0]
    rows = [(1, i * 1000, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, value double"
    )
    out = (
        ewma_smooth(df, alpha=0.5, horizon=16)
        .orderBy("ts_us")
        .collect()
    )
    expected = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    for r, e in zip(out, expected):
        assert abs(r["ewma"] - round(e, 6)) < 1e-9


def test_ewma_skips_null_lags(spark):
    from fame2pygen_spark.operators.temporal import ewma_smooth

    rows = [(1, 0, 0, 2.0), (1, 1, 1, None), (1, 2, 2, 4.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, value double"
    )
    out = {r["ts_us"]: r["ewma"] for r in ewma_smooth(df).collect()}
    assert out[1] is None  # null value -> null smoothed row
    # row 2: weights 1 (self) and 0.25 (lag2); null lag1 renormalized
    assert abs(out[2] - round((4.0 + 0.25 * 2.0) / 1.25, 6)) < 1e-9


def test_scd2_merge_semantics(spark):
    """Closing, opening, no-op suppression, and unknown-key insert."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fame2pygen_spark.operators.temporal import scd2_merge

    hist = spark.createDataFrame(
        [
            (1, "a", dt.date(1990, 1, 1), dt.date(1995, 1, 1)),  # closed v1
            (1, "b", dt.date(1995, 1, 1), None),                 # current
            (2, "x", dt.date(1990, 1, 1), None),
            (3, "z", dt.date(1990, 1, 1), None),
        ],
        "k long, attr string, valid_from date, valid_to date",
    )
    upd = spark.createDataFrame(
        [
            (1, "c"),   # change -> close + open
            (2, "x"),   # no-op -> untouched
            (9, "new"), # unknown key -> first version
        ],
        "k long, attr string",
    ).withColumn("eff", F.lit("2000-06-01").cast("date"))
    out = scd2_merge(
        hist, upd, key_cols=["k"], attr_cols=["attr"], effective="eff"
    ).collect()
    rows = {(r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"])) for r in out}
    assert (1, "a", "1990-01-01", "1995-01-01") in rows   # old history kept
    assert (1, "b", "1995-01-01", "2000-06-01") in rows   # closed
    assert (1, "c", "2000-06-01", "None") in rows         # opened
    assert (2, "x", "1990-01-01", "None") in rows         # no-op untouched
    assert (3, "z", "1990-01-01", "None") in rows         # unaffected
    assert (9, "new", "2000-06-01", "None") in rows       # inserted
    assert len(out) == 6


def test_m4_downsample_keeps_exact_extrema_per_bucket(spark):
    """x127: every bucket's emitted points must be exactly the
    bucket's true min/max/first/last under the documented tie rules —
    checked against a brute-force python computation, including a
    bucket where one row plays several roles and a tied-minimum
    bucket."""
    from fame2pygen_spark.operators.temporal import m4_downsample

    rows = [
        # series "a": 10 points over ts 0..90
        ("a", 0, 5.0), ("a", 10, 1.0), ("a", 20, 9.0), ("a", 30, 1.0),
        ("a", 40, 4.0), ("a", 50, 8.0), ("a", 60, 2.0), ("a", 70, 2.0),
        ("a", 80, 7.0), ("a", 90, 3.0),
        # series "b": single point (degenerate span)
        ("b", 5, 42.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = m4_downsample(df, "ts", "v", ["g"], n_buckets=2)
    got = {
        (r["g"], r["bucket"], r["role"]): (r["ts"], r["v"])
        for r in out.collect()
    }

    def brute(pts):
        vmin = min(pts, key=lambda p: (p[1], p[0]))
        vmax = max(pts, key=lambda p: (p[1], p[0]))
        first = min(pts, key=lambda p: (p[0], p[1]))
        last = max(pts, key=lambda p: (p[0], p[1]))
        return {"vmin": vmin, "vmax": vmax, "first": first, "last": last}

    # bucket arithmetic: ((ts - 0) * 2) div 91 -> bucket 0 is ts 0..45
    a_pts = [(t, v) for g, t, v in rows if g == "a"]
    b0 = [p for p in a_pts if (p[0] * 2) // 91 == 0]
    b1 = [p for p in a_pts if (p[0] * 2) // 91 == 1]
    for b, pts in ((0, b0), (1, b1)):
        for role, want in brute(pts).items():
            assert got[("a", b, role)] == want, (b, role)
    # tied min in bucket 0 (1.0 at ts 10 and 30): earliest ts wins
    assert got[("a", 0, "vmin")] == (10, 1.0)
    # degenerate single-point series: all four roles, bucket 0
    for role in ("vmin", "vmax", "first", "last"):
        assert got[("b", 0, role)] == (5, 42.0)
    # row count: 4 roles per non-empty bucket
    assert out.count() == 4 * 3


def test_m4_downsample_drops_null_ts_and_coerces_buckets(spark):
    """ADVICE r3: a null timestamp must be dropped like a null value
    (no bucket=NULL rows), and a float n_buckets must be coerced to
    int before entering the bucket expression."""
    from fame2pygen_spark.operators.temporal import m4_downsample

    rows = [("a", 0, 5.0), ("a", None, 99.0), ("a", 10, None),
            ("a", 20, 1.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = m4_downsample(df, "ts", "v", ["g"], n_buckets=2.0).collect()
    assert all(r["bucket"] is not None for r in out)
    assert not any(r["v"] == 99.0 for r in out)  # null-ts row gone
    assert {r["v"] for r in out} == {5.0, 1.0}
