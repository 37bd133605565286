"""Frequency-conversion (CONVERT) operator tests — FIXTURES.md F3."""

from __future__ import annotations

import datetime as dt

import pytest

from fame2pygen_spark import run_script


@pytest.fixture()
def ts_daily(spark):
    """Daily calendar 2020-01-01..2020-12-31 with synthetic values."""
    start = dt.date(2020, 1, 1)
    rows = []
    for i in range(366):
        d = start + dt.timedelta(days=i)
        monthly = 1000.0 + 10 * (d.month - 1) if d.day == 1 else None
        rows.append((d, 100.0 * (1.0003 ** i), monthly))
    return spark.createDataFrame(
        rows, "DATE date, V_DAILY double, MONTHLY_GDP double"
    )


def test_downsample_daily_to_monthly_average(spark, ts_daily):
    res = run_script(ts_daily, ["v_mon = convert(v_daily, m, disc, ave)"])
    out = res.df.where("V_DAILY_MON is not null").orderBy("DATE").collect()
    assert len(out) == 12
    assert out[0]["DATE"] == dt.date(2020, 1, 1)
    # January average of 100*(1.0003^i), i=0..30
    expected = sum(100.0 * 1.0003 ** i for i in range(31)) / 31
    assert out[0]["V_DAILY_MON"] == pytest.approx(expected)


def test_downsample_observed_variants(spark, ts_daily):
    res = run_script(
        ts_daily,
        [
            "v_sum = convert(v_daily, q, disc, sum)",
            "v_first = convert(v_daily, a, disc, first)",
            "v_last = convert(v_daily, a, disc, last)",
            "v_hi = convert(v_daily, a, disc, hi)",
            "v_lo = convert(v_daily, a, disc, lo)",
        ],
    )
    df = res.df
    q = df.where("V_DAILY_QTRLY is not null").orderBy("DATE").collect()
    assert len(q) == 4
    expected_q1 = sum(100.0 * 1.0003 ** i for i in range(91))
    assert q[0]["V_DAILY_QTRLY"] == pytest.approx(expected_q1)
    ann = df.where("V_DAILY_ANN is not null").collect()
    assert len(ann) == 1
    row = ann[0]
    assert row["V_DAILY_ANN"] == pytest.approx(100.0)  # first: i=0
    # sum/first/last/hi/lo all suffix to the same column name per the
    # reference convention... each convert targets the same source
    # series so the later ones would collide. Use the rename map:
    assert res.renames["V_FIRST"] == "V_DAILY_ANN"


def test_downsample_observed_formula_geomean(spark):
    """observed=formula = in-period geometric mean, null when any
    observation is non-positive (documented engine semantics for FAME's
    user-formula convention, reference formulas_generator.py:114)."""
    import math

    rows = [
        (dt.date(2020, 1, 1), 2.0),
        (dt.date(2020, 2, 1), 8.0),
        (dt.date(2020, 3, 1), 4.0),
        (dt.date(2020, 4, 1), 0.0),   # Q2 contains a non-positive → null
        (dt.date(2020, 5, 1), 9.0),
        (dt.date(2020, 6, 1), 3.0),
        (dt.date(2020, 7, 1), None),  # nulls are skipped, not gating
        (dt.date(2020, 8, 1), 5.0),
        (dt.date(2020, 9, 1), 20.0),
    ]
    frame = spark.createDataFrame(rows, "DATE date, V double")
    res = run_script(frame, ["freq m", "g = convert(v, q, disc, formula)"])
    out = {r["DATE"]: r["V_QTRLY"]
           for r in res.df.where("V_QTRLY is not null or DATE = date'2020-04-01'")
           .collect()}
    assert out[dt.date(2020, 1, 1)] == pytest.approx(
        (2.0 * 8.0 * 4.0) ** (1 / 3)
    )
    assert out[dt.date(2020, 4, 1)] is None
    assert out[dt.date(2020, 7, 1)] == pytest.approx(math.sqrt(5.0 * 20.0))


def test_upsample_monthly_to_daily_constant(spark):
    months = [dt.date(2020, m, 1) for m in (1, 2, 3)]
    df = spark.createDataFrame(
        [(d, float(i + 1)) for i, d in enumerate(months)], "DATE date, GDP double"
    )
    res = run_script(df, ["gdp_d = convert(gdp, d, const, ave)"])
    out = res.df.where("GDP_DD is not null").orderBy("DATE").collect()
    # calendar spans 2020-01-01..2020-03-01 inclusive
    assert len(out) == 61
    jan15 = [r for r in out if r["DATE"] == dt.date(2020, 1, 15)][0]
    assert jan15["GDP_DD"] == 1.0
    feb29 = [r for r in out if r["DATE"] == dt.date(2020, 2, 29)][0]
    assert feb29["GDP_DD"] == 2.0


def test_upsample_linear_interpolation(spark):
    months = [dt.date(2020, 1, 1), dt.date(2020, 1, 11)]
    df = spark.createDataFrame(
        [(months[0], 0.0), (months[1], 10.0)], "DATE date, V double"
    )
    res = run_script(df, ["v_d = convert(v, d, linear, ave)"])
    out = {r["DATE"]: r["V_DD"] for r in res.df.where("V_DD is not null").collect()}
    assert out[dt.date(2020, 1, 6)] == pytest.approx(5.0)
    assert out[dt.date(2020, 1, 4)] == pytest.approx(3.0)


def test_business_day_conversion(spark, ts_daily):
    res = run_script(ts_daily, ["v_b = convert(v_daily, b, disc, ave)"])
    out = res.df.where("V_DAILY_BUSD is not null").select("DATE").collect()
    # all business days Mon-Fri, none on weekends
    assert all(r["DATE"].weekday() < 5 for r in out)
    assert len(out) == 262  # business days in 2020


def test_weekly_with_start_day(spark, ts_daily):
    res = run_script(ts_daily, ["v_w = convert(v_daily, w(wed), disc, ave)"])
    out = res.df.where("V_DAILY_WK is not null").select("DATE").collect()
    assert all(r["DATE"].weekday() == 2 for r in out)  # Wednesday


def test_converted_column_reference_rewrite(spark, ts_daily):
    """Master-corpus pattern: TOTAL = A + DD referencing converted cols
    (fame_script_master.inp:132-143)."""
    res = run_script(
        ts_daily,
        [
            "vm = convert(v_daily, m, disc, ave)",
            "doubled = vm * 2",
        ],
    )
    out = res.df.where("DOUBLED is not null").orderBy("DATE").collect()
    assert len(out) == 12
    assert out[0]["DOUBLED"] == pytest.approx(out[0]["V_DAILY_MON"] * 2)


def test_quarterly_to_monthly_upsample(spark):
    quarters = [dt.date(2020, 1, 1), dt.date(2020, 4, 1), dt.date(2020, 7, 1)]
    df = spark.createDataFrame(
        [(d, float((i + 1) * 100)) for i, d in enumerate(quarters)],
        "DATE date, GDP double",
    )
    res = run_script(df, ["gdp_m = convert(gdp, m, const, ave)"])
    out = res.df.where("GDP_MON is not null").orderBy("DATE").collect()
    assert len(out) == 7  # 2020-01..2020-07
    assert [r["GDP_MON"] for r in out] == [100.0, 100.0, 100.0, 200.0, 200.0, 200.0, 300.0]


class TestCubicUpsample:
    def test_cubic_passes_through_knots_and_midpoints(self, spark):
        """Quarterly knots → monthly cubic Hermite: knots exact, interior
        points match the hand-computed Catmull-Rom formula."""
        import datetime as dt

        from fame2pygen_spark import run_script

        knots = [
            (dt.date(2020, 1, 1), 0.0),
            (dt.date(2020, 4, 1), 10.0),
            (dt.date(2020, 7, 1), 8.0),
            (dt.date(2020, 10, 1), 20.0),
        ]
        df = spark.createDataFrame(knots, "DATE date, Q double")
        res = run_script(df, ["freq q", "m = convert(q, m, cubic, ave)"])
        out = {
            r["DATE"]: r["Q_MON"]
            for r in res.df.where("Q_MON is not null").collect()
        }
        # knots preserved exactly
        for d, v in knots:
            assert out[d] == pytest.approx(v)

        # hand-computed Hermite at 2020-05-01 (interval Apr 1 → Jul 1,
        # non-uniform finite-difference tangents)
        x1, x2 = dt.date(2020, 4, 1), dt.date(2020, 7, 1)
        v0, v1, v2, v3 = 0.0, 10.0, 8.0, 20.0
        d0, d3 = dt.date(2020, 1, 1), dt.date(2020, 10, 1)
        h = (x2 - x1).days
        m1 = (v2 - v0) / (x2 - d0).days
        m2 = (v3 - v1) / (d3 - x1).days
        x = dt.date(2020, 5, 1)
        t = (x - x1).days / h
        expected = (
            (2 * t**3 - 3 * t**2 + 1) * v1
            + (t**3 - 2 * t**2 + t) * h * m1
            + (-2 * t**3 + 3 * t**2) * v2
            + (t**3 - t**2) * h * m2
        )
        assert out[x] == pytest.approx(expected)
        # between two equal-trend knots the curve stays bounded sanely
        assert all(-30 < v < 40 for v in out.values())

    def test_cubic_entity_partitioned(self, spark):
        import datetime as dt

        from fame2pygen_spark import run_script

        rows = []
        for ent, scale in (("A", 1.0), ("B", 100.0)):
            for q, m in enumerate([1, 4, 7, 10]):
                rows.append((ent, dt.date(2021, m, 1), scale * (q + 1)))
        df = spark.createDataFrame(rows, "ENT string, DATE date, Q double")
        res = run_script(
            df, ["freq q", "m = convert(q, m, cubic, ave)"],
            entity_cols=("ENT",),
        )
        got = {
            (r["ENT"], r["DATE"]): r["Q_MON"]
            for r in res.df.where("Q_MON is not null").collect()
        }
        assert got[("A", dt.date(2021, 1, 1))] == pytest.approx(1.0)
        assert got[("B", dt.date(2021, 1, 1))] == pytest.approx(100.0)
        # near-linear-trend knots (equal value steps over 90/91/92-day
        # months) → cubic tracks the line to within 1%
        assert got[("A", dt.date(2021, 2, 1))] == pytest.approx(
            1 + 31 / 90, rel=1e-2
        )


class TestGroupedConvertBridge:
    """convert_series_multi must match per-series convert_series exactly
    (the engine batches same-key converts into one pass)."""

    @pytest.fixture()
    def multi_frame(self, spark):
        import datetime as dt

        rows = []
        for i in range(14):
            d = dt.date(2020, 1 + i % 12, 1) if i < 12 else dt.date(2021, i - 11, 1)
            a = float(i) if i % 5 != 3 else None   # holes
            b = 100.0 - i if i > 2 else None       # late start
            rows.append((d, a, b))
        return spark.createDataFrame(rows, "DATE date, A double, B double")

    @pytest.mark.parametrize("observed", ["sum", "ave", "first", "last", "hi", "lo",
                                          "formula"])
    def test_down_group_matches_single(self, spark, multi_frame, observed):
        from fame2pygen_spark.operators.convert import (
            convert_series, convert_series_multi,
        )
        from fame2pygen_spark.parser.grammar import parse_statement

        metas = [
            parse_statement(f"qa = convert(a, q, disc, {observed})").meta,
            parse_statement(f"qb = convert(b, q, disc, {observed})").meta,
        ]
        multi = convert_series_multi(multi_frame, metas, source_freq="monthly")
        singles = None
        for m in metas:
            one = convert_series(multi_frame, m, source_freq="monthly")
            singles = one if singles is None else singles.join(
                one, on="DATE", how="full"
            )
        got = {r["DATE"]: (r["A_QTRLY"], r["B_QTRLY"]) for r in multi.collect()}
        want = {r["DATE"]: (r["A_QTRLY"], r["B_QTRLY"]) for r in singles.collect()}
        assert got == want

    @pytest.mark.parametrize("technique", ["const", "linear"])
    def test_up_group_matches_single(self, spark, technique):
        import datetime as dt

        from fame2pygen_spark.operators.convert import (
            convert_series, convert_series_multi,
        )
        from fame2pygen_spark.parser.grammar import parse_statement

        rows = [
            (dt.date(2020, 1, 1), 10.0, None),
            (dt.date(2020, 4, 1), 20.0, 5.0),
            (dt.date(2020, 7, 1), None, 8.0),
            (dt.date(2020, 10, 1), 40.0, 11.0),
        ]
        df = spark.createDataFrame(rows, "DATE date, A double, B double")
        metas = [
            parse_statement(f"ma = convert(a, m, {technique}, ave)").meta,
            parse_statement(f"mb = convert(b, m, {technique}, ave)").meta,
        ]
        multi = convert_series_multi(df, metas, source_freq="quarterly")
        singles = None
        for m in metas:
            one = convert_series(df, m, source_freq="quarterly")
            singles = one if singles is None else singles.join(
                one, on="DATE", how="full"
            )
        got = {r["DATE"]: (r["A_MON"], r["B_MON"]) for r in multi.collect()}
        want = {
            r["DATE"]: (r["A_MON"], r["B_MON"])
            for r in singles.collect()
            if r["DATE"] in got
        }
        for d, vals in want.items():
            assert got[d] == pytest.approx(vals), (d, got[d], vals)

    def test_engine_groups_converts_into_one_pass(self, spark, multi_frame):
        """Two same-key converts → the executed plan contains exactly
        one aggregate pass for the group (not one per series)."""
        from fame2pygen_spark import run_script

        res = run_script(
            multi_frame,
            ["freq m", "qa = convert(a, q, disc, sum)",
             "qb = convert(b, q, disc, sum)"],
        )
        plan = res.df._jdf.queryExecution().optimizedPlan().toString()
        n_aggregates = plan.count("Aggregate [")
        assert n_aggregates == 1, f"expected one grouped aggregate:\n{plan}"
        out = {r["DATE"]: (r["A_QTRLY"], r["B_QTRLY"])
               for r in res.df.where("A_QTRLY is not null").collect()}
        assert len(out) >= 4


def test_business_days_with_holiday_calendar(spark, ts_daily):
    """Layer a holiday table over the Mon-Fri business grid via the
    broadcast anti-join."""
    from fame2pygen_spark.operators.convert import exclude_holidays

    res = run_script(ts_daily, ["v_b = convert(v_daily, b, disc, ave)"])
    bus = res.df.where("V_DAILY_BUSD is not null")
    holidays = spark.createDataFrame(
        [(dt.date(2020, 1, 1),), (dt.date(2020, 12, 25),),
         (dt.date(2020, 7, 4),)],  # Jul 4 2020 is a Saturday — no-op
        "holiday date",
    )
    trimmed = exclude_holidays(bus, holidays)
    assert trimmed.count() == 260  # 262 business days - New Year - Christmas
    dates = {r["DATE"] for r in trimmed.select("DATE").collect()}
    assert dt.date(2020, 1, 1) not in dates
    assert dt.date(2020, 12, 25) not in dates
    # plan check: the anti-join broadcasts the holiday side
    plan = trimmed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_weekly_upsample_aligns_to_start_by(spark):
    """Monthly -> weekly(wed) upsample: every grid date is a Wednesday."""
    months = [dt.date(2020, m, 1) for m in (1, 2, 3)]
    df = spark.createDataFrame(
        [(d, float(i + 1)) for i, d in enumerate(months)], "DATE date, V double"
    )
    res = run_script(df, ["freq m", "vw = convert(v, w(wed), const, ave)"])
    out = [r["DATE"] for r in res.df.where("V_WK is not null").collect()]
    assert out and all(d.weekday() == 2 for d in out)
