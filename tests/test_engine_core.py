"""End-to-end engine tests: core expressions, windows, conditionals.

Modeled on the reference's execution-layer tests
(``/root/reference/tests/test_master_suite.py:62-88`` harness and the
value assertions throughout), but asserting DataFrame *results* instead
of generated code strings.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from fame2pygen_spark import run_script


def by_date(df, *cols):
    rows = df.orderBy("DATE").collect()
    return [tuple(r[c] for c in cols) for r in rows]


def test_literal_and_arithmetic(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), 10.0, 20.0), (dt.date(2020, 2, 1), 30.0, 40.0)],
        "DATE date, A double, B double",
    )
    res = run_script(df, ["v = 150", "s = a + b", "m = a * b - 5", "chainv = s * 2"])
    rows = res.df.orderBy("DATE").collect()
    assert [r["V"] for r in rows] == [150, 150]
    assert [r["S"] for r in rows] == [30.0, 70.0]
    assert [r["M"] for r in rows] == [195.0, 1195.0]
    assert [r["CHAINV"] for r in rows] == [60.0, 140.0]


def test_forward_reference_topological_order(spark):
    # d defined before its dependency c — the DAG reorders (reference
    # fame2py_converter.py:40-93)
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), 1.0, 2.0)], "DATE date, A double, B double"
    )
    res = run_script(df, ["d = c * 2", "c = a + b"])
    row = res.df.first()
    assert row["C"] == 3.0
    assert row["D"] == 6.0


def test_lag_lead_and_null_edges(spark, ts_monthly):
    res = run_script(ts_monthly, ["lagged = a[t-1]", "led = a[t+1]"])
    rows = res.df.orderBy("DATE").collect()
    assert rows[0]["LAGGED"] is None
    assert rows[1]["LAGGED"] == rows[0]["A"]
    assert rows[-1]["LED"] is None
    assert rows[0]["LED"] == rows[1]["A"]


def test_pct_and_diff(spark, ts_monthly):
    res = run_script(ts_monthly, ["g = pct(a)", "g4 = pct(a, 4)", "d1 = diff(a)"])
    rows = res.df.orderBy("DATE").collect()
    assert rows[0]["G"] is None
    a0, a1 = rows[0]["A"], rows[1]["A"]
    assert rows[1]["G"] == pytest.approx((a1 - a0) / a0 * 100)
    assert rows[4]["G4"] == pytest.approx((rows[4]["A"] - rows[0]["A"]) / rows[0]["A"] * 100)
    assert rows[1]["D1"] == pytest.approx(a1 - a0)


def test_pct_diff_on_dotted_name(spark):
    # FAME dot targets (RESULT.A) are flat columns; the pct/diff offset
    # fast path must backtick-quote them instead of resolving a struct
    # field (same quoting as the plain Ref path, emitter.py:121)
    df = spark.createDataFrame(
        [(dt.date(2020, m, 1), float(m * 10)) for m in range(1, 5)],
        "DATE date, A double",
    )
    res = run_script(
        df, ["result.a = a * 2", "g = pct(result.a)", "d = diff(result.a)"]
    )
    rows = res.df.orderBy("DATE").collect()
    assert rows[1]["G"] == pytest.approx((40.0 - 20.0) / 20.0 * 100)
    assert rows[1]["D"] == pytest.approx(20.0)


def test_pct_of_lead_pushdown(spark, ts_monthly):
    # pct(x[t+1]) = (x[t+1] - x[t]) / x[t] * 100 — offsets pushed into
    # lag/lead, no nested windows
    res = run_script(ts_monthly, ["v = pct(a[t+1])"])
    rows = res.df.orderBy("DATE").collect()
    a0, a1 = rows[0]["A"], rows[1]["A"]
    assert rows[0]["V"] == pytest.approx((a1 - a0) / a0 * 100)
    assert rows[-1]["V"] is None


def test_conditionals_nested(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2020, 1, 1), 3.0, 1.0, 2.0, 30.0),
            (dt.date(2020, 2, 1), 7.0, 1.0, 2.0, 30.0),
            (dt.date(2020, 3, 1), 12.0, 1.0, 2.0, 30.0),
        ],
        "DATE date, T1 double, BASE double, B double, C double",
    )
    res = run_script(
        df, ["nested = if t1 gt 10 then base else if t1 ge 5 then base * 2 else base * 3"]
    )
    assert [r["NESTED"] for r in res.df.orderBy("DATE").collect()] == [3.0, 2.0, 1.0]


def test_conditional_null_comparison_semantics(spark):
    # `a eq nd` compares with NULL → never true (reference README:283-286)
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), None), (dt.date(2020, 2, 1), 5.0)],
        "DATE date, A double",
    )
    res = run_script(df, ["check = if a eq nd then 0 else a",
                          "safe = if exists(a) then a else 0"])
    rows = res.df.orderBy("DATE").collect()
    assert rows[0]["CHECK"] is None  # NULL condition → else branch... NULL==NULL is NULL → else
    assert rows[1]["CHECK"] == 5.0
    assert rows[0]["SAFE"] == 0.0
    assert rows[1]["SAFE"] == 5.0


def test_lsum_null_safe(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2020, 1, 1), 1.0, None, 3.0),
            (dt.date(2020, 2, 1), None, None, None),
        ],
        "DATE date, A double, B double, C double",
    )
    res = run_script(df, ["total = lsum(a, b, c)"])
    assert [r["TOTAL"] for r in res.df.orderBy("DATE").collect()] == [4.0, 0.0]


def test_firstvalue_lastvalue(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2020, 1, 1), None),
            (dt.date(2020, 2, 1), 7.0),
            (dt.date(2020, 3, 1), 9.0),
            (dt.date(2020, 4, 1), None),
        ],
        "DATE date, A double",
    )
    res = run_script(df, ["fv = firstvalue(a)", "lv = lastvalue(a)"])
    rows = res.df.orderBy("DATE").collect()
    assert all(r["FV"] == 7.0 for r in rows)
    assert all(r["LV"] == 9.0 for r in rows)


def test_math_functions(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), 4.0, -3.0)], "DATE date, A double, B double"
    )
    res = run_script(
        df,
        ["r1 = sqrt(a)", "r2 = abs(b)", "r3 = log(exp(a))", "r4 = min(a, b)",
         "r5 = max(a, b)", "r6 = a ** 2"],
    )
    row = res.df.first()
    assert row["R1"] == 2.0
    assert row["R2"] == 3.0
    assert row["R3"] == pytest.approx(4.0)
    assert row["R4"] == -3.0
    assert row["R5"] == 4.0
    assert row["R6"] == 16.0


def test_date_window_preserve_semantics(spark):
    """Master-corpus pattern (fame_script_master.inp:9-15): new columns
    are null outside their window; re-assignment preserves."""
    dates = [dt.date(2020, m, 1) for m in (1, 6)] + [dt.date(2021, m, 1) for m in (1, 6)]
    df = spark.createDataFrame([(d,) for d in dates], "DATE date")
    res = run_script(
        df,
        [
            "v_base = 100",
            "date 2020-01-01 to 2020-12-31",
            "v_2020 = v_base * 2",
            "date 2021-01-01 to 2021-12-31",
            "v_2021 = v_base * 3",
            "date *",
            "v_all = v_base + v_2020 + v_2021",
        ],
    )
    rows = res.df.orderBy("DATE").collect()
    assert [r["V_2020"] for r in rows] == [200, 200, None, None]
    assert [r["V_2021"] for r in rows] == [None, None, 300, 300]
    # v_all adds a null → null (FAME arithmetic propagates missing)
    assert [r["V_ALL"] for r in rows] == [None] * 4


def test_date_window_reassign_preserves_prior(spark):
    dates = [dt.date(2019, 6, 1), dt.date(2020, 6, 1), dt.date(2021, 6, 1)]
    df = spark.createDataFrame([(d, 1.0) for d in dates], "DATE date, A double")
    res = run_script(
        df,
        [
            "v = 10",
            "date 2020-01-01 to 2020-12-31",
            "v = 20",
            "date *",
        ],
    )
    assert [r["V"] for r in res.df.orderBy("DATE").collect()] == [10, 20, 10]


def test_inline_date_window(spark):
    dates = [dt.date(2019, 12, 25), dt.date(2020, 3, 1), dt.date(2021, 2, 1)]
    df = spark.createDataFrame([(d,) for d in dates], "DATE date")
    res = run_script(df, ["set <date 2020-01-01 to 2020-12-31> b1 = 1"])
    assert [r["B1"] for r in res.df.orderBy("DATE").collect()] == [None, 1, None]


def test_open_ended_date_window(spark):
    dates = [dt.date(2020, 1, 1), dt.date(2021, 1, 1), dt.date(2022, 1, 1)]
    df = spark.createDataFrame([(d,) for d in dates], "DATE date")
    res = run_script(
        df, ["date 01Jan2021 to *", "b = 200", "date *"]
    )
    assert [r["B"] for r in res.df.orderBy("DATE").collect()] == [None, 200, 200]


def test_point_in_time_sequential_last_wins(spark):
    dates = [dt.date(2019, 12, 1), dt.date(2020, 1, 1), dt.date(2020, 2, 1)]
    df = spark.createDataFrame([(d,) for d in dates], "DATE date")
    res = run_script(
        df,
        [
            'gdp["2019-12-01"] = 500',
            'gdp["2020-01-01"] = 1000',
            'gdp["2020-01-01"] = 100',
            'gdp["2020-02-01"] = gdp["2020-01-01"] * 2',
        ],
    )
    rows = res.df.orderBy("DATE").collect()
    assert [r["GDP"] for r in rows] == [500.0, 100.0, 200.0]


def test_point_in_time_date_formats(spark):
    dates = [dt.date(2020, 1, 1), dt.date(2020, 3, 12), dt.date(2020, 4, 1)]
    df = spark.createDataFrame([(d,) for d in dates], "DATE date")
    res = run_script(
        df,
        ["cpi['2020Q1'] = 105.5", "set a[12mar2020]=33"],
    )
    rows = res.df.orderBy("DATE").collect()
    assert rows[0]["CPI"] == 105.5
    assert rows[1]["A"] == 33
    assert rows[2]["A"] is None


def test_scalar_aggregate_and_dynamic_lookup(spark):
    dates = [dt.date(2020, 1, 1), dt.date(2020, 2, 1), dt.date(2020, 3, 1)]
    df = spark.createDataFrame(
        [(d, float(i + 1)) for i, d in enumerate(dates)], "DATE date, A double"
    )
    res = run_script(
        df,
        [
            "scalar mean_a = ave(a)",
            "scaled = a * mean_a",
            'scalar pick_date = make(date(m), "2020-02-01")',
            "scalar picked = a[pick_date]",
            "shifted = a + picked",
        ],
    )
    assert res.scalars["mean_a"] == pytest.approx(2.0)
    assert res.scalars["picked"] == 2.0
    rows = res.df.orderBy("DATE").collect()
    assert [r["SCALED"] for r in rows] == [2.0, 4.0, 6.0]
    assert [r["SHIFTED"] for r in rows] == [3.0, 4.0, 5.0]


def test_local_databases(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), 1.0)], "DATE date, PLAIN double"
    )
    res = run_script(
        df, ["gg'car = plain + 1", "aa'abc = plain * 2", "work'w = plain"]
    )
    assert set(res.local_databases) == {"GG", "AA"}
    assert res.local_databases["GG"].columns == ["DATE", "CAR"]
    assert res.local_databases["GG"].first()["CAR"] == 2.0
    # work' prefix ignored → main-frame column W
    assert res.df.first()["W"] == 1.0


def test_dateof_sentinel_conditional(spark):
    # reference compiles dateof(..., contain, end) to 9999-12-31 so the
    # condition is never true (formulas_generator.py:1331-1338)
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), 1.0, 2.0)], "DATE date, A double, B double"
    )
    res = run_script(
        df,
        ['result = if t ge dateof(make(date(bus), "10aug2020"), *, contain, end) then a+b else nd'],
    )
    assert res.df.first()["RESULT"] is None


def test_shift_pct_forward(spark):
    dates = [dt.date(2020, m, 1) for m in range(1, 6)]
    df = spark.createDataFrame(
        [(d, 100.0 * (1.02 ** i), 50.0 * (1.01 ** i)) for i, d in enumerate(dates)],
        "DATE date, V1 double, P1 double",
    )
    res = run_script(df, ["set v2 = pct(p1[t+1])"])
    rows = res.df.orderBy("DATE").collect()
    assert rows[0]["V2"] == pytest.approx(1.0)


def test_list_alias_dependency(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 1), 1.0, 2.0, 3.0)],
        "DATE date, A double, B double, C double",
    )
    res = run_script(df, ["v27 = {a, b, c}", "s = a + b + c"])
    assert res.df.first()["S"] == 6.0


def test_salted_agg_matches_plain_groupby(spark):
    """Skew-salted two-stage aggregation must equal the plain groupBy."""
    from pyspark.sql import functions as F

    from fame2pygen_spark.functions.core import salted_agg

    # skewed: key 'hot' holds 80% of rows
    rows = [("hot" if i % 5 != 0 else f"k{i % 7}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["sum_v"], r["n_rows"], r["max_v"])
        for r in salted_agg(
            df, ["k"],
            {"sum_v": F.sum("v"), "n_rows": F.count("*"), "max_v": F.max("v")},
        ).collect()
    }
    want = {
        r["k"]: (r["sum_v"], r["n_rows"], r["max_v"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("sum_v"), F.count("*").alias("n_rows"),
            F.max("v").alias("max_v"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0])
        assert got[k][1:] == want[k][1:]


@pytest.mark.parametrize(
    "text,expected",
    [
        ("2020-01-01", dt.date(2020, 1, 1)),
        ("2020Q1", dt.date(2020, 1, 1)),
        ("2020q3", dt.date(2020, 7, 1)),
        ("12jul1985", dt.date(1985, 7, 12)),
        ("2020", dt.date(2020, 1, 1)),
        ("2020m03", dt.date(2020, 3, 1)),
        ("jan2020", dt.date(2020, 1, 1)),
    ],
)
def test_fame_date_formats(text, expected):
    """E19: the seven FAME date-literal formats
    (reference convert_fame_date_to_iso, formulas_generator.py:312-380)."""
    from fame2pygen_spark.parser.dates import parse_fame_date

    assert parse_fame_date(text) == expected


def test_materialize_base_conf_flips_plan_not_results(spark):
    """`spark.fame2pygen.engine.materializeBase` (scale knob, default
    lazy): ON must truncate the multi-consumer input lineage to one
    materialized scan (ExistingRDD in the plan) without changing any
    value; OFF must leave the plan fully lazy (no RDD scan)."""
    df = spark.createDataFrame(
        [
            (dt.date(2020, 1, 1), 10.0, 20.0),
            (dt.date(2020, 2, 1), 30.0, 40.0),
            (dt.date(2020, 4, 1), 50.0, 60.0),
        ],
        "DATE date, A double, B double",
    )
    script = ["freq m", "qa = convert(a, q, disc, sum)", "s = a + b"]

    def formatted(res):
        jdf = res.df._jdf
        return res.df._sc._jvm.PythonSQLUtils.explainString(
            jdf.queryExecution(), "formatted"
        )

    res_lazy = run_script(df, script)
    assert "localCheckpoint" not in formatted(res_lazy)

    spark.conf.set("spark.fame2pygen.engine.materializeBase", "true")
    try:
        res_mat = run_script(df, script)
        assert "localCheckpoint" in formatted(res_mat)
    finally:
        spark.conf.unset("spark.fame2pygen.engine.materializeBase")

    def key(r):
        return (r["DATE"],)

    lazy_rows = sorted(res_lazy.df.collect(), key=key)
    mat_rows = sorted(res_mat.df.collect(), key=key)
    assert [tuple(r) for r in lazy_rows] == [tuple(r) for r in mat_rows]
