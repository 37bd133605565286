"""Generate the s17_nlrx golden parquet oracle.

The NLRX operator (``fame2pygen_spark/functions/nlrx.py``) is an
iterative banded solve — not ANSI-SQL-expressible — so its oracle is a
golden parquet: the input series is derived INDEPENDENTLY of Spark
(DuckDB decimal-exact monthly aggregation, the same SQL_BASE mirror the
other s-query oracles use), the Hodrick–Prescott trend is solved with
numpy, and the solution is verified against the HP optimality
conditions ((I + λ·DᵀD)·τ − y ≈ 0) before being written.  One file
covers every test SF, keyed by ``sf_tag`` = COUNT(*) of the orders
table, so the static oracle SQL can select its slice from the live
view at whatever SF the driver runs.

Run: python scripts/make_s17_golden.py   (rewrites tests/golden/)
"""

from __future__ import annotations

import duckdb
import numpy as np

LAMB = 1600.0
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = "/root/repo/tests/golden/s17_nlrx.parquet"


def hp_trend(y: np.ndarray, lamb: float) -> np.ndarray:
    """HP trend via the normal equations (same formulation as
    functions/nlrx.py:_hp_trend — numpy LAPACK solve is deterministic,
    so the golden is bit-identical to the executor-side solve given
    bit-identical inputs; mathematical correctness is asserted below
    via the optimality residual, not assumed)."""
    n = len(y)
    if n < 3:
        return y.astype(float)
    eye = np.eye(n)
    d = np.diff(eye, 2, axis=0)
    a = eye + lamb * d.T @ d
    return np.linalg.solve(a, y.astype(float))


def main() -> None:
    frames = []
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        sf_tag = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchone()[0]
        rows = con.execute(f"""
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS DATE,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 1000000 AS SCALE
            FROM read_parquet('{sf_dir}/orders.parquet')
            GROUP BY 1 ORDER BY 1
        """).fetchall()
        con.close()
        dates = [r[0] for r in rows]
        y = np.array([r[1] for r in rows], dtype=float)
        tau = hp_trend(y, LAMB)

        # independent mathematical check: the solution must satisfy the
        # HP optimality conditions to solver precision
        n = len(y)
        d = np.diff(np.eye(n), 2, axis=0)
        residual = (np.eye(n) + LAMB * d.T @ d) @ tau - y
        rel = np.abs(residual).max() / max(np.abs(y).max(), 1.0)
        assert rel < 1e-9, f"{sf_dir}: HP residual {rel:.2e}"

        frames.append((sf_tag, dates, y, tau))
        print(f"{sf_dir}: sf_tag={sf_tag} n={n} residual={rel:.2e}")

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE golden (
            sf_tag BIGINT, DATE DATE, SCALE DOUBLE, TREND DOUBLE
        )
    """)
    for sf_tag, dates, y, tau in frames:
        for i in range(len(dates)):
            con.execute(
                "INSERT INTO golden VALUES (?, ?, ?, ?)",
                [sf_tag, dates[i], float(y[i]), float(tau[i])],
            )
    con.execute(f"COPY golden TO '{OUT}' (FORMAT PARQUET)")
    con.close()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
