"""Round-5 extension queries (x300+): compressed-codec ingest and the
round's new operator families.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

EXT13_QUERIES: dict = {}
EXT13_ORACLES: dict = {}


# ----------------------------- x300: PNG decode → perceptual hash

_PNG_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def q_x300_png_ahash(spark, sf_dir):
    """REAL PNG decode end to end (operators/multimodal.py:_decode_png
    → image_ahash): each document's deterministic 8×8 grayscale
    fingerprint (same pixel definition as x84's BMP path) is encoded
    as a genuine zlib-compressed PNG inside an Arrow-batched
    ``mapInPandas`` stage — color type rotating gray/RGB/RGBA by
    ``doc_id % 3`` and the scanline filter cycling through all five
    PNG filter types — then the operator inflates, unfilters and
    hashes those bytes.  The oracle never sees the bytes: it derives
    the hash arithmetically from the pixel definition, so an exact
    match proves the PNG encode → inflate → unfilter → thumbnail →
    hash pipeline is lossless for every filter type and color type."""
    from .operators.multimodal import encode_png_bytes, image_ahash
    from .queries_ext2 import _ahash_pixel_counts_spark

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array(*_ahash_pixel_counts_spark(nt)).alias("px"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                gray = np.asarray(list(px), dtype=np.uint8).reshape(8, 8)
                color_type = (0, 2, 6)[int(doc_id) % 3]
                payloads.append(
                    encode_png_bytes(
                        gray, color_type=color_type, filter_mode="cycle"
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_png = staged.mapInPandas(encode, schema=_PNG_PAYLOAD_SCHEMA)
    return image_ahash(with_png, "doc_id", "payload")


def _sql_x300() -> str:
    # identical pixel definition to x84 — the hash is a pure function
    # of the 64 fingerprint bytes, so the SQL side is byte-layout-free
    from .queries_ext2 import _sql_x84

    return _sql_x84()


EXT13_QUERIES.update({"x300_png_ahash": q_x300_png_ahash})
EXT13_ORACLES.update({"x300_png_ahash": _sql_x300()})


# ----------------------------- x301: RFF-MMD embedding drift

_MMD_DIM, _MMD_FEATS, _MMD_GAMMA, _MMD_SEED = 64, 8, 0.5, 7


def q_x301_mmd_rff(spark, sf_dir):
    """Kernel-MMD² drift between even- and odd-id embedding halves
    (operators/similarity.py:mmd_rff, random Fourier features): an
    A/A-style split, so the expected MMD² is near zero — the oracle
    rebuilds the identical seeded feature map in SQL."""
    from .operators.similarity import mmd_rff

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    return mmd_rff(
        a, b, dim=_MMD_DIM, n_features=_MMD_FEATS,
        gamma=_MMD_GAMMA, seed=_MMD_SEED,
    )


def _sql_x301() -> str:
    from .operators.similarity import rff_planes

    planes, phases = rff_planes(
        _MMD_DIM, _MMD_FEATS, gamma=_MMD_GAMMA, seed=_MMD_SEED
    )
    zcols = []
    for j, (w, ph) in enumerate(zip(planes, phases)):
        wlit = "[" + ", ".join(f"{x!r}" for x in w) + "]"
        zcols.append(
            f"CAST(ROUND(cos(list_reduce(list_transform(range(1, 65), "
            f"i -> v[CAST(i AS INTEGER)] * ({wlit})[CAST(i AS INTEGER)]), "
            f"(acc, x) -> acc + x) + {ph!r}), 9) AS DECIMAL(38,12)) AS z{j}"
        )
    zsel = ",\n         ".join(zcols)
    sums = ", ".join(f"SUM(z{j}) AS s{j}" for j in range(_MMD_FEATS))
    diffs = " + ".join(
        f"(CAST(a.s{j} AS DOUBLE) / a.n - CAST(b.s{j} AS DOUBLE) / b.n) * "
        f"(CAST(a.s{j} AS DOUBLE) / a.n - CAST(b.s{j} AS DOUBLE) / b.n)"
        for j in range(_MMD_FEATS)
    )
    return f"""
WITH vv AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
         embedding::DOUBLE[] AS v
  FROM embeddings
), z AS (
  SELECT side,
         {zsel}
  FROM vv
), agg AS (
  SELECT side, CAST(COUNT(*) AS DOUBLE) AS n, {sums}
  FROM z GROUP BY side
)
SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       ROUND({2.0 / _MMD_FEATS!r} * ({diffs}), 6) AS mmd2
FROM (SELECT * FROM agg WHERE side = 'a') a
CROSS JOIN (SELECT * FROM agg WHERE side = 'b') b
"""


EXT13_QUERIES.update({"x301_mmd_rff": q_x301_mmd_rff})
EXT13_ORACLES.update({"x301_mmd_rff": _sql_x301()})


# ----------------------------- x302: energy distance


def q_x302_energy_distance(spark, sf_dir):
    """Two-sample energy distance between urgent and low-priority
    order totals (operators/sketch.py:energy_distance) — the exact
    V-statistic from closed-form prefix sums over the value support,
    no quadratic pair stage."""
    from .operators.sketch import energy_distance

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_totalprice").alias("v")
    )
    b = orders.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_totalprice").alias("v")
    )
    return energy_distance(a, b, "v")


SQL_X302 = """
WITH tagged AS (
  SELECT ROUND(CAST(o_totalprice AS DOUBLE), 6) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS b
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    AND o_totalprice IS NOT NULL
), support AS (
  SELECT v, CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(b) AS BIGINT) AS cb
  FROM tagged GROUP BY v
), run AS (
  SELECT v, ca, cb,
         SUM(ca) OVER w AS cale,
         SUM(cb) OVER w AS cble,
         SUM(CAST(CAST(v AS DECIMAL(28,6)) * ca AS DECIMAL(38,12))) OVER w
           AS sale,
         SUM(CAST(CAST(v AS DECIMAL(28,6)) * cb AS DECIMAL(38,12))) OVER w
           AS sble
  FROM support
  WINDOW w AS (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), gaps AS (
  SELECT ca, cb,
    CAST(CAST(CAST(v AS DECIMAL(28,6)) * ca AS DECIMAL(38,12))
         * (cale - ca)
         - CAST(sale - CAST(CAST(v AS DECIMAL(28,6)) * ca
                            AS DECIMAL(38,12)) AS DECIMAL(38,12)) * ca
         AS DECIMAL(38,12)) AS aa,
    CAST(CAST(CAST(v AS DECIMAL(28,6)) * cb AS DECIMAL(38,12))
         * (cble - cb)
         - CAST(sble - CAST(CAST(v AS DECIMAL(28,6)) * cb
                            AS DECIMAL(38,12)) AS DECIMAL(38,12)) * cb
         AS DECIMAL(38,12)) AS bb,
    CAST(CAST(CAST(v AS DECIMAL(28,6)) * cb AS DECIMAL(38,12))
         * (cale - ca)
         - CAST(sale - CAST(CAST(v AS DECIMAL(28,6)) * ca
                            AS DECIMAL(38,12)) AS DECIMAL(38,12)) * cb
         + CAST(CAST(v AS DECIMAL(28,6)) * ca AS DECIMAL(38,12))
         * (cble - cb)
         - CAST(sble - CAST(CAST(v AS DECIMAL(28,6)) * cb
                            AS DECIMAL(38,12)) AS DECIMAL(38,12)) * ca
         AS DECIMAL(38,12)) AS ab
  FROM run
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(SUM(CAST(aa AS DECIMAL(38,12))) AS DOUBLE) AS saa,
         CAST(SUM(CAST(bb AS DECIMAL(38,12))) AS DOUBLE) AS sbb,
         CAST(SUM(CAST(ab AS DECIMAL(38,12))) AS DOUBLE) AS sab
  FROM gaps
)
SELECT n_a, n_b,
       ROUND(sab / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
         AS e_cross,
       ROUND(2.0 * saa / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)), 6)
         AS e_within_a,
       ROUND(2.0 * sbb / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
         AS e_within_b,
       ROUND(2.0 * (sab / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
             - (2.0 * saa / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)))
             - (2.0 * sbb / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))), 6)
         AS energy_dist
FROM tot
"""

EXT13_QUERIES.update({"x302_energy_distance": q_x302_energy_distance})
EXT13_ORACLES.update({"x302_energy_distance": SQL_X302})


# ----------------------------- x303: CV fold assignment + stats


def q_x303_cv_folds(spark, sf_dir):
    """Deterministic unit-level 5-fold CV split over event users with
    per-fold and leave-one-fold-out means
    (operators/mixing.py:cv_fold_stats) — the no-leakage split + drift
    sanity check a training pipeline runs before spending a run."""
    from .operators.mixing import cv_fold_stats
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    return cv_fold_stats(
        ev.where(F.col("value").isNotNull()), "user_id", "value", k=5
    )


SQL_X303 = """
WITH rows_ AS (
  SELECT ('0x' || substr(md5('cv:' || CAST(user_id AS VARCHAR)),
          1, 8))::BIGINT % 5 AS fold,
         user_id, CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
), per_fold AS (
  SELECT fold,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_units,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         SUM(CAST(v AS DECIMAL(38,12))) AS s
  FROM rows_ GROUP BY fold
), grand AS (
  SELECT SUM(n_rows) AS tn, SUM(CAST(s AS DECIMAL(38,12))) AS ts
  FROM per_fold
)
SELECT fold, n_units, n_rows,
       ROUND(CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS fold_mean,
       ROUND(CAST(ts - s AS DOUBLE) / CAST(tn - n_rows AS DOUBLE), 6)
         AS loo_mean
FROM per_fold CROSS JOIN grand
ORDER BY fold
"""

EXT13_QUERIES.update({"x303_cv_folds": q_x303_cv_folds})
EXT13_ORACLES.update({"x303_cv_folds": SQL_X303})


# ----------------------------- x304: HBOS outlier scores


def q_x304_hbos(spark, sf_dir):
    """Histogram-based outlier scores over lineitem numerics
    (operators/quality.py:hbos_scores, 16 bins): top-20 rows whose
    (quantity, extendedprice, discount) all sit in thin histogram
    bins — the O(n) outlier pass before anything quadratic."""
    from .operators.quality import hbos_scores

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keyed = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("row_id"),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    return hbos_scores(
        keyed,
        "row_id",
        ["l_quantity", "l_extendedprice", "l_discount"],
        bins=16,
        top_n=20,
    ).select(F.col("id").alias("row_id"), "score")


def _sql_x304() -> str:
    feats = ["l_quantity", "l_extendedprice", "l_discount"]
    binexprs = []
    for i, c in enumerate(feats):
        binexprs.append(
            f"COALESCE(LEAST(GREATEST(CAST(FLOOR((CAST({c} AS DOUBLE) - lo{i})"
            f" / NULLIF((hi{i} - lo{i}) / 16, 0)) AS BIGINT), 0), 15), 0)"
            f" AS b{i}"
        )
    bins = ",\n         ".join(binexprs)
    rngsel = ", ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS lo{i}, MAX(CAST({c} AS DOUBLE)) AS hi{i}"
        for i, c in enumerate(feats)
    )
    hists = "\n".join(
        f"h{i} AS (SELECT b{i} AS hb{i}, CAST(COUNT(*) AS BIGINT) AS hc{i} "
        f"FROM binned GROUP BY b{i}),"
        for i in range(len(feats))
    )
    joins = " ".join(f"JOIN h{i} ON binned.b{i} = h{i}.hb{i}"
                     for i in range(len(feats)))
    terms = " + ".join(
        f"CAST(ROUND(-log10(CAST(hc{i} AS DOUBLE) / CAST(nt AS DOUBLE)), 9)"
        f" AS DECIMAL(28,12))"
        for i in range(len(feats))
    )
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in feats)
    return f"""
WITH base AS (
  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS row_id,
         l_quantity, l_extendedprice, l_discount
  FROM lineitem WHERE {notnull}
), rng AS (
  SELECT {rngsel} FROM base
), binned AS (
  SELECT row_id,
         {bins}
  FROM base CROSS JOIN rng
),
{hists}
nt_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM binned)
SELECT row_id, ROUND(CAST({terms} AS DOUBLE), 6) AS score
FROM binned {joins} CROSS JOIN nt_
ORDER BY score DESC, row_id ASC
LIMIT 20
"""


EXT13_QUERIES.update({"x304_hbos": q_x304_hbos})
EXT13_ORACLES.update({"x304_hbos": _sql_x304()})


# ----------------------------- x305: count-sketch estimates

_CSK_PROBES = ["spark", "table", "the", "vector", "query", "zzz_absent"]
_CSK_DEPTH, _CSK_WIDTH = 5, 64


def q_x305_countsketch(spark, sf_dir):
    """Count-sketch (signed-median) frequency estimates over the
    document token stream (operators/sketch.py:countsketch_estimate,
    5×64): the unbiased companion to count-min (x35) — collisions
    cancel instead of inflating.  Every signed counter is md5-derived
    column algebra, so the oracle rebuilds the sketch in SQL."""
    from .operators.sketch import countsketch_estimate
    from .operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("word"))
    return countsketch_estimate(
        words, "word", _CSK_PROBES, depth=_CSK_DEPTH, width=_CSK_WIDTH
    )


def _sql_x305() -> str:
    w = _CSK_WIDTH

    def bucket(expr: str, r: int) -> str:
        return (
            f"('0x' || substr(md5('csk:{r}:' || {expr}), 1, 8))::BIGINT"
            f" % {w}"
        )

    def sign(expr: str, r: int) -> str:
        return (
            f"(1 - 2 * (('0x' || substr(md5('csks:{r}:' || {expr}), 1, 8))"
            f"::BIGINT % 2))"
        )

    cell_rows = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, {bucket('word', r)} AS bucket,"
        f" {sign('word', r)} AS s FROM words"
        for r in range(_CSK_DEPTH)
    )
    key_rows = "\n  UNION ALL ".join(
        f"SELECT term, {r} AS r, {bucket('term', r)} AS bucket,"
        f" {sign('term', r)} AS s FROM probes"
        for r in range(_CSK_DEPTH)
    )
    probe_list = ", ".join(f"'{p}'" for p in _CSK_PROBES)
    return f"""
WITH t AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), words AS (
  SELECT unnest(string_split(nt, ' ')) AS word FROM t WHERE nt <> ''
), cells AS (
  {cell_rows}
), sk AS (
  SELECT r, bucket, CAST(SUM(s) AS BIGINT) AS c
  FROM cells GROUP BY 1, 2
), probes AS (
  SELECT unnest([{probe_list}]) AS term
), keys AS (
  {key_rows}
), est AS (
  SELECT term,
         CAST(list_sort(list(keys.s * COALESCE(sk.c, 0)))
              [{_CSK_DEPTH // 2 + 1}] AS BIGINT) AS est_n
  FROM keys LEFT JOIN sk USING (r, bucket) GROUP BY term
), tr AS (
  SELECT word AS term, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM words WHERE word IN ({probe_list}) GROUP BY 1
)
SELECT est.term,
       CAST(COALESCE(tr.true_n, 0) AS BIGINT) AS true_n,
       est.est_n
FROM est LEFT JOIN tr ON est.term = tr.term
ORDER BY est.term
"""


EXT13_QUERIES.update({"x305_countsketch": q_x305_countsketch})
EXT13_ORACLES.update({"x305_countsketch": _sql_x305()})


# ----------------------------- x306: UniMax mixing allocation

_UNIMAX_BUDGET, _UNIMAX_EPOCHS = 270_000.0, 2.0


def q_x306_unimax(spark, sf_dir):
    """UniMax corpus-mixing allocation across document sources
    (operators/mixing.py:unimax_plan): water-fill a 270k-char budget
    uniformly subject to a 2-epoch per-source repeat cap — the
    closed-form window pass, no iteration."""
    from .operators.mixing import unimax_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select("source", F.length("text").alias("n_chars"))
    return unimax_plan(
        sized, "source", "n_chars",
        budget=_UNIMAX_BUDGET, max_epochs=_UNIMAX_EPOCHS,
    )


SQL_X306 = f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(CAST(length(text) AS DECIMAL(28,2))) AS DOUBLE)
           AS n_tokens
  FROM documents GROUP BY source
), sized AS (
  -- tie-safe 6-dp rounds mirror unimax_plan's explicit *1e6 idiom
  -- (identical rounding-input double on both engines)
  SELECT source, n_tokens,
         ROUND(n_tokens * {_UNIMAX_EPOCHS!r} * 1000000.0) / 1000000.0
           AS cap
  FROM per_src
), ranked AS (
  SELECT source, n_tokens, cap,
         ROW_NUMBER() OVER w AS i,
         COUNT(*) OVER () AS n,
         COALESCE(SUM(CAST(cap AS DECIMAL(38,6))) OVER
                  (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  CAST(0 AS DECIMAL(38,6))) AS prefix
  FROM sized
  WINDOW w AS (ORDER BY cap ASC, source ASC)
), stepped AS (
  SELECT source, n_tokens, cap,
         MAX(ROUND(({_UNIMAX_BUDGET!r} - CAST(prefix AS DOUBLE))
                   / CAST(n - i + 1 AS DOUBLE) * 1000000.0)
             / 1000000.0) OVER () AS share
  FROM ranked
), alloc AS (
  SELECT source, n_tokens, cap,
         ROUND(LEAST(cap, GREATEST(share, 0.0)) * 1000000.0)
           / 1000000.0 AS alloc
  FROM stepped
)
SELECT source,
       ROUND(n_tokens, 6) AS n_tokens,
       ROUND(cap, 6) AS cap,
       alloc,
       ROUND(alloc / n_tokens * 1000000.0) / 1000000.0 AS epochs,
       ROUND(alloc / {_UNIMAX_BUDGET!r} * 1000000.0) / 1000000.0
         AS budget_frac
FROM alloc
ORDER BY source
"""

EXT13_QUERIES.update({"x306_unimax": q_x306_unimax})
EXT13_ORACLES.update({"x306_unimax": SQL_X306})


# ----------------------------- x308: greedy k-center coreset

_KCENTER_K = 8


def q_x308_kcenter(spark, sf_dir):
    """Greedy k-center coreset over the embedding corpus
    (operators/similarity.py:kcenter_greedy, k=8): the max-min
    farthest-point sweep — k bounded 1-row argmax pins, distances
    re-derived from broadcast literals each round.  The oracle chains
    k argmax stages in SQL."""
    from .operators.similarity import kcenter_greedy

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kcenter_greedy(emb, k=_KCENTER_K)


def _sql_x308() -> str:
    k = _KCENTER_K

    def sqd(vexpr: str, cexpr: str) -> str:
        return (
            f"ROUND(list_reduce(list_transform(range(1, 65), i -> "
            f"({vexpr}[CAST(i AS INTEGER)] - {cexpr}[CAST(i AS INTEGER)])"
            f" * ({vexpr}[CAST(i AS INTEGER)] - {cexpr}[CAST(i AS INTEGER)])"
            f"), (acc, x) -> acc + x), 9)"
        )

    parts = [
        "WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec"
        " FROM embeddings)",
        "c0 AS (SELECT id, vec FROM v ORDER BY id ASC LIMIT 1)",
        f"d0 AS (SELECT v.id, v.vec, {sqd('v.vec', 'c.vec')} AS d"
        " FROM v CROSS JOIN c0 c)",
    ]
    for r in range(1, k):
        parts.append(
            f"p{r} AS (SELECT id, vec, d FROM d{r - 1}"
            f" ORDER BY d DESC, id ASC LIMIT 1)"
        )
        if r < k - 1 or True:
            parts.append(
                f"d{r} AS (SELECT s.id, s.vec,"
                f" LEAST(s.d, {sqd('s.vec', 'p.vec')}) AS d"
                f" FROM d{r - 1} s CROSS JOIN p{r} p)"
            )
    rows = [
        "SELECT CAST(0 AS BIGINT) AS round,"
        " CAST((SELECT id FROM c0) AS BIGINT) AS center_id,"
        " ROUND((SELECT d FROM p1), 6) AS cover_radius"
    ]
    for r in range(1, k - 1):
        rows.append(
            f"SELECT CAST({r} AS BIGINT),"
            f" CAST((SELECT id FROM p{r}) AS BIGINT),"
            f" ROUND((SELECT d FROM p{r + 1}), 6)"
        )
    rows.append(
        f"SELECT CAST({k - 1} AS BIGINT),"
        f" CAST((SELECT id FROM p{k - 1}) AS BIGINT),"
        f" ROUND((SELECT MAX(d) FROM d{k - 1}), 6)"
    )
    return (
        ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)
        + "\nORDER BY round"
    )


EXT13_QUERIES.update({"x308_kcenter": q_x308_kcenter})
EXT13_ORACLES.update({"x308_kcenter": _sql_x308()})


# ----------------------------- x309: grid-density clusters

_GRID_G, _GRID_MINPTS = 16, 40


def q_x309_grid_clusters(spark, sf_dir):
    """Grid-DBSCAN density clustering of orders in (totalprice,
    order-day) space (operators/graph.py:grid_density_clusters, 16×16
    grid, min_pts=40): binning is map-side, the component merge runs
    on the ≤256-cell graph — density clustering that never joins
    points.  The oracle closes the cell adjacency with a recursive
    CTE (test-scale only; the operator is the 100 TB path)."""
    from .operators.graph import grid_density_clusters

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    feats = orders.select(
        F.col("o_totalprice").cast("double").alias("price"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("double")
        .alias("day"),
    )
    return grid_density_clusters(
        feats, "price", "day", grid=_GRID_G, min_pts=_GRID_MINPTS
    )


SQL_X309 = f"""
WITH RECURSIVE base AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x,
         CAST(datediff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE)) AS DOUBLE) AS y
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
), rng AS (
  SELECT MIN(x) AS xlo, MAX(x) AS xhi, MIN(y) AS ylo, MAX(y) AS yhi
  FROM base
), cells AS (
  SELECT COALESCE(LEAST(GREATEST(CAST(FLOOR((x - xlo)
           / NULLIF((xhi - xlo) / {_GRID_G}, 0)) AS BIGINT), 0),
           {_GRID_G - 1}), 0) AS gx,
         COALESCE(LEAST(GREATEST(CAST(FLOOR((y - ylo)
           / NULLIF((yhi - ylo) / {_GRID_G}, 0)) AS BIGINT), 0),
           {_GRID_G - 1}), 0) AS gy
  FROM base CROSS JOIN rng
), counted AS (
  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_pts
  FROM cells GROUP BY gx, gy
), core AS (
  SELECT CAST(gx * {_GRID_G} + gy AS BIGINT) AS cell_id, gx, gy, n_pts
  FROM counted WHERE n_pts >= {_GRID_MINPTS}
), edges AS (
  SELECT a.cell_id AS ea, b.cell_id AS eb
  FROM core a JOIN core b
    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
   AND a.cell_id <> b.cell_id
), reach AS (
  -- transitive closure over the bounded core-cell graph
  SELECT cell_id AS a, cell_id AS b FROM core
  UNION
  SELECT r.a, e.eb
  FROM reach r JOIN edges e ON r.b = e.ea
), lab AS (
  SELECT a AS cell_id, MIN(b) AS cluster FROM reach GROUP BY a
), labeled AS (
  SELECT c.cell_id, c.gx, c.gy, c.n_pts, l.cluster
  FROM core c JOIN lab l ON l.cell_id = c.cell_id
), per_cluster AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_cells,
         CAST(SUM(n_pts) AS BIGINT) AS cluster_pts
  FROM labeled GROUP BY cluster
)
SELECT labeled.cell_id, labeled.gx, labeled.gy, labeled.n_pts,
       CAST(labeled.cluster AS BIGINT) AS cluster,
       per_cluster.cluster_cells, per_cluster.cluster_pts
FROM labeled JOIN per_cluster USING (cluster)
ORDER BY cell_id
"""

EXT13_QUERIES.update({"x309_grid_clusters": q_x309_grid_clusters})
EXT13_ORACLES.update({"x309_grid_clusters": SQL_X309})


# ----------------------------- x310: Qini uplift curve


def q_x310_qini(spark, sf_dir):
    """Qini uplift deciles over event users
    (operators/behavior.py:qini_curve): hash-assigned A/B arms,
    outcome = made-a-purchase, targeting score = per-user mean event
    value — the incremental-conversions-at-budget curve vs the
    no-model straight line."""
    from .operators.behavior import qini_curve
    from .operators.sketch import _hash64
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.sum(
                F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(25,12)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y"),
    )
    units = per_user.select(
        (_hash64(F.col("user_id"), "arm") % 2).cast("int").alias("t"),
        "y",
        "score",
    )
    return qini_curve(units, "t", "y", "score", n_bins=10)


SQL_X310 = """
WITH per_user AS (
  SELECT user_id,
         ROUND(CAST(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(25,12)))
               AS DOUBLE) / COUNT(*), 6) AS score,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), units AS (
  SELECT ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)),
          1, 8))::BIGINT % 2 AS t,
         y, score
  FROM per_user
), cells AS (
  SELECT score AS s,
         CAST(SUM(t) AS BIGINT) AS nt,
         CAST(SUM(1 - t) AS BIGINT) AS nc,
         SUM(CAST(CASE WHEN t = 1 THEN CAST(y AS DOUBLE) ELSE 0.0 END
             AS DECIMAL(38,12))) AS yt,
         SUM(CAST(CASE WHEN t = 0 THEN CAST(y AS DOUBLE) ELSE 0.0 END
             AS DECIMAL(38,12))) AS yc
  FROM units GROUP BY score
), tot AS (SELECT SUM(nt + nc) AS n FROM cells),
binned AS (
  SELECT CAST(1 + (COALESCE(SUM(nt + nc) OVER
           (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) * 10) // n AS BIGINT) AS bin,
         nt, nc, yt, yc
  FROM cells CROSS JOIN tot
), per_bin AS (
  SELECT bin,
         CAST(SUM(nt) AS BIGINT) AS bnt, CAST(SUM(nc) AS BIGINT) AS bnc,
         SUM(CAST(yt AS DECIMAL(38,12))) AS byt,
         SUM(CAST(yc AS DECIMAL(38,12))) AS byc
  FROM binned GROUP BY bin
), cum AS (
  SELECT bin,
         CAST(SUM(bnt) OVER wc AS BIGINT) AS n_treat_cum,
         CAST(SUM(bnc) OVER wc AS BIGINT) AS n_ctrl_cum,
         SUM(CAST(byt AS DECIMAL(38,12))) OVER wc AS yt_cum,
         SUM(CAST(byc AS DECIMAL(38,12))) OVER wc AS yc_cum,
         CAST(SUM(bnt) OVER () AS BIGINT) AS ntt,
         CAST(SUM(bnc) OVER () AS BIGINT) AS nct,
         SUM(CAST(byt AS DECIMAL(38,12))) OVER () AS ytt,
         SUM(CAST(byc AS DECIMAL(38,12))) OVER () AS yct
  FROM per_bin
  WINDOW wc AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW)
)
SELECT bin, n_treat_cum, n_ctrl_cum,
       ROUND(CAST(yt_cum AS DOUBLE), 6) AS y_treat_cum,
       ROUND(CAST(yc_cum AS DOUBLE), 6) AS y_ctrl_cum,
       ROUND((CAST(yt_cum AS DOUBLE)
              - CAST(yc_cum AS DOUBLE) * CAST(n_treat_cum AS DOUBLE)
                / NULLIF(CAST(n_ctrl_cum AS DOUBLE), 0))
             * 1000000.0) / 1000000.0 AS qini,
       ROUND((CAST(ytt AS DOUBLE)
              - CAST(yct AS DOUBLE) * CAST(ntt AS DOUBLE)
                / NULLIF(CAST(nct AS DOUBLE), 0))
             * (CAST(n_treat_cum + n_ctrl_cum AS DOUBLE)
                / CAST(ntt + nct AS DOUBLE))
             * 1000000.0) / 1000000.0 AS qini_random
FROM cum
ORDER BY bin
"""

EXT13_QUERIES.update({"x310_qini": q_x310_qini})
EXT13_ORACLES.update({"x310_qini": SQL_X310})


# ----------------------------- x311: scan-time image dimensions


def q_x311_media_dims(spark, sf_dir):
    """Scan-time image dimension sniffing
    (operators/multimodal.py:image_dimensions): every document renders
    a real image payload — PNG (even doc_id) or BMP (odd) — with
    dimensions derived from the doc_id (w = 1 + id%13, h = 1 + id%7),
    and the JVM-side header probe (pure substring/hex/conv column
    algebra, zero decode, zero Python) must read those exact numbers
    back.  The oracle never sees the bytes: it recomputes the
    dimension formula — an exact match proves encode → header-sniff
    is lossless for both byte orders (PNG big-endian, BMP little-
    endian bottom-up)."""
    from .operators.multimodal import (
        attach_media_metadata, encode_bmp_bytes, encode_png_bytes,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = docs.select(F.col("doc_id").cast("long").alias("doc_id"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 1 + i % 13, 1 + i % 7
                gray = np.full((h, w), i % 256, dtype=np.uint8)
                payloads.append(
                    encode_png_bytes(gray, color_type=2)
                    if i % 2 == 0
                    else encode_bmp_bytes(gray)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_payload = staged.mapInPandas(encode, schema=_PNG_PAYLOAD_SCHEMA)
    out = attach_media_metadata(with_payload, "payload")
    return out.select(
        "doc_id",
        F.col("media.kind").alias("kind"),
        F.col("media.mime").alias("mime"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"),
    ).orderBy("doc_id")


SQL_X311 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'image' AS kind,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END
         AS mime,
       CAST(1 + doc_id % 13 AS INTEGER) AS width,
       CAST(1 + doc_id % 7 AS INTEGER) AS height
FROM documents
ORDER BY doc_id
"""

EXT13_QUERIES.update({"x311_media_dims": q_x311_media_dims})
EXT13_ORACLES.update({"x311_media_dims": SQL_X311})


# ----------------------------- x312: scan-time WAV params


def q_x312_wav_params(spark, sf_dir):
    """Scan-time audio parameter sniffing
    (operators/multimodal.py:audio_params): every document renders a
    canonical PCM16 mono WAV with rate = 8000 + (id%4)·4000 and
    50 + id%100 samples; the JVM-side header probe (pure column
    algebra, zero decode) must read the exact sample rate and the
    exact integer-division duration back.  Formula oracle — the SQL
    never sees the bytes."""
    from .operators.multimodal import attach_media_metadata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = docs.select(F.col("doc_id").cast("long").alias("doc_id"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rate = 8000 + (i % 4) * 4000
                n = 50 + i % 100
                data = b"".join(
                    struct.pack("<h", ((i + j) % 200) - 100) for j in range(n)
                )
                fmt = struct.pack(
                    "<HHIIHH", 1, 1, rate, rate * 2, 2, 16
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_payload = staged.mapInPandas(encode, schema=_PNG_PAYLOAD_SCHEMA)
    out = attach_media_metadata(with_payload, "payload")
    return out.select(
        "doc_id",
        F.col("media.kind").alias("kind"),
        F.col("media.sample_rate").alias("sample_rate"),
        F.col("media.duration_ms").alias("duration_ms"),
    ).orderBy("doc_id")


SQL_X312 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'audio' AS kind,
       CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
       CAST((2 * (50 + doc_id % 100) * 1000)
            // (2 * (8000 + (doc_id % 4) * 4000)) AS BIGINT)
         AS duration_ms
FROM documents
ORDER BY doc_id
"""

EXT13_QUERIES.update({"x312_wav_params": q_x312_wav_params})
EXT13_ORACLES.update({"x312_wav_params": SQL_X312})


# ----------------------------- x314: UCB1 bandit allocation audit


def q_x314_ucb(spark, sf_dir):
    """UCB1 allocation audit over event-type arms
    (operators/behavior.py:ucb_allocation): per-arm mean value +
    exploration bonus, which arm a UCB policy pulls next, and each
    arm's realized-regret contribution — the adaptive-experiment
    readout beside the fixed-split A/B family."""
    from .operators.behavior import ucb_allocation
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    return ucb_allocation(ev, "event_type", "value", c=2.0)


SQL_X314 = """
WITH per_arm AS (
  SELECT CAST(event_type AS VARCHAR) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(38,12)))
              AS DOUBLE) / COUNT(*) AS m
  FROM events WHERE value IS NOT NULL GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, MAX(m) AS best FROM per_arm
), scored AS (
  SELECT arm, n,
         ROUND(m * 1000000.0) / 1000000.0 AS mean_reward,
         ROUND(sqrt(2.0 * ROUND(ln(CAST(nn AS DOUBLE)), 9)
                    / CAST(n AS DOUBLE)) * 1000000.0) / 1000000.0
           AS bonus,
         ROUND((m + sqrt(2.0 * ROUND(ln(CAST(nn AS DOUBLE)), 9)
                    / CAST(n AS DOUBLE))) * 1000000.0) / 1000000.0
           AS ucb,
         ROUND((best - m) * CAST(n AS DOUBLE) * 1000000.0) / 1000000.0
           AS regret_contrib
  FROM per_arm CROSS JOIN tot
), mu AS (SELECT MAX(ucb) AS mu FROM scored),
ba AS (
  SELECT MIN(arm) AS ba FROM scored CROSS JOIN mu WHERE ucb = mu
)
SELECT arm, n, mean_reward, bonus, ucb,
       arm = ba AS play_next,
       regret_contrib
FROM scored CROSS JOIN ba
ORDER BY arm
"""

EXT13_QUERIES.update({"x314_ucb": q_x314_ucb})
EXT13_ORACLES.update({"x314_ucb": SQL_X314})


# ----------------------------- x315: k-arm best-arm probability


def q_x315_best_arm(spark, sf_dir):
    """Posterior P(best) across the five event-type arms
    (operators/behavior.py:best_arm_probability): Beta-Binomial
    posteriors of the value≥50 conversion rate on the shared 400-point
    grid, half-tie competitor products — the k-arm quantity a
    Thompson allocator needs that pairwise x281 readouts can't
    compose into."""
    from .operators.behavior import best_arm_probability
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    arms = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("value") >= 50.0, 1).otherwise(0)
        ).cast("long").alias("s"),
    )
    return best_arm_probability(arms, grid=400)


SQL_X315 = """
WITH arms AS (
  SELECT CAST(event_type AS VARCHAR) AS arm,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS DOUBLE)
           AS s
  FROM events GROUP BY 1
), grid AS (
  SELECT CAST(r AS BIGINT) AS j,
         (2.0 * r + 1.0) / 800.0 AS p
  FROM (SELECT unnest(range(0, 400)) AS r)
), gridded AS (
  SELECT arm, n, s, j, p,
         (s + 0.0) * ln(p) + (n - s + 0.0) * ln(1.0 - p) AS lw
  FROM arms CROSS JOIN grid
), shifted AS (
  SELECT arm, n, s, j,
         ROUND(exp(ROUND(lw - MAX(lw) OVER (PARTITION BY arm), 9)), 12)
           AS w
  FROM gridded
), normed AS (
  SELECT arm, n, s, j,
         w / CAST(SUM(CAST(w AS DECIMAL(38,18)))
                  OVER (PARTITION BY arm) AS DOUBLE) AS pp
  FROM shifted
), staged AS (
  SELECT arm, n, s, j, pp,
         COALESCE(CAST(SUM(CAST(pp AS DECIMAL(38,18))) OVER
           (PARTITION BY arm ORDER BY j
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS DOUBLE), 0.0) + 0.5 * pp AS gg
  FROM staged_src
), per_j AS (
  SELECT j,
         list(struct_pack(arm := arm, pp := pp, gg := gg)
              ORDER BY arm) AS arr
  FROM staged GROUP BY j
), exploded AS (
  SELECT j, arr, unnest(arr) AS me FROM per_j
), terms AS (
  SELECT me.arm AS arm,
         CAST(ROUND(me.pp * list_reduce(
                list_transform(
                  list_filter(arr, x -> x.arm != me.arm),
                  x -> x.gg),
                (a, b) -> a * b), 15) AS DECIMAL(38,18)) AS t
  FROM exploded
), summed AS (
  SELECT arm, CAST(SUM(t) AS DOUBLE) AS pb FROM terms GROUP BY arm
)
SELECT arms.arm,
       CAST(arms.n AS BIGINT) AS n,
       CAST(arms.s AS BIGINT) AS s,
       ROUND((arms.s + 1.0) / (arms.n + 2.0) * 1000000.0) / 1000000.0
         AS post_mean,
       ROUND(pb * 1000000.0) / 1000000.0 AS p_best
FROM arms JOIN summed USING (arm)
ORDER BY arms.arm
"""

# the staged CTE references normed — rename for DuckDB (no forward refs)
SQL_X315 = SQL_X315.replace("FROM staged_src", "FROM normed")

EXT13_QUERIES.update({"x315_best_arm": q_x315_best_arm})
EXT13_ORACLES.update({"x315_best_arm": SQL_X315})
