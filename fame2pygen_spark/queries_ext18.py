"""Round-8 extension queries (x387+): progressive-JPEG ingest and the
round's later operator families.

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

EXT18_QUERIES: dict = {}
EXT18_ORACLES: dict = {}


# --------------------- x387: progressive JPEG decode → perceptual hash

_PROG_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def q_x387_progressive_jpeg(spark, sf_dir):
    """REAL progressive-JPEG (SOF2) decode end to end
    (operators/multimodal.py:encode_jpeg_coeffs_progressive →
    _decode_jpeg → image_ahash): the x334 construction re-encoded
    through the T.81 Annex G scan ladder — DC first scan at Al=1,
    per-band AC scans (EOB runs), the AC refinement pass, then the DC
    refinement bit — with the frame variant rotating gray / YCbCr
    4:4:4 / YCbCr 4:2:0 by ``doc_id % 3`` and every fifth document
    adding restart markers inside every scan.  DC-only blocks at
    quant step 8 keep the decode bit-exact across the
    successive-approximation accumulation, so the oracle derives the
    hash arithmetically from the pixel definition without seeing the
    bytes: an exact match proves the multi-scan coefficient store
    (spectral selection + successive approximation + EOB-run logic)
    is lossless for all three layouts.  Closes the r7 verdict's
    progressive-JPEG stub (multimodal.py decode_image is now
    WebP-only); the baseline↔progressive differential pytest covers
    the nonzero-AC surface the flat fixtures can't."""
    from .operators.multimodal import (
        encode_progressive_jpeg_bytes, image_ahash,
    )
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
                blocks = np.asarray(list(px), dtype=np.uint8).reshape(8, 8)
                mode = ("gray", "ycbcr444", "ycbcr420")[int(doc_id) % 3]
                ri = 2 if int(doc_id) % 5 == 0 else 0
                payloads.append(
                    encode_progressive_jpeg_bytes(
                        blocks, mode=mode, restart_interval=ri
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_jpg = staged.mapInPandas(encode, schema=_PROG_PAYLOAD_SCHEMA)
    return image_ahash(with_jpg, "doc_id", "payload")


def _sql_x387() -> str:
    # identical arithmetic oracle to x334: the hash is a pure function
    # of the 64 fingerprint bytes and the 64×64 decoded dimensions
    from .queries_ext16 import _sql_x334

    return _sql_x334()


EXT18_QUERIES.update({"x387_progressive_jpeg": q_x387_progressive_jpeg})
EXT18_ORACLES.update({"x387_progressive_jpeg": _sql_x387()})


# ------------------------- x388: lossless WebP decode → perceptual hash


def q_x388_webp_ahash(spark, sf_dir):
    """REAL lossless-WebP (VP8L) decode end to end
    (operators/webp.py → decode_image_bytes → image_ahash): each
    document's 8×8 fingerprint (the x84 pixel definition) encoded as
    a genuine VP8L stream inside Arrow-batched ``mapInPandas``, with
    ``doc_id`` rotating the bitstream features so every decoder path
    runs over the corpus — plain literals, subtract-green, a uniform
    predictor transform, a ≤256-color palette (color-indexing), a
    color cache with row-repeat LZ77 references, the color transform,
    and a meta-prefix group table.  VP8L is integer-exact, so the
    oracle derives the hash arithmetically from the pixel definition
    (x84's oracle verbatim: the image IS 8×8, the thumbnail is the
    identity): an exact match proves prefix-decode → LZ77/cache →
    inverse transforms is lossless for every variant.  Shrinks the
    codec boundary declared "env-limited" in r7 to lossy VP8 only."""
    from .operators.multimodal import image_ahash
    from .operators.webp import encode_webp_lossless
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
                g = np.asarray(list(px), dtype=np.uint8).reshape(8, 8)
                img = np.stack(
                    [g, g, g, np.full_like(g, 255)], axis=2
                )
                variant = int(doc_id) % 6
                kw = [
                    {},
                    {"use_subtract_green": True},
                    {"predictor_mode": 11},
                    {"palette": True},
                    {"cache_bits": 4, "lz77_rows": True},
                    {"color_transform": (40, 200, 17),
                     "meta_prefix": True},
                ][variant]
                payloads.append(encode_webp_lossless(img, **kw))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_webp = staged.mapInPandas(encode, schema=_PROG_PAYLOAD_SCHEMA)
    return image_ahash(with_webp, "doc_id", "payload")


def _sql_x388() -> str:
    # the VP8L image is the 8×8 fingerprint itself — x84's oracle
    # applies verbatim (8×8 dims, identity thumbnail)
    from .queries_ext2 import _sql_x84

    return _sql_x84()


EXT18_QUERIES.update({"x388_webp_ahash": q_x388_webp_ahash})
EXT18_ORACLES.update({"x388_webp_ahash": _sql_x388()})


# ---------------- x389: cross-document repeated-span extents


def q_x389_repeated_spans(spark, sf_dir):
    """Maximal cross-document shared token spans
    (operators/text.py:repeated_span_extents): the ExactSubstr dedup
    criterion of Lee et al. 2022 in EXTENT form — which spans, between
    which document pairs, how long — via positional 8-shingle
    fingerprints, a frequency-capped fingerprint equi-join, and the
    gaps-and-islands diagonal merge in a (pair, diagonal)-keyed
    window.  Integer-only output; the oracle replays the identical
    construction with DuckDB window functions."""
    from .operators.text import repeated_span_extents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repeated_span_extents(
        docs, "text", "doc_id", k=8, max_gram_docs=20,
        min_span_tokens=10,
    ).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        F.col("diag").cast("long").alias("diag"),
        "start_a", "start_b", "matched_grams", "span_tokens",
    )


SQL_X389 = """
WITH t AS (
  SELECT doc_id AS doc,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), p AS (
  SELECT doc, i - 1 AS pos,
         array_to_string(toks[i : i + 7], ' ') AS g
  FROM t, unnest(range(1, len(toks) - 8 + 2)) AS u(i)
  WHERE len(toks) >= 8
), f AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc) AS nd FROM p GROUP BY g
  ) WHERE nd BETWEEN 2 AND 20
), o AS (
  SELECT p.* FROM p JOIN f USING (g)
), pr AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b,
         a.pos - b.pos AS diag, a.pos AS pos_a, b.pos AS pos_b
  FROM o a JOIN o b USING (g)
  WHERE a.doc < b.doc
), isl AS (
  SELECT *, pos_a - ROW_NUMBER() OVER (
    PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
  FROM pr
)
SELECT CAST(doc_a AS BIGINT) AS doc_a,
       CAST(doc_b AS BIGINT) AS doc_b,
       CAST(diag AS BIGINT) AS diag,
       CAST(MIN(pos_a) AS BIGINT) AS start_a,
       CAST(MIN(pos_b) AS BIGINT) AS start_b,
       CAST(COUNT(*) AS BIGINT) AS matched_grams,
       CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
FROM isl
GROUP BY doc_a, doc_b, diag, island
HAVING COUNT(*) + 7 >= 10
"""


EXT18_QUERIES.update({"x389_repeated_spans": q_x389_repeated_spans})
EXT18_ORACLES.update({"x389_repeated_spans": SQL_X389})


# ---------------- x390: isotonic regression (pool-adjacent-violators)


def q_x390_isotonic(spark, sf_dir):
    """Isotonic least-squares fit of each nation's monthly revenue
    series (operators/ml.py:pav_fit): EXACT full-resolution
    pool-adjacent-violators (vs x318's 16-bin minimax variant) in
    the entity-keyed Arrow lane.  The oracle replays PAV as a
    recursive-CTE STATE MACHINE — one block push or one violating
    merge per recursion step, stack carried as lists (the x336 idiom
    for a data-dependent control flow), with violation tests as
    integer-exact cross-products so both engines take the identical
    branch sequence."""
    from .operators.ml import pav_fit
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return pav_fit(
        base, entity_col="NATION", t_col="T", value_col="REV"
    )


SQL_X390 = """
WITH RECURSIVE x390_base AS (
  SELECT n_name AS e,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), x390_arr AS (
  SELECT e, list(t ORDER BY t) AS ts, list(v ORDER BY t) AS ys,
         CAST(count(*) AS INTEGER) AS n
  FROM x390_base GROUP BY e
), x390_pav AS (
  SELECT e, ts, ys, n, CAST(1 AS INTEGER) AS i,
         [ys[1]] AS ss, [CAST(1.0 AS DOUBLE)] AS ws
  FROM x390_arr
  UNION ALL
  SELECT e, ts, ys, n,
         CASE WHEN viol THEN i ELSE CAST(i + 1 AS INTEGER) END,
         CASE WHEN viol
              THEN ss[1 : m - 2] || [ss[CAST(m - 1 AS INTEGER)] + ss[m]]
              ELSE list_append(ss, ys[CAST(i + 1 AS INTEGER)]) END,
         CASE WHEN viol
              THEN ws[1 : m - 2] || [ws[CAST(m - 1 AS INTEGER)] + ws[m]]
              ELSE list_append(ws, CAST(1.0 AS DOUBLE)) END
  FROM (
    SELECT *, CAST(len(ss) AS INTEGER) AS m,
           (len(ss) >= 2 AND
            ss[CAST(len(ss) AS INTEGER)]
              * ws[CAST(len(ss) - 1 AS INTEGER)]
            < ss[CAST(len(ss) - 1 AS INTEGER)]
              * ws[CAST(len(ss) AS INTEGER)]) AS viol
    FROM x390_pav
  )
  WHERE viol OR i < n
), x390_term AS (
  SELECT * FROM (
    SELECT *, CAST(len(ss) AS INTEGER) AS m,
           (len(ss) >= 2 AND
            ss[CAST(len(ss) AS INTEGER)]
              * ws[CAST(len(ss) - 1 AS INTEGER)]
            < ss[CAST(len(ss) - 1 AS INTEGER)]
              * ws[CAST(len(ss) AS INTEGER)]) AS viol
    FROM x390_pav
  ) WHERE i = n AND NOT viol
)
SELECT e AS entity, CAST(ts[p] AS BIGINT) AS t,
       ROUND(ys[p] * 1000000.0) / 1000000.0 AS value,
       ROUND(ss[j] / ws[j] * 1000000.0) / 1000000.0 AS fit
FROM x390_term,
     unnest(range(1, m + 1)) AS bj(j),
     unnest(range(
       1 + CAST(COALESCE(list_sum(ws[1 : CAST(j - 1 AS INTEGER)]), 0)
                AS INTEGER),
       1 + CAST(COALESCE(list_sum(ws[1 : CAST(j AS INTEGER)]), 0)
                AS INTEGER))) AS bp(p)
ORDER BY entity, t
"""


EXT18_QUERIES.update({"x390_isotonic": q_x390_isotonic})
EXT18_ORACLES.update({"x390_isotonic": SQL_X390})


# ---------------- x391: matrix profile (motif/discord discovery)


def q_x391_matrix_profile(spark, sf_dir):
    """Matrix profile of each nation's monthly revenue series
    (operators/temporal.py:matrix_profile, m=6): nearest-neighbor
    z-normalized subsequence distances as a FULLY DECLARATIVE plan —
    decimal-exact sliding moments, lag-d product diagonals summed in
    (entity, diagonal)-keyed windows, the textbook distance identity
    as one scalar expression, argmin with a total tie order.  The
    oracle is the identical algebra in DuckDB window functions; both
    engines produce bit-equal doubles before the 6-dp round."""
    from .operators.temporal import matrix_profile
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return matrix_profile(
        base, entity_col="NATION", t_col="T", value_col="REV", m=6
    )


SQL_X391 = """
WITH x391_base AS (
  SELECT n_name AS e,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), x391_pos AS (
  SELECT e, ROW_NUMBER() OVER (PARTITION BY e ORDER BY t) - 1 AS p, v
  FROM x391_base
), x391_stats AS (
  SELECT e, p,
         CAST(SUM(CAST(v AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2)))
              OVER w AS DOUBLE) AS s2,
         COUNT(*) OVER w AS cnt
  FROM x391_pos
  WINDOW w AS (PARTITION BY e ORDER BY p
               ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
), x391_st AS (
  SELECT e, p, s1 / 6 AS mu,
         s2 / 6 - (s1 / 6) * (s1 / 6) AS sig2
  FROM x391_stats WHERE cnt = 6
), x391_prods AS (
  SELECT a.e, b.p - a.p AS d, a.p AS k,
         CAST(a.v AS DECIMAL(18,2)) * CAST(b.v AS DECIMAL(18,2)) AS prod
  FROM x391_pos a JOIN x391_pos b
    ON a.e = b.e AND b.p - a.p >= 4
), x391_qt AS (
  SELECT e, k AS i, k + d AS j,
         CAST(SUM(prod) OVER wd AS DOUBLE) AS qt,
         COUNT(*) OVER wd AS qc
  FROM x391_prods
  WINDOW wd AS (PARTITION BY e, d ORDER BY k
                ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
), x391_dists AS (
  SELECT q.e, q.i, q.j,
         2.0 * 6 * (1.0 - (q.qt - 6 * si.mu * sj.mu)
                    / (6 * sqrt(si.sig2) * sqrt(sj.sig2))) AS dist2
  FROM (SELECT * FROM x391_qt WHERE qc = 6) q
  JOIN x391_st si ON si.e = q.e AND si.p = q.i
  JOIN x391_st sj ON sj.e = q.e AND sj.p = q.j
  WHERE si.sig2 > 0 AND sj.sig2 > 0
), x391_both AS (
  SELECT e, i, j, dist2 FROM x391_dists
  UNION ALL
  SELECT e, j AS i, i AS j, dist2 FROM x391_dists
), x391_ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY e, i ORDER BY dist2 ASC, j ASC) AS rn
  FROM x391_both
)
SELECT e AS entity, CAST(i AS BIGINT) AS pos,
       ROUND(sqrt(greatest(dist2, 0.0)) * 1000000.0) / 1000000.0 AS mp,
       CAST(j AS BIGINT) AS nn_pos
FROM x391_ranked WHERE rn = 1
ORDER BY 1, 2
"""


EXT18_QUERIES.update({"x391_matrix_profile": q_x391_matrix_profile})
EXT18_ORACLES.update({"x391_matrix_profile": SQL_X391})


# ---------------- x392: deterministic mergeable quantile sketch


def q_x392_quantile_sketch(spark, sf_dir):
    """Deterministic KLL-style quantile sketch of each nation's
    monthly revenue (operators/sketch.py:quantile_sketch, k=8): the
    compactor ladder — insert in t order, full levels sort and keep
    their odd-index half at doubled weight — replayed by the oracle
    as a recursive-CTE state machine over a LIST-of-LIST state (one
    insert or one lowest-full-level compaction per step; the x390
    PAV idiom with nested-list state), then the weighted-rank
    estimate read off identically in both engines."""
    from .operators.sketch import quantile_sketch
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return quantile_sketch(
        base, "NATION", "T", "REV", k=8, probs=(0.25, 0.5, 0.9)
    )


SQL_X392 = """
WITH RECURSIVE x392_base AS (
  SELECT n_name AS g,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), x392_arr AS (
  SELECT g, list(v ORDER BY t) AS vs, CAST(count(*) AS INTEGER) AS n
  FROM x392_base GROUP BY g
), x392_mach AS (
  SELECT g, vs, n, CAST(0 AS INTEGER) AS i,
         [CAST([] AS DOUBLE[])] AS bufs
  FROM x392_arr
  UNION ALL
  SELECT g, vs, n,
         CASE WHEN fl IS NOT NULL THEN i
              ELSE CAST(i + 1 AS INTEGER) END,
         CASE
           WHEN fl IS NULL THEN
             -- insert vs[i+1] into level 1
             [list_append(bufs[1], vs[CAST(i + 1 AS INTEGER)])]
               || bufs[2:]
           WHEN fl < len(bufs) THEN
             bufs[1 : CAST(fl - 1 AS INTEGER)]
               || [CAST([] AS DOUBLE[])]
               || [list_concat(bufs[CAST(fl + 1 AS INTEGER)], keep)]
               || bufs[CAST(fl + 2 AS INTEGER) :]
           ELSE
             bufs[1 : CAST(fl - 1 AS INTEGER)]
               || [CAST([] AS DOUBLE[])]
               || [keep]
         END
  FROM (
    SELECT *, CASE WHEN fl IS NOT NULL THEN
           list_select(
             list_sort(bufs[fl]),
             list_filter(range(1, len(bufs[fl]) + 1), x -> x % 2 = 1))
         END AS keep
    FROM (
      SELECT *, CAST(NULLIF(list_position(
               list_transform(bufs, b -> len(b) >= 8), true), 0)
             AS INTEGER) AS fl
      FROM x392_mach
    )
  )
  WHERE fl IS NOT NULL OR i < n
), x392_term AS (
  SELECT * FROM (
    SELECT *, NULLIF(list_position(
        list_transform(bufs, b -> len(b) >= 8), true), 0) AS fl
    FROM x392_mach
  ) WHERE i = n AND fl IS NULL
), x392_weighted AS (
  SELECT g, uv.v AS v, CAST(1 AS BIGINT) << (lv.ell - 1) AS w
  FROM x392_term,
       unnest(range(1, len(bufs) + 1)) AS lv(ell),
       unnest(bufs[CAST(lv.ell AS INTEGER)]) AS uv(v)
), x392_tot AS (
  SELECT g, SUM(w) AS tw, COUNT(*) AS size FROM x392_weighted GROUP BY g
), x392_cum AS (
  SELECT w.g, w.v,
         SUM(w.w) OVER (PARTITION BY w.g ORDER BY w.v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
  FROM x392_weighted w
), x392_probs AS (
  SELECT * FROM (VALUES (0.25), (0.5), (0.9)) AS pr(p)
), x392_est AS (
  SELECT c.g, pr.p, MIN(c.v) AS est
  FROM x392_cum c
  JOIN x392_tot tt ON tt.g = c.g
  CROSS JOIN x392_probs pr
  WHERE c.cum >= pr.p * tt.tw
  GROUP BY c.g, pr.p
)
SELECT e.g AS grp,
       ROUND(e.p * 1000000.0) / 1000000.0 AS p,
       ROUND(e.est * 1000000.0) / 1000000.0 AS est,
       CAST(a.n AS BIGINT) AS n,
       CAST(tt.size AS BIGINT) AS summary_size
FROM x392_est e
JOIN x392_arr a ON a.g = e.g
JOIN x392_tot tt ON tt.g = e.g
ORDER BY 1, 2
"""


EXT18_QUERIES.update({"x392_quantile_sketch": q_x392_quantile_sketch})
EXT18_ORACLES.update({"x392_quantile_sketch": SQL_X392})


# ---------------- x393: Smith-Waterman local alignment


def q_x393_local_align(spark, sf_dir):
    """Smith-Waterman local alignment (operators/text.py:
    local_align_pairs, match=2/mismatch=-1/gap=-1, 64-token cap) over
    a deterministic candidate pairing (doc i vs doc i+250): the
    gap-tolerant near-dup scorer.  The oracle replays the integer DP
    as an anti-diagonal wavefront recursive CTE (the x323 idiom with
    a zero floor and argmax tracking) and reads the best cell with
    the identical total tie order."""
    from .operators.text import local_align_pairs, tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toked = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens(F.col("text")).alias("toks"),
    ).where(F.size("toks") >= 1)
    a = toked.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    ).where(F.col("doc_a") < 250)
    b = toked.select(
        (F.col("doc_id") - 250).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("tb"),
    ).where(F.col("doc_b") >= 250)
    pairs = a.join(b, on="doc_a")
    return local_align_pairs(
        pairs, "doc_a", "doc_b", "ta", "tb",
        match=2, mismatch=-1, gap=-1, max_tokens=64,
    )


SQL_X393 = """
WITH RECURSIVE x393_t AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '')[1:64] AS toks
  FROM documents
), x393_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.toks AS x, b.toks AS y,
         CAST(len(a.toks) AS INTEGER) AS n,
         CAST(len(b.toks) AS INTEGER) AS m
  FROM x393_t a JOIN x393_t b ON b.doc_id = a.doc_id + 250
  WHERE a.doc_id < 250 AND len(a.toks) >= 1 AND len(b.toks) >= 1
), x393_dp AS (
  SELECT doc_a, doc_b, x, y, n, m, 1 AS d,
         list_transform(range(1, n + 1),
           i -> CAST(NULL AS BIGINT)) AS cur,
         list_transform(range(1, n + 1),
           i -> CAST(NULL AS BIGINT)) AS prev
  FROM x393_pairs
  UNION ALL
  SELECT doc_a, doc_b, x, y, n, m, d + 1,
         list_transform(range(1, n + 1),
           i -> CASE WHEN d + 1 - i BETWEEN 1 AND m
                      AND i BETWEEN 1 AND n THEN
                  greatest(
                    CAST(0 AS BIGINT),
                    COALESCE(CASE WHEN i > 1
                             THEN prev[CAST(i - 1 AS INTEGER)] END,
                             CAST(0 AS BIGINT))
                      + CASE WHEN x[CAST(i AS INTEGER)]
                                  = y[CAST(d + 1 - i AS INTEGER)]
                             THEN 2 ELSE -1 END,
                    COALESCE(CASE WHEN i > 1
                             THEN cur[CAST(i - 1 AS INTEGER)] END,
                             CAST(0 AS BIGINT)) - 1,
                    COALESCE(cur[CAST(i AS INTEGER)],
                             CAST(0 AS BIGINT)) - 1)
                END) AS cur,
         cur AS prev
  FROM x393_dp
  WHERE d < n + m
), x393_cells AS (
  SELECT doc_a, doc_b, n, m,
         CAST(i AS BIGINT) AS i, CAST(d - i AS BIGINT) AS j,
         cur[CAST(i AS INTEGER)] AS h
  FROM x393_dp, unnest(range(1, n + 1)) AS u(i)
  WHERE d >= 2 AND d - i BETWEEN 1 AND m AND i <= n
    AND cur[CAST(i AS INTEGER)] IS NOT NULL
), x393_best AS (
  SELECT doc_a, doc_b, n, m, h, i, j,
         ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b
                            ORDER BY h DESC, i ASC, j ASC) AS rn
  FROM x393_cells
)
SELECT CAST(doc_a AS BIGINT) AS doc_a,
       CAST(doc_b AS BIGINT) AS doc_b,
       CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
       CAST(h AS BIGINT) AS score,
       CASE WHEN h > 0 THEN i ELSE 0 END AS end_i,
       CASE WHEN h > 0 THEN j ELSE 0 END AS end_j
FROM x393_best WHERE rn = 1
ORDER BY 1, 2
"""


EXT18_QUERIES.update({"x393_local_align": q_x393_local_align})
EXT18_ORACLES.update({"x393_local_align": SQL_X393})


# ---------------- x394: rendezvous-hash reshard audit


def q_x394_rendezvous(spark, sf_dir):
    """Rendezvous (HRW) reshard audit over customer keys
    (operators/layout.py:rendezvous_reshard_audit, 7 → 8 shards):
    measures the minimal-disruption property — only keys whose
    highest-weight shard is the NEW one move.  One bounded explode,
    one max_by per key on a total (weight, −shard) order, bounded
    per-shard rollups; the oracle replays the identical md5 weights
    with DuckDB arg_max."""
    from .operators.layout import rendezvous_reshard_audit

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return rendezvous_reshard_audit(
        cust, "c_custkey", shards_before=7, shards_after=8
    )


SQL_X394 = """
WITH x394_keys AS (
  SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k FROM customer
  WHERE c_custkey IS NOT NULL
), x394_cand AS (
  SELECT k, s,
         ('0x' || substr(md5('hrw:' || CAST(k AS VARCHAR) || ':'
                             || CAST(s AS VARCHAR)), 1, 14))::BIGINT
           * 16 + (15 - s) AS w
  FROM x394_keys, unnest(range(0, 8)) AS u(s)
), x394_assign AS (
  SELECT k,
         arg_max(s, w) AS after,
         arg_max(CASE WHEN s < 7 THEN s END,
                 CASE WHEN s < 7 THEN w END) AS before
  FROM x394_cand GROUP BY k
), x394_shards AS (
  SELECT CAST(s AS BIGINT) AS shard FROM unnest(range(0, 8)) AS u(s)
), x394_after AS (
  SELECT after AS shard, COUNT(*) AS n_after,
         SUM(CASE WHEN before <> after THEN 1 ELSE 0 END) AS gained,
         SUM(CASE WHEN before = after THEN 1 ELSE 0 END) AS stayed
  FROM x394_assign GROUP BY after
), x394_before AS (
  SELECT before AS shard, COUNT(*) AS n_before,
         SUM(CASE WHEN before <> after THEN 1 ELSE 0 END) AS lost
  FROM x394_assign GROUP BY before
)
SELECT s.shard,
       CAST(COALESCE(b.n_before, 0) AS BIGINT) AS n_before,
       CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
       CAST(COALESCE(a.gained, 0) AS BIGINT) AS gained,
       CAST(COALESCE(b.lost, 0) AS BIGINT) AS lost,
       CAST(COALESCE(a.stayed, 0) AS BIGINT) AS stayed
FROM x394_shards s
LEFT JOIN x394_before b ON b.shard = s.shard
LEFT JOIN x394_after a ON a.shard = s.shard
ORDER BY 1
"""


EXT18_QUERIES.update({"x394_rendezvous": q_x394_rendezvous})
EXT18_ORACLES.update({"x394_rendezvous": SQL_X394})


# ---------------- x395: Merkle snapshot diff


def q_x395_merkle_diff(spark, sf_dir):
    """Merkle-tree snapshot integrity diff
    (operators/layout.py:merkle_tree, 64 leaves, fanout 4): the
    orders table vs a deterministically corrupted twin (+1 on
    o_totalprice where o_orderkey % 997 = 0) — every tree node where
    the digests disagree, which is exactly the O(log) drill-down
    path an anti-entropy repair walks.  XOR leaf digests make the
    scan order- and partitioning-insensitive; parents hash children
    in index order."""
    from .operators.layout import merkle_tree

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    corrupted = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 997 == 0,
            F.col("price") + F.lit(1).cast("decimal(12,2)"),
        )
        .otherwise(F.col("price"))
        .cast("decimal(12,2)")
        .alias("price"),
    )
    ta = merkle_tree(orders, "o_orderkey", ["price"])
    tb = merkle_tree(corrupted, "o_orderkey", ["price"])
    return (
        ta.withColumnRenamed("digest", "digest_a")
        .join(
            tb.withColumnRenamed("digest", "digest_b"),
            on=["level", "idx"],
        )
        .where(F.col("digest_a") != F.col("digest_b"))
        .select(
            F.col("level").cast("long").alias("level"),
            "idx",
            "digest_a",
            "digest_b",
        )
        .orderBy("level", "idx")
    )


SQL_X395 = """
WITH x395_rows AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_totalprice AS DECIMAL(12,2)) AS pa,
         CAST(CASE WHEN o_orderkey % 997 = 0
              THEN CAST(o_totalprice AS DECIMAL(12,2))
                   + CAST(1 AS DECIMAL(12,2))
              ELSE CAST(o_totalprice AS DECIMAL(12,2)) END
              AS DECIMAL(12,2)) AS pb
  FROM orders
), x395_leafa AS (
  SELECT k % 64 AS idx,
         bit_xor(('0x' || substr(md5('mrk:' || CAST(k AS VARCHAR)
           || ':' || CAST(pa AS VARCHAR)), 1, 15))::BIGINT) AS hx
  FROM x395_rows GROUP BY 1
), x395_leafb AS (
  SELECT k % 64 AS idx,
         bit_xor(('0x' || substr(md5('mrk:' || CAST(k AS VARCHAR)
           || ':' || CAST(pb AS VARCHAR)), 1, 15))::BIGINT) AS hx
  FROM x395_rows GROUP BY 1
), x395_l0 AS (
  SELECT 0 AS level, CAST(u.i AS BIGINT) AS idx,
         COALESCE(CAST(a.hx AS VARCHAR), '0') AS digest_a,
         COALESCE(CAST(b.hx AS VARCHAR), '0') AS digest_b
  FROM unnest(range(0, 64)) AS u(i)
  LEFT JOIN x395_leafa a ON a.idx = u.i
  LEFT JOIN x395_leafb b ON b.idx = u.i
), x395_l1 AS (
  SELECT 1 AS level, idx // 4 AS idx,
         substr(md5(string_agg(digest_a, ',' ORDER BY idx)), 1, 16)
           AS digest_a,
         substr(md5(string_agg(digest_b, ',' ORDER BY idx)), 1, 16)
           AS digest_b
  FROM x395_l0 GROUP BY idx // 4
), x395_l2 AS (
  SELECT 2 AS level, idx // 4 AS idx,
         substr(md5(string_agg(digest_a, ',' ORDER BY idx)), 1, 16)
           AS digest_a,
         substr(md5(string_agg(digest_b, ',' ORDER BY idx)), 1, 16)
           AS digest_b
  FROM x395_l1 GROUP BY idx // 4
), x395_l3 AS (
  SELECT 3 AS level, idx // 4 AS idx,
         substr(md5(string_agg(digest_a, ',' ORDER BY idx)), 1, 16)
           AS digest_a,
         substr(md5(string_agg(digest_b, ',' ORDER BY idx)), 1, 16)
           AS digest_b
  FROM x395_l2 GROUP BY idx // 4
), x395_all AS (
  SELECT * FROM x395_l0 UNION ALL SELECT * FROM x395_l1
  UNION ALL SELECT * FROM x395_l2 UNION ALL SELECT * FROM x395_l3
)
SELECT CAST(level AS BIGINT) AS level, idx, digest_a, digest_b
FROM x395_all
WHERE digest_a <> digest_b
ORDER BY 1, 2
"""


EXT18_QUERIES.update({"x395_merkle_diff": q_x395_merkle_diff})
EXT18_ORACLES.update({"x395_merkle_diff": SQL_X395})


# ---------------- x396: systematic PPS sampling


def q_x396_pps(spark, sf_dir):
    """Stratified systematic πps sample of parts ∝ retail price
    (operators/mixing.py:pps_systematic, 8 draws per brand,
    mid-interval start): the Madow official-statistics sampler made
    reproducible — pure 64-bit integer point arithmetic
    (cross-multiplied cumulative conditions, odds-counting), so the
    oracle is the identical algebra and the sample cannot drift with
    partitioning."""
    from .operators.mixing import pps_systematic

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return pps_systematic(
        part, "p_brand", "p_partkey", "p_retailprice", n_per_stratum=8
    )


SQL_X396 = """
WITH x396_base AS (
  SELECT CAST(p_brand AS VARCHAR) AS stratum,
         CAST(p_partkey AS BIGINT) AS id,
         CAST(round(CAST(p_retailprice AS DOUBLE) * 100) AS BIGINT)
           AS sz
  FROM part
  WHERE round(CAST(p_retailprice AS DOUBLE) * 100) > 0
), x396_cum AS (
  SELECT stratum, id, sz,
         SUM(sz) OVER (PARTITION BY stratum ORDER BY id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum,
         SUM(sz) OVER (PARTITION BY stratum) AS tot
  FROM x396_base
), x396_hits AS (
  SELECT stratum, id, sz, cum, tot,
         greatest(CAST((16 * (cum - sz) + tot - 1) // tot AS BIGINT),
                  CAST(1 AS BIGINT)) AS lo,
         least(CAST((16 * cum + tot - 1) // tot - 1 AS BIGINT),
               CAST(15 AS BIGINT)) AS hi
  FROM x396_cum
)
SELECT stratum, id, sz AS size_scaled, cum,
       CAST(CASE WHEN hi >= lo
            THEN CAST(floor((hi + 1) / 2) AS BIGINT)
                 - CAST(floor(((lo - 1) + 1) / 2) AS BIGINT)
            ELSE 0 END AS BIGINT) AS hits,
       ROUND(8 * CAST(sz AS DOUBLE) / tot, 6) AS pi
FROM x396_hits
ORDER BY 1, 2
"""


EXT18_QUERIES.update({"x396_pps": q_x396_pps})
EXT18_ORACLES.update({"x396_pps": SQL_X396})


# ---------------- x397: bounded-hop weighted shortest paths


def q_x397_sssp(spark, sf_dir):
    """Bounded-hop Bellman-Ford (operators/graph.py:sssp_bounded,
    3 supersteps) over the supplier–part bipartite graph from
    lineitem (edge weight = min extended-price cents per pair,
    decimal-exact), seeded at suppliers with suppkey % 37 = 0: the
    cheapest ≤3-edge supply cost from the watchlist to every
    reachable node.  The oracle unrolls the identical relaxations as
    three min-join layers — integer distances, no recursion
    needed."""
    from .operators.graph import sssp_bounded

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pair = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(
            F.min(
                F.round(
                    F.col("l_extendedprice").cast("double") * 100
                ).cast("long")
            ).alias("w")
        )
    )
    e1 = pair.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        "w",
    )
    edges = e1.unionByName(
        e1.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = (
        li.select(F.col("l_suppkey").cast("long").alias("sk"))
        .where(F.col("sk") % 37 == 0)
        .distinct()
        .select(F.concat(F.lit("s"), F.col("sk").cast("string")).alias("node"))
    )
    return sssp_bounded(
        edges, seeds, max_hops=3, src_col="src", dst_col="dst",
        weight_col="w", seed_col="node",
    )


SQL_X397 = """
WITH x397_pair AS (
  SELECT l_suppkey AS sk, l_partkey AS pk,
         MIN(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100)
             AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
), x397_edges AS (
  SELECT 's' || CAST(sk AS VARCHAR) AS src,
         'p' || CAST(pk AS VARCHAR) AS dst, w FROM x397_pair
  UNION ALL
  SELECT 'p' || CAST(pk AS VARCHAR), 's' || CAST(sk AS VARCHAR), w
  FROM x397_pair
), x397_d0 AS (
  SELECT DISTINCT 's' || CAST(sk AS VARCHAR) AS node,
         CAST(0 AS BIGINT) AS dist
  FROM x397_pair WHERE sk % 37 = 0
), x397_d1 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM x397_d0
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM x397_d0 d JOIN x397_edges e ON e.src = d.node
  ) GROUP BY node
), x397_d2 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM x397_d1
    UNION ALL
    SELECT e.dst, d.dist + e.w
    FROM x397_d1 d JOIN x397_edges e ON e.src = d.node
  ) GROUP BY node
), x397_d3 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM x397_d2
    UNION ALL
    SELECT e.dst, d.dist + e.w
    FROM x397_d2 d JOIN x397_edges e ON e.src = d.node
  ) GROUP BY node
)
SELECT node, dist FROM x397_d3 ORDER BY node
"""


EXT18_QUERIES.update({"x397_sssp": q_x397_sssp})
EXT18_ORACLES.update({"x397_sssp": SQL_X397})


# ---------------- x398: LZ76 complexity


def q_x398_lz76(spark, sf_dir):
    """LZ76 complexity of each nation's mean-binarized monthly
    revenue series (operators/temporal.py:lz76_complexity): the
    compressibility randomness score.  The oracle replays the pinned
    exhaustive-history parse as a recursive-CTE state machine whose
    per-step longest match is a list_max over strpos probes —
    integer phrase counts, one shared log2 normalization."""
    from .operators.temporal import lz76_complexity
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return lz76_complexity(
        base, entity_col="NATION", t_col="T", value_col="REV"
    )


SQL_X398 = """
WITH RECURSIVE x398_base AS (
  SELECT n_name AS e,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), x398_bits AS (
  SELECT e,
         string_agg(CASE WHEN v > mu THEN '1' ELSE '0' END,
                    '' ORDER BY t) AS s,
         CAST(count(*) AS INTEGER) AS n
  FROM (
    SELECT e, t, v,
           CAST(SUM(CAST(v AS DECIMAL(27,6))) OVER (PARTITION BY e)
                / COUNT(*) OVER (PARTITION BY e) AS DOUBLE) AS mu
    FROM x398_base
  ) GROUP BY e
), x398_parse AS (
  SELECT e, s, n, CAST(1 AS INTEGER) AS p, CAST(0 AS INTEGER) AS c
  FROM x398_bits
  UNION ALL
  SELECT e, s, n,
         CAST(p + lmax + 1 AS INTEGER), CAST(c + 1 AS INTEGER)
  FROM (
    SELECT e, s, n, p, c,
           list_max(list_prepend(0,
             list_filter(range(1, n - p + 2),
               l -> strpos(s[1 : CAST(p + l - 2 AS INTEGER)],
                           s[p : CAST(p + l - 1 AS INTEGER)]) > 0)))
             AS lmax
    FROM x398_parse WHERE p <= n
  )
)
SELECT e AS entity, CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS c,
       ROUND(CASE WHEN n >= 2 THEN c * log2(n) / n
                  ELSE CAST(c AS DOUBLE) END * 1000000.0)
         / 1000000.0 AS norm
FROM x398_parse
WHERE p > n
ORDER BY entity
"""


EXT18_QUERIES.update({"x398_lz76": q_x398_lz76})
EXT18_ORACLES.update({"x398_lz76": SQL_X398})


# ---------------- x399: split conformal coverage audit


def q_x399_conformal(spark, sf_dir):
    """Split-conformal interval audit of each nation's monthly
    revenue (operators/ml.py:split_conformal_interval, α=0.1,
    60/20/20 split): distribution-free interval half-widths via the
    native ceil-rank residual rule, empirical coverage on the
    held-out tail.  Fully declarative; the oracle is the identical
    split/rank/coverage algebra."""
    from .operators.ml import split_conformal_interval
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return split_conformal_interval(
        base, entity_col="NATION", t_col="T", value_col="REV"
    )


SQL_X399 = """
WITH x399_base AS (
  SELECT n_name AS e,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), x399_rn AS (
  SELECT e, t, v,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY t) AS rn,
         COUNT(*) OVER (PARTITION BY e) AS n
  FROM x399_base
), x399_split AS (
  SELECT *, CAST(floor(n * 0.6) AS BIGINT) AS n_train,
         CAST(floor(n * 0.2) AS BIGINT) AS n_cal
  FROM x399_rn
), x399_mu AS (
  SELECT e,
         CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS mu
  FROM x399_split WHERE rn <= n_train GROUP BY e
), x399_scored AS (
  SELECT s.*, m.mu, abs(s.v - m.mu) AS resid
  FROM x399_split s JOIN x399_mu m ON m.e = s.e
), x399_qhat AS (
  SELECT e, resid AS qhat FROM (
    SELECT e, resid,
           ROW_NUMBER() OVER (PARTITION BY e
                              ORDER BY resid ASC, t ASC) AS rk,
           least(CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT), n_cal) AS k
    FROM x399_scored
    WHERE rn > n_train AND rn <= n_train + n_cal
  ) WHERE rk = k
)
SELECT s.e AS entity,
       CAST(MAX(s.n) AS BIGINT) AS n,
       CAST(MAX(s.n_cal) AS BIGINT) AS n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ROUND(MAX(q.qhat) * 1000000.0) / 1000000.0 AS qhat,
       CAST(SUM(CASE WHEN s.resid <= q.qhat THEN 1 ELSE 0 END)
            AS BIGINT) AS covered,
       ROUND(CAST(SUM(CASE WHEN s.resid <= q.qhat THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) * 1000000.0)
         / 1000000.0 AS coverage
FROM x399_scored s
JOIN x399_qhat q ON q.e = s.e
WHERE s.rn > s.n_train + s.n_cal
GROUP BY s.e
ORDER BY 1
"""


EXT18_QUERIES.update({"x399_conformal": q_x399_conformal})
EXT18_ORACLES.update({"x399_conformal": SQL_X399})


# ---------------- x400-x402: classic decision-support (TPC-H shapes)


def _ts(sf_dir, spark, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_x400_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority) on the synthetic schema: segment
    filter pushes into the customer scan, both joins are key-equi
    (AQE broadcasts while the filtered build side is small), revenue
    is a decimal-exact sum, and the top-10 order carries a full tie
    (revenue desc, date, orderkey) so both engines pick the same
    rows.  Dates re-parameterized to the generator's range."""
    cust = _ts(sf_dir, spark, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _ts(sf_dir, spark, "orders").where(
        F.col("o_orderdate") < "1997-03-15"
    )
    li = _ts(sf_dir, spark, "lineitem").where(
        F.col("l_shipdate") > "1997-03-15"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_orderkey"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,6)")
                        - F.col("l_discount").cast("decimal(18,6)")
                    )
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            (F.round(F.col("revenue") * 1e6) / 1e6).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(
            F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(10)
    )


SQL_X400 = """
SELECT l_orderkey,
       ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,6))
                    - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(28,8))) AS DOUBLE) * 1000000.0)
         / 1000000.0 AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def q_x401_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): the 6-table join with the
    region→nation chain broadcast and the customer/supplier
    SAME-nation equi-constraint; one decimal-exact revenue rollup per
    nation over a one-year date window."""
    region = _ts(sf_dir, spark, "region").where(F.col("r_name") == "ASIA")
    nation = _ts(sf_dir, spark, "nation")
    cust = _ts(sf_dir, spark, "customer")
    supp = _ts(sf_dir, spark, "supplier")
    orders = _ts(sf_dir, spark, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _ts(sf_dir, spark, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,6)")
                        - F.col("l_discount").cast("decimal(18,6)")
                    )
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "n_name",
            (F.round(F.col("revenue") * 1e6) / 1e6).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


SQL_X401 = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,6))
                    - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(28,8))) AS DOUBLE) * 1000000.0)
         / 1000000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q_x402_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting, trimmed to the synthetic
    schema's columns): quarter of orders, returned lineitems only,
    revenue per customer with the nation dimension broadcast; top 20
    under a full tie order."""
    cust = _ts(sf_dir, spark, "customer")
    nation = _ts(sf_dir, spark, "nation")
    orders = _ts(sf_dir, spark, "orders").where(
        (F.col("o_orderdate") >= "1997-10-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _ts(sf_dir, spark, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .groupBy(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,6)")
                        - F.col("l_discount").cast("decimal(18,6)")
                    )
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name",
            (F.round(F.col("revenue") * 1e6) / 1e6).alias("revenue"),
            "c_acctbal", "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_X402 = """
SELECT c_custkey, c_name,
       ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,6))
                    - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(28,8))) AS DOUBLE) * 1000000.0)
         / 1000000.0 AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, CAST(c_acctbal AS DOUBLE), n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


EXT18_QUERIES.update({
    "x400_tpch_q3": q_x400_tpch_q3,
    "x401_tpch_q5": q_x401_tpch_q5,
    "x402_tpch_q10": q_x402_tpch_q10,
})
EXT18_ORACLES.update({
    "x400_tpch_q3": SQL_X400,
    "x401_tpch_q5": SQL_X401,
    "x402_tpch_q10": SQL_X402,
})


# ---------------- x403: hierarchical forecast reconciliation


def q_x403_reconcile(spark, sf_dir):
    """One-level OLS forecast reconciliation (functions/econ.py:
    ols_reconcile_one_level): per-region forecasts (all-history mean
    of monthly revenue) vs an independent total forecast (mean of the
    LAST 12 months' totals — a different model, hence incoherent),
    reconciled by the Sherman-Morrison closed form that distributes
    the discrepancy equally.  The oracle recomputes both model means
    and the identical closed-form algebra."""
    from .functions.econ import ols_reconcile_one_level

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey"
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("REGION"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("M"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "rev"
            )
        )
    )
    bottoms = monthly.groupBy("REGION").agg(
        (
            F.sum(F.col("rev").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("yhat")
    )
    months = monthly.groupBy("M").agg(
        F.sum(F.col("rev").cast("decimal(27,6)")).alias("tot")
    )
    last12 = months.orderBy(F.desc("M")).limit(12)
    top = last12.agg(
        (
            F.sum(F.col("tot").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("y")
    ).first()["y"]
    return ols_reconcile_one_level(
        bottoms, series_col="REGION", yhat_col="yhat", top_yhat=top
    )


SQL_X403 = """
WITH x403_monthly AS (
  SELECT r_name AS region,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), x403_bottom AS (
  SELECT region AS series,
         CAST(SUM(CAST(rev AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
           AS yhat
  FROM x403_monthly GROUP BY region
), x403_top AS (
  SELECT CAST(SUM(CAST(tot AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
           AS top_y
  FROM (
    SELECT m, SUM(CAST(rev AS DECIMAL(27,6))) AS tot
    FROM x403_monthly GROUP BY m
    ORDER BY m DESC LIMIT 12
  )
), x403_tot AS (
  SELECT CAST(SUM(CAST(yhat AS DECIMAL(27,6))) AS DOUBLE) AS sum_y,
         COUNT(*) AS k
  FROM x403_bottom
)
SELECT series,
       ROUND(yhat * 1000000.0) / 1000000.0 AS yhat,
       ROUND((yhat + (top_y - sum_y) / (k + 1)) * 1000000.0)
         / 1000000.0 AS reconciled,
       ROUND((top_y - sum_y) / (k + 1) * 1000000.0)
         / 1000000.0 AS adjustment
FROM x403_bottom, x403_tot, x403_top
UNION ALL
SELECT '__total__',
       ROUND(top_y * 1000000.0) / 1000000.0,
       ROUND((sum_y + (top_y - sum_y) * k / (k + 1)) * 1000000.0)
         / 1000000.0,
       ROUND((top_y - sum_y) * 1000000.0) / 1000000.0
FROM x403_tot, x403_top
ORDER BY 1
"""


EXT18_QUERIES.update({"x403_reconcile": q_x403_reconcile})
EXT18_ORACLES.update({"x403_reconcile": SQL_X403})


# ---------------- x404: exact optimal-partitioning changepoints


def q_x404_changepoints(spark, sf_dir):
    """Exact multiple-changepoint segmentation of each nation's
    monthly revenue (operators/temporal.py:optimal_partitioning,
    BIC-style auto penalty): the un-pruned PELT DP with full
    backtrace.  The oracle runs the identical forward DP as a
    recursive CTE carrying (F, backpointer) lists — the candidate
    set at step t is a list_transform over all prior split points —
    then walks the backtrace in a second recursion (the x386
    Kleinberg two-phase idiom)."""
    from .operators.temporal import optimal_partitioning
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return optimal_partitioning(
        base, entity_col="NATION", t_col="T", value_col="REV"
    )


SQL_X404 = """
WITH RECURSIVE x404_rows AS (
  SELECT e, rn,
         CAST(SUM(yq) OVER w AS DOUBLE) / 1000000 AS c1,
         CAST(SUM(yq * yq) OVER w AS DOUBLE) / 1000000000000 AS c2
  FROM (
    SELECT n_name AS e,
           ROW_NUMBER() OVER (
             PARTITION BY n_name
             ORDER BY date_trunc('month', o_orderdate)) AS rn,
           CAST(round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) * 1000000) AS HUGEINT) AS yq
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, date_trunc('month', o_orderdate)
  )
  WINDOW w AS (PARTITION BY e ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), x404_arr AS (
  SELECT e,
         list_prepend(CAST(0 AS DOUBLE), list(c1 ORDER BY rn)) AS p1,
         list_prepend(CAST(0 AS DOUBLE), list(c2 ORDER BY rn)) AS p2,
         CAST(count(*) AS INTEGER) AS n
  FROM x404_rows GROUP BY e
), x404_beta AS (
  SELECT e, p1, p2, n,
         CASE WHEN n > 1 THEN
           2.0 * ((p2[CAST(n + 1 AS INTEGER)]
                   - p1[CAST(n + 1 AS INTEGER)]
                     * p1[CAST(n + 1 AS INTEGER)] / n) / n) * ln(n)
         ELSE CAST(0 AS DOUBLE) END AS beta
  FROM x404_arr
), x404_dp AS (
  SELECT e, p1, p2, n, beta, CAST(0 AS INTEGER) AS t,
         [-beta] AS fs, [CAST(0 AS INTEGER)] AS cps
  FROM x404_beta
  UNION ALL
  SELECT e, p1, p2, n, beta, CAST(t + 1 AS INTEGER),
         list_append(fs, m),
         list_append(cps, CAST(list_position(cands, m) - 1 AS INTEGER))
  FROM (
    SELECT *, list_min(cands) AS m FROM (
      SELECT e, p1, p2, n, beta, t, fs, cps,
             list_transform(range(0, t + 1), s ->
               fs[CAST(s + 1 AS INTEGER)]
               + ((p2[CAST(t + 2 AS INTEGER)]
                   - p2[CAST(s + 1 AS INTEGER)])
                  - (p1[CAST(t + 2 AS INTEGER)]
                     - p1[CAST(s + 1 AS INTEGER)])
                    * (p1[CAST(t + 2 AS INTEGER)]
                       - p1[CAST(s + 1 AS INTEGER)])
                    / (t + 1 - s))
               + beta) AS cands
      FROM x404_dp WHERE t < n
    )
  )
), x404_bt AS (
  SELECT e, p1, cps, n, n AS t,
         CAST([] AS INTEGER[]) AS starts,
         CAST([] AS INTEGER[]) AS ends
  FROM x404_dp WHERE t = n
  UNION ALL
  SELECT e, p1, cps, n, cps[CAST(t + 1 AS INTEGER)] AS t,
         list_prepend(CAST(cps[CAST(t + 1 AS INTEGER)] + 1
                      AS INTEGER), starts),
         list_prepend(CAST(t AS INTEGER), ends)
  FROM x404_bt WHERE t > 0
)
SELECT e AS entity, CAST(si.i AS BIGINT) AS seg_idx,
       CAST(starts[CAST(si.i AS INTEGER)] AS BIGINT) AS start_t,
       CAST(ends[CAST(si.i AS INTEGER)] AS BIGINT) AS end_t,
       CAST(ends[CAST(si.i AS INTEGER)]
            - starts[CAST(si.i AS INTEGER)] + 1 AS BIGINT) AS n_points,
       ROUND((p1[CAST(ends[CAST(si.i AS INTEGER)] + 1 AS INTEGER)]
              - p1[CAST(starts[CAST(si.i AS INTEGER)] AS INTEGER)])
             / (ends[CAST(si.i AS INTEGER)]
                - starts[CAST(si.i AS INTEGER)] + 1)
             * 1000000.0) / 1000000.0 AS seg_mean
FROM x404_bt, unnest(range(1, len(starts) + 1)) AS si(i)
WHERE t = 0
ORDER BY entity, seg_idx
"""


EXT18_QUERIES.update({"x404_changepoints": q_x404_changepoints})
EXT18_ORACLES.update({"x404_changepoints": SQL_X404})


# ---------------- x405: group-sequential O'Brien-Fleming monitoring


def q_x405_group_sequential(spark, sf_dir):
    """Four-look O'Brien-Fleming interim analysis of the hash-split
    A/A purchase experiment (operators/behavior.py:
    group_sequential_obf): calendar-quartile entry looks, cumulative
    two-proportion z per look against the literal OBF bounds, the
    first-crossing stopping rule.  All counts integer; the oracle
    rebuilds the identical z and decision algebra."""
    from .operators.behavior import group_sequential_obf
    from .queries_ext import _read_events

    return group_sequential_obf(_read_events(spark, sf_dir))


SQL_X405 = """
WITH x405_pu AS (
  SELECT user_id AS u, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_ts,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY user_id
), x405_rng AS (
  SELECT MIN(first_ts) AS lo, MAX(first_ts) AS hi FROM x405_pu
), x405_asg AS (
  SELECT u, conv,
         CASE WHEN ('0x' || substr(md5('gs:' || CAST(u AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS variant,
         least(4, CAST(1 + floor((first_ts - lo) * 4
                                 / (hi - lo + 1)) AS INTEGER)) AS look
  FROM x405_pu, x405_rng
), x405_grid AS (
  SELECT lk.look,
         COALESCE(a.n, 0) AS na_i, COALESCE(a.cv, 0) AS ca_i,
         COALESCE(b.n, 0) AS nb_i, COALESCE(b.cv, 0) AS cb_i
  FROM (SELECT CAST(i AS INTEGER) AS look
        FROM unnest(range(1, 5)) AS u(i)) lk
  LEFT JOIN (SELECT look, COUNT(*) AS n, SUM(conv) AS cv
             FROM x405_asg WHERE variant = 'a' GROUP BY look) a
    ON a.look = lk.look
  LEFT JOIN (SELECT look, COUNT(*) AS n, SUM(conv) AS cv
             FROM x405_asg WHERE variant = 'b' GROUP BY look) b
    ON b.look = lk.look
), x405_cum AS (
  SELECT look,
         CAST(SUM(na_i) OVER w AS BIGINT) AS n_a,
         CAST(SUM(nb_i) OVER w AS BIGINT) AS n_b,
         CAST(SUM(ca_i) OVER w AS BIGINT) AS conv_a,
         CAST(SUM(cb_i) OVER w AS BIGINT) AS conv_b
  FROM x405_grid
  WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), x405_sc AS (
  SELECT CAST(look AS BIGINT) AS look, n_a, n_b, conv_a, conv_b,
         ROUND(((conv_a / CAST(n_a AS DOUBLE))
                - (conv_b / CAST(n_b AS DOUBLE)))
               / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - (conv_a + conv_b)
                               / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / n_a + 1.0 / n_b)) * 1000000.0)
           / 1000000.0 AS z,
         [4.049, 2.863, 2.337, 2.024][CAST(look AS INTEGER)] AS bound
  FROM x405_cum
)
SELECT look, n_a, n_b, conv_a, conv_b, z, bound,
       CAST(CASE WHEN abs(z) >= bound THEN 1 ELSE 0 END AS BIGINT)
         AS reject,
       CASE WHEN SUM(CASE WHEN abs(z) >= bound THEN 1 ELSE 0 END)
                 OVER (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) > 0
            THEN 'stop' ELSE 'continue' END AS decision
FROM x405_sc
ORDER BY look
"""


EXT18_QUERIES.update({"x405_group_sequential": q_x405_group_sequential})
EXT18_ORACLES.update({"x405_group_sequential": SQL_X405})


# ---------------- x406: Jonckheere-Terpstra ordered trend test


def q_x406_jonckheere(spark, sf_dir):
    """Jonckheere-Terpstra ordered-alternative test
    (operators/quality.py:jonckheere_terpstra): does order value
    increase across the 1-URGENT → 5-LOW priority tiers?  Values
    bucket to $1000 so the pair statistic is a bounded
    count-frame join; 2·JT stays integer under the ½-tie convention;
    the oracle mirrors the count algebra and the shared z
    expression."""
    from .operators.quality import jonckheere_terpstra

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("prio"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("tier"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    return jonckheere_terpstra(
        orders, "prio", "tier", "price", bucket_width=1000.0
    )


SQL_X406 = """
WITH x406_base AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS ord,
         CAST(floor(CAST(o_totalprice AS DOUBLE) / 1000.0) AS BIGINT)
           AS bk
  FROM orders
), x406_cnt AS (
  SELECT ord, bk, COUNT(*) AS n FROM x406_base GROUP BY 1, 2
), x406_jt AS (
  SELECT CAST(SUM(CASE WHEN a.bk < b.bk THEN 2 * a.n * b.n
                       WHEN a.bk = b.bk THEN a.n * b.n
                       ELSE 0 END) AS BIGINT) AS jt2
  FROM x406_cnt a JOIN x406_cnt b ON a.ord < b.ord
), x406_sz AS (
  SELECT ord, COUNT(*) AS nk FROM x406_base GROUP BY ord
), x406_m AS (
  SELECT CAST(SUM(nk) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(nk * nk) AS BIGINT) AS s2,
         CAST(SUM(nk * nk * (2 * nk + 3)) AS BIGINT) AS s3
  FROM x406_sz
)
SELECT jt2,
       CAST((n_total * n_total - s2) / 2 AS BIGINT) AS e2,
       n_total, n_groups,
       ROUND(((jt2 - (n_total * n_total - s2) / 2) / 2.0)
             / sqrt((n_total * n_total * (2 * n_total + 3) - s3)
                    / 72.0) * 1000000.0) / 1000000.0 AS z
FROM x406_jt, x406_m
"""


EXT18_QUERIES.update({"x406_jonckheere": q_x406_jonckheere})
EXT18_ORACLES.update({"x406_jonckheere": SQL_X406})


# ---------------- x407: Kendall tau-b


def q_x407_kendall(spark, sf_dir):
    """Kendall τ-b between order month and order value
    (operators/quality.py:kendall_tau_b, $1000 × 1-month buckets):
    concordant/discordant pair counting on the bounded cell frame —
    the tie-corrected monotone-association complement to x119's
    Spearman.  Integer counts; one shared ratio."""
    from .operators.quality import kendall_tau_b

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).cast("double").alias("mo"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    return kendall_tau_b(
        orders, "mo", "price", x_bucket=1.0, y_bucket=1000.0
    )


SQL_X407 = """
WITH x407_base AS (
  SELECT CAST(floor(CAST(year(o_orderdate) * 12 + month(o_orderdate)
              AS DOUBLE) / 1.0) AS BIGINT) AS xb,
         CAST(floor(CAST(o_totalprice AS DOUBLE) / 1000.0) AS BIGINT)
           AS yb
  FROM orders
), x407_cells AS (
  SELECT xb, yb, COUNT(*) AS n FROM x407_base GROUP BY 1, 2
), x407_pairs AS (
  SELECT
    CAST(SUM(CASE WHEN a.xb < b.xb AND a.yb < b.yb
             THEN a.n * b.n ELSE 0 END) AS BIGINT) AS concordant,
    CAST(SUM(CASE WHEN a.xb < b.xb AND a.yb > b.yb
             THEN a.n * b.n ELSE 0 END) AS BIGINT) AS discordant,
    CAST(SUM(CASE WHEN a.xb = b.xb AND a.yb <> b.yb
             THEN a.n * b.n ELSE 0 END) AS BIGINT) AS tie_x_cross,
    CAST(SUM(CASE WHEN a.yb = b.yb AND a.xb <> b.xb
             THEN a.n * b.n ELSE 0 END) AS BIGINT) AS tie_y_cross
  FROM x407_cells a JOIN x407_cells b
    ON a.xb < b.xb OR (a.xb = b.xb AND a.yb < b.yb)
), x407_n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x407_base
), x407_same AS (
  SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS tie_both
  FROM x407_cells
)
SELECT n, concordant, discordant,
       CAST(tie_x_cross + tie_both AS BIGINT) AS tie_x,
       CAST(tie_y_cross + tie_both AS BIGINT) AS tie_y,
       ROUND(CAST(concordant - discordant AS DOUBLE)
             / sqrt(CAST(CAST(n * (n - 1) / 2 AS BIGINT)
                         - (tie_x_cross + tie_both) AS DOUBLE)
                    * CAST(CAST(n * (n - 1) / 2 AS BIGINT)
                           - (tie_y_cross + tie_both) AS DOUBLE))
             * 1000000.0) / 1000000.0 AS tau_b
FROM x407_pairs, x407_n, x407_same
"""


EXT18_QUERIES.update({"x407_kendall": q_x407_kendall})
EXT18_ORACLES.update({"x407_kendall": SQL_X407})


# ---------------- x408: James-Stein shrinkage


def q_x408_james_stein(spark, sf_dir):
    """Positive-part James-Stein shrinkage of per-nation monthly
    revenue means toward the grand mean (operators/ml.py:
    james_stein_shrinkage): the empirical-Bayes segment estimator.
    Cross-entity folds re-enter DECIMAL(38,12) after a 6-dp term
    round; the oracle reproduces the identical staging."""
    from .operators.ml import james_stein_shrinkage
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION", F.col("REV").alias("v")
    )
    return james_stein_shrinkage(
        base, entity_col="NATION", value_col="v"
    )


SQL_X408 = """
WITH x408_base AS (
  SELECT n_name AS e,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, date_trunc('month', o_orderdate)
), x408_per AS (
  SELECT e, CAST(COUNT(*) AS BIGINT) AS n_i,
         ROUND(CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(*) * 1000000.0) / 1000000.0 AS m6,
         CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(v AS DECIMAL(18,2))
                       * CAST(v AS DECIMAL(18,2))
                  AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM x408_base GROUP BY e
), x408_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_i) AS BIGINT) AS n_total,
         CAST(SUM(CAST(m6 AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
           AS grand,
         CAST(SUM(CAST(syy - sy * sy / n_i AS DECIMAL(38,12)))
              AS DOUBLE) AS within_ss
  FROM x408_per
), x408_ssb AS (
  SELECT CAST(SUM(CAST((m6 - grand) * (m6 - grand)
              AS DECIMAL(38,12))) AS DOUBLE) AS ssb
  FROM x408_per, x408_stats
), x408_w AS (
  SELECT greatest(CAST(0 AS DOUBLE),
           1.0 - ((k - 3) * ((within_ss / (n_total - k))
                             / (n_total / CAST(k AS DOUBLE))) / ssb))
           AS w, grand, k, n_total
  FROM x408_stats, x408_ssb
)
SELECT e AS entity, n_i,
       m6 AS mean,
       ROUND((grand + w * (m6 - grand)) * 1000000.0) / 1000000.0
         AS shrunk,
       ROUND(w * 1000000.0) / 1000000.0 AS w
FROM x408_per, x408_w
UNION ALL
SELECT '__grand__', n_total,
       ROUND(grand * 1000000.0) / 1000000.0,
       ROUND(grand * 1000000.0) / 1000000.0,
       ROUND(w * 1000000.0) / 1000000.0
FROM x408_w
ORDER BY 1
"""


EXT18_QUERIES.update({"x408_james_stein": q_x408_james_stein})
EXT18_ORACLES.update({"x408_james_stein": SQL_X408})


# ---------------- x409: Breslow-Day odds-ratio homogeneity


def q_x409_breslow_day(spark, sf_dir):
    """Breslow-Day homogeneity of odds ratios
    (operators/quality.py:breslow_day) across hour-of-day strata:
    exposure = odd user id, outcome = purchase event — does the
    exposure odds ratio vary by hour, or is x251's pooled MH estimate
    defensible?  Integer 2×2 counts per stratum; quadratic expected
    counts via the shared closed form."""
    from .operators.quality import breslow_day
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    cells = (
        ev.withColumn(
            "hr",
            (
                (F.col("ts_us") - (F.col("ts_us") % F.lit(3_600_000_000)))
                / F.lit(3_600_000_000)
            ).cast("long")
            % 24,
        )
        .groupBy("hr")
        .agg(
            F.sum(
                F.when(
                    (F.col("user_id") % 2 == 1)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("a"),
            F.sum(
                F.when(
                    (F.col("user_id") % 2 == 1)
                    & (F.col("event_type") != "purchase"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("b"),
            F.sum(
                F.when(
                    (F.col("user_id") % 2 == 0)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("c"),
            F.sum(
                F.when(
                    (F.col("user_id") % 2 == 0)
                    & (F.col("event_type") != "purchase"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("d"),
        )
        .where(
            (F.col("a") + F.col("b") > 0)
            & (F.col("c") + F.col("d") > 0)
        )
    )
    return breslow_day(cells, stratum_col="hr")


SQL_X409 = """
WITH x409_cells AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP))
          - (epoch_us(CAST(ts AS TIMESTAMP)) % 3600000000))
           / 3600000000 % 24 AS hr,
         CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS DOUBLE) AS a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type <> 'purchase'
                  THEN 1 ELSE 0 END) AS DOUBLE) AS b,
         CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS DOUBLE) AS c,
         CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type <> 'purchase'
                  THEN 1 ELSE 0 END) AS DOUBLE) AS d
  FROM events GROUP BY 1
  HAVING SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) > 0
), x409_mh AS (
  SELECT CAST(SUM(CAST(a * d / (a + b + c + d) AS DECIMAL(38,12)))
              AS DOUBLE)
         / CAST(SUM(CAST(b * c / (a + b + c + d) AS DECIMAL(38,12)))
                AS DOUBLE) AS psi,
         CAST(COUNT(*) AS BIGINT) AS n_strata
  FROM x409_cells
), x409_terms AS (
  SELECT n_strata, psi,
         CAST((a - ahat) * (a - ahat)
              / (1.0 / (1.0 / ahat + 1.0 / (r1 - ahat)
                        + 1.0 / (c1 - ahat)
                        + 1.0 / (r2 - c1 + ahat)))
              AS DECIMAL(38,12)) AS term
  FROM (
    SELECT *,
           CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
                WHEN root1 IS NOT NULL AND root1 > lo AND root1 < hi
                THEN root1 ELSE root2 END AS ahat
    FROM (
      SELECT *,
             (-qb - sqrt(greatest(qb * qb - 4.0 * qa * qc, 0.0)))
               / (2.0 * qa) AS root1,
             (-qb + sqrt(greatest(qb * qb - 4.0 * qa * qc, 0.0)))
               / (2.0 * qa) AS root2,
             greatest(0.0, c1 - r2) AS lo, least(r1, c1) AS hi
      FROM (
        SELECT n_strata, psi, a,
               a + b AS r1, c + d AS r2, a + c AS c1,
               psi - 1.0 AS qa,
               -(psi * ((a + b) + (a + c)) + ((c + d) - (a + c)))
                 AS qb,
               psi * (a + b) * (a + c) AS qc
        FROM x409_cells, x409_mh
      )
    )
  )
)
SELECT n_strata, CAST(n_strata - 1 AS BIGINT) AS df,
       ROUND(psi * 1000000.0) / 1000000.0 AS or_mh,
       ROUND(CAST(SUM(term) AS DOUBLE) * 1000000.0) / 1000000.0
         AS bd_chi2
FROM x409_terms
GROUP BY n_strata, psi
"""


EXT18_QUERIES.update({"x409_breslow_day": q_x409_breslow_day})
EXT18_ORACLES.update({"x409_breslow_day": SQL_X409})


# ---------------- x410: Newey-West long-run variance


def q_x410_newey_west(spark, sf_dir):
    """HAC long-run variance of each nation's monthly revenue
    (operators/temporal.py:newey_west_lrv, Bartlett L=4): the
    autocorrelation-robust standard error of the mean and its
    variance-inflation factor.  Lag products re-enter DECIMAL(38,12)
    before the fold; the oracle mirrors the lag windows and the
    literal Bartlett weights."""
    from .operators.temporal import newey_west_lrv
    from .queries_panel import nation_monthly

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    return newey_west_lrv(
        base, entity_col="NATION", t_col="T", value_col="REV", max_lag=4
    )


SQL_X410 = """
WITH x410_base AS (
  SELECT n_name AS e,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), x410_mu AS (
  SELECT e, CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
           AS mu,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM x410_base GROUP BY e
), x410_lag AS (
  SELECT e, v,
         LAG(v, 1) OVER w AS v1, LAG(v, 2) OVER w AS v2,
         LAG(v, 3) OVER w AS v3, LAG(v, 4) OVER w AS v4
  FROM x410_base
  WINDOW w AS (PARTITION BY e ORDER BY t)
), x410_s AS (
  SELECT e,
    CAST(SUM(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2)))
         AS DOUBLE) AS sxy0,
    CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS sx0,
    CAST(COUNT(*) AS BIGINT) AS c0,
    CAST(SUM(CAST(v AS DECIMAL(18,2)) * CAST(v1 AS DECIMAL(18,2)))
         AS DOUBLE) AS sxy1,
    CAST(SUM(CAST(CASE WHEN v1 IS NOT NULL THEN v END
             AS DECIMAL(27,6))) AS DOUBLE) AS sx1,
    CAST(SUM(CAST(v1 AS DECIMAL(27,6))) AS DOUBLE) AS sy1,
    CAST(COUNT(v1) AS BIGINT) AS c1,
    CAST(SUM(CAST(v AS DECIMAL(18,2)) * CAST(v2 AS DECIMAL(18,2)))
         AS DOUBLE) AS sxy2,
    CAST(SUM(CAST(CASE WHEN v2 IS NOT NULL THEN v END
             AS DECIMAL(27,6))) AS DOUBLE) AS sx2,
    CAST(SUM(CAST(v2 AS DECIMAL(27,6))) AS DOUBLE) AS sy2,
    CAST(COUNT(v2) AS BIGINT) AS c2,
    CAST(SUM(CAST(v AS DECIMAL(18,2)) * CAST(v3 AS DECIMAL(18,2)))
         AS DOUBLE) AS sxy3,
    CAST(SUM(CAST(CASE WHEN v3 IS NOT NULL THEN v END
             AS DECIMAL(27,6))) AS DOUBLE) AS sx3,
    CAST(SUM(CAST(v3 AS DECIMAL(27,6))) AS DOUBLE) AS sy3,
    CAST(COUNT(v3) AS BIGINT) AS c3,
    CAST(SUM(CAST(v AS DECIMAL(18,2)) * CAST(v4 AS DECIMAL(18,2)))
         AS DOUBLE) AS sxy4,
    CAST(SUM(CAST(CASE WHEN v4 IS NOT NULL THEN v END
             AS DECIMAL(27,6))) AS DOUBLE) AS sx4,
    CAST(SUM(CAST(v4 AS DECIMAL(27,6))) AS DOUBLE) AS sy4,
    CAST(COUNT(v4) AS BIGINT) AS c4
  FROM x410_lag GROUP BY e
), x410_g AS (
  SELECT s.e, m.n, m.mu,
    (sxy0 - mu * (sx0 + sx0) + c0 * mu * mu) / n AS g0,
    (sxy1 - mu * (sx1 + sy1) + c1 * mu * mu) / n AS g1,
    (sxy2 - mu * (sx2 + sy2) + c2 * mu * mu) / n AS g2,
    (sxy3 - mu * (sx3 + sy3) + c3 * mu * mu) / n AS g3,
    (sxy4 - mu * (sx4 + sy4) + c4 * mu * mu) / n AS g4
  FROM x410_s s JOIN x410_mu m ON m.e = s.e
)
SELECT e AS entity, n,
       ROUND(sqrt(greatest(g0, 0.0)) * 1000000.0)
         / 1000000.0 AS sd,
       ROUND(sqrt(greatest(
               g0 + 2.0 * (1.0 - 1.0 / 5.0) * g1
                  + 2.0 * (1.0 - 2.0 / 5.0) * g2
                  + 2.0 * (1.0 - 3.0 / 5.0) * g3
                  + 2.0 * (1.0 - 4.0 / 5.0) * g4, 0.0) / n)
             * 1000000.0) / 1000000.0 AS se_mean,
       ROUND((g0 + 2.0 * (1.0 - 1.0 / 5.0) * g1
                 + 2.0 * (1.0 - 2.0 / 5.0) * g2
                 + 2.0 * (1.0 - 3.0 / 5.0) * g3
                 + 2.0 * (1.0 - 4.0 / 5.0) * g4) / g0
             * 1000000.0) / 1000000.0 AS inflation
FROM x410_g
ORDER BY 1
"""


EXT18_QUERIES.update({"x410_newey_west": q_x410_newey_west})
EXT18_ORACLES.update({"x410_newey_west": SQL_X410})
