"""Structured Streaming operators over the events stream.

The reference is purely batch (SURVEY §2.4); these extensions give the
engine a streaming surface with the standard Spark shapes:

* ``windowed_event_counts`` — watermarked tumbling/sliding window
  aggregation (late data handled by the watermark; state store bounded)
* ``sessionize_stream`` — session windows via ``F.session_window``
  (gap-based), the built-in stateful operator
* ``stream_from_events_dir`` — file-source stream over the driver's
  events parquet (usable with ``trigger(availableNow=True)`` in tests)

Batch equivalents of both aggregations live in ``queries.py``
(x10/x11) with DuckDB oracles — the streaming path reuses the same
column expressions, so correctness is anchored by the batch oracle and
the streaming tests only need to check plumbing (schema, output modes,
watermark behavior).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def stream_from_events_dir(spark, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's events table."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .load(f"{sf_dir}")
        .where(F.col("event_id").isNotNull())
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed counts + value sums per event_type.

    Works on both batch and streaming frames (same expression tree);
    on a stream the watermark bounds state and drops late rows.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        src.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (built-in session_window)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins,
    duplicates arriving within the watermark horizon are dropped.

    Uses ``dropDuplicatesWithinWatermark`` — state for a key is
    retained only until the watermark passes its event time, so state
    is bounded (a plain ``dropDuplicates`` on a stream retains every
    key forever).  This is the ingest-side companion of
    :func:`~..operators.dedup.dedup_exact`: dedup-at-ingest bounds the
    work the batch pipeline re-does per day at 100 TB.

    On a batch frame it degrades to plain ``dropDuplicates`` so the
    same pipeline code runs in both modes.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, *, output_mode: str = "complete"
):
    """Drive a streaming aggregation to a memory sink with
    trigger(availableNow) and block until done — test/bench helper."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    ts_col: str = "ts",
    max_delay_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each *left* row pairs with
    *right* rows of the same *on* key whose timestamp falls in
    ``[left.ts, left.ts + max_delay_sec]`` — the attribution shape
    (click → purchase within the window).

    On streams both sides get watermarks and the time-range predicate
    is part of the JOIN CONDITION (not a post-filter), which is what
    lets Spark bound join state: a buffered left row expires once the
    right watermark passes ``left.ts + max_delay_sec``.  On batch
    frames the identical tree is a partitioned equi-join on *on* with
    the range as a join filter — at 100 TB both sides co-partition on
    the key and nothing is quadratic (per-key fanout is the true
    output size).

    *ts_col* may be a timestamp (streaming path) or an int64 epoch-µs
    column (the batch twin over the nanos-encoded events parquet) —
    the bound arithmetic adapts to the column type.

    Column naming: left columns keep their names; every right column
    arrives with an ``r_`` prefix (including the join key, dropped
    after the equality).
    """
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    lts, rts = F.col(ts_col), F.col(f"r_{ts_col}")
    if dict(left.dtypes)[ts_col] in ("bigint", "long", "int"):
        upper = lts + F.lit(int(max_delay_sec) * 1_000_000)
    else:
        upper = lts + F.expr(f"INTERVAL {int(max_delay_sec)} SECOND")
    cond = (
        (F.col(on) == F.col(f"r_{on}"))
        & (rts >= lts)
        & (rts <= upper)
    )
    return left.join(r, cond, "inner").drop(f"r_{on}")


def sliding_event_counts_batch(
    events: DataFrame,
    *,
    window_us: int = 3_600_000_000,
    slide_us: int = 900_000_000,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Batch twin of ``windowed_event_counts(window, slide)`` on the
    integer-µs timestamp: each event explodes into the
    ``window_us / slide_us`` sliding windows that contain it (pure
    integer math — engine-exact, unlike timestamp bucketing), then one
    (window, event_type) aggregation with map-side combine.

    The explode factor is the overlap count k (4 at the defaults) — a
    constant, so the shuffle is k× the input, never quadratic; the
    streaming path (``windowed_event_counts`` with ``slide``) holds
    only open windows in state thanks to the watermark.
    """
    if window_us % slide_us != 0:
        raise ValueError("window_us must be a multiple of slide_us")
    k = window_us // slide_us
    ts = F.col(ts_col)
    anchor = F.expr(f"({ts_col} div {slide_us}) * {slide_us}")
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: anchor - j.cast("long") * F.lit(slide_us),
    )
    exploded = events.select(
        F.col("event_type"),
        F.col("value"),
        ts.alias("__ts"),
        F.explode(starts).alias("window_start_us"),
    ).where(
        (F.col("__ts") >= F.col("window_start_us"))
        & (F.col("__ts") < F.col("window_start_us") + F.lit(window_us))
    )
    return exploded.groupBy("window_start_us", "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("sum_value"),
    )


def streaming_pair_wins(
    stream: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Streaming half of the Bradley–Terry pipeline (the x132 batch
    twin): reduce a stream of raw preference comparisons to the
    |items|²-bounded unordered-pair win table — ``(item_a, item_b,
    wins_a, wins_b)`` with ``item_a < item_b`` — in complete output
    mode.  The raw-comparison volume is where the data lives; the
    aggregate this emits is tiny, so the MM fit
    (``behavior.bradley_terry``) runs as a cheap per-trigger batch
    step on the sink table.  Counts are integers — restarting the
    stream or changing the micro-batch split cannot change the table.
    """
    w, l_ = F.col(winner_col), F.col(loser_col)
    a = F.least(w, l_)
    b = F.greatest(w, l_)
    return (
        stream.where(w != l_)
        .select(a.alias("item_a"), b.alias("item_b"), w.alias("__w"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.when(F.col("__w") == F.col("item_a"), 1))
            .cast("long")
            .alias("wins_a"),
            F.count(F.when(F.col("__w") == F.col("item_b"), 1))
            .cast("long")
            .alias("wins_b"),
        )
    )


def streaming_label_agreement(
    stream: DataFrame,
    label_a_col: str = "label_a",
    label_b_col: str = "label_b",
) -> DataFrame:
    """Streaming half of the Cohen's-kappa pipeline (the x131 batch
    twin): reduce a stream of doubly-labeled items to the confusion
    cells ``(label_a, label_b, n)`` in complete output mode — the
    k×k-bounded sufficient statistic from which
    ``quality.kappa_from_confusion`` finalizes kappa per trigger.
    Null-labeled rows are excluded (not co-labeled), matching the
    batch operator's contract.
    """
    a, b = F.col(label_a_col), F.col(label_b_col)
    return (
        stream.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("label_a"), b.alias("label_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def streaming_hll_registers(
    stream: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    b: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Streaming half of the HLL distinct-count pipeline (the
    x73/x191 batch twin): reduce a raw event stream to per-group
    HyperLogLog registers — ``(*group_cols, __idx, __reg)`` — in
    complete output mode.  State is exactly ``|groups| · 2^b`` integer
    rows no matter how many events arrive, max-merge is idempotent
    and commutative, so restarts, replays, and micro-batch splits
    cannot change the table — the streaming-native property exact
    count-distinct lacks.  Finalize per trigger with
    ``sketch.hll_estimate_from_registers`` on the sink table; register
    hashing goes through the ONE shared definition
    (``sketch.hll_register_cols``), so batch/merge/stream equivalence
    is structural.
    """
    from ..operators.sketch import hll_register_cols

    idx, rank = hll_register_cols(value_col, b=b, salt=salt)
    return (
        stream.select(
            *group_cols,
            idx.alias("__idx"),
            rank.cast("int").alias("__rank"),
        )
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__rank").alias("__reg"))
    )


def streaming_lexicon_flag_counts(
    stream: DataFrame,
    text_col: str,
    group_cols: Sequence[str],
    lexicon: dict[str, Sequence[str]],
) -> DataFrame:
    """Streaming half of the lexicon-screening pipeline (the x189
    batch twin, operators/text.py:lexicon_category_rates): reduce a
    document stream to per ``(*group_cols, category)`` flag counters
    — ``(…, category, docs_flagged, total_hits, n_docs)`` — in
    complete output mode.

    The batch operator joins an exploded token table against the
    broadcast lexicon; a stream cannot hold per-doc token state, so
    the per-document category hit count is computed ROW-LOCALLY (a
    sequential fold over the document's own tokens against the
    literal term set — same normalized tokenizer, same exact-term
    match) before the bounded aggregation.  State is exactly
    |groups| × |categories| counter rows no matter how many documents
    stream through; the counters are sums, so micro-batch splits and
    complete-mode re-emission cannot change the totals.  Finalize
    rates (flag_rate, hits_per_doc) on the sink table per trigger.
    """
    from ..operators.text import tokens

    g = list(group_cols)
    toks = tokens(F.col(text_col))
    cats = []
    for cat in sorted(lexicon):
        terms = sorted(set(lexicon[cat]))
        hits = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(t.isin(*terms), F.lit(1)).otherwise(F.lit(0)),
        )
        cats.append(
            F.struct(F.lit(cat).alias("category"), hits.alias("hits"))
        )
    exploded = stream.select(
        *g, F.explode(F.array(*cats)).alias("__c")
    ).select(*g, F.col("__c.category").alias("category"),
             F.col("__c.hits").alias("__h"))
    return exploded.groupBy(*g, "category").agg(
        F.sum(F.when(F.col("__h") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_flagged"),
        F.sum("__h").cast("long").alias("total_hits"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


def streaming_byte_anomaly(
    stream: DataFrame,
    text_col: str = "text",
    group_cols=("source",),
) -> DataFrame:
    """Streaming half of the encoding-health audit (the x233 batch
    twin, operators/text.py:byte_anomaly_profile): reduce a document
    stream to the per-group byte/char counters — ``(n_docs,
    total_chars, multibyte_chars, control_chars, n_docs_nonascii,
    n_docs_replacement)`` — in complete output mode.  Every per-row
    expression is scan-stage column algebra (char vs byte length,
    one control-strip regex, one U+FFFD scan), so state is
    |groups| × 6 integers; the ratio finalizer runs per trigger on
    the sink table and reproduces the batch operator bitwise.  The
    mojibake tripwire belongs AT INGEST — a mislabeled-charset feed
    should alarm on the first micro-batch, not at the nightly batch
    audit.
    """
    g = list(group_cols)
    t = F.col(text_col)
    chars = F.length(t)
    mbytes = F.octet_length(t) - chars
    ctrl = chars - F.length(
        F.regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    )
    return stream.where(t.isNotNull()).groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.sum(mbytes).cast("long").alias("multibyte_chars"),
        F.sum(ctrl).cast("long").alias("control_chars"),
        F.sum(F.when(mbytes > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_nonascii"),
        F.sum(F.when(F.contains(t, F.lit("�")), 1).otherwise(0))
        .cast("long")
        .alias("n_docs_replacement"),
    )


def streaming_ams_counters(
    stream: DataFrame,
    key_col: str,
    *,
    rows: int = 9,
    salt: str = "ams",
    side: str = "a",
) -> DataFrame:
    """Streaming half of the AMS join-size gauge (the x248 batch
    twin, operators/sketch.py:ams_join_size): reduce a keyed record
    stream to *rows* signed ±1 counters — ONE global aggregate row in
    complete output mode, state bounded at *rows* integers no matter
    the arrival volume.  Maintain one such table per join side as
    events land; the estimate for "what would |A ⋈ B| be right now"
    is the median of the per-row counter products — join sizing as a
    continuously-current dashboard number instead of a pre-flight
    batch scan.

    Reduction goes through the ONE shared definition
    (``sketch.ams_sign_counters``), so batch/stream equivalence is
    structural.  Signed sums are additive and mergeable but NOT
    idempotent — at-least-once replays double-count; land the sink
    with ``sinks.idempotent_batch_writer`` (or any batch-id-keyed
    overwrite) when the counter table is persisted.
    """
    from ..operators.sketch import ams_sign_counters

    return ams_sign_counters(
        stream, key_col, rows=rows, salt=salt, side=side
    )


def streaming_countmin(
    events: DataFrame,
    value_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Streaming count-min maintenance: the batch sketch's md5 cell
    derivation (operators/sketch.py:countmin_sketch — one explode into
    *depth* ``(r, bucket)`` keys) fed into a NATIVE streaming
    aggregation in update mode.  Counters live in Spark's state store
    — state is exactly ``depth × width`` cells regardless of stream
    length, increments are associative/commutative so micro-batch
    boundaries and replays cannot corrupt them, and after any prefix
    of batches each counter equals the batch sketch on the union of
    those batches (pytest pins cell-exact equality).

    No Python state path on purpose: a counter table is what the
    built-in streaming agg already does better (HashAggregate +
    state store, whole-stage codegen) — ``applyInPandasWithState`` is
    reserved for state the engine can't express (HLL registers,
    mSPRT moments).
    """
    from ..operators.sketch import _hash64

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    cells = [
        F.struct(
            F.lit(r).alias("r"),
            (_hash64(F.col(value_col), f"{salt}:{r}") % width)
            .cast("long")
            .alias("bucket"),
        )
        for r in range(depth)
    ]
    return (
        events.select(F.explode(F.array(*cells)).alias("cell"))
        .groupBy(
            F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
