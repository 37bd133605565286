"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windows (``streaming/core.py``) cover tumbling/sliding and
gap sessions; anything with bespoke per-key state — running profiles,
cross-batch counters, anomaly scores — needs the arbitrary-state
operator.  State here is one small tuple per key, shuffled once by the
grouping key and stored in the state store: the standard
scalable-streaming shape (state size O(keys), not O(events)).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

RUNNING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        s += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [None if mx == float("-inf") else mx],
        }
    )


def running_user_totals_batch(
    events: DataFrame,
    *,
    ts_col: str = "ts_us",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-event running (count, sum, max) per user — the batch/backfill
    equivalent of :func:`running_user_totals`: row *i* of a user's
    time-ordered stream carries exactly the state the streaming
    operator holds after processing that event.  Used to backfill or
    verify streaming state by batch reprocessing, and it is plain
    window SQL, so an external oracle checks it value-for-value.

    The cumulative sum runs over ``decimal(18,6)`` so partial-order
    differences can't drift the float result between engines; the
    window orders by (*ts_col*, *order_cols*) for a total, deterministic
    order.  Nulls are skipped by sum/max but counted by n_events,
    matching the streaming semantics.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        *order_cols,
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w)
            .cast("double"),
            6,
        ).alias("sum_value"),
        F.round(F.max("value").over(w), 6).alias("max_value"),
    )


def running_user_totals(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Per-user running (count, sum, max) maintained across micro-batches
    — the arbitrary-stateful analog of a cumulative window.

    Works on a stream (cross-batch state) and, degenerately, on a batch
    frame (single pass).  Output mode: update.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_M = 64

HLL_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("n_zero_regs", LongType()),
        StructField("est_distinct", DoubleType()),
    ]
)

HLL_STATE = StructType(
    [StructField("regs", ArrayType(IntegerType()))]
)


def _hll_rank_idx(value: Any) -> tuple[int, int]:
    """Register index + rank for one value — BYTE-IDENTICAL to the
    batch operator (operators/sketch.py:hll_distinct): md5 of
    'hll:<value>', first byte mod 64 picks the register, the next 32
    bits give 33 - bit_length (33 when zero)."""
    import hashlib

    h = hashlib.md5(f"hll:{value}".encode()).hexdigest()
    idx = int(h[:2], 16) % HLL_M
    w = int(h[2:10], 16)
    rank = 33 if w == 0 else 33 - w.bit_length()
    return idx, rank


def _update_hll(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        regs, n_seen = list(state.get[0]), state.get[1]
    else:
        regs, n_seen = [0] * HLL_M, 0
    for pdf in pdfs:
        for v in pdf["user_id"].dropna():
            idx, rank = _hll_rank_idx(int(v))
            if rank > regs[idx]:
                regs[idx] = rank
            n_seen += 1
    state.update((regs, n_seen))
    alpha_m2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
    s = sum(2.0 ** -r for r in regs if r > 0)
    n_zero = sum(1 for r in regs if r == 0)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n_seen],
            "n_zero_regs": [n_zero],
            "est_distinct": [round(alpha_m2 / (s + n_zero), 6)],
        }
    )


def streaming_hll_distinct(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Cross-batch distinct-user estimate per event type: the
    HyperLogLog registers of the batch operator
    (operators/sketch.py:hll_distinct) maintained as streaming state.

    HLL is the canonical STREAMING sketch: state is exactly 64 small
    ints per key regardless of stream length, updates are pairwise-max
    (idempotent and mergeable — replayed micro-batches cannot corrupt
    it), and the estimate after N batches equals the batch operator on
    the union of those batches, which is how the pytest verifies it.
    Output mode: update.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy("event_type").applyInPandasWithState(
        _update_hll,
        outputStructType=HLL_OUTPUT,
        stateStructType=StructType(
            [
                StructField("regs", ArrayType(IntegerType())),
                StructField("n_seen", LongType()),
            ]
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DECAYED_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ref_us", LongType()),
        StructField("decayed_sum", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)

DECAYED_STATE = StructType(
    [
        StructField("ref_us", LongType()),
        StructField("acc", DoubleType()),
        StructField("n", LongType()),
    ]
)

#: half-life for the streaming decayed counter, microseconds
DECAY_HALF_LIFE_US = 7 * 86_400_000_000


def _update_decayed(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    ref, acc, n = (
        state.get if state.exists else (None, 0.0, 0)
    )
    hl = float(DECAY_HALF_LIFE_US)
    for pdf in pdfs:
        if not len(pdf):
            continue
        ts = pdf["ts_us"].astype("int64")
        vals = pdf["value"].fillna(0.0).astype("float64")
        batch_max = int(ts.max())
        new_ref = batch_max if ref is None else max(ref, batch_max)
        if ref is not None and new_ref > ref:
            acc = acc * 0.5 ** ((new_ref - ref) / hl)
        # exponential decay is associative: fold the batch against the
        # advanced reference in one vectorized expression
        acc = float(
            acc + (vals * 0.5 ** ((new_ref - ts) / hl)).sum()
        )
        n += int(len(pdf))
        ref = new_ref
    state.update((ref, acc, n))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "ref_us": [ref],
            "decayed_sum": [acc],
            "n_seen": [n],
        }
    )


def streaming_decayed_sum(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Cross-batch recency-weighted value sum per event type — the
    streaming twin of ``operators/temporal.decayed_sum`` (x97),
    maintained incrementally instead of recomputed.

    The trick that makes the state O(1): exponential decay is
    ASSOCIATIVE — ``sum_t = sum_{t'} · λ^(t−t')`` re-references the
    whole history in one multiply, so the state is just
    ``(reference_ts, accumulated_sum, n)`` per key and each
    micro-batch costs one vectorized fold.  A trailing-window sum
    ("last 30 days") would need per-event state to expire events;
    the decayed form never does — this is WHY recency weighting is
    the streaming-native formulation.

    Caveat vs the HLL twin: the update is additive, not idempotent —
    exactly-once sinks (checkpointed, the Spark default) are required;
    a replayed batch would double-count.  Output mode: update.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy("event_type").applyInPandasWithState(
        _update_decayed,
        outputStructType=DECAYED_OUTPUT,
        stateStructType=DECAYED_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MINHASH_K = 64

MINHASH_OUTPUT = StructType(
    [
        StructField("source", StringType()),
        StructField("sig", ArrayType(LongType())),
        StructField("n_docs", LongType()),
    ]
)

MINHASH_STATE = StructType(
    [
        StructField("sig", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _py_shingle_hashes(text: str, n: int = 5) -> list[int]:
    """Python replica of dedup.shingle_hash: first 8 md5 hex chars as
    int — identical values to the JVM path, so streaming and batch
    signatures agree bitwise."""
    import hashlib
    import re

    t = re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < n:
        return []
    out = []
    seen = set()
    for i in range(len(t) - n + 1):
        sh = t[i : i + n]
        if sh in seen:
            continue
        seen.add(sh)
        out.append(
            int(hashlib.md5(sh.encode("utf-8")).hexdigest()[:8], 16)
        )
    return out


def _update_minhash(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from fame2pygen_spark.operators.dedup import (
        MERSENNE_31, _affine_params,
    )

    params = _affine_params(MINHASH_K, seed=42)
    if state.exists:
        sig, n = state.get
        sig = list(sig)
    else:
        sig, n = [MERSENNE_31] * MINHASH_K, 0
    for pdf in pdfs:
        for text in pdf["text"]:
            hs = _py_shingle_hashes(text or "")
            if not hs:
                n += 1
                continue
            for j, (a, b) in enumerate(params):
                m = min((a * h + b) % MERSENNE_31 for h in hs)
                if m < sig[j]:
                    sig[j] = m
            n += 1
    state.update((sig, n))
    yield pd.DataFrame(
        {"source": [key[0]], "sig": [sig], "n_docs": [n]}
    )


def streaming_minhash_signatures(docs: DataFrame) -> DataFrame:
    """Cross-batch MinHash signature per source — the content sketch
    of everything a source has EVER emitted, maintained in O(64 longs)
    state per key: downstream, pairwise signature agreement estimates
    cross-source content overlap (the x52/x80 question) without
    storing a single document.

    Like the streaming HLL twin, the update is PAIRWISE MIN — 
    idempotent and mergeable, so replayed micro-batches cannot corrupt
    the state and the streamed signature equals the batch
    ``dedup.minhash_signatures`` on the union of all batches (the
    pytest proof).  Hashing runs Python-side inside the state
    operator (`applyInPandasWithState` owns the row loop); the batch
    path stays the JVM explode+groupBy formulation — use that for
    backfills.  Output mode: update.
    """
    return docs.groupBy("source").applyInPandasWithState(
        _update_minhash,
        outputStructType=MINHASH_OUTPUT,
        stateStructType=MINHASH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------- streaming Page-Hinkley drift detector

PH_OUTPUT = StructType(
    [
        StructField("entity", StringType()),
        StructField("n", LongType()),
        StructField("ph_max", DoubleType()),
        StructField("alarmed", BooleanType()),
        StructField("alarm_at", LongType()),
    ]
)

PH_STATE = StructType(
    [
        StructField("i", LongType()),
        StructField("cumx", StringType()),   # decimal(38,18) as text
        StructField("m", StringType()),      # decimal(38,18) as text
        StructField("mmin", StringType()),   # decimal(38,18) as text
        StructField("ph_max", DoubleType()),
        StructField("alarmed", BooleanType()),
        StructField("alarm_at", LongType()),
    ]
)


def _ph_update_factory(delta: float, lam: float):
    """Build the per-key fold.  The arithmetic REPLICATES the batch
    operator (temporal.page_hinkley) step for step so the twin test
    can demand bitwise equality: running sums are exact decimals
    quantized at 18 dp with HALF_UP (Spark's double→decimal(38,18)
    cast), decimal→double conversions round to nearest (both
    engines), and the 6-dp PH rounding goes through the shortest
    -repr HALF_UP path Spark's ``round(double, 6)`` uses."""
    from decimal import ROUND_HALF_UP, Decimal

    Q18 = Decimal("1e-18")
    Q6 = Decimal("1e-6")

    def q18(x: float) -> Decimal:
        return Decimal(x).quantize(Q18, rounding=ROUND_HALF_UP)

    def round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Q6, rounding=ROUND_HALF_UP)
        )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            i, cumx_s, m_s, mmin_s, ph_max, alarmed, alarm_at = state.get
            cumx, m = Decimal(cumx_s), Decimal(m_s)
            mmin: Decimal | None = Decimal(mmin_s)
        else:
            i, cumx, m, mmin = 0, Decimal(0), Decimal(0), None
            ph_max, alarmed, alarm_at = 0.0, False, None
        for pdf in pdfs:
            pdf = pdf.sort_values("__ord")
            for ordv, x in zip(pdf["__ord"], pdf["__x"]):
                if x is None or pd.isna(x):
                    continue
                x = float(x)
                i += 1
                cumx += q18(x)
                dev = x - float(cumx) / i - delta
                m += q18(dev)
                mmin = m if mmin is None else min(mmin, m)
                ph = round6(float(m - mmin))
                if ph > ph_max:
                    ph_max = ph
                if ph > lam and not alarmed:
                    alarmed, alarm_at = True, int(ordv)
        state.update(
            (i, str(cumx), str(m),
             str(mmin if mmin is not None else Decimal(0)),
             ph_max, alarmed, alarm_at)
        )
        yield pd.DataFrame(
            {
                "entity": [str(key[0])],
                "n": [i],
                "ph_max": [round6(ph_max)],
                "alarmed": [alarmed],
                "alarm_at": [alarm_at],
            }
        )

    return update


def streaming_page_hinkley(
    series: DataFrame,
    entity_col: str,
    order_col: str,
    value_col: str,
    *,
    delta: float = 0.0,
    lam: float = 10.0,
) -> DataFrame:
    """Streaming half of the Page-Hinkley monitor (the x210 batch
    twin, operators/temporal.py:page_hinkley): per-entity sequential
    drift state — (i, Σx, m_t, min m_t, running PH max, alarm) — one
    tuple per key in the state store, updated as monitoring-grain
    rows arrive.  This is where PH actually belongs: it is an ONLINE
    test; the batch operator is its backfill/verification twin, and
    the cross-batch pytest pins the fold to it bitwise.

    ORDERED-ARRIVAL CONTRACT: PH is prefix-dependent.  Rows are
    sorted by *order_col* inside each micro-batch, but a row arriving
    in a LATER batch with an earlier order value is folded late (the
    statistic it produces is the out-of-order one).  Feed the
    monitoring grain through an ordered source (the per-day rollup
    the batch twin consumes), or accept the approximation.

    Output mode: update — one row per (entity, trigger) with the
    current ``(n, ph_max, alarmed, alarm_at)``.
    """
    src = series.select(
        F.col(entity_col).cast("string").alias("entity"),
        F.col(order_col).cast("long").alias("__ord"),
        F.col(value_col).cast("double").alias("__x"),
    )
    return src.groupBy("entity").applyInPandasWithState(
        _ph_update_factory(float(delta), float(lam)),
        outputStructType=PH_OUTPUT,
        stateStructType=PH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MSPRT_OUTPUT = StructType(
    [
        StructField("grp", StringType()),
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
        StructField("delta", DoubleType()),
        StructField("lam", DoubleType()),
        StructField("p_always", DoubleType()),
    ]
)

MSPRT_STATE = StructType(
    [
        StructField("na", LongType()),
        StructField("sa", StringType()),
        StructField("ssa", StringType()),
        StructField("nb", LongType()),
        StructField("sb", StringType()),
        StructField("ssb", StringType()),
        StructField("mx", DoubleType()),
    ]
)


def _msprt_update_factory(t2: float):
    """Per-key mSPRT fold replicating the batch operator
    (behavior.msprt_monitor) value for value: per-row decimal
    quantization (28,6)/(38,12) exactly as Spark's double→decimal
    casts do it, cumulative decimal sums, then the identical IEEE
    Λ expression.  One LOOK per micro-batch trigger — the always-
    valid guarantee is per-look, so feed the stream at the cadence
    you want looks at (daily rollup for daily peeking)."""
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    Q6 = Decimal("1e-6")
    Q12 = Decimal("1e-12")

    def q(x: float, quantum: Decimal) -> Decimal:
        return Decimal(x).quantize(quantum, rounding=ROUND_HALF_UP)

    def round6(x: float) -> float:
        # Λ can reach 1e200+ (or overflow to inf) under a strong
        # effect; Spark's round(double, 6) is a no-op at those
        # magnitudes, so pass non-finite through and quantize with
        # enough precision otherwise
        import math as _m

        if not _m.isfinite(x):
            return x
        with localcontext() as ctx:
            ctx.prec = 400
            return float(
                Decimal(repr(x)).quantize(Q6, rounding=ROUND_HALF_UP)
            )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            na, sa_s, ssa_s, nb, sb_s, ssb_s, mx = state.get
            sa, ssa = Decimal(sa_s), Decimal(ssa_s)
            sb, ssb = Decimal(sb_s), Decimal(ssb_s)
        else:
            na, nb, mx = 0, 0, None
            sa = ssa = sb = ssb = Decimal(0)
        for pdf in pdfs:
            for arm, v in zip(pdf["__arm"], pdf["__v"]):
                if v is None or pd.isna(v):
                    continue
                v = float(v)
                if arm == "a":
                    na += 1
                    sa += q(v, Q6)
                    ssa += q(v * v, Q12)
                else:
                    nb += 1
                    sb += q(v, Q6)
                    ssb += q(v * v, Q12)
        lam = delta = None
        if na >= 1 and nb >= 1:
            csa, cssa = float(sa), float(ssa)
            csb, cssb = float(sb), float(ssb)
            fa, fb = float(na), float(nb)
            delta = csa / fa - csb / fb
            if na >= 2 and nb >= 2:
                s2 = (
                    (cssa - csa * csa / fa) + (cssb - csb * csb / fb)
                ) / (fa + fb - 2.0)
                if s2 > 0:
                    vn = s2 * (1.0 / fa + 1.0 / fb)
                    a_ = vn + t2
                    import math

                    # Spark's EXP saturates to +inf past ~709 where
                    # Python raises — replicate the saturation
                    try:
                        e = math.exp(
                            delta * delta * t2 / (2.0 * vn * a_)
                        )
                    except OverflowError:
                        e = float("inf")
                    # 1e6 cap: see the batch twin — past it, engine
                    # exp() ulp differences exceed the 6-dp absorber
                    lam = min(math.sqrt(vn / a_) * e, 1e6)
                    if mx is None or lam > mx:
                        mx = lam
        state.update(
            (na, str(sa), str(ssa), nb, str(sb), str(ssb), mx)
        )
        p = None if mx is None else round6(min(1.0, 1.0 / mx))
        yield pd.DataFrame(
            {
                "grp": [str(key[0])],
                "n_a": [na],
                "n_b": [nb],
                "delta": [None if delta is None else round6(delta)],
                "lam": [None if lam is None else round6(lam)],
                "p_always": [p],
            }
        )

    return update


def streaming_msprt(
    stream: DataFrame,
    group_col: str,
    arm_col: str,
    value_col: str,
    *,
    tau: float = 1.0,
) -> DataFrame:
    """Streaming half of the always-valid mSPRT monitor (the x256
    batch twin, behavior.msprt_monitor): per-group cumulative exact
    decimal arm moments in the state store, Λ evaluated once per
    micro-batch trigger — each trigger IS a look, and the always-
    valid p (min over looks of 1/max Λ) is monotone by construction,
    so the sink can be polled at any cadence without alpha
    inflation.  When micro-batches align with the batch operator's
    day grain, the streamed p equals the batch ``p_always`` at every
    day boundary bitwise (pinned by the cross-batch pytest).

    Output mode: update — ``(grp, n_a, n_b, delta, lam, p_always)``
    per trigger.
    """
    t2 = float(tau) * float(tau)
    src = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(arm_col).cast("string").alias("__arm"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return src.groupBy("grp").applyInPandasWithState(
        _msprt_update_factory(t2),
        outputStructType=MSPRT_OUTPUT,
        stateStructType=MSPRT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------- streaming Bloom-filter maintenance

BLOOM_OUTPUT = StructType(
    [
        StructField("file", StringType()),
        StructField("n_keys", LongType()),
        StructField("bits_set", LongType()),
        StructField("fill_frac", DoubleType()),
        StructField("bloom_hex", StringType()),
    ]
)

BLOOM_STATE = StructType(
    [
        StructField("n_keys", LongType()),
        StructField("bloom_hex", StringType()),
    ]
)


def _bloom_update_factory(m_bits: int, k_hashes: int, salt: str):
    import hashlib

    m = int(m_bits)
    kf = int(k_hashes)
    hexw = m // 4  # fixed-width hex so state size is constant

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_keys, hx = state.get
            bitmap = int(hx, 16)
        else:
            n_keys, bitmap = 0, 0
        for pdf in pdfs:
            for k in pdf["key"]:
                s = str(k)
                for i in range(kf):
                    h = int(
                        hashlib.md5(
                            f"{salt}{i}:{s}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    bitmap |= 1 << (h % m)
                n_keys += 1
        hx = format(bitmap, f"0{hexw}x")
        state.update((n_keys, hx))
        bits = bitmap.bit_count()
        yield pd.DataFrame(
            {
                "file": [key[0]],
                "n_keys": [n_keys],
                "bits_set": [bits],
                "fill_frac": [round(bits / m, 6)],
                "bloom_hex": [hx],
            }
        )

    return update


def streaming_bloom_filter(
    rows: DataFrame,
    *,
    m_bits: int = 1024,
    k_hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Cross-batch per-file Bloom-filter maintenance — the incremental
    half of the data-skipping story (layout.bloom_skip_audit): as a
    streaming ingest appends keys to a file/partition, its filter is
    kept current in O(m_bits) state per key, so point-lookup skipping
    never needs a full rebuild pass over 100 TB.

    Input schema: ``(file string, key)``.  The update is BITWISE OR —
    idempotent and mergeable like the HLL/MinHash twins, so replayed
    micro-batches cannot corrupt the filter, and the streamed bitmap
    equals the batch ``layout.bloom_build`` words on the union of all
    batches bit for bit (the pytest proof: word w of the bitmap is
    bits [32w, 32w+32), identical packing).  Per-trigger output rows
    carry the running fill fraction — the saturation gauge that says
    when a file needs a wider filter.  Output mode: update.
    """
    return rows.groupBy("file").applyInPandasWithState(
        _bloom_update_factory(m_bits, k_hashes, salt),
        outputStructType=BLOOM_OUTPUT,
        stateStructType=BLOOM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------- streaming Kalman local-level twin

KALMAN_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("level", DoubleType()),
        StructField("gain", DoubleType()),
    ]
)

KALMAN_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("x", DoubleType()),
        StructField("p", DoubleType()),
        StructField("k", DoubleType()),
    ]
)


def _kalman_update_factory(q: float, r: float, p0: float):
    """Per-key cross-batch Kalman update — BYTE-IDENTICAL recursion to
    the batch operator (operators/temporal.py:_kalman_level_series):
    micro-batch rows sort by (ts_us, event_id) so replaying N batches
    equals one batch over the concatenation, and the state tuple is
    exactly the (n, x̂, P, K) the batch recursion holds after the same
    prefix."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, x, p, k = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for v in rows["value"]:
            if v is None or pd.isna(v):
                continue
            y = float(v)
            if n == 0:
                x, p, k = y, p0, 0.0
            else:
                pp = p + q
                k = pp / (pp + r)
                x = x + k * (y - x)
                p = (1.0 - k) * pp
            n += 1
        state.update((n, x, p, k))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n],
                "level": [None if n == 0 else x],
                "gain": [None if n == 0 else k],
            }
        )

    return update


def streaming_kalman_level(
    events: DataFrame,
    *,
    q: float = 4.0,
    r: float = 16.0,
    p0: float = 100.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Cross-batch local-level Kalman filter per event type — the
    streaming twin of the batch operator behind x355
    (operators/temporal.py:kalman_level): the state store carries one
    (n, x̂, P, K) tuple per key, each micro-batch folds its rows in
    (ts_us, event_id) order through the identical pinned recursion,
    and the emitted level after the final batch is BIT-EQUAL to the
    batch filter over the concatenated stream (asserted in tests).
    State is O(keys); replaying from a checkpoint reproduces the same
    floats because the recursion order is total.

    Input needs ``ts_us`` (µs epoch long), ``event_id``,
    ``event_type``, ``value``.  Output mode: update.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    cols = src.select(
        "ts", "ts_us", "event_id", "event_type", "value"
    ) if "ts" in src.columns else src.select(
        "ts_us", "event_id", "event_type", "value"
    )
    return cols.groupBy("event_type").applyInPandasWithState(
        _kalman_update_factory(float(q), float(r), float(p0)),
        outputStructType=KALMAN_OUTPUT,
        stateStructType=KALMAN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------ streaming SpaceSaving heavy hitters (per key)

SPACESAVING_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("item", LongType()),
        StructField("est_count", LongType()),
        StructField("max_err", LongType()),
    ]
)

SPACESAVING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)


def _spacesaving_update_factory(k: int):
    """Metwally–Agrawal–El Abbadi SpaceSaving (ICDT 2005) with a
    total-order eviction tie-break (min count, then LARGEST item id —
    deterministic replay).  Guarantees after any prefix:
    ``true <= est <= true + err`` per tracked item, and every item
    with true frequency > n/k is tracked."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, items, counts, errs = state.get
            table = {
                i: [c, e] for i, c, e in zip(items, counts, errs)
            }
        else:
            n, table = 0, {}
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for u in rows["user_id"]:
            if u is None or pd.isna(u):
                continue
            item = int(u)
            n += 1
            if item in table:
                table[item][0] += 1
            elif len(table) < k:
                table[item] = [1, 0]
            else:
                evict = min(
                    table.items(), key=lambda kv: (kv[1][0], -kv[0])
                )
                mc = evict[1][0]
                del table[evict[0]]
                table[item] = [mc + 1, mc]
        items = sorted(table)
        state.update(
            (
                n,
                items,
                [table[i][0] for i in items],
                [table[i][1] for i in items],
            )
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(items),
                "n_seen": [n] * len(items),
                "item": items,
                "est_count": [table[i][0] for i in items],
                "max_err": [table[i][1] for i in items],
            }
        )

    return update


def streaming_space_saving(
    events: DataFrame,
    *,
    k: int = 8,
    watermark: str = "2 hours",
) -> DataFrame:
    """Cross-batch SpaceSaving top-k heavy hitters per event type —
    the bounded-memory frequent-items sketch (O(k) counters per key,
    NEVER O(distinct)) that answers "which users dominate this event
    stream" while the stream runs; the exact groupBy-count twin is
    the batch verifier (asserted in tests: estimates bracket the
    true counts within the tracked error, and every item above the
    n/k guarantee threshold is present).  Deterministic replay: rows
    fold in (ts_us, event_id) order, eviction tie-breaks totally.

    Output mode: update; emits the tracked table per micro-batch.
    """
    if k < 1:
        raise ValueError("streaming_space_saving: k must be >= 1")
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    cols = [c for c in ("ts", "ts_us", "event_id", "event_type",
                        "user_id") if c in src.columns]
    return src.select(*cols).groupBy("event_type").applyInPandasWithState(
        _spacesaving_update_factory(int(k)),
        outputStructType=SPACESAVING_OUTPUT,
        stateStructType=SPACESAVING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QSKETCH_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("p", DoubleType()),
        StructField("est", DoubleType()),
        StructField("summary_size", LongType()),
    ]
)

QSKETCH_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("levels", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _qsketch_update_factory(k: int, probs: tuple):
    """Deterministic KLL/MRL compactor ladder (the
    operators/sketch.py:quantile_sketch rule: full level sorts, keeps
    its 1-based odd-index half at doubled weight) held per key as
    flattened (level, value) arrays — O(k·log n) state, bitwise
    replayable because insertion order is pinned to
    (ts_us, event_id) and the compaction rule has no randomness."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, lv, va = state.get
            nlev = (max(lv) + 1) if lv else 1
            levels = [[] for _ in range(nlev)]
            for ell, v in zip(lv, va):
                levels[int(ell)].append(float(v))
        else:
            n, levels = 0, [[]]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for v in rows["value"]:
            if v is None or pd.isna(v):
                continue
            levels[0].append(float(v))
            n += 1
            lev = 0
            while len(levels[lev]) >= k:
                buf = sorted(levels[lev])
                keep = buf[0::2]
                levels[lev] = []
                if lev + 1 == len(levels):
                    levels.append([])
                levels[lev + 1].extend(keep)
                lev += 1
        lv_out, va_out = [], []
        for ell, buf in enumerate(levels):
            for v in buf:
                lv_out.append(ell)
                va_out.append(v)
        state.update((n, lv_out, va_out))
        weighted = sorted(
            (v, 1 << ell) for ell, v in zip(lv_out, va_out)
        )
        total = sum(w for _, w in weighted)
        out = {"event_type": [], "n_seen": [], "p": [], "est": [],
               "summary_size": []}
        for p in probs:
            target = p * total
            cum = 0
            est = weighted[-1][0] if weighted else None
            for v, w in weighted:
                cum += w
                if cum >= target:
                    est = v
                    break
            out["event_type"].append(key[0])
            out["n_seen"].append(n)
            out["p"].append(p)
            out["est"].append(est)
            out["summary_size"].append(len(weighted))
        yield pd.DataFrame(out)

    return update


def streaming_quantile_sketch(
    events: DataFrame,
    *,
    k: int = 8,
    probs: tuple = (0.25, 0.5, 0.9),
    watermark: str = "2 hours",
) -> DataFrame:
    """Cross-batch mergeable quantile sketch per event type — the
    streaming twin of :func:`~fame2pygen_spark.operators.sketch.
    quantile_sketch`: the identical deterministic compactor ladder
    held in the state store (O(k·log n) per key vs the exact path's
    O(n) buffering), so a stream that folds the same rows in the same
    pinned order lands on the SAME estimates as the batch operator
    over the concatenated data (asserted bitwise in tests).

    Output mode: update; emits the per-probability estimates each
    micro-batch.
    """
    if k < 2 or k % 2:
        raise ValueError("streaming_quantile_sketch: k must be even >= 2")
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    cols = [c for c in ("ts", "ts_us", "event_id", "event_type",
                        "value") if c in src.columns]
    return src.select(*cols).groupBy("event_type").applyInPandasWithState(
        _qsketch_update_factory(int(k), tuple(float(p) for p in probs)),
        outputStructType=QSKETCH_OUTPUT,
        stateStructType=QSKETCH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
