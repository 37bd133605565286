"""Training-pipeline operators: repetition/quality filters, data
mixing, decontamination, PII scrub, passage dedup (x16–x21)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ repetition / gopher


def test_repetition_profile_planted(spark):
    from fame2pygen_spark.operators.text import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "a b c d e a b c d e"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r
        for r in repetition_profile(df, "text", "doc_id").collect()
    }
    # doc 1: 3 occurrences of "spam spam" (9 chars) over 19 norm chars
    assert out[1]["top_gram"] == "spam spam"
    assert out[1]["top_gram_count"] == 3
    assert out[1]["top_2gram_char_frac"] == pytest.approx(27 / 19, abs=1e-6)
    # 4 tokens -> no 5-grams -> dup fraction 0
    assert out[1]["dup_5gram_frac"] == 0.0
    # doc 2: 6 5-grams, 5 distinct -> 1/6 duplicated
    assert out[2]["dup_5gram_frac"] == pytest.approx(1 - 5 / 6, abs=1e-6)
    # doc 3: no repeats at all
    assert out[3]["top_gram_count"] == 1
    assert out[3]["dup_5gram_frac"] == 0.0
    assert out[3]["n_tokens"] == 7


def test_gopher_filter_branches(spark):
    from fame2pygen_spark.operators.text import gopher_filter

    good = " ".join(f"word{i}" for i in range(40))
    spammy = "buy now " * 30
    df = spark.createDataFrame(
        [(1, good), (2, spammy), (3, "too short")],
        "doc_id long, text string",
    )
    out = {r["doc"]: r["keep"] for r in gopher_filter(df, "text", "doc_id").collect()}
    assert out[1] is True
    assert out[2] is False  # top-2gram fraction ~1
    assert out[3] is False  # under min_tokens


# --------------------------------------------------------- mixing


def test_stratified_sample_deterministic(spark):
    from fame2pygen_spark.operators.mixing import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id long, source string",
    )
    kept1 = stratified_sample(df, "source", {"a": 1.0, "b": 0.5}, "doc_id")
    kept2 = stratified_sample(df, "source", {"a": 1.0, "b": 0.5}, "doc_id")
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    ids2 = sorted(r["doc_id"] for r in kept2.collect())
    assert ids1 == ids2  # pure function of (salt, id)
    # rate 1.0 keeps every a-row; rate 0.5 keeps a strict subset of b
    a_rows = [i for i in ids1 if i % 2 == 0]
    b_rows = [i for i in ids1 if i % 2 == 1]
    assert len(a_rows) == 100
    assert 0 < len(b_rows) < 100
    # default_rate=0 drops strata missing from the map
    none_kept = stratified_sample(df, "source", {"zzz": 1.0}, "doc_id")
    assert none_kept.count() == 0


def test_split_corpus_disjoint_total(spark):
    from fame2pygen_spark.operators.mixing import split_corpus

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = split_corpus(
        df, "doc_id", fractions={"train": 0.6, "val": 0.2, "test": 0.2}
    )
    rows = out.collect()
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    assert len(rows) == 300  # fractions sum to 1 -> nothing dropped
    by = {s: sum(1 for r in rows if r["split"] == s) for s in ("train", "val", "test")}
    assert by["train"] > by["val"]  # rough proportionality


def test_assign_token_shards_greedy(spark):
    from fame2pygen_spark.operators.mixing import assign_token_shards

    text10 = " ".join(["tok"] * 10)
    df = spark.createDataFrame(
        [(i, "s", text10) for i in range(1, 6)],
        "doc_id long, source string, text string",
    )
    out = assign_token_shards(
        df, "text", "doc_id", shard_tokens=25, partition_col="source"
    )
    shards = {r["doc_id"]: r["shard"] for r in out.collect()}
    # cums 10,20,30,40,50 -> floor((cum-10)/25) = 0,0,0,1,1
    assert shards == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}


# -------------------------------------------------- decontamination


def test_contamination_and_decontaminate(spark):
    from fame2pygen_spark.operators.decontam import (
        contamination, decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta closing words")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares the full leading 8-gram with the benchmark doc
            (1, "alpha beta gamma delta epsilon zeta eta theta more stuff"),
            (2, "totally unrelated text with enough tokens to form grams ok"),
            (3, "short"),  # < 8 tokens: out of scope, never contaminated
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination(train, bench, "text", "doc_id", n=8).collect()
    }
    assert out[1]["contaminated"] is True
    assert out[1]["n_contaminated_ngrams"] >= 1
    assert out[2]["contaminated"] is False
    assert out[3]["contaminated"] is False

    surv = decontaminate(train, bench, "text", "doc_id", n=8)
    assert sorted(r["doc_id"] for r in surv.collect()) == [2, 3]
    assert surv.columns == train.columns


# ------------------------------------------------------------- PII


def test_scrub_pii_counts_and_redacts(spark):
    from fame2pygen_spark.operators.pii import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.user+x@site.co.uk or 10.0.0.1 ssn 123-45-6789 "
                "call 555-123-4567 end"),
            (2, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(df, "text").collect()}
    r1 = out[1]
    assert r1["n_pii_email"] == 1
    assert r1["n_pii_ipv4"] == 1
    assert r1["n_pii_ssn"] == 1
    assert r1["n_pii_phone"] == 1
    assert r1["n_pii"] == 4
    assert r1["text"] == (
        "mail <EMAIL> or <IP> ssn <SSN> call <PHONE> end"
    )
    assert out[2]["n_pii"] == 0
    assert out[2]["text"] == "clean text with no identifiers at all"


# ------------------------------------------------- passage dedup


def test_passage_dedup_planted(spark):
    from fame2pygen_spark.operators.dedup import passage_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),  # first window duplicates doc 1's
            (3, "  "),  # empty after normalization -> no output row
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r
        for r in passage_dedup(df, "text", "doc_id", passage_tokens=3).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["text"] == "a b c d e f"
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["text"] == "x y z"
    assert out[2]["n_passages"] == 2 and out[2]["n_kept"] == 1


# -------------------------------------------- embedding quantization


def test_quantize_embeddings_planted(spark):
    from fame2pygen_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [1.27, -0.635, 0.0]),     # scale 0.01 -> q 127, -64, 0
            (2, [0.0, 0.0, 0.0]),          # zero vector
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df, "embedding", "vec_id").collect()}
    assert out[1]["scale"] == pytest.approx(0.01, abs=1e-9)
    assert out[1]["q"] == [127, -63, 0]  # floor(-63.5+0.5) = -63
    assert out[2]["scale"] == 0.0
    assert out[2]["q"] == [0, 0, 0]
    assert out[2]["max_abs_err"] == 0.0
    # error bounded by scale/2 per component
    assert out[1]["max_abs_err"] <= 0.01 / 2 + 1e-9


# ------------------------------------------------------ URL / domains


def test_url_extraction_and_blocklist(spark):
    from fame2pygen_spark.operators.web import (
        domain_counts, flag_blocked_domains,
    )

    df = spark.createDataFrame(
        [
            (1, "see https://A.Example.com/x and http://b.org plus "
                "https://a.example.com/y"),
            (2, "no urls here"),
            (3, "bad link http://spam.bad.net/z?q=1 ok https://b.org/ok"),
        ],
        "doc_id long, text string",
    )
    counts = {r["domain"]: r for r in domain_counts(df, "text").collect()}
    assert counts["a.example.com"]["n_docs"] == 1
    assert counts["a.example.com"]["n_urls"] == 2  # two URLs, one doc
    assert counts["b.org"]["n_docs"] == 2

    flagged = {
        r["doc_id"]: r
        for r in flag_blocked_domains(df, "text", ["spam.bad.net"]).collect()
    }
    assert flagged[3]["blocked"] is True
    assert flagged[1]["blocked"] is False
    assert flagged[2]["n_blocked_domains"] == 0


# ------------------------------------------------ stream-stream join


def test_join_streams_batch_and_stream(spark, tmp_path):
    import datetime as dt

    from fame2pygen_spark.streaming.core import join_streams

    base = dt.datetime(2024, 1, 1, 10, 0)
    clicks = [
        (1, base, 7, "click", 0.0),
        (2, base + dt.timedelta(hours=2), 7, "click", 0.0),
    ]
    purchases = [
        (10, base + dt.timedelta(minutes=10), 7, "purchase", 5.0),  # joins click 1
        (11, base + dt.timedelta(minutes=50), 7, "purchase", 6.0),  # outside 30min
        (12, base + dt.timedelta(hours=2, minutes=5), 7, "purchase", 7.0),  # joins click 2
        (13, base + dt.timedelta(minutes=5), 8, "purchase", 8.0),  # other user
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    cdf = spark.createDataFrame(clicks, schema)
    pdf = spark.createDataFrame(purchases, schema)

    out = join_streams(cdf, pdf, on="user_id", ts_col="ts", max_delay_sec=1800)
    got = sorted((r["event_id"], r["r_event_id"]) for r in out.collect())
    assert got == [(1, 10), (2, 12)]

    # same operator on real streams: watermarked, range inside the join
    cpath, ppath = str(tmp_path / "clicks"), str(tmp_path / "purch")
    cdf.write.parquet(cpath)
    pdf.write.parquet(ppath)
    cs = spark.readStream.schema(cdf.schema).format("parquet").load(cpath)
    ps = spark.readStream.schema(pdf.schema).format("parquet").load(ppath)
    sj = join_streams(cs, ps, on="user_id", ts_col="ts", max_delay_sec=1800)
    q = (
        sj.writeStream.format("memory").queryName("sj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    srows = sorted(
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("select * from sj_out").collect()
    )
    assert srows == [(1, 10), (2, 12)]


def test_chunk_documents_reassembles(spark):
    from fame2pygen_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, "")],
        "doc_id long, text string",
    )
    # non-overlapping chunks concatenate back to the original text
    ch = chunk_documents(docs, "text", "doc_id", chunk_chars=4).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(ch, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert "".join(r["chunk_text"] for r in by_doc[1]) == "abcdefghij"
    assert [r["chunk_len"] for r in by_doc[1]] == [4, 4, 2]
    assert [r["chunk_start"] for r in by_doc[1]] == [1, 5, 9]
    assert "".join(r["chunk_text"] for r in by_doc[2]) == "abc"
    # empty document still emits exactly one empty chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == 0

    # overlapping stride: every char position is covered >= once
    ov = chunk_documents(
        docs, "text", "doc_id", chunk_chars=4, stride=2
    ).where(F.col("doc_id") == 1).collect()
    assert [r["chunk_start"] for r in sorted(ov, key=lambda r: r["chunk_idx"])] \
        == [1, 3, 5, 7, 9]


def test_pack_context_windows_partitions_tokens(spark):
    from fame2pygen_spark.operators.mixing import pack_context_windows

    docs = spark.createDataFrame(
        [(1, "s", "a " * 30), (2, "s", "b " * 85), (3, "s", "c " * 10),
         (4, "s", ""), (5, "t", "d " * 5)],
        "doc_id long, source string, text string",
    )
    out = pack_context_windows(
        docs, "text", "doc_id", window_tokens=50, partition_col="source"
    )
    rows = out.collect()
    # every document's window spans sum to its token count
    by_doc: dict[int, int] = {}
    for r in rows:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["win_tok"]
    assert by_doc == {1: 30, 2: 85, 3: 10, 4: 0, 5: 5}
    # doc 2 straddles: starts at token 30, ends at 115 -> windows 0,1,2
    w2 = sorted(
        (r["window_id"], r["tok_offset"], r["win_tok"])
        for r in rows if r["doc_id"] == 2
    )
    assert w2 == [(0, 0, 20), (1, 20, 50), (2, 70, 15)]
    # every window except the last per source is exactly full
    per_win: dict[tuple, int] = {}
    for r in rows:
        key = (r["source"], r["window_id"])
        per_win[key] = per_win.get(key, 0) + r["win_tok"]
    assert per_win[("s", 0)] == 50 and per_win[("s", 1)] == 50
    assert per_win[("s", 2)] == 25 and per_win[("t", 0)] == 5


def test_kmv_distinct_exact_below_k(spark):
    from fame2pygen_spark.operators.sketch import kmv_distinct

    # 10 distinct values repeated 7x each: below k -> exact count
    rows = [("g", f"v{i}") for i in range(10) for _ in range(7)]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = kmv_distinct(df, ["grp"], "val", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_kept"] == 10 and r["n_hash_distinct"] == 10
    assert r["est_distinct"] == 10.0


def test_kmv_distinct_estimate_accuracy_and_dup_insensitivity(spark):
    from fame2pygen_spark.operators.sketch import kmv_distinct

    n_true = 5000
    uniq = [("g", f"v{i}") for i in range(n_true)]
    df = spark.createDataFrame(uniq, "grp string, val string")
    # k=256 -> relative std error ~ 1/sqrt(k-2) ~ 6.3%; assert 4 sigma
    r = kmv_distinct(df, ["grp"], "val", k=256).collect()[0]
    assert r["n_kept"] == 256
    assert abs(r["est_distinct"] - n_true) / n_true < 0.25
    # duplicates cannot change the sketch: same estimate bit-for-bit
    dup = spark.createDataFrame(uniq * 3, "grp string, val string")
    r2 = kmv_distinct(dup, ["grp"], "val", k=256).collect()[0]
    assert r2["est_distinct"] == r["est_distinct"]
    assert r2["n_hash_distinct"] == r["n_hash_distinct"]


def test_group_quantiles_exact_interpolation(spark):
    from fame2pygen_spark.operators.sketch import group_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)] + [("b", 10.0)],
        "grp string, value double",
    )
    out = {r["grp"]: r for r in group_quantiles(
        df, ["grp"], "value", [0.25, 0.5, 0.999]
    ).collect()}
    # linear interpolation at p*(n-1): n=4 -> p50 at idx 1.5 = 2.5
    a = out["a"]
    assert a["n"] == 4
    assert a["p25"] == 1.75 and a["p50"] == 2.5
    assert abs(a["p99_9"] - (3 + 0.997)) < 1e-6
    b = out["b"]
    assert b["n"] == 1 and b["p50"] == 10.0


def test_group_quantiles_approx_bounds_error(spark):
    from fame2pygen_spark.operators.sketch import group_quantiles

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(10_000)], "grp string, value double"
    )
    probs = [0.25, 0.5, 0.9]
    exact = group_quantiles(df, ["grp"], "value", probs).collect()[0]
    approx = group_quantiles(
        df, ["grp"], "value", probs, approx=True, accuracy=10_000
    ).collect()[0]
    assert approx["n"] == exact["n"] == 10_000
    for c in ("p25", "p50", "p90"):
        # t-digest rank error <= n/accuracy = 1 rank -> value error <= 2
        assert abs(approx[c] - exact[c]) <= 2.0


def test_funnel_conversion_ordering_and_window(spark):
    from fame2pygen_spark.operators.behavior import funnel_conversion

    H = 3_600_000_000  # 1h in µs
    rows = [
        # u1 completes in order
        (1, "signup", 1 * H), (1, "click", 2 * H), (1, "purchase", 3 * H),
        # u2: purchase BEFORE click -> stops at click
        (2, "signup", 1 * H), (2, "purchase", 2 * H), (2, "click", 3 * H),
        # u3: click only -> never enters the funnel
        (3, "click", 1 * H),
        # u4: click at exactly t1 (not strictly after) -> stops at signup
        (4, "signup", 5 * H), (4, "click", 5 * H),
        # u5: completes but the purchase is outside the window
        (5, "signup", 0), (5, "click", 1 * H), (5, "purchase", 50 * H),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    out = {r["step"]: r for r in funnel_conversion(
        ev, ["signup", "click", "purchase"], within_us=10 * H
    ).collect()}
    assert out["signup"]["n_users"] == 4      # u1 u2 u4 u5
    assert out["click"]["n_users"] == 3       # u1 u2 u5 (u4 tie excluded)
    assert out["purchase"]["n_users"] == 1    # u1 only (u5 out of window)
    assert out["signup"]["pct_of_first"] == 1.0
    assert out["purchase"]["pct_of_first"] == 0.25


def test_cohort_retention_planted(spark):
    from fame2pygen_spark.operators.behavior import cohort_retention

    D = 86_400_000_000
    rows = [
        # cohort day 0: u1 returns day 1 and 7; u2 only day 0
        (1, 0), (1, 1 * D), (1, 7 * D),
        (2, 0),
        # cohort day 2: u3 returns day 3 (offset 1)
        (3, 2 * D), (3, 3 * D),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    out = {(r["cohort_day"], r["day_offset"]): r for r in
           cohort_retention(ev, offsets=(0, 1, 7)).collect()}
    assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["n_cohort"] == 2
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(0, 7)]["n_active"] == 1
    assert out[(2, 1)]["n_active"] == 1 and out[(2, 1)]["n_cohort"] == 1
    assert (2, 7) not in out  # no activity -> no row


def test_bm25_rank_formula_and_ordering(spark):
    import math

    from fame2pygen_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [(1, "spark spark join"), (2, "spark other words here"),
         (3, "nothing relevant at all"), (4, "")],
        "doc_id long, text string",
    )
    out = bm25_rank(docs, "text", "doc_id", ["spark"], top_n=10).collect()
    # doc 3 and the empty doc score 0 -> excluded
    ids = [r["doc_id"] for r in out]
    assert ids == [1, 2]  # higher tf and shorter dl rank first
    # replicate the closed form for doc 1: N=4, df=2, avgdl=(3+4+4+0)/4
    n, dfq, avgdl, k1, b = 4, 2, 11 / 4, 1.2, 0.75
    idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
    tf, dl = 2, 3
    expect = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(out[0]["score"] - round(expect, 6)) < 1e-9
    assert out[0]["tf_0"] == 2 and out[0]["dl"] == 3


def test_event_transitions_counts_and_rownorm(spark):
    from fame2pygen_spark.operators.behavior import event_transitions

    rows = [
        # u1 path: a -> b -> a -> c ; u2 path: a -> b
        (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"), (4, 1, 40, "c"),
        (5, 2, 10, "a"), (6, 2, 20, "b"),
        # tie on ts: event_id orders 7 before 8 -> b -> c, not c -> b
        (7, 3, 10, "b"), (8, 3, 10, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    )
    out = {(r["from_type"], r["to_type"]): r
           for r in event_transitions(ev).collect()}
    assert out[("a", "b")]["n"] == 2
    assert out[("b", "a")]["n"] == 1
    assert out[("a", "c")]["n"] == 1
    assert out[("b", "c")]["n"] == 1
    assert ("c", "b") not in out
    # row-normalized: from 'a' -> b (2/3), c (1/3); from 'b' -> a,c (1/2)
    assert out[("a", "b")]["p"] == round(2 / 3, 6)
    assert out[("a", "c")]["p"] == round(1 / 3, 6)
    assert out[("b", "a")]["p"] == 0.5


def test_countmin_overestimates_never_under(spark):
    from fame2pygen_spark.operators.sketch import (
        countmin_estimate, countmin_sketch,
    )

    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "word string")
    out = {r["term"]: r for r in countmin_estimate(
        df, "word", ["a", "b", "c", "absent"], depth=3, width=64
    ).collect()}
    for term, true_n in (("a", 100), ("b", 10), ("c", 1), ("absent", 0)):
        r = out[term]
        assert r["true_n"] == true_n
        assert r["est_n"] >= true_n  # CMS guarantee: only overestimates
    # total mass conservation per sketch row
    sk = countmin_sketch(df, "word", depth=3, width=64).collect()
    per_row: dict[int, int] = {}
    for cell in sk:
        per_row[cell["r"]] = per_row.get(cell["r"], 0) + cell["c"]
    assert per_row == {0: 111, 1: 111, 2: 111}


def test_sample_per_group_quota_and_mergeability(spark):
    from fame2pygen_spark.operators.mixing import sample_per_group

    rows = [(i, "big") for i in range(100)] + [(1000, "tiny"), (1001, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = sample_per_group(df, ["grp"], "doc_id", k=5).collect()
    by_grp: dict[str, list] = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert len(by_grp["big"]) == 5
    assert sorted(r["sample_rank"] for r in by_grp["big"]) == [1, 2, 3, 4, 5]
    # short group passes through whole
    assert len(by_grp["tiny"]) == 2
    # mergeable: bottom-k of shard-wise bottom-k == global bottom-k
    shard_a = df.where(F.col("doc_id") % 2 == 0)
    shard_b = df.where(F.col("doc_id") % 2 == 1)
    merged = sample_per_group(
        sample_per_group(shard_a, ["grp"], "doc_id", k=5)
        .drop("sample_rank")
        .unionByName(
            sample_per_group(shard_b, ["grp"], "doc_id", k=5)
            .drop("sample_rank")
        ),
        ["grp"], "doc_id", k=5,
    )
    direct = {(r["grp"], r["doc_id"]) for r in out}
    assert {(r["grp"], r["doc_id"]) for r in merged.collect()} == direct


def test_value_outliers_flags_planted_spike(spark):
    from fame2pygen_spark.operators.behavior import value_outliers

    rows = [(i, "a", 10.0 + (i % 2)) for i in range(40)] + [(99, "a", 1e6)]
    rows += [(200, "b", 5.0), (201, "b", 5.0)]  # constant group
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_id"]: r for r in value_outliers(ev).collect()}
    assert out[99]["is_outlier"] is True
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1
    # constant group: sigma 0 -> null z -> flagged false, never null
    assert out[200]["is_outlier"] is False and out[200]["z"] is None


def test_inter_arrival_quantiles_planted(spark):
    from fame2pygen_spark.operators.behavior import inter_arrival_quantiles

    rows = [
        (1, 1, "a", 0), (2, 1, "a", 10), (3, 1, "a", 30),   # gaps 10, 20
        (4, 2, "a", 100), (5, 2, "a", 140),                 # gap 40
        (6, 3, "b", 0),                                     # no gap
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    )
    out = {r["event_type"]: r for r in
           inter_arrival_quantiles(ev, (0.5,)).collect()}
    a = out["a"]
    assert a["n"] == 3 and a["p50"] == 20.0  # median of 10, 20, 40
    assert "b" not in out  # single event -> no gaps -> no row


def test_term_cooccurrence_pmi_planted(spark):
    import math

    from fame2pygen_spark.operators.text import term_cooccurrence_pmi

    # "x y" co-occur in 3 of 6 docs; "x z" in only 1 (below min_count)
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x y"), (4, "x z"), (5, "y q"), (6, "q r")],
        "doc_id long, text string",
    )
    out = term_cooccurrence_pmi(
        docs, "text", "doc_id", min_count=2, max_terms_per_doc=10
    ).collect()
    pairs = {(r["term_a"], r["term_b"]): r for r in out}
    assert ("x", "z") not in pairs  # pruned by min_count
    xy = pairs[("x", "y")]
    assert xy["n_ab"] == 3 and xy["n_a"] == 4 and xy["n_b"] == 4
    assert xy["pmi"] == round(math.log(6 * 3 / (4 * 4)), 6)
    # cap: a doc with many distinct terms contributes at most m
    wide = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))] * 2
        + [(2, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string",
    ).dropDuplicates(["doc_id"])
    capped = term_cooccurrence_pmi(
        wide, "text", "doc_id", min_count=2, max_terms_per_doc=4
    ).collect()
    # 4 kept terms -> at most C(4,2)=6 distinct pairs
    assert len(capped) <= 6


def test_rollup_and_cube_summary_grouping_ids(spark):
    from fame2pygen_spark.operators.olap import cube_summary, rollup_summary

    df = spark.createDataFrame(
        [("r1", "n1", 1.0), ("r1", "n2", 2.0), ("r2", "n3", 4.0)],
        "r string, n string, v double",
    )
    measures = {"total": F.sum("v")}
    roll = {(r["r"], r["n"]): r for r in
            rollup_summary(df, ["r", "n"], measures).collect()}
    # detail + per-r subtotal + grand total = 3 + 2 + 1 rows
    assert len(roll) == 6
    assert roll[("r1", None)]["total"] == 3.0
    assert roll[("r1", None)]["grouping_id"] == 1
    assert roll[(None, None)]["total"] == 7.0
    assert roll[(None, None)]["grouping_id"] == 3
    assert roll[("r1", "n1")]["grouping_id"] == 0

    cube = cube_summary(df, ["r", "n"], measures).collect()
    # cube adds the per-n slice: 6 rollup rows + 3 (None, n) rows
    assert len(cube) == 9
    per_n = {r["n"]: r for r in cube if r["grouping_id"] == 2}
    assert per_n["n1"]["total"] == 1.0 and per_n["n3"]["total"] == 4.0


def test_weighted_sample_per_group_bias_and_exclusions(spark):
    from fame2pygen_spark.operators.mixing import weighted_sample_per_group

    # one heavy row among many light ones; zero/null weights excluded
    rows = [(i, "g", 1.0) for i in range(200)]
    rows[7] = (7, "g", 10_000.0)
    rows += [(900, "g", 0.0), (901, "g", None)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample_per_group(df, ["grp"], "doc_id", "w", k=20).collect()
    ids = {r["doc_id"] for r in out}
    assert len(out) == 20
    assert 7 in ids          # ~10k× weight -> virtually certain inclusion
    assert 900 not in ids and 901 not in ids
    assert sorted(r["sample_rank"] for r in out) == list(range(1, 21))
    # mergeability: shard-wise bottom-k then re-reduce equals direct
    a = df.where(F.col("doc_id") % 2 == 0)
    b = df.where(F.col("doc_id") % 2 == 1)
    merged = weighted_sample_per_group(
        weighted_sample_per_group(a, ["grp"], "doc_id", "w", k=20)
        .drop("sample_rank")
        .unionByName(
            weighted_sample_per_group(b, ["grp"], "doc_id", "w", k=20)
            .drop("sample_rank")
        ),
        ["grp"], "doc_id", "w", k=20,
    )
    assert {r["doc_id"] for r in merged.collect()} == ids


def test_group_histogram_bins_and_clamping(spark):
    from fame2pygen_spark.operators.sketch import group_histogram

    df = spark.createDataFrame(
        [("g", -5.0), ("g", 0.0), ("g", 9.9), ("g", 10.0), ("g", 25.0),
         ("g", 100.0), ("g", 999.0), ("g", None)],
        "grp string, v double",
    )
    out = {r["bin"]: r for r in group_histogram(
        df, ["grp"], "v", lo=0.0, hi=100.0, bins=10
    ).collect()}
    assert out[0]["n"] == 3          # -5 clamped in, 0.0, 9.9
    assert out[1]["n"] == 1          # 10.0 opens bin 1
    assert out[2]["n"] == 1          # 25.0
    assert out[9]["n"] == 2          # 100.0 and 999.0 clamp to last bin
    assert out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 10.0
    assert sum(r["n"] for r in out.values()) == 7  # null dropped


def test_fuzzy_self_pairs_blocking_and_distance(spark):
    from fame2pygen_spark.operators.linkage import fuzzy_self_pairs

    df = spark.createDataFrame(
        [(1, "red widget"), (2, "rad widget"), (3, "blue widget"),
         (4, "red gadget"),       # different block: never compared
         (5, "extremely long red widget")],  # same block, length-pruned
        "id long, name string",
    )
    out = fuzzy_self_pairs(df, "name", "id", max_distance=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in out}
    assert pairs[(1, 2)] == 1
    assert (1, 4) not in pairs   # cross-block (the blocking trade-off)
    assert (1, 5) not in pairs   # length band prunes before levenshtein
    assert (1, 3) not in pairs   # distance 3 > max 2
    # distance 2 pair appears: "rad widget" vs "blue widget"? no (4) —
    # check symmetric dedup: only id_a < id_b emitted
    assert all(a < b for a, b in pairs)


def test_fuzzy_self_pairs_block_cap_bounds_candidates(spark):
    from fame2pygen_spark.operators.linkage import fuzzy_self_pairs

    # 50 identical names in one block, cap at 10 -> at most C(10,2) pairs
    df = spark.createDataFrame(
        [(i, "same name") for i in range(50)], "id long, name string"
    )
    out = fuzzy_self_pairs(df, "name", "id", max_distance=0, max_block=10)
    assert out.count() == 45  # C(10,2)


def test_winsorize_clips_to_group_quantiles(spark):
    from fame2pygen_spark.operators.sketch import winsorize

    vals = [float(i) for i in range(101)]  # p01=1.0, p99=99.0 exactly
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None)], "grp string, value double"
    )
    out = {r["value"]: r for r in winsorize(df, ["grp"], "value").collect()}
    assert out[0.0]["value_w"] == 1.0 and out[0.0]["clipped"] is True
    assert out[100.0]["value_w"] == 99.0 and out[100.0]["clipped"] is True
    assert out[50.0]["value_w"] == 50.0 and out[50.0]["clipped"] is False
    assert out[None]["value_w"] is None and out[None]["clipped"] is False


def test_pivot_table_counts_and_sums(spark):
    from fame2pygen_spark.sources.reshape import pivot_table

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 4.0),
         ("b", "y", 8.0), ("b", "z", 16.0)],  # z not in the value list
        "grp string, piv string, v double",
    )
    out = {r["grp"]: r for r in pivot_table(
        df, ["grp"], "piv", ["x", "y"]
    ).collect()}
    assert out["a"]["piv_x"] == 2 and out["a"]["piv_y"] == 1
    assert out["b"]["piv_x"] == 0 and out["b"]["piv_y"] == 1  # z ignored
    sums = {r["grp"]: r for r in pivot_table(
        df, ["grp"], "piv", ["x", "y"], "v", agg="sum"
    ).collect()}
    assert sums["a"]["piv_x"] == 3.0 and sums["a"]["piv_y"] == 4.0
    assert sums["b"]["piv_x"] is None  # no matching rows -> null sum


def test_last_touch_attribution_window_and_ties(spark):
    from fame2pygen_spark.operators.behavior import last_touch_attribution

    H = 3_600_000_000
    rows = [
        # u1: clicks at 1h and 2h, purchase at 3h -> credited to click@2h
        (10, 1, "click", 1 * H), (11, 1, "click", 2 * H),
        (12, 1, "purchase", 3 * H),
        # u1 second purchase at 50h: last click 48h earlier -> outside 24h
        (13, 1, "purchase", 50 * H),
        # u2: click tie on ts -> greatest touch_id wins
        (20, 2, "click", 1 * H), (21, 2, "click", 1 * H),
        (22, 2, "purchase", 1 * H),  # inclusive at equal ts
        # u3: purchase with no clicks at all
        (30, 3, "purchase", 5 * H),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    )
    out = {r["conversion_id"]: r for r in last_touch_attribution(
        ev, lookback_us=24 * H
    ).collect()}
    assert out[12]["touch_id"] == 11 and out[12]["attributed"] is True
    assert out[13]["touch_id"] is None and out[13]["attributed"] is False
    assert out[22]["touch_id"] == 21  # tie -> greatest id
    assert out[30]["attributed"] is False and out[30]["touch_ts_us"] is None


def test_group_ranks_definitions(spark):
    from fame2pygen_spark.operators.ranking import group_ranks

    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", 20.0), (3, "g", 20.0), (4, "g", 40.0)],
        "id long, grp string, value double",
    )
    out = {r["id"]: r for r in group_ranks(
        df, ["grp"], "value", "id", buckets=2
    ).collect()}
    # percent_rank = (rank-1)/(n-1); ties share rank
    assert out[1]["pct_rank"] == 0.0
    assert out[2]["pct_rank"] == out[3]["pct_rank"] == round(1 / 3, 6)
    assert out[4]["pct_rank"] == 1.0
    # cume_dist counts peers inclusively
    assert out[1]["cdf"] == 0.25
    assert out[2]["cdf"] == out[3]["cdf"] == 0.75
    assert out[4]["cdf"] == 1.0
    # ntile(2) splits 4 ordered rows deterministically (tie by id)
    assert [out[i]["bucket"] for i in (1, 2, 3, 4)] == [1, 1, 2, 2]


def test_top_session_paths_gap_and_truncation(spark):
    from fame2pygen_spark.operators.behavior import top_session_paths

    M = 60_000_000  # 1 min in µs
    rows = [
        # u1 session 1: a,b within 30min; session 2 after a 2h gap: c
        (1, 1, "a", 0), (2, 1, "b", 10 * M), (3, 1, "c", 150 * M),
        # u2: one session with 7 events -> path truncated to 5
        *[(10 + i, 2, f"e{i}", i * M) for i in range(7)],
        # u3: same opening as u1 session 1
        (30, 3, "a", 0), (31, 3, "b", 5 * M),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    )
    out = {r["path"]: r["n_sessions"] for r in top_session_paths(
        ev, max_steps=5
    ).collect()}
    assert out["a>b"] == 2        # u1 session 1 and u3
    assert out["c"] == 1          # the post-gap session
    assert out["e0>e1>e2>e3>e4"] == 1  # truncated at 5 steps
    assert "e0>e1>e2>e3>e4>e5" not in out


def test_unigram_surprisal_closed_form(spark):
    import math

    from fame2pygen_spark.operators.text import unigram_surprisal

    # corpus: "a a a b" -> P(a)=3/4, P(b)=1/4
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           unigram_surprisal(docs, "text", "doc_id").collect()}
    sa, sb = -math.log2(3 / 4), -math.log2(1 / 4)
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["mean_surprisal"] - round(sa, 6)) < 1e-9
    assert out[2]["mean_surprisal"] == round(sb, 6) == 2.0
    # rare-token doc scores strictly higher than the common-token doc
    assert out[2]["mean_surprisal"] > out[1]["mean_surprisal"]


def test_mad_outliers_robust_to_contamination(spark):
    from fame2pygen_spark.operators.sketch import mad_outliers

    # 20% contamination at 1e6: classic z-score masks it (sigma blows
    # up), MAD does not
    rows = [("g", 10.0 + (i % 3)) for i in range(40)]
    rows += [("g", 1e6)] * 10
    df = spark.createDataFrame(rows, "grp string, value double")
    out = mad_outliers(df, ["grp"], "value", threshold=3.5).collect()
    flagged = [r for r in out if r["is_outlier"]]
    assert len(flagged) == 10
    assert all(r["value"] == 1e6 for r in flagged)
    # constant group: MAD 0 -> no flags, null z
    cdf = spark.createDataFrame([("c", 5.0)] * 4, "grp string, value double")
    cout = mad_outliers(cdf, ["grp"], "value").collect()
    assert all(r["is_outlier"] is False and r["robust_z"] is None
               for r in cout)


def test_source_overlap_jaccard_and_containment(spark):
    from fame2pygen_spark.operators.dedup import source_overlap

    docs = spark.createDataFrame(
        # s1: {A, B, C}; s2: {B, C, D}; s3: {E} (disjoint)
        [(1, "s1", "doc A"), (2, "s1", "doc B"), (3, "s1", "doc C"),
         (4, "s2", "doc B"), (5, "s2", "doc C"), (6, "s2", "doc D"),
         (7, "s2", "DOC  c"),  # normalizes to doc C -> same fingerprint
         (8, "s3", "doc E")],
        "doc_id long, source string, text string",
    )
    out = {(r["group_a"], r["group_b"]): r
           for r in source_overlap(docs, "text", "source").collect()}
    r = out[("s1", "s2")]
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["n_common"] == 2
    assert r["jaccard"] == 0.5          # 2 / (3 + 3 - 2)
    assert r["containment_a"] == round(2 / 3, 6)
    # disjoint pairs emit no row (sparse matrix)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_corr_pairs_known_values_and_null_handling(spark):
    from fame2pygen_spark.operators.sketch import corr_pairs

    # y = 2x exactly -> corr 1; z anti-correlates with x -> corr -1
    rows = [("g", float(x), 2.0 * x, -float(x)) for x in range(1, 6)]
    rows.append(("g", None, 1.0, 1.0))  # pairwise-deleted row
    df = spark.createDataFrame(rows, "grp string, x double, y double, z double")
    out = {(r["col_x"], r["col_y"]): r
           for r in corr_pairs(df, ["grp"], ["x", "y", "z"]).collect()}
    assert out[("x", "y")]["corr"] == 1.0 and out[("x", "y")]["n"] == 5
    assert out[("x", "z")]["corr"] == -1.0
    assert out[("y", "z")]["n"] == 6  # no nulls in that pair
    # constant column -> null corr
    cdf = spark.createDataFrame(
        [("g", float(x), 7.0) for x in range(5)], "grp string, x double, c double"
    )
    cout = corr_pairs(cdf, ["grp"], ["x", "c"]).collect()[0]
    assert cout["corr"] is None


def test_time_weighted_avg_step_function(spark):
    from fame2pygen_spark.operators.temporal import time_weighted_avg

    rows = [
        # u1: v=10 holds 1µs... use seconds-scale: 10 for 3s, 40 for 1s
        (1, 1, 0, 10.0), (2, 1, 3_000_000, 40.0), (3, 1, 4_000_000, 99.0),
        # u2: single event -> no intervals
        (4, 2, 0, 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {r["entity"]: r for r in time_weighted_avg(ev).collect()}
    u1 = out[1]
    # twa = (10*3s + 40*1s) / 4s = 17.5 ; final value 99 contributes 0
    assert u1["twa"] == 17.5 and u1["n_intervals"] == 2
    assert u1["span_us"] == 4_000_000
    u2 = out[2]
    assert u2["twa"] is None and u2["n_intervals"] == 0 and u2["span_us"] == 0


def test_skew_profile_gini_extremes(spark):
    from fame2pygen_spark.operators.sketch import skew_profile

    # uniform: 4 keys x 25 rows -> gini 0
    uni = spark.createDataFrame(
        [(f"k{i % 4}",) for i in range(100)], "k string"
    )
    u = skew_profile(uni, ["k"], top_k=2).collect()
    assert len(u) == 2
    assert all(r["gini"] == 0.0 and r["share"] == 0.25 and r["n_keys"] == 4
               for r in u)
    # one dominant key: 97 rows on k0, 1 row each on k1..k3
    hot = spark.createDataFrame(
        [("k0",)] * 97 + [("k1",), ("k2",), ("k3",)], "k string"
    )
    h = skew_profile(hot, ["k"], top_k=1).collect()[0]
    assert h["key"] == "k0" and h["share"] == 0.97
    # sorted counts (1,1,1,97): G = 2*(1+2+3+4*97)/(4*100) - 5/4 = 0.72
    assert h["gini"] == 0.72


def test_canonicalize_url_rules(spark):
    from fame2pygen_spark.operators.web import canonicalize_url

    cases = [
        ("https://WWW.Example.com:443/a/b/?utm_source=x&q=1#frag",
         "example.com/a/b?q=1"),
        ("http://example.com:80/page?gclid=abc&fbclid=z", "example.com/page"),
        ("https://example.com/", "example.com"),
        ("http://www.example.com/a?b=2&utm_campaign=spring&c=3",
         "example.com/a?b=2&c=3"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    out = [r[0] for r in
           df.select(canonicalize_url(F.col("url"))).collect()]
    assert out == [want for _, want in cases]


def test_group_entropy_known_distributions(spark):
    from fame2pygen_spark.operators.sketch import group_entropy

    rows = (
        [("u1", "a")] * 4                       # single category -> 0 bits
        + [("u2", "a"), ("u2", "b")] * 2        # uniform 2 -> 1 bit
        + [("u3", "a")] * 3 + [("u3", "b")]     # 3:1 split
        + [("u4", None)] * 2 + [("u4", "a")]    # nulls excluded
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r["grp"]: r for r in group_entropy(df, ["grp"], "v").collect()}
    assert out["u1"]["entropy"] == 0.0 and out["u1"]["n_distinct"] == 1
    assert out["u2"]["entropy"] == 1.0
    import math
    expect = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(out["u3"]["entropy"] - round(expect, 6)) < 1e-9
    assert out["u4"]["n"] == 1 and out["u4"]["entropy"] == 0.0


def test_distribution_drift_identical_and_shifted(spark):
    from fame2pygen_spark.operators.sketch import distribution_drift

    a = spark.createDataFrame(
        [(float(v),) for v in range(100)], "value double"
    )
    same = distribution_drift(a, a, "value", lo=0.0, hi=100.0).collect()[0]
    assert same["psi"] == 0.0 and same["n_a"] == same["n_b"] == 100
    # shift the whole distribution up by 50: strong drift
    b = spark.createDataFrame(
        [(float(v) + 50,) for v in range(100)], "value double"
    )
    drift = distribution_drift(a, b, "value", lo=0.0, hi=100.0).collect()[0]
    assert drift["psi"] > 0.25


def test_mutual_information_extremes(spark):
    from fame2pygen_spark.operators.sketch import mutual_information

    # perfectly dependent: b = a -> MI = H(a) = 1 bit, nmi = 1
    dep = spark.createDataFrame(
        [("x", "x"), ("y", "y")] * 10, "a string, b string"
    )
    d = mutual_information(dep, "a", "b").collect()[0]
    assert d["mi"] == 1.0 and d["nmi"] == 1.0 and d["h_ab"] == 1.0
    # independent uniform 2x2 -> MI = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq"] * 5, "a string, b string"
    )
    i = mutual_information(ind, "a", "b").collect()[0]
    assert i["mi"] == 0.0 and i["h_ab"] == 2.0
    # constant margin -> nmi defined as 0, not null
    const = spark.createDataFrame([("x", "p")] * 4, "a string, b string")
    c = mutual_information(const, "a", "b").collect()[0]
    assert c["nmi"] == 0.0


def test_benford_profile_digits(spark):
    from fame2pygen_spark.operators.sketch import benford_profile

    vals = [123.0, 0.00145, 1900.0, 2.5, 23.0, 0.31, 9000.0, -150.0, 0.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    # digits: 1 (123, 0.00145, 1900, 150) =4, 2 (2.5, 23) =2, 3 (0.31), 9 (9000)
    assert out[1]["n"] == 4 and out[2]["n"] == 2
    assert out[3]["n"] == 1 and out[9]["n"] == 1
    assert sum(r["n"] for r in out.values()) == 8  # 0 and null excluded
    import math
    assert out[1]["expected"] == round(math.log10(2), 6)
    assert out[1]["share"] == 0.5


def test_source_js_divergence_extremes(spark):
    from fame2pygen_spark.operators.text import source_js_divergence

    docs = spark.createDataFrame(
        # s1 and s2: identical distributions -> jsd 0
        # s3: disjoint vocabulary -> jsd 1 vs both
        [(1, "s1", "a b"), (2, "s2", "a b"), (3, "s3", "x y")],
        "doc_id long, source string, text string",
    )
    out = {(r["group_a"], r["group_b"]): r["jsd"] for r in
           source_js_divergence(docs, "text", "source").collect()}
    assert out[("s1", "s2")] == 0.0
    # fully disjoint pairs never join on a term -> no row; their JSD
    # is 1 by definition (residual mass only) — absence marks them
    assert ("s1", "s3") not in out
    # partial overlap: s4 {a:1/2, c:1/2} vs s1 {a:1/2, b:1/2}
    docs2 = spark.createDataFrame(
        [(1, "s1", "a b"), (4, "s4", "a c")],
        "doc_id long, source string, text string",
    )
    import math
    r = source_js_divergence(docs2, "text", "source").collect()[0]
    # shared a: both p=1/2, m=1/2 -> contributes 0; residuals 1/2 each
    assert r["jsd"] == 0.5


def test_activity_streaks_islands(spark):
    from fame2pygen_spark.operators.behavior import activity_streaks

    D = 86_400_000_000
    rows = [
        # u1: days 0,1,2 then 5,6 -> streaks 3 and 2
        (1, 0), (1, 1 * D), (1, 1 * D + 5), (1, 2 * D), (1, 5 * D), (1, 6 * D),
        # u2: single day
        (2, 10 * D),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    out = {r["user"]: r for r in activity_streaks(ev).collect()}
    u1 = out[1]
    assert u1["n_active_days"] == 5 and u1["n_streaks"] == 2
    assert u1["longest_streak"] == 3 and u1["current_streak_end"] == 6
    u2 = out[2]
    assert u2["longest_streak"] == 1 and u2["n_streaks"] == 1


def test_weighted_quantiles_lower_bound_rule(spark):
    from fame2pygen_spark.operators.sketch import weighted_quantiles

    # values 1,2,3 with weights 1,1,8: cum 1,2,10 of 10
    # p50 -> first cum >= 5 -> value 3; p10 -> value 1
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 8.0),
         ("g", 9.0, 0.0), ("g", 9.0, None)],  # excluded weights
        "grp string, v double, w double",
    )
    r = weighted_quantiles(df, ["grp"], "v", "w", [0.1, 0.5]).collect()[0]
    assert r["p10"] == 1.0 and r["p50"] == 3.0
    assert r["n"] == 3 and r["w_total"] == 10.0


def test_ks_statistic_extremes(spark):
    from fame2pygen_spark.operators.sketch import ks_statistic

    a = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    same = ks_statistic(a, a, "v").collect()[0]
    assert same["ks"] == 0.0 and same["n_a"] == same["n_b"] == 10
    # disjoint supports -> ks = 1
    b = spark.createDataFrame(
        [(float(v) + 100,) for v in range(10)], "v double"
    )
    d = ks_statistic(a, b, "v").collect()[0]
    assert d["ks"] == 1.0


def test_group_trend_exact_line_and_r2(spark):
    from fame2pygen_spark.operators.temporal import group_trend

    D = 86_400_000_000
    # u1: y = 2*day + 5 exactly -> slope 2, intercept 5, r2 = 1
    rows = [(1, d * D, 2.0 * d + 5.0) for d in range(5)]
    # u2: constant day index -> null slope
    rows += [(2, 3 * D, 1.0), (2, 3 * D + 100, 9.0)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    out = {r["entity"]: r for r in group_trend(ev).collect()}
    u1 = out[1]
    assert u1["slope_per_day"] == 2.0 and u1["intercept"] == 5.0
    assert u1["r2"] == 1.0
    u2 = out[2]
    assert u2["slope_per_day"] is None and u2["r2"] is None


def test_ab_conversion_test_deterministic_and_z(spark):
    import math

    from fame2pygen_spark.operators.behavior import ab_conversion_test

    rows = [(u, "purchase" if u % 3 == 0 else "view") for u in range(200)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    r1 = ab_conversion_test(ev).collect()[0]
    r2 = ab_conversion_test(ev).collect()[0]
    assert r1 == r2  # deterministic split
    assert r1["n_a"] + r1["n_b"] == 200
    assert r1["conv_a"] + r1["conv_b"] == 67  # users 0,3,...,198
    # replicate the pooled z
    pa, pb = r1["conv_a"] / r1["n_a"], r1["conv_b"] / r1["n_b"]
    pp = (r1["conv_a"] + r1["conv_b"]) / 200
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / r1["n_a"] + 1 / r1["n_b"]))
    assert abs(r1["z"] - round(z, 6)) < 1e-9


def test_survival_curve_monotone_and_exact(spark):
    from fame2pygen_spark.operators.behavior import survival_curve

    D = 86_400_000_000
    # lifetimes: u1=0, u2=2, u3=5 days
    rows = [(1, 0), (2, 0), (2, 2 * D), (3, 0), (3, 5 * D)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    out = {r["day_offset"]: r for r in
           survival_curve(ev, max_days=6).collect()}
    assert len(out) == 7
    assert out[0]["survival"] == 1.0 and out[0]["n_surviving"] == 3
    assert out[1]["n_surviving"] == 2 and out[2]["n_surviving"] == 2
    assert out[3]["n_surviving"] == 1 and out[5]["n_surviving"] == 1
    assert out[6]["n_surviving"] == 0
    vals = [out[d]["survival"] for d in range(7)]
    assert vals == sorted(vals, reverse=True)  # monotone non-increasing


def test_trimmed_mean_drops_tails(spark):
    from fame2pygen_spark.operators.sketch import trimmed_mean

    # 1..100: p5=5.95, p95=95.05 -> keeps 6..95, mean 50.5
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "grp string, value double"
    )
    r = trimmed_mean(df, ["grp"], "value").collect()[0]
    assert r["n"] == 100 and r["n_kept"] == 90
    assert r["trimmed_mean"] == 50.5
    # an extreme outlier barely moves the trimmed mean but not inside band
    df2 = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)] + [("g", 1e9)],
        "grp string, value double",
    )
    r2 = trimmed_mean(df2, ["grp"], "value").collect()[0]
    assert r2["trimmed_mean"] < 60  # outlier trimmed away


def test_concentration_index_extremes(spark):
    from fame2pygen_spark.operators.sketch import concentration_index

    df = spark.createDataFrame(
        # g1: 4 members x equal weight -> hhi 0.25
        [("g1", f"m{i}", 5.0) for i in range(4)]
        # g2: one member holds 90%
        + [("g2", "big", 90.0), ("g2", "small", 10.0)],
        "grp string, member string, w double",
    )
    out = {r["grp"]: r for r in concentration_index(
        df, ["grp"], "member", "w"
    ).collect()}
    assert out["g1"]["hhi"] == 0.25 and out["g1"]["top_share"] == 0.25
    assert out["g2"]["hhi"] == 0.82  # 0.81 + 0.01
    assert out["g2"]["top_share"] == 0.9 and out["g2"]["n_members"] == 2


def test_jsonl_ingest_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from fame2pygen_spark.sources.ingest import read_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good doc"}\n'
        '{"doc_id": 2, "text": "another", "extra": "ignored"}\n'
        '{"doc_id": oops not json\n'
        '{"doc_id": 4}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, bad = read_jsonl_corpus(spark, str(p), schema)
    g = {r["doc_id"]: r["text"] for r in good.collect()}
    assert g == {1: "good doc", 2: "another", 4: None}
    b = [r["raw_line"] for r in bad.collect()]
    assert len(b) == 1 and "oops" in b[0]


def test_csv_ingest_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from fame2pygen_spark.sources.ingest import read_csv_corpus

    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,score,label\n"
        "1,0.5,ok\n"
        "2,not_a_number,bad\n"
        "3,0.9,fine\n"
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
        StructField("label", StringType()),
    ])
    good, bad = read_csv_corpus(spark, str(p), schema)
    assert {r["doc_id"] for r in good.collect()} == {1, 3}
    assert bad.count() == 1


# ----------------------- library-form helpers match their bulk twins


def test_column_form_minhash_signature_matches_bulk(spark):
    """dedup.minhash_signature (column form, point use) must produce
    bitwise the same signature as the bulk explode+groupBy formulation
    — the docstring's equivalence claim, pinned."""
    from fame2pygen_spark.operators.dedup import (
        minhash_signature, minhash_signatures,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "tiny"),  # shorter than the shingle width -> empty set
        ],
        "doc_id long, text string",
    )
    col_form = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id", minhash_signature(F.col("text")).alias("sig")
        ).collect()
    }
    bulk = minhash_signatures(df, "text", "doc_id")
    k = len([c for c in bulk.columns if c.startswith("mh")])
    bulk_form = {
        r["doc"]: [r[f"mh{j}"] for j in range(k)] for r in bulk.collect()
    }
    for doc, sig in bulk_form.items():
        assert list(col_form[doc]) == sig, doc
    # doc 3 has no shingles: absent from bulk, all-null column form
    assert 3 not in bulk_form
    assert all(v is None for v in col_form[3])


def test_charset_jaccard_matches_pairs_operator(spark):
    from fame2pygen_spark.operators.dedup import (
        charset_jaccard, charset_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(1, "abcde", "g"), (2, "abcdf", "g"), (3, "xyz", "g")],
        "doc_id long, text string, source string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in charset_jaccard_pairs(
            df, "text", "doc_id", block_cols=["source"], threshold=0.0
        ).collect()
    }
    direct = df.alias("a").join(df.alias("b")).where(
        F.col("a.doc_id") < F.col("b.doc_id")
    ).select(
        F.col("a.doc_id").alias("ia"),
        F.col("b.doc_id").alias("ib"),
        F.round(
            charset_jaccard(F.col("a.text"), F.col("b.text")), 6
        ).alias("j"),
    ).collect()
    for r in direct:
        assert pairs[(r["ia"], r["ib"])] == r["j"]
    # hand value: |{a,b,c,d}∩{a,b,c,d,f}|... {abcde}∩{abcdf}=4, ∪=6
    assert pairs[(1, 2)] == round(4 / 6, 6)


def test_library_series_helpers_match_engine(spark):
    """functions.core pct_change / first_value / last_value /
    forward_fill — the public library forms of the reference helpers —
    must agree with the engine's emitted semantics on the same frame."""
    import datetime as dt

    from fame2pygen_spark import run_script
    from fame2pygen_spark.functions.core import (
        first_value, forward_fill, last_value, pct_change,
    )

    rows = [
        (dt.date(2020, 1, 1), None),
        (dt.date(2020, 2, 1), 10.0),
        (dt.date(2020, 3, 1), 12.0),
        (dt.date(2020, 4, 1), None),
        (dt.date(2020, 5, 1), 15.0),
    ]
    df = spark.createDataFrame(rows, "DATE date, x double")
    lib = df.select(
        "DATE",
        pct_change(F.col("x")).alias("g"),
        first_value(F.col("x")).alias("fv"),
        last_value(F.col("x")).alias("lv"),
        forward_fill(F.col("x")).alias("ff"),
    ).orderBy("DATE").collect()

    eng = run_script(
        df, ["g = pct(x)", "fv = firstvalue(x)", "lv = lastvalue(x)"]
    ).df.orderBy("DATE").collect()

    # the engine uppercases FAME identifiers (reference convention)
    for a, b in zip(lib, eng):
        assert (a["g"] is None) == (b["G"] is None)
        if a["g"] is not None:
            assert abs(a["g"] - b["G"]) < 1e-9
        assert a["fv"] == b["FV"] == 10.0
        assert a["lv"] == b["LV"] == 15.0
    # forward fill: nulls carry the last seen value, leading null stays
    assert [r["ff"] for r in lib] == [None, 10.0, 12.0, 12.0, 15.0]
