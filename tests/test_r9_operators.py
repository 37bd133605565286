"""Hand-computed unit tests for the round-9 operators — independent
of the DuckDB oracles (which replay the same algebra): tiny inputs
where the expected output is derived by hand in the test body.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_vocab_growth_hand_computed(spark):
    from fame2pygen_spark.operators.text import vocab_growth

    rows = [
        (1, "a b c", "s1"),
        (2, "b c d", "s1"),     # new: d
        (3, "a a a", "s1"),     # new: none
        (10, "a b", "s2"),      # s2 starts fresh: a, b new again
        (11, "c", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source"], r["doc_id"]): r
        for r in vocab_growth(df, "text", "doc_id", "source").collect()
    }
    assert out[("s1", 1)]["n_new"] == 3 and out[("s1", 1)]["vocab_cum"] == 3
    assert out[("s1", 2)]["n_new"] == 1 and out[("s1", 2)]["vocab_cum"] == 4
    assert out[("s1", 3)]["n_new"] == 0 and out[("s1", 3)]["vocab_cum"] == 4
    assert out[("s1", 3)]["n_tokens"] == 3
    # entities are independent: s2's vocabulary restarts
    assert out[("s2", 10)]["n_new"] == 2 and out[("s2", 10)]["vocab_cum"] == 2
    assert out[("s2", 11)]["vocab_cum"] == 3


def test_cosine_topk_keyed_never_crosses_entities(spark):
    from fame2pygen_spark.operators.similarity import cosine_topk_keyed

    # entity A: v1 ∥ v2, v3 ⊥ v1; entity B holds a perfect copy of v1
    # that must NOT appear among A's neighbors
    rows = [
        (1, [1.0, 0.0], "A"),
        (2, [2.0, 0.0], "A"),
        (3, [0.0, 1.0], "A"),
        (4, [1.0, 0.0], "B"),
        (5, [1.0, 1.0], "B"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, pk string"
    )
    queries = emb.where(F.col("vec_id") == 1).select(
        "pk",
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_keyed(emb, queries, "pk", k=5).collect()
    got = [(r["neighbor_id"], r["rank"], r["score"]) for r in out]
    assert got == [(2, 1, 1.0), (3, 2, 0.0)]  # 4 and 5 are entity B


def test_minhash_lsh_pairs_keyed_blocks_cross_entity_dups(spark):
    from fame2pygen_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_lsh_pairs_keyed,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, text, "s1"),
        (2, text, "s1"),   # exact dup within s1 → pair
        (3, text, "s2"),   # exact dup ACROSS entities → no keyed pair
        (4, "completely different words here about spark plans", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    keyed = minhash_lsh_pairs_keyed(df, "text", "doc_id", "source").collect()
    assert [(r["id_a"], r["id_b"], r["source"]) for r in keyed] == [
        (1, 2, "s1")
    ]
    assert keyed[0]["jaccard"] == 1.0
    # the GLOBAL operator does emit the cross-entity pairs — the keyed
    # lane's difference is real, not vacuous
    global_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "text", "doc_id").collect()
    }
    assert (1, 3) in global_pairs and (2, 3) in global_pairs


def test_quality_survivors_elects_highest_quality(spark):
    from fame2pygen_spark.operators.curation import quality_survivors
    from fame2pygen_spark.operators.text import text_profile

    # two near-identical docs; doc 2 is degraded with punctuation spam
    # so its profile quality drops below doc 1's — the survivor must
    # be doc 1 even though min-id would also pick it; assert against
    # the profile directly so the test pins POLICY, not coincidence
    clean = "many plain readable words flow nicely through this text " * 8
    noisy = clean + "!!! ??? ### $$$ %%%"
    rows = [(7, noisy), (9, clean + "and a tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {
        r["doc_id"]: r["quality"]
        for r in text_profile(df, "text").select("doc_id", "quality").collect()
    }
    assert prof[9] > prof[7]  # the construction holds
    out = quality_survivors(df, "text", "doc_id").collect()
    assert len(out) == 1
    row = out[0]
    assert row["survivor"] == 9  # NOT the min id
    assert row["cluster_size"] == 2 and row["dropped"] == 1
    assert abs(row["survivor_quality"] - prof[9]) < 1e-9
