"""Scale-safety bounds for the dedup operators: hot-shingle fan-out is
capped and LSH bucket counts grow with the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from crmint_spark.operators.dedup import (
    NGRAM_DF_CAP,
    ngram_pairs_from_shingles,
)
from crmint_spark.operators.similarity import (
    DEDUP_MIN_BITS,
    dedup_lsh_bits,
)


def test_ngram_hot_shingle_fanout_capped(spark):
    """A stopword shingle present in every document must not make the
    inverted-index join quadratic: with the DF cap, a corpus of N docs
    sharing ONE ubiquitous shingle (plus a distinctive one each)
    produces zero candidate pairs from the hot shingle."""
    n = 400
    rows = [(i, 0) for i in range(n)]  # hot shingle hash 0 in every doc
    rows += [(i, 1000 + i) for i in range(n)]  # unique shingle per doc
    # one true near-dup pair sharing distinctive shingles
    rows += [(7, 5001), (7, 5002), (9001, 5001), (9001, 5002), (9001, 1007)]
    sh = spark.createDataFrame(rows, "doc_id long, sh long").distinct()
    pairs = ngram_pairs_from_shingles(sh, df_cap=NGRAM_DF_CAP, threshold=0.3)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    # the hot shingle (df=400 > 256) is excluded: doc 7 has {1007,5001,
    # 5002}, doc 9001 has {5001,5002,1007} -> jaccard computed on capped
    # sets; no pair exists solely via the hot shingle
    assert (7, 9001) in got
    assert all(a == 7 and b == 9001 for a, b in got)


def test_ngram_cap_bounds_candidate_rows(spark):
    """Candidate volume from any single shingle is <= cap^2/2."""
    n = NGRAM_DF_CAP + 100  # one shingle above cap
    sh = spark.createDataFrame(
        [(i, 42) for i in range(n)], "doc_id long, sh long"
    )
    pairs = ngram_pairs_from_shingles(sh, threshold=0.0)
    assert pairs.count() == 0  # the only shingle is hot -> no candidates


def test_dedup_lsh_bits_scale_with_corpus():
    assert dedup_lsh_bits(500, 64) == DEDUP_MIN_BITS
    assert dedup_lsh_bits(2000, 64) == 5
    assert dedup_lsh_bits(1_000_000, 64) == 14
    assert dedup_lsh_bits(10_000_000_000, 64) == 28
    # ceiling: vector dimensionality
    assert dedup_lsh_bits(10_000_000_000, 16) == 16


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation must traverse a diameter-4 chain (multiple
    rounds) and keep disjoint components separate."""
    from crmint_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5 (as scattered ids), island {10,11}, singleton-pair {20,21}
        [(5, 2), (2, 9), (9, 4), (4, 7), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (2, 2), (4, 2), (5, 2), (7, 2), (9, 2),
        (10, 10), (11, 10),
        (20, 20), (21, 20),
    }


def test_fuzzy_blocking_bounds_candidates(spark):
    """The fuzzy-match verify join must only compare words sharing a
    (first char, compatible length) block — never all pairs."""
    import pyspark.sql.functions as F

    from crmint_spark.operators.dedup import FUZZY_MAX_DIST

    vocab = spark.createDataFrame(
        [(w,) for w in
         ["alpha", "alphax", "beta", "betas", "gamma", "delta", "dolta"]],
        "w string",
    ).select(
        "w", F.substring("w", 1, 1).alias("blk"), F.length("w").alias("len")
    )
    a, b = vocab.alias("a"), vocab.alias("b")
    cands = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.w") < F.col("b.w"))
        & (F.abs(F.col("a.len") - F.col("b.len")) <= F.lit(FUZZY_MAX_DIST)),
    )
    # 7 words -> 21 unordered pairs all-pairs; blocking admits only the
    # within-block ones: (alpha,alphax), (beta,betas), (delta,dolta)
    assert cands.count() == 3
