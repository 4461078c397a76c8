"""Unit tests for the training-corpus preparation operators
(crmint_spark/operators/corpus.py). Cross-engine value parity is covered
by tests/test_parity.py; these check the semantics directly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crmint_spark.catalog import load
from crmint_spark.operators import corpus

SF = "/root/testdata/sf0.001"


def test_sample_counts_bounded_by_rate(spark):
    rows = {r["source"]: r for r in corpus.corpus_sample(spark, SF).collect()}
    assert set(rows) == {f"src{i}" for i in range(20)}
    for src, r in rows.items():
        assert r["rate_pct"] == (int(src[3:]) % 10 + 1) * 10
        assert 0 <= r["n_sampled"] <= r["n_total"]
    # 100%-rate sources keep everything
    assert rows["src9"]["n_sampled"] == rows["src9"]["n_total"]
    assert rows["src19"]["n_sampled"] == rows["src19"]["n_total"]
    # low-rate sources drop most docs (hash uniformity at 10%)
    assert rows["src0"]["n_sampled"] < rows["src0"]["n_total"] / 2


def test_shuffle_is_deterministic_permutation_head(spark):
    a = corpus.corpus_shuffle(spark, SF).collect()
    b = corpus.corpus_shuffle(spark, SF).collect()
    assert a == b
    assert [r["shuffle_rank"] for r in a] == list(range(1, 16))
    assert len({r["doc_id"] for r in a}) == 15
    # the head is not the natural doc_id order (it actually shuffled)
    assert [r["doc_id"] for r in a] != sorted(r["doc_id"] for r in a)


def test_chunking_matches_exact_window_arithmetic(spark):
    docs = load(spark, SF, "documents").select("lang", "text").collect()
    W, S = corpus.CHUNK_TOKENS, corpus.CHUNK_STRIDE
    expect: dict[str, list[int]] = {}
    for r in docs:
        n = len(r["text"].split(" "))
        n_chunks = math.ceil(n / S)
        toks = sum(min(W, n - i * S) for i in range(n_chunks))
        agg = expect.setdefault(r["lang"], [0, 0, 0])
        agg[0] += 1
        agg[1] += n_chunks
        agg[2] += toks
    got = {
        r["lang"]: [r["n_docs"], r["n_chunks"], r["chunk_tokens"]]
        for r in corpus.text_chunking(spark, SF).collect()
    }
    assert got == expect


def test_repetition_flags_crafted_doc(spark):
    base = load(spark, SF, "documents").limit(3)
    crafted = spark.createDataFrame(
        [
            # "x y" repeated 30 times: top 2-gram covers far over 20%
            (900001, " ".join(["x", "y"] * 30), "en", "srcT", 119),
            # unique words: no repeated 5-gram, top-2-gram appears once
            (900002, " ".join(f"w{i}" for i in range(60)), "en", "srcT", 200),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df = crafted.unionByName(base.select(*crafted.columns))
    import crmint_spark.operators.corpus as c

    # run the per-doc pipeline on the crafted frame via a monkeypatched load
    out = (
        df.select("doc_id", "lang", "n_chars", F.split("text", " ").alias("w"))
    )
    grams = out.select(
        "doc_id", F.explode(c._word_ngrams(F.col("w"), 2)).alias("gram")
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("m"))
        .collect()
    )
    top_by_doc = {r["doc_id"]: r["m"] for r in top}
    assert top_by_doc[900001] >= 30  # "y x" or "x y" dominates
    assert top_by_doc[900002] == 1


def test_decontam_flags_rekeyed_eval_copies(spark):
    out = corpus.decontam_overlap(spark, SF).collect()
    assert out, "self-seeded copies must be flagged"
    rekeyed = [r for r in out if r["doc_id"] >= corpus.DECONTAM_REKEY]
    assert rekeyed, "every re-keyed eval copy overlaps 100%"
    for r in rekeyed:
        assert r["n_hit"] == r["n_grams"]  # exact copy: full overlap
    # no eval doc appears under its original id
    assert all(
        r["doc_id"] % corpus.DECONTAM_EVAL_MOD != 0
        or r["doc_id"] >= corpus.DECONTAM_REKEY
        for r in out
    )


def test_token_budget_greedy_cut(spark):
    from crmint_spark.functions import hash_str

    docs = load(spark, SF, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    ).withColumn(
        "skey",
        hash_str(
            F.concat(
                F.lit(f"budget:{corpus.SHUFFLE_SEED}:"),
                F.col("doc_id").cast("string"),
            )
        ),
    ).collect()
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r)
    expect = {}
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (r["skey"], r["doc_id"]))
        run, kept, toks = 0, 0, 0
        for r in rows:
            if run < corpus.TOKEN_BUDGET:
                kept += 1
                toks += r["n_tok"]
            run += r["n_tok"]
        expect[src] = (kept, toks)
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in corpus.corpus_token_budget(spark, SF).collect()
    }
    assert got == expect
    # the budget actually bites: most sources drop docs at the cut
    n_cut = sum(
        1 for src, (kept, _) in expect.items() if kept < len(by_src[src])
    )
    assert n_cut >= len(by_src) // 2


def test_dsir_weights_favor_target_language(spark):
    """DSIR importance weights must rank target-language (en) docs
    above the raw average: mean weight of en docs > mean of the rest,
    and the selected flag mirrors weight > 0."""
    out = corpus.corpus_dsir_weights(spark, SF).collect()
    en = [r["dsir_weight"] for r in out if r["lang"] == "en"]
    rest = [r["dsir_weight"] for r in out if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
    for r in out:
        assert r["selected"] == (r["dsir_weight"] > 0)
    # every document is scored exactly once
    docs = load(spark, SF, "documents").count()
    assert len(out) == docs


def test_bpe_driver_rounds_match_distributed(spark, monkeypatch):
    """The r11 bounded driver BPE merge rounds must emit exactly the
    distributed rounds' merge table; forcing the vocab bound to 0
    exercises the distributed path on the same corpus."""
    fast = [tuple(r) for r in corpus.corpus_bpe_merges(spark, SF).collect()]
    monkeypatch.setattr(corpus, "BPE_DRIVER_VOCAB_MAX", 0)
    dist = [tuple(r) for r in corpus.corpus_bpe_merges(spark, SF).collect()]
    assert fast == dist and len(fast) == corpus.BPE_MERGE_ROUNDS


def test_bpe_encode_compresses_tokens(spark):
    """Applying learned merges must strictly shrink token counts vs
    character count for docs containing the merged pairs, and never
    produce more tokens than characters."""
    out = corpus.corpus_bpe_encode(spark, SF).collect()
    assert out
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents")
        .filter(corpus.BPE_ENCODE_WHERE)
        .collect()
    }
    n_chars = {
        d: sum(len(w) for w in t.split(" ") if w) for d, t in docs.items()
    }
    n_words = {
        d: sum(1 for w in t.split(" ") if w) for d, t in docs.items()
    }
    shrunk = 0
    for r in out:
        assert r["n_words"] == n_words[r["doc_id"]]
        assert r["n_tokens"] <= n_chars[r["doc_id"]]
        assert r["n_tokens"] >= r["n_words"]
        if r["n_tokens"] < n_chars[r["doc_id"]]:
            shrunk += 1
    assert shrunk > 0


def test_char_spans_detect_exact_duplicates(spark):
    """Docs that are exact duplicates of another doc must be fully
    covered by a duplicated char span; span arithmetic stays within the
    document bounds."""
    from crmint_spark.operators import dedup

    out = {r["doc_id"]: r for r in dedup.dedup_char_spans(spark, SF).collect()}
    assert out
    docs = {
        r["doc_id"]: r["text"] for r in load(spark, SF, "documents").collect()
    }
    for d, r in out.items():
        assert r["n_spans"] >= 1
        assert r["dup_chars"] >= dedup.SPAN_L
        # a merged span never exceeds the doc (plus the final window)
        assert r["dup_chars"] <= len(docs[d]) + dedup.SPAN_L
        assert 0 <= r["first_start"] <= len(docs[d])
    # ground truth for one flagged pair: the two docs really share an
    # L-char substring
    flagged = sorted(out)[:1]
    for d in flagged:
        t = docs[d]
        s = r0 = out[d]["first_start"]
        window = t[s : s + dedup.SPAN_L]
        assert any(
            window in docs[o] for o in docs if o != d
        ), f"doc {d} span at {r0} not found in any other doc"


def test_binary_hamming_recall_and_pushdown(spark):
    """1-bit quantization with exact rerank must recover a meaningful
    share of the exact cosine top-k, and the rerank read must carry a
    pushed vec_id IN filter (candidate-bounded, not a corpus scan)."""
    from crmint_spark.operators.similarity import (
        ann_binary_hamming_topk,
        ann_cosine_topk,
    )

    approx = ann_binary_hamming_topk(spark, SF)
    got = {r["vec_id"] for r in approx.collect()}
    exact = {r["vec_id"] for r in ann_cosine_topk(spark, SF).collect()}
    assert len(got & exact) / len(exact) >= 0.4
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "In(vec_id" in plan


def test_inverted_index_agrees_with_scan_search(spark):
    """The index-accelerated conjunctive search must return exactly the
    docs the scan-side SEARCH() predicate accepts for the same query."""
    from crmint_spark.dialect import transpile_statement
    from crmint_spark.operators.text import inverted_index_search

    load(spark, SF, "documents").createOrReplaceTempView("documents")
    idx_docs = {r["doc_id"] for r in inverted_index_search(spark, SF).collect()}
    scan_docs = {
        r["doc_id"]
        for r in spark.sql(
            transpile_statement(
                "SELECT doc_id FROM documents WHERE SEARCH(text, 'spark merge')"
            )
        ).collect()
    }
    assert idx_docs == scan_docs and idx_docs
