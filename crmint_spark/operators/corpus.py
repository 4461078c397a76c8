"""Training-corpus preparation operators over the ``documents`` table:
stratified sampling / dataset mixing, seeded global shuffle, token-window
chunking, Gopher-style repetition filters, and train/eval decontamination.

Everything is JVM-side DataFrame composition (split/transform/sequence/
explode/groupBy) — no Python UDFs — and every operator ships a DuckDB
oracle computing the identical deterministic arithmetic.

Scale design notes (100 TB):
- sample:   a per-row hash predicate — embarrassingly parallel, no
            shuffle; the per-source rates are compiled into the predicate
            so Catalyst folds them (mirrors the reference's
            MOD(ABS(FARM_FINGERPRINT(id)), 100) split idiom,
            ref: backend/controller/ml_model/templates/model_bqml.sql:95-101).
- shuffle:  training-order randomization is ORDER BY hash(seed, id) — a
            range-partitioned total sort, Spark's only global-order
            primitive; the demo query takes top-k (TakeOrdered, no full
            sort materialization).
- chunking: per-row array math; output explodes 1:k but each task holds
            only its own rows.
- repetition: explode(n-grams) -> groupBy(doc, gram) has map-side partial
            aggregation; the shuffle carries (doc, gram, cnt), never the
            text. Per-doc reduction is a second keyed groupBy on doc.
- decontam: the eval n-gram set is tiny next to the corpus -> broadcast
            semi-join against train-doc n-grams; at larger eval sizes the
            same plan degrades gracefully to a hash equi-join on the gram
            digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import hash_str

# DuckDB twin of functions.hash_str (md5-prefix 60-bit portable hash)
_DHASH = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

SHUFFLE_SEED = 42
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48
DECONTAM_NGRAM = 5
DECONTAM_EVAL_MOD = 17
DECONTAM_REKEY = 1_000_000


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-source) deterministic hash sampling — the dataset
    "mixing" primitive: each source keeps rate_pct percent of its docs,
    chosen by a stable hash of the doc id so reruns and engines agree.

    Here the per-source rate is derived from the source name
    (src0 -> 10% ... src9 -> 100%) so the oracle can recompute it; a real
    pipeline would broadcast-join a rates dim or compile a literal map.
    """
    docs = load(spark, sf_dir, "documents")
    rate_pct = (F.substring("source", 4, 10).cast("bigint") % 10 + 1) * 10
    key = (
        hash_str(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
        % 100
    )
    return (
        docs.select("source", rate_pct.alias("rate_pct"), key.alias("k"))
        .groupBy("source", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("k") < F.col("rate_pct")).alias("n_sampled"),
        )
    )


CORPUS_SAMPLE_SQL = f"""
SELECT source,
       (CAST(substr(source, 4) AS BIGINT) % 10 + 1) * 10 AS rate_pct,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE
         {_DHASH.format(x="'sample:' || CAST(doc_id AS VARCHAR)")} % 100
           < (CAST(substr(source, 4) AS BIGINT) % 10 + 1) * 10
       ) AS n_sampled
FROM documents
GROUP BY 1, 2
"""


MIX_ALPHA_NOTE = "alpha = 0.5 (sqrt temperature)"
MIX_TARGET = 200


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing — the standard LLM data-recipe
    sampler (sampling weight proportional to n_s^alpha flattens the
    source distribution; alpha=1 is size-proportional, alpha=0 uniform;
    alpha=0.5 here so sqrt keeps the math engine-exact). Per-source
    keep thresholds derive from corpus stats in ONE aggregation pass
    over k source rows (k is tiny at any corpus size, so the empty
    window below never sees data volume), ship via a broadcast join,
    and membership is the deterministic portable hash — reruns and
    engines agree row-for-row. Thresholds round to basis points so a
    float boundary can never flip a row between engines."""
    docs = load(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    total_w = F.sum(F.sqrt("n_s")).over(Window.partitionBy())
    thr = F.round(
        10000
        * F.least(
            F.lit(1.0),
            F.lit(float(MIX_TARGET)) * F.sqrt("n_s") / total_w / F.col("n_s"),
        ),
        0,
    ).cast("bigint")
    rates = sizes.select("source", "n_s", thr.alias("thr_bps"))
    k = (
        hash_str(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
        % 10000
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_s", "thr_bps")
        .agg(F.count_if(k < F.col("thr_bps")).alias("n_kept"))
        .select(
            "source",
            F.col("n_s").alias("n_total"),
            "thr_bps",
            "n_kept",
        )
    )


CORPUS_TEMPERATURE_MIX_SQL = f"""
WITH sizes AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), rates AS (
  SELECT source, n_s,
         CAST(ROUND(10000 * LEAST(1.0,
           {float(MIX_TARGET)} * sqrt(n_s) / SUM(sqrt(n_s)) OVER () / n_s
         ), 0) AS BIGINT) AS thr_bps
  FROM sizes
)
SELECT d.source, r.n_s AS n_total, r.thr_bps,
       COUNT(*) FILTER (WHERE
         {_DHASH.format(x="'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
           < r.thr_bps) AS n_kept
FROM documents d JOIN rates r USING (source)
GROUP BY 1, 2, 3
"""


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle (training-order
    randomization): ORDER BY hash(seed || doc_id). The scale path is the
    bare orderBy-and-write (range-partitioned sort); this query shows the
    head of the shuffled order, which Spark plans as TakeOrdered — no
    full-sort materialization."""
    docs = load(spark, sf_dir, "documents")
    skey = hash_str(
        F.concat(
            F.lit(f"shuffle:{SHUFFLE_SEED}:"), F.col("doc_id").cast("string")
        )
    )
    head = (
        docs.select("doc_id", "source", skey.alias("skey"))
        .orderBy("skey", "doc_id")
        .limit(15)
    )
    w = Window.orderBy("skey", "doc_id")
    return head.select(
        F.row_number().over(w).cast("bigint").alias("shuffle_rank"),
        "doc_id",
        "source",
    )


CORPUS_SHUFFLE_SQL = f"""
SELECT ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS shuffle_rank,
       doc_id, source
FROM (
  SELECT doc_id, source,
         {_DHASH.format(x=f"'shuffle:{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")} AS skey
  FROM documents
  ORDER BY skey, doc_id
  LIMIT 15
)
"""


def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (context-length packing prep):
    windows of CHUNK_TOKENS tokens every CHUNK_STRIDE. The chunk-length
    vector is materialized per doc (transform over sequence) and then
    aggregated per language, so the windowing arithmetic itself is what
    the oracle validates."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    n_chunks = F.floor((n_tok + CHUNK_STRIDE - 1) / F.lit(CHUNK_STRIDE)).cast(
        "bigint"
    )
    lens = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1),
        lambda i: F.least(
            F.lit(CHUNK_TOKENS).cast("bigint"),
            F.col("n_tok") - i * CHUNK_STRIDE,
        ),
    )
    per_doc = docs.select(
        "lang", n_tok.alias("n_tok"), n_chunks.alias("n_chunks")
    ).select(
        "lang",
        "n_chunks",
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("chunk_tokens"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("chunk_tokens").alias("chunk_tokens"),
    )


TEXT_CHUNKING_SQL = f"""
WITH d AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         (CAST(len(string_split(text, ' ')) AS BIGINT) + {CHUNK_STRIDE - 1})
           // {CHUNK_STRIDE} AS n_chunks
  FROM documents
), per_doc AS (
  SELECT lang, n_chunks,
         CAST(list_sum(list_transform(range(0, n_chunks),
              i -> least({CHUNK_TOKENS}, n_tok - i * {CHUNK_STRIDE})))
              AS BIGINT) AS chunk_tokens
  FROM d
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(chunk_tokens) AS BIGINT) AS chunk_tokens
FROM per_doc
GROUP BY 1
"""


def _word_ngrams(words, n: int):
    """Word n-grams as an array column; empty when the doc is shorter
    than n words (mirrored CASE in the oracle)."""
    k = F.size(words) - (n - 1)
    return F.when(
        k <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def _repetition_per_doc(docs: DataFrame) -> DataFrame:
    """Per-doc repetition stats from a (doc_id, w) frame: characters
    covered by the most frequent 2-gram (top2_chars) and by repeated
    5-grams (rep5_chars). Shared by text_repetition and quality_funnel."""

    def stats(n: int, top_only: bool, out: str) -> DataFrame:
        grams = docs.select(
            "doc_id", F.explode(_word_ngrams(F.col("w"), n)).alias("gram")
        )
        counts = grams.groupBy("doc_id", "gram").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        if top_only:
            rn = Window.partitionBy("doc_id").orderBy(
                F.col("cnt").desc(), F.col("gram").desc()
            )
            return (
                counts.withColumn("rn", F.row_number().over(rn))
                .filter(F.col("rn") == 1)
                .select(
                    "doc_id",
                    (F.col("cnt") * F.length("gram").cast("bigint")).alias(out),
                )
            )
        return (
            counts.filter(F.col("cnt") >= 2)
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("cnt") * F.length("gram").cast("bigint")).alias(out)
            )
        )

    return stats(2, True, "top2_chars").join(
        stats(5, False, "rep5_chars"), "doc_id", "left"
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition filters (Rae et al. 2021, §A1.1):
    per doc, the characters covered by the single most frequent 2-gram
    (top2_chars = cnt * len) and by all 5-grams occurring more than once
    (rep5_chars = sum cnt*len over cnt >= 2). Flags use the paper's
    thresholds — top-2-gram coverage > 0.20 of the doc's chars, repeated
    5-gram coverage > 0.15 — expressed as integer cross-multiplies so no
    float rounding crosses engines. Output is the per-language summary."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.split(F.col("text"), " ").alias("w")
    )
    joined = (
        docs.select("doc_id", "lang", "n_chars")
        .join(_repetition_per_doc(docs), "doc_id", "left")
        .select(
            "lang",
            "n_chars",
            F.coalesce("top2_chars", F.lit(0)).alias("top2_chars"),
            F.coalesce("rep5_chars", F.lit(0)).alias("rep5_chars"),
        )
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("top2_chars") * 5 > F.col("n_chars")).alias(
            "n_flagged_top2"
        ),
        F.count_if(F.col("rep5_chars") * 20 > F.col("n_chars") * 3).alias(
            "n_flagged_rep5"
        ),
        F.sum("top2_chars").alias("top2_chars"),
        F.sum("rep5_chars").alias("rep5_chars"),
    )


TEXT_REPETITION_SQL = """
WITH d AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents
), g2 AS (
  SELECT doc_id, UNNEST(CASE WHEN len(w) >= 2
    THEN list_transform(range(0, len(w) - 1), i -> w[i+1] || ' ' || w[i+2])
    ELSE [] END) AS gram
  FROM d
), c2 AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2
), top2 AS (
  SELECT doc_id, cnt * len(gram) AS top2_chars
  FROM (SELECT doc_id, gram, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram DESC) AS rn
        FROM c2)
  WHERE rn = 1
), g5 AS (
  SELECT doc_id, UNNEST(CASE WHEN len(w) >= 5
    THEN list_transform(range(0, len(w) - 4),
         i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])
    ELSE [] END) AS gram
  FROM d
), c5 AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g5 GROUP BY 1, 2
), rep5 AS (
  SELECT doc_id, CAST(SUM(cnt * len(gram)) AS BIGINT) AS rep5_chars
  FROM c5 WHERE cnt >= 2 GROUP BY 1
), per_doc AS (
  SELECT d.lang, d.n_chars,
         COALESCE(top2.top2_chars, 0) AS top2_chars,
         COALESCE(rep5.rep5_chars, 0) AS rep5_chars
  FROM d
  LEFT JOIN top2 ON d.doc_id = top2.doc_id
  LEFT JOIN rep5 ON d.doc_id = rep5.doc_id
)
SELECT lang, COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE top2_chars * 5 > n_chars) AS n_flagged_top2,
       COUNT(*) FILTER (WHERE rep5_chars * 20 > n_chars * 3) AS n_flagged_rep5,
       CAST(SUM(top2_chars) AS BIGINT) AS top2_chars,
       CAST(SUM(rep5_chars) AS BIGINT) AS rep5_chars
FROM per_doc
GROUP BY 1
"""


def decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training docs whose distinct
    5-gram set overlaps an eval set's union of 5-grams by >= 50%
    (the n-gram-overlap check used for benchmark decontamination, e.g.
    GPT-3 appendix C / PaLM §7). The eval set is the doc_id % 17 == 0
    slice; the train side self-seeds re-keyed copies of the eval docs
    (doc_id + 1e6) so the oracle validates non-zero contamination.

    Plan shape: eval grams are DISTINCT-reduced then broadcast into a
    semi-style inner join against per-train-doc distinct grams; per-doc
    counts reduce on doc_id."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    grams = docs.select(
        "doc_id",
        F.explode(_word_ngrams(words, DECONTAM_NGRAM)).alias("gram"),
    ).select("doc_id", hash_str(F.col("gram")).alias("g"))

    is_eval = F.col("doc_id") % DECONTAM_EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("g").distinct()
    train_grams = (
        grams.filter(~is_eval)
        .unionAll(
            grams.filter(is_eval).select(
                (F.col("doc_id") + DECONTAM_REKEY).alias("doc_id"), "g"
            )
        )
        .distinct()
    )
    # single reduce: left-join the broadcast eval set, then one groupBy
    # computes totals and hits together (a totals/hits split would scan
    # the corpus twice more)
    marked = train_grams.join(
        F.broadcast(eval_grams.withColumn("hit", F.lit(1))), "g", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count_if(F.col("hit").isNotNull()).alias("n_hit"),
    )
    return per_doc.filter(F.col("n_hit") * 2 >= F.col("n_grams")).filter(
        F.col("n_hit") > 0
    )


DECONTAM_SQL = f"""
WITH grams AS (
  SELECT doc_id,
         {_DHASH.format(x="gram")} AS g
  FROM (
    SELECT doc_id, UNNEST(CASE WHEN len(w) >= {DECONTAM_NGRAM}
      THEN list_transform(range(0, len(w) - {DECONTAM_NGRAM - 1}),
           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])
      ELSE [] END) AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  )
), eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
), train_grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, g FROM grams WHERE doc_id % {DECONTAM_EVAL_MOD} != 0
    UNION ALL
    SELECT doc_id + {DECONTAM_REKEY} AS doc_id, g FROM grams
    WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
  )
), per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_grams,
         COUNT(*) FILTER (WHERE e.g IS NOT NULL) AS n_hit
  FROM train_grams t LEFT JOIN eval_grams e ON t.g = e.g
  GROUP BY 1
)
SELECT doc_id, n_grams, n_hit
FROM per_doc
WHERE n_hit * 2 >= n_grams AND n_hit > 0
"""

def quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning funnel: language-ID -> quality heuristics ->
    repetition filter -> exact dedup, reported as cumulative survivor
    counts per stage (the attrition table every corpus-cleaning run
    publishes). All flags are integer cross-multiplies (no float
    thresholds), so the DuckDB oracle matches bit-for-bit.

    Stage predicates (cumulative):
      lang_id:     at least one language's marker words hit (pred != und)
      quality:     n_tokens >= 20 and stopword ratio >= 5% (hits*20 >= n)
      repetition:  top-2-gram char coverage <= 20% of the doc
      exact_dedup: distinct content digests among survivors

    One pass over the corpus plus the n-gram stats frame; the five
    counts come out of a single conditional aggregation and are
    unpivoted with stack()."""
    from .text import LANG_MARKERS, STOPWORDS

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars", F.split(F.col("text"), " ").alias("w")
    )
    words = F.col("w")
    n_tokens = F.size(words).cast("bigint")
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    lang_ok = F.size(F.filter(words, lambda w: w.isin(all_markers))) > 0
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast(
        "bigint"
    )
    qual_ok = (n_tokens >= 20) & (stop_hits * 20 >= n_tokens)
    per_doc = docs.join(_repetition_per_doc(docs), "doc_id", "left").select(
        lang_ok.alias("f_lang"),
        qual_ok.alias("f_qual"),
        (
            F.coalesce("top2_chars", F.lit(0)) * 5 <= F.col("n_chars")
        ).alias("f_rep"),
        F.md5("text").alias("digest"),
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if(F.col("f_lang")).alias("n1"),
        F.count_if(F.col("f_lang") & F.col("f_qual")).alias("n2"),
        F.count_if(
            F.col("f_lang") & F.col("f_qual") & F.col("f_rep")
        ).alias("n3"),
        F.count_distinct(
            F.when(
                F.col("f_lang") & F.col("f_qual") & F.col("f_rep"),
                F.col("digest"),
            )
        ).cast("bigint").alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, '00_all', n0, '10_lang_id', n1, '20_quality', n2, "
            "'30_repetition', n3, '40_exact_dedup', n4) AS (stage, n_docs)"
        )
    )


def _funnel_sql() -> str:
    from .text import LANG_MARKERS, STOPWORDS

    all_markers = ", ".join(
        f"'{m}'" for m in sorted({m for ms in LANG_MARKERS.values() for m in ms})
    )
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH d AS (
  SELECT doc_id, text, n_chars, string_split(text, ' ') AS w FROM documents
), g2 AS (
  SELECT doc_id, UNNEST(CASE WHEN len(w) >= 2
    THEN list_transform(range(0, len(w) - 1), i -> w[i+1] || ' ' || w[i+2])
    ELSE [] END) AS gram
  FROM d
), c2 AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2
), top2 AS (
  SELECT doc_id, cnt * len(gram) AS top2_chars
  FROM (SELECT doc_id, gram, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram DESC) AS rn
        FROM c2)
  WHERE rn = 1
), per_doc AS (
  SELECT len(list_filter(d.w, x -> x IN ({all_markers}))) > 0 AS f_lang,
         CAST(len(d.w) AS BIGINT) >= 20
           AND CAST(len(list_filter(d.w, x -> x IN ({stops}))) AS BIGINT) * 20
               >= CAST(len(d.w) AS BIGINT) AS f_qual,
         COALESCE(top2.top2_chars, 0) * 5 <= d.n_chars AS f_rep,
         md5(d.text) AS digest
  FROM d LEFT JOIN top2 ON d.doc_id = top2.doc_id
), agg AS (
  SELECT COUNT(*) AS n0,
         COUNT(*) FILTER (WHERE f_lang) AS n1,
         COUNT(*) FILTER (WHERE f_lang AND f_qual) AS n2,
         COUNT(*) FILTER (WHERE f_lang AND f_qual AND f_rep) AS n3,
         CAST(COUNT(DISTINCT CASE WHEN f_lang AND f_qual AND f_rep
                             THEN digest END) AS BIGINT) AS n4
  FROM per_doc
)
SELECT '00_all' AS stage, n0 AS n_docs FROM agg
UNION ALL SELECT '10_lang_id', n1 FROM agg
UNION ALL SELECT '20_quality', n2 FROM agg
UNION ALL SELECT '30_repetition', n3 FROM agg
UNION ALL SELECT '40_exact_dedup', n4 FROM agg
"""


QUALITY_FUNNEL_SQL = _funnel_sql()

TOKEN_BUDGET = 1_000


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget mixing: walk each source's docs in seeded
    shuffle order and keep documents while the running token total stays
    within the budget (the "sample domain X down to N tokens" primitive
    of corpus mixing). The running total is a window cumsum partitioned
    by source — sources fill their budgets in parallel; no global sort.
    A doc is kept if the budget was not yet full when it arrived (its
    own tokens may overflow the budget — the standard greedy cut)."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    skey = hash_str(
        F.concat(
            F.lit(f"budget:{SHUFFLE_SEED}:"), F.col("doc_id").cast("string")
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_doc = docs.select(
        "source", "doc_id", n_tok.alias("n_tok"), skey.alias("skey")
    ).select(
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("bigint")).alias(
            "tokens_before"
        ),
    )
    kept = per_doc.filter(F.col("tokens_before") < TOKEN_BUDGET)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.max("tokens_before").alias("max_tokens_before"),
    )


TOKEN_BUDGET_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
           PARTITION BY source
           ORDER BY {_DHASH.format(x=f"'budget:{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")}, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(MAX(tokens_before) AS BIGINT) AS max_tokens_before
FROM per_doc
WHERE tokens_before < {TOKEN_BUDGET}
GROUP BY 1
"""

DOMAIN_CAP = 20


def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the web-corpus "max N pages per domain"
    rule. Keeps a deterministic DOMAIN_CAP-sized subset per source,
    ranked by a stable hash of the doc id so reruns and engines agree.

    Scale: one shuffle on source + per-partition sort (rank inside the
    window); a skewed mega-domain is one hot partition — AQE skew
    handling or pre-aggregation by (source, salt) with a second global
    rank applies, but the per-group state is only the cap, never the
    domain's full document list.
    """
    docs = load(spark, sf_dir, "documents")
    rk = hash_str(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(rk.asc(), F.col("doc_id").asc())
    return (
        docs.select("source", "doc_id", rk.alias("rk"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= DOMAIN_CAP)
        .select("source", "doc_id", "rank")
    )


DOMAIN_CAP_SQL = f"""
SELECT source, doc_id, rank FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {_DHASH.format(x="'cap:' || CAST(doc_id AS VARCHAR)")} ASC,
                    doc_id ASC
         ) AS rank
  FROM documents
) WHERE rank <= {DOMAIN_CAP}
"""

VOCAB_TOP_K = 50


def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary table — the tokenizer-training primitive: for
    the VOCAB_TOP_K most document-frequent words, document frequency
    and total term frequency.

    Scale: classic wordcount — explode + groupBy(word) with map-side
    partial aggregation (the shuffle carries (word, df, tf) partials,
    never text), then a TakeOrdered top-k instead of a global sort.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("word"))
        .limit(VOCAB_TOP_K)
    )


VOCABULARY_SQL = f"""
SELECT word, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY df DESC, tf DESC, word ASC
LIMIT {VOCAB_TOP_K}
"""


CORPUS_QUERIES: dict[str, tuple] = {
    "corpus_domain_cap": (corpus_domain_cap, DOMAIN_CAP_SQL),
    "text_vocabulary": (text_vocabulary, VOCABULARY_SQL),
    "corpus_sample": (corpus_sample, CORPUS_SAMPLE_SQL),
    "corpus_temperature_mix": (
        corpus_temperature_mix,
        CORPUS_TEMPERATURE_MIX_SQL,
    ),
    "corpus_shuffle": (corpus_shuffle, CORPUS_SHUFFLE_SQL),
    "text_chunking": (text_chunking, TEXT_CHUNKING_SQL),
    "text_repetition": (text_repetition, TEXT_REPETITION_SQL),
    "decontam_overlap": (decontam_overlap, DECONTAM_SQL),
    "corpus_token_budget": (corpus_token_budget, TOKEN_BUDGET_SQL),
    "quality_funnel": (quality_funnel, QUALITY_FUNNEL_SQL),
}


WEIGHTED_SAMPLE_K = 25
WEIGHTED_U_MOD = 1_000_000


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis A-Res): each doc draws a reproducible uniform u from a
    stable hash and is ranked by ln(u)/weight — the top-k is then an
    exact weighted sample, with longer documents (weight = n_chars)
    proportionally more likely.

    Scale: the key is per-row arithmetic (no shuffle), and the top-k is
    a TakeOrdered — the whole operator is one scan + one tiny reduce, so
    it composes with any corpus size; for per-source samples, rank with
    a window partitioned by source instead.
    """
    docs = load(spark, sf_dir, "documents")
    u = (
        F.pmod(
            hash_str(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
            F.lit(WEIGHTED_U_MOD),
        )
        + 0.5
    ) / float(WEIGHTED_U_MOD)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(WEIGHTED_SAMPLE_K)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("k"), F.asc("doc_id")))
            .cast("bigint")
            .alias("rank"),
            "doc_id",
            "source",
            "n_chars",
        )
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln(({_DHASH.format(x="'ws:' || CAST(doc_id AS VARCHAR)")} % {WEIGHTED_U_MOD}
             + 0.5) / {float(WEIGHTED_U_MOD)}) / n_chars AS k
  FROM documents
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, source, n_chars
FROM keyed ORDER BY k DESC, doc_id ASC LIMIT {WEIGHTED_SAMPLE_K}
"""

CORPUS_QUERIES["corpus_weighted_sample"] = (
    corpus_weighted_sample,
    WEIGHTED_SAMPLE_SQL,
)


PASSAGE_WORDS = 10
PASSAGE_SEED_MOD = 23
PASSAGE_REKEY = 2_000_000


def corpus_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-passage detection (the paragraph-level
    dedup step of CCNet/RefinedWeb-style corpus builds, adapted to
    word-stream docs): split each doc into consecutive PASSAGE_WORDS-word
    chunks, hash each chunk, and score each doc by the fraction of its
    DISTINCT chunks that also occur in at least one other doc. Docs with
    >= 50% shared-passage mass are the boilerplate/mirror candidates a
    corpus build drops. The corpus self-seeds re-keyed copies of the
    doc_id % 23 == 0 slice so the oracle validates non-zero sharing.

    Plan shape: explode -> (doc_id, chunk-hash) DISTINCT -> window count
    over the chunk hash -> per-doc reduce. Every shuffle keys on the
    bounded chunk-hash or doc_id; no join back to the text, no
    all-pairs stage — survives a 100x corpus the same way the other
    signature-family dedups do."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.unionAll(
        docs.filter(F.col("doc_id") % PASSAGE_SEED_MOD == 0).select(
            (F.col("doc_id") + PASSAGE_REKEY).alias("doc_id"), "text"
        )
    )
    words = F.filter(F.split("text", " "), lambda w: w != "")
    k = PASSAGE_WORDS
    chunks = (
        seeded.where(F.size(words) >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), (F.floor(F.size(words) / k) - 1).cast("int")
                    ),
                    lambda i: F.concat_ws(" ", F.slice(words, i * k + 1, k)),
                )
            ).alias("chunk"),
        )
        .select("doc_id", hash_str(F.col("chunk")).alias("h"))
        .distinct()
    )
    n_docs_with = F.count(F.lit(1)).over(Window.partitionBy("h"))
    marked = chunks.withColumn("n_docs", n_docs_with)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("n_docs") > 1).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_chunks"), 6).alias(
                "dup_fraction"
            ),
            (F.col("n_shared") * 2 >= F.col("n_chunks")).alias(
                "flag_boilerplate"
            ),
        )
    )


DUP_PASSAGES_SQL = f"""
WITH seeded AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PASSAGE_REKEY} AS doc_id, text FROM documents
  WHERE doc_id % {PASSAGE_SEED_MOD} = 0
), chunks AS (
  SELECT DISTINCT doc_id, {_DHASH.format(x="chunk")} AS h
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(
             range(0, CAST(floor(len(w) / {PASSAGE_WORDS}) AS INT)),
             i -> array_to_string(
               list_slice(w, i * {PASSAGE_WORDS} + 1,
                          i * {PASSAGE_WORDS} + {PASSAGE_WORDS}), ' ')
           )) AS chunk
    FROM (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM seeded
    )
    WHERE len(w) >= {PASSAGE_WORDS}
  )
), marked AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS n_docs FROM chunks
)
SELECT doc_id, COUNT(*) AS n_chunks,
       COUNT(*) FILTER (WHERE n_docs > 1) AS n_shared,
       ROUND(COUNT(*) FILTER (WHERE n_docs > 1) * 1.0 / COUNT(*), 6)
         AS dup_fraction,
       COUNT(*) FILTER (WHERE n_docs > 1) * 2 >= COUNT(*)
         AS flag_boilerplate
FROM marked GROUP BY doc_id
"""

CORPUS_QUERIES["corpus_duplicate_passages"] = (
    corpus_duplicate_passages,
    DUP_PASSAGES_SQL,
)


BPE_TOP_PAIRS = 30


def corpus_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive: corpus-weighted adjacent character
    pair frequencies — the statistic a BPE trainer (Sennrich et al.
    2016) recomputes every merge iteration; the top row IS the next
    merge. One vocabulary groupBy then a bounded explode (pairs per
    distinct word, weighted by word frequency — the classic trick that
    makes BPE training corpus-size-independent: the corpus is touched
    once, iterations run over the vocabulary). The final global
    ROW_NUMBER ranks the aggregated pair table — cardinality is bounded
    by the symbol alphabet squared, not the corpus, so the single
    partition holds ~thousands of rows at any scale."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .where(F.length("w") >= 2)
    )
    cs = F.filter(F.split("w", ""), lambda c: c != "")
    pair_list = F.transform(
        F.sequence(F.lit(1), F.size(cs) - 1),
        lambda i: F.concat(
            F.element_at(cs, i), F.lit(" "), F.element_at(cs, i + 1)
        ),
    )
    pairs = words.select("wf", F.explode(pair_list).alias("pair"))
    ranked = (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("bigint").alias("n"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("pair"))
            ),
        )
        .where(F.col("rank") <= BPE_TOP_PAIRS)
    )
    return ranked.select(F.col("rank").cast("bigint").alias("rank"), "pair", "n")


BPE_PAIRS_SQL = f"""
WITH words AS (
  SELECT w, COUNT(*) AS wf FROM (
    SELECT UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS w
    FROM documents
  ) GROUP BY w HAVING length(w) >= 2
), pairs AS (
  SELECT wf, UNNEST(list_transform(range(1, len(cs)),
                    i -> cs[i] || ' ' || cs[i + 1])) AS pair
  FROM (SELECT wf, list_filter(string_split(w, ''), c -> c != '') AS cs
        FROM words)
)
SELECT rank, pair, n FROM (
  SELECT pair, CAST(SUM(wf) AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY SUM(wf) DESC, pair ASC) AS rank
  FROM pairs GROUP BY pair
) WHERE rank <= {BPE_TOP_PAIRS}
"""

CORPUS_QUERIES["corpus_bpe_pairs"] = (corpus_bpe_pairs, BPE_PAIRS_SQL)


BPE_MERGE_ROUNDS = 6

#: Word-type bound for the driver fast path of the BPE merge rounds —
#: ~50 MB of (wf, symbols) rows at the bound; larger vocabularies run
#: the distributed per-round pair-count shuffles.
BPE_DRIVER_VOCAB_MAX = 100_000


def _bpe_symbol_pairs(sym_col):
    return F.transform(
        F.sequence(F.lit(1), F.size(sym_col) - 1),
        lambda i: F.concat(
            F.element_at(sym_col, i), F.lit(" "), F.element_at(sym_col, i + 1)
        ),
    )


def _bpe_apply_merge(sym_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a||b — the
    BPE apply step as a JVM-side fold (no Python in the data path)."""
    return F.aggregate(
        sym_col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def corpus_bpe_merges(
    spark: SparkSession,
    sf_dir: str,
    doc_where: str | None = None,
    rounds: int = BPE_MERGE_ROUNDS,
) -> DataFrame:
    """An actual BPE trainer (Sennrich et al. 2016): BPE_MERGE_ROUNDS
    greedy merge iterations over the corpus vocabulary. Each round is
    one pair-count shuffle over the (vocabulary-sized) symbol table, a
    1-row driver collect of the argmax pair — merge decisions are driver
    state exactly like KMeans centroids — and a map-only fold applying
    the merge. The corpus itself is scanned ONCE (vocabulary + word
    frequency); iterations touch only the vocabulary, which is why BPE
    training scales to any corpus size. Returns the learned merge table
    (round, pair, weighted count) — the tokenizer artifact.

    ``doc_where``/``rounds`` parameterize the driver-sampleable
    ``corpus_bpe_merges_small`` variant (oracle mirrors both)."""
    docs = load(spark, sf_dir, "documents")
    if doc_where:
        docs = docs.filter(doc_where)
    vocab = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .where(F.length("w") >= 2)
    )
    syms = vocab.select(
        "wf", F.filter(F.split("w", ""), lambda c: c != "").alias("sym")
    )
    try:
        syms = syms.localCheckpoint(eager=True)
    except Exception:
        syms = syms.persist()
    # Scale-adaptive hybrid (r11, guide §1.2): the merge rounds operate
    # on the VOCABULARY, which is tiny relative to the corpus; below an
    # explicit word-type bound the whole (wf, symbols) table fits the
    # driver and the rounds run as exact integer/string math — pair
    # counts are integer wf sums, the argmax tie-break (n DESC, pair
    # ASC) and the greedy left-to-right fold transcribe 1:1, and UTF-8
    # binary string order equals code-point order, so results are
    # bit-identical to the distributed rounds (equivalence-tested).
    # The gate is a COUNT on the checkpointed vocabulary (cheap: footer
    # metadata over checkpoint blocks), and the driver collects ONLY
    # when under the bound — VERDICT r11 #8: the old limit(N+1).collect
    # shipped up to ~50 MB to the driver even when the distributed path
    # was going to run anyway.
    if syms.count() <= BPE_DRIVER_VOCAB_MAX:
        words = [(int(r["wf"]), list(r["sym"])) for r in syms.collect()]
        merges = []
        for rnd in range(1, rounds + 1):
            counts: dict[str, int] = {}
            for wf, sym in words:
                for i in range(len(sym) - 1):
                    p = sym[i] + " " + sym[i + 1]
                    counts[p] = counts.get(p, 0) + wf
            n, pair = max((n, p) for p, n in counts.items())
            pair = min(p for p, c in counts.items() if c == n)
            merges.append((rnd, pair, int(n)))
            a, b = pair.split(" ")
            ab = a + b
            nxt_words = []
            for wf, sym in words:
                acc: list[str] = []
                for s in sym:
                    if acc and acc[-1] == a and s == b:
                        acc[-1] = ab
                    else:
                        acc.append(s)
                nxt_words.append((wf, acc))
            words = nxt_words
        return spark.createDataFrame(
            [(int(r), p, n) for r, p, n in merges],
            "round bigint, pair string, n bigint",
        )
    merges = []
    for rnd in range(1, rounds + 1):
        top = (
            syms.select("wf", F.explode(_bpe_symbol_pairs(F.col("sym"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("wf").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .first()
        )
        merges.append((rnd, top["pair"], int(top["n"])))
        a, b = top["pair"].split(" ")
        nxt = syms.select(
            "wf", _bpe_apply_merge(F.col("sym"), a, b).alias("sym")
        )
        try:
            nxt = nxt.localCheckpoint(eager=True)
        except Exception:
            nxt = nxt.persist()
        syms = nxt
    return spark.createDataFrame(
        [(int(r), p, n) for r, p, n in merges],
        "round bigint, pair string, n bigint",
    )


def _bpe_merges_sql(
    doc_where: str | None = None, rounds: int = BPE_MERGE_ROUNDS
) -> str:
    """DuckDB oracle: the same rounds unrolled as CTE chains; each
    round's argmax pair feeds the next round's merge fold via a cross
    join (scalar 1-row CTE)."""
    ctes = _bpe_trainer_ctes(doc_where, rounds)
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, pair, n FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def _bpe_trainer_ctes(
    doc_where: str | None = None, rounds: int = BPE_MERGE_ROUNDS
) -> list[str]:
    where = f"\n      WHERE {doc_where}" if doc_where else ""
    ctes = [
        f"""v0 AS (
  SELECT wf, list_filter(string_split(w, ''), c -> c != '') AS sym
  FROM (
    SELECT w, COUNT(*) AS wf FROM (
      SELECT UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS w
      FROM documents{where}
    ) GROUP BY w HAVING length(w) >= 2
  )
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"v{r - 1}"
        ctes.append(
            f"""t{r} AS (
  SELECT pair, CAST(SUM(wf) AS BIGINT) AS n,
         split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
  FROM (
    SELECT wf, UNNEST(list_transform(range(1, len(sym)),
                      i -> sym[i] || ' ' || sym[i + 1])) AS pair
    FROM {prev}
  ) GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 1
)"""
        )
        ctes.append(
            f"""v{r} AS (
  SELECT wf, list_reduce(list_transform(sym, s -> [s]), (acc, x) ->
    CASE WHEN len(acc) > 0 AND acc[-1] = t{r}.a AND x[1] = t{r}.b
         THEN list_append(acc[1:-2], t{r}.a || t{r}.b)
         ELSE list_append(acc, x[1]) END) AS sym
  FROM {prev}, t{r}
)"""
        )
    return ctes


CORPUS_QUERIES["corpus_bpe_merges"] = (corpus_bpe_merges, _bpe_merges_sql())

# Driver-sampleable BPE variant: documents subset + fewer merge rounds,
# same trainer and unrolled-CTE oracle; the full entry stays at the tail.
BPE_SMALL_WHERE = "doc_id % 5 = 0"
BPE_SMALL_ROUNDS = 3


def corpus_bpe_merges_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_bpe_merges(
        spark, sf_dir, doc_where=BPE_SMALL_WHERE, rounds=BPE_SMALL_ROUNDS
    )


CORPUS_QUERIES["corpus_bpe_merges_small"] = (
    corpus_bpe_merges_small,
    _bpe_merges_sql(BPE_SMALL_WHERE, BPE_SMALL_ROUNDS),
)


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., "Data Selection for Language
# Models via Importance Resampling", NeurIPS 2023 — public paper)

DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document: how target-like its hashed
    unigram feature counts are, under bag-of-hashed-ngrams language
    models of the target slice (lang = 'en') vs the full raw corpus:

        w(d) = ROUND(sum_f c_f(d) * (ln p_T(f) - ln p_R(f)), 6)

    with add-1 smoothing over the fixed B = 64 hash buckets, and
    selected = w > 0 (more target-like than raw average). Features are
    unigrams bucketed by the portable md5-prefix hash (functions.
    hash_str — bigram features are the same machinery over zipped
    adjacent tokens).

    Scale design (100 TB): the feature space is FIXED at B buckets, so
    both language models are B-row aggregates with map-side partial
    combine; they broadcast back into the per-doc scoring join, and the
    per-doc pass is one explode + two keyed groupBys whose shuffle rows
    carry (doc_id, f, count) — never the text. No state grows with the
    corpus; resampling from the weights is a per-row Gumbel-top-k over
    w(d) (orderable without a global sort via TakeOrdered).
    """
    docs = load(spark, sf_dir, "documents")
    b = F.lit(DSIR_BUCKETS)
    feats = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            "doc_id", "lang", F.pmod(hash_str(F.col("w")), b).alias("f")
        )
    )
    tgt = (
        feats.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    raw = feats.groupBy("f").agg(F.count(F.lit(1)).alias("cr"))
    tgt_tot = tgt.agg(F.sum("ct").alias("nt"))
    raw_tot = raw.agg(F.sum("cr").alias("nr"))
    ratio = (
        raw.join(tgt, "f", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "f",
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + b))
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + b))
            ).alias("lr"),
        )
    )
    per_doc = feats.groupBy("doc_id", "lang", "f").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = F.round(F.sum(F.col("c") * F.col("lr")), 6)
    return (
        per_doc.join(F.broadcast(ratio), "f")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").alias("n_toks"),
            w.alias("dsir_weight"),
            (w > 0).alias("selected"),
        )
        .orderBy("doc_id")
    )


DSIR_SQL = f"""
WITH feats AS (
  SELECT doc_id, lang,
         ((('0x' || substr(md5(w), 1, 15))::BIGINT % {DSIR_BUCKETS})
          + {DSIR_BUCKETS}) % {DSIR_BUCKETS} AS f
  FROM (
    SELECT doc_id, lang,
           unnest(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
), tgt AS (
  SELECT f, COUNT(*) AS ct FROM feats
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY f
), raw AS (
  SELECT f, COUNT(*) AS cr FROM feats GROUP BY f
), tot AS (
  SELECT (SELECT COUNT(*) FROM feats WHERE lang = '{DSIR_TARGET_LANG}') AS nt,
         (SELECT COUNT(*) FROM feats) AS nr
), ratio AS (
  SELECT raw.f,
         ln((COALESCE(ct, 0) + 1.0) / (nt + {DSIR_BUCKETS}))
         - ln((cr + 1.0) / (nr + {DSIR_BUCKETS})) AS lr
  FROM raw LEFT JOIN tgt ON raw.f = tgt.f, tot
), per_doc AS (
  SELECT doc_id, lang, f, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3
)
SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_toks,
       ROUND(SUM(c * lr), 6) AS dsir_weight,
       ROUND(SUM(c * lr), 6) > 0 AS selected
FROM per_doc JOIN ratio USING (f)
GROUP BY doc_id, lang
ORDER BY doc_id
"""

CORPUS_QUERIES["corpus_dsir_weights"] = (corpus_dsir_weights, DSIR_SQL)


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION: encode held-out documents with the learned
# merge table (the missing half of train -> tokenize in a data pipeline)

BPE_ENCODE_WHERE = "doc_id % 7 = 1"


def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode documents with the merge table the BPE trainer learned
    (same training slice + rounds as ``corpus_bpe_merges_small``) and
    report per-doc token counts — the tokenizer-application step of a
    training-data pipeline.

    Scale layout: encoding happens at VOCABULARY level — distinct words
    are symbolized once and each learned merge is a map-only JVM fold
    over that (bounded) table; a broadcast join then fans the per-word
    token counts back onto (doc, word) occurrences. The corpus text is
    scanned once; nothing per-round touches it. Merge decisions are
    driver state (rank-ordered pairs), the same contract as KMeans
    centroids / the PQ codebooks."""
    merges_df = corpus_bpe_merges(
        spark, sf_dir, doc_where=BPE_SMALL_WHERE, rounds=BPE_SMALL_ROUNDS
    )
    merges = [
        tuple(r["pair"].split(" "))
        for r in merges_df.orderBy("round").collect()
    ]
    docs = load(spark, sf_dir, "documents").filter(BPE_ENCODE_WHERE)
    words = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "w"
        ),
    )
    sym = (
        words.select("w")
        .distinct()
        .select(
            "w", F.filter(F.split("w", ""), lambda c: c != "").alias("sym")
        )
    )
    for a, b in merges:
        sym = sym.select("w", _bpe_apply_merge(F.col("sym"), a, b).alias("sym"))
    enc = sym.select("w", F.size("sym").cast("bigint").alias("n_sym"))
    return (
        words.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def _bpe_encode_sql() -> str:
    """Oracle: replay the trainer CTE chain (t1..tR hold the learned
    pairs), then apply each merge to the encode slice's words with the
    same list_reduce fold and aggregate token counts per document."""
    ctes = _bpe_trainer_ctes(BPE_SMALL_WHERE, BPE_SMALL_ROUNDS)
    ctes.append(
        f"""e0 AS (
  SELECT doc_id, list_filter(string_split(w, ''), c -> c != '') AS sym
  FROM (
    SELECT doc_id,
           UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS w
    FROM documents WHERE {BPE_ENCODE_WHERE}
  )
)"""
    )
    for r in range(1, BPE_SMALL_ROUNDS + 1):
        ctes.append(
            f"""e{r} AS (
  SELECT doc_id, list_reduce(list_transform(sym, s -> [s]), (acc, x) ->
    CASE WHEN len(acc) > 0 AND acc[-1] = t{r}.a AND x[1] = t{r}.b
         THEN list_append(acc[1:-2], t{r}.a || t{r}.b)
         ELSE list_append(acc, x[1]) END) AS sym
  FROM e{r - 1}, t{r}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(len(sym)) AS BIGINT) AS n_tokens
FROM e{BPE_SMALL_ROUNDS} GROUP BY doc_id ORDER BY doc_id"""
    )


CORPUS_QUERIES["corpus_bpe_encode"] = (corpus_bpe_encode, _bpe_encode_sql())
