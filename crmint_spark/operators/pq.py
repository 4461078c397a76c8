"""Product quantization (PQ) over the ``embeddings`` table.

PQ is the compression half of the canonical 100 TB vector-search layout
(IVF-PQ, Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): split each d-dim vector into M subvectors, learn a
small per-subspace codebook (K centroids), and store each vector as M
small codes — 64 float32 dims become 4 bytes here. Query scoring is
ADC (asymmetric distance computation): the query stays un-quantized and
its distance to each of the M*K centroids is precomputed, so scoring a
vector is M table lookups + adds, never a float-vector read.

Spark-first shape (mirrors the deterministic-IVF design, ivf.py):

- Codebook training is the same stride-seeded init + one Lloyd step as
  the deterministic IVF quantizer, run per subspace on ``slice(v, ...)``
  columns. Centroid state (M*K*subdim doubles) is driver-resident like
  Spark ML KMeans; per-dim means are ROUND()ed to 6 dp so the DuckDB
  oracle reproduces them bit-for-bit.
- ENCODING IS MAP-ONLY: each code is an ``array_min`` argmin over the
  literal codebook (the codebook ships inside the expression — it IS
  the broadcast), so encoding has no join and no shuffle at any corpus
  size — the plan is Scan -> Project.
- ADC SCORING IS MAP-ONLY TOO: the query's M*K partial distances are
  literals, a score is M ``element_at`` lookups summed, and top-k is a
  single TakeOrderedAndProject.

At 100 TB: store (vec_id, codes) — ~25x smaller than raw float32 —
partitioned by an IVF coarse list (ivf.ivf_write_partitioned); a query
prunes to probed partitions and scans codes only. Re-ranking reads raw
vectors for the top candidates alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ivf import IVF_TRAIN_ROWS, _dlit, _sq_l2, _train_stride, _SQL_SQ_L2

PQ_M = 4          # subspaces
PQ_K = 16         # codes per subspace
PQ_DIM = 64       # corpus embedding dims (TESTDATA.md)
PQ_SUBDIM = PQ_DIM // PQ_M
PQ_TOP_K = 10
PQ_QUERY_VEC_ID = 0
# Trainer bound shared with the coarse quantizer (the IVF-PQ oracle
# composes both chains over ONE params/train CTE pair, so the strides
# must agree): Lloyd statistics cover at most ~PQ_TRAIN_ROWS collected
# vectors at any corpus size; encoding always covers the full corpus.
PQ_TRAIN_ROWS = IVF_TRAIN_ROWS


def _sub(col, j: int):
    """Subspace j of an array<double> column (1-based slice)."""
    return F.slice(col, j * PQ_SUBDIM + 1, PQ_SUBDIM)


def _sub_codebook_literal(cents: list[tuple[int, list[float]]]):
    entries = ", ".join(
        "named_struct('code', {i}, 'c', array({cs}))".format(
            i=int(i), cs=", ".join(_dlit(x) for x in c)
        )
        for i, c in cents
    )
    return F.expr(f"array({entries})")


def _assign_code(sub_col, cents: list[tuple[int, list[float]]]):
    """argmin over the literal sub-codebook, ties broken by code asc —
    map-only (no join, no shuffle)."""
    dist_structs = F.transform(
        _sub_codebook_literal(cents),
        lambda s: F.struct(
            _sq_l2(sub_col, s["c"]).alias("d"), s["code"].alias("code")
        ),
    )
    return F.array_min(dist_structs)["code"]


def train_books_from(vecs: DataFrame, stride: int, tstride: int = 1):
    """Per-subspace codebooks from a prepared (vec_id, label, v) frame:
    stride-seeded init + ONE Lloyd step, now ONE bounded job total
    (round 11, optimization guide §1.2): a single collect fetches the
    seed grid (<= PQ_K rows — the K stride-multiples below K*stride)
    together with the vec_id % tstride = 0 trainer sample
    (<= ~PQ_TRAIN_ROWS rows at any corpus size), and the per-subspace
    assignment + centroid means run driver-side. Arithmetic stays
    bit-identical to the previous in-engine pass, which is what the
    DuckDB oracles replay: assignment is argmin over (squared-L2 left
    fold in subdim order, code) — the ``array_min`` struct tie-break —
    and means round to 6 dp with Spark's HALF_UP rule
    (``_round6_half_up``; ROUND absorbs summation-order differences
    between engines, as it already did Spark-vs-DuckDB). Codes with no
    assigned sample vectors drop out, mirroring the groupBy."""
    from .ivf import _py_lloyd_step

    sample_rows = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in vecs.filter(
            (F.col("vec_id") % tstride == 0)
            | (
                (F.col("vec_id") % stride == 0)
                & (F.col("vec_id") < PQ_K * stride)
            )
        )
        .select("vec_id", "v")
        .collect()
    ]
    seeds = sorted(
        (vid, v)
        for vid, v in sample_rows
        if vid % stride == 0 and vid < PQ_K * stride
    )
    train_vs = [v for vid, v in sample_rows if vid % tstride == 0]
    books: list[list[tuple[int, list[float]]]] = []
    for j in range(PQ_M):
        lo, hi = j * PQ_SUBDIM, (j + 1) * PQ_SUBDIM
        inits = [(vid // stride, v[lo:hi]) for vid, v in seeds]
        books.append(_py_lloyd_step([v[lo:hi] for v in train_vs], inits))
    return books


def train_pq_codebooks(spark, sf_dir: str):
    """-> (vecs DataFrame, [per-subspace codebook]); driver holds
    M*K*subdim doubles, like Spark ML."""
    from ..catalog import load
    from .similarity import _corpus_stats

    emb = load(spark, sf_dir, "embeddings")
    n, _ = _corpus_stats(spark, sf_dir)
    stride = max(n // PQ_K, 1)
    vecs = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()
    return vecs, train_books_from(vecs, stride, _train_stride(n))


def encode_pq(vecs: DataFrame, books) -> DataFrame:
    """(vec_id, label, v, codes) — ALL M codes in one map-only pass."""
    codes = F.array(
        *[_assign_code(_sub(F.col("v"), j), books[j]) for j in range(PQ_M)]
    )
    return vecs.withColumn("codes", codes)


def embedding_pq_codes(spark, sf_dir: str) -> DataFrame:
    """Registry entry: the PQ-encoded corpus with per-vector
    reconstruction error (squared L2 to the decoded centroids, summed
    subspace-by-subspace in index order — fold order matches the
    oracle). The plan is Scan -> Project: no join, no shuffle."""
    vecs, books = train_pq_codebooks(spark, sf_dir)
    enc = encode_pq(vecs, books)
    err = None
    for j in range(PQ_M):
        cb = _sub_codebook_literal(books[j])
        # look the centroid up BY code (codes need not stay dense after
        # the Lloyd step), still map-only
        code_j = F.element_at("codes", j + 1)
        cent = F.element_at(
            F.filter(cb, lambda s: s["code"] == code_j), 1
        )["c"]
        d = _sq_l2(_sub(F.col("v"), j), cent)
        err = d if err is None else err + d
    out = enc.select(
        "vec_id",
        F.concat_ws("-", *[F.element_at("codes", j + 1) for j in range(PQ_M)])
        .alias("pq_code"),
        F.round(err, 6).alias("recon_sq_err"),
    )
    vecs.unpersist()
    return out


def _py_sq_l2(c, qs) -> float:
    acc = 0.0
    for x, y in zip(c, qs):
        acc = acc + (x - y) * (x - y)
    return acc


def adc_expr(books, q: list[float]):
    """ADC distance column for query ``q``: the M*K partial distances
    are computed on the driver and shipped as literal maps keyed BY
    code (codes need not stay dense after the Lloyd step) — scoring is
    M element_at lookups + adds per row, fully map-only."""
    adc = None
    for j in range(PQ_M):
        qs = q[j * PQ_SUBDIM : (j + 1) * PQ_SUBDIM]
        pairs = ", ".join(
            f"{int(c)}, {_dlit(_py_sq_l2(v, qs))}" for c, v in books[j]
        )
        lut = F.expr(f"map({pairs})")
        d = F.element_at(lut, F.element_at("codes", j + 1))
        adc = d if adc is None else adc + d
    return adc


def ann_pq_adc_topk(spark, sf_dir: str) -> DataFrame:
    """Registry entry: ADC top-k for the probe vector (vec_id = 0) —
    one map-only pass + TakeOrderedAndProject."""
    vecs, books = train_pq_codebooks(spark, sf_dir)
    enc = encode_pq(vecs, books)
    q = [
        float(x)
        for x in vecs.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).first()["v"]
    ]
    out = (
        enc.filter(F.col("vec_id") != PQ_QUERY_VEC_ID)
        .select("vec_id", "label", F.round(adc_expr(books, q), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(PQ_TOP_K)
    )
    vecs.unpersist()
    return out


IVFPQ_N_PROBE = 4


def ann_ivfpq_topk(spark, sf_dir: str) -> DataFrame:
    """Registry entry: the canonical IVF-PQ pipeline (Jégou et al. 2011)
    — the deterministic coarse quantizer (ivf.py, 2 Lloyd steps) prunes
    to IVFPQ_N_PROBE inverted lists, and ADC over the PQ codes scores
    ONLY the probed lists' vectors. At 100 TB this is the layout that
    wins: corpus partitioned by coarse list (partition pruning reads
    n_probe/k of the files), each partition stores 4-byte codes instead
    of 256-byte float vectors, and scoring never touches a raw vector.
    Both quantizers are stride-seeded + Lloyd-stepped, so the DuckDB
    oracle certifies the full composition end-to-end."""
    from .ivf import IVF_K, _py_sq_l2 as ivf_sq_l2, deterministic_assign

    vecs, assigned, cent_rows = deterministic_assign(spark, sf_dir)
    from .similarity import _corpus_stats

    n, _ = _corpus_stats(spark, sf_dir)
    books = train_books_from(vecs, max(n // PQ_K, 1), _train_stride(n))
    q = [
        float(x)
        for x in vecs.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).first()["v"]
    ]
    probes = [
        lid
        for _, lid in sorted(
            (ivf_sq_l2(c, q), lid) for lid, c in cent_rows
        )[:IVFPQ_N_PROBE]
    ]
    enc = encode_pq(assigned, books)
    out = (
        enc.filter(
            F.col("list_id").isin(probes)
            & (F.col("vec_id") != PQ_QUERY_VEC_ID)
        )
        .select("vec_id", "label", F.round(adc_expr(books, q), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(PQ_TOP_K)
    )
    vecs.unpersist()
    return out


PQ_RERANK_R = 50


def ann_ivfpq_rerank_topk(spark, sf_dir: str) -> DataFrame:
    """Registry entry: IVF-PQ with an exact re-rank stage — the
    production composition promised in the module docstring. Stage 1 is
    ann_ivfpq_topk's map-only ADC scan over the probed lists, kept to
    the top PQ_RERANK_R candidates; stage 2 re-scores ONLY those R
    vectors against their raw floats (exact squared L2 to the query) and
    emits the exact-ordered top-k, fixing any ADC quantization rank
    inversions inside the candidate set.

    At 100 TB the raw-vector read is candidate-bounded by construction:
    the R ids are driver scalars (like the probe list), so the re-rank
    scan carries a pushed-down ``vec_id IN (...)`` parquet filter — R
    row-group lookups, never a corpus scan or a shuffle join."""
    from ..catalog import load
    from .ivf import _py_sq_l2 as ivf_sq_l2, deterministic_assign
    from .similarity import _corpus_stats

    vecs, assigned, cent_rows = deterministic_assign(spark, sf_dir)
    n, _ = _corpus_stats(spark, sf_dir)
    books = train_books_from(vecs, max(n // PQ_K, 1), _train_stride(n))
    q = [
        float(x)
        for x in vecs.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).first()["v"]
    ]
    probes = [
        lid
        for _, lid in sorted(
            (ivf_sq_l2(c, q), lid) for lid, c in cent_rows
        )[:IVFPQ_N_PROBE]
    ]
    enc = encode_pq(assigned, books)
    cand_ids = [
        r["vec_id"]
        for r in enc.filter(
            F.col("list_id").isin(probes)
            & (F.col("vec_id") != PQ_QUERY_VEC_ID)
        )
        .select("vec_id", F.round(adc_expr(books, q), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(PQ_RERANK_R)
        .collect()
    ]
    vecs.unpersist()
    # fresh scan so the IN filter reaches the parquet reader
    raw = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isin(cand_ids)
    )
    q_lit = F.expr("array(" + ", ".join(_dlit(x) for x in q) + ")")
    exact = _sq_l2(
        F.transform("embedding", lambda x: x.cast("double")), q_lit
    )
    return (
        raw.select("vec_id", "label", F.round(exact, 6).alias("exact_sq_dist"))
        .orderBy(F.asc("exact_sq_dist"), F.asc("vec_id"))
        .limit(PQ_TOP_K)
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: identical stride init + 1 Lloyd step per subspace.

def _sql_sub_assign(vecs_cte: str, cent_cte: str, j: int) -> str:
    d = _SQL_SQ_L2.format(a=f"v[{j * PQ_SUBDIM + 1}:{(j + 1) * PQ_SUBDIM}]", b="c")
    return f"""
  SELECT vec_id, label, v, code FROM (
    SELECT vec_id, label, v, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, code) AS rn
    FROM (
      SELECT t.vec_id, t.label, t.v, s.code, {d} AS d
      FROM {vecs_cte} t, {cent_cte} s
    )
  ) WHERE rn = 1
"""


def _sql_sub_centroids(assign_cte: str, j: int) -> str:
    return f"""
  SELECT code, list(cval ORDER BY dim) AS c FROM (
    SELECT code, dim, ROUND(AVG(val), 6) AS cval
    FROM (
      SELECT code,
             generate_subscripts(v[{j * PQ_SUBDIM + 1}:{(j + 1) * PQ_SUBDIM}], 1) AS dim,
             UNNEST(v[{j * PQ_SUBDIM + 1}:{(j + 1) * PQ_SUBDIM}]) AS val
      FROM {assign_cte}
    ) GROUP BY code, dim
  ) GROUP BY code
"""


def _sql_pq_ctes(with_base: bool = True) -> str:
    """``with_base=False`` omits the vecs/params CTEs so the chain can
    compose with the coarse IVF chain (which defines identical ones —
    PQ_K == IVF_K, so the stride is shared)."""
    parts = []
    if with_base:
        parts.append(
            f"""vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), params AS (
  SELECT GREATEST(CAST(FLOOR(COUNT(*) / {PQ_K}.0) AS BIGINT), 1) AS stride,
         GREATEST(CAST(CEIL(COUNT(*) / {PQ_TRAIN_ROWS}.0) AS BIGINT), 1)
           AS tstride
  FROM embeddings
), train AS (
  SELECT vec_id, label, v FROM vecs, params WHERE vec_id % tstride = 0
)"""
        )
    for j in range(PQ_M):
        parts.append(
            f"""init_{j} AS (
  SELECT CAST(vec_id / stride AS INT) AS code,
         v[{j * PQ_SUBDIM + 1}:{(j + 1) * PQ_SUBDIM}] AS c
  FROM vecs, params
  WHERE vec_id % stride = 0 AND vec_id < {PQ_K} * stride
), a_{j} AS ({_sql_sub_assign('train', f'init_{j}', j)}
), cb_{j} AS ({_sql_sub_centroids(f'a_{j}', j)}
), asg_{j} AS ({_sql_sub_assign('vecs', f'cb_{j}', j)}
)"""
        )
    return ",\n".join(parts)


def _sql_recon_err() -> str:
    terms = []
    for j in range(PQ_M):
        terms.append(
            _SQL_SQ_L2.format(
                a=f"a{j}.v[{j * PQ_SUBDIM + 1}:{(j + 1) * PQ_SUBDIM}]",
                b=f"c{j}.c",
            )
        )
    return " + ".join(terms)


_PQ_JOINS = "\n".join(
    f"JOIN asg_{j} a{j} ON a0.vec_id = a{j}.vec_id "
    f"JOIN cb_{j} c{j} ON a{j}.code = c{j}.code"
    for j in range(1, PQ_M)
) + "\n" + "JOIN cb_0 c0 ON a0.code = c0.code"

PQ_CODES_SQL = f"""
WITH {_sql_pq_ctes()}
SELECT a0.vec_id AS vec_id,
       {" || '-' || ".join(f"CAST(a{j}.code AS VARCHAR)" for j in range(PQ_M))}
         AS pq_code,
       ROUND({_sql_recon_err()}, 6) AS recon_sq_err
FROM asg_0 a0
{_PQ_JOINS}
"""

_PQ_ADC_TERMS = " + ".join(
    _SQL_SQ_L2.format(
        a=f"q.qv[{j * PQ_SUBDIM + 1}:{(j + 1) * PQ_SUBDIM}]", b=f"c{j}.c"
    )
    for j in range(PQ_M)
)

PQ_ADC_SQL = f"""
WITH {_sql_pq_ctes()}, q AS (
  SELECT v AS qv FROM vecs WHERE vec_id = {PQ_QUERY_VEC_ID}
)
SELECT a0.vec_id AS vec_id, a0.label AS label,
       ROUND({_PQ_ADC_TERMS}, 6) AS adc_dist
FROM asg_0 a0
{_PQ_JOINS}, q
WHERE a0.vec_id <> {PQ_QUERY_VEC_ID}
ORDER BY adc_dist ASC, vec_id ASC LIMIT {PQ_TOP_K}
"""


def _ivfpq_sql() -> str:
    """Full IVF-PQ composition: the coarse chain (ivf._sql_assigned_ctes
    — defines vecs/params/c2/assigned), the PQ chain WITHOUT its base
    CTEs (shared stride since PQ_K == IVF_K), probe selection, and ADC
    restricted to the probed coarse lists."""
    from .ivf import IVF_K, _sql_assigned_ctes, _SQL_SQ_L2 as _L2

    assert IVF_K == PQ_K  # shared params CTE contract
    return f"""
WITH {_sql_assigned_ctes()},
{_sql_pq_ctes(with_base=False)}, q AS (
  SELECT v AS qv FROM vecs WHERE vec_id = {PQ_QUERY_VEC_ID}
), probe AS (
  SELECT list_id
  FROM c2, q
  ORDER BY {_L2.format(a='c', b='qv')} ASC, list_id ASC
  LIMIT {IVFPQ_N_PROBE}
)
SELECT a0.vec_id AS vec_id, a0.label AS label,
       ROUND({_PQ_ADC_TERMS}, 6) AS adc_dist
FROM asg_0 a0
{_PQ_JOINS}
JOIN assigned coarse ON a0.vec_id = coarse.vec_id, q
WHERE coarse.list_id IN (SELECT list_id FROM probe)
  AND a0.vec_id <> {PQ_QUERY_VEC_ID}
ORDER BY adc_dist ASC, vec_id ASC LIMIT {PQ_TOP_K}
"""


IVFPQ_SQL = _ivfpq_sql()


def _ivfpq_rerank_sql() -> str:
    """Candidate CTE = the IVF-PQ ADC query kept to top-R; the re-rank
    joins those R ids back to raw vectors and orders by exact sq-L2."""
    from .ivf import IVF_K, _sql_assigned_ctes, _SQL_SQ_L2 as _L2

    assert IVF_K == PQ_K
    return f"""
WITH {_sql_assigned_ctes()},
{_sql_pq_ctes(with_base=False)}, q AS (
  SELECT v AS qv FROM vecs WHERE vec_id = {PQ_QUERY_VEC_ID}
), probe AS (
  SELECT list_id
  FROM c2, q
  ORDER BY {_L2.format(a='c', b='qv')} ASC, list_id ASC
  LIMIT {IVFPQ_N_PROBE}
), cand AS (
  SELECT a0.vec_id AS vec_id,
         ROUND({_PQ_ADC_TERMS}, 6) AS adc_dist
  FROM asg_0 a0
  {_PQ_JOINS}
  JOIN assigned coarse ON a0.vec_id = coarse.vec_id, q
  WHERE coarse.list_id IN (SELECT list_id FROM probe)
    AND a0.vec_id <> {PQ_QUERY_VEC_ID}
  ORDER BY adc_dist ASC, vec_id ASC LIMIT {PQ_RERANK_R}
)
SELECT v.vec_id AS vec_id, v.label AS label,
       ROUND({_L2.format(a='v.v', b='qv')}, 6) AS exact_sq_dist
FROM vecs v JOIN cand c ON v.vec_id = c.vec_id, q
ORDER BY exact_sq_dist ASC, vec_id ASC LIMIT {PQ_TOP_K}
"""


IVFPQ_RERANK_SQL = _ivfpq_rerank_sql()
