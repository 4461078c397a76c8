"""Engine-level column functions.

Centralizes the deterministic hashing primitives used for sampling splits,
MinHash/SimHash, and LSH so that the Spark side and the DuckDB oracle SQL
(see __spark_entry__.oracle_sql) compute bit-identical values.

The reference uses ``MOD(ABS(FARM_FINGERPRINT(id)), 100)`` for its
deterministic 90/10 splits (ref: backend/controller/ml_model/templates/
model_bqml.sql:95-101). FarmHash has no Spark/DuckDB builtin, so the
engine defines its own portable primitives:

- ``hash_str`` : first 15 hex chars of md5 as a non-negative int64.
  Spark: conv(substr(md5(x),1,15),16,10) — DuckDB:
  ('0x'||substr(md5(x),1,15))::BIGINT. Bit-identical.
- ``hash_split_int``: affine-mod bucket for integer keys.

For raw speed where cross-engine parity is NOT required, use the Spark
builtin ``xxhash64`` (JVM codegen, no md5 string cost).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A Mersenne prime big enough for minhash permutations; fits in int64 math
# because hash values are < 2^60 and coefficients are < 2^20.
MINHASH_PRIME = 2147483647  # 2^31 - 1


def hash_str(col: Column | str) -> Column:
    """Portable 60-bit string hash (md5-prefix). Matches DuckDB's
    ``('0x'||substr(md5(x),1,15))::BIGINT`` exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash_split_int(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) for integer keys.

    Engine-neutral equivalent of the reference's
    ``MOD(ABS(FARM_FINGERPRINT(id)), 100)`` split
    (ref: model_bqml.sql:97-100): ``(key * 9973 + 7) % buckets``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(c.cast("bigint") * F.lit(9973) + F.lit(7), F.lit(buckets))


def minhash_value(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) mod p`` of a base hash."""
    return F.pmod(
        F.lit(a) * F.pmod(hash_col, F.lit(MINHASH_PRIME)) + F.lit(b),
        F.lit(MINHASH_PRIME),
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed JVM-side
    with higher-order functions (no Python UDF)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def l2_norm(a: Column) -> Column:
    """L2 norm of an array<numeric> column (JVM-side)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))


import weakref

# weak refs, not id()s: a stopped session's id can be reused by a new
# SparkSession object, which would silently skip re-registration
_UDF_SESSIONS: "weakref.WeakSet" = weakref.WeakSet()


def register_engine_udfs(spark) -> None:
    """Register the (few) Python UDFs the dialect layer emits.

    The transpiler stays JVM-side wherever Spark can express the
    semantics; the only escape hatch today is Unicode normalization
    (``NORMALIZE`` / ``NORMALIZE_AND_CASEFOLD``, ref BigQuery string
    functions), which has no Spark builtin. Arrow-vectorized when the
    runtime supports it; idempotent per SparkSession.
    """
    if spark in _UDF_SESSIONS:
        return

    import unicodedata

    from pyspark.sql.types import StringType

    def _normalize(s, form):
        if s is None or form is None:
            return None
        return unicodedata.normalize(form, s)

    def _normalize_casefold(s, form):
        if s is None or form is None:
            return None
        return unicodedata.normalize(form, s).casefold()

    from . import json_mutators as _jm

    def _register(name, fn, arity):
        try:
            udf = F.udf(fn, StringType(), useArrow=True)
        except TypeError:  # older pyspark without useArrow
            udf = F.udf(fn, StringType())
        spark.udf.register(name, udf)

    _register("bq_normalize", _normalize, 2)
    _register("bq_normalize_and_casefold", _normalize_casefold, 2)
    # JSON mutators (functions/json_mutators.py): BigQuery's JSON_SET /
    # JSON_REMOVE / JSON_ARRAY_APPEND / JSON_ARRAY_INSERT /
    # JSON_STRIP_NULLS have no Spark builtins and take arbitrary
    # JSONPaths — the documented escape hatch, Arrow-vectorized
    _register("bq_json_set", _jm.json_set, 3)
    _register("bq_json_remove", _jm.json_remove, 2)
    _register("bq_json_array_append", _jm.json_array_append, 3)
    _register("bq_json_array_insert", _jm.json_array_insert, 3)
    _register("bq_json_strip_nulls", _jm.json_strip_nulls, 1)
    _UDF_SESSIONS.add(spark)
