"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet dir, sorts columns by name and rows by value, and compares.
Floats must match to high precision (the driver value-hashes, so our
queries ROUND in both engines — here we check the rounded values agree
exactly).
"""

from __future__ import annotations

import datetime
import math
import re
import struct
from decimal import Decimal

import duckdb

from crmint_spark.catalog import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and v.is_integer():
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))


_SPARK_TO_ARROW = {
    "bigint": {"int64"},
    "int": {"int32"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string"},
    "date": {"date32[day]"},
    "timestamp": {"timestamp[us]"},
    "boolean": {"bool"},
}


def compare(spark_df, con, sql: str, rel_tol: float = 1e-9):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    # dtype agreement (the driver compares schemas, not just values)
    arrow = con.execute(sql).fetch_arrow_table()
    d_types = {f.name: str(f.type) for f in arrow.schema}
    for f in spark_df.schema.fields:
        st = f.dataType.simpleString()
        dt = d_types.get(f.name)
        dm = re.match(r"decimal\((\d+),(\d+)\)", st)
        if dm:  # arrow spells the same type decimal128(p, s)
            allowed = {st, f"decimal128({dm.group(1)}, {dm.group(2)})"}
        else:
            allowed = _SPARK_TO_ARROW.get(st, {st})
        assert dt in allowed, (
            f"dtype mismatch {f.name}: spark={st} duckdb={dt}"
        )
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = _sorted_rows(s_cols, s_rows)
    dc, dr = _sorted_rows(d_cols, d_rows)
    assert sc == dc, f"column mismatch: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        for j, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-9), (
                    f"row {i} col {sc[j]}: spark={x!r} duckdb={y!r}"
                )
                # flag non-exact floats loudly: driver hashes exact values
                assert x == y, (
                    f"row {i} col {sc[j]}: close but not exact "
                    f"spark={x!r} duckdb={y!r} — add ROUND"
                )
                # byte-level strict mode mirroring the driver's value
                # hash: -0.0 == 0.0 under Python ==, but the byte
                # patterns differ and the driver hashes bytes (the r5
                # q59 divergence class). Oracle style rule: any ROUNDed
                # difference/distance must append `+ 0` in BOTH engines.
                assert struct.pack(">d", x) == struct.pack(">d", y), (
                    f"row {i} col {sc[j]}: byte-level float mismatch "
                    f"(negative zero?) spark={x!r} duckdb={y!r} — "
                    f"append '+ 0' after ROUND in both engines"
                )
            else:
                assert x == y, f"row {i} col {sc[j]}: spark={x!r} duckdb={y!r}"
