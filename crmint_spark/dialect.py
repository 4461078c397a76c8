"""BigQuery -> Spark SQL dialect rewriting + multi-statement script
handling.

The reference pipes SQL scripts verbatim into BigQuery
(ref: backend/jobs/workers/bigquery/bq_script_executor.py:57-74). Spark
SQL covers nearly all of that surface; this module closes the gaps the
reference's generated SQL actually uses (SURVEY §2.2 / §4):

- script splitting on top-level ``;`` (string/comment aware),
- ``DECLARE``/``SET`` scripting variables -> driver-side scalar eval
  substituted into later statements (ref: output.sql:2-7),
- ``SELECT * EXCEPT(a, b)`` -> explicit select list,
- ``FARM_FINGERPRINT(x)`` -> ``xxhash64(x)`` (documented non-bit-parity),
- ``CAST(x AS DATE FORMAT 'YYYYMMDD')`` -> ``to_date(x, 'yyyyMMdd')``,
- ``arr[OFFSET(n)]`` / ``arr[ORDINAL(n)]`` -> 0/1-based element_at,
- ``IFNULL`` -> ``coalesce`` (Spark has ifnull, kept for safety),
- ``REGEXP_CONTAINS(x, p)`` -> ``x RLIKE p``,
- ``FORMAT_DATE/FORMAT_TIMESTAMP`` strftime patterns -> date_format
  patterns,
- ``TIMESTAMP_MICROS`` -> ``timestamp_micros`` (same name; passthrough),
- backtick-quoted ``project.dataset.table`` -> catalog-safe view name.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_STRFTIME_TO_SPARK = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%F", "yyyy-MM-dd"),
    ("%T", "HH:mm:ss"),
    ("%Ez", "XXX"),
    ("%z", "Z"),
]

_BQ_DATE_FMT = {"YYYYMMDD": "yyyyMMdd", "YYYY-MM-DD": "yyyy-MM-dd"}


def split_script(script: str) -> list[str]:
    """Split a SQL script into statements on top-level semicolons,
    respecting single/double-quoted strings, backticks, and ``--`` /
    ``/* */`` comments."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    state: str | None = None  # "'", '"', '`', '--', '/*'
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if state is None:
            if ch == ";":
                stmt = "".join(buf).strip()
                if stmt:
                    stmts.append(stmt)
                buf = []
                i += 1
                continue
            if ch in ("'", '"', "`"):
                state = ch
            elif ch == "-" and nxt == "-":
                state = "--"
            elif ch == "/" and nxt == "*":
                state = "/*"
        elif state in ("'", '"'):
            if ch == "\\":
                buf.append(ch)
                i += 1
                ch = script[i] if i < n else ""
            elif ch == state:
                state = None
        elif state == "`":
            if ch == "`":
                state = None
        elif state == "--":
            if ch == "\n":
                state = None
        elif state == "/*":
            if ch == "*" and nxt == "/":
                buf.append("*")
                i += 1
                ch = "/"
                state = None
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def _rewrite_select_except(sql: str) -> str:
    """``SELECT [t.]* EXCEPT(a, b) FROM`` -> Spark's ``* EXCEPT (a, b)``
    (Spark 3.4+ supports EXCEPT with parens after *); normalize spacing."""
    return re.sub(
        r"\*\s+EXCEPT\s*\(",
        "* EXCEPT (",
        sql,
        flags=re.IGNORECASE,
    )


def _rewrite_cast_date_format(sql: str) -> str:
    def repl(m: re.Match) -> str:
        expr, fmt = m.group(1), m.group(2).strip("'\"")
        spark_fmt = _BQ_DATE_FMT.get(fmt.upper(), fmt)
        return f"to_date({expr}, '{spark_fmt}')"

    return re.sub(
        r"CAST\s*\(\s*(.+?)\s+AS\s+DATE\s+FORMAT\s+('[^']*'|\"[^\"]*\")\s*\)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _rewrite_offset_ordinal(sql: str) -> str:
    sql = re.sub(
        r"\[\s*OFFSET\s*\(\s*(\d+)\s*\)\s*\]",
        lambda m: f"[{m.group(1)}]",  # Spark [] is 0-based like OFFSET
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\[\s*ORDINAL\s*\(\s*(\d+)\s*\)\s*\]",
        lambda m: f"[{int(m.group(1)) - 1}]",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def _rewrite_format_date(sql: str) -> str:
    def repl(m: re.Match) -> str:
        func, fmt, expr = m.group(1).lower(), m.group(2), m.group(3)
        for a, b in sorted(_STRFTIME_TO_SPARK, key=lambda p: -len(p[0])):
            fmt = fmt.replace(a, b)
        return f"date_format({expr}, '{fmt}')"

    return re.sub(
        r"(FORMAT_DATE|FORMAT_TIMESTAMP|FORMAT_DATETIME)\s*\(\s*'([^']*)'\s*,\s*([^)]+)\)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _rewrite_backtick_tables(sql: str) -> str:
    """```proj.ds.table``` -> safe single-part view name."""
    from .catalog import _safe_view_name

    return re.sub(
        r"`([A-Za-z0-9_\-.]+)`",
        lambda m: _safe_view_name(m.group(1)) if "." in m.group(1) else m.group(0),
        sql,
    )


def transpile_statement(sql: str) -> str:
    """Apply all BigQuery->Spark rewrites to one statement."""
    out = sql
    # BigQuery UI dialect markers
    out = re.sub(r"^\s*#\s*(standardSQL|legacySQL)\b", "", out, flags=re.IGNORECASE)
    # BigQuery allows unordered ranking windows (ROW_NUMBER() OVER());
    # Spark demands an ORDER BY — constant ordering reproduces BigQuery's
    # arbitrary-order semantics
    out = re.sub(r"\bOVER\s*\(\s*\)", "OVER (ORDER BY 1)", out, flags=re.IGNORECASE)
    out = _rewrite_backtick_tables(out)
    out = _rewrite_select_except(out)
    out = _rewrite_cast_date_format(out)
    out = _rewrite_offset_ordinal(out)
    out = _rewrite_format_date(out)
    out = re.sub(
        r"\bFARM_FINGERPRINT\s*\(", "xxhash64(", out, flags=re.IGNORECASE
    )
    out = re.sub(r"\bREGEXP_CONTAINS\s*\(", "regexp_like(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bSAFE_DIVIDE\s*\(", "try_divide(", out, flags=re.IGNORECASE)
    out = re.sub(
        r"\bGENERATE_UUID\s*\(\s*\)", "uuid()", out, flags=re.IGNORECASE
    )
    return out


def extract_with_clause(sql: str) -> str:
    """Return the leading ``WITH name AS (...), ...`` clause (or '').

    Used to re-scope outer CTEs when an inner ``ML.PREDICT``/
    ``ML.EVALUATE`` subquery references them (the reference's
    evaluate-model SQL does exactly this)."""
    m = re.match(r"\s*WITH\b", sql, re.IGNORECASE)
    if not m:
        return ""
    i = m.end()
    n = len(sql)
    while True:
        # skip "name AS ("
        open_paren = sql.find("(", i)
        if open_paren < 0:
            return ""
        depth, j = 1, open_paren + 1
        in_str: str | None = None
        while j < n and depth:
            ch = sql[j]
            if in_str:
                if ch == in_str:
                    in_str = None
            elif ch in ("'", '"'):
                in_str = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            j += 1
        if depth:
            return ""
        # another CTE follows?
        rest = sql[j:]
        m2 = re.match(r"\s*,", rest)
        if m2:
            i = j + m2.end()
            continue
        return sql[: j]


_CREATE_OR_REPLACE_TABLE_RE = re.compile(
    r"^\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+(`?[\w.\-]+`?)(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def expand_create_or_replace_table(stmt: str) -> list[str]:
    """``CREATE OR REPLACE TABLE x ... AS ...`` -> [DROP IF EXISTS,
    CREATE TABLE ...]: Spark's v1 session catalog rejects REPLACE TABLE
    AS SELECT (a v2-catalog feature), but the reference's generated DDL
    uses OR REPLACE everywhere (ref: model_bqml.sql:18,31; output.sql:9).
    """
    m = _CREATE_OR_REPLACE_TABLE_RE.match(stmt)
    if not m:
        return [stmt]
    name, rest = m.group(1), m.group(2)
    return [
        f"DROP TABLE IF EXISTS {name}",
        f"CREATE TABLE {name}{rest}",
    ]


_DECLARE_RE = re.compile(
    r"^\s*DECLARE\s+(\w+)\s+[\w<>,() ]+?(?:\s+DEFAULT\s+(.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_SET_RE = re.compile(r"^\s*SET\s+(\w+)\s*=\s*(.+)$", re.IGNORECASE | re.DOTALL)


@dataclass
class ScriptContext:
    """Scripting variable state across statements (DECLARE/SET)."""

    variables: dict[str, object] = field(default_factory=dict)

    def substitute(self, sql: str) -> str:
        out = sql
        for name, value in self.variables.items():
            lit = f"'{value}'" if isinstance(value, str) else str(value)
            out = re.sub(rf"\b{re.escape(name)}\b", lit, out)
        return out


def classify_statement(sql: str) -> tuple[str, re.Match | None]:
    """-> ('declare'|'set'|'sql', match)."""
    m = _DECLARE_RE.match(sql)
    if m:
        return "declare", m
    m = _SET_RE.match(sql)
    if m:
        return "set", m
    return "sql", None
