"""Everyday BigQuery function surface through the transpiler: each case
is a BigQuery expression a reference user could have in a script,
evaluated via transpile_statement + spark.sql and checked by value.
"""

from __future__ import annotations

import datetime

import pytest

from crmint_spark.dialect import transpile_statement

# (BigQuery expression, expected value)
CASES = [
    # SAFE_* family -> try_*
    ("SAFE_CAST('12x' AS INT64)", None),
    ("SAFE_CAST('12' AS INT64)", 12),
    ("SAFE_ADD(9223372036854775807, 1)", None),
    ("SAFE_MULTIPLY(3, 4)", 12),
    ("SAFE_SUBTRACT(3, 4)", -1),
    ("SAFE_DIVIDE(1, 0)", None),
    # conditional aggregates (scalar via single-row FROM below)
    ("COUNTIF(1 < 2)", 1),
    ("LOGICAL_AND(TRUE)", True),
    ("LOGICAL_OR(FALSE)", False),
    # arrays
    ("ARRAY_LENGTH([1, 2, 3])", 3),
    ("ARRAY_TO_STRING(['a', 'b'], '-')", "a-b"),
    ("ARRAY_CONCAT([1], [2, 3])", [1, 2, 3]),
    ("ARRAY_REVERSE([1, 2])", [2, 1]),
    ("GENERATE_ARRAY(1, 4)", [1, 2, 3, 4]),
    (
        "GENERATE_DATE_ARRAY(DATE '2024-01-01', DATE '2024-01-03')",
        [datetime.date(2024, 1, d) for d in (1, 2, 3)],
    ),
    # strings
    ("STRPOS('banana', 'na')", 3),
    ("STARTS_WITH('spark', 'sp')", True),
    ("ENDS_WITH('spark', 'rk')", True),
    ("BYTE_LENGTH('abc')", 3),
    ("FORMAT('%d-%s', 7, 'x')", "7-x"),
    # JSON
    ("JSON_EXTRACT_SCALAR('{\"a\": 5}', '$.a')", "5"),
    ("JSON_VALUE('{\"a\": \"b\"}', '$.a')", "b"),
    ("JSON_QUERY('{\"a\": {\"b\": 1}}', '$.a')", '{"b":1}'),
    # date/time diffs: BigQuery (end, start, part) ordering
    ("DATE_DIFF(DATE '2024-03-01', DATE '2024-01-01', DAY)", 60),
    ("DATE_DIFF(DATE '2024-03-01', DATE '2024-01-01', MONTH)", 2),
    ("DATE_DIFF(DATE '2023-01-01', DATE '2024-01-01', YEAR)", -1),
    (
        "TIMESTAMP_DIFF(TIMESTAMP '2024-01-01 02:30:00', "
        "TIMESTAMP '2024-01-01 01:00:00', MINUTE)",
        90,
    ),
    # truncation: BigQuery (expr, part) ordering; DATE_TRUNC returns DATE
    ("DATE_TRUNC(DATE '2024-03-17', MONTH)", datetime.date(2024, 3, 1)),
    (
        "TIMESTAMP_TRUNC(TIMESTAMP '2024-03-17 10:40:00', HOUR)",
        datetime.datetime(2024, 3, 17, 10, 0, 0),
    ),
    # parsing with strftime formats
    ("PARSE_DATE('%Y%m%d', '20240317')", datetime.date(2024, 3, 17)),
    (
        "PARSE_TIMESTAMP('%Y-%m-%d %H:%M:%S', '2024-03-17 10:40:00')",
        datetime.datetime(2024, 3, 17, 10, 40, 0),
    ),
    # arithmetic spellings
    ("DIV(7, 2)", 3),
    ("IEEE_DIVIDE(1, 0)", float("inf")),
    # BigQuery LOG(x, base) has reversed args vs Spark log(base, x)
    ("LOG(8, 2)", 3.0),
    ("LOG(LOG(65536, 4), 2)", 3.0),
    ("ROUND(LOG(EXP(2)), 6)", 2.0),
    ("DIV(DIV(8, 2), 2)", 2),
    ("UNIX_DATE(DATE '1970-01-11')", 10),
    ("DATE_FROM_UNIX_DATE(10)", datetime.date(1970, 1, 11)),
    # epoch conversions are same-name passthroughs — prove they survive
    ("UNIX_MILLIS(TIMESTAMP '1970-01-01 00:00:01')", 1000),
    (
        "TIMESTAMP_MILLIS(1000)",
        datetime.datetime(1970, 1, 1, 0, 0, 1),
    ),
    # quantile vector shape (exact on a 1-row group)
    ("APPROX_QUANTILES(5, 2)", [5, 5, 5]),
    # array literals (BigQuery bracket syntax) + subscripts untouched
    ("ARRAY<INT64>[7, 8]", [7, 8]),
    ("[1, 2, 3][OFFSET(1)]", 2),
    ("['x', 'a[not a literal]'][ORDINAL(1)]", "x"),
    # struct literals: named fields parse natively, typed form stripped
    ("STRUCT(1 AS a, 'x' AS b).b", "x"),
    ("STRUCT<a INT64, b ARRAY<STRING>>(5, ['y']).a", 5),
    # NET.REG_DOMAIN against the vendored public-suffix snapshot
    ("NET.REG_DOMAIN('https://www.bbc.co.uk/news')", "bbc.co.uk"),
    ("NET.REG_DOMAIN('http://a.b.example.com/x?y=1')", "example.com"),
    ("NET.REG_DOMAIN('https://co.uk')", None),
    ("NET.REG_DOMAIN('https://shop.gov.au/cart')", "shop.gov.au"),
    # INSTR occurrence + backward search (overlapping matches, like BQ)
    ("INSTR('banana', 'ana', 1, 2)", 4),
    ("INSTR('banana', 'ana', 2, 1)", 2),
    ("INSTR('banana', 'ana', 3, 1)", 4),
    ("INSTR('banana', 'ana', -1, 1)", 4),
    ("INSTR('banana', 'ana', -1, 2)", 2),
    ("INSTR('banana', 'ana', -4, 1)", 2),
    ("INSTR('banana', 'xyz', 1, 1)", 0),
    ("INSTR('banana', 'ana', 1, 3)", 0),
    ("INSTR(CAST(NULL AS STRING), 'a', 1, 1)", None),
    ("INSTR('banana', CAST(NULL AS STRING), -1, 1)", None),
    # empty substring: found at the search position (both code paths
    # agree — fast-path 3-arg locate and general 4-arg enumeration)
    ("INSTR('abc', '', 1)", 1),
    ("INSTR('abc', '', 1, 1)", 1),
    ("INSTR('abc', '', 2)", 2),
    ("INSTR('abc', '', 2, 2)", 3),
    ("INSTR('abc', '', 4)", 4),
    ("INSTR('abc', '', 9)", 0),
    ("INSTR('abc', '', 9, 1)", 0),
    ("INSTR('abc', '', -1, 1)", 3),
    ("INSTR(CAST(NULL AS STRING), '', 1)", None),
    # string distance / numeric predicates / byte decoding
    ("EDIT_DISTANCE('kitten', 'sitting')", 3),
    ("EDIT_DISTANCE('kitten', 'sitting', 2)", 2),
    ("EDIT_DISTANCE('kitten', 'sitting', max_distance => 2)", 2),
    ("IS_INF(IEEE_DIVIDE(1, 0))", True),
    ("IS_INF(1.5)", False),
    ("IS_NAN(IEEE_DIVIDE(0, 0))", True),
    ("SAFE_CONVERT_BYTES_TO_STRING(CAST('ab' AS BYTES))", "ab"),
    # vector distance functions over array columns (HOF folds)
    ("COSINE_DISTANCE([1.0, 0.0], [0.0, 1.0])", 1.0),
    ("COSINE_DISTANCE([2.0, 0.0], [1.0, 0.0])", 0.0),
    ("EUCLIDEAN_DISTANCE([0.0, 3.0], [4.0, 0.0])", 5.0),
    # JSON object keys
    ('JSON_KEYS(\'{"a": 1, "b": 2}\')', ["a", "b"]),
    (
        "ARRAY_LENGTH(GENERATE_TIMESTAMP_ARRAY(TIMESTAMP '2024-01-01', "
        "TIMESTAMP '2024-01-02', INTERVAL 6 HOUR))",
        5,
    ),
    # array accessors / slicing (BigQuery 0-based inclusive, negatives
    # from the end, out-of-range clamped)
    ("ARRAY_FIRST([7, 8])", 7),
    ("ARRAY_LAST([7, 8])", 8),
    ("ARRAY_SLICE([1, 2, 3, 4, 5], 1, 3)", [2, 3, 4]),
    ("ARRAY_SLICE([1, 2, 3, 4, 5], -2, -1)", [4, 5]),
    ("ARRAY_SLICE([1, 2, 3, 4, 5], 2, 99)", [3, 4, 5]),
    ("ARRAY_INCLUDES([1, 2], 2)", True),
    # bucketing (default origin 1950-01-01; exact integer modulo math)
    (
        "DATE_BUCKET(DATE '2024-01-05', INTERVAL 7 DAY, DATE '2024-01-01')",
        datetime.date(2024, 1, 1),
    ),
    (
        "TIMESTAMP_BUCKET(TIMESTAMP '2024-01-01 10:47:13', INTERVAL 1 HOUR)",
        datetime.datetime(2024, 1, 1, 10, 0, 0),
    ),
    # EXTRACT field mappings: DOY / ISO week+year / BigQuery Sunday-week
    ("EXTRACT(DAYOFYEAR FROM DATE '2024-02-01')", 32),
    ("EXTRACT(ISOWEEK FROM DATE '2024-01-07')", 1),
    ("EXTRACT(ISOYEAR FROM DATE '2023-01-01')", 2022),
    ("EXTRACT(WEEK FROM DATE '2024-01-06')", 0),
    ("EXTRACT(WEEK FROM DATE '2024-01-07')", 1),
    ("EXTRACT(WEEK FROM DATE '2023-12-31')", 53),
    # digests return BYTES (unhex of the hex digest)
    ("BYTE_LENGTH(SHA256('x'))", 32),
    ("BYTE_LENGTH(SHA512('x'))", 64),
    ("SUBSTR(TO_HEX(SHA256('abc')), 1, 4)", "ba78"),  # TO_HEX keeps hex
    # JSON constructors / typed literals / accessors
    ("JSON_ARRAY(1, 2)", "[1,2]"),
    ("JSON_OBJECT('a', 1)", '{"a":1}'),
    ("INT64(JSON '5')", 5),
    ("FLOAT64(JSON '1.5')", 1.5),
    ("BOOL(JSON 'true')", True),
    ("LAX_INT64(JSON '\"10\"')", 10),
    ("LAX_INT64(JSON '\"zz\"')", None),
    ("LAX_STRING(JSON '\"b\"')", "b"),
    # ANY_VALUE with BigQuery's HAVING MAX/MIN aggregate modifier
    ("ANY_VALUE(5)", 5),
    ("ANY_VALUE('a' HAVING MAX 3)", "a"),
    # generic SAFE. scalar prefix strips to the plain (NULL-tolerant)
    # Spark twin and flows through the normal BigQuery rewrites
    ("SAFE.SUBSTR('abc', 2)", "bc"),
    ("SAFE.FORMAT_DATE('%Y%m', DATE '2024-03-05')", "202403"),
    ("SAFE.LOWER('ABC')", "abc"),
    ("SAFE.STRPOS('banana', 'na')", 3),
    # SAFE.PARSE_* -> try_* twins (NULL instead of error on bad input)
    ("SAFE.PARSE_DATE('%Y%m%d', 'not-a-date')", None),
    (
        "SAFE.PARSE_DATE('%Y%m%d', '20240317')",
        datetime.date(2024, 3, 17),
    ),
    ("SAFE.PARSE_TIMESTAMP('%Y-%m-%d %H:%M:%S', 'zzz')", None),
    # same-name passthroughs users rely on — prove they survive rewrites
    ("LPAD('7', 3, '0')", "007"),
    ("RPAD('ab', 4, 'x')", "abxx"),
    ("REPEAT('ab', 2)", "abab"),
    ("REVERSE('abc')", "cba"),
    ("INITCAP('hello world')", "Hello World"),
    # 2-arg INITCAP: regex-special delimiters must be escaped through
    # the literal+regex double parse (ADVICE r7 — the old escape was a
    # no-op, ']' produced a PatternSyntaxException at query time)
    ("INITCAP('a]b[c', ']')", "A]B[c"),
    ("INITCAP('a[b]c', '[')", "A[B]c"),
    (r"INITCAP('a\\b-c', '\\')", "A\\B-c"),
    ("INITCAP('x^y-z', '^')", "X^Y-z"),
    # 'a-z' is the three CHARS a,-,z — never a range (m must not delimit)
    ("INITCAP('xmy-w', 'a-z')", "Xmy-W"),
    # delimiters match case-SENSITIVELY against the original character
    ("INITCAP('aBcBd', 'B')", "AbCbD"),
    ("INITCAP('aBcBd', 'b')", "Abcbd"),
    # empty delimiter set: no word breaks beyond the first character
    ("INITCAP('hELLO wORLD', '')", "Hello world"),
    ("TRANSLATE('abc', 'bc', 'xy')", "axy"),
    ("ASCII('A')", 65),
    ("LTRIM('  a  ')", "a  "),
    # BigQuery arg order TRIM(value, set) -> Spark trim(set, value)
    ("TRIM('xxaxx', 'x')", "a"),
    ("LTRIM('xxaxx', 'x')", "axx"),
    ("RTRIM('xxaxx', 'x')", "xxa"),
    ("SOUNDEX('Robert')", "R163"),
    # bytes conversions: BigQuery names -> Spark twins
    ("TO_BASE64(CAST('abc' AS BYTES))", "YWJj"),
    ("CAST(FROM_BASE64('YWJj') AS STRING)", "abc"),
    ("CAST(FROM_HEX('616263') AS STRING)", "abc"),
]


@pytest.mark.parametrize("expr,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_bq_function_surface(spark, expr, expected):
    stmt = transpile_statement(f"SELECT {expr} AS v")
    got = spark.sql(stmt).collect()[0]["v"]
    if isinstance(got, datetime.datetime):
        got = got.replace(tzinfo=None)
    assert got == expected, f"{expr} -> {stmt!r} -> {got!r}"


def test_regexp_instr_position_guards(spark):
    """BigQuery REGEXP_INSTR position semantics (ADVICE r7): position
    < 1 raises (transpile-time for literals, query-time for
    expressions); a '^'-anchored literal pattern with position > 1
    raises (BigQuery anchors to the ORIGINAL string start); position
    = 1 collapses to the exact 2-arg form."""
    stmt = transpile_statement(
        "SELECT REGEXP_INSTR('ab@cd@ef', '@[a-z]+', 4) AS v"
    )
    assert spark.sql(stmt).collect()[0]["v"] == 6
    # position 1 == 2-arg shape (no suffix arithmetic emitted)
    stmt = transpile_statement("SELECT REGEXP_INSTR('a^b', '\\\\^', 1) AS v")
    assert "substr" not in stmt
    assert spark.sql(stmt).collect()[0]["v"] == 2
    with pytest.raises(ValueError, match="position must be >= 1"):
        transpile_statement("SELECT REGEXP_INSTR('abc', 'a', 0)")
    with pytest.raises(ValueError, match="position must be >= 1"):
        transpile_statement("SELECT REGEXP_INSTR('abc', 'a', -2)")
    with pytest.raises(ValueError, match="anchored"):
        transpile_statement("SELECT REGEXP_INSTR('abc', '^a', 2)")
    # non-literal position: runtime guard raises on < 1
    stmt = transpile_statement(
        "SELECT REGEXP_INSTR(x, 'b', p) AS v"
        " FROM (SELECT 'abc' AS x, 0 AS p)"
    )
    with pytest.raises(Exception, match="position must be >= 1"):
        spark.sql(stmt).collect()
    stmt = transpile_statement(
        "SELECT REGEXP_INSTR(x, 'b', p) AS v"
        " FROM (SELECT 'abcb' AS x, 3 AS p)"
    )
    assert spark.sql(stmt).collect()[0]["v"] == 4


def test_nested_rewrites_compose(spark):
    """Nested calls keep balanced parens across rewrite passes."""
    stmt = transpile_statement(
        "SELECT DATE_DIFF(DATE_TRUNC(DATE '2024-03-17', MONTH), "
        "PARSE_DATE('%Y%m%d', '20240201'), DAY) AS v"
    )
    assert spark.sql(stmt).collect()[0]["v"] == 29


def test_unnest_select_in_relational_position(spark):
    from crmint_spark.dialect import transpile_statement

    # a CTE / derived table whose body is SELECT ... FROM UNNEST must
    # NOT be collapsed by the scalar-subquery-over-array rewrite
    out = transpile_statement(
        "WITH v AS (SELECT * FROM UNNEST([1, 2, 3]) AS x)"
        " SELECT SUM(x) AS s FROM v"
    )
    assert spark.sql(out).collect()[0]["s"] == 6
    out = transpile_statement(
        "SELECT s FROM (SELECT x + 1 AS s FROM UNNEST([41]) AS x)"
    )
    assert spark.sql(out).collect()[0]["s"] == 42
    # the scalar form still rewrites to first-match HOF semantics
    out = transpile_statement(
        "SELECT (SELECT u FROM UNNEST([5, 6, 7]) AS u WHERE u > 5) AS v"
    )
    assert spark.sql(out).collect()[0]["v"] == 6


def test_select_as_value(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT (SELECT AS VALUE STRUCT(7 AS a)).a AS v,"
        " ARRAY(SELECT AS VALUE x * 2 FROM UNNEST([1, 2]) AS x) AS arr"
    )
    row = spark.sql(out).collect()[0]
    assert row["v"] == 7
    assert sorted(row["arr"]) == [2, 4]
    # contents of string literals stay untouched
    out = transpile_statement("SELECT 'SELECT AS VALUE docs' AS s")
    assert spark.sql(out).collect()[0]["s"] == "SELECT AS VALUE docs"


def test_review_fix_regressions(spark):
    from crmint_spark.dialect import transpile_statement

    # two-arg LOG must survive DOUBLE transpile (table-function bodies
    # are transpiled at DDL time and again after call-site splicing)
    once = transpile_statement("SELECT LOG(8, 2) AS lg")
    twice = transpile_statement(once)
    assert once == twice
    assert spark.sql(twice).collect()[0]["lg"] == 3.0
    # UNNEST alias substitution must not touch string literals
    out = transpile_statement(
        "SELECT (SELECT CONCAT(u, '-x') FROM UNNEST(['a', 'u']) AS u"
        " WHERE u <> 'u') AS v"
    )
    assert spark.sql(out).collect()[0]["v"] == "a-x"
    # encoder names inside string literals are data, not calls
    out = transpile_statement("SELECT 'docs mention ML.TF_IDF(x)' AS note")
    assert "ML.TF_IDF" in spark.sql(out).collect()[0]["note"]
    # arity errors are descriptive, not IndexErrors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="HASH_BUCKETIZE"):
        transpile_statement("SELECT ML.HASH_BUCKETIZE(x) FROM t")
    with _pytest.raises(ValueError, match="QUANTILE_BUCKETIZE"):
        transpile_statement("SELECT ML.QUANTILE_BUCKETIZE(x) OVER () FROM t")


def test_raw_string_prefix_only_in_code_position(spark):
    from crmint_spark.dialect import transpile_statement

    # a literal ENDING in r followed by another literal must not be
    # parsed as a raw-string prefix (the old regex corrupted this)
    out = transpile_statement("SELECT 'their offer' AS a, 'x' AS b")
    assert spark.sql(out).collect()[0]["a"] == "their offer"
    out = transpile_statement("SELECT 'r' AS a, 'b' AS b")
    assert spark.sql(out).collect()[0]["a"] == "r"
    # genuine raw strings still convert (backslashes preserved)
    out = transpile_statement(r"SELECT r'\d+' AS pat")
    assert spark.sql(out).collect()[0]["pat"] == r"\d+"
    out = transpile_statement('SELECT r"\\w" AS pat')
    assert spark.sql(out).collect()[0]["pat"] == "\\w"


def test_renames_skip_string_literals():
    out = transpile_statement("SELECT 'call DATE_DIFF(a, b, DAY) here' AS v")
    assert "DATE_DIFF" in out  # untouched inside the literal


def test_declared_date_variable_substitutes_as_typed_literal(spark):
    """A DECLAREd DATE/TIMESTAMP variable must splice back in as a typed
    literal — a bare 2024-03-01 parses as integer subtraction."""
    from crmint_spark.dialect import ScriptContext

    ctx = ScriptContext(variables={"cutoff": datetime.date(2024, 3, 1)})
    sql = ctx.substitute("SELECT DATEDIFF(DATE '2024-03-17', cutoff) AS v")
    assert spark.sql(sql).collect()[0]["v"] == 16
    ctx = ScriptContext(
        variables={"t0": datetime.datetime(2024, 3, 1, 12, 0, 0), "flag": True}
    )
    sql = ctx.substitute("SELECT hour(t0) AS h, flag AS f")
    row = spark.sql(sql).collect()[0]
    assert row["h"] == 12 and row["f"] is True


def test_split_literal_delimiter_escaped(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement("SELECT SPLIT('a.b.c', '.') AS parts")
    assert "split('a.b.c', '\\\\.')" in out
    assert spark.sql(out).collect()[0]["parts"] == ["a", "b", "c"]
    # default delimiter is comma
    out1 = transpile_statement("SELECT SPLIT('a,b') AS parts")
    assert spark.sql(out1).collect()[0]["parts"] == ["a", "b"]
    # regex-safe literals unchanged in behavior (output.sql:4 shape)
    out2 = transpile_statement(
        "SELECT SPLIT('events_20240101', 'events_')[OFFSET(1)] AS sfx"
    )
    assert spark.sql(out2).collect()[0]["sfx"] == "20240101"


def test_extract_date_time_parts(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT EXTRACT(DATE FROM TIMESTAMP '2024-01-02 03:04:05') AS d,"
        " EXTRACT(TIME FROM TIMESTAMP '2024-01-02 03:04:05') AS t,"
        " EXTRACT(YEAR FROM DATE '2024-01-02') AS y"
    )
    r = spark.sql(out).collect()[0]
    assert str(r["d"]) == "2024-01-02"
    assert r["t"] == "03:04:05"
    assert r["y"] == 2024


def test_safe_subscripts_and_array_keyword_literal(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT [1,2,3][SAFE_OFFSET(9)] AS miss,"
        " [1,2,3][SAFE_OFFSET(1)] AS o,"
        " ARRAY[4,5,6][SAFE_ORDINAL(2)] AS kw,"
        " SPLIT('a.b', '.')[SAFE_OFFSET(0)] AS s"
    )
    r = spark.sql(out).collect()[0]
    assert r["miss"] is None and r["o"] == 2 and r["kw"] == 5 and r["s"] == "a"


def test_three_arg_date_constructor(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement("SELECT DATE(2024, 1, 2) AS d, DATE('2024-03-04') AS s")
    r = spark.sql(out).collect()[0]
    assert str(r["d"]) == "2024-01-02" and str(r["s"]) == "2024-03-04"


def test_regexp_extract_null_and_group_semantics(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT REGEXP_EXTRACT('abc123', r'[0-9]+') AS hit,"
        " REGEXP_EXTRACT('abc', r'[0-9]+') AS miss,"
        " REGEXP_EXTRACT('a-b', r'([a-z])-') AS grp,"
        " REGEXP_EXTRACT_ALL('a1b2', r'[0-9]') AS all_hits"
    )
    r = spark.sql(out).collect()[0]
    assert r["hit"] == "123"
    assert r["miss"] is None  # BigQuery returns NULL, not ''
    assert r["grp"] == "a"
    assert r["all_hits"] == ["1", "2"]


def test_to_hex_digest_forms(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT TO_HEX(MD5('x')) AS m, TO_HEX(SHA256('x')) AS s"
    )
    r = spark.sql(out).collect()[0]
    assert r["m"] == "9dd4e461268c8034f5c8564e155c67a6"
    assert r["s"].startswith("2d711642")


def test_array_agg_modifiers(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT ARRAY_AGG(v ORDER BY k DESC LIMIT 2) AS top2,"
        " ARRAY_AGG(DISTINCT k ORDER BY k) AS ks,"
        " ARRAY_AGG(n IGNORE NULLS) AS nn"
        " FROM (SELECT 1 AS k, 'b' AS v, CAST(NULL AS INT64) AS n"
        " UNION ALL SELECT 0, 'a', 7 UNION ALL SELECT 2, 'c', NULL)"
    )
    r = spark.sql(out).collect()[0]
    assert r["top2"] == ["c", "b"]
    assert r["ks"] == [0, 1, 2]
    assert r["nn"] == [7]


def test_regexp_replace_backreferences(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        r"SELECT REGEXP_REPLACE('a1b2', r'([a-z])([0-9])', r'\2\1') AS swap,"
        r" REGEXP_REPLACE('cost: 5', r'(\d)', r'$\1') AS dollar"
    )
    r = spark.sql(out).collect()[0]
    assert r["swap"] == "1a2b" and r["dollar"] == "cost: $5"


def test_least_greatest_null_propagation(spark):
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "SELECT LEAST(1, NULL) AS l, GREATEST(3, 1) AS g,"
        " LEAST(LEAST(2, 4), 1) AS nested"
    )
    r = spark.sql(out).collect()[0]
    assert r["l"] is None and r["g"] == 3 and r["nested"] == 1


def test_error_function_raises(spark):
    import pytest
    from crmint_spark.dialect import transpile_statement

    ok = spark.sql(
        transpile_statement("SELECT IF(TRUE, 'ok', ERROR('boom')) AS x")
    ).collect()[0]["x"]
    assert ok == "ok"
    with pytest.raises(Exception, match="boom"):
        spark.sql(
            transpile_statement("SELECT IF(FALSE, 'ok', ERROR('boom')) AS x")
        ).collect()


def test_qualify_clause_forms(spark):
    from crmint_spark.dialect import transpile_statement

    base = (
        "(SELECT 1 AS uid, 10 AS v UNION ALL SELECT 1, 20"
        " UNION ALL SELECT 2, 5) t"
    )
    top1 = spark.sql(
        transpile_statement(
            f"SELECT uid, v FROM {base}"
            " QUALIFY ROW_NUMBER() OVER (PARTITION BY uid ORDER BY v DESC) = 1"
        )
    ).collect()
    assert {tuple(r) for r in top1} == {(1, 20), (2, 5)}
    # alias reference + WHERE + ORDER BY tail
    tail = spark.sql(
        transpile_statement(
            f"SELECT uid, v, RANK() OVER (ORDER BY v) AS r FROM {base}"
            " WHERE v > 1 QUALIFY r <= 2 ORDER BY v"
        )
    ).collect()
    assert [(r["uid"], r["v"]) for r in tail] == [(2, 5), (1, 10)]
    # inside a CTE body and in the WITH main query
    cte = spark.sql(
        transpile_statement(
            f"WITH w AS (SELECT uid, v FROM {base} QUALIFY"
            " ROW_NUMBER() OVER (PARTITION BY uid ORDER BY v) = 1)"
            " SELECT COUNT(*) AS n FROM w"
        )
    ).collect()
    assert cte[0]["n"] == 2
    main = spark.sql(
        transpile_statement(
            f"WITH w AS (SELECT uid, v FROM {base}) SELECT uid, v FROM w"
            " QUALIFY ROW_NUMBER() OVER (PARTITION BY uid ORDER BY v DESC) = 1"
        )
    ).collect()
    assert {tuple(r) for r in main} == {(1, 20), (2, 5)}


def test_pivot_unpivot_passthrough(spark):
    # BigQuery PIVOT/UNPIVOT grammar == Spark grammar; must survive transpile
    from crmint_spark.dialect import transpile_statement

    base = ("(SELECT 'a' AS k, 1 AS m, 10 AS v UNION ALL SELECT 'b', 1, 20"
            " UNION ALL SELECT 'a', 2, 30) t")
    piv = spark.sql(
        transpile_statement(
            f"SELECT * FROM {base} PIVOT (SUM(v) FOR k IN ('a' AS ka, 'b' AS kb))"
            " ORDER BY m"
        )
    ).collect()
    assert [tuple(r) for r in piv] == [(1, 10, 20), (2, 30, None)]
    unp = spark.sql(
        transpile_statement(
            "SELECT * FROM (SELECT 1 AS id, 10 AS c1, 20 AS c2)"
            " UNPIVOT (val FOR name IN (c1, c2)) ORDER BY name"
        )
    ).collect()
    assert [tuple(r) for r in unp] == [(1, "c1", 10), (1, "c2", 20)]


def test_star_replace(spark):
    from crmint_spark.dialect import transpile_statement

    out = spark.sql(
        transpile_statement(
            "SELECT * REPLACE (v * 2 AS v) FROM (SELECT 1 AS id, 10 AS v)"
        )
    ).collect()
    assert out[0]["id"] == 1 and out[0]["v"] == 20
    multi = spark.sql(
        transpile_statement(
            "SELECT t.* REPLACE (UPPER(s) AS s, v + 1 AS v)"
            " FROM (SELECT 'a' AS s, 1 AS v, 9 AS w) t"
        )
    ).collect()[0]
    assert (multi["s"], multi["v"], multi["w"]) == ("A", 2, 9)


def test_tablesample_system(spark):
    from crmint_spark.dialect import transpile_statement

    n = spark.sql(
        transpile_statement(
            "SELECT COUNT(*) AS n FROM (SELECT 1 AS x) TABLESAMPLE SYSTEM (100 PERCENT)"
        )
    ).collect()[0]["n"]
    assert n == 1


def test_grouping_sets_passthrough(spark):
    from crmint_spark.dialect import transpile_statement

    rows = spark.sql(
        transpile_statement(
            "SELECT k, m, SUM(v) AS s FROM (SELECT 'a' AS k, 1 AS m, 10 AS v)"
            " GROUP BY GROUPING SETS ((k), (k, m)) ORDER BY k, m"
        )
    ).collect()
    assert [tuple(r) for r in rows] == [("a", None, 10), ("a", 1, 10)]


def test_qualify_inside_ctas(spark):
    # QUALIFY under a DDL prologue: the rewrite must skip past CREATE ... AS
    from crmint_spark.dialect import transpile_statement

    out = transpile_statement(
        "CREATE OR REPLACE TEMPORARY VIEW q_top AS"
        " SELECT uid, v FROM (SELECT 1 AS uid, 10 AS v"
        " UNION ALL SELECT 1, 20 UNION ALL SELECT 2, 5) t"
        " QUALIFY ROW_NUMBER() OVER (PARTITION BY uid ORDER BY v DESC) = 1"
    )
    spark.sql(out)
    rows = spark.table("q_top").collect()
    assert {tuple(r) for r in rows} == {(1, 20), (2, 5)}


def test_net_and_codepoint_functions(spark):
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT NET.HOST('https://sub.example.com/p?q=1') AS h,"
            " NET.REG_DOMAIN('https://sub.example.com/p') AS rd,"
            " CODE_POINTS_TO_STRING([72, 105]) AS cps,"
            " TO_CODE_POINTS('Hi') AS cp,"
            " UNICODE('A') AS u,"
            " RANGE_BUCKET(20, [0, 10, 20, 30]) AS rb,"
            " INSTR('banana', 'an', 2) AS i3"
        )
    ).collect()[0]
    assert row["h"] == "sub.example.com"
    assert row["rd"] == "example.com"
    assert row["cps"] == "Hi"
    assert row["cp"] == [72, 105]
    assert row["u"] == 65
    assert row["rb"] == 3
    assert row["i3"] == 2


def test_ml_analytic_scalers(spark):
    from crmint_spark.dialect import transpile_statement

    rows = spark.sql(
        transpile_statement(
            "SELECT x, ROUND(ML.STANDARD_SCALER(x) OVER (), 4) AS z,"
            " ROUND(ML.MIN_MAX_SCALER(x) OVER (), 4) AS mm"
            " FROM (SELECT 1.0 AS x UNION ALL SELECT 3.0) t ORDER BY x"
        )
    ).collect()
    assert [float(r["z"]) for r in rows] == [-0.7071, 0.7071]
    assert [float(r["mm"]) for r in rows] == [0.0, 1.0]


def test_unnest_with_offset(spark):
    from crmint_spark.dialect import transpile_statement

    rows = spark.sql(
        transpile_statement(
            "SELECT x, off FROM UNNEST([10, 20, 30]) AS x"
            " WITH OFFSET AS off ORDER BY off"
        )
    ).collect()
    assert [tuple(r) for r in rows] == [(10, 0), (20, 1), (30, 2)]
    # lateral form against a base table, bare references
    rows = spark.sql(
        transpile_statement(
            "SELECT t.id, e, o FROM (SELECT 1 AS id, [7, 8] AS arr) t,"
            " UNNEST(t.arr) AS e WITH OFFSET o ORDER BY o"
        )
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 7, 0), (1, 8, 1)]
    # alias omitted: the next keyword must NOT be captured as the alias
    rows = spark.sql(
        transpile_statement(
            "SELECT x, offset FROM UNNEST([10, 20, 30]) AS x"
            " WITH OFFSET ORDER BY offset DESC"
        )
    ).collect()
    assert [tuple(r) for r in rows] == [(30, 2), (20, 1), (10, 0)]
    rows = spark.sql(
        transpile_statement(
            "SELECT t.id, e, offset FROM (SELECT 1 AS id, [7, 8] AS arr) t,"
            " UNNEST(t.arr) AS e WITH OFFSET WHERE offset > 0"
        )
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 8, 1)]


def test_code_points_to_string_full_unicode(spark):
    """Code points above 255 (and astral planes) must round-trip — char()
    wraps mod 256 and is NOT what BigQuery does."""
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT CODE_POINTS_TO_STRING([72, 233, 8364, 128512]) AS s"
        )
    ).first()
    assert row.s == "Hé€😀"


def test_array_subquery_forms(spark):
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT ARRAY(SELECT n * 2 FROM UNNEST([1, 2, 3]) AS n) AS plain,"
            " ARRAY(SELECT DISTINCT n FROM UNNEST([3, 1, 3]) AS n) AS dist,"
            " ARRAY(SELECT n FROM UNNEST([3, 1, 2]) AS n ORDER BY n) AS ordered,"
            " ARRAY(SELECT n FROM UNNEST([3, 1, 2]) AS n WHERE n > 1) AS filtered"
        )
    ).collect()[0]
    assert row["plain"] == [2, 4, 6]
    assert row["dist"] == [1, 3]
    assert row["ordered"] == [1, 2, 3]
    assert row["filtered"] == [3, 2]
    # correlated over an outer column (compiles to HOFs, not a subquery)
    row = spark.sql(
        transpile_statement(
            "SELECT id, ARRAY(SELECT v * 10 FROM UNNEST(t.arr) AS v"
            " WHERE v != 2) AS a FROM (SELECT 1 AS id, [1, 2, 3] AS arr) t"
        )
    ).collect()[0]
    assert row["a"] == [10, 30]
    # non-UNNEST FROM falls back to a scalar collect subquery
    row = spark.sql(
        transpile_statement(
            "SELECT ARRAY(SELECT z FROM (SELECT 1 AS z UNION ALL SELECT 2) q"
            " ORDER BY z) AS a"
        )
    ).collect()[0]
    assert row["a"] == [1, 2]


def test_numeric_trunc(spark):
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT TRUNC(3.77) AS p, TRUNC(-3.77) AS n, TRUNC(3.14159, 2) AS d"
        )
    ).collect()[0]
    assert float(row["p"]) == 3.0
    assert float(row["n"]) == -3.0
    assert abs(float(row["d"]) - 3.14) < 1e-9


def test_unicode_normalize(spark):
    # no explicit register_engine_udfs call: transpile_statement registers
    # the bq_normalize UDFs lazily on the active session whenever a
    # rewrite emits them, so transpile + spark.sql works from any caller
    decomposed = "éclair"  # e + combining acute
    stmt = transpile_statement(
        f"SELECT NORMALIZE('{decomposed}', NFC) AS v, "
        "NORMALIZE_AND_CASEFOLD('Straße', NFKC) AS w, "
        "NORMALIZE('ﬁt') AS x"  # NFC keeps the fi ligature
    )
    row = spark.sql(stmt).collect()[0]
    assert row["v"] == "éclair"
    assert row["w"] == "strasse"
    assert row["x"] == "ﬁt"
    stmt2 = transpile_statement("SELECT NORMALIZE('ﬁt', NFKC) AS v")
    assert spark.sql(stmt2).collect()[0]["v"] == "fit"


def test_hll_family_rewrites(spark):
    stmt = transpile_statement(
        "SELECT APPROX_COUNT_DISTINCT(x) AS acd, "
        "HLL_COUNT.MERGE(s) AS m, "
        "CAST(ARRAY_LENGTH(HLL_COUNT.MERGE_PARTIAL(s)) AS INT64) AS mp "
        "FROM (SELECT x, HLL_COUNT.INIT(x) AS s FROM "
        "(SELECT explode(array(1, 2, 2, 3)) AS x) GROUP BY x)"
    )
    row = spark.sql(stmt).collect()[0]
    assert row["acd"] == 3 and row["m"] == 3 and row["mp"] == 3
    assert "collect_set" in stmt and "count(DISTINCT" in stmt


def test_percentile_window_rewrites(spark):
    """BigQuery's 2-arg analytic PERCENTILE_CONT/DISC: CONT = exact
    interpolated percentile; DISC = smallest value reaching cumulative
    probability p, via a nested CUME_DIST window."""
    rows = spark.sql(
        transpile_statement(
            "SELECT DISTINCT g, PERCENTILE_CONT(x, 0.5) OVER "
            "(PARTITION BY g) AS pc, PERCENTILE_DISC(x, 0.5) OVER "
            "(PARTITION BY g) AS pd FROM VALUES (1, 1.0), (1, 2.0), "
            "(1, 3.0), (2, 10.0), (2, 20.0), (2, 30.0), (2, 40.0) "
            "AS t(g, x)"
        )
    ).collect()
    by_g = {r["g"]: (r["pc"], r["pd"]) for r in rows}
    assert by_g[1] == (2.0, 2.0)
    assert by_g[2] == (25.0, 20.0)
    # BigQuery default is IGNORE NULLS for both: a NULL x must not
    # inflate the DISC denominator (for (NULL,1,2,3) at p=0.5 BigQuery
    # returns 2, not 1)
    rows = spark.sql(
        transpile_statement(
            "SELECT DISTINCT PERCENTILE_CONT(x, 0.5) OVER () AS pc, "
            "PERCENTILE_DISC(x, 0.5) OVER () AS pd FROM VALUES "
            "(CAST(NULL AS DOUBLE)), (1.0), (2.0), (3.0) AS t(x)"
        )
    ).collect()
    assert (rows[0]["pc"], rows[0]["pd"]) == (2.0, 2.0)


def test_approx_top_count_null_values(spark):
    """NULL is a returnable APPROX_TOP_COUNT/SUM value with its own
    count/sum (BigQuery documents this in its examples); ties at equal
    count order non-NULL values first."""
    row = spark.sql(
        transpile_statement(
            "SELECT APPROX_TOP_COUNT(x, 2) AS tc FROM "
            "(SELECT explode(array('a', NULL, NULL, NULL, 'a', 'b')) AS x)"
        )
    ).first()
    assert [(s["value"], s["count"]) for s in row["tc"]] == [
        (None, 3), ("a", 2),
    ]
    row = spark.sql(
        transpile_statement(
            "SELECT APPROX_TOP_SUM(x, w, 2) AS ts FROM (SELECT "
            "explode(array(struct(CAST(NULL AS STRING) AS x, 4.0 AS w), "
            "struct('b' AS x, 5.0 AS w), "
            "struct(CAST(NULL AS STRING) AS x, 2.5 AS w))) AS s"
            ") LATERAL VIEW OUTER inline(array(s)) AS x, w"
        )
    ).first()
    assert [(s["value"], s["sum"]) for s in row["ts"]] == [
        (None, 6.5), ("b", 5.0),
    ]


def test_json_literal_strip_outside_strings():
    """JSON typed literals reduce to their string; a string literal
    whose CONTENT contains JSON '...'-shaped text stays intact."""
    out = transpile_statement("SELECT JSON '{\"a\": 1}' AS j")
    assert "JSON" not in out and "{\"a\": 1}" in out
    keep = "SELECT 'see JSON ''x'' spec' AS s"
    assert "see JSON ''x'' spec" in transpile_statement(keep)


def test_approx_top_count_and_sum(spark):
    """APPROX_TOP_COUNT/SUM -> exact top-k (value, count|sum) pairs,
    ordered by count/sum desc then value asc (deterministic ties)."""
    row = spark.sql(
        transpile_statement(
            "SELECT APPROX_TOP_COUNT(x, 2) AS tc FROM "
            "(SELECT explode(array('a','b','b','c','c','c')) AS x)"
        )
    ).first()
    assert [(s["value"], s["count"]) for s in row["tc"]] == [("c", 3), ("b", 2)]
    row = spark.sql(
        transpile_statement(
            "SELECT APPROX_TOP_SUM(x, w, 2) AS ts FROM (SELECT "
            "explode(array(struct('a' AS x, 1.0 AS w), "
            "struct('b' AS x, 5.0 AS w), struct('a' AS x, 2.5 AS w))) AS s"
            ") LATERAL VIEW OUTER inline(array(s)) AS x, w"
        )
    ).first()
    assert [(s["value"], s["sum"]) for s in row["ts"]] == [("b", 5.0), ("a", 3.5)]
    # deterministic tie-break by value asc
    row = spark.sql(
        transpile_statement(
            "SELECT APPROX_TOP_COUNT(x, 3) AS tc FROM "
            "(SELECT explode(array('z','z','a','a','m')) AS x)"
        )
    ).first()
    assert [(s["value"], s["count"]) for s in row["tc"]] == [
        ("a", 2), ("z", 2), ("m", 1),
    ]


def test_js_udf_translation(spark):
    """LANGUAGE js UDFs in the single-return arithmetic/string subset
    are translated to native SQL UDFs and evaluate correctly."""
    cases = [
        # (js body, params sql, call args, expected)
        ("return a + b;", "a FLOAT64, b FLOAT64", "2.0, 3.0", 5.0),
        ("return Math.pow(a, 2) + Math.abs(b);", "a FLOAT64, b FLOAT64", "3.0, -4.0", 13.0),
        ("return a > b ? a : b;", "a INT64, b INT64", "7, 9", 9),
        (
            "return s.toUpperCase().trim();",
            "s STRING", "' spark '", "SPARK",
        ),
        ("return s.length;", "s STRING", "'abcd'", 4),
        ("return s.substring(1, 3);", "s STRING", "'abcdef'", "bc"),
        ("return s.indexOf('c');", "s STRING", "'abc'", 2),
        ("return s.includes('b') && !s.startsWith('z');", "s STRING", "'abc'", True),
        ("return 'id-' + String(x);", "x INT64", "42", "id-42"),
        ("return parseInt(s) * 2;", "s STRING", "'21'", 42),
        (
            "return x === null ? 'none' : 'some';",
            "x STRING", "CAST(NULL AS STRING)", "none",
        ),
        # JS .replace substitutes only the FIRST occurrence
        ("return s.replace('a', 'o');", "s STRING", "'banana'", "bonana"),
        # empty pattern prepends (JS semantics)
        ("return s.replace('', 'X');", "s STRING", "'abc'", "Xabc"),
        # double-quoted literals with escapes
        ('return s + "\\"q\\"";', "s STRING", "'v='", 'v="q"'),
        # var/let/const bindings inline by substitution
        ("var t = a + 1; return t * t;", "a INT64", "3", 16),
        (
            "var u = s.toUpperCase(); var n = u.length; "
            "return u + '-' + String(n);",
            "s STRING", "'ab'", "AB-2",
        ),
        (
            "let half = x / 2; const sq = half * half; return sq + half;",
            "x FLOAT64", "4.0", 6.0,
        ),
        # if/return chains fold into ternaries
        (
            "if (x > 10) { return 'big'; } return 'small';",
            "x INT64", "42", "big",
        ),
        (
            "if (x > 10) return 'big'; else if (x > 5) return 'mid'; "
            "else return 'small';",
            "x INT64", "7", "mid",
        ),
        (
            "var t = x * 2; if (t >= 10) { return t; } else { return 10; }",
            "x INT64", "3", 10,
        ),
        # global regex replace -> regexp_replace
        (
            "return s.replace(/[0-9]+/g, '#');",
            "s STRING", "'a1b22c'", "a#b#c",
        ),
        # new string methods
        ("return s.padStart(5, '0');", "s STRING", "'42'", "00042"),
        ("return s.padEnd(4);", "s STRING", "'ab'", "ab  "),
        ("return s.repeat(3);", "s STRING", "'ab'", "ababab"),
        ("return s.charCodeAt(1);", "s STRING", "'AB'", 66),
        ("return s.trimStart();", "s STRING", "'  x '", "x "),
        ("return s.slice(1, 3);", "s STRING", "'abcdef'", "bc"),
        ("return String.fromCharCode(66);", "s STRING", "''", "B"),
        ("return x.toFixed(2);", "x FLOAT64", "1.5", "1.50"),
    ]
    for i, (body, params, args, expected) in enumerate(cases):
        stmt = transpile_statement(
            f"CREATE TEMP FUNCTION jf{i}({params}) LANGUAGE js AS "
            f"'''{body}'''"
        )
        spark.sql(stmt)
        got = spark.sql(f"SELECT jf{i}({args}) AS v").first()["v"]
        assert got == expected, (body, got, expected)


def test_js_udf_untranslatable_errors():
    """Constructs beyond the subset fail with a targeted message."""
    for body, needle in [
        ("t = 0; return t;", "re-assignment"),
        ("var t = 0; t = t + 1; return t;", "re-assignment"),
        ("for (var i = 0; i < 3; i++) {} return 0;", "`for`"),
        ("return s.replace(/x/, 'y');", "non-global regex"),
        ("return s.slice(-2);", "literal non-negative"),
        ("return x.toFixed(n);", "literal digit"),
        ("if (s) { return s; }", "fall-off-the-end"),
        ("return JSON.parse(s).a;", "JSON"),
        ("return `tpl ${s}`;", "template literals"),
        ("return s.match(/x/);", "not supported"),
    ]:
        with pytest.raises(ValueError, match="SQL-expression UDF"):
            transpile_statement(
                "CREATE TEMP FUNCTION f(s STRING) RETURNS STRING "
                f"LANGUAGE js AS '''{body}'''"
            )


def test_hll_approx_scale_path(spark):
    """approx_sketches=True routes the HLL family to Spark's
    DataSketches builtins (constant memory per group); the estimates
    must agree with the exact-set default within HLL error bounds
    (~1.6% at default lgConfigK=12; 5% margin here)."""
    q = (
        "SELECT APPROX_COUNT_DISTINCT(x) AS acd, "
        "HLL_COUNT.MERGE(s) AS m, "
        "HLL_COUNT.EXTRACT(HLL_COUNT.MERGE_PARTIAL(s)) AS mp "
        "FROM (SELECT x, HLL_COUNT.INIT(x) AS s FROM "
        "(SELECT id % 1000 AS x, id % 7 AS g FROM range(20000)) "
        "GROUP BY g, x) "
    )
    exact = spark.sql(transpile_statement(q)).first()
    assert (exact["acd"], exact["m"], exact["mp"]) == (1000, 1000, 1000)
    stmt = transpile_statement(q, approx_sketches=True)
    assert "hll_sketch_agg" in stmt and "hll_union_agg" in stmt
    assert "collect_set" not in stmt
    approx = spark.sql(stmt).first()
    for k in ("acd", "m", "mp"):
        assert abs(approx[k] - 1000) <= 50, (k, approx[k])
    # precision argument maps onto lgConfigK (clamped)
    stmt2 = transpile_statement(
        "SELECT HLL_COUNT.EXTRACT(HLL_COUNT.INIT(x, 15)) AS c "
        "FROM (SELECT id AS x FROM range(500))",
        approx_sketches=True,
    )
    assert abs(spark.sql(stmt2).first()["c"] - 500) <= 25


def test_contains_substr_and_json_arrays(spark):
    stmt = transpile_statement(
        "SELECT CONTAINS_SUBSTR('Hello World', 'WORLD') AS a, "
        "CONTAINS_SUBSTR('abc', 'zz') AS b, "
        "JSON_EXTRACT_ARRAY('{\"a\": [1, 2, 3]}', '$.a') AS c, "
        "JSON_EXTRACT_STRING_ARRAY('{\"a\": [\"x\", \"y\"]}', '$.a') AS d, "
        "JSON_QUERY_ARRAY('{\"a\": []}', '$.a') AS e, "
        "JSON_VALUE_ARRAY('{\"a\": 1}', '$.b') AS f"
    )
    row = spark.sql(stmt).collect()[0]
    assert row["a"] is True and row["b"] is False
    assert row["c"] == ["1", "2", "3"]
    assert row["d"] == ["x", "y"]
    assert row["e"] == []
    assert row["f"] is None


def _py_instr(value: str, sub: str, pos: int, occ: int) -> int:
    """Reference INSTR: overlapping match positions, forward from pos or
    backward from len+pos+1 for negative pos."""
    if not sub or len(value) < len(sub):
        return 0
    matches = [
        i + 1
        for i in range(len(value) - len(sub) + 1)
        if value[i : i + len(sub)] == sub
    ]
    if pos > 0:
        cands = [m for m in matches if m >= pos]
    else:
        cands = [m for m in reversed(matches) if m <= len(value) + pos + 1]
    return cands[occ - 1] if len(cands) >= occ else 0


def test_instr_randomized_against_reference(spark):
    """One batched query over 40 seeded random (value, sub, pos, occ)
    cases — the enumeration expression must agree with the Python
    reference on every one (incl. overlapping and backward searches)."""
    import random

    rng = random.Random(7)
    cases = []
    for _ in range(40):
        v = "".join(rng.choice("abc") for _ in range(rng.randint(0, 10)))
        s = "".join(rng.choice("abc") for _ in range(rng.randint(1, 3)))
        p = rng.choice([1, 2, 3, -1, -2, -5])
        o = rng.randint(1, 3)
        cases.append((v, s, p, o))
    exprs = ", ".join(
        f"INSTR('{v}', '{s}', {p}, {o}) AS c{i}"
        for i, (v, s, p, o) in enumerate(cases)
    )
    row = spark.sql(transpile_statement(f"SELECT {exprs}")).collect()[0]
    for i, (v, s, p, o) in enumerate(cases):
        assert row[f"c{i}"] == _py_instr(v, s, p, o), (v, s, p, o)


def test_with_offset_then_qualify(spark):
    """Omitted offset alias followed by QUALIFY must not capture the
    keyword as the alias."""
    spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "id long, arr array<string>"
    ).createOrReplaceTempView("t_offs")
    stmt = transpile_statement(
        "SELECT id, e FROM t_offs, UNNEST(arr) AS e WITH OFFSET "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY offset) = 1"
    )
    rows = spark.sql(stmt).collect()
    assert sorted((r["id"], r["e"]) for r in rows) == [(1, "a"), (2, "c")]


def test_kll_quantiles_family(spark):
    """KLL_QUANTILES.* sketch algebra: exact sorted-multiset default
    (oracle-reproducible) and the approx_sketches scale path on Spark's
    native DataSketches KLL builtins — both within sketch error of the
    true quantiles."""
    q = """
    WITH grouped AS (
      SELECT id % 4 AS g, KLL_QUANTILES.INIT_INT64(id, 1000) AS sk
      FROM range(1000) GROUP BY g
    )
    SELECT KLL_QUANTILES.MERGE_POINT_INT64(sk, 0.5) AS med,
           KLL_QUANTILES.MERGE_INT64(sk, 4) AS quartiles
    FROM grouped
    """
    exact = spark.sql(transpile_statement(q)).first()
    assert exact["med"] == 499
    assert list(exact["quartiles"]) == [0, 249, 499, 749, 999]
    stmt = transpile_statement(q, approx_sketches=True)
    assert "kll_sketch_agg_bigint" in stmt and "kll_merge_agg_bigint" in stmt
    assert "collect_list" not in stmt
    approx = spark.sql(stmt).first()
    assert abs(approx["med"] - 499) <= 25
    assert approx["quartiles"][0] == 0 and abs(approx["quartiles"][2] - 499) <= 25

    q2 = (
        "SELECT KLL_QUANTILES.EXTRACT_POINT_FLOAT64(sk, 0.25) AS p25, "
        "KLL_QUANTILES.EXTRACT_FLOAT64(sk, 2) AS halves FROM "
        "(SELECT KLL_QUANTILES.INIT_FLOAT64(CAST(id AS FLOAT64)) AS sk "
        "FROM range(101))"
    )
    e2 = spark.sql(transpile_statement(q2)).first()
    assert e2["p25"] == 25.0 and list(e2["halves"]) == [0.0, 50.0, 100.0]
    a2 = spark.sql(transpile_statement(q2, approx_sketches=True)).first()
    assert abs(a2["p25"] - 25) <= 5 and abs(a2["halves"][1] - 50) <= 5


def test_block_grouping_edge_cases():
    """split_script block grouping: strings containing keywords, CASE
    expressions inside blocks, nested blocks, BEGIN TRANSACTION
    passthrough, and IF()-function non-grouping."""
    from crmint_spark.dialect import parse_script_block, split_script

    # keywords inside strings never group
    stmts = split_script("SELECT 'END IF; WHILE' AS a; SELECT 2")
    assert len(stmts) == 2

    # IF() scalar function at statement start is not a block
    stmts = split_script("SELECT IF(1 < 2, 'a', 'b'); SELECT 2")
    assert len(stmts) == 2

    # nested blocks group into ONE statement and parse recursively
    script = """
    WHILE a < 3 DO
      IF b THEN
        SET x = CASE WHEN c THEN 1 ELSE 2 END;
      ELSE
        SET x = 3;
      END IF;
    END WHILE;
    SELECT 1
    """
    stmts = split_script(script)
    assert len(stmts) == 2
    blk = parse_script_block(stmts[0])
    assert blk["kind"] == "WHILE" and blk["cond"] == "a < 3"
    inner = split_script(blk["body"])
    assert len(inner) == 1
    iblk = parse_script_block(inner[0])
    assert iblk["kind"] == "IF"
    assert len(iblk["branches"]) == 1 and iblk["else"] is not None
    assert "CASE WHEN c THEN 1 ELSE 2 END" in iblk["branches"][0][1]

    # BEGIN with handler; CASE END inside body doesn't close the block
    script = """BEGIN
      SELECT CASE WHEN x THEN 1 END;
      SELECT 2;
    EXCEPTION WHEN ERROR THEN
      SELECT 'handled';
    END"""
    blk = parse_script_block(split_script(script)[0])
    assert blk["kind"] == "BEGIN"
    assert "SELECT 2" in blk["body"] and "handled" in blk["handler"]

    # BEGIN TRANSACTION is NOT a block
    assert parse_script_block("BEGIN TRANSACTION") is None

    # FOR..IN parses var/query/body
    blk = parse_script_block(
        "FOR r IN (SELECT 1 AS a WHERE 1 IN (1)) DO SET x = r.a; END FOR"
    )
    assert blk["kind"] == "FOR" and blk["var"] == "r"
    # the mandatory parens come off at parse (round 11: parenthesized
    # UNNEST queries otherwise read as expression-position scalars)
    assert blk["query"] == "SELECT 1 AS a WHERE 1 IN (1)"
    assert "SET x = r.a" in blk["body"]

    # ELSEIF chains
    blk = parse_script_block(
        "IF a THEN SELECT 1; ELSEIF b THEN SELECT 2; "
        "ELSEIF c THEN SELECT 3; ELSE SELECT 4; END IF"
    )
    assert [c for c, _ in blk["branches"]] == ["a", "b", "c"]
    assert "SELECT 4" in blk["else"]


def test_array_select_as_struct(spark):
    """ARRAY(SELECT AS STRUCT ...) packs the select list into struct
    elements; AS VALUE passes the single expression through; both work
    over UNNEST sources (HOF path) and table sources (collect path)."""
    q = (
        "SELECT ARRAY(SELECT AS STRUCT id AS k, id * 2 AS v "
        "FROM UNNEST([3, 1, 2]) AS id WHERE id > 1) AS pairs"
    )
    r = spark.sql(transpile_statement(q)).first()["pairs"]
    assert sorted((p["k"], p["v"]) for p in r) == [(2, 4), (3, 6)]
    q2 = (
        "SELECT ARRAY(SELECT AS VALUE STRUCT(id AS k) "
        "FROM UNNEST([1, 2]) AS id) AS s"
    )
    r2 = spark.sql(transpile_statement(q2)).first()["s"]
    assert [p["k"] for p in r2] == [1, 2]
    # table-source path goes through collect_list(struct(...))
    q3 = (
        "SELECT ARRAY(SELECT AS STRUCT x, y FROM "
        "(SELECT 1 AS x, 'a' AS y)) AS one"
    )
    r3 = spark.sql(transpile_statement(q3)).first()["one"]
    assert [(p["x"], p["y"]) for p in r3] == [(1, "a")]


def test_vector_search_rewrite(spark):
    """VECTOR_SEARCH compiles to a broadcast-probe brute-force top-k
    with BigQuery's output contract (query STRUCT, base STRUCT,
    distance DOUBLE); EUCLIDEAN is the default distance and
    DOT_PRODUCT is the NEGATIVE dot product (smaller = closer)."""
    spark.sql(
        "SELECT * FROM VALUES (1, array(1.0, 0.0)), (2, array(0.0, 1.0)),"
        " (3, array(1.0, 1.0)) AS t(id, v)"
    ).createOrReplaceTempView("vs_base")
    spark.sql(
        "SELECT 10 AS qid, array(1.0, 0.0) AS v"
    ).createOrReplaceTempView("vs_probe")

    rows = spark.sql(
        transpile_statement(
            "SELECT query.qid AS qid, base.id AS id, ROUND(distance, 4) AS d"
            " FROM VECTOR_SEARCH(TABLE vs_base, 'v', TABLE vs_probe,"
            " top_k => 2) ORDER BY d, id"
        )
    ).collect()
    assert [(r["qid"], r["id"], r["d"]) for r in rows] == [
        (10, 1, 0.0),
        (10, 3, 1.0),
    ]

    dot = spark.sql(
        transpile_statement(
            "SELECT base.id AS id, distance FROM VECTOR_SEARCH("
            " TABLE vs_base, 'v',"
            " (SELECT array(1.0, 0.5) AS v), top_k => 1,"
            " distance_type => 'DOT_PRODUCT')"
        )
    ).collect()
    assert [(r["id"], r["distance"]) for r in dot] == [(3, -1.5)]

    # query-side column rename + cosine
    spark.sql(
        "SELECT 7 AS qid, array(0.0, 2.0) AS probe_vec"
    ).createOrReplaceTempView("vs_probe2")
    cos = spark.sql(
        transpile_statement(
            "SELECT base.id AS id, ROUND(distance, 4) AS d"
            " FROM VECTOR_SEARCH(TABLE vs_base, 'v', TABLE vs_probe2,"
            " query_column_to_search => 'probe_vec', top_k => 1,"
            " distance_type => 'COSINE')"
        )
    ).collect()
    assert [(r["id"], r["d"]) for r in cos] == [(2, 0.0)]

    # BigQuery's optional 4th POSITIONAL query_column_to_search
    # (round-11 probe: a quoted string there read as a bad named arg),
    # with a trailing line comment inside the base subquery
    pos = spark.sql(
        transpile_statement(
            "SELECT base.id AS id, ROUND(distance, 4) AS d"
            " FROM VECTOR_SEARCH("
            " (SELECT id, v FROM vs_base"
            "  WHERE id <> 3 -- drop the diagonal\n"
            " ), 'v', TABLE vs_probe2, 'probe_vec', top_k => 1,"
            " distance_type => 'COSINE')"
        )
    ).collect()
    assert [(r["id"], r["d"]) for r in pos] == [(2, 0.0)]


def test_vector_search_rejects_bad_args():
    import pytest as _pytest

    from crmint_spark.dialect import transpile_statement as ts

    with _pytest.raises(ValueError, match="needs"):
        ts("SELECT * FROM VECTOR_SEARCH(TABLE a, 'v')")
    with _pytest.raises(ValueError, match="distance_type"):
        ts(
            "SELECT * FROM VECTOR_SEARCH(TABLE a, 'v', TABLE b,"
            " distance_type => 'MANHATTAN')"
        )
    with _pytest.raises(ValueError, match="unknown argument"):
        ts("SELECT * FROM VECTOR_SEARCH(TABLE a, 'v', TABLE b, fraction => 1)")


def test_search_function(spark):
    """SEARCH(data, query): all query tokens must appear among the
    data's tokens (lowercased, split on non-alphanumerics); named-arg
    forms are rejected rather than silently diverging."""
    import pytest as _pytest

    r = spark.sql(
        transpile_statement(
            "SELECT SEARCH('The Spark-Merge; engine', 'spark merge') AS a,"
            " SEARCH('The Spark engine', 'merge') AS b,"
            " SEARCH('x_y', 'x y') AS c"
        )
    ).first()
    assert (r["a"], r["b"], r["c"]) == (True, False, True)
    with _pytest.raises(ValueError, match="json_scope"):
        transpile_statement(
            "SELECT SEARCH(t, 'q', json_scope => 'JSON_VALUES') FROM x"
        )


def test_gap_fill_methods(spark):
    """GAP_FILL: missing buckets materialize per partition; locf
    carries forward, linear interpolates between bracketing
    observations (NULL outside the observed range), null leaves gaps."""
    import pytest as _pytest

    spark.sql(
        "SELECT * FROM VALUES"
        " ('a', TIMESTAMP '2024-01-01 00:00:00', 10.0),"
        " ('a', TIMESTAMP '2024-01-01 00:03:00', 40.0)"
        " AS t(dev, ts, sig)"
    ).createOrReplaceTempView("gf_readings")
    rows = spark.sql(
        transpile_statement(
            "SELECT dev, ts, a AS locf_v, b AS lin_v, c AS null_v FROM"
            " GAP_FILL((SELECT dev, ts, sig AS a, sig AS b, sig AS c"
            " FROM gf_readings), ts_column => 'ts',"
            " bucket_width => INTERVAL 1 MINUTE,"
            " partitioning_columns => ['dev'],"
            " value_columns => [('a', 'locf'), ('b', 'linear'),"
            " ('c', 'null')]) ORDER BY ts"
        )
    ).collect()
    assert [
        (r["ts"].minute, r["locf_v"], r["lin_v"], r["null_v"]) for r in rows
    ] == [
        (0, 10.0, 10.0, 10.0),
        (1, 10.0, 20.0, None),
        (2, 10.0, 30.0, None),
        (3, 40.0, 40.0, 40.0),
    ]
    with _pytest.raises(ValueError, match="fill method"):
        transpile_statement(
            "SELECT * FROM GAP_FILL(TABLE t, ts_column => 'ts',"
            " bucket_width => INTERVAL 1 HOUR,"
            " value_columns => [('v', 'spline')])"
        )
    with _pytest.raises(ValueError, match="bucket_width"):
        transpile_statement(
            "SELECT * FROM GAP_FILL(TABLE t, ts_column => 'ts',"
            " bucket_width => INTERVAL 1 MONTH)"
        )


def test_pipe_syntax_operators(spark):
    """Pipe-syntax subset: UNION ALL operand, DROP, bare AGGREGATE
    (global), SELECT DISTINCT; unsupported operators raise naming the
    supported set; standard queries with |> nowhere pass through."""
    import pytest as _pytest

    spark.sql(
        "SELECT * FROM VALUES (1, 'x'), (2, 'x'), (3, 'y')"
        " AS t(id, g)"
    ).createOrReplaceTempView("pipe_t")
    r = spark.sql(
        transpile_statement(
            "FROM pipe_t |> AGGREGATE COUNT(*) AS n, SUM(id) AS s"
        )
    ).first()
    assert (r["n"], r["s"]) == (3, 6)
    rows = spark.sql(
        transpile_statement(
            "FROM pipe_t |> DROP id |> SELECT DISTINCT g |> ORDER BY g"
        )
    ).collect()
    assert [r["g"] for r in rows] == ["x", "y"]
    u = spark.sql(
        transpile_statement(
            "FROM pipe_t |> WHERE id = 1 |> SELECT id"
            " |> UNION ALL (SELECT 9 AS id) |> ORDER BY id"
        )
    ).collect()
    assert [r["id"] for r in u] == [1, 9]
    with _pytest.raises(ValueError, match="unsupported operator"):
        transpile_statement("FROM pipe_t |> WINDOW x AS y")


def test_pipe_syntax_pivot_unpivot_tablesample(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 10.0), (2, 'a', 20.0),"
        " (3, 'b', 5.0) AS t(id, g, v)"
    ).createOrReplaceTempView("pipe_pv")
    rows = spark.sql(
        transpile_statement(
            "FROM pipe_pv |> PIVOT (SUM(v) FOR g IN ('a', 'b'))"
            " |> ORDER BY id"
        )
    ).collect()
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert rows[2]["b"] is not None and rows[2]["a"] is None
    n = spark.sql(
        transpile_statement(
            "FROM pipe_pv |> TABLESAMPLE SYSTEM (100 PERCENT)"
            " |> AGGREGATE COUNT(*) AS n"
        )
    ).first()["n"]
    assert n == 3
    n2 = spark.sql(
        transpile_statement(
            "FROM pipe_pv |> PIVOT (SUM(v) FOR g IN ('a', 'b'))"
            " |> UNPIVOT (val FOR grp IN (a, b))"
            " |> AGGREGATE COUNT(*) AS n"
        )
    ).first()["n"]
    assert n2 == 3


def test_materialized_view_nested_options(spark):
    """OPTIONS with nested parens/brackets (labels=[('a','b')]) must
    still be stripped via the balanced scanner (ADVICE r5)."""
    from crmint_spark.dialect import _rewrite_materialized_view

    out = _rewrite_materialized_view(
        "CREATE MATERIALIZED VIEW `p.d.mv` OPTIONS("
        "enable_refresh=true, labels=[('team', 'growth')], "
        "description='a (nested) note') AS SELECT 1 AS a"
    )
    assert out == "CREATE OR REPLACE TABLE `p.d.mv` AS SELECT 1 AS a"
    # no OPTIONS still works
    out = _rewrite_materialized_view(
        "CREATE OR REPLACE MATERIALIZED VIEW v AS SELECT 2 AS b"
    )
    assert out == "CREATE OR REPLACE TABLE v AS SELECT 2 AS b"


def test_bignumeric_type_name():
    """INFORMATION_SCHEMA reports BIGNUMERIC for scale>9 decimals
    (engine convention: NUMERIC=38,9 / BIGNUMERIC=38,18) (ADVICE r5)."""
    from pyspark.sql import types as T

    from crmint_spark.catalog import _bq_type_name

    assert _bq_type_name(T.DecimalType(38, 9)) == "NUMERIC"
    assert _bq_type_name(T.DecimalType(38, 18)) == "BIGNUMERIC"


def test_json_mutators_edges(spark):
    """JSON mutator error contract + lax edges (the happy paths are
    oracle-certified by q87_json_mutators)."""
    import pytest as _pytest

    from crmint_spark.functions import register_engine_udfs
    from crmint_spark.functions.json_mutators import (
        json_remove,
        json_set,
        json_strip_nulls,
    )

    register_engine_udfs(spark)
    # root replacement and null-document propagation
    assert json_set('{"a":1}', "$", '{"v":[1]}') == "[1]"
    assert json_set(None, "$.a", '{"v":1}') is None
    # quoted keys with dots
    assert (
        json_set("{}", '$."k.1"', '{"v":2}') == '{"k.1":2}'
    )
    with _pytest.raises(ValueError, match="root"):
        json_remove('{"a":1}', "$")
    with _pytest.raises(ValueError, match="JSONPath"):
        json_set("{}", "a.b", '{"v":1}')
    # strip on null root -> JSON 'null'
    assert json_strip_nulls("null") == "null"
    # named args reject at transpile time
    from crmint_spark.dialect import transpile_statement

    with _pytest.raises(ValueError, match="named arguments"):
        transpile_statement(
            "SELECT JSON_STRIP_NULLS(j, remove_empty => TRUE) FROM t"
        )
    # SQL-level roundtrip through the registered UDFs
    row = spark.sql(
        transpile_statement(
            "SELECT JSON_SET('{\"x\":1}', '$.y[1]', 'z') AS a"
        )
    ).first()
    assert row["a"] == '{"x":1,"y":[null,"z"]}'


def test_generate_date_array_inverted_bounds(spark):
    """start > end with a positive step returns [] (BigQuery), not a
    Spark sequence error; negative steps invert the rule."""
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT GENERATE_DATE_ARRAY('2024-01-10', '2024-01-01') AS a,"
            " GENERATE_DATE_ARRAY(DATE '2024-01-10', DATE '2024-01-01',"
            " INTERVAL -3 DAY) AS b,"
            " GENERATE_DATE_ARRAY('2024-01-01', '2024-01-10',"
            " INTERVAL -1 DAY) AS c"
        )
    ).first()
    assert row["a"] == []
    assert len(row["b"]) == 4
    assert row["c"] == []


def test_bag_of_words_array_signature(spark):
    """BigQuery's documented signature takes ARRAY<STRING> (tokenized
    document); string literals tokenize on whitespace as a
    convenience."""
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT ML.BAG_OF_WORDS(['b', 'a', 'b']) AS arr,"
            " ML.BAG_OF_WORDS(SPLIT('x y x', ' ')) AS splitf"
        )
    ).first()
    assert [(r["term"], r["count"]) for r in row["arr"]] == [("a", 1), ("b", 2)]
    assert [(r["term"], r["count"]) for r in row["splitf"]] == [
        ("x", 2),
        ("y", 1),
    ]


def test_st_geohash(spark):
    """Geohash matches the independent bisection reference (Niemeyer's
    public algorithm) including the lon=180/lat=90 clamp; non-literal
    precision rejects."""
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT ST_GEOHASH(ST_GEOGPOINT(-122.35, 47.62), 10) AS a,"
            " ST_GEOHASH(ST_GEOGPOINT(0.0, 0.0), 6) AS b,"
            " ST_GEOHASH(ST_GEOGPOINT(180.0, 90.0), 4) AS c"
        )
    ).first()
    assert row["a"] == "c22yzugqw7"
    assert row["b"] == "s00000"
    assert row["c"] == "zzzz"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="literal"):
        transpile_statement(
            "SELECT ST_GEOHASH(ST_GEOGPOINT(1.0, 2.0), n) FROM t"
        )


def test_time_family_random_cases_vs_model(spark):
    """50 seeded-random TIME_ADD/TIME_SUB/TIME_DIFF/TIME_TRUNC cases
    compared against an independent datetime model (wrap-at-24h,
    whole-unit truncation toward zero, part truncation)."""
    import datetime as dt
    import random

    from crmint_spark.dialect import transpile_statement

    rng = random.Random(88)
    units = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}
    exprs, expected = [], {}
    for i in range(50):
        h, m, s = rng.randrange(24), rng.randrange(60), rng.randrange(60)
        t = dt.datetime(1970, 1, 1, h, m, s)
        lit = t.strftime("%H:%M:%S")
        kind = rng.choice(["add", "sub", "diff", "trunc"])
        if kind in ("add", "sub"):
            amt = rng.randrange(1, 5000)
            unit = rng.choice(list(units))
            delta = dt.timedelta(seconds=amt * units[unit])
            r = (t + delta) if kind == "add" else (t - delta)
            expected[f"c{i}"] = r.strftime("%H:%M:%S")
            fn = "TIME_ADD" if kind == "add" else "TIME_SUB"
            exprs.append(
                f"{fn}(TIME '{lit}', INTERVAL {amt} {unit}) AS c{i}"
            )
        elif kind == "diff":
            h2, m2, s2 = (
                rng.randrange(24), rng.randrange(60), rng.randrange(60)
            )
            t2 = dt.datetime(1970, 1, 1, h2, m2, s2)
            unit = rng.choice(list(units))
            # whole units, truncated toward zero (BigQuery TIME_DIFF)
            expected[f"c{i}"] = int(
                (t - t2).total_seconds() / units[unit]
            )
            exprs.append(
                f"TIME_DIFF(TIME '{lit}',"
                f" TIME '{t2.strftime('%H:%M:%S')}', {unit}) AS c{i}"
            )
        else:
            part = rng.choice(["HOUR", "MINUTE", "SECOND"])
            r = t.replace(
                **(
                    {"minute": 0, "second": 0}
                    if part == "HOUR"
                    else {"second": 0} if part == "MINUTE" else {}
                )
            )
            expected[f"c{i}"] = r.strftime("%H:%M:%S")
            exprs.append(f"TIME_TRUNC(TIME '{lit}', {part}) AS c{i}")
    row = spark.sql(
        transpile_statement("SELECT " + ", ".join(exprs))
    ).first()
    for k, want in expected.items():
        assert row[k] == want, (k, row[k], want)


def test_string_agg_order_by_and_limit(spark):
    """Non-DISTINCT STRING_AGG honors ORDER BY (struct sort over an
    arbitrary key, DESC supported) and LIMIT (review probe found both
    silently ignored before)."""
    from crmint_spark.catalog import register_testdata
    from crmint_spark.dialect import transpile_statement

    register_testdata(spark, "/root/testdata/sf0.001")
    row = spark.sql(
        transpile_statement(
            "SELECT STRING_AGG(n_name, ',' ORDER BY n_name LIMIT 2) AS a,"
            " STRING_AGG(n_name, '|' ORDER BY n_nationkey DESC LIMIT 1)"
            " AS b FROM nation WHERE n_nationkey < 4"
        )
    ).first()
    assert row["a"] == "NATION_0,NATION_1"
    assert row["b"] == "NATION_3"


def test_string_agg_distinct_foreign_order_key_rejected(spark):
    """STRING_AGG(DISTINCT x ORDER BY other) is rejected loudly — the
    BigQuery contract (ADVICE r6: it used to silently sort by the
    aggregated value instead of the requested key)."""
    import pytest

    from crmint_spark.dialect import transpile_statement

    with pytest.raises(ValueError, match="DISTINCT and ORDER BY"):
        transpile_statement(
            "SELECT STRING_AGG(DISTINCT n_name ORDER BY n_nationkey)"
            " FROM nation"
        )
    # self-keyed DISTINCT ORDER BY stays accepted
    out = transpile_statement(
        "SELECT STRING_AGG(DISTINCT n_name ORDER BY n_name) FROM nation"
    )
    assert "array_sort" in out


def test_date_diff_boundary_semantics(spark):
    """DATE_DIFF/DATETIME_DIFF count PART BOUNDARIES (BigQuery's
    documented examples), not whole intervals: the Dec-31 -> Jan-1 year
    case and the Saturday -> Sunday week case both return 1."""
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT DATE_DIFF(DATE '2024-01-01', DATE '2023-12-31', YEAR) AS y,"
            " DATE_DIFF(DATE '2017-10-15', DATE '2017-10-14', WEEK) AS w,"
            " DATE_DIFF(DATE '2017-10-15', DATE '2017-10-14', WEEK(MONDAY)) AS wm,"
            " DATE_DIFF(DATE '2024-03-01', DATE '2024-01-31', MONTH) AS m,"
            " DATE_DIFF(DATE '2024-01-08', DATE '2024-01-07', ISOWEEK) AS iw,"
            " DATE_DIFF(DATE '2023-01-01', DATE '2024-01-01', MONTH) AS neg,"
            " DATE_DIFF(DATE '2024-02-01', DATE '2024-01-01', DAY) AS d"
        )
    ).first()
    assert (
        row["y"], row["w"], row["wm"], row["m"], row["iw"], row["neg"], row["d"]
    ) == (1, 1, 0, 2, 1, -12, 31)


def test_extract_week_weekday_variants(spark):
    """EXTRACT(WEEK(<WEEKDAY>) FROM d): 0-based week numbers starting
    on the named day — BigQuery's documented 2017-11-05 examples."""
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT EXTRACT(WEEK FROM DATE '2017-11-05') AS a,"
            " EXTRACT(WEEK(MONDAY) FROM DATE '2017-11-05') AS b,"
            " EXTRACT(WEEK FROM DATE '2024-01-01') AS c,"
            " EXTRACT(WEEK(MONDAY) FROM DATE '2024-01-01') AS d"
        )
    ).first()
    assert (row["a"], row["b"], row["c"], row["d"]) == (45, 44, 0, 1)


def test_last_day_week_variants_and_strftime_names(spark):
    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT CAST(LAST_DAY(DATE '2024-01-10', WEEK(MONDAY)) AS STRING) AS a,"
            " CAST(LAST_DAY(DATE '2024-01-14', WEEK(MONDAY)) AS STRING) AS b,"
            " FORMAT_DATE('%A %a %B %b %j', DATE '2024-01-10') AS c,"
            " FORMAT_TIMESTAMP('%I %p', TIMESTAMP '2024-01-01 13:05:00') AS d"
        )
    ).first()
    assert row["a"] == "2024-01-14" and row["b"] == "2024-01-14"
    assert row["c"] == "Wednesday Wed January Jan 010"
    assert row["d"] == "01 PM"


def test_search_analyzer_argument_and_text_analyze(spark):
    """Round 9: the named analyzer argument (LOG == 2-arg default;
    NO_OP == whole-value exact equality) and TEXT_ANALYZE's token
    arrays. PATTERN_ANALYZER / json_scope stay loud errors."""
    import pytest as _pytest

    from crmint_spark.dialect import transpile_statement

    row = spark.sql(
        transpile_statement(
            "SELECT"
            " SEARCH('Spark SQL merge', 'spark merge') AS a,"
            " SEARCH('Spark SQL merge', 'spark merge',"
            "   analyzer => 'LOG_ANALYZER') AS a2,"
            " SEARCH('abc', 'abc', analyzer => 'NO_OP_ANALYZER') AS b,"
            " SEARCH('Abc', 'abc', analyzer => 'NO_OP_ANALYZER') AS c,"
            " TEXT_ANALYZE('Hello, World 42!') AS toks,"
            " TEXT_ANALYZE('Keep AS-IS',"
            "   analyzer => 'NO_OP_ANALYZER') AS noop",
            None,
        )
    ).first()
    assert row["a"] is True and row["a2"] is True
    assert row["b"] is True and row["c"] is False
    assert row["toks"] == ["hello", "world", "42"]
    assert row["noop"] == ["Keep AS-IS"]
    # NULL propagation (BigQuery: TEXT_ANALYZE(NULL)/SEARCH(NULL,..)
    # are NULL — review finding r9: array(NULL) was [NULL]) and the
    # double-quoted analyzer literal form
    row2 = spark.sql(
        transpile_statement(
            "SELECT"
            " TEXT_ANALYZE(CAST(NULL AS STRING),"
            "   analyzer => 'NO_OP_ANALYZER') AS a,"
            " TEXT_ANALYZE(CAST(NULL AS STRING)) AS b,"
            " SEARCH(CAST(NULL AS STRING), 'x') AS c,"
            ' SEARCH(\'a b\', \'b\', analyzer => "LOG_ANALYZER") AS d',
            None,
        )
    ).first()
    assert row2["a"] is None and row2["b"] is None
    assert row2["c"] is None and row2["d"] is True
    for bad in (
        "SELECT SEARCH('a', 'b', analyzer => 'PATTERN_ANALYZER')",
        "SELECT SEARCH('a', 'b', json_scope => 'JSON_VALUES')",
        "SELECT TEXT_ANALYZE('a', analyzer => 'PATTERN_ANALYZER')",
    ):
        with _pytest.raises(ValueError):
            transpile_statement(bad, None)


def test_xxh64_fuzz_against_engine(spark):
    """Driver-side XXH64 vs Spark's xxhash64 over 120 random
    seeded strings (all lane/tail lengths + unicode) — the routed
    SEARCH's bucket arithmetic must never drift."""
    import random

    from crmint_spark.operators.text import SEARCH_INDEX_BUCKETS, search_bucket

    rng = random.Random(42)
    alphabet = "abcXYZ019 _-.,é漢🙂"
    toks = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(120)
    ]
    vals = ", ".join(f"('{t}')" for t in (s.replace("'", "") for s in toks))
    rows = spark.sql(
        f"SELECT t, pmod(xxhash64('text', t), {SEARCH_INDEX_BUCKETS}) AS b"
        f" FROM VALUES {vals} AS v(t)"
    ).collect()
    for r in rows:
        assert search_bucket("text", r["t"]) == r["b"], repr(r["t"])


def test_hof_lambda_params_never_shadow_user_columns(spark):
    """Round-10 adversarial probe (CONFIRMED wrong answer): the SEARCH
    scan rewrite's lambda parameter `t` shadowed a user column named
    `t` referenced inside the lambda body, turning the predicate
    vacuously TRUE — SEARCH(t, 'alpha') matched every row. Generated
    lambda parameters are now collision-proof (__sq_tok / __ng_*);
    this drives the worst-case column names through SEARCH (2- and
    3-arg) and ML.NGRAMS."""
    from crmint_spark.dialect import transpile_statement

    spark.sql(
        "SELECT * FROM VALUES (1, 'alpha'), (9, 'gamma') AS v(id, t)"
    ).createOrReplaceTempView("shadow_t")
    got = spark.sql(
        transpile_statement(
            "SELECT id FROM shadow_t WHERE SEARCH(t, 'alpha')", None
        )
    ).collect()
    assert [r.id for r in got] == [1], got
    got = spark.sql(
        transpile_statement(
            "SELECT id FROM shadow_t WHERE"
            " SEARCH(t, 'alpha', analyzer => 'LOG_ANALYZER')",
            None,
        )
    ).collect()
    assert [r.id for r in got] == [1], got
    spark.sql(
        "SELECT * FROM VALUES (1, 'alpha') AS v(id, x)"
    ).createOrReplaceTempView("shadow_x")
    got = spark.sql(
        transpile_statement(
            "SELECT id FROM shadow_x WHERE SEARCH(x, 'gamma')", None
        )
    ).collect()
    assert got == [], got
    # ML.NGRAMS over columns named n / i (the generated loop params)
    spark.sql(
        "SELECT array('a', 'b', 'c') AS n, '-' AS i"
    ).createOrReplaceTempView("shadow_ni")
    got = spark.sql(
        transpile_statement(
            "SELECT ML.NGRAMS(n, [1, 2], i) AS g FROM shadow_ni", None
        )
    ).collect()
    assert got[0]["g"] == ["a", "b", "c", "a-b", "b-c"], got


def test_backtick_rewrite_masks_literals_not_comments():
    """Round 10: backticked names inside STRING LITERALS reach dynamic
    SQL verbatim (EXECUTE IMMEDIATE pattern), while names in code —
    including after comments containing apostrophes — still rewrite."""
    from crmint_spark.dialect import transpile_statement as t

    assert "p__d__t" in t(
        "SELECT x -- note's\n FROM `p.d.t` WHERE y = 'a'", None
    )
    assert "p__d__t" in t("/* don't */ SELECT x FROM `p.d.t`", None)
    out = t("SELECT 'docs: `p.d.t`' AS s FROM `p.d.u`", None)
    assert "`p.d.t`" in out and "p__d__u" in out
    assert "`p.d.v`" in t(
        "EXECUTE IMMEDIATE 'CREATE TABLE `p.d.v` AS SELECT 1'", None
    )


def test_bucketize_and_norm_lambda_shadowing(spark):
    """Review wave 2: ML.BUCKETIZE's `p ->` lambda shadowed a user
    column named p (every row landed in the top bucket); the
    ML.NORMALIZER lambdas had the same residual exposure."""
    from crmint_spark.dialect import transpile_statement

    spark.sql(
        "SELECT * FROM VALUES (5.0), (15.0), (25.0) AS v(p)"
    ).createOrReplaceTempView("shadow_p")
    got = sorted(
        r.b
        for r in spark.sql(
            transpile_statement(
                "SELECT ML.BUCKETIZE(p, [10, 20]) AS b FROM shadow_p",
                None,
            )
        ).collect()
    )
    assert got == ["bin_1", "bin_2", "bin_3"], got


def test_bare_information_schema_rewrite_comment_aware():
    """Review wave 2: the bare INFORMATION_SCHEMA rewrite shares the
    comment-aware walker — an apostrophe in a comment no longer
    suppresses the reference mapping."""
    from crmint_spark.dialect import transpile_statement as t

    out = t(
        "SELECT x -- don't\n FROM p.d.INFORMATION_SCHEMA.TABLES", None
    )
    assert "p__d__INFORMATION_SCHEMA__TABLES" in out, out


def test_generated_lambdas_robust_to_any_column_name(spark):
    """Generalization of the round-10 shadow fixes: for every short
    identifier a generated lambda has ever used as a parameter, a
    column by that name must still evaluate correctly through SEARCH
    (engine truth = Python tokenization) and ML.BUCKETIZE."""
    import re as _re

    from crmint_spark.dialect import (
        LOG_ANALYZER_DELIMS,
        transpile_statement,
    )

    # every name a generated lambda has EVER used as a parameter —
    # including the names the round-10 fix itself introduced (the
    # round-11 verdict confirmed those were shadowable too) and the
    # first lengthened form the per-site derivation can now emit
    names = [
        "t", "x", "p", "n", "i", "s", "v", "acc", "ch", "tok",
        "__sq_tok", "__sq_tok0", "__ng_n", "__ng_i", "__e", "__q",
        "__i", "__w", "__t", "__v", "__s", "__p", "__a", "_rs",
        "_rr", "__gc", "__ga", "__gt",
    ]
    texts = ["alpha beta", "gamma", "ALPHA only", "beta alpha x t p"]

    def truth(text, query):
        toks = lambda e: {
            w for w in _re.split(LOG_ANALYZER_DELIMS, e.lower()) if w
        }
        q = toks(query)
        return bool(q) and q <= toks(text) or not q

    for name in names:
        rows = ", ".join(f"({j}, '{s}')" for j, s in enumerate(texts))
        spark.sql(
            f"SELECT * FROM VALUES {rows} AS v(id, {name})"
        ).createOrReplaceTempView("shadow_any")
        got = sorted(
            r.id
            for r in spark.sql(
                transpile_statement(
                    f"SELECT id FROM shadow_any"
                    f" WHERE SEARCH({name}, 'alpha')",
                    None,
                )
            ).collect()
        )
        want = sorted(
            j for j, s in enumerate(texts) if truth(s, "alpha")
        )
        assert got == want, (name, got, want)


def test_fresh_lambda_params_derivation():
    """The per-site derivation lengthens until the name is absent from
    the embedded expression text (identifier-token match,
    case-insensitive) and never returns duplicate names."""
    from crmint_spark.dialect import _fresh_lambda_params as fresh

    assert fresh(["a + b"], "__e") == ["__e"]
    assert fresh(["__e + 1"], "__e") == ["__e0"]
    assert fresh(["__E + __e0"], "__e") == ["__e1"]  # case-insensitive
    assert fresh(["x.__e"], "__e") == ["__e0"]  # field path still shadows
    assert fresh(["prefix__e"], "__e") == ["__e"]  # substring is fine
    assert fresh([""], "__v", "__v") == ["__v", "__v0"]
    assert fresh(["t.__ng_n, u.__ng_i0"], "__ng_n", "__ng_i") == [
        "__ng_n0",
        "__ng_i",
    ]


def test_every_derived_lambda_site_survives_its_own_param_names(spark):
    """Round-11 verdict: fixed renames only move the collision. Each
    rewrite site that embeds user text inside a lambda body now derives
    its params per call; drive every such site with columns named
    exactly like the params it would pick by default."""
    from crmint_spark.dialect import transpile_statement as T

    def one(sql):
        return spark.sql(T(sql, None)).collect()[0][0]

    # RANGE_BUCKET: __e
    assert (
        one("SELECT RANGE_BUCKET(__e, [0, 10, 20]) FROM (SELECT 15 AS __e)")
        == 2
    )
    # INSTR general path: __q
    assert (
        one("SELECT INSTR(__q, 'a', 1, 2) FROM (SELECT 'banana' AS __q)")
        == 4
    )
    # JSON_*_ARRAY: __i
    assert one(
        "SELECT JSON_EXTRACT_STRING_ARRAY(__i, '$')"
        " FROM (SELECT '[\"x\",\"y\"]' AS __i)"
    ) == ["x", "y"]
    # ML.BAG_OF_WORDS: __w / __t
    got = one(
        "SELECT ML.BAG_OF_WORDS(__w)"
        " FROM (SELECT array('x', 'y', 'x') AS __w)"
    )
    assert [(r["term"], r["count"]) for r in got] == [("x", 2), ("y", 1)]
    got = one(
        "SELECT ML.BAG_OF_WORDS(__t)"
        " FROM (SELECT array('x', 'y', 'x') AS __t)"
    )
    assert [(r["term"], r["count"]) for r in got] == [("x", 2), ("y", 1)]
    # APPROX_TOP_COUNT / APPROX_TOP_SUM: __v (+ weight named __p)
    got = one(
        "SELECT APPROX_TOP_COUNT(__v, 1) FROM"
        " (SELECT c AS __v FROM VALUES ('p'), ('p'), ('q') t(c))"
    )
    assert (got[0]["value"], got[0]["count"]) == ("p", 2)
    got = one(
        "SELECT APPROX_TOP_SUM(__v, __p, 1) FROM (SELECT c AS __v,"
        " w AS __p FROM VALUES ('p', 1.0), ('q', 5.0) t(c, w))"
    )
    assert (got[0]["value"], got[0]["sum"]) == ("q", 5.0)
    # ML.NGRAMS: __ng_n / __ng_i inside the array argument
    got = one(
        "SELECT ML.NGRAMS(slice(toks, __ng_i, __ng_n + 1), [2, 2], ' ')"
        " FROM (SELECT array('a','b','c') AS toks, 2 AS __ng_n,"
        " 1 AS __ng_i)"
    )
    assert got == ["a b", "b c"], got
    # ST_GEOHASH: __gc / __ga / __gt inside the point expression
    assert one(
        "SELECT ST_GEOHASH(named_struct('lon', CAST(__gt AS DOUBLE),"
        " 'lat', 42.0), 6) FROM (SELECT -5.6 AS __gt)"
    ) == one("SELECT ST_GEOHASH(ST_GEOGPOINT(-5.6, 42.0), 6)")
    # KLL exact-boundaries helper: __i in the sketch expression
    assert one(
        "SELECT KLL_QUANTILES.EXTRACT_INT64(s, __i) FROM (SELECT"
        " KLL_QUANTILES.INIT_INT64(c) AS s, 2 AS __i FROM"
        " (SELECT * FROM VALUES (1), (2), (3), (4) t(c)))"
    ) == one(
        "SELECT KLL_QUANTILES.EXTRACT_INT64(s, 2) FROM (SELECT"
        " KLL_QUANTILES.INIT_INT64(c) AS s FROM"
        " (SELECT * FROM VALUES (1), (2), (3), (4) t(c)))"
    )


def test_triple_quoted_literals(spark):
    """Round-11 verdict: triple-quoted literals (legal BigQuery) were
    silently mis-lexed — Spark kept quote characters in the value. The
    early rewrite converts them to escaped single-quoted literals;
    bodies may contain apostrophes, ``--``, ``;`` and newlines."""
    from crmint_spark.dialect import transpile_statement as T

    def one(sql):
        return spark.sql(T(sql, None)).collect()[0][0]

    assert one("SELECT '''abc'''") == "abc"
    assert one('SELECT """ab c"""') == "ab c"
    assert one("SELECT '''it's a; test -- really'''") == (
        "it's a; test -- really"
    )
    assert one('SELECT """with "quote" inside"""') == 'with "quote" inside'
    assert one("SELECT '''multi\nline'''") == "multi\nline"
    assert one(r"SELECT '''a\nb'''") == "a\nb"  # escapes still process
    assert one(r"SELECT r'''a\nb'''") == "a\\nb"  # raw: backslash literal
    assert one("SELECT LENGTH('''''')") == 0  # empty triple literal
    # quote runs shorter than three stay in the body
    assert one("SELECT '''don''t'''") == "don''t"


def test_hash_line_comments(spark):
    """Round-11 verdict: ``#`` line comments are legal BigQuery but were
    unrecognized everywhere. They now split/strip/blank like ``--`` and
    convert to ``--`` before reaching Spark; a ``#`` inside a string
    literal is untouched."""
    from crmint_spark.dialect import split_script, transpile_statement as T

    stmts = split_script(
        "# leading, don't trip\nSELECT 1;\nSELECT 2 # trailing, it's\n;"
    )
    assert len(stmts) == 2, stmts
    got = spark.sql(T("SELECT 1 # comment's tail\n + 1 AS a", None)).collect()
    assert got[0]["a"] == 2
    got = spark.sql(T("SELECT '#not a comment' AS s", None)).collect()
    assert got[0]["s"] == "#not a comment"


def test_code_literal_walk_is_comment_aware(spark):
    """Round-11 probe: an apostrophe inside a ``--`` comment misaligned
    the quote walk of _map_code_literal_pairs, so a triple-quoted (or
    raw) literal AFTER the comment was skipped by the rewrite."""
    from crmint_spark.dialect import transpile_statement as T

    got = spark.sql(
        T("SELECT 1 AS k, -- don't trip\n '''it's fine''' AS s", None)
    ).collect()
    assert got[0]["s"] == "it's fine"
    got = spark.sql(
        T("SELECT /* won't */ r'a\\d+' AS s", None)
    ).collect()
    assert got[0]["s"] == "a\\d+"


def test_comments_in_procedural_block_heads(spark):
    """Round 11: a comment between a block head and THEN/DO (legal
    BigQuery; apostrophes and block keywords inside comments included)
    broke the marker scan — comments blank before strings strip."""
    import tempfile

    from crmint_spark.catalog import Catalog
    from crmint_spark.workers.base import WorkerContext
    from crmint_spark.workers.sql_executor import SparkSQLExecutor

    cat = Catalog(spark, tempfile.mkdtemp(prefix="blk_"))

    def run(script):
        w = SparkSQLExecutor(
            {"script": script, "dry_run": False},
            WorkerContext(spark=spark, catalog=cat),
        )
        w.execute()
        return w

    shapes = [
        ("IF 1 = 1 # cond's note\nTHEN SELECT 1 AS v; END IF;", 1),
        ("IF 1 = 1 -- cond's note\nTHEN SELECT 1 AS v; END IF;", 1),
        (
            "DECLARE i INT64 DEFAULT 0;\nWHILE i < 2 # loop's\n DO"
            " SET i = i + 1; END WHILE;\nSELECT i AS v;",
            2,
        ),
        ("IF 1 = 1 /* don't */ THEN SELECT 1 AS v; END IF;", 1),
        (
            "IF 1 = 1 THEN\n-- END IF? no, it's a comment\n"
            "SELECT 1 AS v; END IF;",
            1,
        ),
        ("BEGIN\n-- a BEGIN comment with WHILE keyword\nSELECT 4 AS v;\nEND;", 4),
    ]
    for script, want in shapes:
        got = run(script).result.collect()[0]["v"]
        assert got == want, (script, got, want)


def test_aliasless_from_unnest(spark):
    """Round 11: alias-less ``FROM UNNEST(arr)`` is legal BigQuery (the
    element column is anonymous, surfaced as f0_); previously the next
    clause keyword was eaten as the alias (loud)."""
    from crmint_spark.dialect import transpile_statement as T

    def one(sql):
        return spark.sql(T(sql, None)).collect()[0][0]

    assert one("SELECT COUNT(*) FROM UNNEST(SPLIT('a;b;c', ';'))") == 3
    assert one("SELECT COUNT(*) FROM UNNEST([1, 2, 3]) WHERE TRUE") == 3
    assert one("SELECT * FROM UNNEST([7])") == 7
    assert one("SELECT COUNT(*) FROM UNNEST(['x', 'y']) WITH OFFSET") == 2
    # aliased form unchanged
    assert one("SELECT COUNT(*) FROM UNNEST([1, 2]) AS t") == 2


def test_aggregate_over_unnest_scalar_subquery(spark):
    """Round 11 CONFIRMED wrong answer: ``(SELECT COUNT(*) FROM
    UNNEST([1,2,3]))`` returned the OUTER query's aggregate (1) via the
    first-element path. Aggregate selects now compile to array algebra
    with BigQuery NULL semantics."""
    from crmint_spark.dialect import transpile_statement as T

    def one(sql):
        return spark.sql(T(sql, None)).collect()[0][0]

    assert one("SELECT (SELECT COUNT(*) FROM UNNEST([1,2,3]))") == 3
    assert one(
        "SELECT (SELECT COUNT(*) FROM UNNEST(CAST(NULL AS ARRAY<INT64>)))"
    ) == 0
    assert one("SELECT (SELECT COUNT(x) FROM UNNEST([1,NULL,3]) AS x)") == 2
    assert (
        one("SELECT (SELECT COUNT(DISTINCT x) FROM UNNEST([1,1,3]) AS x)")
        == 2
    )
    assert one("SELECT (SELECT SUM(x) FROM UNNEST([1,2,3]) AS x)") == 6
    assert (
        one("SELECT (SELECT SUM(x) FROM UNNEST(CAST([] AS ARRAY<INT64>)) AS x)")
        is None
    )
    assert one("SELECT (SELECT SUM(x) FROM UNNEST([1,NULL,3]) AS x)") == 4
    assert one("SELECT (SELECT MIN(x) FROM UNNEST([3,1,2]) AS x)") == 1
    assert one("SELECT (SELECT MAX(x) FROM UNNEST([3,NULL,2]) AS x)") == 3
    assert one("SELECT (SELECT AVG(x) FROM UNNEST([2,4]) AS x)") == 3.0
    assert (
        one("SELECT (SELECT COUNT(*) FROM UNNEST([1,2,3]) AS x WHERE x > 1)")
        == 2
    )
    assert (
        one("SELECT (SELECT SUM(x) FROM UNNEST([1,2,3]) AS x WHERE x > 1)")
        == 5
    )
    assert (
        one("SELECT (SELECT LOGICAL_AND(b) FROM UNNEST([TRUE, FALSE]) AS b)")
        is False
    )
    # element-selection shape untouched
    assert one("SELECT (SELECT x FROM UNNEST([7, 8]) AS x WHERE x > 7)") == 8
    # correlated over table columns, incl. an outer column named __u
    # (the old fixed lambda var — must not shadow)
    spark.sql(
        "SELECT 1 AS id, array(1,2,3) AS arr, 5 AS __u"
        " UNION ALL SELECT 2, array(10), 7"
    ).createOrReplaceTempView("agg_unnest_t")
    got = spark.sql(
        T(
            "SELECT id, (SELECT SUM(x) FROM UNNEST(arr) AS x) AS s,"
            " (SELECT COUNT(*) FROM UNNEST(arr) WHERE __u > 0) AS c"
            " FROM agg_unnest_t ORDER BY id",
            None,
        )
    ).collect()
    assert [(r.id, r.s, r.c) for r in got] == [(1, 6, 3), (2, 10, 1)]


def test_comments_inside_rewritten_arguments(spark):
    """One blanking pass at transpile entry (hints preserved) makes
    comments inside FUNCTION ARGUMENTS safe for every rewrite — a
    trailing ``--`` in an argument previously swallowed whatever the
    rewrite appended on that line (round-11 review wave)."""
    from crmint_spark.dialect import transpile_statement as T

    r = spark.sql(T(
        "SELECT IFNULL(NULL -- missing\n        , 7) AS a,"
        " ML.NGRAMS(['a','b','c'] -- toks\n        , [2,2], ' ') AS g,"
        " SEARCH('alpha beta' -- corpus\n        , 'beta') AS s,"
        " '--not a comment' AS lit,"
        " \"# neither\" AS lit2,"
        " '''tri -- keep; it's''' AS t3",
        None,
    )).collect()[0]
    assert r["a"] == 7
    assert list(r["g"]) == ["a b", "b c"]
    assert r["s"] is True
    assert r["lit"] == "--not a comment"
    assert r["lit2"] == "# neither"
    assert r["t3"] == "tri -- keep; it's"
    # the engine's own optimizer hints survive the blanking
    t = T("SELECT /*+ BROADCAST(x) */ 1 FROM (SELECT 1) x", None)
    assert "/*+ BROADCAST(x) */" in t
