"""GA4-export-shaped event fixture derived from the ``events`` testdata.

The reference's flagship generated SQL (ref: backend/controller/ml_model/
templates/model_bqml.sql:73-109, output.sql:12-21) scans the BigQuery
GA4 export: date-sharded ``events_YYYYMMDD`` tables with nested
``event_params`` arrays, ``geo``/``device``/``traffic_source`` structs
and micros timestamps. To prove those scripts run *verbatim* on this
engine, this module deterministically re-shapes the driver's flat
``events`` table into that schema — every derivation is a pure function
of ``(event_id, ts, user_id, event_type, value)`` and is mirrored
line-for-line in the DuckDB oracle fragment below, so cross-engine
hash-compares stay exact.

Derivation map (Spark SQL <-> DuckDB):

- ``event_name``: ``view`` -> ``user_engagement``; ``error`` with
  ``event_id % 11 = 0`` -> ``prop_score``; ``click`` -> ``page_view``;
  else unchanged.
- ``platform``: ``ios`` when ``user_id % 13 = 0`` else ``web`` (so the
  templates' ``LOWER(platform) = "web"`` filter has real effect).
- ``event_params`` (always ``engagement_time_msec``; per-name extras):

  | event_name   | key       | value                                  |
  |--------------|-----------|----------------------------------------|
  | (all)        | engagement_time_msec | int ``floor(value * 100)``  |
  | signup       | plan      | string pro/basic/free by event_id % 3  |
  | error        | severity  | int ``event_id % 5``                   |
  | purchase     | value     | int ``floor(value / 450)`` (0 common)  |
  | prop_score   | type      | string ``Predicted_Value``             |
  | page_view (event_id % 3 = 0) | gclid | ``gclid_<event_id>``       |

- user attributes (geo/device/traffic_source) are per-user modular
  picks, so first-touch dedup is insensitive to which event wins.

At 100 TB the same surface is served by ``Catalog.
register_partitioned_wildcard`` over a single date-partitioned table:
``_TABLE_SUFFIX`` predicates become partition-column predicates and the
scan partition-prunes (no shard union)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog, load

GA4_PROJECT = "ga"
GA4_DATASET = "analytics"

_NULL_VALUE_FIELDS = (
    "'int_value', CAST(NULL AS BIGINT), "
    "'float_value', CAST(NULL AS DOUBLE), 'double_value', CAST(NULL AS DOUBLE)"
)


def _param(key: str, string_value: str, int_value: str) -> str:
    return (
        f"named_struct('key', {key}, 'value', named_struct("
        f"'string_value', {string_value}, 'int_value', {int_value}, "
        "'float_value', CAST(NULL AS DOUBLE), 'double_value', CAST(NULL AS DOUBLE)))"
    )


GA4_SPARK_SQL = """
WITH __ga4_base AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value,
    CASE WHEN event_type = 'view' THEN 'user_engagement'
         WHEN event_type = 'error' AND event_id % 11 = 0 THEN 'prop_score'
         WHEN event_type = 'click' THEN 'page_view'
         ELSE event_type END AS event_name
  FROM {events}
)
SELECT
  CAST(user_id AS STRING) AS user_id,
  CONCAT('pseudo_', CAST(user_id AS STRING)) AS user_pseudo_id,
  unix_micros(ts) AS event_timestamp,
  date_format(ts, 'yyyyMMdd') AS event_date,
  event_name,
  CASE WHEN user_id % 13 = 0 THEN 'ios' ELSE 'web' END AS platform,
  MIN(unix_micros(ts)) OVER (PARTITION BY user_id) AS user_first_touch_timestamp,
  named_struct(
    'country', element_at(array('US','DE','JP'), CAST(user_id % 3 AS INT) + 1),
    'region', CONCAT('R', CAST(user_id % 5 AS STRING))
  ) AS geo,
  named_struct(
    'language', element_at(array('en','de','ja'), CAST(user_id % 3 AS INT) + 1),
    'category', element_at(array('mobile','desktop'), CAST(user_id % 2 AS INT) + 1),
    'operating_system', element_at(array('Android','iOS','Windows'), CAST(user_id % 3 AS INT) + 1),
    'web_info', named_struct('browser', element_at(array('Chrome','Safari','Firefox'), CAST(user_id % 3 AS INT) + 1))
  ) AS device,
  named_struct(
    'source', element_at(array('google','direct','email'), CAST(user_id % 3 AS INT) + 1),
    'medium', element_at(array('cpc','organic','referral'), CAST(user_id % 3 AS INT) + 1)
  ) AS traffic_source,
  filter(array(
    {p_engagement},
    CASE WHEN event_name = 'signup' THEN {p_plan} END,
    CASE WHEN event_name = 'error' THEN {p_severity} END,
    CASE WHEN event_name = 'purchase' THEN {p_value} END,
    CASE WHEN event_name = 'prop_score' THEN {p_prop} END,
    CASE WHEN event_name = 'page_view' AND event_id % 3 = 0 THEN {p_gclid} END
  ), p -> p IS NOT NULL) AS event_params
FROM __ga4_base
""".format(
    events="{events}",
    p_engagement=_param(
        "'engagement_time_msec'",
        "CAST(NULL AS STRING)",
        "CAST(FLOOR(value * 100) AS BIGINT)",
    ),
    p_plan=_param(
        "'plan'",
        "element_at(array('pro','basic','free'), CAST(event_id % 3 AS INT) + 1)",
        "CAST(NULL AS BIGINT)",
    ),
    p_severity=_param(
        "'severity'", "CAST(NULL AS STRING)", "CAST(event_id % 5 AS BIGINT)"
    ),
    p_value=_param(
        "'value'", "CAST(NULL AS STRING)", "CAST(FLOOR(value / 450) AS BIGINT)"
    ),
    p_prop=_param("'type'", "'Predicted_Value'", "CAST(NULL AS BIGINT)"),
    p_gclid=_param(
        "'gclid'",
        "CONCAT('gclid_', CAST(event_id AS STRING))",
        "CAST(NULL AS BIGINT)",
    ),
)

# DuckDB mirror of the same derivations, flattened: the nested
# event_params lookups the templates perform (correlated UNNEST by key)
# reduce to these per-event scalar columns, which is what the oracle SQL
# aggregates. Interpolate as  "WITH ga4 AS (<GA4_DUCKDB_CTE>) ..."
GA4_DUCKDB_CTE = """
  SELECT
    CAST(user_id AS VARCHAR) AS user_id,
    'pseudo_' || CAST(user_id AS VARCHAR) AS user_pseudo_id,
    epoch_us(ts) AS event_timestamp,
    strftime(ts, '%Y%m%d') AS event_date,
    CASE WHEN event_type = 'view' THEN 'user_engagement'
         WHEN event_type = 'error' AND event_id % 11 = 0 THEN 'prop_score'
         WHEN event_type = 'click' THEN 'page_view'
         ELSE event_type END AS event_name,
    CASE WHEN user_id % 13 = 0 THEN 'ios' ELSE 'web' END AS platform,
    MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS user_first_touch_timestamp,
    (['US','DE','JP'])[CAST(user_id % 3 AS INT) + 1] AS country,
    'R' || CAST(user_id % 5 AS VARCHAR) AS region,
    (['en','de','ja'])[CAST(user_id % 3 AS INT) + 1] AS language,
    (['google','direct','email'])[CAST(user_id % 3 AS INT) + 1] AS traffic_source,
    (['cpc','organic','referral'])[CAST(user_id % 3 AS INT) + 1] AS traffic_medium,
    (['mobile','desktop'])[CAST(user_id % 2 AS INT) + 1] AS device_type,
    (['Android','iOS','Windows'])[CAST(user_id % 3 AS INT) + 1] AS device_os,
    (['Chrome','Safari','Firefox'])[CAST(user_id % 3 AS INT) + 1] AS device_browser,
    CAST(FLOOR(value * 100) AS BIGINT) AS engagement_ms,
    CASE WHEN event_type = 'signup'
         THEN (['pro','basic','free'])[CAST(event_id % 3 AS INT) + 1] END AS plan,
    CASE WHEN event_type = 'error' AND event_id % 11 <> 0
         THEN CAST(event_id % 5 AS BIGINT) END AS severity,
    CASE WHEN event_type = 'purchase'
         THEN CAST(FLOOR(value / 450) AS BIGINT) END AS purchase_value,
    CASE WHEN event_type = 'click' AND event_id % 3 = 0
         THEN 'gclid_' || CAST(event_id AS VARCHAR) END AS gclid
  FROM events
"""

# portable FARM_FINGERPRINT twin (see dialect._rewrite_farm_fingerprint /
# functions.hash_str): DuckDB and Spark spellings of the 60-bit
# md5-prefix hash bucketed mod 100
DUCKDB_HASH100 = (
    "(ABS(CAST('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15) AS BIGINT)) % 100)"
)
SPARK_HASH100 = (
    "MOD(ABS(CAST(CONV(SUBSTR(MD5(CAST({x} AS STRING)), 1, 15), 16, 10) AS BIGINT)), 100)"
)


# (session id, sf_dir, events mtime_ns) -> persisted GA4 DataFrame. In
# the reference this table IS materialized storage (the BigQuery GA4
# export dataset); the fixture synthesizes it from the flat events
# parquet, so building the nested params array + per-event derivations
# once per session mirrors reality instead of re-synthesizing ~600k
# nested rows for every query that touches the dataset.
_GA4_CACHE: dict[tuple[int, str, int], DataFrame] = {}
# same key -> sorted distinct event_date list: the shard-name registry
# (setup_ga4_dataset) needs the suffixes on every call, and they are a
# pure function of the cached DataFrame above — computing the distinct
# once per (session, dir, mtime) saves a ~0.4 s Spark job per verbatim
# script entry (r11, guide §1). Evicted in lockstep with _GA4_CACHE.
_GA4_SUFFIXES: dict[tuple[int, str, int], list[str]] = {}
# same key -> the session-scoped parquet directory materializing the
# dataset (see the cache-substitution note inside ga4_events)
_GA4_PATHS: dict[tuple[int, str, int], str] = {}


def ga4_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GA4-shaped event DataFrame for one scale factor."""
    import os

    try:
        mtime = os.stat(os.path.join(sf_dir, "events.parquet")).st_mtime_ns
    except OSError:
        mtime = -1
    key = (id(spark), sf_dir, mtime)
    cached = _GA4_CACHE.get(key)
    if cached is not None:
        return cached
    # evict superseded (same session+dir, older mtime) and dead-session
    # entries so re-generated testdata / stopped sessions don't pin
    # persisted ~600k-row DataFrames (mirrors catalog._LOAD_CACHE)
    from .catalog import _session_stopped

    for k in [
        k
        for k, v in _GA4_CACHE.items()
        if k[:2] == (id(spark), sf_dir) or _session_stopped(v)
    ]:
        try:
            _GA4_CACHE[k].unpersist()
        except Exception:
            pass
        del _GA4_CACHE[k]
        _GA4_SUFFIXES.pop(k, None)
    load(spark, sf_dir, "events").createOrReplaceTempView("__ga4_source_events")
    # EXTRACT(HOUR FROM TIMESTAMP_MICROS(...)) must agree with DuckDB's
    # naive (UTC) timestamps regardless of driver JVM zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Materialize the synthesized dataset to session-scoped PARQUET
    # instead of .persist() (r11, guide §1/§7.2): Spark 4.1's cache
    # substitution does not fire inside WITH-CTE queries (verified:
    # `WITH e AS (SELECT .. FROM <cached view>) SELECT .. FROM e`
    # plans zero InMemoryTableScans where the same query as an inline
    # subquery substitutes), and the reference templates are CTE-heavy
    # — each verbatim script was re-running the whole GA4 synthesis
    # (windows + nested-struct assembly) up to 19x from raw parquet.
    # A parquet round-trip is immune: every reference, CTE or not, is
    # a plain columnar scan. In the reference this dataset IS
    # materialized storage (the BigQuery GA4 export), so the physical
    # materialization also mirrors reality. One write per (session,
    # sf_dir, mtime); superseded directories are removed on eviction.
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="crmint_ga4_")
    spark.sql(GA4_SPARK_SQL.format(events="__ga4_source_events")).write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path)
    # drop directories whose cache entry was evicted above (superseded
    # mtime / dead session); live entries for OTHER (session, dir)
    # keys keep their files
    for k in [k for k in _GA4_PATHS if k not in _GA4_CACHE]:
        shutil.rmtree(_GA4_PATHS.pop(k), ignore_errors=True)
    _GA4_PATHS[key] = path
    _GA4_CACHE[key] = df
    _register_ga4_cleanup()
    return df


_GA4_ATEXIT = [False]


def _register_ga4_cleanup() -> None:
    """Process-exit reclamation of the live session-scoped parquet
    directories (ADVICE r11: superseded dirs are reclaimed on the next
    ga4_events call, but the LAST one per session would otherwise leak
    multi-hundred-MB temp trees across repeated runs)."""
    import atexit
    import shutil

    if _GA4_ATEXIT[0]:
        return
    _GA4_ATEXIT[0] = True

    def _cleanup():
        for p in _GA4_PATHS.values():
            shutil.rmtree(p, ignore_errors=True)
        _GA4_PATHS.clear()

    atexit.register(_cleanup)


def setup_ga4_dataset(
    spark: SparkSession, sf_dir: str, catalog: Catalog
) -> DataFrame:
    """Expose the fixture under the BigQuery GA4 surface:

    - ``ga.analytics.events_*`` scans resolve to ONE view with a
      ``_TABLE_SUFFIX`` column (the partitioned-table scale path —
      suffix predicates prune instead of unioning 30+ shard relations),
    - shard *names* ``events_YYYYMMDD`` are registered so
      ``__TABLES_SUMMARY__`` metadata queries discover them
      (ref: output.sql:2-7).
    """
    from pyspark.sql import functions as F

    import os

    df = ga4_events(spark, sf_dir)
    catalog.register_wildcard_dataframe(
        f"{GA4_PROJECT}.{GA4_DATASET}.events_*",
        df.withColumn("_TABLE_SUFFIX", F.col("event_date")),
    )
    try:
        mtime = os.stat(os.path.join(sf_dir, "events.parquet")).st_mtime_ns
    except OSError:
        mtime = -1
    key = (id(spark), sf_dir, mtime)
    suffixes = _GA4_SUFFIXES.get(key)
    if suffixes is None:
        suffixes = sorted(
            r[0] for r in df.select("event_date").distinct().collect()
        )
        _GA4_SUFFIXES[key] = suffixes
    catalog.register_shard_names(
        GA4_PROJECT, GA4_DATASET, [f"events_{s}" for s in suffixes]
    )
    return df
