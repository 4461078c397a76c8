"""ML-model pipeline compiler: config -> generated multi-job pipelines.

Port of the reference's ``Compiler`` (ref: backend/controller/ml_model/
compiler.py:41-266 + templates/model_bqml.sql, output.sql,
training_pipeline.json, predictive_pipeline.json), re-targeted at the
Spark engine:

- the *training pipeline* builds the feature/label dataset with a
  SparkSQLExecutor job (deterministic 90/10 hash split, class
  rebalancing), trains via MLTrainer (Spark ML instead of BQML
  ``CREATE MODEL``), and — for classification — materializes the
  conversion-values table (NTILE bucketing + LAG/LEAD boundary math,
  ref: model_bqml.sql:30-49),
- the *predictive pipeline* rebuilds the scoring dataset, runs
  MLPredictor (``ML.PREDICT`` equivalent incl. positive-class
  probability extraction), maps probability -> value through the
  conversion-values range join (ref: output.sql:36-55), and uploads via
  the JSON-template sink (GA4 MP shape,
  ref: templates/google_analytics_mp_event.json).

Variable roles and comparisons mirror compiler.py:89-107. Cron
schedules mirror the reference: quarterly training
``0 0 {safe_day} {quarterly_months} *`` (compiler.py:368-379), daily
prediction ``0 0 * * *``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..pipeline import JobSpec, Pipeline, StartCondition

ROLES = (
    "FEATURE",
    "LABEL",
    "TRIGGER_EVENT",
    "FIRST_VALUE",
    "TRIGGER_DATE",
    "USER_ID",
    "CLIENT_ID",
    "GCLID",
)
COMPARISONS = {
    "EQUAL": "=",
    "NOT_EQUAL": "<>",
    "GREATER": ">",
    "GREATER_OR_EQUAL": ">=",
    "LESS": "<",
    "LESS_OR_EQUAL": "<=",
    "REGEX": "RLIKE",
}


@dataclass
class Variable:
    name: str
    role: str  # one of ROLES
    source: str = "events"  # events | first_party
    comparison: str | None = None  # for LABEL/TRIGGER_EVENT matching
    value: str | None = None

    def __post_init__(self):
        if self.role not in ROLES:
            raise ValueError(f"bad role: {self.role}")
        if self.comparison is not None and self.comparison not in COMPARISONS:
            raise ValueError(f"bad comparison: {self.comparison}")


@dataclass
class Timespans:
    training_days: int = 30
    predictive_days: int = 1
    exclusion_days: int = 0


DESTINATIONS = ("GOOGLE_ANALYTICS_MP_EVENT", "GOOGLE_ADS_OFFLINE_CONVERSION")


@dataclass
class MlModelConfig:
    name: str
    model_type: str = "LOGISTIC_REG"
    unique_id: str = "user_id"  # USER_ID | CLIENT_ID column
    variables: list[Variable] = field(default_factory=list)
    hyperparams: dict = field(default_factory=dict)
    timespans: Timespans = field(default_factory=Timespans)
    class_imbalance: int = 4  # negative:positive downsample ratio
    conversion_rate_segments: int = 10
    events_table: str = "events"
    # user-supplied table with feature/label columns for variables with
    # source="first_party" (ref: model_bqml.sql:53-69 first_party_variables)
    first_party_table: str | None = None
    # snapshot date anchoring the timespan windows (the reference anchors
    # at CURRENT_DATE, ref: model_bqml.sql:91-94/output.sql:31-33);
    # None = no event-date filter (whole-table mode for static fixtures)
    as_of_date: str | None = None
    dataset: str = "crmint.models"
    # upload destination (ref: compiler.py:64-67 Destination enum);
    # output_parameters carries customer_id/conversion_action_id for Ads
    # (ref: predictive_pipeline.json:126-133)
    destination: str = "GOOGLE_ANALYTICS_MP_EVENT"
    output_parameters: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.destination not in DESTINATIONS:
            raise ValueError(f"bad destination: {self.destination}")

    def vars_with_role(self, role: str) -> list[Variable]:
        return [v for v in self.variables if v.role == role]

    @property
    def is_classification(self) -> bool:
        from .estimators import is_classifier

        return is_classifier(self.model_type)


class Compiler:
    """Renders pipelines for an ``MlModelConfig``."""

    def __init__(self, config: MlModelConfig):
        self.c = config

    # -- SQL fragments ----------------------------------------------------

    def _feature_exprs(self) -> list[str]:
        """Per-user feature aggregation: event-count features
        (ref: model_bqml.sql:220-248 — correlated array counts become
        conditional aggregates over the event stream)."""
        out = []
        for v in self.c.vars_with_role("FEATURE"):
            if v.source == "first_party":
                continue
            op = COMPARISONS[v.comparison or "EQUAL"]
            out.append(
                "CAST(SUM(CASE WHEN event_type "
                f"{op} '{v.value or v.name}' THEN 1 ELSE 0 END) AS BIGINT) "
                f"AS f_{v.name}"
            )
        return out

    def _fp_feature_exprs(self) -> list[str]:
        """First-party features are table columns used directly
        (ref: model_bqml.sql:56-58)."""
        return [
            f"{v.name} AS f_{v.name}"
            for v in self.c.vars_with_role("FEATURE")
            if v.source == "first_party"
        ]

    def _label_var(self) -> Variable:
        labels = self.c.vars_with_role("LABEL")
        if self.c.is_classification:
            if not labels:
                raise ValueError("classification needs a LABEL variable")
            return labels[0]
        fv = self.c.vars_with_role("FIRST_VALUE") or labels
        if not fv:
            raise ValueError("regression needs FIRST_VALUE or LABEL")
        return fv[0]

    def _label_expr(self) -> str:
        """Label: did the user trigger the label event in-window
        (classification), or sum of value (regression FIRST_VALUE).
        First-party labels are columns taken as-is
        (ref: model_bqml.sql:59-64)."""
        v = self._label_var()
        if v.source == "first_party":
            if self.c.is_classification:
                return f"CAST({v.name} AS INT) AS label"
            return f"ROUND(CAST({v.name} AS DOUBLE), 2) AS label"
        if self.c.is_classification:
            op = COMPARISONS[v.comparison or "EQUAL"]
            return (
                f"CAST(MAX(CASE WHEN event_type {op} '{v.value or v.name}' "
                "THEN 1 ELSE 0 END) AS INT) AS label"
            )
        return f"ROUND(SUM(CASE WHEN event_type = '{v.value or v.name}' THEN value ELSE 0.0 END), 2) AS label"

    def build_dataset_sql(self, split: str) -> str:
        """The dataset CTE chain (ref: model_bqml.sql:73-176 condensed
        onto the engine's event schema): per-user aggregates over the
        training window + deterministic 90/10 hash split
        (ref: model_bqml.sql:95-101) + class rebalancing via UNION ALL
        (ref: model_bqml.sql:305-311)."""
        ev_feats = self._feature_exprs()
        fp_feats = self._fp_feature_exprs()
        label = self._label_expr()
        label_from_fp = self._label_var().source == "first_party"
        ev_cols = ev_feats + ([] if label_from_fp else [label])
        fp_cols = fp_feats + ([label] if label_from_fp else [])
        if fp_cols and self.c.first_party_table is None:
            raise ValueError("first_party variables need first_party_table")
        sep = ",\n       "
        ev_where = ""
        if self.c.as_of_date:
            # training window ends exclusion_days before the snapshot so
            # labels have matured; scoring looks back predictive_days
            # (ref: shared.py Timespan, model_bqml.sql:91-94)
            ts = self.c.timespans
            if split == "all":
                days, back = ts.predictive_days, 0
            else:
                days, back = ts.training_days, ts.exclusion_days
            end = f"DATE_SUB(DATE '{self.c.as_of_date}', {back})"
            ev_where = (
                f"  WHERE DATE(ts) BETWEEN DATE_SUB({end}, {days}) AND {end}\n"
            )

        def _ev_cte(name: str) -> str:
            return f"""{name} AS (
  SELECT {self.c.unique_id} AS unique_id,
       {sep.join(ev_cols)}
  FROM {self.c.events_table}
{ev_where}  GROUP BY {self.c.unique_id}
)"""

        def _fp_cte(name: str) -> str:
            return f"""{name} AS (
  SELECT {self.c.unique_id} AS unique_id,
       {sep.join(fp_cols)}
  FROM {self.c.first_party_table}
)"""

        if not fp_cols:
            # events-only: the classic per-user aggregate
            base = f"WITH {_ev_cte('per_user')}"
        elif not ev_cols:
            # first-party only (ref: model_bqml.sql:210-211)
            base = f"WITH {_fp_cte('per_user')}"
        else:
            # mixed: first-party columns joined to event aggregates on
            # the unique id (ref: model_bqml.sql:201-208)
            ev_names = ", ".join("ev." + e.split(" AS ")[-1] for e in ev_cols)
            base = f"""WITH {_ev_cte('ev')},
{_fp_cte('fp')},
per_user AS (
  SELECT fp.*, {ev_names}
  FROM fp JOIN ev USING (unique_id)
)"""
        split_pred = {
            "train": "(unique_id * 9973 + 7) % 100 < 90",
            "calibrate": "(unique_id * 9973 + 7) % 100 >= 90",
            "all": "1 = 1",
        }[split]
        if split == "train" and self.c.is_classification and self.c.class_imbalance:
            return f"""{base}
SELECT * FROM per_user WHERE {split_pred} AND label = 1
UNION ALL
SELECT * FROM per_user WHERE {split_pred} AND label = 0
  AND (unique_id * 9973 + 7) % {self.c.class_imbalance} = 0"""
        return f"{base}\nSELECT * FROM per_user WHERE {split_pred}"

    def conversion_values_sql(self, predictions_view: str) -> str:
        """NTILE segment table with LAG/LEAD boundary midpoints
        (ref: model_bqml.sql:30-49)."""
        n = self.c.conversion_rate_segments
        return f"""WITH ranked AS (
  SELECT probability, unique_id,
         NTILE({n}) OVER (ORDER BY probability ASC, unique_id ASC) AS segment
  FROM {predictions_view}
), agg AS (
  SELECT segment, MIN(probability) AS mn, MAX(probability) AS mx,
         ROUND(AVG(label), 6) AS conversion_rate
  FROM (SELECT r.*, p.label FROM ranked r JOIN {predictions_view} p USING (unique_id, probability))
  GROUP BY segment
)
SELECT segment AS normalized_probability, conversion_rate AS value,
       COALESCE((LAG(mx) OVER (ORDER BY segment) + mn) / 2, 0.0) AS probability_range_start,
       COALESCE((LEAD(mn) OVER (ORDER BY segment) + mx) / 2, 1.0) AS probability_range_end
FROM agg"""

    def output_sql(self, predictions_view: str, cv_view: str) -> str:
        """probability -> conversion value via the range join
        (ref: output.sql:36-55), then the destination shape: MP event
        rows (ref: output.sql:92-102) or Ads click conversions with the
        first-touch gclid + RFC-3339 datetime (ref: output.sql:104-133)."""
        if self.c.is_classification:
            scored = f"""SELECT p.unique_id AS client_id,
       'prob_{self.c.name}' AS event_name,
       ROUND(p.probability, 6) AS score,
       cv.normalized_probability AS normalized_score,
       ROUND(cv.value, 6) AS value
FROM {predictions_view} p
JOIN {cv_view} cv
  ON p.probability >= cv.probability_range_start
 AND p.probability <= cv.probability_range_end"""
        else:
            # regression: predicted value clamped at 0, doubled as
            # value/revenue, no conversion-values join
            # (ref: output.sql:57-67)
            scored = f"""SELECT p.unique_id AS client_id,
       'prob_{self.c.name}' AS event_name,
       IF(p.predicted_value > 0, ROUND(p.predicted_value, 4), 0.0) AS value,
       IF(p.predicted_value > 0, ROUND(p.predicted_value, 4), 0.0) AS revenue
FROM {predictions_view} p"""
        if self.c.destination != "GOOGLE_ADS_OFFLINE_CONVERSION":
            # don't re-score users who already carry the score event
            # (ref: output.sql:70-90 users_with_score / users_without_score)
            return f"""WITH scored AS (
{scored}
)
SELECT s.* FROM scored s
WHERE NOT EXISTS (
  SELECT 1 FROM {self.c.events_table} e
  WHERE e.{self.c.unique_id} = s.client_id
    AND e.event_type = 'prob_{self.c.name}'
)"""
        # latest non-empty gclid per user (ref: output.sql:105-124:
        # ROW_NUMBER DESC, row_num = 1) + FORMAT_TIMESTAMP("%F %T%Ez")
        return f"""WITH scored AS (
{scored}
), gclids AS (
  SELECT unique_id, gclid, datetime FROM (
    SELECT {self.c.unique_id} AS unique_id,
           get_json_object(props, '$.gclid') AS gclid,
           date_format(ts, 'yyyy-MM-dd HH:mm:ssxxx') AS datetime,
           ROW_NUMBER() OVER (PARTITION BY {self.c.unique_id}
                              ORDER BY ts DESC, event_id DESC) AS row_num
    FROM {self.c.events_table}
    WHERE COALESCE(get_json_object(props, '$.gclid'), '') != ''
  ) WHERE row_num = 1
)
SELECT s.*, g.gclid, g.datetime
FROM scored s
JOIN gclids g ON s.client_id = g.unique_id"""

    # -- pipelines --------------------------------------------------------

    def _t(self, suffix: str) -> str:
        return f"{self.c.dataset}.{self.c.name}_{suffix}"

    def build_training_pipeline(self) -> tuple[Pipeline, str]:
        """-> (pipeline, cron). Quarterly schedule like the reference
        (ref: templates/training_pipeline.json:1-52)."""
        c = self.c
        jobs = [
            JobSpec(
                name="build_training_dataset",
                worker_class="SparkQueryLauncher",
                params=[
                    {"name": "query", "type": "sql", "value": self.build_dataset_sql("train")},
                    {"name": "destination_table", "type": "string", "value": self._t("training")},
                    {"name": "overwrite", "type": "boolean", "value": "1"},
                ],
            ),
            JobSpec(
                name="train_model",
                worker_class="MLTrainer",
                params=[
                    {"name": "source_table", "type": "string", "value": self._t("training")},
                    {"name": "model_name", "type": "string", "value": c.name},
                    {"name": "model_type", "type": "string", "value": c.model_type},
                    {"name": "label_col", "type": "string", "value": "label"},
                    {
                        "name": "feature_cols",
                        "type": "string_list",
                        "value": "\n".join(
                            f"f_{v.name}" for v in c.vars_with_role("FEATURE")
                        ),
                    },
                ],
                start_conditions=[StartCondition("build_training_dataset")],
            ),
        ]
        if c.is_classification:
            jobs += [
                JobSpec(
                    name="build_calibration_dataset",
                    worker_class="SparkQueryLauncher",
                    params=[
                        {"name": "query", "type": "sql", "value": self.build_dataset_sql("calibrate")},
                        {"name": "destination_table", "type": "string", "value": self._t("calibration")},
                        {"name": "overwrite", "type": "boolean", "value": "1"},
                    ],
                    start_conditions=[StartCondition("train_model")],
                ),
                JobSpec(
                    name="score_calibration",
                    worker_class="MLPredictor",
                    params=[
                        {"name": "source_table", "type": "string", "value": self._t("calibration")},
                        {"name": "model_name", "type": "string", "value": c.name},
                        {"name": "model_type", "type": "string", "value": c.model_type},
                        {"name": "destination_table", "type": "string", "value": self._t("calibration_scored")},
                    ],
                    start_conditions=[StartCondition("build_calibration_dataset")],
                ),
                JobSpec(
                    name="conversion_values",
                    worker_class="ConversionValuesWorker",
                    params=[
                        {"name": "predictions_table", "type": "string", "value": self._t("calibration_scored")},
                        {"name": "destination_table", "type": "string", "value": self._t("conversion_values")},
                        {"name": "sql", "type": "sql", "value": self.conversion_values_sql("__predictions__")},
                    ],
                    start_conditions=[StartCondition("score_calibration")],
                ),
            ]
        # quarterly months anchored like the reference (compiler.py:368-379)
        cron = "0 0 1 1,4,7,10 *"
        return Pipeline(f"{c.name} - Training", jobs), cron

    def build_predictive_pipeline(self) -> tuple[Pipeline, str]:
        """-> (pipeline, cron '0 0 * * *')
        (ref: templates/predictive_pipeline.json:1-147)."""
        c = self.c
        jobs = [
            JobSpec(
                name="build_scoring_dataset",
                worker_class="SparkQueryLauncher",
                params=[
                    {"name": "query", "type": "sql", "value": self.build_dataset_sql("all")},
                    {"name": "destination_table", "type": "string", "value": self._t("scoring")},
                    {"name": "overwrite", "type": "boolean", "value": "1"},
                ],
            ),
            JobSpec(
                name="predict",
                worker_class="MLPredictor",
                params=[
                    {"name": "source_table", "type": "string", "value": self._t("scoring")},
                    {"name": "model_name", "type": "string", "value": c.name},
                    {"name": "model_type", "type": "string", "value": c.model_type},
                    {"name": "destination_table", "type": "string", "value": self._t("predictions")},
                ],
                start_conditions=[StartCondition("build_scoring_dataset")],
            ),
            JobSpec(
                name="output",
                worker_class="OutputWorker",
                params=[
                    {"name": "predictions_table", "type": "string", "value": self._t("predictions")},
                    {"name": "conversion_values_table", "type": "string", "value": self._t("conversion_values")},
                    {"name": "destination_table", "type": "string", "value": self._t("output")},
                    {"name": "sql", "type": "sql", "value": self.output_sql("__predictions__", "__cv__")},
                ],
                start_conditions=[StartCondition("predict")],
            ),
            self._upload_job(),
        ]
        return Pipeline(f"{c.name} - Predictive", jobs), "0 0 * * *"

    def _upload_job(self) -> JobSpec:
        """Destination-specific upload step (ref:
        predictive_pipeline.json:55-140 branches on the destination)."""
        c = self.c
        if c.destination == "GOOGLE_ADS_OFFLINE_CONVERSION":
            customer = c.output_parameters.get("customer_id", "")
            action = c.output_parameters.get("conversion_action_id", "")
            return JobSpec(
                name="upload",
                worker_class="BQToAdsOfflineClickConversion",
                params=[
                    {"name": "source_table", "type": "string", "value": self._t("output")},
                    {
                        # ref: templates/google_ads_offline_conversion.json
                        "name": "template",
                        "type": "text",
                        "value": (
                            '{"conversionEnvironment": "WEB", '
                            '"gclid": "$gclid", '
                            f'"conversionAction": "customers/{customer}'
                            f'/conversionActions/{action}", '
                            '"conversionDateTime": "$datetime", '
                            '"conversionValue": $value, '
                            '"currencyCode": "USD"}'
                        ),
                    },
                    {"name": "customer_id", "type": "string", "value": customer},
                ],
                start_conditions=[StartCondition("output")],
            )
        # classification sends score + normalized score, regression
        # sends revenue (ref: google_analytics_mp_event.json:14-21)
        metric_fields = (
            '"value": $value, "score": $score, "nscore": $normalized_score'
            if c.is_classification
            else '"value": $value, "revenue": $revenue'
        )
        return JobSpec(
            name="upload",
            worker_class="BQToMeasurementProtocolGA4",
            params=[
                {"name": "source_table", "type": "string", "value": self._t("output")},
                {
                    "name": "template",
                    "type": "text",
                    "value": (
                        '{"client_id": "$client_id", "events": '
                        '[{"name": "$event_name", "params": '
                        "{" + metric_fields + "}}]}"
                    ),
                },
                {"name": "mp_batch_size", "type": "number", "value": "20"},
            ],
            start_conditions=[StartCondition("output")],
        )
