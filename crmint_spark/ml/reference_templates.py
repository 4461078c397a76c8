"""Render the reference's BQML SQL templates verbatim for parity runs.

The reference compiler renders ``model_bqml.sql`` / ``output.sql`` with
Jinja2 (``comment_start_string='--'`` so SQL comments are template
comments, trim/lstrip blocks, StrictUndefined; ref: backend/controller/
ml_model/compiler.py:331-342) over a context assembled in
``Compiler._compile_template`` (ref: compiler.py:268-330). This module
reproduces that *render contract* — options, context shape, the
``is_number``/``is_bool`` helpers and the feature ``description`` /
``comparison_method`` expansion (ref: compiler.py:166-178) — so the
template FILES from the read-only reference checkout render exactly as
the reference renders them, and the resulting SQL is executed unmodified
by ``SparkSQLExecutor``.

The template text itself is read from the reference checkout at runtime
(``CRMINT_REFERENCE_DIR``, default ``/root/reference``) — it is the
artifact under test, not part of this engine."""

from __future__ import annotations

import os
import re
from types import SimpleNamespace

_REF_DIR_ENV = "CRMINT_REFERENCE_DIR"
_DEFAULT_REF_DIR = "/root/reference"
_TEMPLATE_SUBDIR = "backend/controller/ml_model/templates"

_COMPARISONS = (
    "EQUAL",
    "NOT_EQUAL",
    "GREATER",
    "GREATER_OR_EQUAL",
    "LESS",
    "LESS_OR_EQUAL",
    "REGEX",
)


def reference_template_path(name: str) -> str:
    root = os.environ.get(_REF_DIR_ENV, _DEFAULT_REF_DIR)
    return os.path.join(root, _TEMPLATE_SUBDIR, name)


def reference_templates_available() -> bool:
    return os.path.isfile(reference_template_path("model_bqml.sql"))


def _is_number(value: str) -> bool:
    try:
        float(value)
        return True
    except (TypeError, ValueError):
        return False


def _is_bool(value: str) -> bool:
    return str(value).lower() in ("true", "false")


def _strip_special_chars(value: str) -> str:
    # ref: compiler.py:219-221
    return re.sub(r"\\[a-zA-Z]+|[^\w]", "", value)


def feature(name, key=None, comparison=None, value=None, value_type="string"):
    """One FEATURE variable as the template sees it
    (ref: compiler.py:166-178)."""
    f = SimpleNamespace(
        name=name, key=key, comparison=comparison, value=value, value_type=value_type
    )
    if comparison:
        f.comparison_method = SimpleNamespace(
            **{c.lower(): comparison == c for c in _COMPARISONS}
        )
        f.description = (
            f"{name}_{key}_{comparison.lower()}_{_strip_special_chars(value).lower()}"
        )
    return f


def variable(name, key=None, value_type="string"):
    return SimpleNamespace(name=name, key=key, value_type=value_type)


def ga4_classification_context(
    *,
    step: str,
    project: str = "crmint",
    dataset: str = "models",
    ga_project: str = "ga",
    ga_dataset: str = "analytics",
    timespan_start: int = 3650,
    timespan_end: int = 0,
    class_imbalance: int = 4,
    conversion_rate_segments: int = 10,
    average_conversion_value: float = 123.4567,
    destination: str = "GOOGLE_ANALYTICS_MP_EVENT",
) -> dict:
    """The render context for the fixture model: classification over the
    GA4 source, label = ``purchase``/``value`` (int), three features
    exercising the plain-count / string-EQUAL / numeric-GREATER template
    branches, unique id = ``user_id``, no first-party source."""
    label = variable("purchase", key="value", value_type="int")
    google_analytics = SimpleNamespace(
        in_source=True,
        project=ga_project,
        dataset=ga_dataset,
        unique_id=SimpleNamespace(name="user_id"),
        features=[
            feature("page_view"),
            feature("signup", key="plan", comparison="EQUAL", value="pro",
                    value_type="string"),
            feature("error", key="severity", comparison="GREATER", value="2",
                    value_type="int"),
        ],
        label=label,
        first_value=None,
        trigger_event=None,
        # ref: compiler.py:193-202 — falls back to the label variable
        trigger_date=label,
    )
    first_party = SimpleNamespace(
        in_source=False,
        project=None,
        dataset=None,
        table=None,
        unique_id=SimpleNamespace(name="unique_id"),
        features=[],
        label=None,
        first_value=None,
        trigger_event=None,
        trigger_date=None,
        gclid=None,
    )
    return {
        "step": SimpleNamespace(
            is_training=step == "training",
            is_predicting=step == "predicting",
            is_calculating_conversion_values=step == "conversion_values",
        ),
        "project": project,
        "dataset": dataset,
        "type": SimpleNamespace(
            name="LOGISTIC_REG", is_regression=False, is_classification=True
        ),
        "hyper_parameters": [SimpleNamespace(name="MAX_ITERATIONS", value="5")],
        "timespan": SimpleNamespace(start=timespan_start, end=timespan_end),
        "unique_id": SimpleNamespace(is_client_id=False, is_user_id=True),
        "first_party": first_party,
        "google_analytics": google_analytics,
        "conversion_rate_segments": conversion_rate_segments,
        "class_imbalance": class_imbalance,
        "output": SimpleNamespace(
            destination=SimpleNamespace(
                is_google_analytics_mp_event=destination
                == "GOOGLE_ANALYTICS_MP_EVENT",
                is_google_ads_offline_conversion=destination
                == "GOOGLE_ADS_OFFLINE_CONVERSION",
            ),
            parameters=SimpleNamespace(
                average_conversion_value=average_conversion_value
            ),
        ),
    }


def render_reference_template(template_name: str, context: dict) -> str:
    """Render a reference template file with the reference's exact Jinja
    configuration (ref: compiler.py:331-342)."""
    import jinja2

    with open(reference_template_path(template_name)) as f:
        source = f.read()
    template = jinja2.Template(
        source,
        comment_start_string="--",
        comment_end_string="\n",
        trim_blocks=True,
        lstrip_blocks=True,
        newline_sequence="\n",
        undefined=jinja2.StrictUndefined,
    )
    return template.render(is_number=_is_number, is_bool=_is_bool, **context)
