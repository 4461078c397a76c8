"""Parameter templating: Jinja2 rendering with context layering, legacy
syntax upgrade, the inline function library, and the worker param type
system.

Reference behavior reproduced:
- Jinja2 with StrictUndefined, global -> pipeline -> job context layering
  (ref: backend/controller/models.py:159-192, 1089-1098).
- Legacy syntax upgrade ``{% VAR %}`` / ``%(var)`` -> ``{{ var }}``
  (ref: models.py:1055-1070).
- Inline functions today/days_ago/hours_ago/days_since and
  ``bigquery(table, field)`` = first-row lookup with a session cache
  (ref: backend/controller/inline.py:33-89).
- Param ``worker_value`` coercion: boolean ('1'), number (int then
  float), string_list/number_list (newline-separated), sql/text/string
  raw (ref: models.py:43-58, 1100-1114).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from typing import Any

import jinja2


def upgrade_legacy_syntax(value: str) -> str:
    """``{% VAR %}`` and ``%(var)`` -> ``{{ var }}``."""
    out = re.sub(r"\{%\s*([A-Za-z_]\w*)\s*%\}", r"{{ \1 }}", value)
    out = re.sub(r"%\(([A-Za-z_]\w*)\)", r"{{ \1 }}", out)
    return out


class InlineFunctions:
    """The inline function library available inside param templates."""

    def __init__(self, spark=None, now: datetime | None = None):
        self._spark = spark
        self._now = now or datetime.now()
        self._bq_cache: dict[str, Any] = {}

    def today(self, fmt: str = "%Y-%m-%d") -> str:
        return self._now.strftime(fmt)

    def days_ago(self, n_days: int, fmt: str = "%Y-%m-%d") -> str:
        return (self._now - timedelta(days=n_days)).strftime(fmt)

    def hours_ago(self, n_hours: int, fmt: str = "%Y-%m-%d %H:%M:%S") -> str:
        return (self._now - timedelta(hours=n_hours)).strftime(fmt)

    def days_since(self, date_str: str, fmt: str = "%Y-%m-%d") -> int:
        return (self._now - datetime.strptime(date_str, fmt)).days

    def bigquery(self, table_id: str, field_name: str) -> str:
        """First-row field lookup with session-scoped cache. Error
        parity with the reference (inline.py:51-80): missing table,
        empty table, and unknown field all raise ValueError so a config
        typo fails the job loudly instead of rendering ''."""
        key = f"{table_id}"
        if key not in self._bq_cache:
            if self._spark is None:
                raise RuntimeError("no SparkSession bound for bigquery() inline")
            from .catalog import _safe_view_name

            try:
                rows = self._spark.table(_safe_view_name(table_id)).limit(1).collect()
            except Exception as e:
                raise ValueError(f"BigQuery table `{table_id}` not found") from e
            if not rows:
                raise ValueError(f"BigQuery table `{table_id}` is empty")
            self._bq_cache[key] = rows[0].asDict()
        if field_name not in self._bq_cache[key]:
            raise ValueError(
                f"No field '{field_name}' in BigQuery table `{table_id}`"
            )
        value = self._bq_cache[key][field_name]
        if isinstance(value, list):
            return "\n".join(str(v) for v in value)
        return "" if value is None else str(value)

    def context(self) -> dict[str, Any]:
        return {
            "today": self.today,
            "days_ago": self.days_ago,
            "hours_ago": self.hours_ago,
            "days_since": self.days_since,
            "bigquery": self.bigquery,
        }


def render(
    template: str,
    context: dict[str, Any],
    functions: InlineFunctions | None = None,
) -> str:
    """Render one param value with StrictUndefined semantics."""
    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    ctx = dict((functions or InlineFunctions()).context())
    ctx.update(context)
    return env.from_string(upgrade_legacy_syntax(template)).render(**ctx)


def layer_contexts(*levels: dict[str, Any]) -> dict[str, Any]:
    """global -> pipeline -> job layering: later levels shadow earlier."""
    out: dict[str, Any] = {}
    for level in levels:
        out.update(level or {})
    return out


def parse_number(value: str) -> int | float:
    """Int-first numeric parse (ref: models.py:43-58)."""
    try:
        return int(value)
    except (TypeError, ValueError):
        return float(value)


def worker_value(ptype: str, rendered: str) -> Any:
    """Coerce a rendered param to the typed value handed to workers
    (ref: models.py:1100-1114)."""
    if ptype == "boolean":
        # reference uses '1'; imported JSON may carry true/True
        return str(rendered).strip().lower() in ("1", "true")
    if ptype == "number":
        return parse_number(rendered)
    if ptype == "string_list":
        # reference stores lists as newline-joined text (models.py:1106);
        # imported JSON may carry a real array — accept both
        if isinstance(rendered, list):
            return [str(v) for v in rendered]
        return [line for line in rendered.split("\n") if line]
    if ptype == "number_list":
        if isinstance(rendered, list):
            return [parse_number(str(v)) for v in rendered]
        return [parse_number(line) for line in rendered.split("\n") if line]
    return rendered  # sql / text / string raw
