"""Cron schedule matching — the reference's deliberately-restricted
subset: ``*`` and comma lists only; ``-`` ranges and ``/`` steps are
rejected (ref: backend/controller/cron_utils.py:27-81). Minute
resolution matching against a datetime."""

from __future__ import annotations

from datetime import datetime

FIELDS = ("minute", "hour", "day_of_month", "month", "day_of_week")
RANGES = {
    "minute": (0, 59),
    "hour": (0, 23),
    "day_of_month": (1, 31),
    "month": (1, 12),
    "day_of_week": (0, 6),  # 0 = Sunday
}


class CronValidationError(ValueError):
    pass


def parse_cron(expr: str) -> dict[str, set[int] | None]:
    """-> {field: allowed set or None for *}. Raises on ranges/steps
    (ref: cron_utils.py:27-53)."""
    parts = expr.split()
    if len(parts) != 5:
        raise CronValidationError(f"expected 5 fields, got {len(parts)}: {expr!r}")
    out: dict[str, set[int] | None] = {}
    for name, part in zip(FIELDS, parts):
        if part == "*":
            out[name] = None
            continue
        if "-" in part or "/" in part:
            raise CronValidationError(
                f"ranges/steps not supported in field {name}: {part!r}"
            )
        lo, hi = RANGES[name]
        values = set()
        for tok in part.split(","):
            if not tok.isdigit():
                raise CronValidationError(f"bad token {tok!r} in {name}")
            v = int(tok)
            if not (lo <= v <= hi):
                raise CronValidationError(f"{v} out of range for {name}")
            values.add(v)
        out[name] = values
    return out


def cron_matches(expr: str, when: datetime) -> bool:
    """Minute-resolution match. ALL five fields must match — including
    day-of-month AND day-of-week when both are restricted
    (ref: cron_utils.py:65-72 ``all(conditions)``). This deliberately
    diverges from vixie-cron's dom/dow OR rule to keep schedule parity
    with the reference: a pipeline scheduled ``0 0 1 * 1`` there fires
    only on Mondays that are also the 1st."""
    spec = parse_cron(expr)
    # python weekday(): Monday=0 ... Sunday=6; cron: Sunday=0
    # (ref: cron_utils.py:64 isoweekday with 7 -> 0)
    dow = (when.weekday() + 1) % 7
    checks = {
        "minute": when.minute,
        "hour": when.hour,
        "day_of_month": when.day,
        "month": when.month,
        "day_of_week": dow,
    }
    return all(
        spec[name] is None or actual in spec[name]
        for name, actual in checks.items()
    )


def due_pipelines(
    schedules: dict[str, list[str]], when: datetime
) -> list[str]:
    """Names of pipelines with any matching cron — the scheduled-start
    sweep (ref: backend/controller/starter/views.py:34-80)."""
    return [
        name
        for name, crons in schedules.items()
        if any(cron_matches(c, when) for c in crons)
    ]
