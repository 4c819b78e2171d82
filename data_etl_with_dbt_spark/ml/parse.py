"""Inference-request parameter parsing (reference ``Application.py:28-131``
— SURVEY.md §2.9 F9/F10, §2.2 P10): free-text regex extraction with
positional mapping and defaults, JSON object parsing with required-key
validation, and the input-validity predicate.

These run per-request in the reference (single row), so plain Python is the
honest implementation; ``nl_params_expr`` shows the column-expression form
for scoring a whole DataFrame of requests without leaving the JVM.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Positional feature defaults (Application.py:46-65).
DEFAULTS = {
    "trip_distance": 5.0,
    "passenger_count": 1,
    "trip_duration_minutes": 15.0,
    "avg_speed_mph": None,  # inferred from distance/duration when absent
    "rate_code_id": 1,
    "payment_type": 1,
}

_NUMBER = re.compile(r"\d+(?:\.\d+)?")

REQUIRED_KEYS = list(DEFAULTS)


def parse_nl_trip(text: str) -> dict:
    """Pull up to 6 numbers from free text, map positionally to features
    (distance, passengers, duration, speed, rate code, payment type), fill
    defaults, infer speed = distance / (duration/60) when absent
    (Application.py:28-75)."""
    nums = [float(x) for x in _NUMBER.findall(text or "")]
    out = dict(DEFAULTS)
    keys = REQUIRED_KEYS
    for i, v in enumerate(nums[: len(keys)]):
        out[keys[i]] = v
    if out["avg_speed_mph"] is None:
        dur_h = float(out["trip_duration_minutes"]) / 60.0
        out["avg_speed_mph"] = float(out["trip_distance"]) / dur_h if dur_h > 0 else 0.0
    out["passenger_count"] = int(out["passenger_count"])
    out["rate_code_id"] = int(out["rate_code_id"])
    out["payment_type"] = int(out["payment_type"])
    return out


def parse_json_params(payload: str) -> dict:
    """JSON parameter object with missing/empty keys filled from the NL
    parse of the SAME raw string, then defaults (Application.py:104-116 —
    deliberately reference-faithful: the reference's fallback regex-scans
    the raw JSON text, so a partial object's numeric VALUES map
    positionally onto the missing features; quirky, but it is the
    documented contract this port mirrors, pinned by test). JSON values of
    None/"" count as missing, like the reference's ``data[k] in (None,
    "")`` check. Raises ValueError on invalid inputs (non-positive
    distance/duration, Application.py:130-131)."""
    try:
        obj = json.loads(payload)
        if not isinstance(obj, dict):
            raise ValueError("expected a JSON object")
    except (json.JSONDecodeError, TypeError):
        # TypeError: a None payload — the reference's catch-everything
        # JSON step falls back to the NL parse the same way
        obj = {}
    base = parse_nl_trip(payload)
    out = {
        k: obj[k] if obj.get(k) not in (None, "") else base[k]
        for k in REQUIRED_KEYS
    }
    if float(out["trip_distance"]) <= 0 or float(out["trip_duration_minutes"]) <= 0:
        raise ValueError("trip_distance and trip_duration_minutes must be positive")
    return out


def nl_params_expr(text_col: Column) -> Column:
    """Column-expression form of :func:`parse_nl_trip` for batch scoring:
    regexp_extract_all → positional element_at + coalesce defaults. Stays in
    the JVM — use this shape when requests arrive as a DataFrame."""
    nums = F.transform(
        F.regexp_extract_all(text_col, F.lit(r"\d+(?:\.\d+)?"), 0),
        lambda x: x.cast("double"),
    )
    def nth(i: int, default):
        return F.coalesce(F.element_at(nums, i), F.lit(default))

    dist = nth(1, DEFAULTS["trip_distance"])
    dur = nth(3, DEFAULTS["trip_duration_minutes"])
    speed = F.coalesce(
        F.element_at(nums, 4),
        F.when(dur > 0, dist / (dur / 60.0)).otherwise(F.lit(0.0)),
    )
    return F.struct(
        dist.alias("trip_distance"),
        nth(2, DEFAULTS["passenger_count"]).cast("int").alias("passenger_count"),
        dur.alias("trip_duration_minutes"),
        speed.alias("avg_speed_mph"),
        nth(5, DEFAULTS["rate_code_id"]).cast("int").alias("rate_code_id"),
        nth(6, DEFAULTS["payment_type"]).cast("int").alias("payment_type"),
    )
