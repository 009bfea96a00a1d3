"""Typed scalar values ("Datum") — serde + comparison normalization.

Spark-first counterpart of the reference's Datum (spec/values/datum.rs:58): a
primitive value paired with its Iceberg type, able to round-trip through JSON
(used in our Parquet manifests for per-column lower/upper bounds and partition
values) and to normalize into an orderable Python value for pruning.

Canonical comparable forms:
  date        -> int days since 1970-01-01
  time        -> int micros since midnight
  timestamp*  -> int micros since epoch (ns types truncate to micros)
  decimal     -> decimal.Decimal
  binary/fixed-> bytes
  others      -> native python
"""

from __future__ import annotations

import base64
import datetime as dt
from decimal import Decimal
from typing import Any, Optional

from .types import IcebergType, PrimitiveType

EPOCH_DATE = dt.date(1970, 1, 1)
EPOCH_TS = dt.datetime(1970, 1, 1)


def days_from_date(d: dt.date) -> int:
    return (d - EPOCH_DATE).days


def date_from_days(days: int) -> dt.date:
    return EPOCH_DATE + dt.timedelta(days=days)


def micros_from_ts(ts: dt.datetime) -> int:
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    delta = ts - EPOCH_TS
    return (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds


def ts_from_micros(us: int) -> dt.datetime:
    return EPOCH_TS + dt.timedelta(microseconds=us)


def to_comparable(value: Any, ice_type: Optional[IcebergType] = None) -> Any:
    """Normalize a python value into a totally-orderable form for pruning."""
    if value is None:
        return None
    if isinstance(value, dt.datetime):  # check before date: datetime is a date
        return micros_from_ts(value)
    if isinstance(value, dt.date):
        return days_from_date(value)
    if isinstance(value, Decimal):
        return value
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    return value


def ser_value(value: Any, ice_type: Optional[IcebergType] = None) -> Any:
    """JSON-safe encoding, type-tagged only where ambiguous."""
    if value is None:
        return None
    if isinstance(value, dt.datetime):
        return {"t": "ts", "v": micros_from_ts(value)}
    if isinstance(value, dt.date):
        return {"t": "date", "v": days_from_date(value)}
    if isinstance(value, Decimal):
        return {"t": "dec", "v": str(value)}
    if isinstance(value, (bytes, bytearray)):
        return {"t": "bin", "v": base64.b64encode(bytes(value)).decode("ascii")}
    if isinstance(value, float) and (value != value):  # NaN
        return {"t": "f", "v": "nan"}
    if isinstance(value, float) and value in (float("inf"), float("-inf")):
        return {"t": "f", "v": "inf" if value > 0 else "-inf"}
    return value


def de_value(j: Any) -> Any:
    if isinstance(j, dict) and "t" in j:
        t, v = j["t"], j["v"]
        if t == "ts":
            return ts_from_micros(v)
        if t == "date":
            return date_from_days(v)
        if t == "dec":
            return Decimal(v)
        if t == "bin":
            return base64.b64decode(v)
        if t == "f":
            return float(v.replace("inf", "inf")) if "inf" in v else float("nan")
    return j
