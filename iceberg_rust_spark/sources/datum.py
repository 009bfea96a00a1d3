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


def coerce_literal(value: Any, ice_type: Optional[IcebergType] = None) -> Any:
    """Bind-time literal coercion + type-check, mirroring the reference's
    typed Datum construction (spec/values/datum.rs:58 — ``Datum`` pairs a
    value with its Iceberg type and parses ISO strings for temporal types).

    Accepts the natural python literal for each primitive type plus the
    spec's string spellings (``'1998-09-02'`` for a date column, etc.), so
    predicates written with plain strings prune and filter identically to
    ones written with ``datetime`` objects. Raises TypeError for literals
    that cannot represent a value of the column's type — failing at bind
    beats failing deep inside transform projection."""
    if value is None or ice_type is None \
            or not isinstance(ice_type, PrimitiveType):
        return value
    t = ice_type.name
    try:
        if t == "date":
            if isinstance(value, dt.datetime):
                if value.time() != dt.time(0, 0):
                    raise TypeError(
                        f"non-midnight timestamp {value!r} is not a date")
                return value.date()
            if isinstance(value, dt.date):
                return value
            if isinstance(value, str):
                return dt.date.fromisoformat(value)
        elif t.startswith("timestamp"):
            if isinstance(value, dt.datetime):
                return value
            if isinstance(value, dt.date):
                return dt.datetime.combine(value, dt.time(0, 0))
            if isinstance(value, str):
                return dt.datetime.fromisoformat(
                    value.replace("Z", "+00:00"))
        elif t == "time":
            if isinstance(value, dt.time):
                return value
            if isinstance(value, str):
                return dt.time.fromisoformat(value)
        elif t in ("int", "long"):
            if isinstance(value, bool):
                raise TypeError(f"boolean literal for {t} column")
            if isinstance(value, int):
                return value
            if isinstance(value, float):
                # integral floats normalize; fractional ones stay float —
                # still orderable against int bounds (col > 5.5 is a valid
                # range predicate on a long column)
                return int(value) if value == int(value) else value
            if isinstance(value, str):
                return int(value)
        elif t in ("float", "double"):
            if isinstance(value, bool):
                raise TypeError(f"boolean literal for {t} column")
            if isinstance(value, (int, float)):
                return value
            if isinstance(value, str):
                return float(value)
        elif t.startswith("decimal"):
            if isinstance(value, Decimal):
                return value
            if isinstance(value, (int, str)):
                return Decimal(value)
            if isinstance(value, float):
                return Decimal(str(value))
        elif t == "boolean":
            if isinstance(value, bool):
                return value
            if isinstance(value, str) and value.lower() in ("true", "false"):
                return value.lower() == "true"
        elif t == "string":
            # no numeric->string coercion: "5" orders lexicographically,
            # which silently diverges from Spark's cast-to-numeric compare
            if isinstance(value, str):
                return value
        else:  # uuid / binary / fixed / unknown primitives: pass through
            return value
    except (ValueError, ArithmeticError) as e:
        raise TypeError(
            f"cannot bind literal {value!r} to {t} column: {e}") from None
    raise TypeError(f"cannot bind literal {value!r} ({type(value).__name__}) "
                    f"to {t} column")


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


def ser_scalar(value: Any) -> Optional[str]:
    """Single-character-tagged string encoding of a bounds/partition scalar
    for the v2 columnar manifest layout (map<string,string> cells). The
    planner decodes one of these per (entry, referenced column), so the
    decode must be a prefix dispatch + one builtin parse — measured ~10x
    cheaper than the per-cell json.loads of the v1 layout. Tags:

      i int   f float (repr: shortest round-trip; covers nan/inf)
      s string   b bool   t timestamp (micros, tz->UTC naive like
      ser_value)   d date (days)   c decimal (str)   x binary (b64)

    None stays None (a null map item)."""
    if value is None:
        return None
    if isinstance(value, bool):           # before int: bool is an int
        return "b:1" if value else "b:0"
    if isinstance(value, int):
        return "i:%d" % value
    if isinstance(value, float):
        return "f:" + repr(value)
    if isinstance(value, str):
        return "s:" + value
    if isinstance(value, dt.datetime):    # before date: datetime is a date
        return "t:%d" % micros_from_ts(value)
    if isinstance(value, dt.date):
        return "d:%d" % days_from_date(value)
    if isinstance(value, Decimal):
        return "c:" + str(value)
    if isinstance(value, (bytes, bytearray)):
        return "x:" + base64.b64encode(bytes(value)).decode("ascii")
    raise TypeError(f"cannot encode manifest scalar {value!r} "
                    f"({type(value).__name__})")


def de_scalar(s: Optional[str]) -> Any:
    if s is None:
        return None
    tag = s[0]
    if tag == "i":
        return int(s[2:])
    if tag == "s":
        return s[2:]
    if tag == "f":
        return float(s[2:])
    if tag == "b":
        return s[2] == "1"
    if tag == "t":
        return ts_from_micros(int(s[2:]))
    if tag == "d":
        return date_from_days(int(s[2:]))
    if tag == "c":
        return Decimal(s[2:])
    if tag == "x":
        return base64.b64decode(s[2:])
    raise ValueError(f"bad manifest scalar encoding {s!r}")
