"""Scalar & aggregate function catalog.

The reference passes *any* ``name(args)`` through to ClickHouse by name with
no validation (open_cypher_parser/expression.rs:234-252, render
to_sql_query.rs:279-287). We keep the same pass-through posture Spark-side:
a curated map translates Cypher/ClickHouse spellings to
``pyspark.sql.functions`` builders, and unknown names fall back to
``F.call_function(name, ...)`` so every Spark SQL builtin works — the same
failure mode (runtime error on a truly unknown function) as the reference.

Aggregates are classified by name exactly like the reference's five
(logical_expr/mod.rs:253-268: count, min, max, avg, sum) plus Spark-native
extensions (collect, stddev, ...).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference's aggregate set (logical_expr/mod.rs:253-268) + extensions.
AGGREGATE_FNS = {
    "count", "min", "max", "avg", "sum",
    # extensions (not in the reference)
    "collect", "collect_list", "collect_set", "stddev", "stddev_pop",
    "stdev", "stdevp",  # Cypher spellings (stDev/stDevP)
    "variance", "var_pop", "percentilecont", "percentiledisc",
    "percentile_approx",
    "first", "last_agg", "any_value", "count_if", "median",
    # sketch / statistical aggregates (classified here so they group;
    # compiled via the call_function fallback — JVM-side, mergeable
    # partial aggregates, the 100 TB substitute for exact distincts)
    "approx_count_distinct", "approx_percentile", "percentile",
    "hll_sketch_agg", "hll_union_agg", "mode", "bool_and", "bool_or",
    "every", "some", "skewness", "kurtosis", "corr", "covar_pop",
    "covar_samp", "bit_and", "bit_or", "bit_xor", "max_by", "min_by",
}


def is_aggregate(name: str) -> bool:
    return name.lower() in AGGREGATE_FNS


def compile_aggregate(name: str, args: list[Column], distinct: bool) -> Column:
    n = name.lower()
    if n == "count":
        if not args:  # count(*) parsed as Star -> handled by caller as lit(1)
            return F.count(F.lit(1))
        if distinct:
            return F.count_distinct(*args)
        return F.count(args[0])
    if distinct and n == "sum":
        return F.sum_distinct(args[0])
    if distinct and n == "avg":
        # Spark has no avg_distinct builder; the ratio is exact.
        # try_divide: an all-NULL group has count_distinct = 0 and must
        # yield NULL, not an ANSI DIVIDE_BY_ZERO.
        return F.try_divide(
            F.sum_distinct(args[0]), F.count_distinct(args[0])
        )
    if distinct and n in ("collect", "collect_list", "collect_set"):
        return F.collect_set(args[0])
    if distinct and n not in ("min", "max"):  # min/max: DISTINCT is a no-op
        from ..errors import UnsupportedError

        raise UnsupportedError(
            f"DISTINCT is not supported for aggregate '{name}' "
            "(supported: count, sum, avg, min, max, collect)"
        )
    builders = {
        "min": F.min, "max": F.max, "avg": F.avg, "sum": F.sum,
        "collect": F.collect_list, "collect_list": F.collect_list,
        "collect_set": F.collect_set, "stddev": F.stddev,
        "stddev_pop": F.stddev_pop, "variance": F.variance,
        "var_pop": F.var_pop, "first": F.first, "any_value": F.any_value,
        "count_if": F.count_if, "median": F.median,
        "percentile_approx": lambda c: F.percentile_approx(c, 0.5),
        # Cypher aggregate spellings (r12): stDev is the SAMPLE
        # stddev, stDevP the population one (openCypher semantics)
        "stdev": F.stddev_samp, "stdevp": F.stddev_pop,
        # percentileCont = exact interpolated percentile (Spark's
        # `percentile`); percentileDisc = smallest actual value whose
        # cumulative fraction >= p, which is EXACTLY what
        # percentile_approx computes at maximum accuracy
        "percentilecont": lambda c, p: F.percentile(c, p),
        "percentiledisc": lambda c, p: F.percentile_approx(
            c, p, F.lit(2147483647)),
    }
    if n in builders:
        return builders[n](*args) if n != "percentile_approx" else builders[n](args[0])
    return F.call_function(n, *args)


def _substring(args: list[Column]) -> Column:
    # Cypher substring(s, start[, len]) is 0-based; Spark substring is 1-based.
    s, start = args[0], args[1]
    if len(args) >= 3:
        return s.substr(start + F.lit(1), args[2])
    return s.substr(start + F.lit(1), F.length(s))


# Cypher / ClickHouse spelling -> Column builder.
def _time_of_day(c: Column) -> Column:
    """Project a time-of-day string or timestamp column onto the
    epoch day (r13 TIME representation, compile/temporal.py): the
    HH:mm:ss.SSSSSS part re-anchored at 1970-01-01. Bare clock
    strings ('12:30', '12:30:05.1') anchor directly; anything else
    ('2024-05-01 12:30:05', a timestamp/date column) parses as a
    timestamp and keeps only its clock part."""
    s = c.cast("string")
    anchored = (F.when(s.rlike(r"^\d{1,2}:"),
                       F.concat(F.lit("1970-01-01 "), s))
                .otherwise(s))
    ts = F.to_timestamp_ntz(anchored)
    return F.to_timestamp_ntz(F.concat(
        F.lit("1970-01-01 "),
        F.date_format(ts, "HH:mm:ss.SSSSSS")))


def _time_now() -> Column:
    """Current statement-clock time-of-day on the epoch day."""
    return F.to_timestamp_ntz(F.concat(
        F.lit("1970-01-01 "),
        F.date_format(F.localtimestamp(), "HH:mm:ss.SSSSSS")))


def _slice_list(xs: Column, f: Column, t: Column) -> Column:
    """openCypher list slice ``xs[f..t]`` (r13): 0-based,
    end-exclusive, negative bounds count from the end, out-of-range
    bounds clamp to [0, size], NULL list or NULL bound -> NULL.
    Pure JVM ``F.slice`` — no UDF. Open ends arrive pre-encoded by
    the parser (from=0 / to=INT32-max) and clamp away here."""
    n = F.size(xs)

    def norm(b: Column) -> Column:
        b = b.cast("int")
        # explicit NULL branch: least/greatest IGNORE nulls, which
        # would silently turn a NULL bound into a clamped one
        return (F.when(b.isNull(), F.lit(None).cast("int"))
                .when(b < 0, F.greatest(n + b, F.lit(0)))
                .otherwise(F.least(b, n)))

    f2, t2 = norm(f), norm(t)
    d = t2 - f2
    # when() on a NULL d falls to otherwise -> NULL length -> NULL
    length = F.when(d < 0, F.lit(0)).otherwise(d)
    return F.slice(xs, f2 + F.lit(1), length)


SCALAR_FNS = {
    # string
    "toupper": lambda a: F.upper(a[0]),
    "upper": lambda a: F.upper(a[0]),
    "tolower": lambda a: F.lower(a[0]),
    "lower": lambda a: F.lower(a[0]),
    "length": lambda a: F.length(a[0]),
    "char_length": lambda a: F.length(a[0]),
    "size": lambda a: F.size(a[0]),
    "trim": lambda a: F.trim(a[0]),
    "ltrim": lambda a: F.ltrim(a[0]),
    "rtrim": lambda a: F.rtrim(a[0]),
    "reverse": lambda a: F.reverse(a[0]),
    "replace": lambda a: F.replace(a[0], a[1], a[2]),
    "split": lambda a: F.split(a[0], a[1]),
    "substring": _substring,
    "left": lambda a: a[0].substr(F.lit(1), a[1]),
    "right": lambda a: F.call_function("right", a[0], a[1]),
    "concat": lambda a: F.concat(*a),
    "concat_ws": lambda a: F.call_function("concat_ws", *a),
    # casts
    "tostring": lambda a: a[0].cast("string"),
    "tointeger": lambda a: a[0].cast("bigint"),
    "toint": lambda a: a[0].cast("bigint"),
    "tofloat": lambda a: a[0].cast("double"),
    "toboolean": lambda a: a[0].cast("boolean"),
    # numeric
    "abs": lambda a: F.abs(a[0]),
    "ceil": lambda a: F.ceil(a[0]),
    "ceiling": lambda a: F.ceil(a[0]),
    "floor": lambda a: F.floor(a[0]),
    "round": lambda a: F.round(*a),
    "sqrt": lambda a: F.sqrt(a[0]),
    "exp": lambda a: F.exp(a[0]),
    "log": lambda a: F.log(a[0]),
    "log10": lambda a: F.log10(a[0]),
    "sign": lambda a: F.signum(a[0]),
    "pow": lambda a: F.pow(a[0], a[1]),
    "power": lambda a: F.pow(a[0], a[1]),
    "pi": lambda a: F.lit(3.141592653589793),
    "rand": lambda a: F.rand(),
    "randomuuid": lambda a: F.call_function("uuid"),
    # null handling / conditionals
    "coalesce": lambda a: F.coalesce(*a),
    "nullif": lambda a: F.nullif(a[0], a[1]),
    "ifnull": lambda a: F.coalesce(a[0], a[1]),
    # lists
    # try_element_at: head/last of an EMPTY list is NULL in Cypher,
    # not Spark-ANSI's INVALID_ARRAY_INDEX error (r13)
    "head": lambda a: F.try_element_at(a[0], F.lit(1)),
    "last": lambda a: F.try_element_at(a[0], F.lit(-1)),
    "tail": lambda a: F.slice(
        a[0], 2, F.greatest(F.size(a[0]) - 1, F.lit(0))),
    "range": lambda a: F.sequence(*a),
    # 0-based [i]; negative = from the end; oob -> NULL (the primary
    # path is the AST-aware special case in expressions._fn_call)
    "__index": lambda a: F.try_element_at(
        a[0], F.when(a[1].cast("int") < 0, a[1].cast("int"))
        .otherwise(a[1].cast("int") + 1)),
    "__slice": lambda a: _slice_list(*a),  # xs[f..t], r13
    # temporal (ClickHouse-ish spellings)
    "toyear": lambda a: F.year(a[0]),
    "year": lambda a: F.year(a[0]),
    "month": lambda a: F.month(a[0]),
    "day": lambda a: F.dayofmonth(a[0]),
    "todate": lambda a: a[0].cast("date"),
    # openCypher temporal constructors (r10; duration()/`x.truncate`
    # are AST-level special cases in ExprCompiler._fn_call). The
    # engine is zone-naive (see compile/temporal.py), so datetime and
    # localdatetime coincide on TIMESTAMP_NTZ.
    "date": lambda a: F.to_date(a[0]) if a else F.current_date(),
    "datetime": lambda a: (F.to_timestamp_ntz(a[0]) if a
                           else F.localtimestamp()),
    "localdatetime": lambda a: (F.to_timestamp_ntz(a[0]) if a
                                else F.localtimestamp()),
    # openCypher clock variants (r12): the engine evaluates a whole
    # statement against one snapshot, so statement/transaction/
    # realtime clocks coincide (Spark's localtimestamp/current_date
    # are already fixed per query)
    "datetime.statement": lambda a: F.localtimestamp(),
    "datetime.transaction": lambda a: F.localtimestamp(),
    "datetime.realtime": lambda a: F.localtimestamp(),
    "localdatetime.statement": lambda a: F.localtimestamp(),
    "localdatetime.transaction": lambda a: F.localtimestamp(),
    "localdatetime.realtime": lambda a: F.localtimestamp(),
    "date.statement": lambda a: F.current_date(),
    "date.transaction": lambda a: F.current_date(),
    "date.realtime": lambda a: F.current_date(),
    # TIME / LOCALTIME (r13): a time-of-day is TIMESTAMP_NTZ on the
    # epoch day (compile/temporal.py). These are the generic forms
    # (column args / no-arg clocks); string LITERALS take the
    # offset-normalizing special case in expressions._fn_call.
    "time": lambda a: (_time_of_day(a[0]) if a else _time_now()),
    "localtime": lambda a: (_time_of_day(a[0]) if a else _time_now()),
    "time.statement": lambda a: _time_now(),
    "time.transaction": lambda a: _time_now(),
    "time.realtime": lambda a: _time_now(),
    "localtime.statement": lambda a: _time_now(),
    "localtime.transaction": lambda a: _time_now(),
    "localtime.realtime": lambda a: _time_now(),
    # duration.between(a, b): day-time interval from a to b (dates
    # and/or timestamps; Cypher semantics b - a)
    "duration.between": lambda a: (a[1].cast("timestamp_ntz")
                                   - a[0].cast("timestamp_ntz")),
}


def compile_scalar(name: str, args: list[Column]) -> Column:
    n = name.lower()
    if n in SCALAR_FNS:
        return SCALAR_FNS[n](args)
    # Pass-through to any Spark SQL builtin (parity with the reference's
    # ClickHouse pass-through; unknown names raise at analysis time).
    return F.call_function(n, *args)
