"""AS-OF join (ops/temporal): DuckDB ASOF JOIN parity, tie/direction/
tolerance semantics, plan shape."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from brahmand_spark.ops.temporal import as_of_join

from .conftest import SF_SMOKE
from .helpers import assert_same


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(5), 50.0)],
        "k long, ts timestamp, px double",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [(1, _ts(9), 1.0), (1, _ts(10), 2.0), (1, _ts(19), 3.0),
         (2, _ts(6), 9.0)],
        "k long, ts timestamp, q double",
    )


def test_gate_oracle_parity(spark, duck):
    import __spark_entry__ as entry

    fn = entry.queries()["events_asof_join"]
    sql = entry.oracle_sql()["events_asof_join"]
    assert_same(fn(spark, SF_SMOKE), duck.sql(sql))


def test_backward_ties_match_and_left_join(trades, quotes):
    got = {
        (r["k"], r["ts"]): (r["ts_right"], r["q_right"])
        for r in as_of_join(trades, quotes, "k").collect()
    }
    # t=10 matches the quote AT 10 (tie), not 9
    assert got[(1, _ts(10))] == (_ts(10), 2.0)
    assert got[(1, _ts(20))] == (_ts(19), 3.0)
    # key 2: quote at 6 is AFTER the trade at 5 -> NULL match
    assert got[(2, _ts(5))] == (None, None)


def test_forward_direction(trades, quotes):
    got = {
        (r["k"], r["ts"]): (r["ts_right"], r["q_right"])
        for r in as_of_join(
            trades, quotes, "k", direction="forward").collect()
    }
    assert got[(1, _ts(10))] == (_ts(10), 2.0)  # tie still matches
    assert got[(1, _ts(20))] == (None, None)    # nothing after
    assert got[(2, _ts(5))] == (_ts(6), 9.0)


def test_tolerance_nulls_stale_matches(trades, quotes):
    got = {
        (r["k"], r["ts"]): r["q_right"]
        for r in as_of_join(
            trades, quotes, "k", tolerance="1 minute").collect()
    }
    assert got[(1, _ts(10))] == 2.0   # exact-ts match, within 1 min
    assert got[(1, _ts(20))] == 3.0   # 19 -> 20 is 1 min, inclusive
    assert got[(2, _ts(5))] is None


def test_tolerance_excludes_beyond(spark, trades, quotes):
    got = {
        (r["k"], r["ts"]): r["q_right"]
        for r in as_of_join(
            trades, quotes, "k", tolerance="30 seconds").collect()
    }
    assert got[(1, _ts(20))] is None  # 1 min gap > 30 s


def test_rejects_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        as_of_join(trades, quotes, "k", direction="sideways")


def test_single_shuffle_plan(spark):
    """The union-and-carry shape must shuffle ONCE (the keyed window);
    a range-join formulation would show a join node."""
    from brahmand_spark.io import read_parquet

    ev = read_parquet(spark, f"{SF_SMOKE}/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    right = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "value")
    plan = as_of_join(left, right, "user_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_multi_key_join(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (1, "b", _ts(10))],
        "k long, g string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, "a", _ts(9), 7.0), (1, "b", _ts(8), 8.0)],
        "k long, g string, ts timestamp, v double",
    )
    got = {
        (r["k"], r["g"]): r["v_right"]
        for r in as_of_join(left, right, ["k", "g"]).collect()
    }
    assert got == {(1, "a"): 7.0, (1, "b"): 8.0}
