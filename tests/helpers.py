"""Result-comparison helpers: canonicalize Spark and DuckDB results the
same way the driver does (column-name sort, row sort, normalized floats)."""

from __future__ import annotations

import math

import pandas as pd


def canon(df: pd.DataFrame, float_places: int = 6) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    out.append("NaN")
                else:
                    out.append(round(v, float_places))
            elif hasattr(v, "isoformat"):
                out.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                out.append(tuple(v))
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)


def assert_same(spark_df, duck_rel, float_places: int = 6):
    lp, rp = spark_df.toPandas(), duck_rel.df()
    # the driver checks schema too — a name mismatch must fail here
    # even when the sorted value columns happen to line up
    assert sorted(lp.columns) == sorted(rp.columns), (
        f"column mismatch: spark={sorted(lp.columns)} "
        f"duckdb={sorted(rp.columns)}"
    )
    left = canon(lp, float_places)
    right = canon(rp, float_places)
    assert len(left) == len(right), (
        f"row count mismatch: spark={len(left)} duckdb={len(right)}\n"
        f"spark head: {left[:5]}\nduck head: {right[:5]}"
    )
    for i, (l, r) in enumerate(zip(left, right)):
        assert l == r, f"row {i} mismatch:\n  spark={l}\n  duck ={r}"
