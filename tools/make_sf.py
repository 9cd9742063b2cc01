#!/usr/bin/env python
"""Upsample the driver's sf0.1 parquet tables to a larger scale factor.

Strategy (VERDICT r9 "Next round" item 1 — sf1 scale soak): replicate each
table FACTOR times with re-keyed ids so the result is a valid, referentially
consistent star schema at ~FACTOR x the rows. Two tables get content
perturbation so the upsample does not create a degenerate workload:

* ``documents``: replica i>0 suffixes every whitespace token with ``q{i}z``
  (alphanumeric, so regex ``\\w+`` tokenizers still see ONE token). Within a
  replica the duplicate/near-duplicate structure is bit-identical to sf0.1;
  across replicas token sets are disjoint, so near-dup pair counts grow
  linearly (x FACTOR) instead of quadratically (exact-copy explosion).
* ``embeddings``: replica i>0 adds deterministic hash-derived noise per
  element (+-0.15 amplitude), so semantic-dedup / ANN workloads see FACTOR x
  distinct vectors, not FACTOR x exact copies.

``region``/``nation`` stay fixed (TPC-H keeps dimensions constant across SF).
Everything is DuckDB SQL -> parquet; deterministic, no RNG state.

Usage: python tools/make_sf.py [--src /root/testdata/sf0.1]
                               [--out /root/repo/.localdata/sf1] [--factor 10]
"""
import argparse
import os

import duckdb

# Key offsets = sf0.1 table sizes (max key + 1); replica i adds i * offset.
OFF = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events_id": 100_000,
    "events_user": 1_500,
    "documents": 5_000,
    "embeddings": 2_000,
}


def _rep(factor: int) -> str:
    return f"CROSS JOIN range({factor}) rep(i)"


def build(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    def copy(sql: str, name: str) -> None:
        dest = os.path.join(out, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {n} rows")

    def t(name: str) -> str:
        return f"'{os.path.join(src, name + '.parquet')}'"

    # Fixed dimensions: straight copies.
    copy(f"SELECT * FROM {t('region')}", "region")
    copy(f"SELECT * FROM {t('nation')}", "nation")

    copy(
        f"""SELECT CAST(c_custkey + i * {OFF['customer']} AS BIGINT) AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {t('customer')} {_rep(factor)}""",
        "customer",
    )
    copy(
        f"""SELECT CAST(s_suppkey + i * {OFF['supplier']} AS BIGINT) AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {t('supplier')} {_rep(factor)}""",
        "supplier",
    )
    copy(
        f"""SELECT CAST(p_partkey + i * {OFF['part']} AS BIGINT) AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {t('part')} {_rep(factor)}""",
        "part",
    )
    copy(
        f"""SELECT CAST(o_orderkey + i * {OFF['orders']} AS BIGINT) AS o_orderkey,
                   CAST(o_custkey + i * {OFF['customer']} AS BIGINT) AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {t('orders')} {_rep(factor)}""",
        "orders",
    )
    copy(
        f"""SELECT CAST(l_orderkey + i * {OFF['orders']} AS BIGINT) AS l_orderkey,
                   CAST(l_partkey + i * {OFF['part']} AS BIGINT) AS l_partkey,
                   CAST(l_suppkey + i * {OFF['supplier']} AS BIGINT) AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {t('lineitem')} {_rep(factor)}""",
        "lineitem",
    )
    copy(
        f"""SELECT CAST(event_id + i * {OFF['events_id']} AS BIGINT) AS event_id,
                   ts,
                   CAST(user_id + i * {OFF['events_user']} AS BIGINT) AS user_id,
                   event_type, value, props
            FROM {t('events')} {_rep(factor)}""",
        "events",
    )
    # Documents: per-replica token salt (see module docstring).
    copy(
        f"""WITH base AS (
              SELECT CAST(doc_id + i * {OFF['documents']} AS BIGINT) AS doc_id,
                     CASE WHEN i = 0 THEN text ELSE array_to_string(
                       list_transform(string_split(text, ' '),
                         w -> CASE WHEN w = '' THEN w
                                   ELSE w || 'q' || CAST(i AS VARCHAR) || 'z' END),
                       ' ') END AS text,
                     lang, source
              FROM {t('documents')} {_rep(factor)})
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars FROM base""",
        "documents",
    )
    # Embeddings: deterministic hash-noise per element for i>0.
    copy(
        f"""SELECT CAST(vec_id + i * {OFF['embeddings']} AS BIGINT) AS vec_id,
                   CASE WHEN i = 0 THEN embedding ELSE
                     CAST(list_transform(
                       list_zip(embedding,
                                range(1, len(embedding) + 1)) ,
                       z -> z[1] + 0.15 * ((CAST(hash(vec_id * 1009 + z[2] * 7
                                                      + i * 131) % 2001 AS DOUBLE)
                                            - 1000.0) / 1000.0))
                     AS FLOAT[]) END AS embedding,
                   label
            FROM {t('embeddings')} {_rep(factor)}""",
        "embeddings",
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    build(a.src, a.out, a.factor)
