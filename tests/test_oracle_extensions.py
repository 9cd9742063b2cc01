"""Parity tests for the GENERATED DuckDB oracles of the hash-family
gates (minhash LSH, simhash, hyperplane LSH) — the same comparison the
driver runs at sf0.01, executed here at sf0.001 so regressions surface
before a round is graded. The oracle SQL replays seeded modular
arithmetic / literal hyperplanes, so results must match bit-for-bit.

(ann_ivf_topk is excluded: its oracle derives centroid literals from
the sf0.01 sample by design — tools/check_entry.py covers it.)
"""

from __future__ import annotations

import itertools

import pytest

from .helpers import assert_same

SCALE_FREE_GENERATED = [
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh",
    "ann_lsh_topk", "graph_pagerank", "graph_scc",
]


@pytest.mark.parametrize("name", SCALE_FREE_GENERATED)
def test_generated_oracle_parity(spark, duck, name):
    import __spark_entry__ as entry

    from .conftest import SF_SMOKE

    fn = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    assert_same(fn(spark, SF_SMOKE), duck.sql(sql))


def test_simhash_banding_complete_at_bound(spark):
    """Pigeonhole banding with max_hamming+1 chunks must find EVERY
    pair within the bound — compare against brute-force all-pairs
    Hamming over the same fingerprints."""
    from pyspark.sql import functions as F

    from brahmand_spark.ops.dedup import simhash, simhash_near_pairs

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .filter(F.col("doc_id") < 200)
    for max_hamming in (3, 7):
        sh = {r.id: r.simhash
              for r in simhash(docs, n_chunks=max_hamming + 1).collect()}
        widths = 64 // (max_hamming + 1)  # noqa: F841 (doc only)
        brute = set()
        for a, b in itertools.combinations(sorted(sh), 2):
            ham = sum(
                bin(x ^ y).count("1")
                for x, y in zip(sh[a], sh[b])
            )
            if ham <= max_hamming:
                brute.add((a, b, ham))
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_pairs(
                docs, max_hamming=max_hamming
            ).collect()
        }
        assert banded == brute, (
            f"max_hamming={max_hamming}: banded {len(banded)} "
            f"!= brute {len(brute)}"
        )


def test_simhash_portable_matches_family_size(spark):
    """The portable hash family must behave like a real hash: identical
    docs collide at distance 0, unrelated docs stay far apart."""
    from brahmand_spark.ops.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "unrelated totally different content words entirely")],
        "doc_id long, text string",
    )
    pairs = simhash_near_pairs(df, max_hamming=0, hash_fn="portable") \
        .collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_minhash_portable_recall_matches_default(spark):
    """Portable and xxhash64 minhash are different hash families but
    must agree on the obvious duplicates (est_jaccard ~ 1)."""
    from pyspark.sql import functions as F

    from brahmand_spark.ops.dedup import minhash_lsh_candidates

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    strong = {}
    for fn in ("xxhash64", "portable"):
        strong[fn] = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_candidates(docs, hash_fn=fn)
            .filter(F.col("est_jaccard") >= 0.9).collect()
        }
    jacc = (len(strong["xxhash64"] & strong["portable"])
            / max(len(strong["xxhash64"] | strong["portable"]), 1))
    assert jacc >= 0.8, f"hash families disagree: {jacc:.2f}"


def test_bpe_python_trainer_matches_spark(spark):
    """The _bpe_oracle merge rules come from the pure-Python trainer;
    it must be bit-identical to the distributed ops/bpe.train_bpe
    (same pair counts, n>1 filter, tie-break, disjoint batching)."""
    import duckdb

    import __spark_entry__ as entry
    from brahmand_spark.ops.bpe import WORD_RE, train_bpe

    from .conftest import SF_SMOKE

    con = duckdb.connect()
    wc = con.execute(
        f"SELECT w, count(*) c FROM (SELECT unnest(regexp_extract_all("
        f"text, '{WORD_RE}')) w FROM "
        f"'{SF_SMOKE}/documents.parquet') GROUP BY w "
        f"HAVING count(*) >= {entry.BPE_MIN_COUNT}").fetchall()
    py = entry._py_bpe_train(wc, entry.BPE_N_MERGES, entry.BPE_PER_ROUND)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sp = train_bpe(docs, n_merges=entry.BPE_N_MERGES,
                   min_count=entry.BPE_MIN_COUNT,
                   merges_per_round=entry.BPE_PER_ROUND)
    assert sp == py


def test_bpe_gate_matches_generated_oracle(spark, duck):
    """The full bpe_segment gate vs an oracle generated for sf0.001
    (the graded run generates against sf0.01 the same way)."""
    import __spark_entry__ as entry

    from .conftest import SF_SMOKE

    sql = entry._bpe_oracle(f"{SF_SMOKE}/documents.parquet")
    assert_same(entry._q_bpe_segment(spark, SF_SMOKE), duck.sql(sql))


def test_bpe_oracle_handles_quotes_and_backslashes(spark, tmp_path):
    """Merge rules containing apostrophes (contractions) or corpus
    text containing backslashes must render as valid SQL literals —
    the oracle uses ''-doubled single-quoted literals with RAW
    delimiter bytes, matched by the chr(1)/chr(2) corpus guard."""
    import duckdb
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from brahmand_spark.ops.bpe import bpe_segment, train_bpe

    from .helpers import assert_same

    rows = [(i, "don't won't can't isn't ain't didn't it's that's "
                r"a\path b\x01text don't won't") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path / "quotes.parquet")
    docs.write.mode("overwrite").parquet(path)
    sql = entry._bpe_oracle(f"{path}/*.parquet")
    # the learned rules must actually include an apostrophe merge for
    # the quoting to be exercised
    assert "''" in sql
    merges = train_bpe(docs, n_merges=entry.BPE_N_MERGES,
                       min_count=entry.BPE_MIN_COUNT,
                       merges_per_round=entry.BPE_PER_ROUND)
    assert any("'" in a + b for a, b in merges), merges
    got = bpe_segment(docs, merges).select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_bpe_tokens"),
        F.concat_ws(" ", "tokens").alias("segmented"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{path}/*.parquet'")
    assert_same(got, con.sql(sql))
