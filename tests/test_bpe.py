"""Distributed BPE (ops/bpe.py): pure-Python Sennrich ground truth for
training and segmentation, DuckDB parity for the word table, batched
rounds, and determinism under repartition."""

import re
from collections import Counter

import pyspark.sql.functions as F

from brahmand_spark.ops.bpe import (
    END, WORD_RE, bpe_segment, bpe_token_count, segment_words,
    train_bpe, word_counts,
)

from .conftest import SF_SMOKE
from .helpers import assert_same

CORPUS = [
    (0, "low low low low low lower lower newest newest"),
    (1, "newest newest newest newest widest widest widest"),
    (2, "the lowest of the low, the newest of the new!"),
    (3, "wider and wider and wider still"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def _py_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts, n_merges):
    wc = Counter(w for t in texts for w in re.findall(WORD_RE, t))
    words = {w: list(w) + [END] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += wc[w]
        cands = {p: n for p, n in pc.items() if n > 1}
        if not cands:
            break
        best = min(cands.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w in words:
            words[w] = _py_apply(words[w], *best)
        merges.append(best)
    return merges, words


class TestBpeTraining:
    def test_matches_python_reference(self, spark):
        want, _ = _py_train([t for _, t in CORPUS], 12)
        got = train_bpe(_docs(spark), n_merges=12)
        assert got == want

    def test_stops_when_no_pair_repeats(self, spark):
        df = spark.createDataFrame(
            [(0, "ab cd ef")], "doc_id bigint, text string")
        # every adjacent pair occurs once -> nothing to merge
        assert train_bpe(df, n_merges=10) == []

    def test_deterministic_under_repartition(self, spark):
        a = train_bpe(_docs(spark), n_merges=10)
        b = train_bpe(_docs(spark).repartition(7), n_merges=10)
        assert a == b

    def test_batched_rounds(self, spark):
        """merges_per_round > 1: rules stay a deterministic function of
        the data and every word still re-assembles exactly."""
        m1 = train_bpe(_docs(spark), n_merges=12, merges_per_round=4)
        m2 = train_bpe(_docs(spark).repartition(5), n_merges=12,
                       merges_per_round=4)
        assert m1 == m2 and len(m1) == 12
        seg = segment_words(
            word_counts(_docs(spark)).select("word"), m1).collect()
        for r in seg:
            assert "".join(r["tokens"]) == r["word"] + END


class TestBpeApplication:
    def test_segment_matches_python_reference(self, spark):
        merges, seg_map = _py_train([t for _, t in CORPUS], 12)
        want = {
            i: [tok for w in re.findall(WORD_RE, t)
                for tok in seg_map[w]]
            for i, t in CORPUS
        }
        got = {r["doc_id"]: r["tokens"]
               for r in bpe_segment(_docs(spark), merges).collect()}
        assert got == want

    def test_token_count_matches_segmentation(self, spark):
        merges = train_bpe(_docs(spark), n_merges=8)
        seg = {r["doc_id"]: len(r["tokens"])
               for r in bpe_segment(_docs(spark), merges).collect()}
        cnt = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_token_count(_docs(spark), merges).collect()}
        assert seg == cnt

    def test_more_merges_never_increase_tokens(self, spark):
        few = train_bpe(_docs(spark), n_merges=3)
        many = train_bpe(_docs(spark), n_merges=15)
        n_few = {r["doc_id"]: r["n_bpe_tokens"] for r in
                 bpe_token_count(_docs(spark), few).collect()}
        n_many = {r["doc_id"]: r["n_bpe_tokens"] for r in
                  bpe_token_count(_docs(spark), many).collect()}
        assert all(n_many[k] <= n_few[k] for k in n_few)


class TestWordCounts:
    def test_duckdb_parity_on_documents(self, spark, duck):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        assert_same(
            word_counts(docs, min_count=2),
            duck.sql(r"""
                SELECT w AS word, count(*) AS cnt
                FROM (SELECT unnest(regexp_extract_all(
                          text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS w
                      FROM documents)
                GROUP BY w HAVING count(*) >= 2"""),
        )

    def test_corpus_scale_training_runs(self, spark):
        """Training on the sf0.001 documents table end-to-end (500
        real docs): rules come back non-trivial and segmentation
        re-assembles."""
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        merges = train_bpe(docs, n_merges=10, min_count=2,
                           merges_per_round=5)
        assert len(merges) == 10
        seg = segment_words(
            word_counts(docs, min_count=2).select("word").limit(50),
            merges).collect()
        for r in seg:
            assert "".join(r["tokens"]) == r["word"] + END


class TestTotality:
    def test_segment_total_over_empty_docs(self, spark):
        """Documents with no WORD_RE matches come back with empty
        token arrays — the output is total over input doc ids."""
        docs = spark.createDataFrame(
            CORPUS + [(9, ""), (10, "   \n\t ")],
            "doc_id bigint, text string")
        merges = train_bpe(_docs(spark), n_merges=4)
        got = {r["doc_id"]: r["tokens"]
               for r in bpe_segment(docs, merges).collect()}
        assert set(got) == {0, 1, 2, 3, 9, 10}
        assert got[9] == [] and got[10] == []
        cnt = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_token_count(docs, merges).collect()}
        assert set(cnt) == {0, 1, 2, 3, 9, 10}
        assert cnt[9] == 0 and cnt[10] == 0
        assert all(cnt[i] == len(got[i]) for i in got)
