"""Learned quality classifier (ops/classifier.py): exact pure-Python
replay of the integer-micro-unit training dynamics, DuckDB replay of
the scoring arithmetic, reference-vs-gibberish separation, and
determinism under repartition."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from brahmand_spark.ops.classifier import (
    MICRO, classifier_score, fast_sigmoid, hashed_token_features,
    quality_filter_lr, train_text_classifier,
)

from .conftest import SF_SMOKE
from .helpers import assert_same

DIM = 256


def _idx(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % dim


def _py_feats(text: str, dim: int) -> set[int]:
    toks = [t for t in text.lower().split() if t]
    return {_idx(t, dim) for t in toks} | {dim}


def _py_train(pos, neg, dim, epochs, lr):
    """Bit-exact replay of train_text_classifier."""
    docs = [(f"p{i}", t, 1.0) for i, t in pos] \
        + [(f"n{i}", t, 0.0) for i, t in neg]
    feats = {k: _py_feats(t, dim) for k, t, _ in docs}
    n = len(docs)
    scale = lr / n
    w = [0] * (dim + 1)
    for _ in range(epochs):
        grad = {}
        for k, _t, y in docs:
            m = sum(w[i] for i in feats[k]) / 1e6
            e = math.floor((fast_sigmoid(m) - y) * MICRO)
            for i in feats[k]:
                grad[i] = grad.get(i, 0) + e
        for i, g in grad.items():
            w[i] -= int(math.floor(scale * g))
    return w


def _gibberish(i: int) -> str:
    rndwords = [f"zx{j}qv{(i * 7 + j) % 13}" for j in range(20)]
    return " ".join(rndwords)


def _fixture(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .select("doc_id", "text").filter("doc_id < 60")
    pos_rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    neg_rows = [(1000 + i, _gibberish(i)) for i in range(40)]
    neg = spark.createDataFrame(neg_rows, "doc_id long, text string")
    return docs, pos_rows, neg, neg_rows


class TestTrainingReplay:
    def test_weights_match_python_replay(self, spark):
        docs, pos_rows, neg, neg_rows = _fixture(spark)
        got = train_text_classifier(docs, neg, dim=DIM, epochs=4,
                                    lr=4.0)
        want = _py_train([(i, t) for i, t in pos_rows],
                         [(i, t) for i, t in neg_rows],
                         DIM, epochs=4, lr=4.0)
        assert got == want

    def test_scores_match_python_replay(self, spark):
        docs, pos_rows, neg, neg_rows = _fixture(spark)
        w = train_text_classifier(docs, neg, dim=DIM, epochs=4, lr=4.0)
        got = {r["doc_id"]: r["score"] for r in
               classifier_score(docs, w).collect()}
        for i, t in pos_rows:
            m = sum(w[j] for j in _py_feats(t, DIM)) / 1e6
            assert got[i] == round(fast_sigmoid(m), 6)

    def test_deterministic_under_repartition(self, spark):
        docs, _, neg, _ = _fixture(spark)
        a = train_text_classifier(docs, neg, dim=DIM, epochs=3)
        b = train_text_classifier(docs.repartition(7),
                                  neg.repartition(5), dim=DIM, epochs=3)
        assert a == b


class TestScoringOracle:
    def test_score_matches_duckdb_replay(self, spark, duck):
        """The scoring arithmetic replays bit-for-bit in DuckDB: same
        md5 feature hash, integer weight sum, fast-sigmoid basic
        ops."""
        docs, _, neg, _ = _fixture(spark)
        w = train_text_classifier(docs, neg, dim=DIM, epochs=3)
        got = classifier_score(docs, w)
        wvals = ", ".join(f"({i}, {wi})"
                          for i, wi in enumerate(w) if wi != 0)
        sql = f"""
            WITH docs AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 60),
            f AS (
                SELECT DISTINCT doc_id,
                       (list_reduce(list_transform(
                            string_split(substr(md5(t), 1, 15), ''),
                            c -> (strpos('0123456789abcdef', c)
                                  - 1)::BIGINT),
                            (a, b) -> a * 16 + b)
                        % {DIM})::INT AS idx
                FROM (SELECT doc_id, unnest(list_filter(
                          string_split_regex(lower(text), '\\s+'),
                          x -> x <> '')) AS t FROM docs)
                UNION SELECT doc_id, {DIM} FROM docs),
            wt(idx, w) AS (VALUES {wvals}),
            m AS (
                SELECT doc_id,
                       sum(coalesce(w, 0))::BIGINT / 1e6 AS m
                FROM f LEFT JOIN wt USING (idx) GROUP BY doc_id)
            SELECT doc_id,
                   round(0.5 * (1.0 + m / (1.0 + abs(m))), 6) AS score
            FROM m"""
        assert_same(got, duck.sql(sql))


class TestQualityFilter:
    def test_reference_vs_gibberish_separation(self, spark):
        docs, _, neg, _ = _fixture(spark)
        w = train_text_classifier(docs, neg, dim=DIM, epochs=6)
        real = classifier_score(docs, w).agg(
            F.avg("score")).first()[0]
        junk = classifier_score(neg, w).agg(
            F.avg("score")).first()[0]
        assert real > 0.6 > junk

    def test_filter_keeps_reference_like(self, spark):
        docs, _, neg, _ = _fixture(spark)
        mixed = docs.unionByName(neg)
        kept = quality_filter_lr(mixed, docs, min_score=0.5,
                                 dim=DIM, epochs=6)
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        # every real doc survives, every gibberish doc is dropped
        assert all(i < 1000 for i in ids)
        assert len(ids) == 60

    def test_empty_docs_score_bias_only(self, spark):
        docs, _, neg, _ = _fixture(spark)
        w = train_text_classifier(docs, neg, dim=DIM, epochs=2)
        empty = spark.createDataFrame([(7, "")], "doc_id long, text string")
        s = classifier_score(empty, w).collect()[0]
        m = w[DIM] / 1e6
        assert s["score"] == round(fast_sigmoid(m), 6)


class TestFeaturePlan:
    def test_features_are_narrow_and_bounded(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        f = hashed_token_features(docs, dim=DIM)
        assert f.agg(F.max("idx")).first()[0] <= DIM
        plan = f._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestPipelineAndCallIntegration:
    def test_curate_with_lr_quality_stage(self, spark):
        from brahmand_spark.ops.pipeline import curate

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
            .filter("doc_id < 80").select("doc_id", "text")
        junk = spark.createDataFrame(
            [(2000 + i, _gibberish(i)) for i in range(30)],
            "doc_id long, text string")
        mixed = docs.unionByName(junk)
        out, counts = curate(
            mixed, languages=("en", "de", "es", "fr"), min_quality=0.0,
            reference=docs, quality_model="lr", min_lr_score=0.5,
            report=True)
        assert "learned_quality" in counts
        ids = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert all(i < 2000 for i in ids)  # gibberish dropped

    def test_quality_lr_via_call(self, spark):
        from brahmand_spark.graphs.tpch import build_session

        s = build_session(spark, SF_SMOKE)
        real = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
            .select("doc_id", "text")
        node_cls = type(s.schema.nodes["Document"])
        ref = real.filter("doc_id < 60")
        mixed = real.filter("doc_id >= 60 AND doc_id < 120").unionByName(
            spark.createDataFrame(
                [(3000 + i, _gibberish(i)) for i in range(30)],
                "doc_id long, text string"))
        s.register_table("RefDocs", ref)
        s.register_table("MixedDocs", mixed)
        for label, tbl in (("Ref", "RefDocs"), ("Mixed", "MixedDocs")):
            s.schema.nodes[label] = node_cls(
                label=label, table_name=tbl, node_id="doc_id",
                column_names=["doc_id", "text"])
        got = s.execute(
            "CALL corpus.quality_lr('Mixed', 'Ref', 0.5, 256, 6) "
            "YIELD doc_id")
        ids = {r["doc_id"] for r in got.collect()}
        assert all(i < 3000 for i in ids)  # every junk doc dropped
        assert len(ids) >= 30              # most real docs survive
