"""N-gram LM perplexity (ops/ngram_lm): DuckDB replay parity, exact
hand-computed probabilities, filtering behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from brahmand_spark.ops.ngram_lm import perplexity, train_ngram_lm

from .conftest import SF_SMOKE
from .helpers import assert_same


def _duck_replay(duck, n: int, k: float, v: int) -> str:
    """Replay of bigram (n=2) training + scoring on documents — same
    <s> padding, counts, add-k formula, micro-nat floor."""
    assert n == 2
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_prepend('<s>',
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS t
            FROM documents),
        rows_ AS (
            SELECT doc_id, t[i - 1] AS ctx, t[i] AS w
            FROM toks, unnest(range(2, len(t) + 1)) AS u(i)
            WHERE len(t) >= 2),
        ngram AS (SELECT ctx, w, count(*) AS c FROM rows_ GROUP BY 1, 2),
        context AS (SELECT ctx, count(*) AS cc FROM rows_ GROUP BY 1),
        scored AS (
            SELECT r.doc_id,
                   floor(ln((coalesce(g.c, 0) + {k!r})
                            / (coalesce(x.cc, 0) + {k * v!r}))
                         * 1000000.0)::BIGINT AS s_int
            FROM rows_ r
            LEFT JOIN ngram g ON g.ctx = r.ctx AND g.w = r.w
            LEFT JOIN context x ON x.ctx = r.ctx)
        SELECT doc_id, count(*) AS n_tokens_scored,
               round(sum(s_int) / 1000000.0, 4) AS log_prob,
               round(exp(-(sum(s_int) / 1000000.0) / count(*)), 4) AS ppl
        FROM scored GROUP BY doc_id"""


def test_self_perplexity_duckdb_parity(spark, duck):
    """Train on the corpus, score the corpus; the DuckDB replay must
    hash-match (counts exact, one ln per token, micro-nat fold)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    model = train_ngram_lm(docs, n=2)
    got = perplexity(docs, model, n=2, k=0.5)
    assert_same(got, duck.sql(
        _duck_replay(duck, 2, 0.5, model["vocab_size"])
    ))


def test_hand_computed_bigram(spark):
    """'a b a b' trained on itself: exact add-k arithmetic."""
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    model = train_ngram_lm(docs, n=2)
    assert model["vocab_size"] == 3  # {a, b} + unseen mass
    got = perplexity(docs, model, n=2, k=0.5).collect()[0]
    k, v = 0.5, 3
    # rows: (<s>,a) (a,b) (b,a) (a,b); counts: (<s>,a)=1 (a,b)=2 (b,a)=1
    # contexts: <s>=1, a=2, b=1
    lps = [
        math.log((1 + k) / (1 + k * v)),   # <s> -> a
        math.log((2 + k) / (2 + k * v)),   # a -> b
        math.log((1 + k) / (1 + k * v)),   # b -> a
        math.log((2 + k) / (2 + k * v)),   # a -> b
    ]
    lp_int = sum(math.floor(lp * 1e6) for lp in lps)
    assert got["n_tokens_scored"] == 4
    assert got["log_prob"] == round(lp_int / 1e6, 4)
    assert got["ppl"] == round(math.exp(-(lp_int / 1e6) / 4), 4)


def test_reference_like_docs_score_lower(spark):
    """A doc made of training-corpus phrases gets lower perplexity
    than gibberish the model never saw — the filtering signal."""
    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in
         range(20)],
        "doc_id long, text string",
    )
    model = train_ngram_lm(train, n=2)
    probe = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "zxq vv qqq kk zz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"]
           for r in perplexity(probe, model, n=2).collect()}
    assert got[100] < got[101]


def test_short_docs_skipped(spark):
    """Documents with fewer tokens than the padded minimum (none after
    tokenization) produce no score rows."""
    docs = spark.createDataFrame(
        [(1, "   "), (2, "hello")], "doc_id long, text string"
    )
    model = train_ngram_lm(docs, n=2)
    ids = {r["doc_id"] for r in perplexity(docs, model).collect()}
    assert ids == {2}  # '<s> hello' yields one bigram; empty doc none


def test_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_ngram_lm(docs, n=1)
    model = train_ngram_lm(docs, n=2)
    with pytest.raises(ValueError):
        perplexity(docs, model, k=0.0)
