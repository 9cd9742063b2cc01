"""N-gram language model: distributed training + per-document
perplexity scoring.

Extension beyond the reference surface (SURVEY.md §2.8): perplexity
against a reference corpus is the classic learned quality filter for
web-scale training data (the CCNet recipe: keep documents whose LM
perplexity is low, i.e. that look like the reference). This module
trains an add-k-smoothed n-gram model and scores documents with it —
both stages plain DataFrame ops.

Model: ``p(w | ctx) = (c(ctx, w) + k) / (c(ctx) + k * V)`` where
``ctx`` is the preceding ``n-1`` tokens (with ``<s>`` padding), ``V``
the training vocabulary size (+1 for the unseen-token mass), ``k``
the smoothing constant. Unseen (ctx, w) pairs back off through the
same formula (missing counts coalesce to 0), so every token gets a
proper probability.

Determinism across engines: per-token log-probabilities are computed
from exact integer counts with one ``ln`` each, then FLOORED TO
MICRO-NATS (``floor(ln_p * 1e6)`` as bigint) before the per-document
sum — integer aggregation, immune to float summation order (the same
device as ops/search BM25).

Scale posture: training is two count shuffles (ngram, context) with
map-side combine; scoring explodes each document's n-grams (narrow),
joins the two count tables on their keys (corpus-sized, shuffled on
near-uniform n-gram text keys), and re-aggregates per document. No
UDFs, no driver state — the "model" IS a pair of DataFrames, which at
100 TB you persist partitioned by key and reuse across scoring runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

BOS = "<s>"


def _ngram_rows(df: DataFrame, n: int, text_col: str,
                id_col: str | None) -> DataFrame:
    """One row per token occurrence: (ctx, w) with <s>-padded left
    context of n-1 tokens, plus the doc id when requested."""
    toks = F.concat(
        F.array(*[F.lit(BOS)] * (n - 1)), tokens(F.lower(F.col(text_col)))
    )
    cols = [F.col(id_col)] if id_col else []
    base = df.select(*cols, toks.alias("t"))
    # positions n .. len(t): each yields context t[i-n+1 .. i-1], word t[i]
    idx = F.sequence(F.lit(n), F.greatest(F.size("t"), F.lit(n - 1)))
    return (
        base.filter(F.size("t") >= n)
        .select(*[c for c in ([F.col(id_col)] if id_col else [])],
                "t", F.explode(idx).alias("i"))
        .select(
            *([F.col(id_col)] if id_col else []),
            F.concat_ws(" ", F.slice("t", F.col("i") - n + 1, n - 1))
            .alias("ctx"),
            F.element_at("t", F.col("i")).alias("w"),
        )
    )


def train_ngram_lm(df: DataFrame, n: int = 2,
                   text_col: str = "text") -> dict[str, DataFrame]:
    """Train the count tables: ``{'ngram': (ctx, w, c), 'context':
    (ctx, cc), 'vocab_size': int}``. Two map-side-combinable count
    shuffles; vocabulary size is the one scalar the scorer needs
    (+1 reserves smoothed mass for unseen words)."""
    if n < 2:
        raise ValueError("n must be >= 2")
    rows = _ngram_rows(df, n, text_col, None)
    ngram = rows.groupBy("ctx", "w").agg(F.count(F.lit(1)).alias("c"))
    context = rows.groupBy("ctx").agg(F.count(F.lit(1)).alias("cc"))
    vocab = rows.select("w").distinct().count() + 1
    return {"ngram": ngram, "context": context, "vocab_size": vocab}


def perplexity(docs: DataFrame, model: dict, n: int = 2, k: float = 0.5,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document perplexity under the trained model:
    ``exp(-mean(ln p))`` over the document's tokens, add-k smoothed.
    Columns: ``id_col, n_tokens_scored, log_prob, ppl`` (lower ppl =
    more reference-like; threshold on it to filter a corpus).
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    v = int(model["vocab_size"])
    rows = _ngram_rows(docs, n, text_col, id_col)
    joined = (
        rows.join(model["ngram"], ["ctx", "w"], "left")
        .join(model["context"], "ctx", "left")
    )
    # exact-integer-count inputs -> one ln -> micro-nat floor; the
    # per-doc sum is then pure bigint arithmetic (order-independent)
    ln_p = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(k * v))
    )
    s_int = F.floor(ln_p * F.lit(1e6)).cast("bigint")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens_scored"),
        F.sum(s_int).alias("lp_int"),
    )
    return agg.select(
        id_col, "n_tokens_scored",
        F.round(F.col("lp_int") / F.lit(1e6), 4).alias("log_prob"),
        F.round(
            F.exp(-(F.col("lp_int") / F.lit(1e6))
                  / F.col("n_tokens_scored")), 4,
        ).alias("ppl"),
    )
