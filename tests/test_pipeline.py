"""Corpus-curation pipeline composition tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


class TestCuratePipeline:
    def test_stages_filter_monotonically(self, spark):
        from brahmand_spark.ops.pipeline import curate

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        out, counts = curate(
            docs, languages=("en", "de", "es", "fr"), min_quality=0.1,
            report=True,
        )
        order = ["input", "language", "quality", "exact_dedup",
                 "near_dedup"]
        vals = [counts[s] for s in order]
        assert vals == sorted(vals, reverse=True)
        assert counts["near_dedup"] > 0
        # every surviving row has a split assignment
        assert out.filter(F.col("split").isNull()).count() == 0
        assert out.count() == counts["near_dedup"]

    def test_near_dup_removal_is_transitive(self, spark):
        """A~B and B~C candidates but never A~C: the component step must
        still drop both B and C."""
        from brahmand_spark.ops.pipeline import near_dup_canonical_ids

        base = ("one two three four five six seven eight nine ten "
                "eleven twelve thirteen fourteen fifteen sixteen")
        b = base.replace("five", "5")
        c = b.replace("fifteen", "15")
        far = ("totally different words about spark catalyst optimizer "
               "plans and arrow columnar batches everywhere always")
        docs = spark.createDataFrame(
            [(1, base), (2, b), (3, c), (4, far)],
            "doc_id long, text string",
        )
        drops = {r.doc_id for r in near_dup_canonical_ids(
            docs, est_threshold=0.5).collect()}
        assert drops == {2, 3}

    def test_deterministic_across_runs(self, spark):
        from brahmand_spark.ops.pipeline import curate

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a, _ = curate(docs, languages=("en",), min_quality=0.1)
        b, _ = curate(docs.repartition(13), languages=("en",),
                      min_quality=0.1)
        assert a.select("doc_id", "split").exceptAll(
            b.select("doc_id", "split")).count() == 0


def test_curate_with_decontamination(spark):
    """benchmark= adds the flag-and-drop stage (r8): train docs
    sharing eval n-grams are dropped before the split; clean docs
    survive untouched."""
    from brahmand_spark.ops.pipeline import curate

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    train = docs.filter(F.col("doc_id") < 300)
    bench = docs.filter(F.col("doc_id") >= 400).select(
        "doc_id", "text")
    base, counts0 = curate(
        train, languages=("en", "de", "es", "fr"), min_quality=0.1,
        report=True)
    out, counts = curate(
        train, languages=("en", "de", "es", "fr"), min_quality=0.1,
        benchmark=bench, decontam_n=3, decontam_min_shared=2,
        report=True)
    assert counts["decontaminate"] <= counts["near_dedup"]
    assert counts["decontaminate"] < counts0["near_dedup"], \
        "fixture plants near-dups across the split, some must flag"
    # survivors are exactly base-minus-contaminated
    from brahmand_spark.ops.dedup import decontaminate

    survivors_base = base.select("doc_id")
    flagged = decontaminate(
        base.select("doc_id", "text"), bench, n=3, min_shared=2
    ).filter(F.col("contaminated")).select("doc_id")
    want = {r["doc_id"] for r in
            survivors_base.join(flagged, "doc_id", "left_anti")
            .collect()}
    assert {r["doc_id"] for r in out.collect()} == want


def test_curate_with_redaction(spark):
    from brahmand_spark.ops.pipeline import curate

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog met a@b.io for tea "
             "and it is a fine long document with many common words"),
         (2, "the slow green frog is in the pond and it is also a fine "
             "long document with many stopwords in it for the filter")],
        "doc_id long, text string",
    )
    out, counts = curate(
        docs, languages=("en",), min_quality=0.0, redact=True,
        report=True,
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    assert "<EMAIL>" in rows[1] and "@" not in rows[1]
    assert counts["pii"] == 2


def test_curate_with_perplexity_filter(spark):
    """The learned-quality stage (reference-corpus bigram LM) drops
    the gibberish document the heuristic stage can't distinguish."""
    from brahmand_spark.ops.pipeline import curate

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and the dog "
             "is very lazy for a dog on a day like this") for i in
         range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox is lazy and the dog is on a day like "
             "this with the fox and the dog and the lazy dog again ok"),
         (2, "the zx qv the wq pp the mm kk the jj jj the rr ss the tt "
             "uu the aa bb the cc dd the ee ff the gg hh the ii oo pp")],
        "doc_id long, text string",
    )
    # pick the threshold between the two observed perplexities so the
    # test pins the ORDER, not absolute values
    from brahmand_spark.ops.ngram_lm import perplexity, train_ngram_lm

    model = train_ngram_lm(ref, n=2)
    ppl = {r["doc_id"]: r["ppl"]
           for r in perplexity(docs, model, n=2).collect()}
    assert ppl[1] < ppl[2]
    cut = (ppl[1] + ppl[2]) / 2
    out, counts = curate(
        docs, languages=("en",), min_quality=0.0,
        reference=ref, max_ppl=cut, report=True,
    )
    assert counts["perplexity"] == 1
    assert {r.doc_id for r in out.collect()} == {1}


def test_curate_with_semantic_dedup(spark):
    """The optional SemDeDup stage: embeddings of the survivors are
    clustered and cosine-duplicates dropped; the stage only ever
    REMOVES documents, stays deterministic, and at threshold > 1.0
    (cosine can't exceed 1) removes nothing."""
    from brahmand_spark.ops.pipeline import curate

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    kwargs = dict(languages=("en", "de", "es", "fr"), min_quality=0.1,
                  embeddings=emb, semantic_k=4, report=True)
    base, base_counts = curate(docs, semantic_threshold=None, **kwargs)
    out, counts = curate(docs, semantic_threshold=0.2, **kwargs)
    assert "semantic_dedup" not in base_counts
    assert counts["semantic_dedup"] <= counts["near_dedup"]
    assert counts["semantic_dedup"] > 0
    assert out.count() == counts["semantic_dedup"]
    # deterministic under repartition
    again, counts2 = curate(docs.repartition(11),
                            semantic_threshold=0.2, **kwargs)
    assert counts2 == counts
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in again.select("doc_id").collect())
    # a threshold cosine can never reach keeps everything
    noop, c3 = curate(docs, semantic_threshold=1.5, **kwargs)
    assert c3["semantic_dedup"] == c3["near_dedup"]


def test_semantic_stage_keeps_docs_missing_embeddings(spark):
    """An embeddings-table coverage gap must not silently drop
    surviving documents: docs with no embedding row pass the semantic
    stage untouched."""
    from brahmand_spark.ops.pipeline import curate

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    kwargs = dict(languages=("en", "de", "es", "fr"), min_quality=0.1,
                  semantic_k=4, report=True)
    full, cf = curate(docs, embeddings=emb, semantic_threshold=0.2,
                      **kwargs)
    # drop half the embedding rows -> those docs must survive
    half = emb.filter(F.col("vec_id") % 2 == 0)
    part, cp = curate(docs, embeddings=half, semantic_threshold=0.2,
                      **kwargs)
    full_ids = {r["doc_id"] for r in full.select("doc_id").collect()}
    part_ids = {r["doc_id"] for r in part.select("doc_id").collect()}
    # every odd-id survivor of the lexical stages is retained
    lex, _ = curate(docs, embeddings=None, semantic_threshold=None,
                    **kwargs)
    lex_ids = {r["doc_id"] for r in lex.select("doc_id").collect()}
    odd_lex = {i for i in lex_ids if i % 2 == 1}
    assert odd_lex <= part_ids
    # docs WITH embeddings still dedup (stage can only remove)
    assert part_ids <= lex_ids
    assert cp["semantic_dedup"] <= cp["near_dedup"]
