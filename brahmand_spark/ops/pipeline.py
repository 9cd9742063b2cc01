"""End-to-end corpus curation: the composition the individual operators
exist for — what a 100 TB training-data preparation job actually runs.

Stages (each a pure DataFrame transform; nothing collects rows):

1. language filter      (ops/text.lang_id — narrow, no shuffle)
2. quality filter       (ops/text.quality_score — narrow)
3. exact dedup          (ops/dedup.dedup_exact — one hash shuffle)
4. near-dup removal     (minhash LSH candidates -> connected components
                         over the candidate graph -> keep each
                         cluster's min id; the CC step makes removal
                         transitive, so A~B~C drops B and C even when
                         A~C was never a candidate pair)
5. deterministic split  (ops/sampling.deterministic_split)

The near-dup candidate graph is tiny relative to the corpus (only
colliding pairs), so the iterative CC runs on a skeleton — the standard
industrial recipe. ``report`` triggers one count per stage boundary;
skip it in production and observe counts from the sink instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .algos import connected_components
from .dedup import dedup_exact, minhash_lsh_candidates
from .sampling import deterministic_split
from .text import lang_id, quality_score


def near_dup_canonical_ids(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    est_threshold: float = 0.7, **lsh_kwargs,
) -> DataFrame:
    """Ids to DROP: for every near-duplicate cluster (connected
    component of the LSH candidate graph at ``est_threshold``), every
    member except the smallest id."""
    pairs = minhash_lsh_candidates(
        docs, id_col, text_col, **lsh_kwargs
    ).filter(F.col("est_jaccard") >= est_threshold)
    comps = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    keep = comps.groupBy("component").agg(F.min("id").alias("keep_id"))
    return (
        comps.join(keep, "component")
        .filter(F.col("id") != F.col("keep_id"))
        .select(F.col("id").alias(id_col))
    )


def curate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    languages: tuple[str, ...] = ("en",), min_quality: float = 0.3,
    est_threshold: float = 0.7,
    splits: dict[str, float] | None = None,
    redact: bool = False, max_pii_hits: int | None = None,
    reference: DataFrame | None = None, max_ppl: float | None = None,
    quality_model: str = "ngram", min_lr_score: float = 0.5,
    embeddings: DataFrame | None = None,
    semantic_threshold: float | None = None, semantic_k: int = 8,
    emb_id_col: str = "vec_id", emb_vec_col: str = "embedding",
    report: bool = False, seed: int = 42,
    url_col: str | None = None,
    domain_blocklist: list[str] | None = None,
    domain_allowlist: list[str] | None = None,
    max_docs_per_domain: int | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8, decontam_min_shared: int = 1,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation pipeline; returns (curated DataFrame with
    a ``split`` column, stage-count report — empty unless ``report``).

    With ``redact=True`` the surviving text is PII-scrubbed (the text
    column is REPLACED by the redacted version) and documents with more
    than ``max_pii_hits`` replacements are dropped entirely (None keeps
    all).

    With ``reference`` set, a LEARNED quality stage runs after the
    heuristic one (the CCNet recipe). ``quality_model='ngram'`` (with
    ``max_ppl``): a bigram LM trained on the reference corpus scores
    every surviving document and those with perplexity above
    ``max_ppl`` (not reference-like) are dropped.
    ``quality_model='lr'``: a hashed-feature logistic-regression
    classifier (ops/classifier) is trained reference-vs-survivors and
    documents scoring below ``min_lr_score`` are dropped.

    With ``embeddings`` + ``semantic_threshold`` set, a SEMANTIC dedup
    stage (ops/semdedup — SemDeDup, Abbas et al. 2023) runs after the
    lexical near-dedup: embeddings of the surviving documents are
    k-means-clustered and within-cluster cosine duplicates above the
    threshold are dropped (keep-first). Lexical LSH catches verbatim
    overlap; the embedding stage catches paraphrases the shingle
    hashes cannot see.

    With ``url_col`` set, the URL FRONT DOOR (ops/urls.curate_urls)
    runs FIRST — the CCNet/C4 ordering: normalize + URL-exact dedup,
    domain block/allow filtering, and an optional per-domain document
    cap, all before any text is inspected. The parsed
    ``url_norm``/``host``/``registered_domain`` columns ride along on
    the curated output.

    With ``benchmark`` set, a DECONTAMINATION stage (ops/dedup.
    decontaminate — the GPT-3 appendix-C flag-and-drop) runs after the
    dedup stages and before the split: documents sharing ≥
    ``decontam_min_shared`` distinct ``decontam_n``-word-gram shingles
    with any benchmark document are dropped."""
    counts: dict[str, int] = {}

    def note(stage: str, df: DataFrame) -> DataFrame:
        if report:
            counts[stage] = df.count()
        return df

    note("input", docs)
    if url_col is not None:
        from .urls import curate_urls

        docs = note("url", curate_urls(
            docs, url_col=url_col, id_col=id_col,
            blocklist=domain_blocklist, allowlist=domain_allowlist,
            max_docs_per_domain=max_docs_per_domain))
    lang = lang_id(docs, text_col, id_col).filter(
        F.col("pred_lang").isin(list(languages))
    ).select(id_col)
    out = note("language", docs.join(lang, id_col, "leftsemi"))
    qual = quality_score(out, text_col, id_col).filter(
        F.col("quality") >= min_quality
    ).select(id_col)
    out = note("quality", out.join(qual, id_col, "leftsemi"))
    if reference is not None and quality_model == "lr":
        from .classifier import quality_filter_lr

        out = note("learned_quality", quality_filter_lr(
            out, reference, min_score=min_lr_score,
            text_col=text_col, id_col=id_col))
    elif reference is not None and max_ppl is not None:
        from .ngram_lm import perplexity, train_ngram_lm

        model = train_ngram_lm(reference, n=2, text_col=text_col)
        keep_ppl = perplexity(
            out, model, n=2, text_col=text_col, id_col=id_col
        ).filter(F.col("ppl") <= max_ppl).select(id_col)
        out = note("perplexity", out.join(keep_ppl, id_col, "leftsemi"))
    out = note("exact_dedup", dedup_exact(out, [text_col], id_col))
    drops = near_dup_canonical_ids(
        out, id_col, text_col, est_threshold
    )
    out = note("near_dedup", out.join(drops, id_col, "left_anti"))
    if embeddings is not None and semantic_threshold is not None:
        from .semdedup import semdedup

        surviving = embeddings.join(
            out.select(F.col(id_col).alias(emb_id_col)),
            emb_id_col, "leftsemi",
        )
        keep_sem = (
            semdedup(surviving, k=semantic_k,
                     threshold=semantic_threshold,
                     id_col=emb_id_col, vec_col=emb_vec_col)
            .filter(F.col("keep"))
            .select(F.col(emb_id_col).alias(id_col))
        )
        # Documents with NO embedding row cannot be semantic
        # duplicates of anything — keep them (a coverage gap in the
        # embedding table must not become silent data loss).
        no_emb = out.select(id_col).join(
            embeddings.select(F.col(emb_id_col).alias(id_col)),
            id_col, "left_anti",
        )
        out = note(
            "semantic_dedup",
            out.join(keep_sem.unionByName(no_emb), id_col, "leftsemi"),
        )
    if benchmark is not None:
        from .dedup import decontaminate

        verdict = decontaminate(
            out, benchmark, id_col, text_col,
            n=decontam_n, min_shared=decontam_min_shared)
        keep_dc = verdict.filter(~F.col("contaminated")).select(id_col)
        out = note("decontaminate",
                   out.join(keep_dc, id_col, "leftsemi"))
    if redact:
        from .text import redact_pii

        red = redact_pii(out, text_col, id_col)
        if max_pii_hits is not None:
            red = red.filter(F.col("n_pii_hits") <= max_pii_hits)
        out = note("pii", out.drop(text_col).join(
            red.select(
                id_col, F.col("text_redacted").alias(text_col)
            ),
            id_col,
        ))
    out = deterministic_split(
        out, splits or {"train": 0.98, "val": 0.01, "test": 0.01},
        id_col, seed,
    )
    return out, counts
