"""Distributed BPE tokenizer training + application (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) — the tokenizer-training workload of an LLM data
pipeline, shaped for a 100 TB corpus.

The classic algorithm is a loop over the CORPUS; the scale observation
(used by every production trainer) is that BPE only depends on the
word-frequency table: word TYPES grow ~sqrt(corpus) (Heaps' law), so

1. ONE corpus-sized shuffle builds the (word, count) table — the
   pre-tokenizer is the same ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]``
   regex family as ops/text.token_count, so symbols/punctuation are
   their own single-char words and whitespace never enters a token;
2. every merge iteration then runs against the word-TYPE table only:
   - adjacent-pair counts weighted by word count: a narrow zip_with
     projection + one map-side-combined shuffle whose reduce side is
     bounded by the pair-type count,
   - the argmax pair is a ONE-ROW driver touch (count desc, then
     lexicographic (a, b) — fully deterministic),
   - the merge applies as ONE codegen'd string replace over the
     delimited symbol string (greedy left-to-right, non-overlapping —
     "aaa" + (a,a) -> [aa, a]), localCheckpoint-ed so iteration i+1
     never recomputes merges 1..i.

``merges_per_round > 1`` is the wall-clock lever for the thousands of
merges a real vocabulary needs: each round takes the top-k
SYMBOL-DISJOINT pairs from one pair-count shuffle and applies them in
one pass. Their folds commute (no shared symbols, and no selected
merge's output string collides with another's inputs), so the result
is a deterministic function of the data — the standard batched-BPE
approximation (equal to sequential BPE whenever the top-k are
independently ranked, which for skewed natural-language pair counts is
nearly always).

Application never loops over the corpus either: the trained merge list
re-segments the (much smaller) word-type table of the target corpus —
chunked JVM replace passes, no Python — and documents join their words'
segmentations back by word. OOV words cannot exist when applying to
the training corpus; on a NEW corpus its own word table is
re-segmented the same way, so there is no OOV path at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .algos import _ckpt

WORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
END = "</w>"

# r14: symbol sequences ride as DELIMITED STRINGS ("\x01sym\x02" per
# symbol) so a merge is ONE codegen'd string replace
# (\x01a\x02\x01b\x02 -> \x01ab\x02) instead of an interpreted
# higher-order F.aggregate fold per rule — the exact equivalence the
# DuckDB oracle replay has always relied on (greedy left-to-right
# non-overlapping replace == the per-symbol fold, because the \x01/\x02
# wrapping leaves adjacent matches no shared boundary characters).
# Corpus bytes that collide with the delimiters are escaped
# (\x00 -> \x00z, \x01 -> \x00a, \x02 -> \x00b — prefix escape, an
# injective concat-homomorphism), so the encoding is total: no guard
# pass, no fallback path. Pair counting decodes AFTER the pair-type
# aggregate, so ordering/argmax see raw symbols and the learned rule
# list is byte-identical to the r13 fold trainer's.
_S1, _S2 = "\x01", "\x02"


def _esc_py(s: str) -> str:
    return (s.replace("\x00", "\x00z")
            .replace("\x01", "\x00a").replace("\x02", "\x00b"))


def _encode_word(word: Column) -> Column:
    """word -> "\x01c1\x02\x01c2\x02...\x01</w>\x02" with per-char
    symbols (escape units stay whole) and the end-of-word marker."""
    esc = F.replace(
        F.replace(
            F.replace(word, F.lit("\x00"), F.lit("\x00z")),
            F.lit("\x01"), F.lit("\x00a")),
        F.lit("\x02"), F.lit("\x00b"))
    wrapped = F.regexp_replace(
        esc, "(?s)(\x00.|.)", "\x01$1\x02")
    return F.concat(wrapped, F.lit(_S1 + END + _S2))


def _decode_sym(s: Column) -> Column:
    return F.replace(
        F.replace(
            F.replace(s, F.lit("\x00a"), F.lit("\x01")),
            F.lit("\x00b"), F.lit("\x02")),
        F.lit("\x00z"), F.lit("\x00"))


def _split_syms(s: Column) -> Column:
    """Inverse of the wrapping for a non-empty symbol string: strip the
    outer delimiters, split on the inner ones (still escaped)."""
    return F.split(
        F.substring(s, 2, F.length(s) - 2), _S2 + _S1)


def _replace_chain(col: Column, rules: list[tuple[str, str]]) -> Column:
    """Apply ``rules`` in order as delimited-string replaces."""
    for a, b in rules:
        ea, eb = _esc_py(a), _esc_py(b)
        col = F.replace(
            col, F.lit(_S1 + ea + _S2 + _S1 + eb + _S2),
            F.lit(_S1 + ea + eb + _S2))
    return col


def word_counts(df: DataFrame, text_col: str = "text",
                min_count: int = 1) -> DataFrame:
    """(word, cnt) table — the one corpus-sized shuffle. ``min_count``
    prunes hapax legomena (at 100 TB most word types are junk seen
    once; pruning them shrinks every training iteration)."""
    w = df.select(
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(WORD_RE), 0)).alias("word")
    ).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        w = w.filter(F.col("cnt") >= min_count)
    return w


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word count: narrow zip_with +
    one map-side-combined shuffle (reduce side = pair types). Input
    carries the delimited symbol string ``s``; the pair columns come
    back DECODED (raw symbols) — decoding after the aggregate touches
    pair-type rows only, and the escape is injective so groups map
    1:1."""
    syms = _split_syms(F.col("s"))
    pairs = F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
        .select(_decode_sym(F.col("a")).alias("a"),
                _decode_sym(F.col("b")).alias("b"), "n")
    )


def train_bpe(
    df: DataFrame, n_merges: int = 50, text_col: str = "text",
    min_count: int = 1, merges_per_round: int = 1,
    checkpoint: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered rule list [(a, b), ...]; driver state is the rule list and
    one argmax row per round — never the word table."""
    words = word_counts(df, text_col, min_count).select(
        _encode_word(F.col("word")).alias("s"), "cnt"
    )
    words = _ckpt(words, checkpoint)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        k = min(merges_per_round, n_merges - len(merges))
        # top-k by weighted count, ties broken lexicographically; only
        # k rows ever reach the driver
        top = (
            _pair_counts(words)
            .filter(F.col("n") > 1)
            .orderBy(F.col("n").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(max(k * 4, k))  # headroom: some top rows conflict
            .collect()
        )
        if not top:
            break
        # symbol-disjoint subset so the k folds commute
        chosen: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            a, b = r["a"], r["b"]
            if len(chosen) == k:
                break
            if {a, b, a + b} & used:
                continue
            chosen.append((a, b))
            used.update((a, b, a + b))
        if not chosen:
            break
        words = _ckpt(
            words.select(
                _replace_chain(F.col("s"), chosen).alias("s"), "cnt"),
            checkpoint)
        merges.extend(chosen)
    return merges


def segment_words(
    words: DataFrame, merges: list[tuple[str, str]],
    word_col: str = "word", chunk: int = 128, checkpoint: bool = True,
) -> DataFrame:
    """Re-segment a word table under a trained merge list: chained
    delimited-string replaces (one codegen'd ``replace`` per rule —
    r14, previously an interpreted F.aggregate fold per rule),
    ``chunk`` rules per projection with a checkpoint between chunks
    (string replaces are shallow expressions, so the chunk is large).
    Output: (word_col, tokens array<string>)."""
    out = words.select(
        F.col(word_col), _encode_word(F.col(word_col)).alias("s"),
    )
    for i in range(0, len(merges), chunk):
        out = out.select(
            word_col,
            _replace_chain(F.col("s"), merges[i:i + chunk]).alias("s"),
        )
        if i + chunk < len(merges):
            out = _ckpt(out, checkpoint)
    return out.select(
        word_col,
        F.transform(_split_syms(F.col("s")), _decode_sym).alias("tokens"),
    )


def bpe_segment(
    df: DataFrame, merges: list[tuple[str, str]],
    id_col: str = "doc_id", text_col: str = "text",
    checkpoint: bool = True,
) -> DataFrame:
    """Tokenize documents: (id_col, tokens). The corpus explodes to
    (doc, position, word) once; segmentation happens on the DISTINCT
    word table and joins back by word (the word-keyed shuffle is the
    corpus-sized cost; the re-assembly groupBy(id) is the second).
    Word-internal token order survives re-assembly because positions
    order the flatten. Total over input ids: documents with no WORD_RE
    matches (empty/whitespace-only) come back with an empty token
    array rather than vanishing from the output."""
    doc_words = df.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(
            F.col(text_col), F.lit(WORD_RE), 0)).alias("pos", "word"),
    )
    seg = segment_words(
        doc_words.select("word").distinct(), merges,
        checkpoint=checkpoint,
    )
    toks = (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(F.flatten(F.array_sort(F.collect_list(
            F.struct(F.col("pos"), F.col("tokens"))
        )).getField("tokens")).alias("tokens"))
    )
    return df.select(id_col).join(toks, id_col, "left").select(
        id_col,
        F.coalesce(
            "tokens", F.array().cast("array<string>")).alias("tokens"),
    )


def bpe_token_count(
    df: DataFrame, merges: list[tuple[str, str]],
    id_col: str = "doc_id", text_col: str = "text",
    checkpoint: bool = True,
) -> DataFrame:
    """Tokens-per-document under a trained vocabulary — the corpus
    sizing number every training-data budget starts from. Skips
    re-assembly: join each word's token COUNT, sum per document.
    Output: (id_col, n_bpe_tokens) — total over input ids (wordless
    documents count 0)."""
    doc_words = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(WORD_RE), 0)).alias("word"),
    )
    seg = segment_words(
        doc_words.select("word").distinct(), merges,
        checkpoint=checkpoint,
    ).select("word", F.size("tokens").alias("_n"))
    counts = (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(F.sum("_n").cast("bigint").alias("n_bpe_tokens"))
    )
    return df.select(id_col).join(counts, id_col, "left").select(
        id_col,
        F.coalesce("n_bpe_tokens", F.lit(0).cast("bigint"))
        .alias("n_bpe_tokens"),
    )
