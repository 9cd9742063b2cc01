"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Extensions beyond the reference surface, designed 100 TB-first:

- Exact dedup is one hash-partitioned groupBy (map-side partial agg).
- N-gram Jaccard is the *exact* verifier: explode distinct shingles,
  self-join on shingle, count intersections. Quadratic in the worst case
  — at scale you run it only on LSH candidate pairs.
- MinHash+LSH is the scale path: per-doc signature (narrow, codegen),
  banding -> bucket join so only same-bucket docs are compared. All hash
  arithmetic is modular (< 2^62) to survive Spark 4 ANSI overflow checks.
- SimHash: 64-bit sign-of-weighted-votes fingerprint; near-dup = small
  Hamming distance, found via band-equality join (pigeonhole).
- Embedding near-dup: cosine over `array<float>` with JVM zip_with/
  aggregate (no UDF); brute-force pair join at test scale, LSH random
  hyperplanes at 100 TB (see similarity.py).

Everything is a pure DataFrame transform; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Mersenne prime 2^31-1: permutation values stay < 2^31, so
# a*h + b < 2^62 — inside int64 even under Spark ANSI overflow checks.
HASH_P = 2_147_483_647


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, key_cols: list[str],
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of rows identical on ``key_cols``: one row per duplicate
    group with the canonical (min) id and copy count. Single shuffle on
    the group key; partial aggregation happens map-side."""
    return (
        df.groupBy(*key_cols)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies", *key_cols)
    )


def dedup_exact(df: DataFrame, key_cols: list[str],
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (the min-id row) per duplicate group."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[id_col], how="leftsemi")


# --------------------------------------------------------------------------
# shingling + n-gram Jaccard (exact)
# --------------------------------------------------------------------------

def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM transform:
    slice a token array at every offset)."""
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle inverted index:
    explode distinct shingles -> self-join on shingle (one shuffle on the
    shingle key) -> per-pair intersection count -> |A∪B| = |A|+|B|-|A∩B|.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale note: worst case is quadratic in the largest posting list; at
    100 TB run this only on minhash_lsh_candidates output (same schema).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _perm_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, HASH_P - 1), rnd.randrange(0, HASH_P - 1))
            for _ in range(k)]


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = 64, seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    ((a_i * h(s) + b_i) mod p), h = xxhash64 folded non-negative.
    Narrow transform — no shuffle; all arithmetic stays < 2^62 so Spark
    ANSI mode never overflows."""
    sh = shingles(F.col(text_col), n)

    def min_perm(a: int, b: int) -> Column:
        # xxhash64 folded non-negative < 2^32 so a*h + b < 2^62 (ANSI-safe).
        # One-parameter lambda only: PySpark treats a second (even
        # defaulted) parameter as the element-index argument.
        return F.array_min(
            F.transform(
                sh,
                lambda s: F.pmod(
                    F.lit(a) * F.pmod(F.xxhash64(s), F.lit(HASH_P)) + F.lit(b),
                    F.lit(HASH_P),
                ),
            )
        )

    sig = F.array(*[
        min_perm(a, b) for (a, b) in _perm_params(num_hashes, seed)
    ])
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = 64, bands: int = 16, seed: int = 42,
) -> DataFrame:
    """LSH banding over MinHash signatures: split each signature into
    ``bands`` bands of ``num_hashes/bands`` rows, hash each band to a
    bucket, self-join per (band, bucket). Returns candidate pairs
    (id_a < id_b) with estimated Jaccard from full-signature agreement.

    One shuffle on (band, bucket); bucket sizes are near-uniform under
    hashing so the join is skew-resistant; AQE splits stragglers.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    banded = sigs.select(
        "id", "signature",
        F.posexplode(
            F.array(*[
                F.xxhash64(
                    F.concat_ws(",", *[
                        F.element_at("signature", b * rows + r + 1)
                        for r in range(rows)
                    ])
                )
                for b in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double") / F.lit(num_hashes), 6,
    )
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit SimHash: per-token xxhash64; each bit position votes
    +1/-1; fingerprint bit = sign of the vote sum. Pure
    aggregate/zip_with fold — JVM-side, no shuffle."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    zero = F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_BITS)
    def bit_votes(h):
        # bit positions unrolled as constants (shiftright needs int numBits)
        return F.array(*[
            F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1).cast("bigint"),
            ).otherwise(F.lit(-1).cast("bigint"))
            for i in range(SIMHASH_BITS)
        ])

    votes = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda x, y: x + y),
    )
    # Reassemble bits -> 4 × 16-bit chunk values (avoids 2^63 sign issues
    # and doubles as the Hamming-band key set).
    chunks = F.array(*[
        F.aggregate(
            F.slice(votes, c * 16 + 1, 16),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
        )
        for c in range(4)
    ])
    return df.select(F.col(id_col).alias("id"), chunks.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole over the 4 16-bit chunks —
    any pair within Hamming distance 3 shares ≥1 exact chunk, so a
    4-way chunk-equality join finds all such pairs; then exact Hamming
    distance filters. (max_hamming beyond 48 would need fewer/larger
    bands; default keeps recall for distance ≤ 3 exact.)"""
    sh = simhash(df, id_col, text_col)
    banded = sh.select(
        "id", "simhash",
        F.posexplode("simhash").alias("chunk_pos", "chunk_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.chunk_pos") == F.col("b.chunk_pos"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.aggregate(
        F.zip_with("sh_a", "sh_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine-similar pairs (id_a < id_b, cosine >= threshold).
    Brute-force O(n²) pair join — correct baseline for verification; the
    100 TB path buckets by random-hyperplane LSH first
    (similarity.hyperplane_lsh_pairs) and verifies with this cosine.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    v = v.withColumn("nrm", _norm(F.col("v")))
    a = v.alias("a")
    b = v.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
