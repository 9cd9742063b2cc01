"""SemDeDup — semantic deduplication via k-means + within-cluster cosine
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540).

Embedding-space near-dup removal at corpus scale cannot afford the
all-pairs cosine join; SemDeDup's observation is that semantic
duplicates land in the same k-means cluster of a good embedding model,
so the quadratic work is confined WITHIN clusters:

1. fit k-means over the embedding column (``ops/clustering.kmeans_fit``
   — the only driver state is the k x dim centroid matrix, refreshed
   once per Lloyd's iteration);
2. assign every vector its nearest centroid — a narrow JVM projection,
   no shuffle (``similarity.ivf_cell`` argmax against centroid
   literals);
3. within-cluster exact cosine >= threshold. Per-cluster work is
   O(n_c^2): the paper's contract is that k grows with the corpus
   (they use k = 11,000 for LAION) so clusters stay bounded; a skewed
   giant cluster means k is too small (or run a second k-means level
   inside the hot cluster). For the DECISION (:func:`semdedup`), the
   quadratic stage runs as NumPy matmuls over grouped Arrow batches
   with oversized clusters split into block pairs
   (:func:`_dropped_ids_arrow` — r15, guide §4.2/§2.5); the
   pair-producing API (:func:`semdedup_pairs`) keeps the JVM
   cluster-keyed join, whose strategy is deliberately left to
   Catalyst + AQE.
4. drop every vector that has a LOWER-ID near-duplicate in its
   cluster ("keep first" greedy — deterministic, partition- and
   engine-independent). The paper keeps the item farthest from the
   centroid; the min-id rule keeps the pipeline a pure function of
   the data. For transitive duplicate GROUPS instead of the greedy
   rule, feed ``semdedup_pairs`` into
   ``ops/algos.connected_components`` exactly like the MinHash-LSH
   stage of ``ops/pipeline.curate_corpus``.

100 TB posture: fit touches the driver with k x dim floats only;
assignment is shuffle-free; the pair join shuffles (id, vector) keyed
by cluster once AQE sees a corpus-sized input. No all-pairs stage
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import kmeans_assign, kmeans_fit
from .similarity import _as_double, dot, ivf_cell, norm

# auto-k bounds: k >= K_MIN keeps tiny corpora from degenerating to
# one cluster; k <= K_MAX bounds the driver-side centroid matrix
# (K_MAX x dim floats — 64k x 768 doubles = ~400 MB, the practical
# ceiling for broadcast centroid literals).
K_MIN = 8
K_MAX = 65_536

# r15 (guide §2.5): rows per SIDE of a within-cluster pair block in
# the Arrow drop path. A cluster larger than this splits into
# ceil(n / cap) hash blocks and every unordered block pair becomes its
# own task — a dense hot cell parallelizes into ~m^2/2 tasks instead
# of serializing one quadratic straggler, at the cost of shipping each
# row m times (m copies of ~0.5 KB vs an O(n) gram-matrix slab).
_PAIR_BLOCK_ROWS = 2048
# A-side rows per matmul slice inside a task — bounds the gram slab at
# _MM_SLICE x (2 * _PAIR_BLOCK_ROWS) doubles (~64 MB peak incl. masks).
_MM_SLICE = 1024


def _auto_k(df: DataFrame, id_col: str) -> int:
    """k ≈ ceil(sqrt(N)) (clamped to [K_MIN, K_MAX]) — the sizing the
    SemDeDup contract needs: expected cluster size ~sqrt(N), so total
    within-cluster pair work is k * (N/k)^2 = N^1.5 instead of the
    N^2/k of a FIXED k as the corpus grows (r10 sf1 soak measured
    exactly that: 0.99x per unit of quadratic workload with k pinned
    while everything else amortized). One count() — the same pass a
    caller sizing k by hand would run."""
    import math

    n = df.select(id_col).count()
    return min(max(K_MIN, math.ceil(math.sqrt(max(n, 1)))), K_MAX)


def semdedup_pairs(
    df: DataFrame, centroids: list[list[float]],
    threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (cluster, id_a, id_b,
    cosine) with id_a < id_b and round(cosine, 6) >= threshold.
    The join is keyed by the cluster id — the only shuffle at scale
    (AQE broadcasts instead when a side is small)."""
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).select(
        "id", "v",
        ivf_cell(F.col("v"), centroids).alias("cluster"),
        norm(F.col("v"), dim).alias("nrm"),
    )
    return _pairs_from_labeled(v, threshold, dim)


def semdedup_labels(
    df: DataFrame, k: int | None = None, iters: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_cluster_size: int = 10_000, max_depth: int = 3,
    _prefix: str = "", _depth: int = 0,
) -> DataFrame:
    """Hierarchical cluster labels with a size cap — the "second-level
    k-means inside the hot cluster" escape hatch made real. Fit +
    assign as usual, then any cluster larger than ``max_cluster_size``
    is re-clustered by a fresh k-means ON ITS MEMBERS ONLY, recursively
    up to ``max_depth`` levels; labels are dotted paths ('3', '3.1',
    '3.1.0', ...). Guarantees every leaf is <= max_cluster_size unless
    the depth cap (or an unsplittable point mass) stops the recursion —
    so the downstream O(leaf^2) pair join is bounded no matter how
    skewed the embedding space is.

    Driver state per level: <= k (cluster, count) rows + the k x dim
    centroid refreshes of the fits. Deterministic: lowest-id k-means
    init, and membership subsets are pure functions of the data. At
    100 TB, localCheckpoint the input per level if lineage depth ever
    bites; the recursion itself only ever scans the hot subset.
    ``k=None`` auto-sizes ceil(sqrt(N)) exactly like :func:`semdedup`."""
    if k is None:
        k = _auto_k(df, id_col)
    sub_k = min(k, max(2, max_cluster_size))
    centroids = kmeans_fit(df, sub_k, iters, id_col, vec_col)
    assigned = kmeans_assign(df, centroids, id_col, vec_col) \
        .select(id_col, "cluster")
    sizes = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hot = sorted(
        c for c, n in sizes.items()
        if n > max_cluster_size and _depth + 1 < max_depth and n > sub_k)
    label = F.concat(
        F.lit(_prefix), F.col("cluster").cast("string")).alias("cluster")
    out = assigned.filter(~F.col("cluster").isin(hot)) \
        .select(id_col, label)
    for c in hot:
        members = assigned.filter(F.col("cluster") == c).select(id_col)
        sub = semdedup_labels(
            df.join(members, id_col, "leftsemi"), k, iters, id_col,
            vec_col, max_cluster_size, max_depth,
            _prefix=f"{_prefix}{c}.", _depth=_depth + 1,
        )
        out = out.unionByName(sub)
    return out


def _dropped_ids_arrow(
    v: DataFrame, threshold: float,
    block_rows: int = _PAIR_BLOCK_ROWS,
) -> DataFrame:
    """Distinct ids that have a LOWER-id near-duplicate in their
    cluster — the only thing :func:`semdedup` needs from the pair
    stage — computed per cluster with NumPy matmuls over grouped
    Arrow batches instead of the per-pair interpreted HOF-dot join
    (guide §4.2: hand whole batches to vectorized native code; the
    r14 profile put ~23 s of the sf1 gate's 28 s in that join, on 8
    join keys). One shuffle keyed by (cluster, block-pair) replaces
    the join's two cluster-keyed shuffles; clusters over
    ``block_rows`` rows split into hash blocks so a dense cell
    parallelizes instead of serializing one quadratic task
    (guide §2.5). Arithmetic parity with the JVM path: float64
    matmul (sequential-fold differences land far below the
    round-to-6 comparison), HALF_UP rounding like ``F.round``, and
    NaN cosines (zero-norm pairs) qualify — matching the DuckDB
    oracle's (and non-ANSI Spark's) NaN-above-every-double ordering;
    under ANSI the JVM join path raises DIVIDE_BY_ZERO on such pairs,
    so this path is defined where that one was not. Fixed-dim
    vectors assumed (embeddings).
    Input: (id, v, cluster); output: (_dropped_id), distinct."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [StructField("_dropped_id", v.schema["id"].dataType)])
    thr = float(threshold)
    mm_slice = _MM_SLICE

    def fn(key, pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["id"].to_numpy()
        X = np.array(pdf["v"].to_list(), dtype=np.float64)
        nrm = np.sqrt(np.einsum("ij,ij->i", X, X))
        lo, hi = key[1], key[2]
        if lo == hi:
            sides = [(ids, X, nrm, ids, X, nrm)]
        else:
            a = (pdf["_blk"] == lo).to_numpy()
            b = ~a
            sides = [(ids[a], X[a], nrm[a], ids[b], X[b], nrm[b]),
                     (ids[b], X[b], nrm[b], ids[a], X[a], nrm[a])]
        dropped = []
        for ia, Xa, na, ib, Xb, nb in sides:
            if not len(ia) or not len(ib):
                continue
            hit = np.zeros(len(ib), dtype=bool)
            for s in range(0, len(ia), mm_slice):
                e = s + mm_slice
                with np.errstate(divide="ignore", invalid="ignore"):
                    C = (Xa[s:e] @ Xb.T) / np.outer(na[s:e], nb)
                # HALF_UP like F.round; NaN >= thr is TRUE in Spark
                R = np.floor(C * 1e6 + 0.5) / 1e6
                q = (R >= thr) | np.isnan(C)
                hit |= (q & (ia[s:e, None] < ib[None, :])).any(axis=0)
            dropped.append(ib[hit])
        if not dropped:
            return pd.DataFrame({"_dropped_id": []})
        return pd.DataFrame({"_dropped_id": np.concatenate(dropped)})

    counts = v.groupBy("cluster").agg(F.count(F.lit(1)).alias("_n"))
    ex = (
        v.join(F.broadcast(counts), "cluster")
        .withColumn("_m", F.greatest(
            F.ceil(F.col("_n") / F.lit(block_rows)), F.lit(1).cast("long")))
        .withColumn("_blk", F.pmod(F.xxhash64("id"), F.col("_m")))
        .select(
            "cluster", "id", "v", "_blk",
            F.explode(F.sequence(
                F.lit(0).cast("long"), F.col("_m") - 1)).alias("_j"))
        .select(
            "cluster", "id", "v", "_blk",
            F.least("_blk", "_j").alias("_lo"),
            F.greatest("_blk", "_j").alias("_hi"))
    )
    return (
        ex.groupBy("cluster", "_lo", "_hi")
        .applyInPandas(fn, out_schema)
        .distinct()
    )


def _pairs_from_labeled(
    v: DataFrame, threshold: float, dim: int | None,
) -> DataFrame:
    """Near-dup pairs from an already-labeled (id, v, cluster, nrm)
    view — the one cluster-keyed shuffle."""
    a, b = v.alias("a"), v.alias("b")
    cos = F.round(
        dot(F.col("a.v"), F.col("b.v"), dim)
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.cluster").alias("cluster"),
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semdedup(
    df: DataFrame, k: int | None = None, iters: int = 3,
    threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int | None = None,
    max_cluster_size: int | None = None, max_depth: int = 3,
) -> DataFrame:
    """Full SemDeDup decision per vector: (id_col, cluster, keep).
    ``keep`` is false iff some lower-id vector in the same cluster has
    cosine >= threshold. At scale, fit once (persist the centroids)
    and re-run the decision incrementally on arriving data with
    ``semdedup_pairs`` against the stored centroids.

    ``k=None`` (the r11 default) auto-sizes ``k = clamp(ceil(sqrt(N)),
    8, 65536)`` so cluster sizes — and with them the within-cluster
    quadratic pair work — stay ~sqrt(N) as the corpus grows instead
    of growing linearly under a fixed k; pass an explicit k to pin it
    (reproducibility against a stored decision).

    ``max_cluster_size`` switches on the recursive hot-cluster split
    (``semdedup_labels``): clusters over the cap are re-clustered
    within themselves up to ``max_depth`` levels, so the per-cluster
    quadratic pair join stays bounded under embedding skew. The
    cluster column is then a dotted hierarchical STRING label instead
    of an int."""
    if k is None:
        k = _auto_k(df, id_col)
    if max_cluster_size is not None:
        labels = semdedup_labels(df, k, iters, id_col, vec_col,
                                 max_cluster_size, max_depth)
        v = df.select(
            F.col(id_col).alias("id"),
            _as_double(F.col(vec_col)).alias("v"),
        ).join(labels.withColumnRenamed(id_col, "id"), "id") \
            .select("id", "v", "cluster")
        dropped = _dropped_ids_arrow(v, threshold)
        return (
            labels.join(
                dropped, labels[id_col] == dropped["_dropped_id"], "left"
            )
            .select(
                id_col, "cluster",
                F.col("_dropped_id").isNull().alias("keep"),
            )
        )
    centroids = kmeans_fit(df, k, iters, id_col, vec_col)
    # drop decision via the grouped-Arrow matmul path (r15, guide
    # §4.2/§2.5 — see _dropped_ids_arrow); semdedup_pairs stays the
    # JVM join for callers that consume the pairs themselves
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).select("id", "v", ivf_cell(F.col("v"), centroids).alias("cluster"))
    dropped = _dropped_ids_arrow(v, threshold)
    assigned = kmeans_assign(df, centroids, id_col, vec_col)
    return (
        assigned.join(
            dropped, assigned[id_col] == dropped["_dropped_id"], "left"
        )
        .select(
            id_col, "cluster",
            F.col("_dropped_id").isNull().alias("keep"),
        )
    )
