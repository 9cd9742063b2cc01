"""Random-walk corpus generation — the DeepWalk / node2vec data step
(Perozzi et al. 2014, "DeepWalk: Online Learning of Social
Representations", KDD; Grover & Leskovec 2016): turn a graph into a
corpus of node sequences that skip-gram-style embedding trainers
consume exactly like sentences. This is where the engine's two halves
meet: the graph side supplies adjacency, the pipeline side treats the
walks as training documents (chunking, dedup, packing all apply).

Spark shape, deterministic by construction:

- neighbors are ranked per source once (`dense row_number` over the
  destination id — one shuffle, reused by every step);
- each walk step picks ``rank = H(walk_id, step) % degree`` where H is
  the md5-portable 60-bit hash — a seeded pseudo-random but fully
  deterministic choice, so the whole corpus is a pure function of
  (graph, n_walks, walk_length, seed): retries, partitioning, and
  engine replays (pure Python / DuckDB) all agree;
- a step is ONE equi-join of the frontier against the ranked adjacency
  (shuffle keyed by the current vertex), walk_length steps total —
  the same superstep shape as the iterative algorithms, lineage cut
  by localCheckpoint;
- dead ends (out-degree 0) terminate the walk early; the emitted
  sequence keeps the visited prefix, exactly like the reference
  implementations.

Driver state: none (no collects in the loop). Output:
``(walk_id, start, walk array<bigint>)`` — n_walks rows per start
vertex. At 100 TB-scale graphs the per-step shuffle is the cost, and
it is proportional to the number of LIVE walks, not the edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .algos import _ckpt
from .text import md5_hash60


def ranked_adjacency(
    edges: DataFrame, src: str = "src", dst: str = "dst",
) -> DataFrame:
    """(src, dst, rank, degree): each source's distinct neighbors
    ranked 0..degree-1 by ascending destination id — the indexable
    adjacency the walk step joins against. One shuffle on src; build
    once per graph and reuse across walk batches."""
    nbrs = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")) \
        .distinct()
    w = Window.partitionBy("u").orderBy("v")
    return nbrs.select(
        "u", "v",
        (F.row_number().over(w) - 1).alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy("u")).alias("degree"),
    )


def random_walks(
    edges: DataFrame, n_walks: int = 2, walk_length: int = 8,
    src: str = "src", dst: str = "dst", seed: int = 42,
    starts: DataFrame | None = None, checkpoint: bool = True,
) -> DataFrame:
    """Generate ``n_walks`` walks of up to ``walk_length`` steps from
    every vertex (or from ``starts``' ``id`` column). Returns
    (walk_id, start, walk) with walk[0] = start; walk_id is globally
    unique and stable (start * n_walks + walk index).

    The neighbor choice at step t is
    ``rank = md5_60('w:{seed}:' || walk_id || ':' || t) % degree`` —
    deterministic, uniform over neighbors, independent across steps
    and walks; every engine that can md5 replays the corpus
    bit-for-bit."""
    if n_walks < 1 or walk_length < 1:
        raise ValueError("n_walks and walk_length must be >= 1")
    adj = _ckpt(ranked_adjacency(edges, src, dst), checkpoint)
    if starts is None:
        starts = edges.select(F.col(src).alias("id")).union(
            edges.select(F.col(dst).alias("id"))).distinct()
    else:
        starts = starts.select(F.col("id"))
    state = starts.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("_w"),
        F.col("id").alias("start"),
    ).select(
        (F.col("start") * n_walks + F.col("_w")).alias("walk_id"),
        "start",
        F.array(F.col("start")).alias("walk"),
        F.col("start").alias("cur"),
        F.lit(True).alias("live"),
    )
    state = _ckpt(state, checkpoint)
    for t in range(1, walk_length):
        pick = (
            md5_hash60(F.concat(
                F.lit(f"w:{seed}:"), F.col("walk_id").cast("string"),
                F.lit(":"), F.lit(t).cast("string")))
            % F.col("degree")
        )
        stepped = (
            state.filter("live")
            .join(adj, state["cur"] == adj["u"], "left")
            .filter(F.col("u").isNull() | (F.col("rank") == pick))
            .select(
                "walk_id", "start",
                F.when(F.col("v").isNull(), F.col("walk"))
                .otherwise(F.concat("walk", F.array("v"))).alias("walk"),
                F.coalesce("v", "cur").alias("cur"),
                F.col("v").isNotNull().alias("live"),
            )
        )
        state = _ckpt(
            stepped.unionByName(state.filter(~F.col("live"))),
            checkpoint)
    return state.select("walk_id", "start", "walk")


def walks_as_documents(
    walks: DataFrame, sep: str = " ",
) -> DataFrame:
    """Render walks as text documents (doc_id, text) — the handoff to
    the pipeline half: token counting, chunking, dedup, packing, and
    skip-gram windowing all operate on these like any corpus."""
    return walks.select(
        F.col("walk_id").alias("doc_id"),
        F.array_join(F.transform(
            "walk", lambda x: x.cast("string")), sep).alias("text"),
    )


def skipgram_pairs(
    walks: DataFrame, window: int = 2,
) -> DataFrame:
    """(center, context, weight=1) training pairs from walks — the
    skip-gram extraction (every ordered pair within ``window`` hops
    along the walk). Narrow posexplode + self-zip inside each walk
    array; the only shuffle is the final pair-count aggregate."""
    if window < 1:
        raise ValueError("window must be >= 1")
    pos = walks.select(
        "walk_id",
        F.posexplode("walk").alias("i", "center"),
        F.col("walk"),
    )
    # the 1-based window around position i (0-based), excluding i
    # itself BY POSITION — a walk revisiting the center's vertex still
    # yields that legit (center, context=center) pair
    start = F.greatest(F.col("i") - window + 1, F.lit(1))
    end = F.least(F.col("i") + window + 1, F.size("walk"))
    left = F.slice(F.col("walk"), start, F.col("i") + 1 - start)
    right = F.slice(F.col("walk"), F.col("i") + 2, end - F.col("i") - 1)
    return (
        pos.select(
            "center",
            F.explode(F.concat(left, right)).alias("context"),
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )
