"""Streaming vector search over a PERSISTED ANN index (r7).

A query stream cannot run :func:`ops.similarity.ann_search` directly —
the per-batch probe-cell pruning is a driver collect and the top-k is
a window, both batch constructs. The canonical Spark shape is
``foreachBatch``: each micro-batch of queries is a small BATCH frame,
so the exact batch search runs unchanged per batch — including the
partition pruning, which now prunes to the cells THIS batch probes
(tighter than any static plan could be). Results land through a
caller-supplied sink callable.

State: none (the index is static parquet + kilobyte artifacts; every
micro-batch is independent), so restarts are trivially safe.
"""

from __future__ import annotations

from typing import Callable, Optional


def ann_search_stream(
    spark, name: str, query_stream, store,
    sink: Callable, k: int = 10, nprobe: int = 4,
    rerank: Optional[int] = None, corpus=None,
    exclude_self: bool = True,
):
    """Run the persisted-index ANN search over a STREAM of query
    batches: ``sink(result_df, batch_id)`` is invoked per micro-batch
    with the same (query_id, corpus_id, cosine, rank) frame the batch
    :func:`ann_search` returns. Returns the ``DataStreamWriter`` —
    call ``.start()`` (optionally after ``.trigger(...)``/
    ``.option("checkpointLocation", ...)``)."""
    from ..ops.similarity import _read_sources, _source_paths, ann_search

    # per-stream constants resolve ONCE, not per micro-batch: the
    # re-rank corpus handle (store.load + parquet open would otherwise
    # repeat every trigger on a latency-sensitive path)
    if corpus is None:
        params = store.load(name, "ann_index")["params"]
        paths = _source_paths(params)
        if not paths:
            raise ValueError(
                f"index '{name}' has no recorded source_path; pass "
                f"corpus= for the exact re-rank")
        corpus = _read_sources(spark, paths)

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(ann_search(
            spark, name, batch_df, store, k=k, nprobe=nprobe,
            rerank=rerank, corpus=corpus, exclude_self=exclude_self),
            batch_id)

    return query_stream.writeStream.foreachBatch(handle)


def _ingest_batch(spark, name: str, batch_df, batch_id: int, store,
                  accepted_path: str) -> None:
    """One idempotent micro-batch of :func:`ann_ingest_stream`:

    1. persist the batch's RAW vectors under their own
       ``batch_id=N`` partition of ``accepted_path`` (overwrite —
       a replay rewrites identical content), so the index's exact
       re-rank can read them forever;
    2. encode + add the codes under ``batch_key=str(batch_id)`` —
       :func:`~brahmand_spark.ops.similarity.ann_add` dynamically
       overwrites only this batch's (cell, batch) partitions, so a
       crash-replayed micro-batch corrects ``n_vectors`` instead of
       duplicating rows.

    ``accepted_path`` joins the index's recorded sources ONCE (the
    root is partition-discovered, so every later batch is visible to
    recorded-source searches without re-recording). The batch key is
    scoped by a hash of ``accepted_path`` — a restart on the SAME
    checkpoint replays the same keys (idempotence), while a second
    ingest stream with its own accepted root can never overwrite
    this one's batches (r9 review)."""
    import hashlib

    from ..ops.similarity import _source_paths, ann_add

    if batch_df.isEmpty():
        return
    params = store.load(name, "ann_index")["params"]
    if not _source_paths(params):
        raise ValueError(
            f"index '{name}' records no source paths — streaming "
            f"ingest would make accepted_path the ONLY source and "
            f"recorded-source searches would silently drop every "
            f"base-corpus result (the re-rank join needs the raw "
            f"vectors); rebuild with source_path= (r9 review)")
    sub = f"{accepted_path}/batch_id={batch_id}"
    batch_df.write.mode("overwrite").parquet(sub)
    run = hashlib.md5(accepted_path.encode()).hexdigest()[:8]
    # ann_add records accepted_path on the first batch and ignores
    # the (already-listed) repeat on every later one
    ann_add(spark, name, spark.read.parquet(sub), store,
            batch_key=f"{run}-{batch_id}", source_path=accepted_path)


def ann_ingest_stream(
    spark, name: str, vec_stream, store, accepted_path: str,
):
    """Grow a persisted ANN index from a VECTOR STREAM — the ingest
    half of the serving loop (``ann_search_stream`` is the query
    half): per micro-batch, the raw vectors land replay-idempotently
    under ``accepted_path/batch_id=N`` and their codes join the
    index under the same batch key, so recovery after a crash
    between the two writes (or before the checkpoint commit) cannot
    duplicate either side. The index must have been built with the
    r9 (cell, batch) layout (any fresh ``build_ann_index``).

    Returns the ``DataStreamWriter`` — call ``.start()`` with a
    durable ``checkpointLocation``. Fit drift under long-running
    ingest is the ``ann_stats`` / ``ann_reindex`` maintenance story
    (the reindex rewrites what this loop appended — pause the stream
    across it, like dedup compaction)."""

    def handle(batch_df, batch_id: int) -> None:
        _ingest_batch(spark, name, batch_df, batch_id, store,
                      accepted_path)

    return vec_stream.writeStream.foreachBatch(handle)
