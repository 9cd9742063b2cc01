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
    from ..ops.similarity import _source_paths, ann_search

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
        corpus = spark.read.parquet(*paths)

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(ann_search(
            spark, name, batch_df, store, k=k, nprobe=nprobe,
            rerank=rerank, corpus=corpus, exclude_self=exclude_self),
            batch_id)

    return query_stream.writeStream.foreachBatch(handle)
