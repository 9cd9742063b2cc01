"""Persisted ANN index (ops/similarity.build_ann_index/ann_search —
fit once, encode once, serve forever; VERDICT r6 #1): fresh-store
search is bit-identical to in-memory ivfpq_topk, the codes scan is
partition-pruned to the probed cells and reads only the code columns,
full-probe search matches the brute-force DuckDB cosine oracle
(folded-gate-strength value check), and the CALL vector.* surface
rides the same machinery."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from brahmand_spark.errors import CatalogError
from brahmand_spark.models import ModelStore
from brahmand_spark.ops.similarity import (
    ann_search, build_ann_index, ivfpq_topk,
)

from .conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


PARAMS = dict(n_cells=8, m=4, n_codes=8)


class TestBuildAndSearch:
    def test_fresh_store_search_matches_inmemory(self, spark, tmp_path):
        """build -> (fresh ModelStore over the same dir, i.e. a new
        session loading artifacts + codes from disk) -> search must
        equal in-memory ivfpq_topk bit-for-bit: the scoring body is
        shared and the codes round-trip parquet exactly."""
        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") < 5)
        st = ModelStore(str(tmp_path / "m"))
        params = build_ann_index(emb, "idx", st, **PARAMS)
        assert params["n_vectors"] > 0
        st2 = ModelStore(str(tmp_path / "m"))
        got = sorted(map(tuple, ann_search(
            spark, "idx", q, st2, k=5, nprobe=3, corpus=emb).collect()))
        want = sorted(map(tuple, ivfpq_topk(
            emb, q, k=5, nprobe=3, **PARAMS).collect()))
        assert got == want and len(got) > 0

    def test_search_scans_only_probed_cells_and_codes(
            self, spark, tmp_path):
        """The codes read must show a PartitionFilter on cell (probed
        set only — unprobed partitions are pruned at listing time) and
        a ReadSchema of just the code columns (corpus_id, codes,
        rnorm) — never a vector column."""
        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") < 2)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(emb, "idx", st, **PARAMS)
        out = ann_search(spark, "idx", q, st, k=3, nprobe=2, corpus=emb)
        plan = _plan(out)
        codes_scan = [
            block for block in plan.split("\n\n")
            if "idx.codes" in block and "Scan parquet" in block
        ]
        assert codes_scan, plan
        scan = codes_scan[0]
        assert "PartitionFilters" in scan and "cell" in scan.split(
            "PartitionFilters", 1)[1].split("\n")[0]
        read_schema = scan.split("ReadSchema:", 1)[1].split("\n")[0]
        assert "codes" in read_schema and "rnorm" in read_schema
        assert "embedding" not in read_schema
        # and the partition filter actually prunes: nprobe=2 of 8
        # cells -> fewer files listed than the full codes table
        import os
        total_cells = len([d for d in os.listdir(st.path + "/idx.codes")
                           if d.startswith("cell=")])
        assert total_cells > 2  # fixture spreads across cells

    def test_source_path_rerank(self, spark, tmp_path):
        """An index built with source_path can be searched without
        passing the corpus again — the re-rank reads the recorded
        vectors table."""
        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") < 3)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(
            emb, "idx", st,
            source_path=f"{SF_SMOKE}/embeddings.parquet", **PARAMS)
        a = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=4, nprobe=3).collect()))
        b = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=4, nprobe=3, corpus=emb).collect()))
        assert a == b and len(a) > 0

    def test_no_source_errors_loudly(self, spark, tmp_path):
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(_emb(spark), "idx", st, **PARAMS)
        with pytest.raises(ValueError, match="source_path"):
            ann_search(spark, "idx",
                       _emb(spark).limit(1), st, k=3)

    def test_wrong_kind_rejected(self, spark, tmp_path):
        st = ModelStore(str(tmp_path / "m"))
        st.save_lsh_planes("idx", [[0.1, 0.2]])
        with pytest.raises(CatalogError, match="ann_index"):
            ann_search(spark, "idx", _emb(spark).limit(1), st,
                       corpus=_emb(spark))

    def test_full_probe_matches_duckdb_brute_force(
            self, spark, duck, tmp_path):
        """Folded-gate-strength value check: with nprobe = n_cells and
        an over-large rerank the persisted-index search degrades to
        exact brute force, which DuckDB computes independently."""
        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") < 5)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(emb, "idx", st, **PARAMS)
        got = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=PARAMS["n_cells"],
            rerank=100000, corpus=emb).collect()))
        want = sorted(map(tuple, duck.execute("""
            WITH q AS (SELECT * FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                       round(list_cosine_similarity(
                           c.embedding::DOUBLE[],
                           q.embedding::DOUBLE[]), 6) AS cosine
                FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, corpus_id ASC) AS rank
                FROM scored)
            SELECT query_id, corpus_id, cosine, rank
            FROM ranked WHERE rank <= 5""").fetchall()))
        assert got == want and len(got) == 25


class TestAnnAdd:
    def test_incremental_add_matches_frozen_fit_search(
            self, spark, tmp_path):
        """build on half the corpus, ann_add the other half: the
        search over the grown index must equal in-memory ivfpq_topk
        over the FULL corpus with the half-fitted artifacts (codes
        are computed identically; the fits stay frozen)."""
        from brahmand_spark.ops.similarity import (
            ann_add, pq_fit, train_ivf_centroids,
        )

        emb = _emb(spark)
        half_a = emb.filter(F.col("vec_id") % 2 == 0)
        half_b = emb.filter(F.col("vec_id") % 2 == 1)
        q = emb.filter(F.col("vec_id") < 4)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(half_a, "idx", st, **PARAMS)
        before = st.load("idx", "ann_index")["params"]["n_vectors"]
        params = ann_add(spark, "idx", half_b, st)
        assert params["n_vectors"] > before
        got = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=3, corpus=emb).collect()))
        cents = train_ivf_centroids(half_a, PARAMS["n_cells"])
        books = pq_fit(half_a, PARAMS["m"], PARAMS["n_codes"])
        want = sorted(map(tuple, ivfpq_topk(
            emb, q, k=5, nprobe=3, centroids=cents, codebooks=books,
            **PARAMS).collect()))
        assert got == want and len(got) > 0

    def test_add_via_call(self, spark, tmp_path):
        from brahmand_spark import GraphSession

        s = GraphSession(spark, models_path=str(tmp_path / "vm"))
        for lbl, df in (
            ("Half", _emb(spark).filter(F.col("vec_id") % 2 == 0)),
            ("Rest", _emb(spark).filter(F.col("vec_id") % 2 == 1)),
        ):
            s.execute(f"CREATE NODE TABLE {lbl} (vec_id Int64, "
                      "NODE ID (vec_id))")
            s.register_table(lbl, df)
        s.execute("CALL vector.build_index('Half', 'g', 8, 4, 8)"
                  ).collect()
        n0 = s.model_store.load("g", "ann_index")["params"]["n_vectors"]
        out = s.execute("CALL vector.add('g', 'Rest')").collect()
        assert out[0]["n_vectors"] > n0


class TestCallSurface:
    def _session(self, spark, path):
        from brahmand_spark import GraphSession

        s = GraphSession(spark, models_path=str(path))
        s.execute("CREATE NODE TABLE Embedding (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Embedding", _emb(spark))
        s.execute("CREATE NODE TABLE Probe (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Probe",
                         _emb(spark).filter(F.col("vec_id") < 4))
        return s

    def test_build_then_search_via_call(self, spark, tmp_path):
        s = self._session(spark, tmp_path / "vm")
        meta = s.execute(
            "CALL vector.build_index('Embedding', 'vidx', 8, 4, 8)"
        ).collect()
        assert meta[0]["n_vectors"] > 0
        assert s.model_store.load("vidx", "ann_index")[
            "params"]["source_label"] == "Embedding"
        got = sorted(map(tuple, s.execute(
            "CALL vector.search('vidx', 'Probe', 5, 3) "
            "YIELD query_id, corpus_id, cosine, rank").collect()))
        want = sorted(map(tuple, ann_search(
            spark, "vidx", _emb(spark).filter(F.col("vec_id") < 4),
            s.model_store, k=5, nprobe=3, corpus=_emb(spark)).collect()))
        assert got == want and len(got) > 0
        # a FRESH session over the same store serves without rebuild
        s2 = self._session(spark, tmp_path / "vm")
        again = sorted(map(tuple, s2.execute(
            "CALL vector.search('vidx', 'Probe', 5, 3) "
            "YIELD query_id, corpus_id, cosine, rank").collect()))
        assert again == got


def test_exclude_self_opt_out(spark, tmp_path):
    """External query batches with unrelated id spaces must be able
    to retrieve a corpus row whose id collides with a query id (r7
    review): exclude_self=False keeps it."""
    emb = _emb(spark)
    st = ModelStore(str(tmp_path / "m"))
    build_ann_index(emb, "idx", st, **PARAMS)
    # a query VECTOR equal to corpus row 7's, but carrying id 7 in an
    # unrelated query-id space
    qvec = emb.filter(F.col("vec_id") == 7)
    with_self = ann_search(spark, "idx", qvec, st, k=3,
                           nprobe=PARAMS["n_cells"], corpus=emb,
                           exclude_self=False).collect()
    without = ann_search(spark, "idx", qvec, st, k=3,
                         nprobe=PARAMS["n_cells"], corpus=emb).collect()
    top_with = [r["corpus_id"] for r in with_self if r["rank"] == 1]
    assert top_with == [7]  # its own vector is the exact match
    assert all(r["corpus_id"] != 7 for r in without)


def test_wrong_query_dim_rejected(spark, tmp_path):
    """Mismatched query width would slice into garbage sub-vectors —
    it must raise, not mis-score (r7 review follow-up)."""
    emb = _emb(spark)
    st = ModelStore(str(tmp_path / "m"))
    build_ann_index(emb, "idx", st, **PARAMS)
    bad_q = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        ann_search(spark, "idx", bad_q, st, corpus=emb)


class TestAnnRemoveAndCompact:
    """Tombstone deletion for the ANN index (r8, mirroring the dedup
    index): removed vectors stop surfacing immediately; after a
    full-probe remove, results are bit-identical to scoring the
    remaining corpus with the SAME frozen artifacts."""

    def test_removed_vectors_stop_surfacing(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import (
            ann_remove, pq_fit, train_ivf_centroids,
        )

        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") < 4)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(emb, "idx", st, **PARAMS)
        before = ann_search(spark, "idx", q, st, k=5,
                            nprobe=PARAMS["n_cells"],
                            corpus=emb).collect()
        victims = sorted({r["corpus_id"] for r in before})[:2]
        n0 = st.load("idx", "ann_index")["params"]["n_vectors"]
        params = ann_remove(spark, "idx", victims, st)
        assert params["n_vectors"] == n0 - 2
        got = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=PARAMS["n_cells"],
            corpus=emb).collect()))
        assert not {r[1] for r in got} & set(victims)
        # bit-identity: in-memory ivfpq over corpus-minus-victims
        # with the same frozen fits
        from brahmand_spark.ops.similarity import ivfpq_topk

        cents = train_ivf_centroids(emb, PARAMS["n_cells"])
        books = pq_fit(emb, PARAMS["m"], PARAMS["n_codes"])
        remaining = emb.filter(~F.col("vec_id").isin(victims))
        want = sorted(map(tuple, ivfpq_topk(
            remaining, q, k=5, nprobe=PARAMS["n_cells"],
            centroids=cents, codebooks=books, **PARAMS).collect()))
        assert got == want and len(got) > 0

    def test_compact_then_search_unchanged(self, spark, tmp_path):
        import os

        from brahmand_spark.ops.similarity import ann_compact, ann_remove

        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") < 4)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(emb, "idx", st, **PARAMS)
        victims = [r["vec_id"] for r in emb.limit(3).collect()]
        ann_remove(spark, "idx", victims, st)
        mid = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=3, corpus=emb).collect()))
        params = ann_compact(spark, "idx", st)
        assert not os.path.exists(params["codes_path"] + ".deletes")
        after = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=3, corpus=emb).collect()))
        assert after == mid and len(after) > 0
        # codes table stays cell-partitioned after the swap
        assert any(d.startswith("cell=")
                   for d in os.listdir(params["codes_path"]))
        # idempotent: the compacted-away victims are no longer live,
        # so re-removing them (plus an absent id) is a no-op
        n1 = params["n_vectors"]
        assert ann_remove(spark, "idx", victims + [10**9],
                          st)["n_vectors"] == n1

    def test_add_rejects_tombstoned_ids(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add, ann_remove

        emb = _emb(spark)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(emb.filter(F.col("vec_id") % 2 == 0),
                        "idx", st, **PARAMS)
        ann_remove(spark, "idx", [0, 2], st)
        with pytest.raises(ValueError, match="tombstoned"):
            ann_add(spark, "idx",
                    emb.filter(F.col("vec_id").isin([0, 2])), st)

    def test_add_after_remove_counts_live_only(self, spark, tmp_path):
        """n_vectors must track LIVE vectors: ann_add counts its
        batch instead of re-counting the codes table, which would
        re-add tombstoned (not yet compacted) rows and undo
        ann_remove's decrement (review r8 pass 2)."""
        from brahmand_spark.ops.similarity import ann_add, ann_remove

        emb = _emb(spark)
        half_a = emb.filter(F.col("vec_id") % 2 == 0)
        half_b = emb.filter(F.col("vec_id") % 2 == 1).limit(3)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(half_a, "idx", st, **PARAMS)
        n0 = st.load("idx", "ann_index")["params"]["n_vectors"]
        ann_remove(spark, "idx", [0, 2], st)
        params = ann_add(spark, "idx", half_b, st)
        assert params["n_vectors"] == n0 - 2 + 3

    def test_compact_to_empty_refused(self, spark, tmp_path):
        """An all-tombstoned partitioned codes table must not swap in
        an empty (schema-less) write — compact refuses and the index
        stays readable (review r8 pass 2)."""
        from brahmand_spark.ops.similarity import ann_compact, ann_remove

        emb = _emb(spark).limit(10)
        st = ModelStore(str(tmp_path / "m"))
        p = build_ann_index(emb, "idx", st, **PARAMS)
        ann_remove(spark, "idx",
                   [r["vec_id"] for r in emb.collect()], st)
        with pytest.raises(ValueError, match="empty"):
            ann_compact(spark, "idx", st)
        # table still readable, tombstones still effective
        assert spark.read.parquet(p["codes_path"]).count() == 10
        got = ann_search(spark, "idx", _emb(spark).limit(2), st,
                         k=3, nprobe=PARAMS["n_cells"],
                         corpus=_emb(spark)).collect()
        assert all(r["corpus_id"] not in
                   {x["vec_id"] for x in emb.collect()} for r in got)

    def test_call_surface(self, spark, tmp_path):
        from brahmand_spark import GraphSession

        emb = _emb(spark)
        s = GraphSession(spark, models_path=str(tmp_path / "vm"))
        s.execute("CREATE NODE TABLE Embedding (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Embedding", emb)
        s.execute("CREATE NODE TABLE Victims (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Victims", emb.limit(2).select("vec_id"))
        s.execute("CALL vector.build_index('Embedding', 'vidx', "
                  "8, 4, 8)").collect()
        n0 = s.model_store.load(
            "vidx", "ann_index")["params"]["n_vectors"]
        out = s.execute(
            "CALL vector.remove('vidx', 'Victims')").collect()
        assert out[0]["n_vectors"] == n0 - 2
        out2 = s.execute("CALL vector.compact('vidx')").collect()
        assert out2[0]["n_vectors"] == n0 - 2


def test_filtered_search_matches_filtered_brute_force(
        spark, duck, tmp_path):
    """allowed_ids pre-filters the index BEFORE scoring: with a full
    probe + over-large rerank the filtered search equals brute-force
    cosine over the allowed subset (DuckDB), and k fills from allowed
    candidates only (a post-filter would under-fill)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    st = ModelStore(str(tmp_path / "m"))
    build_ann_index(emb, "idx", st, **PARAMS)
    allowed = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    got = sorted(map(tuple, ann_search(
        spark, "idx", q, st, k=4, nprobe=PARAMS["n_cells"],
        rerank=100000, corpus=emb, allowed_ids=allowed).collect()))
    want = sorted(map(tuple, duck.execute("""
        WITH q AS (SELECT * FROM embeddings WHERE vec_id < 3),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                   round(list_cosine_similarity(
                       c.embedding::DOUBLE[],
                       q.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings c, q
            WHERE c.vec_id <> q.vec_id AND c.vec_id % 3 = 0),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, corpus_id ASC) AS rank
            FROM scored)
        SELECT query_id, corpus_id, cosine, rank
        FROM ranked WHERE rank <= 4""").fetchall()))
    assert got == want and len(got) == 12
    assert all(r[1] % 3 == 0 for r in got)
    # and the CALL surface takes an allowed_label (7-arg form)
    from brahmand_spark import GraphSession

    s = GraphSession(spark, models_path=str(tmp_path / "m"))
    for lbl, df in (("Probe", q.select("vec_id", "embedding")),
                    ("Allowed", allowed)):
        s.execute(f"CREATE NODE TABLE {lbl} (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table(lbl, df)
    s.execute("CREATE NODE TABLE Corpus (vec_id Int64, "
              "NODE ID (vec_id))")
    s.register_table("Corpus", emb)
    doc = st.load("idx", "ann_index")
    doc["params"]["source_label"] = "Corpus"
    st.save("idx", "ann_index", doc["payload"], doc["params"])
    via_call = sorted(map(tuple, s.execute(
        "CALL vector.search('idx', 'Probe', 4, 8, 100000, true, "
        "'Allowed') YIELD query_id, corpus_id, cosine, rank"
    ).collect()))
    assert via_call == got


class TestAnnAddSourceCoverage:
    """r7 review: vectors added to an index with a RECORDED source
    must stay visible to recorded-source searches — ann_add demands
    the batch's source_path (sources accumulate; searches union
    them), and rejects wrong-width batches before persisting."""

    def test_add_requires_source_path_when_recorded(
            self, spark, tmp_path):
        emb = _emb(spark)
        half_a = emb.filter(F.col("vec_id") % 2 == 0)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(half_a, "idx", st,
                        source_path=f"{SF_SMOKE}/embeddings.parquet",
                        **PARAMS)
        from brahmand_spark.ops.similarity import ann_add

        with pytest.raises(ValueError, match="source_path"):
            ann_add(spark, "idx",
                    emb.filter(F.col("vec_id") % 2 == 1), st)

    def test_added_vectors_searchable_from_recorded_sources(
            self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add

        emb = _emb(spark)
        half_a = emb.filter(F.col("vec_id") % 2 == 0)
        half_b = emb.filter(F.col("vec_id") % 2 == 1)
        pa = str(tmp_path / "a.parquet")
        pb = str(tmp_path / "b.parquet")
        half_a.write.parquet(pa)
        half_b.write.parquet(pb)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(half_a, "idx", st, source_path=pa, **PARAMS)
        ann_add(spark, "idx", half_b, st, source_path=pb)
        # a query identical to an ADDED row must find it (cosine 1.0)
        q = half_b.limit(1)
        qid = q.collect()[0]["vec_id"]
        got = ann_search(spark, "idx", q, st, k=3,
                         nprobe=PARAMS["n_cells"],
                         exclude_self=False).collect()
        top = [r["corpus_id"] for r in got if r["rank"] == 1]
        assert top == [qid]

    def test_wrong_width_batch_rejected_before_persist(
            self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add

        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(_emb(spark), "idx", st, **PARAMS)
        n0 = st.load("idx", "ann_index")["params"]["n_vectors"]
        bad = spark.createDataFrame(
            [(9999, [0.1, 0.2])], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="dim"):
            ann_add(spark, "idx", bad, st)
        assert st.load("idx", "ann_index")["params"]["n_vectors"] == n0


class TestReindexAndStats:
    """r9 (VERDICT r8 Missing #2): ann_stats is the drift monitor —
    cell-occupancy histogram over the narrow codes table — and
    ann_reindex refits + re-encodes in place (write-swap, tombstones
    folded), recovering recall after skewed adds."""

    def _split(self, spark, tmp_path):
        """Base half + a DRIFTED half (negated-and-shifted vectors —
        a new region of embedding space the base fit never saw),
        both written as parquet so they can be recorded sources."""
        emb = _emb(spark).select("vec_id", "embedding")
        base = emb.filter(F.col("vec_id") % 2 == 0)
        drift = emb.filter(F.col("vec_id") % 2 == 1).select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.transform("embedding", lambda x: -x + F.lit(2.5))
            .cast("array<float>").alias("embedding"))
        bp = str(tmp_path / "base.pq")
        dp = str(tmp_path / "drift.pq")
        base.write.parquet(bp)
        drift.write.parquet(dp)
        return bp, dp

    def test_stats_histogram_counts_live(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_remove, ann_stats

        emb = _emb(spark)
        st = ModelStore(str(tmp_path / "m"))
        params = build_ann_index(emb, "idx", st, **PARAMS)
        hist = ann_stats(spark, "idx", st).collect()
        assert sum(r["n_live"] for r in hist) == params["n_vectors"]
        assert len(hist) <= PARAMS["n_cells"]
        victims = [r["vec_id"] for r in emb.limit(3).collect()]
        ann_remove(spark, "idx", victims, st)
        hist2 = ann_stats(spark, "idx", st).collect()
        assert sum(r["n_live"] for r in hist2) == \
            params["n_vectors"] - 3

    def test_reindex_no_drift_bit_identical(self, spark, tmp_path):
        """Reindexing an UNCHANGED corpus must reproduce the original
        artifacts and search results exactly (same seed, same
        deterministic k-means) — a safe no-op to schedule."""
        from brahmand_spark.ops.similarity import ann_reindex

        bp, _ = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "idx", st,
                        source_path=bp, **PARAMS)
        doc0 = st.load("idx", "ann_index")
        q = spark.read.parquet(bp).limit(5)
        before = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=3).collect()))
        params = ann_reindex(spark, "idx", st)
        doc1 = st.load("idx", "ann_index")
        assert doc1["payload"]["centroids"] == doc0["payload"]["centroids"]
        assert doc1["payload"]["codebooks"] == doc0["payload"]["codebooks"]
        assert params["n_vectors"] == doc0["params"]["n_vectors"]
        after = sorted(map(tuple, ann_search(
            spark, "idx", q, st, k=5, nprobe=3).collect()))
        assert after == before and len(after) > 0

    def test_reindex_recovers_recall_after_drift(self, spark, tmp_path):
        """The headline scenario: heavy skewed adds (frozen fits →
        one hot cell, coarse codes for the new region) tank recall
        vs exact cosine; ann_reindex refits from the CURRENT corpus
        and recall recovers. All seeded/deterministic."""
        from brahmand_spark.ops.similarity import (
            ann_add, ann_reindex, ann_stats, cosine_topk,
        )

        bp, dp = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "idx", st,
                        source_path=bp, n_cells=8, m=8, n_codes=16)
        ann_add(spark, "idx", spark.read.parquet(dp), st,
                source_path=dp)
        hist = {r["cell"]: r["n_live"]
                for r in ann_stats(spark, "idx", st).collect()}
        mean = sum(hist.values()) / len(hist)
        assert max(hist.values()) > 3 * mean  # visible drift skew
        queries = spark.read.parquet(dp).filter(
            F.col("vec_id") % 10 == 1).limit(20)
        full = spark.read.parquet(bp).unionByName(
            spark.read.parquet(dp))
        truth = {(r["query_id"], r["corpus_id"])
                 for r in cosine_topk(full, queries, k=5,
                                      id_col="vec_id",
                                      vec_col="embedding").collect()}

        def recall():
            got = {(r["query_id"], r["corpus_id"])
                   for r in ann_search(spark, "idx", queries, st,
                                       k=5, nprobe=4,
                                       rerank=60).collect()}
            return len(got & truth) / len(truth)

        r_before = recall()
        ann_reindex(spark, "idx", st)
        r_after = recall()
        # measured 0.21 -> 0.81 on the fixture; generous margins
        assert r_before < 0.5
        assert r_after >= 0.7
        assert r_after > r_before + 0.2
        # and the histogram is healthy again
        hist2 = {r["cell"]: r["n_live"]
                 for r in ann_stats(spark, "idx", st).collect()}
        mean2 = sum(hist2.values()) / len(hist2)
        assert max(hist2.values()) < 2 * mean2

    def test_reindex_folds_tombstones(self, spark, tmp_path):
        import os

        from brahmand_spark.ops.similarity import ann_reindex, ann_remove

        bp, _ = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        p0 = build_ann_index(spark.read.parquet(bp), "idx", st,
                             source_path=bp, **PARAMS)
        victims = [r["vec_id"] for r in
                   spark.read.parquet(bp).limit(3).collect()]
        ann_remove(spark, "idx", victims, st)
        params = ann_reindex(spark, "idx", st)
        assert not os.path.exists(params["codes_path"] + ".deletes")
        assert params["n_vectors"] == p0["n_vectors"] - 3
        live_ids = {r["corpus_id"] for r in spark.read.parquet(
            params["codes_path"]).select("corpus_id").collect()}
        assert not live_ids & set(victims)
        # swap kept the cell partitioning (search pruning intact)
        assert any(d.startswith("cell=")
                   for d in os.listdir(params["codes_path"]))

    def test_call_surface(self, spark, tmp_path):
        from brahmand_spark import GraphSession

        emb = _emb(spark)
        s = GraphSession(spark, models_path=str(tmp_path / "vm"))
        s.execute("CREATE NODE TABLE Embedding (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Embedding", emb)
        s.execute("CALL vector.build_index('Embedding', 'vidx', "
                  "8, 4, 8)").collect()
        hist = s.execute("CALL vector.stats('vidx')").collect()
        n0 = s.model_store.load(
            "vidx", "ann_index")["params"]["n_vectors"]
        assert sum(r["n_live"] for r in hist) == n0
        out = s.execute("CALL vector.reindex('vidx')").collect()
        assert out[0]["n_vectors"] == n0
        assert out[0]["n_cells"] == 8


class TestIngestStream:
    """r9: the streaming ingest half of the serving loop — raw
    vectors land under accepted_path/batch_id=N, codes join the index
    under batch=N via dynamic partition overwrite, so micro-batch
    replay is idempotent end to end."""

    def test_add_with_batch_key_replays_idempotently(
            self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add

        emb = _emb(spark).select("vec_id", "embedding")
        base = emb.filter(F.col("vec_id") % 2 == 0)
        extra = emb.filter(F.col("vec_id") % 2 == 1)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(base, "idx", st, **PARAMS)
        p1 = ann_add(spark, "idx", extra, st, batch_key="7")
        n1 = p1["n_vectors"]
        rows1 = spark.read.parquet(p1["codes_path"]).count()
        # replay (simulated crash before checkpoint commit)
        p2 = ann_add(spark, "idx", extra, st, batch_key="7")
        assert p2["n_vectors"] == n1
        assert spark.read.parquet(p2["codes_path"]).count() == rows1
        # search equals one-shot build over the union (frozen fits
        # aside, the row SET must be identical — no dup candidates)
        q = emb.limit(4)
        got = ann_search(spark, "idx", q, st, k=5,
                         nprobe=PARAMS["n_cells"], corpus=emb)
        assert got.groupBy("query_id", "corpus_id").count() \
            .filter(F.col("count") > 1).count() == 0

    def test_batch_key_validation(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add

        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(_emb(spark).limit(20), "idx", st, **PARAMS)
        one = _emb(spark).filter(F.col("vec_id") == 450)
        for bad in ("base", "a/b", ""):
            with pytest.raises(ValueError, match="batch_key"):
                ann_add(spark, "idx", one, st, batch_key=bad)

    def test_ingest_stream_grows_index_and_replays(
            self, spark, tmp_path):
        from brahmand_spark.streaming.vector import _ingest_batch

        emb = _emb(spark).select("vec_id", "embedding")
        base = emb.filter(F.col("vec_id") < 250)
        bp = str(tmp_path / "base.pq")
        base.write.parquet(bp)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "six", st,
                        source_path=bp, **PARAMS)
        n0 = st.load("six", "ann_index")["params"]["n_vectors"]
        acc = str(tmp_path / "accepted")
        wave = emb.filter((F.col("vec_id") >= 250)
                          & (F.col("vec_id") < 300))
        _ingest_batch(spark, "six", wave, 0, st, acc)
        params = st.load("six", "ann_index")["params"]
        assert params["n_vectors"] == n0 + 50
        assert acc in params["source_paths"]
        # replay: same batch, same id — nothing changes
        _ingest_batch(spark, "six", wave, 0, st, acc)
        params = st.load("six", "ann_index")["params"]
        assert params["n_vectors"] == n0 + 50
        assert params["source_paths"].count(acc) == 1
        assert spark.read.parquet(acc).count() == 50
        # a later batch stacks; the ingested vectors are SEARCHABLE
        # through the recorded sources (no corpus= needed)
        wave2 = emb.filter(F.col("vec_id") >= 300)
        _ingest_batch(spark, "six", wave2, 1, st, acc)
        q = emb.filter(F.col("vec_id") == 260)
        got = ann_search(spark, "six", q, st, k=3,
                         nprobe=PARAMS["n_cells"],
                         exclude_self=False).collect()
        assert [r["corpus_id"] for r in got if r["rank"] == 1] == [260]

    def test_ingest_stream_real_stream(self, spark, tmp_path):
        from brahmand_spark.streaming import ann_ingest_stream

        emb = _emb(spark).select("vec_id", "embedding")
        base = emb.filter(F.col("vec_id") < 400)
        bp = str(tmp_path / "base.pq")
        base.write.parquet(bp)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "rix", st,
                        source_path=bp, **PARAMS)
        n0 = st.load("rix", "ann_index")["params"]["n_vectors"]
        src = str(tmp_path / "vstream")
        emb.filter(F.col("vec_id") >= 400).write.parquet(src)
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>").parquet(src)
        q = ann_ingest_stream(spark, "rix", stream, st,
                              str(tmp_path / "acc")) \
            .option("checkpointLocation", str(tmp_path / "ck")) \
            .trigger(availableNow=True).start()
        q.awaitTermination(180)
        params = st.load("rix", "ann_index")["params"]
        assert params["n_vectors"] == n0 + emb.filter(
            F.col("vec_id") >= 400).count()


class TestAutoReindexTrigger:
    """r10: ann_add(reindex_skew=) — the maintenance auto-trigger.
    After the add, the cell-occupancy skew (max/mean live per cell)
    is measured; past the threshold the index refits in place from
    its recorded sources."""

    def _split(self, spark, tmp_path):
        return TestReindexAndStats._split(self, spark, tmp_path)

    def test_below_threshold_records_skew_only(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add

        bp, dp = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "idx", st,
                        source_path=bp, n_cells=8, m=8, n_codes=16)
        fits0 = st.load("idx", "ann_index")["payload"]
        params = ann_add(spark, "idx", spark.read.parquet(dp), st,
                         source_path=dp, reindex_skew=1000.0)
        assert params["reindexed"] is False
        assert params["last_skew"] > 1.0
        # fits untouched below the threshold
        assert st.load("idx", "ann_index")["payload"] == fits0

    def test_skewed_add_triggers_inplace_reindex(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add, ann_stats

        bp, dp = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "idx", st,
                        source_path=bp, n_cells=8, m=8, n_codes=16)
        fits0 = st.load("idx", "ann_index")["payload"]
        params = ann_add(spark, "idx", spark.read.parquet(dp), st,
                         source_path=dp, reindex_skew=2.0)
        assert params["reindexed"] is True
        assert params["last_skew"] > 2.0
        doc = st.load("idx", "ann_index")
        assert doc["payload"] != fits0          # refit happened
        assert doc["params"]["batch_counts"] == {}  # folded to base
        hist = {r["cell"]: r["n_live"]
                for r in ann_stats(spark, "idx", st).collect()}
        mean = sum(hist.values()) / len(hist)
        assert max(hist.values()) < 2 * mean     # healthy again
        # search keeps working against the reindexed table
        q = spark.read.parquet(dp).limit(3)
        assert ann_search(spark, "idx", q, st, k=3, nprobe=4).count() > 0

    def test_trigger_without_sources_fails_fast(self, spark, tmp_path):
        from brahmand_spark.ops.similarity import ann_add

        st = ModelStore(str(tmp_path / "m"))
        params0 = build_ann_index(_emb(spark), "idx", st, **PARAMS)
        batch = _emb(spark).select(
            (F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
        with pytest.raises(ValueError, match="record source"):
            ann_add(spark, "idx", batch, st, reindex_skew=3.0)
        # failed BEFORE any write
        assert st.load("idx", "ann_index")["params"]["n_vectors"] == \
            params0["n_vectors"]
        with pytest.raises(ValueError, match="exceed 1.0"):
            ann_add(spark, "idx", batch, st, reindex_skew=0.5)

    def test_trigger_requires_source_path_on_call(self, spark, tmp_path):
        """r11 (r10 advice): with reindex_skew set, the CURRENT add
        must carry source_path — if the trigger fires, ann_reindex
        rebuilds from recorded sources only and an unsourced batch
        would be silently dropped (while the add reported success)."""
        from brahmand_spark.ops.similarity import ann_add

        bp, dp = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        params0 = build_ann_index(spark.read.parquet(bp), "idx", st,
                                  source_path=bp, n_cells=8, m=8,
                                  n_codes=16)
        with pytest.raises(ValueError, match="requires source_path"):
            ann_add(spark, "idx", spark.read.parquet(dp), st,
                    reindex_skew=2.0)
        # failed BEFORE any write
        assert st.load("idx", "ann_index")["params"]["n_vectors"] == \
            params0["n_vectors"]

    def test_trigger_rejects_unsourced_history(self, spark, tmp_path):
        """r11 (r10 advice): an index holding rows NOT covered by any
        recorded source (built anonymously, then a later add recorded
        a path) refuses the auto-trigger — a reindex would drop the
        anonymous rows."""
        from brahmand_spark.ops.similarity import ann_add

        bp, dp = self._split(spark, tmp_path)
        st = ModelStore(str(tmp_path / "m"))
        build_ann_index(spark.read.parquet(bp), "idx", st,
                        n_cells=8, m=8, n_codes=16)  # no source_path
        # a sourced add joins the source list, but the base rows stay
        # uncovered: fully_sourced must remain False
        ann_add(spark, "idx", spark.read.parquet(dp), st, source_path=dp)
        assert st.load("idx", "ann_index")["params"]["fully_sourced"] \
            is False
        with pytest.raises(ValueError, match="not covered"):
            ann_add(spark, "idx", spark.read.parquet(dp), st,
                    source_path=dp, reindex_skew=2.0)
        # an explicit full reindex from recorded sources restores the
        # covered state, re-enabling the trigger
        from brahmand_spark.ops.similarity import ann_reindex

        ann_reindex(spark, "idx", st)
        assert st.load("idx", "ann_index")["params"]["fully_sourced"] \
            is True

    def test_call_surface_trigger(self, spark, tmp_path):
        """CALL vector.add(..., reindex_skew) assembles the reindex
        corpus from the recorded source LABELS."""
        from brahmand_spark import GraphSession

        bp, dp = self._split(spark, tmp_path)
        s = GraphSession(spark, models_path=str(tmp_path / "vm"))
        for lbl, path in (("Base", bp), ("Drift", dp)):
            s.execute(f"CREATE NODE TABLE {lbl} (vec_id Int64, "
                      "NODE ID (vec_id))")
            s.register_table(lbl, spark.read.parquet(path))
        s.execute("CALL vector.build_index('Base', 'vidx', 8, 8, 16)")
        out = s.execute(
            "CALL vector.add('vidx', 'Drift', 'vec_id', 'embedding', "
            "2.0)").collect()[0]
        assert out["reindexed"] is True and out["last_skew"] > 2.0
        hits = s.execute(
            "CALL vector.search('vidx', 'Drift', 3, 4)").count()
        assert hits > 0
