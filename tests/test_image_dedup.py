"""Image perceptual-hash near-dup (ops/multimodal.image_phash /
image_near_dup_pairs — VERDICT r6 #4): hash bits match a numpy
replay, pigeonhole pairing is COMPLETE at the requested Hamming bound
(brute-force check, mirroring test_simhash), the banding/hamming
arithmetic replays in DuckDB, and decode failures quarantine as NULL
instead of fabricating a hash."""

from __future__ import annotations

import numpy as np
import pytest

from brahmand_spark.ops.multimodal import (
    _block_mean_resize, _phash_bits, image_near_dup_pairs, image_phash,
)

from .test_ops import _encode_png


def _rng_image(seed: int, h: int = 16, w: int = 16):
    rnd = np.random.RandomState(seed)
    return rnd.randint(0, 256, size=(h, w)).astype("uint8")


def _perturb(arr, n_pixels: int, seed: int):
    """Flip a few pixels — a near-duplicate by construction."""
    out = arr.copy()
    rnd = np.random.RandomState(seed)
    for _ in range(n_pixels):
        y, x = rnd.randint(0, arr.shape[0]), rnd.randint(0, arr.shape[1])
        out[y, x] = 255 - out[y, x]
    return out


def _corpus(spark, arrays):
    return spark.createDataFrame(
        [(i, bytearray(_encode_png(a))) for i, a in enumerate(arrays)],
        "id long, content binary")


def _py_phash(arr, method):
    """Independent replay: re-derive the hash from the raw array via
    the same block-mean/threshold spec (uses the library's resize —
    the REPLAY here is the bit packing + threshold arithmetic)."""
    gray = arr.astype("float32")
    if method == "ahash":
        g = _block_mean_resize(gray, 8, 8)
        bits = (g > g.mean()).flatten()
    else:
        g = _block_mean_resize(gray, 8, 9)
        bits = (g[:, :-1] > g[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


class TestImagePhash:
    @pytest.mark.parametrize("method", ["ahash", "dhash"])
    def test_matches_numpy_replay(self, spark, method):
        arrays = [_rng_image(s) for s in range(6)]
        got = {r["id"]: r["phash"] for r in image_phash(
            _corpus(spark, arrays), method=method).collect()}
        for i, a in enumerate(arrays):
            assert got[i] == _py_phash(a, method), (method, i)

    def test_undecodable_is_null(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(_encode_png(_rng_image(1)))),
             (2, bytearray(b"not an image")), (3, None)],
            "id long, content binary")
        rows = {r["id"]: r["phash"]
                for r in image_phash(df).collect()}
        assert rows[1] is not None
        assert rows[2] is None and rows[3] is None

    def test_near_identical_images_hash_close(self, spark):
        base = _rng_image(7, 32, 32)
        near = _perturb(base, 2, seed=1)
        far = _rng_image(99, 32, 32)
        h = {r["id"]: r["phash"] for r in image_phash(
            _corpus(spark, [base, near, far])).collect()}

        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        assert ham(h[0], h[1]) < ham(h[0], h[2])

    def test_deterministic_fake_plumbing(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"abc")), (2, bytearray(b"abc")),
             (3, bytearray(b"xyz"))],
            "id long, content binary")
        rows = {r["id"]: r["phash"] for r in image_phash(
            df, deterministic_fake=True).collect()}
        assert rows[1] == rows[2] != rows[3]
        assert all(v is not None for v in rows.values())


class TestImageNearDup:
    def _arrays(self):
        out = []
        for s in range(4):  # 4 clusters of near-duplicates
            base = _rng_image(s * 101 + 3, 24, 24)
            out.append(base)
            out.append(_perturb(base, 1, seed=s))
            out.append(_perturb(base, 3, seed=s + 50))
        out += [_rng_image(7000 + s, 24, 24) for s in range(6)]
        return out

    def test_complete_at_bound_vs_brute_force(self, spark):
        """Pigeonhole banding must find EVERY pair within max_hamming
        (the test_simhash completeness shape)."""
        arrays = self._arrays()
        df = _corpus(spark, arrays)
        for max_h in (3, 6):
            got = {(r["id_a"], r["id_b"], r["hamming"])
                   for r in image_near_dup_pairs(
                       df, max_hamming=max_h).collect()}
            h = {r["id"]: r["phash"]
                 for r in image_phash(df).collect()}
            want = set()
            ids = sorted(h)
            for i in ids:
                for j in ids:
                    if i < j:
                        d = bin((h[i] ^ h[j]) & ((1 << 64) - 1)).count("1")
                        if d <= max_h:
                            want.add((i, j, d))
            assert got == want, max_h
            assert want, "fixture produced no near pairs"

    def test_duckdb_replays_banding_arithmetic(self, spark, duck,
                                               tmp_path):
        """The pair arithmetic (xor + bit_count <= bound over int64
        hashes) replays in DuckDB over the persisted hash table."""
        arrays = self._arrays()
        df = _corpus(spark, arrays)
        ph = image_phash(df)
        path = str(tmp_path / "ph.parquet")
        ph.toPandas().to_parquet(path)
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in image_near_dup_pairs(
                df, max_hamming=8, phashes=ph).collect())
        want = sorted(map(tuple, duck.execute(f"""
            SELECT a.id AS id_a, b.id AS id_b,
                   bit_count(xor(a.phash, b.phash)) AS hamming
            FROM '{path}' a JOIN '{path}' b ON a.id < b.id
            WHERE bit_count(xor(a.phash, b.phash)) <= 8
            ORDER BY id_a, id_b""").fetchall()))
        assert got == want and len(got) > 0

    def test_precomputed_hashes_reused(self, spark):
        """phashes= skips the decode entirely — hash once, pair many."""
        ph = spark.createDataFrame(
            [(1, 0b1010), (2, 0b1011), (3, -1)],
            "id long, phash long")
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in image_near_dup_pairs(
                   None, max_hamming=2, phashes=ph).collect()}
        assert got == {(1, 2): 1}


class TestImageDedupAgainst:
    """Cross-probe (r8): a new image batch against a STORED hash
    table — hash once, probe every later batch (the image analogue of
    ops/dedup_index.dedup_against)."""

    def _split(self, spark):
        base = [_rng_image(s * 101 + 3, 24, 24) for s in range(4)]
        corpus = base + [_rng_image(7000 + s, 24, 24) for s in range(4)]
        batch = [_perturb(b, 1, seed=i) for i, b in enumerate(base)]
        batch += [_rng_image(9000 + s, 24, 24) for s in range(3)]
        cdf = _corpus(spark, corpus)
        bdf = spark.createDataFrame(
            [(1000 + i, bytearray(_encode_png(a)))
             for i, a in enumerate(batch)],
            "id long, content binary")
        return cdf, bdf

    def test_probe_complete_at_bound_vs_brute_force(self, spark):
        from brahmand_spark.ops.multimodal import image_dedup_against

        cdf, bdf = self._split(spark)
        stored = image_phash(cdf)
        for max_h in (3, 6):
            got = {(r["new_id"], r["corpus_id"], r["hamming"])
                   for r in image_dedup_against(
                       bdf, stored, max_hamming=max_h).collect()}
            hc = {r["id"]: r["phash"] for r in stored.collect()}
            hb = {r["id"]: r["phash"]
                  for r in image_phash(bdf).collect()}
            want = {
                (i, j, bin((hb[i] ^ hc[j]) & ((1 << 64) - 1)).count("1"))
                for i in hb for j in hc
                if bin((hb[i] ^ hc[j]) & ((1 << 64) - 1)).count("1")
                <= max_h}
            assert got == want, max_h
            assert want, "fixture produced no cross pairs"

    def test_exclude_self_on_id_collision(self, spark):
        from brahmand_spark.ops.multimodal import image_dedup_against

        ph = spark.createDataFrame(
            [(1, 0b1010), (2, 0b1111000)], "id long, phash long")
        probe = spark.createDataFrame(
            [(1, 0b1010)], "id long, phash long")
        keep = image_dedup_against(None, ph, max_hamming=2,
                                   new_phashes=probe).collect()
        assert {(r["new_id"], r["corpus_id"]) for r in keep} == {(1, 1)}
        none = image_dedup_against(None, ph, max_hamming=2,
                                   new_phashes=probe,
                                   exclude_self=True).collect()
        assert none == []

    def test_via_call(self, spark):
        from brahmand_spark import GraphSession

        cdf, bdf = self._split(spark)
        s = GraphSession(spark)
        s.execute("CREATE NODE TABLE Imgs (id Int64, content Blob, "
                  "NODE ID (id))")
        s.register_table("Imgs", bdf)
        s.execute("CREATE NODE TABLE Hashes (id Int64, phash Int64, "
                  "NODE ID (id))")
        s.register_table("Hashes", image_phash(cdf))
        got = s.execute(
            "CALL corpus.image_dedup_against('Imgs', 'Hashes', 6) "
            "YIELD new_id, corpus_id, hamming").collect()
        from brahmand_spark.ops.multimodal import image_dedup_against

        want = image_dedup_against(
            bdf, image_phash(cdf), max_hamming=6).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        assert got


def test_image_near_dup_via_call(spark):
    from brahmand_spark import GraphSession

    s = GraphSession(spark)
    s.execute("CREATE NODE TABLE Img (id Int64, content Blob, "
              "NODE ID (id))")
    base = _rng_image(3, 24, 24)
    s.register_table("Img", _corpus(
        spark, [base, _perturb(base, 1, seed=9), _rng_image(77, 24, 24)]))
    rows = s.execute(
        "CALL corpus.image_near_dup('Img', 6) "
        "YIELD id_a, id_b, hamming").collect()
    assert any((r["id_a"], r["id_b"]) == (0, 1) for r in rows)


def test_image_dedup_groups_via_call(spark):
    """Transitive image groups: A~B, B~C puts all three in one group
    with the smallest id kept; unrelated images keep themselves."""
    from brahmand_spark import GraphSession

    s = GraphSession(spark)
    s.execute("CREATE NODE TABLE Img (id Int64, content Blob, "
              "NODE ID (id))")
    base = _rng_image(11, 24, 24)
    s.register_table("Img", _corpus(spark, [
        base,                        # 0
        _perturb(base, 1, seed=2),   # 1 ~ 0
        _perturb(base, 2, seed=3),   # 2 ~ 0 (and likely ~ 1)
        _rng_image(500, 24, 24),     # 3 unrelated
    ]))
    rows = {r["id"]: (r["group"], r["keep"]) for r in s.execute(
        "CALL corpus.image_dedup_groups('Img', 10) "
        "YIELD id, group, keep").collect()}
    assert rows[0] == (0, True)
    assert rows[1][0] == 0 and rows[1][1] is False
    assert rows[2][0] == 0 and rows[2][1] is False
    assert rows[3] == (3, True)
