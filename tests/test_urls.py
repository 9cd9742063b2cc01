"""URL/domain curation (ops/urls): normalization spec unit cases +
DuckDB regexp replay, registered-domain extraction through the
broadcast suffix joins, URL-exact dedup, block/allow filtering, and
the salted per-domain cap (Python hash-order replay, determinism,
plan shape)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from brahmand_spark.ops.urls import (
    cap_per_domain, curate_urls, filter_domains, normalize_url,
    url_exact_dedup, with_url_parts,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm(spark, url):
    row = spark.createDataFrame([(url,)], "url string") \
        .select(normalize_url(F.col("url")).alias("n")).first()
    return row["n"]


class TestNormalization:
    @pytest.mark.parametrize("raw,want", [
        ("HTTPS://Example.COM/Path/", "https://example.com/Path"),
        ("https://www.example.com/a//", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        # non-default port survives
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        ("https://user:pw@example.com/a", "https://example.com/a"),
        ("https://example.com/a?utm_source=x&q=1&utm_medium=y",
         "https://example.com/a?q=1"),
        ("https://example.com/a?utm_source=x", "https://example.com/a"),
        ("https://example.com/a?b=2&a=1", "https://example.com/a?b=2&a=1"),
        ("  https://example.com/a  ", "https://example.com/a"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/", "https://example.com"),
        # 'ref' selects content on many sites -> NOT stripped by
        # default (ADVICE r6); path case is preserved
        ("http://Ex.org/A/B?ref=feed", "http://ex.org/A/B?ref=feed"),
    ])
    def test_spec_cases(self, spark, raw, want):
        assert _norm(spark, raw) == want

    @pytest.mark.parametrize("raw", [
        "not a url", "example.com/no-scheme", "https:///nohost", "",
    ])
    def test_unparseable_is_null(self, spark, raw):
        assert _norm(spark, raw) is None

    def test_ref_strip_is_opt_in(self, spark):
        """The pre-r7 strip-ref behavior stays one parameter away."""
        from brahmand_spark.ops.urls import TRACKING_PARAM_RE_WITH_REF

        row = spark.createDataFrame(
            [("http://ex.org/a?ref=feed&q=1",)], "url string"
        ).select(normalize_url(
            F.col("url"), TRACKING_PARAM_RE_WITH_REF).alias("n")).first()
        assert row["n"] == "http://ex.org/a?q=1"

    def test_duplicate_suffixes_do_not_fan_out(self, spark):
        """A caller-supplied suffix list with duplicates must not
        multiply rows through the broadcast joins (ADVICE r6)."""
        df = spark.createDataFrame(
            [(1, "https://a.example.co.uk/x")], "doc_id long, url string")
        out = with_url_parts(
            df, suffixes=["co.uk", "co.uk", "uk", "uk", "com"])
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["registered_domain"] == "example.co.uk"

    def test_duckdb_replay(self, spark, duck):
        """The normalization is one regexp/array expression chain —
        DuckDB replays it exactly over generated URLs."""
        urls = [
            (i, f"HTTPS://www.Example.COM/p/{i % 7}/"
                f"?utm_source=s&x={i % 3}")
            for i in range(40)
        ] + [(100 + i, f"http://blog.test.co.uk:80/a{i}#frag")
             for i in range(10)]
        df = spark.createDataFrame(urls, "id long, url string")
        got = df.select("id", normalize_url(F.col("url")).alias("n"))
        df.toPandas().to_parquet("/tmp/_urls_test.parquet")
        want = duck.sql("""
            WITH raw AS (
                SELECT id, trim(url) AS u
                FROM '/tmp/_urls_test.parquet'),
            p AS (
                SELECT id,
                    lower(regexp_extract(u,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                    regexp_replace(regexp_extract(u,
                        '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$', 1),
                        '#.*$', '') AS nofrag
                FROM raw),
            hp0 AS (
                SELECT id, scheme, nofrag,
                    lower(regexp_replace(regexp_extract(nofrag,
                        '^([^/?#]*)', 1), '^[^@]*@', '')) AS hp_raw
                FROM p),
            parts AS (
                SELECT id, scheme,
                    regexp_replace(
                        CASE WHEN scheme = 'http'
                             THEN regexp_replace(hp_raw, ':80$', '')
                             WHEN scheme = 'https'
                             THEN regexp_replace(hp_raw, ':443$', '')
                             ELSE hp_raw END,
                        '^www\\.', '') AS host,
                    regexp_replace(regexp_extract(nofrag,
                        '^[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
                    coalesce(array_to_string(list_filter(
                        string_split(coalesce(regexp_extract(nofrag,
                            '\\?([^#]*)', 1), ''), '&'),
                        q -> q <> '' AND NOT regexp_matches(q,
                            '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_eid)=')),
                        '&'), '') AS qn
                FROM hp0)
            SELECT id,
                   CASE WHEN scheme <> '' AND host <> ''
                        THEN scheme || '://' || host || path ||
                             CASE WHEN qn = '' THEN ''
                                  ELSE '?' || qn END
                   END AS n
            FROM parts""")
        from .helpers import assert_same

        assert_same(got, want)


class TestRegisteredDomain:
    def _parts(self, spark, hosts):
        df = spark.createDataFrame(
            [(i, f"https://{h}/x") for i, h in enumerate(hosts)],
            "id long, url string")
        rows = with_url_parts(df).collect()
        return {r["id"]: (r["host"], r["registered_domain"])
                for r in rows}

    def test_suffix_matching(self, spark):
        got = self._parts(spark, [
            "news.bbc.co.uk", "www.example.com", "a.b.example.com",
            "example.com", "host.unknown-tld", "co.uk", "localhost",
        ])
        assert got[0] == ("news.bbc.co.uk", "bbc.co.uk")
        assert got[1] == ("example.com", "example.com")  # www stripped
        assert got[2] == ("a.b.example.com", "example.com")
        assert got[3] == ("example.com", "example.com")
        # unknown TLD: falls back to the full host
        assert got[4] == ("host.unknown-tld", "host.unknown-tld")
        # host IS a public suffix: falls back to the host
        assert got[5] == ("co.uk", "co.uk")
        assert got[6] == ("localhost", "localhost")

    def test_custom_suffix_list(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.b.internal/x")], "id long, url string")
        r = with_url_parts(df, suffixes=["internal"]).first()
        assert r["registered_domain"] == "b.internal"

    def test_suffix_lookup_plan(self, spark):
        """List-sized suffix sets resolve via the literal-map lookup:
        ZERO join nodes in the plan. Oversized sets (> _SUFFIX_MAP_MAX)
        keep the left broadcast-hash joins — and both paths agree."""
        import brahmand_spark.ops.urls as urls

        df = spark.createDataFrame(
            [(1, "https://a.example.com/x"),
             (2, "https://news.example.co.uk/y"),
             (3, "https://co.uk/"), (4, "http://localhost/z")],
            "id long, url string")
        plan = with_url_parts(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Join" not in plan  # pure projection, no broadcast build
        small = sorted(map(tuple, with_url_parts(df).collect()))
        try:
            orig = urls._SUFFIX_MAP_MAX
            urls._SUFFIX_MAP_MAX = 0  # force the join path
            joined_plan = with_url_parts(df)._jdf.queryExecution() \
                .executedPlan().toString()
            assert "BroadcastHashJoin" in joined_plan
            big = sorted(map(tuple, with_url_parts(df).collect()))
        finally:
            urls._SUFFIX_MAP_MAX = orig
        assert small == big


class TestUrlDedup:
    def test_keeps_smallest_id_per_normalized_url(self, spark):
        rows = [
            (3, "https://www.Example.com/a/"),
            (1, "https://example.com/a"),
            (2, "https://example.com/a?utm_source=x"),
            (9, "https://example.com/b"),
            (7, "bogus"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        kept = sorted(r["doc_id"] for r in url_exact_dedup(df).collect())
        assert kept == [1, 9]  # 1<2<3 share one normalized URL
        with_bad = sorted(r["doc_id"] for r in url_exact_dedup(
            df, keep_invalid=True).collect())
        assert with_bad == [1, 7, 9]

    def test_deterministic_under_repartition(self, spark):
        rows = [(i, f"https://ex.com/p{i % 5}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        a = sorted(r["doc_id"] for r in url_exact_dedup(df).collect())
        b = sorted(r["doc_id"] for r in url_exact_dedup(
            df.repartition(7)).collect())
        assert a == b == [0, 1, 2, 3, 4]

    def test_hot_key_shape_is_partial_aggregate(self, spark):
        """r15 (VERDICT r14 next #4): the dedup must survive a hot key
        — one URL duplicated across the whole corpus — without
        serializing it into a single window partition. 200k dups of
        one URL + distinct tails: correct survivors, and the plan is
        a two-phase (partial+final) min_by aggregate, no Window."""
        df = (
            spark.range(200_000)
            .selectExpr(
                "id AS doc_id",
                "CASE WHEN id % 2 = 0 THEN 'https://hot.com/x' "
                "ELSE concat('https://t.com/p', id) END AS url")
        )
        out = url_exact_dedup(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "partial_min_by" in plan, plan
        kept = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("url") == "https://hot.com/x", 1)
                  .otherwise(0)).alias("hot"),
            F.min(F.when(F.col("url") == "https://hot.com/x",
                         F.col("doc_id"))).alias("hot_id"),
        ).first()
        assert kept["n"] == 100_001  # 100k odd-tail URLs + 1 hot
        assert kept["hot"] == 1 and kept["hot_id"] == 0

    def test_duplicate_min_id_emits_one_row(self, spark):
        """min_by keeps exactly ONE row per normalized URL even when
        the minimum id is duplicated (the r14 window kept every tied
        row — 'one row per normalized URL' now holds literally)."""
        rows = [(1, "https://ex.com/a"), (1, "https://ex.com/a/"),
                (2, "https://ex.com/a")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = url_exact_dedup(df).collect()
        assert len(out) == 1 and out[0]["doc_id"] == 1


class TestFilterDomains:
    def test_block_and_allow(self, spark):
        df = spark.createDataFrame(
            [(1, "spam.com"), (2, "good.org"), (3, "other.net")],
            "id long, registered_domain string")
        blocked = {r["id"] for r in filter_domains(
            df, blocklist=["spam.com"]).collect()}
        assert blocked == {2, 3}
        allowed = {r["id"] for r in filter_domains(
            df, allowlist=["good.org"]).collect()}
        assert allowed == {2}
        both = {r["id"] for r in filter_domains(
            df, blocklist=["good.org"],
            allowlist=["good.org", "other.net"]).collect()}
        assert both == {3}


class TestCapPerDomain:
    def _df(self, spark, n=60, domains=("a.com", "b.com")):
        rows = [(i, domains[i % len(domains)]) for i in range(n)]
        return spark.createDataFrame(
            rows, "doc_id long, registered_domain string")

    def _py_keep(self, ids, cap, n_buckets=32):
        key = [(_h60(f"cap:{i}") % n_buckets, _h60(f"cap:{i}"), i)
               for i in ids]
        return {i for _, _, i in sorted(key)[:cap]}

    def test_matches_python_hash_order(self, spark):
        df = self._df(spark)
        got = {r["registered_domain"]: set() for r in df.collect()}
        for r in cap_per_domain(df, 10).collect():
            got[r["registered_domain"]].add(r["doc_id"])
        for dom in ("a.com", "b.com"):
            ids = [i for i in range(60)
                   if ("a.com", "b.com")[i % 2] == dom]
            assert got[dom] == self._py_keep(ids, 10)

    def test_under_cap_untouched(self, spark):
        df = self._df(spark, n=6)
        assert cap_per_domain(df, 10).count() == 6

    def test_deterministic_under_repartition(self, spark):
        df = self._df(spark, n=80)
        a = sorted(r["doc_id"] for r in cap_per_domain(df, 7).collect())
        b = sorted(r["doc_id"] for r in cap_per_domain(
            df.repartition(9), 7).collect())
        assert a == b and len(a) == 14

    def test_no_unbounded_per_domain_ranking_window(self, spark):
        """The window over the UNBOUNDED rows (computing _lr) must
        partition by (domain, salt bucket); only the final window over
        the locally-capped rows (<= n_buckets * max_docs per domain
        by construction) may partition by the domain alone."""
        plan = cap_per_domain(self._df(spark), 5) \
            ._jdf.queryExecution().optimizedPlan().toString()
        wins = [ln for ln in plan.splitlines()
                if ln.strip().lstrip("+-: ").startswith("Window ")]
        assert len(wins) == 2, plan
        # the deeper window (last in the plan text) computes _lr over
        # the raw rows: it must partition by (domain, _bkt)
        assert "_bkt" in wins[-1] and "registered_domain" in wins[-1], plan


class TestUrlCallProcedure:
    def test_url_dedup_via_call_matches_direct(self, spark):
        """CALL corpus.url_dedup rides the same curate_urls op."""
        from brahmand_spark import GraphSession

        s = GraphSession(spark)
        s.execute("CREATE NODE TABLE Page (doc_id Int64, url String, "
                  "NODE ID (doc_id))")
        rows = [(i, f"https://www.Site{i % 4}.com/p/{i % 9}/"
                    f"?utm_source=a&k={i % 3}") for i in range(60)]
        s.register_table(
            "Page", spark.createDataFrame(rows, "doc_id long, url string"))
        got = s.execute(
            "CALL corpus.url_dedup('Page', 'url', 'doc_id', 5) "
            "YIELD doc_id, url_norm, registered_domain")
        direct = curate_urls(
            spark.createDataFrame(rows, "doc_id long, url string"),
            max_docs_per_domain=5,
        ).select("doc_id", "url_norm", "registered_domain")
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, direct.collect()))
        assert got.count() > 0


class TestPipelineUrlStage:
    def test_curate_runs_url_front_door_first(self, spark):
        from brahmand_spark.ops.pipeline import curate

        rows = [
            (1, "the quick brown fox jumps over the lazy dog and runs",
             "https://keep.com/a"),
            (2, "the quick brown fox jumps over the lazy dog and naps",
             "https://keep.com/a"),     # URL dup of 1 -> dropped
            (3, "the quick brown fox jumps over the lazy dog and eats",
             "https://blocked.org/x"),  # domain-blocked
            (4, "the quick brown fox jumps over the lazy dog and digs",
             "https://keep.com/b"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, url string")
        out, counts = curate(
            docs, url_col="url", domain_blocklist=["blocked.org"],
            min_quality=0.0, est_threshold=1.01, report=True)
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [1, 4]
        assert counts["url"] == 2
        assert "registered_domain" in out.columns


class TestCurateUrls:
    def test_composition(self, spark):
        rows = [
            (1, "https://www.Keep.com/a"),
            (2, "https://keep.com/a"),          # dup of 1 after norm
            (3, "https://blocked.org/x"),
            (4, "https://keep.com/b"),
            (5, "https://keep.com/c"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = curate_urls(df, blocklist=["blocked.org"],
                          max_docs_per_domain=2)
        kept = sorted(r["doc_id"] for r in out.collect())
        # 3 blocked, {1,2} -> min id 1, cap keeps 2 of {1,4,5}
        assert len(kept) == 2
        assert set(kept) <= {1, 4, 5}
        ids = [1, 4, 5]
        key = sorted((_h60(f"cap:{i}") % 32, _h60(f"cap:{i}"), i)
                     for i in ids)
        assert kept == sorted(i for _, _, i in key[:2])
        cols = out.columns
        for c in ("url_norm", "host", "registered_domain"):
            assert c in cols


class TestNormalizationProperties:
    """Property-based invariants of normalize_url (hypothesis over a
    URL-shaped generator): idempotence (normalizing a normalized URL
    is a no-op) and dedup stability (url_exact_dedup is idempotent)."""

    def test_normalize_is_idempotent(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        host = st.from_regex(
            r"[a-z][a-z0-9]{0,6}(\.[a-z]{2,5}){1,2}", fullmatch=True)
        path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,3}/{0,2}",
                             fullmatch=True)
        query = st.from_regex(
            r"(\?([a-z]{1,6}=[A-Za-z0-9]{0,4}&?){0,3})?",
            fullmatch=True)
        scheme = st.sampled_from(["http", "https", "HTTP", "Https"])
        www = st.sampled_from(["", "www."])

        urls = []

        @settings(max_examples=60, deadline=None)
        @given(scheme, www, host, path, query)
        def collect(s, w, h, p, q):
            urls.append(f"{s}://{w}{h}{p}{q}")

        collect()
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, url string")
        once = df.select("id", normalize_url(F.col("url")).alias("n"))
        twice = once.select(
            "id", normalize_url(F.col("n")).alias("n2"))
        joined = once.join(twice, "id")
        bad = joined.filter(
            ~F.col("n").eqNullSafe(F.col("n2"))).collect()
        assert bad == [], bad[:5]

    def test_url_dedup_is_idempotent(self, spark):
        urls = [(i, f"https://www.Ex{i % 7}.com/p/{i % 5}/"
                    f"?utm_source=a&x={i % 3}") for i in range(60)]
        df = spark.createDataFrame(urls, "doc_id long, url string")
        once = url_exact_dedup(df)
        twice = url_exact_dedup(once)
        assert sorted(r["doc_id"] for r in once.collect()) \
            == sorted(r["doc_id"] for r in twice.collect())
