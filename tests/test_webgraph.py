"""Web-graph operators: link extraction, URL canonicalization, PageRank.

Reference anchor-walk semantics: docling/backend/html_backend.py (the
``<a>`` inline handling) — the graph layer itself is the crawl-scale
extension (SURVEY.md LLM-pipeline family), oracle-twinned in
__spark_entry__.py.
"""

import pytest
from pyspark.sql import functions as F

from docling_spark import webgraph


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows],
        "url string, html binary")


class TestLinkGraph:
    def test_edges_and_counts(self, spark):
        pages = _pages(spark, [
            ("https://a.test/x",
             '<a href="/p1">i</a><a href="/p1">i</a>'
             '<a href="https://b.test/q">o</a>'
             '<a href="#frag">skip</a><a href="mailto:x@y">skip</a>'
             '<a href="//proto.test/rel">skip</a>'),
            ("https://a.test/y", '<a href="/p2">i</a>'),
        ])
        got = {(r.src_host, r.dst_host): r
               for r in webgraph.link_graph(pages).collect()}
        assert set(got) == {("a.test", "a.test"), ("a.test", "b.test")}
        internal = got[("a.test", "a.test")]
        # /p1 twice + /p2 once = 3 links, 2 distinct targets
        assert internal.n_links == 3 and internal.n_targets == 2
        assert internal.internal is True
        ext = got[("a.test", "b.test")]
        assert ext.n_links == 1 and ext.internal is False

    def test_absolute_host_normalized(self, spark):
        pages = _pages(spark, [
            ("https://a.test/", '<a href="HTTP://B.Test:8080/z">x</a>')])
        row = webgraph.link_graph(pages).collect()[0]
        assert row.dst_host == "b.test"

    def test_plan_no_python_no_cartesian(self, spark):
        pages = _pages(spark, [("https://a.test/", '<a href="/p">x</a>')])
        plan = (webgraph.link_graph(pages)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestAnchorStats:
    def test_modal_text_and_tiebreak(self, spark):
        pages = _pages(spark, [
            ("https://a.test/x",
             '<a href="/p">Docs</a><a href="/q">docs  </a>'
             '<a href="https://b.test/">Beta</a>'
             '<a href="/r">alpha</a><a href="/s">ALPHA</a>'
             '<a href="#f">skip</a><a href="/t"></a>'),
        ])
        rows = {r.dst_host: r
                for r in webgraph.anchor_stats(pages).collect()}
        a = rows["a.test"]
        # "docs" (x2, whitespace/case-normalized) and "alpha" (x2) tie
        # at count 2 -> lexicographic-min text wins
        assert a.n_anchors == 4 and a.n_texts == 2
        assert a.top_text == "alpha" and a.top_count == 2
        b = rows["b.test"]
        assert b.n_anchors == 1 and b.top_text == "beta"

    def test_plan_no_python(self, spark):
        pages = _pages(spark, [("https://a.test/", '<a href="/p">x</a>')])
        plan = (webgraph.anchor_stats(pages)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestHostBudgetCap:
    def _urls(self, spark, n=200, hosts=7):
        from pyspark.sql import functions as F
        return (spark.range(n)
                .select(F.col("id").alias("doc_id"),
                        F.concat(F.lit("https://h"),
                                 (F.col("id") % hosts).cast("string"),
                                 F.lit(".test/p/"),
                                 F.col("id").cast("string")).alias("url")))

    def test_matches_single_window(self, spark):
        from pyspark.sql import Window
        df = self._urls(spark)
        got = sorted((r.host, r.doc_id, r.rank)
                     for r in webgraph.host_budget_cap(df, k=3).collect())
        w = Window.partitionBy("host").orderBy("doc_id")
        naive = (df.select("doc_id", "url",
                           webgraph.url_host().alias("host"))
                 .withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= 3))
        want = sorted((r.host, r.doc_id, r.rank) for r in naive.collect())
        assert got == want
        assert len(got) == 7 * 3

    def test_cap_bounds_every_host(self, spark):
        df = self._urls(spark, n=300, hosts=3)
        out = webgraph.host_budget_cap(df, k=5).groupBy("host").count()
        assert all(r["count"] == 5 for r in out.collect())


CANON_CASES = [
    ("https://A.Test:443/path?q=1#frag", "https://a.test/path?q=1"),
    ("HTTP://h.test:80/", "http://h.test/"),
    ("https://h.test", "https://h.test/"),
    ("https://h.test/dir/index.html", "https://h.test/dir/"),
    ("https://h.test/p?utm_source=x", "https://h.test/p"),
    ("https://h.test/p?utm_source=x&keep=1", "https://h.test/p?keep=1"),
    ("https://h.test/p?keep=1&fbclid=abc", "https://h.test/p?keep=1"),
    ("https://h.test/p?utm_a=1&gclid=2", "https://h.test/p"),
    ("https://h.test?utm_b=1", "https://h.test/"),
    ("https://h.test:8080/p", "https://h.test:8080/p"),
    # separator anchoring: a param whose NAME merely ends in a tracking
    # suffix must survive intact (regression: the unanchored pattern
    # partially stripped it and glued its head onto the next param)
    ("https://h.test/p?xutm_source=1&keep=2",
     "https://h.test/p?xutm_source=1&keep=2"),
    ("https://h.test/p?myfbclid=a", "https://h.test/p?myfbclid=a"),
    # consecutive tracking params in every position still all strip
    ("https://h.test/p?utm_a=1&utm_b=2&utm_c=3&keep=4",
     "https://h.test/p?keep=4"),
    ("https://h.test/p?keep=1&utm_a=2&gclid=3&utm_b=4",
     "https://h.test/p?keep=1"),
    ("https://h.test/p?utm_a=1&utm_b=2", "https://h.test/p"),
]


class TestCanonicalUrl:
    @pytest.mark.parametrize("raw,want", CANON_CASES)
    def test_cases(self, spark, raw, want):
        df = spark.createDataFrame([(raw,)], "url string")
        got = df.select(webgraph.canonical_url().alias("c")).collect()[0].c
        assert got == want, raw

    def test_idempotent(self, spark):
        """canonical(canonical(u)) == canonical(u) for a zoo of URL
        shapes - the invariant that lets canonicalization run at ANY
        pipeline stage without double-normalization drift."""
        zoo = [raw for raw, _ in CANON_CASES] + [
            "https://h.test/a/index.html?utm_source=x#f",
            "HTTP://UP.test:80/index.html",
            "https://h.test/?gclid=1&utm_x=2&keep=3",
            "https://h.test/p?a=1&fbclid=2&b=3",
            "https://h.test:443?utm_a=1",
            "ftp://files.test:21/path",
        ]
        df = spark.createDataFrame([(u,) for u in zoo], "url string")
        once = df.select(webgraph.canonical_url("url").alias("url"))
        out = once.select(
            F.col("url").alias("c1"),
            webgraph.canonical_url("url").alias("c2")).collect()
        for r in out:
            assert r.c1 == r.c2, r

    def test_dup_stats_folds_variants(self, spark):
        df = spark.createDataFrame(
            [(1, "https://h.test/p"),
             (2, "https://h.test/p?utm_source=x"),
             (3, "HTTPS://H.Test:443/p"),
             (4, "https://h.test/other")],
            "doc_id long, url string")
        rows = {r.canonical_url: r
                for r in webgraph.url_dup_stats(df).collect()}
        assert rows["https://h.test/p"].n_urls == 3
        assert rows["https://h.test/p"].n_raw_forms == 3
        assert rows["https://h.test/p"].keeper_id == 1
        assert rows["https://h.test/other"].n_urls == 1

    def test_dup_stats_plan_no_window_no_sort(self, spark):
        df = spark.createDataFrame([(1, "https://h.test/p")],
                                   "doc_id long, url string")
        plan = (webgraph.url_dup_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        # keeper is min(id): a hot canonical key must collapse map-side,
        # never land on one reducer as a sorted window group
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan


class TestPolicyFilter:
    def _run(self, spark, urls, rules):
        pages = spark.createDataFrame([(u,) for u in urls], "url string")
        rdf = spark.createDataFrame(
            rules, "host string, path_prefix string, allow boolean")
        return {r.url: r
                for r in webgraph.policy_filter(pages, rdf).collect()}

    def test_longest_prefix_wins(self, spark):
        rows = self._run(
            spark,
            ["https://a.test/private/x", "https://a.test/private/pub/y",
             "https://a.test/other"],
            [("a.test", "/", True),
             ("a.test", "/private/", False),
             ("a.test", "/private/pub/", True)])
        assert rows["https://a.test/private/x"].allowed is False
        assert rows["https://a.test/private/pub/y"].allowed is True
        assert rows["https://a.test/other"].allowed is True
        assert (rows["https://a.test/private/x"].matched_prefix
                == "/private/")

    def test_deny_wins_length_tie_and_no_rule_allows(self, spark):
        rows = self._run(
            spark,
            ["https://a.test/p", "https://b.test/q", "https://a.test"],
            [("a.test", "/p", True), ("a.test", "/p", False),
             ("a.test", "/", True)])
        assert rows["https://a.test/p"].allowed is False
        # no rules for b.test at all -> allowed, no matched prefix
        assert rows["https://b.test/q"].allowed is True
        assert rows["https://b.test/q"].matched_prefix is None
        # bare host -> path normalized to "/"
        assert rows["https://a.test"].path == "/"
        assert rows["https://a.test"].allowed is True

    def test_plan_broadcast_rules_no_smj(self, spark):
        pages = spark.createDataFrame([("https://a.test/p",)],
                                      "url string")
        rules = spark.createDataFrame([("a.test", "/", True)],
                                      "host string, path_prefix string, "
                                      "allow boolean")
        plan = (webgraph.policy_filter(pages, rules)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "BatchEvalPython" not in plan


def _pagerank_py(edges, n_iter=5, damping=0.85):
    """Pure-Python mirror of the Spark semantics for a tiny graph."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = float(len(nodes))
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r for v, r in rank.items() if v not in out)
        in_mass = {v: 0.0 for v in nodes}
        for s, d in e:
            in_mass[d] += rank[s] / out[s]
        rank = {v: (1.0 - damping) / n
                + damping * (in_mass[v] + dm / n) for v in nodes}
    return {v: round(r, 6) for v, r in rank.items()}


class TestPagerank:
    def test_matches_reference_impl(self, spark):
        edges = [(i, (i * 3 + 1) % 17) for i in range(17)] + \
                [(i, (i * i + 2) % 17) for i in range(17)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank
               for r in webgraph.pagerank(df, n_iter=4).collect()}
        want = _pagerank_py(edges, n_iter=4)
        assert got.keys() == want.keys()
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=2e-6), v

    def test_mass_conserved(self, spark):
        edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (3, 7)]
        df = spark.createDataFrame(edges, "src long, dst long")
        total = (webgraph.pagerank(df, n_iter=3)
                 .agg(F.sum("rank")).collect()[0][0])
        assert total == pytest.approx(1.0, abs=1e-4)

    def test_dangling_node_gets_mass(self, spark):
        # 2 -> nothing: dangling; its mass redistributes, no rank lost
        df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
        ranks = {r.node: r.rank
                 for r in webgraph.pagerank(df, n_iter=5).collect()}
        assert set(ranks) == {0, 1, 2}
        assert all(r > 0 for r in ranks.values())
        # chain end accumulates the most rank
        assert ranks[2] > ranks[0]


def test_pagerank_checkpoint_invariant(spark):
    """Lineage truncation (checkpoint_every) must not change values."""
    edges = [(i, (i * 5 + 2) % 23) for i in range(23)] + \
            [(i, (i * i + 3) % 23) for i in range(23)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {r.node: r.rank
             for r in webgraph.pagerank(df, n_iter=6,
                                        checkpoint_every=0).collect()}
    for every in (2, 3):  # 3 = the scale default (persist + checkpoint)
        ckpt = {r.node: r.rank
                for r in webgraph.pagerank(df, n_iter=6,
                                           checkpoint_every=every).collect()}
        assert plain == ckpt, every


def test_policy_filter_empty_prefix_is_host_default(spark):
    """An empty path_prefix matches every path on the host (the
    host-wide default rule) and loses every length tie to any concrete
    prefix."""
    pages = spark.createDataFrame(
        [("https://a.test/x",), ("https://a.test/blocked/y",),
         ("https://b.test/z",)], "url string")
    rules = spark.createDataFrame(
        [("a.test", "", False),              # host-wide deny by default
         ("a.test", "/blocked/", False),
         ("a.test", "/x", True)],
        "host string, path_prefix string, allow boolean")
    rows = {r.url: r for r in webgraph.policy_filter(pages, rules).collect()}
    assert rows["https://a.test/x"].allowed is True          # /x beats ""
    assert rows["https://a.test/blocked/y"].allowed is False
    assert rows["https://b.test/z"].allowed is True          # no rules


class TestParseRobots:
    def _rules(self, spark, bodies, agent="docbot"):
        df = spark.createDataFrame(bodies, "host string, body string")
        out = webgraph.parse_robots(df, agent=agent).collect()
        return {(r.host, r.path_prefix, r.allow) for r in out}

    def test_exact_agent_shadows_wildcard(self, spark):
        got = self._rules(spark, [
            ("h.test", "User-agent: docbot\nDisallow: /bot/\n\n"
                       "User-agent: *\nDisallow: /\n")])
        assert got == {("h.test", "/bot/", False)}

    def test_wildcard_applies_when_no_exact_group(self, spark):
        got = self._rules(spark, [
            ("h.test", "User-agent: other\nDisallow: /o/\n\n"
                       "User-agent: *\nDisallow: /w/\nAllow: /w/ok\n")])
        assert got == {("h.test", "/w/", False), ("h.test", "/w/ok", True)}

    def test_multi_ua_group_and_crlf_and_case(self, spark):
        got = self._rules(spark, [
            ("h.test", "User-Agent: A\r\nUSER-AGENT: DocBot\r\n"
                       "Disallow: /x/\r\nAllow: /x/pub\r\n")])
        assert got == {("h.test", "/x/", False), ("h.test", "/x/pub", True)}

    def test_empty_disallow_and_comments(self, spark):
        got = self._rules(spark, [
            ("h.test", "# full line comment\nUser-agent: *\n"
                       "Disallow:\nAllow: /a # tail comment\n")])
        assert got == {("h.test", "/a", True)}

    def test_rules_feed_policy_filter(self, spark):
        """End-to-end: parse_robots output drives policy_filter."""
        rules = webgraph.parse_robots(spark.createDataFrame(
            [("h.test", "User-agent: *\nDisallow: /private/\n")],
            "host string, body string"))
        pages = spark.createDataFrame(
            [("https://h.test/private/x",), ("https://h.test/pub",)],
            "url string")
        got = {r.url: r.allowed
               for r in webgraph.policy_filter(pages, rules).collect()}
        assert got == {"https://h.test/private/x": False,
                       "https://h.test/pub": True}


class TestParseSitemaps:
    def test_urlset_and_index(self, spark):
        bodies = [
            ("a.test", "<urlset><url><loc>https://a.test/x</loc>"
                       "<lastmod>2024-03-01</lastmod>"
                       "<priority>0.8</priority></url>"
                       "<url><loc>\n https://a.test/y \n</loc></url>"
                       "</urlset>"),
            ("b.test", "<sitemapindex><sitemap>"
                       "<loc>https://b.test/more.xml</loc>"
                       "</sitemap></sitemapindex>"),
        ]
        df = spark.createDataFrame(bodies, "host string, body string")
        got = {(r.host, r.kind, r.loc): (r.lastmod, r.priority)
               for r in webgraph.parse_sitemaps(df).collect()}
        assert got[("a.test", "url", "https://a.test/x")] == \
            ("2024-03-01", 0.8)
        assert got[("a.test", "url", "https://a.test/y")] == (None, None)
        assert got[("b.test", "sitemap", "https://b.test/more.xml")] == \
            (None, None)

    def test_empty_and_garbage_bodies(self, spark):
        df = spark.createDataFrame(
            [("c.test", "<urlset></urlset>"), ("d.test", "not xml at all")],
            "host string, body string")
        assert webgraph.parse_sitemaps(df).count() == 0


class TestUrlFeatures:
    def test_hand_cases(self, spark):
        cases = [
            ("https://a.example.co.uk:8080/x/y/z.html?a=1&b=2#f",
             dict(host="a.example.co.uk", tld="uk", path_depth=3,
                  n_params=2, has_tracking=False, is_index=False,
                  is_media=False)),
            ("https://b.test/img/pic.JPG".lower(),
             dict(tld="test", path_depth=2, n_params=0,
                  is_media=True)),
            ("https://c.test/",
             dict(path_depth=0, is_index=True)),
            ("https://d.test",
             dict(path_depth=0, path_len=0, is_index=True)),
            ("https://e.test/p?utm_source=x",
             dict(has_tracking=True, n_params=1)),
            ("https://f.test/p?xutm_source=x",
             dict(has_tracking=False)),
            ("https://g.test/docs/index.htm",
             dict(is_index=True)),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases],
                                   "url string")
        got = {r.url: r.asDict()
               for r in webgraph.url_features(df).collect()}
        for url, want in cases:
            row = got[url]
            for k, v in want.items():
                assert row[k] == v, (url, k, row[k], v)

    def test_plan_is_single_projection(self, spark):
        df = spark.createDataFrame([("https://a.test/x",)], "url string")
        plan = (webgraph.url_features(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
