"""Link graph: href extraction, host edges, degrees, integer PageRank."""

from __future__ import annotations

import pytest

from cloud_data_quality_spark.functions.linkgraph import (
    RANK_SCALE,
    extract_links,
    host_degrees,
    host_edges,
    host_pagerank,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (1, "https://a.test/p1",
         '<a href="https://b.test/x">l</a>'
         '<a HREF = "https://c.test/y">m</a>'
         '<a href="https://b.test/x">dup</a>'
         '<a href="/relative">r</a>'
         '<a href="https://a.test/self">s</a>'),
        (2, "https://b.test/p2", '<a href="https://c.test/z">n</a>'),
        (3, "https://c.test/p3", "<p>no links</p>"),
        (4, "https://d.test/p4", None),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, html string")


class TestExtractLinks:
    def test_all_occurrences_kept(self, spark, pages):
        links = extract_links(pages, keep_cols=("url",)).collect()
        # doc 1: 5 hrefs incl. the duplicate and the relative one
        assert sum(1 for r in links if r["doc_id"] == 1) == 5
        assert all(r["url"].startswith("https://") for r in links)
        # mixed-case HREF with attribute spaces matched
        assert any(r["link"] == "https://c.test/y" for r in links)

    def test_no_python_in_plan(self, spark, pages):
        plan = (extract_links(pages)._jdf.queryExecution()
                .executedPlan().toString())
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestHostEdges:
    def test_relative_dup_selfloop_dropped(self, spark, pages):
        edges = {(r["src"], r["dst"]) for r in
                 host_edges(extract_links(pages, keep_cols=("url",)))
                 .collect()}
        assert edges == {("a.test", "b.test"), ("a.test", "c.test"),
                         ("b.test", "c.test")}


class TestHostPagerank:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_hand_computed_chain(self, spark):
        # a -> b -> c: one pass of rank flows down the chain
        edges = self._edges(spark, [("a", "b"), ("b", "c")])
        r1 = {r["host"]: r["rank_micro"]
              for r in host_pagerank(edges, iterations=1).collect()}
        # a gets base only; b gets base + 85% of a's full rank
        assert r1["a"] == 150_000
        assert r1["b"] == 150_000 + (85 * RANK_SCALE) // 100
        assert r1["c"] == r1["b"]  # c received b's initial rank likewise

    def test_split_outdegree(self, spark):
        # a fans out to b and c: each gets half (integer div) of a's rank
        edges = self._edges(spark, [("a", "b"), ("a", "c")])
        r1 = {r["host"]: r["rank_micro"]
              for r in host_pagerank(edges, iterations=1).collect()}
        half = RANK_SCALE // 2
        assert r1["b"] == r1["c"] == 150_000 + (85 * half) // 100

    def test_partitioning_invariance(self, spark):
        edges = self._edges(
            spark, [(f"h{i % 7}", f"h{(i * 3 + 1) % 7}") for i in range(40)
                    if i % 7 != (i * 3 + 1) % 7]).distinct()
        a = sorted(map(tuple, host_pagerank(edges, iterations=3).collect()))
        b = sorted(map(tuple, host_pagerank(edges.repartition(13),
                                            iterations=3).collect()))
        assert a == b

    def test_zero_iterations_and_degrees(self, spark):
        edges = self._edges(spark, [("a", "b")])
        r0 = {r["host"]: r["rank_micro"]
              for r in host_pagerank(edges, iterations=0).collect()}
        assert r0 == {"a": RANK_SCALE, "b": RANK_SCALE}
        degs = {r["host"]: (r["out_deg"], r["in_deg"])
                for r in host_degrees(edges).collect()}
        assert degs == {"a": (1, 0), "b": (0, 1)}


class TestAnchorTexts:
    def test_extract_pairs_and_skip_nested(self, spark):
        from cloud_data_quality_spark.functions.linkgraph import (
            extract_anchor_texts)
        html = ('<a href="https://a.test/x"> Click Here </a>'
                '<A HREF = "https://b.test/y">More</A>'
                '<a href="https://c.test/z"><img src="i.png"/></a>'
                '<a href="https://d.test/e"></a>'
                '<a name="no-href">plain</a>')
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        got = {(r["link"], r["anchor"])
               for r in extract_anchor_texts(df).collect()}
        assert got == {("https://a.test/x", "Click Here"),
                       ("https://b.test/y", "More"),
                       ("https://d.test/e", "")}

    def test_top_anchors_rank_and_filters(self, spark):
        from cloud_data_quality_spark.functions.linkgraph import top_anchors
        rows = ([(i, "https://t.test/p", "Click Here") for i in range(3)]
                + [(9, "https://t.test/p", "rare")]
                + [(10, "https://t.test/p", "")]        # empty excluded
                + [(11, "not a url", "x")])             # hostless excluded
        df = spark.createDataFrame(rows, "doc_id long, link string, anchor string")
        got = [(r["anchor"], r["n"], r["rank"])
               for r in top_anchors(df, k=2).orderBy("rank").collect()]
        assert got == [("click here", 3, 1), ("rare", 1, 2)]
