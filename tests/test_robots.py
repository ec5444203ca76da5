"""robots.txt parsing + URL admission."""

from __future__ import annotations

from cloud_data_quality_spark.functions.robots import (
    parse_robots_txt,
    robots_filter,
    robots_rules,
)


class TestParser:
    def test_groups_comments_and_wildcards(self):
        txt = """# corpus robots
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private/   # trailing comment
Allow: /private/open/
Disallow: /no*tch
Disallow:
Allow: /ok$
Crawl-delay: 5
"""
        assert parse_robots_txt(txt) == [
            (False, "/private/"), (True, "/private/open/")]

    def test_consecutive_agent_lines_share_a_group(self):
        txt = ("User-agent: googlebot\nUser-agent: *\n"
               "Disallow: /a\n"
               "User-agent: evilbot\nDisallow: /b\n")
        assert parse_robots_txt(txt) == [(False, "/a")]

    def test_empty_and_none(self):
        assert parse_robots_txt("") == []
        assert parse_robots_txt(None) == []


class TestRobotsFilter:
    def test_longest_match_and_tie_break(self, spark):
        robots = spark.createDataFrame(
            [("a.example",
              "User-agent: *\nDisallow: /p/\nAllow: /p/open/\n"
              "Allow: /q/\nDisallow: /q/\n")],  # exact tie -> Allow wins
            "host string, robots_txt string")
        rules = robots_rules(robots)
        pages = spark.createDataFrame(
            [(1, "https://a.example/p/secret"),
             (2, "https://a.example/p/open/doc"),
             (3, "https://a.example/q/tied"),
             (4, "https://a.example/other"),
             (5, "https://b.example/p/secret"),   # no rules for host b
             (6, "https://a.example/")],
            "doc_id bigint, url string")
        kept = {r["doc_id"] for r in
                robots_filter(pages, rules).collect()}
        assert kept == {2, 3, 4, 5, 6}

    def test_query_string_not_matched(self, spark):
        robots = spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /x\n")],
            "host string, robots_txt string")
        pages = spark.createDataFrame(
            [(1, "https://a.example/ok?next=/x")],
            "doc_id bigint, url string")
        assert robots_filter(pages, robots_rules(robots)).count() == 1


class TestCli:
    def test_robots_filter_op(self, spark, tmp_path, capsys):
        import json

        from cloud_data_quality_spark.cli import main
        inp = str(tmp_path / "p.parquet")
        spark.createDataFrame(
            [("https://a.example/p/x", "t"), ("https://a.example/ok", "t")],
            "url string, text string").write.parquet(inp)
        rob = str(tmp_path / "r.parquet")
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /p/\n")],
            "host string, robots_txt string").write.parquet(rob)
        out = str(tmp_path / "o")
        rc = main(["corpus", "--op", "robots-filter", "--input", inp,
                   "--output", out, "--robots", rob])
        assert rc == 0
        kept = {r["url"] for r in spark.read.parquet(out).collect()}
        assert kept == {"https://a.example/ok"}
