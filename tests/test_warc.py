"""WARC container parsing: byte-level round trip, damage handling, the
mapInPandas explode stage."""

from __future__ import annotations

from cloud_data_quality_spark.functions.warc import (
    make_warc_record,
    parse_warc_records,
    warc_records,
)


class TestParser:
    def test_round_trip_multi_record(self):
        blob = (make_warc_record("https://a/1", "2026-01-01T00:00:00Z",
                                 b"<html>one</html>")
                + make_warc_record("https://a/2", "2026-01-02T00:00:00Z",
                                   b"two", warc_type="request"))
        recs = parse_warc_records(blob)
        assert [r["warc_type"] for r in recs] == ["response", "request"]
        assert recs[0]["target_uri"] == "https://a/1"
        assert recs[0]["payload"] == b"<html>one</html>"
        assert recs[1]["content_length"] == 3

    def test_payload_containing_crlf_and_version_string(self):
        """Content-Length framing, not delimiter scanning: a payload that
        CONTAINS record terminators and a WARC version line must not
        derail the walk."""
        tricky = b"x\r\n\r\nWARC/1.0\r\ny"
        blob = (make_warc_record("https://a", "2026-01-01T00:00:00Z",
                                 tricky)
                + make_warc_record("https://b", "2026-01-01T00:00:00Z",
                                   b"after"))
        recs = parse_warc_records(blob)
        assert len(recs) == 2
        assert recs[0]["payload"] == tricky
        assert recs[1]["target_uri"] == "https://b"

    def test_damage_returns_clean_prefix(self):
        good = make_warc_record("https://a", "2026-01-01T00:00:00Z", b"ok")
        assert len(parse_warc_records(good + b"garbage")) == 1
        truncated = make_warc_record(
            "https://b", "2026-01-01T00:00:00Z", b"body")[:30]
        assert len(parse_warc_records(good + truncated)) == 1
        # missing Content-Length ends the walk
        broken = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")
        assert parse_warc_records(good + broken) == \
            parse_warc_records(good)
        assert parse_warc_records(b"") == []


class TestWarcRecordsStage:
    def test_explode_filter_and_null(self, spark):
        rows = [
            (1, make_warc_record("https://a/1", "2026-01-01T00:00:00Z",
                                 b"one")
             + make_warc_record("https://a/2", "2026-01-01T00:00:00Z",
                                b"req", warc_type="request")
             + make_warc_record("https://a/3", "2026-01-01T00:00:00Z",
                                b"three")),
            (2, None),
            (3, b"not a warc"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, warc binary")
        got = {(r["doc_id"], r["record_idx"]): r for r in
               warc_records(df, types=("response",)).collect()}
        # doc 1: records 0 and 2 are responses; idx counts ALL records
        assert set(got) == {(1, 0), (1, 2)}
        assert bytes(got[(1, 2)]["payload"]) == b"three"
        assert got[(1, 0)]["content_length"] == 3

    def test_no_type_filter_returns_everything(self, spark):
        blob = (make_warc_record("https://a", "2026-01-01T00:00:00Z", b"r")
                + make_warc_record("https://a", "2026-01-01T00:00:00Z",
                                   b"q", warc_type="request"))
        df = spark.createDataFrame([(1, blob)], "doc_id bigint, warc binary")
        assert warc_records(df, types=()).count() == 2


class TestHtmlMeta:
    def test_flags_canonical_and_nulls(self, spark):
        from pyspark.sql import functions as F

        from cloud_data_quality_spark.functions.html_extract import html_meta
        rows = [
            (1, b'<head><meta name="robots" content="noindex,nofollow">'
                b'</head>'),
            (2, b'<head><META NAME="robots" CONTENT="NOFOLLOW"></head>'),
            (3, b'<link rel="canonical" href="https://a/x">'),
            (4, b'<link href="https://b/y" rel="canonical">'),
            (5, b'<p>no tags at all</p>'),
            (6, None),
            # content attr before name: outside the documented attribute-
            # order contract -> not detected (order contract, not a bug)
            (7, b'<meta content="noindex" name="robots">'),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, html binary")
        got = {r["doc_id"]: r for r in
               df.select("doc_id", *html_meta(F.col("html"))).collect()}
        assert (got[1]["robots_noindex"], got[1]["robots_nofollow"]) \
            == (True, True)
        assert (got[2]["robots_noindex"], got[2]["robots_nofollow"]) \
            == (False, True)
        assert got[3]["canonical_url"] == "https://a/x"
        assert got[4]["canonical_url"] == "https://b/y"
        assert got[5]["canonical_url"] is None
        assert got[5]["robots_noindex"] is False
        assert got[6]["robots_noindex"] is None
        assert got[6]["canonical_url"] is None
        assert got[7]["robots_noindex"] is False

    def test_pure_column_plan(self, spark):
        from pyspark.sql import functions as F

        from cloud_data_quality_spark.functions.html_extract import html_meta
        df = spark.createDataFrame([(1, b"<p>x</p>")],
                                   "doc_id bigint, html binary")
        plan = df.select(*html_meta(F.col("html"))) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
