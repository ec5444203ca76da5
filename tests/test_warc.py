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
