"""CUSTOM_PANDAS_BATCH rules through the engine + streaming quality filter."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from cloud_data_quality_spark.config.loader import ConfigRegistry
from cloud_data_quality_spark.config.model import Entity, RowFilter, Rule, RuleBinding
from cloud_data_quality_spark.engine.runner import DqEngine

TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def webtext_registry(pages_parquet):
    reg = ConfigRegistry()
    reg.entities["PAGES"] = Entity.from_dict("PAGES", {
        "table_name": pages_parquet,
        "columns": {
            "URL": {"data_type": "STRING"},
            "WARC_TS": {"data_type": "TIMESTAMP"},
            "HTML": {"data_type": "BYTES"},
            "TEXT": {"data_type": "STRING"},
            "LANG": {"data_type": "STRING"},
        },
    })
    reg.row_filters["NONE"] = RowFilter.from_dict("NONE", {"filter_sql_expr": "True"})
    reg.rules["IS_ENGLISH"] = Rule.from_dict("IS_ENGLISH", {
        "rule_type": "CUSTOM_PANDAS_BATCH",
        "params": {"function": "LANGID_IS", "lang": "en"}})
    reg.rules["GOPHER_OK"] = Rule.from_dict("GOPHER_OK", {
        "rule_type": "CUSTOM_PANDAS_BATCH",
        "params": {"function": "GOPHER_QUALITY"}})
    reg.rules["LOW_PERPLEXITY"] = Rule.from_dict("LOW_PERPLEXITY", {
        "rule_type": "CUSTOM_PANDAS_BATCH",
        "params": {"function": "PERPLEXITY_BELOW", "threshold": 30.0}})
    reg.rules["PII_FREE"] = Rule.from_dict("PII_FREE", {
        "rule_type": "CUSTOM_PANDAS_BATCH",
        "params": {"function": "NO_PII"}})
    reg.rules["TEXT_NOT_NULL"] = Rule.from_dict("TEXT_NOT_NULL",
                                                {"rule_type": "NOT_NULL"})
    reg.rule_bindings["RB_WEBTEXT"] = RuleBinding.from_dict("RB_WEBTEXT", {
        "entity_id": "PAGES", "column_id": "TEXT", "row_filter_id": "NONE",
        "rule_ids": ["TEXT_NOT_NULL", "IS_ENGLISH", "GOPHER_OK",
                     "LOW_PERPLEXITY", "PII_FREE"],
    })
    reg.rules["ML_KEEP"] = Rule.from_dict("ML_KEEP", {
        "rule_type": "CUSTOM_PANDAS_BATCH",
        "params": {"function": "CLASSIFIER_KEEP"}})
    reg.rule_bindings["RB_ML"] = RuleBinding.from_dict("RB_ML", {
        "entity_id": "PAGES", "column_id": "TEXT", "row_filter_id": "NONE",
        "rule_ids": ["TEXT_NOT_NULL", "ML_KEEP"],
    })
    return reg


class TestPandasBatchRules:
    def test_webtext_rules_through_engine(self, spark, webtext_registry,
                                          pages_parquet):
        """The north-star rule types (langid / gopher / perplexity / PII)
        compile into the same single-pass summary as SQL rules, with mixed
        SQL + Arrow validity columns in one projection."""
        eng = DqEngine(spark, webtext_registry)
        res = eng.run(["RB_WEBTEXT"], execution_ts=TS, write_summary=False)
        rows = {r["rule_id"]: r.asDict() for r in res.summary.collect()}
        assert set(rows) == {"TEXT_NOT_NULL", "IS_ENGLISH", "GOPHER_OK",
                             "LOW_PERPLEXITY", "PII_FREE"}
        n = rows["TEXT_NOT_NULL"]["rows_validated"]
        assert n == spark.read.parquet(pages_parquet).count()
        # NULL-text rows count as null for batch rules (tri-valued semantics)
        n_null_text = spark.read.parquet(pages_parquet) \
            .where(F.col("text").isNull()).count()
        assert rows["IS_ENGLISH"]["null_count"] == n_null_text
        for rid in ("IS_ENGLISH", "GOPHER_OK", "LOW_PERPLEXITY", "PII_FREE"):
            r = rows[rid]
            assert r["success_count"] + r["failed_count"] + r["null_count"] == n
            assert 0 < r["success_count"] < n, rid
        # PII pages exist in the fixture → PII_FREE must fail some rows
        assert rows["PII_FREE"]["failed_count"] > 0

    def test_batch_rule_agrees_with_direct_function(self, spark,
                                                    webtext_registry,
                                                    pages_parquet):
        import pandas as pd

        from cloud_data_quality_spark.functions.webtext_rules import langid_batch
        pdf = spark.read.parquet(pages_parquet).select("text").toPandas()
        expected_en = (langid_batch(pdf["text"]) == "en")[pdf["text"].notna()].sum()
        eng = DqEngine(spark, webtext_registry)
        res = eng.run(["RB_WEBTEXT"], execution_ts=TS, write_summary=False)
        row = {r["rule_id"]: r for r in res.summary.collect()}["IS_ENGLISH"]
        assert row["success_count"] == expected_en

    def test_batch_rule_stored_query_is_honest_and_runnable(
            self, spark, webtext_registry):
        """An Arrow-batch rule's validity isn't SQL-expressible, so its
        stored failed_records_query must say so explicitly and return zero
        rows when run — never a half-SQL guess (the failing rows live in
        dq_failed_records, keyed by _dq_validation_rule_id)."""
        eng = DqEngine(spark, webtext_registry)
        res = eng.run(["RB_WEBTEXT"], execution_ts=TS, write_summary=False)
        rows = {r["rule_id"]: r.asDict() for r in res.summary.collect()}
        q = rows["GOPHER_OK"]["failed_records_query"]
        assert "GOPHER_QUALITY" in q and "dq_failed_records" in q
        assert spark.sql(q).collect() == []  # ready-to-run, zero rows
        # SQL rules in the same binding keep real failing-row queries
        qn = rows["TEXT_NOT_NULL"]["failed_records_query"]
        assert "IS NULL" in qn and "Arrow batch rule" not in qn

    def test_unknown_batch_function_rejected(self):
        from cloud_data_quality_spark.config.model import Rule
        from cloud_data_quality_spark.compiler.binding import compile_rule
        rule = Rule.from_dict("R", {"rule_type": "CUSTOM_PANDAS_BATCH",
                                    "params": {"function": "NOPE"}})
        with pytest.raises(KeyError, match="NOPE"):
            compile_rule(rule, "TEXT", {})


class TestStreaming:
    def test_stream_matches_batch(self, spark, pages_parquet, tmp_path):
        """availableNow file stream through the annotator == batch output."""
        from cloud_data_quality_spark.streaming.quality_stream import (
            run_stream_to_parquet,
        )
        from cloud_data_quality_spark.operators.quality_filter import (
            annotate_quality_arrow,
        )
        out = str(tmp_path / "out")
        q = run_stream_to_parquet(
            spark, pages_parquet, out, str(tmp_path / "ckpt"))
        q.awaitTermination(300)
        batch = annotate_quality_arrow(spark.read.parquet(pages_parquet)) \
            .where(F.col("keep"))
        got = spark.read.parquet(out)
        assert got.count() == batch.count()
        cols = ["url", "drop_reason", "scrubbed_text"]
        assert got.select(cols).exceptAll(batch.select(cols)).count() == 0

    def test_windowed_summary_stream(self, spark, pages_parquet):
        from cloud_data_quality_spark.streaming.quality_stream import (
            windowed_quality_summary,
        )
        schema = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
        stream = spark.readStream.schema(schema).parquet(pages_parquet)
        agg = windowed_quality_summary(stream, window="24 hours",
                                       watermark="48 hours")
        # complete mode for the bounded test source: append would hold back
        # windows the watermark hasn't passed when the stream ends
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName("qsum").trigger(availableNow=True).start())
        q.awaitTermination(300)
        rows = spark.sql("select * from qsum").collect()
        assert len(rows) > 0
        total = sum(r["n_docs"] for r in rows)
        assert total == spark.read.parquet(pages_parquet).count()


class TestStreamingDqContract:
    def test_rule_bindings_on_stream_match_batch(self, spark, pages_parquet,
                                                 webtext_registry, tmp_path):
        """The CloudDQ contract runs CONTINUOUSLY: per-micro-batch summary
        rows through the sink, and the totals over all batches equal one
        batch run over the same data (same compiled plan both ways)."""
        from cloud_data_quality_spark.engine.runner import DqEngine
        from cloud_data_quality_spark.engine.sinks import ParquetAppendSink
        from cloud_data_quality_spark.streaming.dq_stream import (
            run_bindings_on_stream,
        )
        sink = ParquetAppendSink(str(tmp_path / "dq_summary_stream"))
        engine = DqEngine(spark, webtext_registry, summary_sink=sink)
        schema = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)   # force >1 micro-batch
                  .parquet(pages_parquet))
        q = run_bindings_on_stream(engine, ["RB_WEBTEXT"], stream,
                                   run_id="s1",
                                   checkpoint_path=str(tmp_path / "ckpt"))
        q.awaitTermination(300)

        got = sink.read(spark, deduped=True)
        rows = [r.asDict() for r in got.collect()]
        assert all(r["invocation_id"].startswith("s1-b") for r in rows)
        # batch-stable idempotency key
        assert all(r["dq_run_id"].startswith("s1-b") for r in rows)
        n_batches = len({r["invocation_id"] for r in rows})
        assert n_batches >= 1

        # restart with the same checkpoint: nothing new to process, and the
        # deduped summary (MERGE-on-dq_run_id semantics) is unchanged
        total_before = got.count()
        q2 = run_bindings_on_stream(engine, ["RB_WEBTEXT"], stream,
                                    run_id="s1",
                                    checkpoint_path=str(tmp_path / "ckpt"))
        q2.awaitTermination(300)
        assert sink.read(spark, deduped=True).count() == total_before

        # totals across micro-batches == one batch run on the same table
        batch_engine = DqEngine(spark, webtext_registry)
        batch = batch_engine.run(["RB_WEBTEXT"], write_summary=False)
        batch_rows = {r["rule_id"]: r.asDict()
                      for r in batch.summary.collect()}
        for rule_id, b in batch_rows.items():
            stream_rows = [r for r in rows if r["rule_id"] == rule_id]
            assert sum(r["rows_validated"] for r in stream_rows) == \
                b["rows_validated"], rule_id
            if b["success_count"] is not None:
                assert sum(r["success_count"] for r in stream_rows) == \
                    b["success_count"], rule_id


class TestRepetitionRule:
    def test_repetition_ok_through_engine(self, spark, tmp_path):
        reg = ConfigRegistry()
        src = str(tmp_path / "rep.parquet")
        spark.createDataFrame(
            [("u1", " ".join(f"w{i}" for i in range(40))),   # clean
             ("u2", " ".join(["buy now"] * 30)),             # repeated spam
             ("u3", "solo"),                                 # too short: pass
             ("u4", None)],                                  # NULL
            schema="url string, text string").write.parquet(src)
        reg.entities["P"] = Entity.from_dict("P", {
            "table_name": src,
            "columns": {"URL": {"data_type": "STRING"},
                        "TEXT": {"data_type": "STRING"}}})
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["REP"] = Rule.from_dict("REP", {
            "rule_type": "CUSTOM_PANDAS_BATCH",
            "params": {"function": "REPETITION_OK", "max_dup_frac": 0.2,
                       "max_top_frac": 0.18}})
        reg.rule_bindings["RB"] = RuleBinding.from_dict("RB", {
            "entity_id": "P", "column_id": "TEXT", "row_filter_id": "NONE",
            "rule_ids": ["REP"]})
        res = DqEngine(spark, reg).run(["RB"], execution_ts=TS,
                                       write_summary=False)
        row = res.summary.collect()[0]
        assert row["rows_validated"] == 4
        assert row["success_count"] == 2   # clean + too-short
        assert row["failed_count"] == 1    # the spam doc
        assert row["null_count"] == 1


class TestStreamingClassifierRule:
    def test_ml_keep_stream_totals_match_batch(self, spark, pages_parquet,
                                               webtext_registry, tmp_path):
        """The learned-classifier rule is just another CUSTOM_PANDAS_BATCH
        rule to the streaming DQ contract: per-micro-batch summary totals
        must equal one batch run (exact int64 scoring makes the equality
        strict, not approximate)."""
        from cloud_data_quality_spark.engine.runner import DqEngine
        from cloud_data_quality_spark.engine.sinks import ParquetAppendSink
        from cloud_data_quality_spark.streaming.dq_stream import (
            run_bindings_on_stream,
        )
        sink = ParquetAppendSink(str(tmp_path / "ml_summary_stream"))
        engine = DqEngine(spark, webtext_registry, summary_sink=sink)
        schema = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(pages_parquet))
        q = run_bindings_on_stream(engine, ["RB_ML"], stream, run_id="ml1",
                                   checkpoint_path=str(tmp_path / "ckpt_ml"))
        q.awaitTermination(300)
        rows = [r.asDict() for r in sink.read(spark, deduped=True).collect()]
        ml_rows = [r for r in rows if r["rule_id"] == "ML_KEEP"]
        assert ml_rows

        batch = DqEngine(spark, webtext_registry) \
            .run(["RB_ML"], write_summary=False)
        b = {r["rule_id"]: r.asDict() for r in batch.summary.collect()}
        assert sum(r["rows_validated"] for r in ml_rows) == \
            b["ML_KEEP"]["rows_validated"]
        assert sum(r["success_count"] for r in ml_rows) == \
            b["ML_KEEP"]["success_count"]
        assert sum(r["failed_count"] for r in ml_rows) == \
            b["ML_KEEP"]["failed_count"]
        assert sum(r["null_count"] for r in ml_rows) == \
            b["ML_KEEP"]["null_count"]
