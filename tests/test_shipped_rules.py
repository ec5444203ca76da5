"""Shipped rule library (configs/) executed end-to-end, plus statement rules
that exercise explode + cross-entity joins (J5 shape) and schema validation."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from cloud_data_quality_spark.config.loader import ConfigRegistry, load_configs
from cloud_data_quality_spark.config.model import (
    ConfigError,
    Entity,
    RowFilter,
    Rule,
    RuleBinding,
)
from cloud_data_quality_spark.engine.runner import DqEngine

TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
SF = "/root/testdata/sf0.001"


class TestShippedLibrary:
    def test_configs_load_and_all_demo_bindings_run(self, spark):
        reg = load_configs("configs")
        eng = DqEngine(spark, reg, table_name_vars={"sf_dir": SF})
        res = eng.run(sorted(reg.rule_bindings), execution_ts=TS,
                      write_summary=False)
        rows = res.summary.collect()
        assert len(rows) == 6
        assert all(r["rows_validated"] is not None for r in rows)

    def test_completeness_pct_rule(self, spark, tmp_path):
        """A6: completeness percentage threshold as a set-level rule
        (count_if ratio in HAVING with no GROUP BY)."""
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, None), (4, "d")], "id bigint, v string")
        path = str(tmp_path / "t.parquet")
        df.write.parquet(path)
        reg = ConfigRegistry()
        reg.entities["T"] = Entity.from_dict("T", {
            "table_name": path,
            "columns": {"ID": {"data_type": "INT64"},
                        "V": {"data_type": "STRING"}}})
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["COMPLETENESS_PCT_ABOVE"] = Rule.from_dict(
            "COMPLETENESS_PCT_ABOVE", {
                "rule_type": "CUSTOM_SQL_STATEMENT",
                "params": {
                    "custom_sql_statement":
                        "select 1 as error from data having "
                        "count_if($column is not null) * 100.0 / count(*) "
                        "< $threshold_pct",
                    "custom_sql_arguments": ["threshold_pct"]}})
        for threshold, expect_flag in ((40, True), (60, False)):
            reg.rule_bindings["RB"] = RuleBinding.from_dict("RB", {
                "entity_id": "T", "column_id": "V", "row_filter_id": "NONE",
                "rule_ids": [{"COMPLETENESS_PCT_ABOVE":
                              {"threshold_pct": threshold}}]})
            row = DqEngine(spark, reg).run(["RB"], execution_ts=TS,
                                           write_summary=False) \
                .summary.collect()[0]
            # 50% complete: threshold 40 passes (no error rows), 60 fails
            assert row["complex_rule_validation_success_flag"] is expect_flag, \
                threshold

    def test_volume_per_day_rule(self, spark):
        reg = ConfigRegistry()
        reg.entities["EVENTS"] = Entity.from_dict("EVENTS", {
            "table_name": f"{SF}/events.parquet",
            "columns": {"EVENT_ID": {"data_type": "INT64"},
                        "TS": {"data_type": "TIMESTAMP"}}})
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["VOLUME_PER_DAY_AT_LEAST"] = Rule.from_dict(
            "VOLUME_PER_DAY_AT_LEAST", {
                "rule_type": "CUSTOM_SQL_STATEMENT", "dimension": "timeliness",
                "params": {"custom_sql_statement":
                           "select day, n from (select date_trunc('DAY', "
                           "$column) as day, count(*) as n from data group "
                           "by 1) where n < $min_rows",
                           "custom_sql_arguments": ["min_rows"]}})
        reg.rule_bindings["RB"] = RuleBinding.from_dict("RB", {
            "entity_id": "EVENTS", "column_id": "TS", "row_filter_id": "NONE",
            "rule_ids": [{"VOLUME_PER_DAY_AT_LEAST": {"min_rows": 1}}]})
        row = DqEngine(spark, reg).run(["RB"], execution_ts=TS,
                                       write_summary=False).summary.collect()[0]
        assert row["complex_rule_validation_success_flag"] is True


class TestExplodeJoinStatement:
    def test_unnest_join_against_reference_entity(self, spark):
        """J5: statement explodes an array and equi-joins another configured
        entity (available as a temp view)."""
        reg = ConfigRegistry()
        reg.entities["DOCS"] = Entity.from_dict("DOCS", {
            "table_name": f"{SF}/documents.parquet",
            "columns": {"DOC_ID": {"data_type": "INT64"},
                        "TEXT": {"data_type": "STRING"}}})
        reg.entities["NATION"] = Entity.from_dict("NATION", {
            "table_name": f"{SF}/nation.parquet", "columns": {}})
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["TOKENS_ARE_NOT_NATION_NAMES"] = Rule.from_dict(
            "TOKENS_ARE_NOT_NATION_NAMES", {
                "rule_type": "CUSTOM_SQL_STATEMENT", "dimension": "integrity",
                "params": {"custom_sql_statement":
                           "select t.doc_id from (select doc_id, "
                           "explode(split(text, ' ')) as w from data) t "
                           "join NATION n on t.w = lower(n.n_name)"}})
        reg.rule_bindings["RB"] = RuleBinding.from_dict("RB", {
            "entity_id": "DOCS", "column_id": "TEXT", "row_filter_id": "NONE",
            "rule_ids": ["TOKENS_ARE_NOT_NATION_NAMES"]})
        row = DqEngine(spark, reg).run(["RB"], execution_ts=TS,
                                       write_summary=False).summary.collect()[0]
        assert row["complex_rule_validation_errors_count"] is not None


class TestSchemaValidation:
    def test_declared_column_missing_from_table(self, spark):
        reg = ConfigRegistry()
        reg.entities["DOCS"] = Entity.from_dict("DOCS", {
            "table_name": f"{SF}/documents.parquet",
            "columns": {"DOC_ID": {"data_type": "INT64"},
                        "NOT_A_REAL_COLUMN": {"data_type": "STRING"}}})
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["R"] = Rule.from_dict("R", {"rule_type": "NOT_NULL"})
        reg.rule_bindings["RB"] = RuleBinding.from_dict("RB", {
            "entity_id": "DOCS", "column_id": "DOC_ID", "row_filter_id": "NONE",
            "rule_ids": ["R"]})
        with pytest.raises(ConfigError, match="NOT_A_REAL_COLUMN"):
            DqEngine(spark, reg).run(["RB"], execution_ts=TS,
                                     write_summary=False)
