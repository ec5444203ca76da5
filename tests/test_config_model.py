"""Config-model unit tests — ports the *intent* of the reference's
tests/unit/test_classes.py (validation failures, $column escaping,
custom_sql_arguments) without Spark."""

from __future__ import annotations

import pytest

from cloud_data_quality_spark.config.loader import ConfigRegistry, load_configs
from cloud_data_quality_spark.config.model import (
    ConfigError,
    Entity,
    Rule,
    RuleBinding,
    RuleType,
    substitute_column,
)


def mk_rule(rule_type="NOT_NULL", **kw):
    return Rule.from_dict("R1", {"rule_type": rule_type, **kw})


class TestRule:
    def test_not_null(self):
        r = mk_rule()
        assert r.rule_type == RuleType.NOT_NULL
        assert r.skip_null_count is True
        assert r.resolved_sql_template({}) == "$column IS NOT NULL"

    def test_not_blank(self):
        assert mk_rule("NOT_BLANK").resolved_sql_template({}) == "TRIM($column) != ''"

    def test_unknown_rule_type(self):
        with pytest.raises(ConfigError, match="unknown rule_type"):
            mk_rule("NO_SUCH_TYPE")

    def test_regex_requires_pattern(self):
        with pytest.raises(ConfigError, match="pattern"):
            mk_rule("REGEX")

    def test_regex_invalid_pattern(self):
        with pytest.raises(ConfigError, match="invalid regex"):
            mk_rule("REGEX", params={"pattern": "([unclosed"})

    def test_regex_dollar_escaped(self):
        r = mk_rule("REGEX", params={"pattern": "^[a-z]+$"})
        sql = substitute_column(r.resolved_sql_template({}), "value")
        assert sql == "CAST(value AS STRING) RLIKE '^[a-z]+$'"

    def test_forbidden_sql(self):
        with pytest.raises(ConfigError, match="forbidden"):
            mk_rule("CUSTOM_SQL_EXPR",
                    params={"custom_sql_expr": "1=1; DROP TABLE x"}
                    ).resolved_sql_template({})

    def test_forbidden_sql_comment(self):
        with pytest.raises(ConfigError, match="forbidden"):
            mk_rule("CUSTOM_SQL_EXPR",
                    params={"custom_sql_expr": "length($column) -- sneaky"}
                    ).resolved_sql_template({})

    def test_statement_must_read_from_data(self):
        with pytest.raises(ConfigError, match="from data"):
            mk_rule("CUSTOM_SQL_STATEMENT",
                    params={"custom_sql_statement": "select 1 from elsewhere"})

    def test_custom_sql_argument_must_appear_in_template(self):
        with pytest.raises(ConfigError, match="does not appear"):
            mk_rule("CUSTOM_SQL_EXPR",
                    params={"custom_sql_expr": "length($column) < 10",
                            "custom_sql_arguments": ["upper_bound"]})

    def test_custom_sql_argument_must_be_supplied(self):
        r = mk_rule("CUSTOM_SQL_EXPR",
                    params={"custom_sql_expr": "length($column) < $upper_bound",
                            "custom_sql_arguments": ["upper_bound"]})
        with pytest.raises(ConfigError, match="not supplied"):
            r.resolved_sql_template({})
        assert r.resolved_sql_template({"upper_bound": 30}) == "length($column) < 30"

    def test_dimension_vocabulary(self):
        with pytest.raises(ConfigError, match="dimension"):
            mk_rule("NOT_NULL", dimension="nonsense")
        assert mk_rule("NOT_NULL", dimension="completeness").dimension == "COMPLETENESS"


class TestColumnSubstitution:
    def test_plain_column(self):
        assert substitute_column("$column IS NOT NULL", "VALUE") == "VALUE IS NOT NULL"

    def test_column_named_data_gets_prefix(self):
        # reference quirk: dq_rule_binding.py:322-334
        assert substitute_column("$column IS NOT NULL", "data") == \
            "data.data IS NOT NULL"


class TestEntity:
    def test_type_canonicalization(self):
        e = Entity.from_dict("E", {
            "table_name": "/tmp/t.parquet",
            "columns": {"A": {"data_type": "VARCHAR"}, "B": {"data_type": "INT64"},
                        "C": {"data_type": "DATETIME"}},
        })
        assert e.columns["A"].data_type == "string"
        assert e.columns["B"].data_type == "bigint"
        assert e.columns["C"].data_type == "timestamp_ntz"

    def test_unknown_type_rejected(self):
        with pytest.raises(ConfigError, match="unsupported data_type"):
            Entity.from_dict("E", {"table_name": "t",
                                   "columns": {"A": {"data_type": "GEOGRAPHY2"}}})

    def test_unknown_column_rejected(self):
        e = Entity.from_dict("E", {"table_name": "t",
                                   "columns": {"A": {"data_type": "STRING"}}})
        with pytest.raises(ConfigError, match="unknown column"):
            e.resolve_column("missing")


class TestRuleBinding:
    def test_rule_ids_forms(self):
        rb = RuleBinding.from_dict("RB", {
            "entity_id": "e", "column_id": "c", "row_filter_id": "f",
            "rule_ids": ["r1", {"r2": {"upper_bound": 5}}],
        })
        assert list(rb.iter_rule_refs()) == [("R1", {}), ("R2", {"upper_bound": 5})]

    def test_bad_rule_ids_entry(self):
        with pytest.raises(ConfigError, match="rule_ids entries"):
            RuleBinding.from_dict("RB", {
                "entity_id": "e", "column_id": "c", "row_filter_id": "f",
                "rule_ids": [{"r1": {}, "r2": {}}],
            })


class TestLoader:
    def test_duplicate_config_conflict(self, tmp_path):
        (tmp_path / "a.yml").write_text(
            "rules:\n  R1:\n    rule_type: NOT_NULL\n")
        (tmp_path / "b.yml").write_text(
            "rules:\n  R1:\n    rule_type: NOT_BLANK\n")
        with pytest.raises(ConfigError, match="duplicate config id"):
            load_configs(tmp_path)

    def test_duplicate_config_identical_ok(self, tmp_path):
        for name in ("a.yml", "b.yml"):
            (tmp_path / name).write_text("rules:\n  R1:\n    rule_type: NOT_NULL\n")
        reg = load_configs(tmp_path)
        assert "R1" in reg.rules

    def test_cross_reference_validated_eagerly(self, tmp_path):
        (tmp_path / "a.yml").write_text("""
rules:
  R1: {rule_type: NOT_NULL}
row_filters:
  NONE: {filter_sql_expr: "True"}
rule_bindings:
  RB1:
    entity_id: MISSING_ENTITY
    column_id: c
    row_filter_id: NONE
    rule_ids: [R1]
""")
        with pytest.raises(ConfigError, match="Unknown entity_id"):
            load_configs(tmp_path)

    def test_hashsum_stable(self, contact_registry: ConfigRegistry):
        h1 = contact_registry.configs_hashsum("T2_EMAIL")
        h2 = contact_registry.configs_hashsum("T2_EMAIL")
        assert h1 == h2 and len(h1) == 64


class TestEnvironmentOverride:
    """Ports the reference's environment_override test intents
    (dq_entity.py:211-257 / tests/unit/test_classes.py)."""

    BASE = {
        "table_name": "/data/base.parquet",
        "columns": {"X": {"data_type": "STRING"}},
    }

    def test_mismatched_env_key_rejected(self):
        from cloud_data_quality_spark.config.model import ConfigError, Entity
        with pytest.raises(ConfigError, match="must match value.environment"):
            Entity.from_dict("E", {
                **self.BASE,
                "environment_override": {
                    "TEST": {"environment": "prod",
                             "override": {"table_name": "/other"}}}})

    def test_missing_override_mapping_rejected(self):
        from cloud_data_quality_spark.config.model import ConfigError, Entity
        with pytest.raises(ConfigError, match="override"):
            Entity.from_dict("E", {
                **self.BASE,
                "environment_override": {"TEST": {"environment": "test"}}})

    def test_unsupported_override_key_rejected(self):
        from cloud_data_quality_spark.config.model import ConfigError, Entity
        with pytest.raises(ConfigError, match="unsupported override keys"):
            Entity.from_dict("E", {
                **self.BASE,
                "environment_override": {
                    "TEST": {"environment": "test",
                             "override": {"partition_fields": "x"}}}})

    def test_override_resolves_and_unknown_env_is_identity(self):
        from cloud_data_quality_spark.config.model import Entity
        e = Entity.from_dict("E", {
            **self.BASE,
            "environment_override": {
                "TEST": {"environment": "test",
                         "override": {"table_name": "/data/test.parquet"}}}})
        assert e.for_environment("test").table_name == "/data/test.parquet"
        assert e.for_environment("TEST").source_format == "parquet"  # inherited
        assert e.for_environment("PROD") is e
        assert e.for_environment(None) is e


class TestEntityUri:
    def test_parse_validates(self):
        from cloud_data_quality_spark.config.model import ConfigError, EntityUri
        with pytest.raises(ConfigError, match="Invalid entity_uri"):
            EntityUri.parse("no-scheme-here")
        with pytest.raises(ConfigError, match="scheme"):
            EntityUri.parse("bigquery://proj.ds.t")  # GCP scheme not mapped
        u = EntityUri.parse("catalog://db.contacts")
        assert u.scheme == "catalog" and u.path == "db.contacts"
        ent = u.to_entity()
        assert ent.source_format == "table"
        assert ent.table_name == "db.contacts"
        assert ent.columns == {}  # late-bound schema

    def test_binding_rejects_both_id_and_uri(self):
        from cloud_data_quality_spark.config.model import (
            ConfigError,
            RuleBinding,
        )
        with pytest.raises(ConfigError, match="not both"):
            RuleBinding.from_dict("RB", {
                "entity_id": "E", "entity_uri": "catalog://t",
                "column_id": "C", "row_filter_id": "NONE",
                "rule_ids": ["R"]})


class TestEnvironmentAndUriThroughEngine:
    def test_environment_override_switches_table(self, spark, tmp_path):
        """One binding, two environments → two different physical tables."""
        from cloud_data_quality_spark.config.loader import ConfigRegistry
        from cloud_data_quality_spark.config.model import (
            Entity,
            RowFilter,
            Rule,
            RuleBinding,
        )
        from cloud_data_quality_spark.engine.runner import DqEngine
        base, test = str(tmp_path / "base.pq"), str(tmp_path / "test.pq")
        spark.createDataFrame([("a",), ("b",)], "v string") \
            .write.parquet(base)
        spark.createDataFrame([("a",), (None,), (None,)], "v string") \
            .write.parquet(test)
        reg = ConfigRegistry()
        reg.entities["T"] = Entity.from_dict("T", {
            "table_name": base, "columns": {"V": {"data_type": "STRING"}},
            "environment_override": {
                "TEST": {"environment": "test",
                         "override": {"table_name": test}}}})
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["NN"] = Rule.from_dict("NN", {"rule_type": "NOT_NULL"})
        reg.rule_bindings["RB"] = RuleBinding.from_dict("RB", {
            "entity_id": "T", "column_id": "V", "row_filter_id": "NONE",
            "rule_ids": ["NN"]})
        from datetime import datetime, timezone
        ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
        r_base = DqEngine(spark, reg).run(["RB"], execution_ts=ts,
                                          write_summary=False)
        r_test = DqEngine(spark, reg, environment_target="test").run(
            ["RB"], execution_ts=ts, write_summary=False)
        assert r_base.summary.collect()[0]["failed_count"] == 0
        assert r_test.summary.collect()[0]["failed_count"] == 2

    def test_catalog_uri_binding_end_to_end(self, spark, contact_details):
        """entity_uri: catalog://view — schema late-bound from spark.table."""
        from cloud_data_quality_spark.config.loader import ConfigRegistry
        from cloud_data_quality_spark.config.model import (
            RowFilter,
            Rule,
            RuleBinding,
        )
        from cloud_data_quality_spark.engine.runner import DqEngine
        spark.read.parquet(contact_details) \
            .createOrReplaceTempView("cdq_uri_contacts")
        reg = ConfigRegistry()
        reg.row_filters["NONE"] = RowFilter.from_dict(
            "NONE", {"filter_sql_expr": "True"})
        reg.rules["NN"] = Rule.from_dict("NN", {"rule_type": "NOT_NULL"})
        reg.rule_bindings["RB_URI"] = RuleBinding.from_dict("RB_URI", {
            "entity_uri": "catalog://cdq_uri_contacts",
            "column_id": "VALUE", "row_filter_id": "NONE",
            "rule_ids": ["NN"]})
        from datetime import datetime, timezone
        ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
        res = DqEngine(spark, reg).run(["RB_URI"], execution_ts=ts,
                                       write_summary=False)
        row = res.summary.collect()[0]
        assert row["rows_validated"] == 9
        assert row["failed_count"] == 2  # the two NULL values
        assert row["table_id"] == "cdq_uri_contacts"


class TestReferenceEntityYamlCompat:
    def test_reference_test_data_yml_loads_unchanged(self, tmp_path):
        """The reference's BigQuery-shaped entity YAML (source_database,
        project/dataset names, env override on dataset/project) must load
        through load_configs byte-unchanged."""
        import shutil

        from cloud_data_quality_spark.config.loader import load_configs
        src = "/root/reference/tests/resources/configs/entities/test-data.yml"
        d = tmp_path / "cfg"
        d.mkdir()
        shutil.copy(src, d / "entities.yml")
        reg = load_configs(d)
        e = reg.get_entity("TEST_TABLE")
        assert e.source_format == "table"  # BIGQUERY → catalog table
        assert e.table_name == "contact_details"
        assert e.instance_name == "<your_gcp_project_id>"
        assert e.database_name == "<your_bigquery_dataset_id>"
        assert e.qualified_table_name == (
            "<your_gcp_project_id>.<your_bigquery_dataset_id>.contact_details")
        t = e.for_environment("test")
        assert t.instance_name == "<your_gcp_project_id_2>"
        assert t.database_name == "<your_bigquery_dataset_id_2>"
        assert t.table_name == "contact_details"  # not overridden → inherited
        assert {"ROW_ID", "CONTACT_TYPE", "VALUE", "DATA", "TS"} <= set(e.columns)


class TestReferenceConfigTreeCompat:
    """The reference's own YAML config trees must load through load_configs
    byte-unchanged — this is the 'a reference user can switch repos' gate."""

    def test_reference_test_config_tree_loads(self):
        from cloud_data_quality_spark.config.loader import load_configs
        reg = load_configs("/root/reference/tests/resources/configs")
        assert len(reg.rule_bindings) >= 17
        assert len(reg.rules) >= 6
        # bigquery:// URI bindings resolve to qualified catalog entities
        uri_rbs = [rb for rb in reg.rule_bindings.values()
                   if rb.entity_uri and rb.entity_uri.startswith("bigquery")]
        assert uri_rbs
        from cloud_data_quality_spark.config.model import EntityUri
        ent = EntityUri.parse(uri_rbs[0].entity_uri).to_entity()
        assert ent.source_format == "table"
        assert ent.database_name is not None

    def test_reference_shipped_configs_load(self):
        from cloud_data_quality_spark.config.loader import load_configs
        reg = load_configs("/root/reference/configs")
        assert len(reg.rules) >= 8 and len(reg.rule_bindings) >= 3

    def test_reference_uri_formats_parse(self):
        from cloud_data_quality_spark.config.model import ConfigError, EntityUri
        e = EntityUri.parse(
            "bigquery://projects/p1/datasets/d1/tables/t1").to_entity()
        assert e.qualified_table_name == "p1.d1.t1"
        e2 = EntityUri.parse(
            "dataplex://projects/p/locations/l/lakes/lk/zones/z/"
            "entities/contact_details").to_entity()
        assert e2.table_name == "contact_details"
        with pytest.raises(ConfigError, match="tables"):
            EntityUri.parse("bigquery://projects/p/datasets/d")
        with pytest.raises(ConfigError, match="wildcards"):
            EntityUri.parse("bigquery://projects/p/datasets/d/tables/t*")


class TestMetadataRegistryDefaults:
    """Reference parity: `metadata_registry_defaults` fills in missing
    dataplex URI path-pair fields so short URIs work
    (metadata_registry_defaults.py:28-35, dq_entity_uri.py:48-55 — defaults
    merged UNDER the URI's own pairs, URI wins)."""

    YAML = """
metadata_registry_defaults:
  dataplex:
    projects: proj-default
    locations: loc-default
    lakes: lake-default
    zones: zone-default
entities: {}
row_filters:
  NONE: {filter_sql_expr: "True"}
rules:
  R_NN: {rule_type: NOT_NULL}
rule_bindings:
  RB_SHORT:
    entity_uri: "dataplex://zones/z-override/entities/docs_view"
    column_id: TEXT
    row_filter_id: NONE
    rule_ids: [R_NN]
"""

    def test_defaults_merge_under_uri_pairs(self, tmp_path):
        from cloud_data_quality_spark.config.loader import load_configs
        from cloud_data_quality_spark.config.model import EntityUri
        (tmp_path / "c.yml").write_text(self.YAML)
        reg = load_configs(str(tmp_path))
        assert reg.registry_defaults == {"dataplex": {
            "projects": "proj-default", "locations": "loc-default",
            "lakes": "lake-default", "zones": "zone-default"}}
        uri = EntityUri.parse(
            "dataplex://zones/z-override/entities/docs_view",
            registry_defaults=reg.registry_defaults)
        pairs = uri.path_pairs
        assert pairs["projects"] == "proj-default"   # from defaults
        assert pairs["zones"] == "z-override"        # URI wins over default
        assert pairs["entities"] == "docs_view"
        assert uri.to_entity().table_name == "docs_view"

    def test_binding_with_short_uri_compiles_and_runs(self, spark, tmp_path):
        from cloud_data_quality_spark.config.loader import load_configs
        from cloud_data_quality_spark.engine.runner import DqEngine
        (tmp_path / "c.yml").write_text(self.YAML)
        spark.createDataFrame([("a",), (None,)], "text string") \
            .createOrReplaceTempView("docs_view")
        reg = load_configs(str(tmp_path))
        res = DqEngine(spark, reg).run(["RB_SHORT"], write_summary=False)
        row = res.summary.collect()[0]
        assert (row["rows_validated"], row["success_count"]) == (2, 1)

    def test_non_dataplex_registry_rejected(self, tmp_path):
        from cloud_data_quality_spark.config.loader import load_configs
        from cloud_data_quality_spark.config.model import ConfigError
        (tmp_path / "c.yml").write_text("""
metadata_registry_defaults:
  bigquery: {projects: p}
rules:
  R: {rule_type: NOT_NULL}
""")
        with pytest.raises(ConfigError, match="dataplex only"):
            load_configs(str(tmp_path))

    def test_unsupported_uri_characters_rejected(self):
        from cloud_data_quality_spark.config.model import ConfigError, EntityUri
        with pytest.raises(ConfigError, match="unsupported character"):
            EntityUri.parse("dataplex://zones/z/entities/e?x=1")
