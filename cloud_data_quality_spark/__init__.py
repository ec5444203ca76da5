"""cloud_data_quality_spark — a from-scratch PySpark-native data-quality /
web-text quality-filter engine with the capabilities of
GoogleCloudPlatform/cloud-data-quality (CloudDQ).

CloudDQ is a YAML-declared rule engine that compiles rules into BigQuery SQL
(reference: clouddq/templates/dbt/macros/create_rule_binding_view.sql:16-144).
This package keeps the *semantics* — rules, rule bindings, row filters,
entities, the dq_summary contract, incremental watermark, failed-records
lineage — and re-expresses execution as idiomatic Spark: each rule compiles to
a DataFrame ``Column`` predicate or a vectorized Arrow stage; all simple rules
of a binding are evaluated in ONE scan pass and aggregated in ONE groupBy
(the reference runs one UNION-ALL branch per rule and lets BigQuery dedupe
the scan).
"""

__version__ = "0.1.0"

from cloud_data_quality_spark.config.model import (  # noqa: F401
    Entity,
    EntityColumn,
    ReferenceColumns,
    RowFilter,
    Rule,
    RuleBinding,
    RuleType,
)
