"""Rule-binding → Spark plan compiler.

The reference renders one BigQuery SQL script per rule binding with one
UNION-ALL branch per rule over the same scan
(clouddq/templates/dbt/macros/create_rule_binding_view.sql:56-95) and lets
BigQuery dedupe the scan. A literal translation would re-scan the table once
per rule in Spark, so we compile differently (SURVEY.md §4.1):

* ONE filtered scan per binding (row filter ∧ incremental watermark ∧
  partition NULL-guards, all pushed down by Catalyst),
* every *simple* rule becomes one tri-valued predicate ``Column`` evaluated
  in a single projection pass (macros.sql:28-42 semantics: NULL column →
  NULL, predicate → TRUE, else FALSE; NOT_NULL has no NULL branch),
* every *set-level* rule (CUSTOM_SQL_STATEMENT) becomes a DataFrame-producing
  closure run against the filtered scan registered as the ``data`` view
  (rule_type.py:111-127 contract: statement must read ``from data``; rows
  returned are errors),
* CUSTOM_PANDAS_BATCH rules (new) become vectorized Arrow stages that emit a
  boolean validity column.

Compilation is a pure function (no SparkSession needed until `.filter_df`),
mirroring the reference's testable seam lib.create_rule_binding_view_model
(clouddq/lib.py:101-153).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cloud_data_quality_spark.compiler.dialect import bq_to_spark_sql
from cloud_data_quality_spark.config.loader import ConfigRegistry
from cloud_data_quality_spark.config.model import (
    Rule,
    RuleBinding,
    RuleType,
    substitute_column,
)
from cloud_data_quality_spark.functions.batch_registry import get_batch_function


@dataclass(frozen=True)
class CompiledRule:
    rule_id: str
    rule_type: RuleType
    dimension: str | None
    skip_null_count: bool
    # simple rules: Spark SQL boolean expression string over the scan columns
    predicate_sql: str | None = None
    # set-level rules: Spark SQL statement reading `from data`
    statement_sql: str | None = None
    # pandas-batch rules: name of registered batch fn + its params
    batch_function: str | None = None
    batch_params: dict = field(default_factory=dict)
    column_id: str | None = None

    def predicate(self) -> Column:
        """Tri-valued validity Column (TRUE/FALSE/NULL) per macros.sql:28-42."""
        assert self.predicate_sql is not None
        pred = F.expr(self.predicate_sql)
        col = F.col(self.column_id) if self.column_id else None
        if self.rule_type == RuleType.NOT_NULL or col is None:
            # no NULL branch: NULL column simply fails the IS NOT NULL test
            return F.when(pred, F.lit(True)).otherwise(F.lit(False))
        return (
            F.when(col.isNull(), F.lit(None).cast("boolean"))
            .when(pred, F.lit(True))
            .otherwise(F.lit(False))
        )


@dataclass(frozen=True)
class CompiledBinding:
    rule_binding_id: str
    entity_id: str
    table_name: str
    source_format: str
    column_id: str
    filter_sql: str                      # row filter (Spark SQL, post-shim)
    partition_null_guards: tuple[str, ...]
    incremental_column: str | None
    reference_columns: tuple[str, ...]
    simple_rules: tuple[CompiledRule, ...]
    statement_rules: tuple[CompiledRule, ...]
    batch_rules: tuple[CompiledRule, ...]
    metadata: dict
    configs_hashsum: str

    @property
    def all_rules(self) -> tuple[CompiledRule, ...]:
        return self.simple_rules + self.batch_rules + self.statement_rules

    def scan_filter(self) -> Column:
        cond = F.expr(self.filter_sql)
        for g in self.partition_null_guards:
            cond = cond & F.col(g).isNotNull()
        return cond

    def filter_df(self, df: DataFrame, high_watermark=None, current_ts=None) -> DataFrame:
        """Apply row filter + partition guards + incremental BETWEEN filter
        (create_rule_binding_view.sql:62-77 semantics). Filters are plain
        Column expressions → Catalyst pushes them into the parquet scan."""
        out = df.where(self.scan_filter())
        if self.incremental_column and high_watermark is not None:
            ts = F.col(self.incremental_column).cast("timestamp")
            if current_ts is not None:
                out = out.where(ts.between(F.lit(high_watermark), F.lit(current_ts)))
            else:
                out = out.where(ts > F.lit(high_watermark))
        return out


def compile_rule(rule: Rule, column_id: str, binding_arguments: dict) -> CompiledRule:
    sql_template = rule.resolved_sql_template(binding_arguments)
    base = dict(
        rule_id=rule.rule_id,
        rule_type=rule.rule_type,
        dimension=rule.dimension,
        skip_null_count=rule.skip_null_count,
        column_id=column_id,
    )
    if rule.rule_type == RuleType.CUSTOM_SQL_STATEMENT:
        return CompiledRule(statement_sql=bq_to_spark_sql(
            substitute_column(sql_template, column_id)), **base)
    if rule.rule_type == RuleType.CUSTOM_PANDAS_BATCH:
        get_batch_function(rule.params["function"])  # validate it exists
        return CompiledRule(
            batch_function=rule.params["function"],
            batch_params={**{k: v for k, v in rule.params.items() if k != "function"},
                          **binding_arguments},
            **base,
        )
    return CompiledRule(predicate_sql=bq_to_spark_sql(
        substitute_column(sql_template, column_id)), **base)


def compile_binding(registry: ConfigRegistry, rule_binding_id: str,
                    environment_target: str | None = None) -> CompiledBinding:
    rb: RuleBinding = registry.get_rule_binding(rule_binding_id)
    if rb.entity_uri is not None:
        # late binding (dq_entity_uri.py semantics): schema comes from the
        # live table at read time, so no declared-column checks here
        from cloud_data_quality_spark.config.model import EntityUri
        entity = EntityUri.parse(
            rb.entity_uri,
            registry_defaults=getattr(registry, "registry_defaults", None),
        ).to_entity()
    else:
        entity = registry.get_entity(rb.entity_id).for_environment(
            environment_target)
    if entity.columns:
        entity.resolve_column(rb.column_id)  # unknown column id → hard error
    row_filter = registry.get_row_filter(rb.row_filter_id)
    if rb.incremental_time_filter_column_id and entity.columns:
        inc_col = entity.resolve_column(rb.incremental_time_filter_column_id)
        if inc_col.data_type not in ("timestamp", "timestamp_ntz", "date"):
            from cloud_data_quality_spark.config.model import ConfigError
            raise ConfigError(
                f"RuleBinding {rb.rule_binding_id}: incremental_time_filter_column_id "
                f"{inc_col.name} must be a TIMESTAMP/DATETIME column, got {inc_col.data_type}"
            )
    ref_cols: tuple[str, ...] = ()
    if rb.reference_columns_id:
        ref_cols = tuple(
            registry.get_reference_columns(rb.reference_columns_id).resolve(entity)
        )

    simple, stmt, batch = [], [], []
    for rule_id, args in rb.iter_rule_refs():
        cr = compile_rule(registry.get_rule(rule_id), rb.column_id, args)
        {RuleType.CUSTOM_SQL_STATEMENT: stmt,
         RuleType.CUSTOM_PANDAS_BATCH: batch}.get(cr.rule_type, simple).append(cr)

    return CompiledBinding(
        rule_binding_id=rb.rule_binding_id,
        entity_id=entity.entity_id,
        table_name=entity.qualified_table_name,
        source_format=entity.source_format,
        column_id=rb.column_id,
        filter_sql=bq_to_spark_sql(row_filter.filter_sql_expr),
        partition_null_guards=entity.partition_fields,
        incremental_column=rb.incremental_time_filter_column_id,
        reference_columns=ref_cols,
        simple_rules=tuple(simple),
        statement_rules=tuple(stmt),
        batch_rules=tuple(batch),
        metadata=rb.metadata,
        configs_hashsum=registry.configs_hashsum(rule_binding_id),
    )


# Callable alias for set-level rule runners
StatementRunner = Callable[[DataFrame], int]
