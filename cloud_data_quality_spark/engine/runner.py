"""DqEngine — executes compiled rule bindings and materializes the
dq_summary + dq_failed_records outputs.

Execution strategy per binding (contrast with the reference, which submits one
BigQuery script per binding with one UNION-ALL branch per rule —
create_rule_binding_view.sql:86-95 — and lets BigQuery dedupe the scan):

1. ONE filtered scan (row filter + partition guards + incremental watermark
   all pushed to the parquet/Iceberg reader by Catalyst).
2. ONE projection computing every simple rule's tri-valued validity column
   plus every CUSTOM_PANDAS_BATCH rule's validity via an Arrow-vectorized
   pandas_udf — whole-stage-codegen for the SQL predicates, Arrow batches for
   the Python stages, zero extra scans.
3. ONE aggregation: count(*), and per rule count_if(valid), count_if(NOT
   valid), count_if(valid IS NULL). Spark performs partial (map-side)
   aggregation automatically, so the shuffle carries ~3·N_rules longs per
   partition, not rows. The single aggregated row is collected to the driver
   (scalar-sized) and expanded into summary rows — the reference's
   zero_record LEFT JOIN totem (macros.sql:53-58) is unnecessary because the
   row is built driver-side even for empty input.
4. Failed records: the same projected frame (cached when any consumer needs
   it) yields per-rule failing rows in ONE pass: build an array of failing
   rule_ids per row, explode, write. valid IS FALSE only — NULL validity is
   not a failure (failed_records_query.sql:108-109).
5. CUSTOM_SQL_STATEMENT rules: the filtered scan is registered as the `data`
   temp view; each statement runs via spark.sql; rows returned are errors
   (macros.sql:90-99). The errors_count uses .count(), never
   COUNT(*) OVER () — a global window would collapse to one partition.

At 100 TB the dominant cost is the scan; this design reads the entity exactly
once per binding regardless of rule count, and bindings sharing an entity can
share a cached scan via `run(..., reuse_scan=True)`.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_data_quality_spark.compiler.binding import (
    CompiledBinding,
    CompiledRule,
    compile_binding,
)
from cloud_data_quality_spark.config.loader import ConfigRegistry
from cloud_data_quality_spark.config.model import RuleType
from cloud_data_quality_spark.engine.summary import (
    SUMMARY_SCHEMA,
    RuleCounts,
    build_summary_row,
)
from cloud_data_quality_spark.functions.batch_registry import get_batch_function

EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _aware_utc(ts: datetime) -> datetime:
    """collect() hands back tz-naive timestamps (session tz is pinned UTC);
    normalize so watermark values compare/format consistently with EPOCH."""
    return ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)


@dataclass
class RunResult:
    invocation_id: str
    summary: DataFrame
    failed_records: DataFrame | None = None
    stats: dict = field(default_factory=dict)


def _valid_col_name(rule_id: str) -> str:
    return f"__valid_{rule_id}"


class DqEngine:
    def __init__(
        self,
        spark: SparkSession,
        registry: ConfigRegistry,
        summary_path: str | None = None,
        failed_records_path: str | None = None,
        table_name_vars: dict[str, str] | None = None,
        summary_sink=None,
        environment_target: str | None = None,
    ):
        self.spark = spark
        self.registry = registry
        self.summary_path = summary_path
        self.failed_records_path = failed_records_path
        self.table_name_vars = table_name_vars or {}
        # reference: per-environment entity remapping selected at run time
        # (dq_entity.py:211-257); applied wherever an entity is resolved
        self.environment_target = environment_target
        if summary_sink is None and summary_path:
            from cloud_data_quality_spark.engine.sinks import ParquetAppendSink
            summary_sink = ParquetAppendSink(summary_path)
        self.summary_sink = summary_sink
        import threading
        self._statement_lock = threading.Lock()
        self._write_lock = threading.Lock()

    # ---------- sources ----------

    def read_entity(self, binding: CompiledBinding,
                    validate_schema: bool = True) -> DataFrame:
        name = binding.table_name.format(**self.table_name_vars)
        fmt = binding.source_format
        if fmt == "table":
            df = self.spark.table(name)
        elif fmt == "csv":
            df = self.spark.read.csv(name, header=True, inferSchema=True)
        elif fmt == "json":
            df = self.spark.read.json(name)
        elif fmt == "orc":
            df = self.spark.read.orc(name)
        else:
            df = self.spark.read.parquet(name)
        if validate_schema:
            self._validate_entity_schema(binding.entity_id, name, df)
        return df

    def _validate_entity_schema(self, entity_id: str, name: str,
                                df: DataFrame) -> None:
        """S8 parity: declared entity columns must exist in the actual table
        (the reference hard-errors on unknown column ids,
        dq_entity.py:116-133; we additionally check declaration vs reality
        at read time — the moment a catalog fetch would happen)."""
        entity = self.registry.entities.get(entity_id)
        if entity is None or not entity.columns:
            return
        actual = {c.upper() for c in df.columns}
        missing = sorted(set(entity.columns) - actual)
        if missing:
            from cloud_data_quality_spark.config.model import ConfigError
            raise ConfigError(
                f"Entity {entity_id}: declared columns {missing} not present "
                f"in {name} (actual: {sorted(actual)})")

    def register_entity_views(self) -> None:
        """Expose every configured entity as a temp view named by its
        entity_id, so CUSTOM_SQL_EXPR rules can use IN/EXISTS subqueries
        against reference tables (R6 — integrity_reference_data.yaml shape;
        Spark supports these subqueries in DataFrame expressions natively)."""
        from cloud_data_quality_spark.compiler.binding import CompiledBinding
        for entity in self.registry.entities.values():
            entity = entity.for_environment(self.environment_target)
            df = self.read_entity(CompiledBinding(
                rule_binding_id="", entity_id=entity.entity_id,
                table_name=entity.qualified_table_name,
                source_format=entity.source_format,
                column_id="", filter_sql="true", partition_null_guards=(),
                incremental_column=None, reference_columns=(),
                simple_rules=(), statement_rules=(), batch_rules=(),
                metadata={}, configs_hashsum=""))
            df.createOrReplaceTempView(entity.entity_id)

    def entity_last_modified(self, binding: CompiledBinding) -> datetime | None:
        """S4: table last-modified — the reference reads __TABLES__
        (create_rule_binding_view.sql:78-83); for file sources use the newest
        file mtime, for catalog tables this would be Iceberg's snapshot
        committed_at."""
        if binding.source_format == "table":
            return None
        path = Path(binding.table_name.format(**self.table_name_vars))
        if not path.exists():
            return None
        files = list(path.glob("**/*")) if path.is_dir() else [path]
        mtimes = [f.stat().st_mtime for f in files if f.is_file()]
        if not mtimes:
            return None
        return datetime.fromtimestamp(max(mtimes), tz=timezone.utc)

    def publish_to_target(self, target_path: str, invocation_id: str) -> int:
        """S6: copy this invocation's summary rows to the user-facing target
        table (reference: dq_target_table_utils.py:41-106 filters by
        invocation_id + partition date and WRITE_APPENDs)."""
        summary = self.read_summary(deduped=True)
        rows = summary.where(F.col("invocation_id") == invocation_id)
        rows.write.mode("append").parquet(target_path)
        return rows.count()

    # ---------- watermark (reference: clouddq/lib.py:274-306) ----------

    def high_watermark(self, binding: CompiledBinding) -> datetime:
        """Newest watermarked execution_ts for this binding, read through the
        configured SummarySink — NOT a raw parquet path, so incremental runs
        work with every sink (MERGE INTO tables have no summary_path at all).
        A sink whose backing table/path doesn't exist yet means no prior run:
        EPOCH — probed via sink.exists(), never by catching a read failure,
        so a store that EXISTS but can't be read (corrupt state that would
        silently re-scan everything forever) propagates loudly.
        deduped=False: max(execution_ts) needs no per-run dedupe."""
        if self.summary_sink is None or not self.summary_sink.exists(self.spark):
            return EPOCH
        summary = self.summary_sink.read(self.spark, deduped=False)
        row = (
            summary.where(
                (F.col("rule_binding_id") == binding.rule_binding_id)
                & (F.col("table_id") == binding.table_name)
                & (F.col("progress_watermark") == True)  # noqa: E712
            )
            .agg(F.coalesce(F.max("execution_ts"), F.lit(EPOCH)).alias("hwm"))
            .collect()[0]
        )
        return _aware_utc(row["hwm"] or EPOCH)

    def high_watermarks(
        self, bindings: list[CompiledBinding],
    ) -> dict[tuple[str, str], datetime]:
        """Batched watermark lookup: ONE groupBy job over the summary store
        for every incremental binding in the run. A run with hundreds of
        incremental bindings previously launched one scalar agg job each
        over the same summary; driver job-submission latency dominated.
        Same sink-routed read and EPOCH semantics as high_watermark()."""
        keys = {(b.rule_binding_id, b.table_name)
                for b in bindings if b.incremental_column}
        out = {k: EPOCH for k in keys}
        if not keys or self.summary_sink is None \
                or not self.summary_sink.exists(self.spark):
            return out
        summary = self.summary_sink.read(self.spark, deduped=False)
        rows = (
            summary.where(F.col("progress_watermark") == True)  # noqa: E712
            .where(F.col("rule_binding_id").isin(
                sorted({k[0] for k in keys})))
            .groupBy("rule_binding_id", "table_id")
            .agg(F.max("execution_ts").alias("hwm"))
            .collect()
        )
        for r in rows:
            k = (r["rule_binding_id"], r["table_id"])
            if k in out and r["hwm"] is not None:
                out[k] = _aware_utc(r["hwm"])
        return out

    # ---------- per-binding plan ----------

    def _batch_validity(self, rule: CompiledRule) -> Column:
        """Arrow-vectorized validity column for a CUSTOM_PANDAS_BATCH rule."""
        fn = get_batch_function(rule.batch_function)
        params = dict(rule.batch_params)

        @F.pandas_udf("boolean")
        def _validity(s: pd.Series) -> pd.Series:
            return fn(s, params).astype("boolean")

        return _validity(F.col(rule.column_id))

    def projected_frame(self, binding: CompiledBinding, df: DataFrame) -> DataFrame:
        """Original columns + one tri-valued validity column per row-level rule."""
        cols = [F.col(c) for c in df.columns]
        for rule in binding.simple_rules:
            cols.append(rule.predicate().alias(_valid_col_name(rule.rule_id)))
        for rule in binding.batch_rules:
            cols.append(self._batch_validity(rule).alias(_valid_col_name(rule.rule_id)))
        return df.select(*cols)

    def run_binding(
        self,
        binding: CompiledBinding,
        *,
        invocation_id: str,
        execution_ts: datetime,
        df: DataFrame | None = None,
        progress_watermark: bool = True,
        incremental: bool = False,
        write_failed_records: bool = False,
        last_modified: datetime | None = None,
        hwm: datetime | None = None,
    ) -> list[dict]:
        """Execute one compiled binding → list of summary-row dicts.
        ``hwm``: precomputed watermark from high_watermarks() (run() batches
        the lookup); None → look it up individually."""
        spark = self.spark
        if df is None:
            df = self.read_entity(binding)
        if incremental and binding.incremental_column:
            if hwm is None:
                hwm = self.high_watermark(binding)
        else:
            hwm = None
        filtered = binding.filter_df(df, high_watermark=hwm, current_ts=execution_ts
                                     if hwm is not None else None)

        row_rules = binding.simple_rules + binding.batch_rules
        projected = self.projected_frame(binding, filtered)

        needs_reuse = bool(binding.statement_rules) or write_failed_records
        if needs_reuse:
            projected = projected.persist()

        # ---- single-pass aggregation over all row-level rules ----
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for rule in row_rules:
            v = F.col(_valid_col_name(rule.rule_id))
            aggs += [
                F.count_if(v == True).alias(f"__s_{rule.rule_id}"),   # noqa: E712
                F.count_if(v == False).alias(f"__f_{rule.rule_id}"),  # noqa: E712
                F.count_if(v.isNull()).alias(f"__n_{rule.rule_id}"),
            ]
        agg_row = projected.agg(*aggs).collect()[0]
        rows_validated = int(agg_row["__rows"])

        counts: list[RuleCounts] = []
        for rule in row_rules:
            counts.append(RuleCounts(
                rule_id=rule.rule_id,
                dimension=rule.dimension,
                skip_null_count=rule.skip_null_count,
                is_statement=False,
                column_id=rule.column_id,
                success=int(agg_row[f"__s_{rule.rule_id}"]),
                failed=int(agg_row[f"__f_{rule.rule_id}"]),
                null=int(agg_row[f"__n_{rule.rule_id}"]),
                failed_records_query=self._failed_records_sql(binding, rule),
            ))

        # ---- set-level rules over the `data` view ----
        # the view name is fixed by the statement contract ("from data"), a
        # session-global — serialize register+run when bindings execute on
        # concurrent driver threads (run(max_concurrency > 1))
        if binding.statement_rules:
            with self._statement_lock:
                filtered.createOrReplaceTempView("data")
                for rule in binding.statement_rules:
                    errors = spark.sql(rule.statement_sql).count()
                    counts.append(RuleCounts(
                        rule_id=rule.rule_id,
                        dimension=rule.dimension,
                        skip_null_count=True,
                        is_statement=True,
                        column_id=None,
                        errors_count=int(errors),
                        failed_records_query=self._statement_failed_records_sql(
                            binding, rule, invocation_id,
                            high_watermark=hwm,
                            current_ts=execution_ts if hwm is not None else None),
                    ))

        # ---- failed records: one pass, explode failing rule ids ----
        # concurrent appends to one path share its _temporary staging dir —
        # serialize (the write is output-sized, rarely the bottleneck)
        if write_failed_records and row_rules and self.failed_records_path:
            with self._write_lock:
                self._write_failed_records(
                    binding, projected, row_rules,
                    invocation_id=invocation_id, execution_ts=execution_ts,
                )

        if needs_reuse:
            projected.unpersist()

        metadata_json = json.dumps(binding.metadata, sort_keys=True)
        return [
            build_summary_row(
                counts=c,
                rows_validated=rows_validated,
                rule_binding_id=binding.rule_binding_id,
                table_id=binding.table_name,
                metadata_json=metadata_json,
                configs_hashsum=binding.configs_hashsum,
                execution_ts=execution_ts,
                invocation_id=invocation_id,
                progress_watermark=progress_watermark,
                last_modified=last_modified,
            )
            for c in counts
        ]

    def _failed_records_sql(self, binding: CompiledBinding, rule: CompiledRule) -> str:
        """Human-runnable Spark SQL selecting this rule's failing rows — the
        reference stores an equivalent BigQuery string per summary row
        (failed_records_query.sql:36-116, which filters row_is_valid IS
        FALSE). Per-rule-type failure predicate: a NOT_NULL rule fails on
        NULL rows, so conjoining `col IS NOT NULL AND NOT (col IS NOT NULL)`
        would be a contradiction returning 0 rows; every other simple rule's
        tri-valued validity is FALSE only on non-NULL rows."""
        ref = ", ".join(binding.reference_columns) or binding.column_id
        if rule.rule_type == RuleType.NOT_NULL:
            fail = f"{binding.column_id} IS NULL"
        elif rule.predicate_sql is None:
            # CUSTOM_PANDAS_BATCH validity is computed in an Arrow stage —
            # not SQL-expressible, so the stored query says so explicitly
            # and returns zero rows rather than pretending (the actual
            # failing rows are in the dq_failed_records output, keyed by
            # _dq_validation_rule_id)
            fail = (f"FALSE /* {rule.batch_function}: Arrow batch rule; "
                    f"query dq_failed_records for failing rows */")
        else:
            fail = (f"{binding.column_id} IS NOT NULL "
                    f"AND NOT ({rule.predicate_sql})")
        return (
            f"SELECT {ref}, {binding.column_id} AS column_value "
            f"FROM {self._table_ref(binding)} data "
            f"WHERE ({binding.filter_sql}) AND {fail}"
        )

    def _table_ref(self, binding: CompiledBinding) -> str:
        """SQL table reference that spark.sql can run AS-IS: catalog tables
        by name, file sources via Spark's direct-file syntax
        (`parquet.`/path``) — so stored failed_records queries are
        ready-to-run, not rewrite-before-use."""
        name = binding.table_name.format(**self.table_name_vars)
        if binding.source_format == "table":
            return name
        return f"{binding.source_format}.`{name}`"

    def _statement_failed_records_sql(self, binding: CompiledBinding,
                                      rule: CompiledRule,
                                      invocation_id: str,
                                      high_watermark: datetime | None = None,
                                      current_ts: datetime | None = None) -> str:
        """Ready-to-run triage query for a CUSTOM_SQL_STATEMENT rule,
        matching the reference's failed-records contract
        (failed_records_query.sql:36-116 and
        validate_complex_rule_failed_records_query, macros.sql:145-180):
        the `data` CTE is the binding's filtered scan, each of the
        statement's error rows comes back with the `_dq_validation_*`
        column set, the error payload is echoed as
        custom_sql_statement_validation_errors, and the query returns ZERO
        rows when the rule passes (the reference reaches the same end by
        filtering `_dq_validation_complex_rule_validation_success_flag IS
        FALSE`). errors_count is attached via a counted CTE cross join
        rather than the reference's `COUNT(*) OVER ()` — identical values
        without a one-partition global window."""
        dim = (f"'{rule.dimension}'" if rule.dimension
               else "CAST(NULL AS STRING)")
        stmt = "\n".join("  " + line for line in
                         rule.statement_sql.strip().splitlines())
        # incremental runs reproduce the run's watermark window in the data
        # CTE (reference failed_records_query.sql:48-58 interpolates
        # high_watermark_value/current_timestamp_value the same way)
        where = f"({binding.filter_sql})"
        if high_watermark is not None and binding.incremental_column:
            hi = current_ts or datetime.now(timezone.utc)
            where += (
                f" AND CAST({binding.incremental_column} AS TIMESTAMP) "
                f"BETWEEN CAST('{high_watermark.isoformat()}' AS TIMESTAMP) "
                f"AND CAST('{hi.isoformat()}' AS TIMESTAMP)")
        # the `src` alias is load-bearing: without it Spark's parser reads
        # `...parquet.`path` WHERE (True)` as table alias WHERE with a
        # column-alias list (True) → ASSIGNMENT_ARITY_MISMATCH
        return (
            f"WITH data AS (\n"
            f"  SELECT * FROM {self._table_ref(binding)} src "
            f"WHERE {where}\n"
            f"),\n"
            f"validation_errors AS (\n{stmt}\n"
            f"),\n"
            f"errs AS (SELECT COUNT(*) AS n FROM validation_errors)\n"
            f"SELECT\n"
            f"  '{invocation_id}' AS _dq_validation_invocation_id,\n"
            f"  '{binding.rule_binding_id}' AS _dq_validation_rule_binding_id,\n"
            f"  '{rule.rule_id}' AS _dq_validation_rule_id,\n"
            f"  CAST(NULL AS STRING) AS _dq_validation_column_id,\n"
            f"  CAST(NULL AS STRING) AS _dq_validation_column_value,\n"
            f"  CAST({dim} AS STRING) AS _dq_validation_dimension,\n"
            f"  CAST(NULL AS BOOLEAN) AS _dq_validation_simple_rule_row_is_valid,\n"
            f"  errs.n AS _dq_validation_complex_rule_validation_errors_count,\n"
            f"  (errs.n = 0) AS _dq_validation_complex_rule_validation_success_flag,\n"
            f"  to_json(struct(e.*)) AS custom_sql_statement_validation_errors\n"
            f"FROM validation_errors e CROSS JOIN errs\n"
            f"ORDER BY _dq_validation_rule_id"
        )

    def failed_records_frame(
        self,
        binding: CompiledBinding,
        projected: DataFrame,
        row_rules: tuple[CompiledRule, ...],
        *,
        invocation_id: str,
        execution_ts: datetime,
    ) -> DataFrame:
        """Long-format failing rows: one output row per (input row, failing
        rule). Single pass: array of failing rule ids → filter → explode."""
        failing = F.array_compact(F.array(*[
            F.when(F.col(_valid_col_name(r.rule_id)) == False,  # noqa: E712
                   F.lit(r.rule_id))
            for r in row_rules
        ]))
        ref_cols = list(binding.reference_columns) or [binding.column_id]
        return (
            projected
            .withColumn("__failing_rules", failing)
            .where(F.size("__failing_rules") > 0)
            .select(
                F.explode("__failing_rules").alias("_dq_validation_rule_id"),
                F.lit(binding.rule_binding_id).alias("_dq_validation_rule_binding_id"),
                F.lit(binding.column_id).alias("_dq_validation_column_id"),
                F.col(binding.column_id).cast("string")
                 .alias("_dq_validation_column_value"),
                F.to_json(F.struct(*[F.col(c) for c in ref_cols]))
                 .alias("_dq_validation_reference_columns_json"),
                F.lit(invocation_id).alias("_dq_validation_invocation_id"),
                F.lit(execution_ts).alias("_dq_validation_execution_ts"),
            )
        )

    def _write_failed_records(self, binding, projected, row_rules, *,
                              invocation_id, execution_ts) -> None:
        out = self.failed_records_frame(
            binding, projected, row_rules,
            invocation_id=invocation_id, execution_ts=execution_ts,
        )
        (out.write.mode("append").parquet(self.failed_records_path))

    # ---------- whole-run orchestration ----------

    def run(
        self,
        rule_binding_ids: list[str],
        *,
        incremental: bool = False,
        write_failed_records: bool = False,
        progress_watermark: bool = True,
        execution_ts: datetime | None = None,
        invocation_id: str | None = None,
        write_summary: bool = True,
        max_concurrency: int = 1,
    ) -> RunResult:
        """max_concurrency > 1 runs entity GROUPS on a thread pool — Spark
        schedules jobs from multiple driver threads natively, so a 50-binding
        run over small entities keeps the cluster busy instead of idling it
        between sequential scalar-sized jobs. The `data` temp view (shared
        session name) and failed-records appends (shared output directory,
        one _temporary staging dir per path) are serialized by locks; summary
        rows keep deterministic order (results collected in group order)."""
        execution_ts = execution_ts or datetime.now(timezone.utc)
        invocation_id = invocation_id or uuid.uuid4().hex
        self.register_entity_views()
        rows: list[dict] = []
        # group bindings by entity so a shared scan is read once per entity
        by_entity: dict[str, list[CompiledBinding]] = {}
        for rbid in rule_binding_ids:
            b = compile_binding(self.registry, rbid,
                                environment_target=self.environment_target)
            by_entity.setdefault(b.table_name + "|" + b.source_format, []).append(b)

        hwms = self.high_watermarks(
            [b for g in by_entity.values() for b in g]) if incremental else {}

        def run_group(bindings: list[CompiledBinding]) -> list[dict]:
            df = self.read_entity(bindings[0])
            out: list[dict] = []
            for binding in bindings:
                out.extend(self.run_binding(
                    binding,
                    invocation_id=invocation_id,
                    execution_ts=execution_ts,
                    df=df,
                    progress_watermark=progress_watermark,
                    incremental=incremental,
                    write_failed_records=write_failed_records,
                    last_modified=self.entity_last_modified(binding),
                    hwm=hwms.get((binding.rule_binding_id, binding.table_name)),
                ))
            return out

        groups = list(by_entity.values())
        if max_concurrency > 1 and len(groups) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
                for group_rows in pool.map(run_group, groups):
                    rows.extend(group_rows)
        else:
            for bindings in groups:
                rows.extend(run_group(bindings))
        # plain tuples, NOT a pandas frame: pandas coerces None in integer
        # columns to NaN, which createDataFrame rejects for LongType when the
        # session doesn't have Arrow enabled (the driver's session may not)
        field_names = [f.name for f in SUMMARY_SCHEMA.fields]
        summary = self.spark.createDataFrame(
            [tuple(r[k] for k in field_names) for r in rows],
            schema=SUMMARY_SCHEMA,
        ) if rows else self.spark.createDataFrame([], schema=SUMMARY_SCHEMA)
        if write_summary and self.summary_sink is not None:
            self.summary_sink.write(summary)
        return RunResult(invocation_id=invocation_id, summary=summary,
                         stats={"bindings": len(rule_binding_ids),
                                "summary_rows": len(rows)})

    def dry_run(self, rule_binding_ids: list[str]) -> list[dict]:
        """Validate-only mode, the reference's default posture (main.py:
        146-151 dry-runs every generated script through BigQuery's dry-run
        API before executing anything): compile every binding, resolve its
        entity + declared-vs-actual schema, build and ANALYZE each rule
        plan — including statement SQL against the `data` view — but execute
        nothing. No jobs run, no summary/failed-records output is written.
        Returns one dict per binding with what WOULD run; config or
        analysis errors raise exactly as a real run would."""
        self.register_entity_views()
        out: list[dict] = []
        for rbid in rule_binding_ids:
            binding = compile_binding(self.registry, rbid,
                                      environment_target=self.environment_target)
            df = self.read_entity(binding)  # declared-schema check happens here
            filtered = binding.filter_df(df)
            projected = self.projected_frame(binding, filtered)
            _ = projected.schema  # force analysis of every rule expression
            statement_ok: list[str] = []
            if binding.statement_rules:
                with self._statement_lock:
                    filtered.createOrReplaceTempView("data")
                    for rule in binding.statement_rules:
                        _ = self.spark.sql(rule.statement_sql).schema
                        statement_ok.append(rule.rule_id)
            out.append({
                "rule_binding_id": rbid,
                "table": binding.table_name.format(**self.table_name_vars),
                "filter": binding.filter_sql,
                "column_id": binding.column_id,
                "row_rules": [r.rule_id for r in
                              binding.simple_rules + binding.batch_rules],
                "statement_rules": statement_ok,
                "physical_plan_head": projected._jdf.queryExecution()
                    .simpleString().splitlines()[0],
            })
        return out

    def read_summary(self, deduped: bool = True) -> DataFrame:
        """Read the metrics table through the configured sink. With
        deduped=True the result has one logical row per dq_run_id — the
        reference's incremental-MERGE contract (dq_summary.sql:15-26) —
        whether the sink achieves that physically (MERGE INTO / compaction)
        or on read (append sink)."""
        return self.summary_sink.read(self.spark, deduped=deduped)
