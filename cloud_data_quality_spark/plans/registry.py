"""Query/oracle registry — the driver-contract surface.

Each entry pairs a Spark DataFrame query (built from this package's operators)
with an exact DuckDB oracle SQL string over the same parquet tables. The
driver runs both at sf0.01 and compares row count + schema + order-insensitive
value hash (see __spark_entry__.py). Column names/types are aliased
identically on both sides; floats are rounded to fixed decimals on both sides.

Conventions:
* deterministic only — no current_timestamp, no rand, fixed execution_ts
  for engine runs;
* counts cast to BIGINT on both sides;
* lsh_ann is approximate w.r.t. BRUTE FORCE (recall pytest-asserted) but
  deterministic given its hyperplanes, so it still carries an exact value
  oracle generated from the shared plane constants (_oracle_lsh_ann).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_data_quality_spark.config.loader import ConfigRegistry
from cloud_data_quality_spark.config.model import (
    Entity,
    ReferenceColumns,
    RowFilter,
    Rule,
    RuleBinding,
)
from cloud_data_quality_spark.engine.runner import DqEngine
from cloud_data_quality_spark.functions import text as TX
from cloud_data_quality_spark.functions.dedup import (
    exact_duplicates,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_bands,
    simhash_pairs,
)
from cloud_data_quality_spark.functions.scrub import scrub_text
from cloud_data_quality_spark.functions.similarity import (
    brute_force_topk_np,
    lsh_bucketed_neighbors,
)
from cloud_data_quality_spark.operators.quality_filter import annotate_quality
from cloud_data_quality_spark.plans import oracle_fragments as OF

TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# CloudDQ rule-engine queries (compiled + executed through DqEngine)
# --------------------------------------------------------------------------

def _dq_registry() -> ConfigRegistry:
    """In-code config set over the testdata tables (table_name templated on
    {sf_dir}, resolved by DqEngine.table_name_vars)."""
    reg = ConfigRegistry()
    reg.entities["CUSTOMER"] = Entity.from_dict("CUSTOMER", {
        "table_name": "{sf_dir}/customer.parquet",
        "columns": {
            "C_CUSTKEY": {"data_type": "INT64"},
            "C_NAME": {"data_type": "STRING"},
            "C_NATIONKEY": {"data_type": "INT64"},
            "C_ACCTBAL": {"data_type": "FLOAT64"},
            "C_MKTSEGMENT": {"data_type": "STRING"},
        },
    })
    reg.entities["ORDERS"] = Entity.from_dict("ORDERS", {
        "table_name": "{sf_dir}/orders.parquet",
        "columns": {
            "O_ORDERKEY": {"data_type": "INT64"},
            "O_CUSTKEY": {"data_type": "INT64"},
            "O_ORDERSTATUS": {"data_type": "STRING"},
            "O_TOTALPRICE": {"data_type": "FLOAT64"},
            "O_ORDERDATE": {"data_type": "DATE"},
            "O_ORDERPRIORITY": {"data_type": "STRING"},
        },
    })
    reg.entities["EVENTS"] = Entity.from_dict("EVENTS", {
        "table_name": "{sf_dir}/events.parquet",
        "columns": {
            "EVENT_ID": {"data_type": "INT64"},
            "TS": {"data_type": "TIMESTAMP"},
            "USER_ID": {"data_type": "INT64"},
            "EVENT_TYPE": {"data_type": "STRING"},
            "VALUE": {"data_type": "FLOAT64"},
            "PROPS": {"data_type": "STRING"},
        },
    })
    reg.row_filters["NONE"] = RowFilter.from_dict("NONE", {"filter_sql_expr": "True"})
    reg.row_filters["BUILDING"] = RowFilter.from_dict(
        "BUILDING", {"filter_sql_expr": "c_mktsegment = 'BUILDING'"})
    reg.row_filters["JAN_WINDOW"] = RowFilter.from_dict(
        "JAN_WINDOW",
        {"filter_sql_expr":
         "ts >= timestamp_ntz'2024-01-01 00:00:00' and ts < timestamp_ntz'2024-01-08 00:00:00'"})
    reg.rules["ACCTBAL_NOT_NULL"] = Rule.from_dict(
        "ACCTBAL_NOT_NULL", {"rule_type": "NOT_NULL"})
    reg.rules["ACCTBAL_NON_NEGATIVE"] = Rule.from_dict(
        "ACCTBAL_NON_NEGATIVE",
        {"rule_type": "CUSTOM_SQL_EXPR",
         "params": {"custom_sql_expr": "$column >= 0"}})
    reg.rules["NAME_FORMAT"] = Rule.from_dict(
        "NAME_FORMAT",
        {"rule_type": "REGEX", "params": {"pattern": "^Customer.[0-9]+$"}})
    reg.rules["ACCTBAL_BELOW_LIMIT"] = Rule.from_dict(
        "ACCTBAL_BELOW_LIMIT",
        {"rule_type": "CUSTOM_SQL_EXPR",
         "params": {"custom_sql_expr": "$column <= $limit",
                    "custom_sql_arguments": ["limit"]}})
    reg.rules["NO_DUP_CUSTKEY"] = Rule.from_dict(
        "NO_DUP_CUSTKEY",
        {"rule_type": "CUSTOM_SQL_STATEMENT",
         "dimension": "duplication",
         "params": {"custom_sql_statement":
                    "select a.* from data a inner join (select o_custkey from data "
                    "group by o_custkey having count(*) > 1) d using (o_custkey)"}})
    reg.rules["VALUE_NOT_NULL"] = Rule.from_dict(
        "VALUE_NOT_NULL", {"rule_type": "NOT_NULL"})
    reg.rule_bindings["RB_CUSTOMER_ACCTBAL"] = RuleBinding.from_dict(
        "RB_CUSTOMER_ACCTBAL", {
            "entity_id": "CUSTOMER", "column_id": "C_ACCTBAL",
            "row_filter_id": "BUILDING",
            "rule_ids": ["ACCTBAL_NOT_NULL", "ACCTBAL_NON_NEGATIVE",
                         {"ACCTBAL_BELOW_LIMIT": {"limit": 5000}}],
        })
    reg.rule_bindings["RB_CUSTOMER_NAME"] = RuleBinding.from_dict(
        "RB_CUSTOMER_NAME", {
            "entity_id": "CUSTOMER", "column_id": "C_NAME",
            "row_filter_id": "NONE", "rule_ids": ["NAME_FORMAT"],
        })
    reg.rule_bindings["RB_ORDERS_DUP"] = RuleBinding.from_dict(
        "RB_ORDERS_DUP", {
            "entity_id": "ORDERS", "column_id": "O_CUSTKEY",
            "row_filter_id": "NONE", "rule_ids": ["NO_DUP_CUSTKEY"],
        })
    reg.rule_bindings["RB_EVENTS_WINDOW"] = RuleBinding.from_dict(
        "RB_EVENTS_WINDOW", {
            "entity_id": "EVENTS", "column_id": "VALUE",
            "row_filter_id": "JAN_WINDOW", "rule_ids": ["VALUE_NOT_NULL"],
        })
    return reg


def _run_dq(spark: SparkSession, sf_dir: str, binding_ids: list[str],
            registry: ConfigRegistry | None = None) -> DataFrame:
    eng = DqEngine(spark, registry or _dq_registry(),
                   table_name_vars={"sf_dir": sf_dir})
    res = eng.run(binding_ids, execution_ts=TS, write_summary=False)
    return res.summary.select(
        "rule_binding_id", "rule_id",
        F.col("rows_validated").cast("bigint").alias("rows_validated"),
        F.col("success_count").cast("bigint").alias("success_count"),
        F.col("failed_count").cast("bigint").alias("failed_count"),
        F.col("null_count").cast("bigint").alias("null_count"),
        F.col("complex_rule_validation_errors_count").cast("bigint")
         .alias("errors_count"),
        F.col("complex_rule_validation_success_flag").alias("success_flag"),
    )


def q_rb_customer_rules(spark, sf_dir):
    return _run_dq(spark, sf_dir, ["RB_CUSTOMER_ACCTBAL", "RB_CUSTOMER_NAME"])


ORACLE_RB_CUSTOMER_RULES = """
with b as (select * from customer where c_mktsegment = 'BUILDING')
select 'RB_CUSTOMER_ACCTBAL' as rule_binding_id, 'ACCTBAL_NOT_NULL' as rule_id,
       count(*)::BIGINT as rows_validated,
       count_if(c_acctbal is not null)::BIGINT as success_count,
       count_if(c_acctbal is null)::BIGINT as failed_count,
       NULL::BIGINT as null_count, NULL::BIGINT as errors_count,
       NULL::BOOLEAN as success_flag
from b
union all
select 'RB_CUSTOMER_ACCTBAL', 'ACCTBAL_NON_NEGATIVE', count(*)::BIGINT,
       count_if(c_acctbal is not null and c_acctbal >= 0)::BIGINT,
       count_if(c_acctbal is not null and c_acctbal < 0)::BIGINT,
       count_if(c_acctbal is null)::BIGINT, NULL::BIGINT, NULL::BOOLEAN
from b
union all
select 'RB_CUSTOMER_ACCTBAL', 'ACCTBAL_BELOW_LIMIT', count(*)::BIGINT,
       count_if(c_acctbal is not null and c_acctbal <= 5000)::BIGINT,
       count_if(c_acctbal is not null and c_acctbal > 5000)::BIGINT,
       count_if(c_acctbal is null)::BIGINT, NULL::BIGINT, NULL::BOOLEAN
from b
union all
select 'RB_CUSTOMER_NAME', 'NAME_FORMAT', count(*)::BIGINT,
       count_if(c_name is not null and regexp_matches(c_name, '^Customer.[0-9]+$'))::BIGINT,
       count_if(c_name is not null and not regexp_matches(c_name, '^Customer.[0-9]+$'))::BIGINT,
       count_if(c_name is null)::BIGINT, NULL::BIGINT, NULL::BOOLEAN
from customer
"""


def q_rb_entity_uri_and_env(spark, sf_dir):
    """New config-model surfaces through the full engine, oracle-checked:
    * entity_uri late binding — the DOCS binding names `catalog://<view>`
      and the schema comes from the live view (no declared columns);
    * environment_override — the PARTS entity points at part.parquet but the
      run's environment_target=TEST remaps it to supplier.parquet, so the
      summary row proves which table was actually scanned."""
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("cdq_docs_uri_view")
    reg = ConfigRegistry()
    reg.entities["PARTS"] = Entity.from_dict("PARTS", {
        "table_name": "{sf_dir}/part.parquet",
        "columns": {"S_NAME": {"data_type": "STRING"},
                    "S_ACCTBAL": {"data_type": "FLOAT64"}},
        "environment_override": {
            "TEST": {"environment": "test",
                     "override": {"table_name": "{sf_dir}/supplier.parquet"}}},
    })
    reg.row_filters["NONE"] = RowFilter.from_dict("NONE",
                                                  {"filter_sql_expr": "True"})
    reg.rules["LANG_NOT_NULL"] = Rule.from_dict(
        "LANG_NOT_NULL", {"rule_type": "NOT_NULL"})
    reg.rules["ACCTBAL_POSITIVE"] = Rule.from_dict(
        "ACCTBAL_POSITIVE",
        {"rule_type": "CUSTOM_SQL_EXPR",
         "params": {"custom_sql_expr": "$column > 0"}})
    reg.rule_bindings["RB_DOCS_URI"] = RuleBinding.from_dict("RB_DOCS_URI", {
        "entity_uri": "catalog://cdq_docs_uri_view",
        "column_id": "LANG", "row_filter_id": "NONE",
        "rule_ids": ["LANG_NOT_NULL"]})
    reg.rule_bindings["RB_ENV_OVERRIDE"] = RuleBinding.from_dict(
        "RB_ENV_OVERRIDE", {
            "entity_id": "PARTS", "column_id": "S_ACCTBAL",
            "row_filter_id": "NONE", "rule_ids": ["ACCTBAL_POSITIVE"]})
    eng = DqEngine(spark, reg, table_name_vars={"sf_dir": sf_dir},
                   environment_target="test")
    res = eng.run(["RB_DOCS_URI", "RB_ENV_OVERRIDE"], execution_ts=TS,
                  write_summary=False)
    return res.summary.select(
        "rule_binding_id", "rule_id",
        # normalize the resolved table path to its basename so the oracle
        # can assert WHICH table the override made the engine scan
        F.element_at(F.split("table_id", "/"), -1).alias("table_id"),
        F.col("rows_validated").cast("bigint").alias("rows_validated"),
        F.col("success_count").cast("bigint").alias("success_count"),
        F.col("failed_count").cast("bigint").alias("failed_count"))


ORACLE_RB_ENTITY_URI_AND_ENV = """
select 'RB_DOCS_URI' as rule_binding_id, 'LANG_NOT_NULL' as rule_id,
       'cdq_docs_uri_view' as table_id,
       count(*)::BIGINT as rows_validated,
       count_if(lang is not null)::BIGINT as success_count,
       count_if(lang is null)::BIGINT as failed_count
from documents
union all
-- environment_target=test remapped the PARTS entity to the supplier table;
-- the oracle reads supplier directly (table_id normalized to its basename)
select 'RB_ENV_OVERRIDE', 'ACCTBAL_POSITIVE', 'supplier.parquet',
       count(*)::BIGINT,
       count_if(s_acctbal is not null and s_acctbal > 0)::BIGINT,
       count_if(s_acctbal is not null and s_acctbal <= 0)::BIGINT
from supplier
"""


def q_rb_orders_dup_statement(spark, sf_dir):
    return _run_dq(spark, sf_dir, ["RB_ORDERS_DUP"])


ORACLE_RB_ORDERS_DUP = """
with errs as (
  select a.* from orders a
  inner join (select o_custkey from orders group by o_custkey having count(*) > 1) d
  using (o_custkey))
select 'RB_ORDERS_DUP' as rule_binding_id, 'NO_DUP_CUSTKEY' as rule_id,
       (select count(*) from orders)::BIGINT as rows_validated,
       NULL::BIGINT as success_count, NULL::BIGINT as failed_count,
       NULL::BIGINT as null_count,
       (select count(*) from errs)::BIGINT as errors_count,
       ((select count(*) from errs) = 0) as success_flag
"""


def q_rb_events_window(spark, sf_dir):
    return _run_dq(spark, sf_dir, ["RB_EVENTS_WINDOW"])


ORACLE_RB_EVENTS_WINDOW = """
with w as (select * from events
           where ts >= timestamp '2024-01-01 00:00:00'
             and ts < timestamp '2024-01-08 00:00:00')
select 'RB_EVENTS_WINDOW' as rule_binding_id, 'VALUE_NOT_NULL' as rule_id,
       count(*)::BIGINT as rows_validated,
       count_if(value is not null)::BIGINT as success_count,
       count_if(value is null)::BIGINT as failed_count,
       NULL::BIGINT as null_count, NULL::BIGINT as errors_count,
       NULL::BOOLEAN as success_flag
from w
"""


def q_failed_records_acctbal(spark, sf_dir):
    """Failing rows (valid IS FALSE) for the non-negative rule, with
    reference columns — the failed-records lineage query shape."""
    from cloud_data_quality_spark.compiler.binding import compile_binding
    reg = _dq_registry()
    binding = compile_binding(reg, "RB_CUSTOMER_ACCTBAL")
    eng = DqEngine(spark, reg, table_name_vars={"sf_dir": sf_dir})
    df = eng.read_entity(binding)
    projected = eng.projected_frame(binding, binding.filter_df(df))
    fr = eng.failed_records_frame(
        binding, projected, binding.simple_rules,
        invocation_id="fixed", execution_ts=TS)
    return fr.select(
        F.col("_dq_validation_rule_id").alias("rule_id"),
        F.col("_dq_validation_column_value").cast("double").alias("column_value"),
    )


ORACLE_FAILED_RECORDS_ACCTBAL = """
with b as (select * from customer where c_mktsegment = 'BUILDING')
select 'ACCTBAL_NON_NEGATIVE' as rule_id, c_acctbal::DOUBLE as column_value
from b where c_acctbal is not null and c_acctbal < 0
union all
select 'ACCTBAL_BELOW_LIMIT', c_acctbal::DOUBLE
from b where c_acctbal is not null and c_acctbal > 5000
union all
select 'ACCTBAL_NOT_NULL', c_acctbal::DOUBLE from b where c_acctbal is null
"""


def q_failed_records_dup_statement(spark, sf_dir):
    """CUSTOM_SQL_STATEMENT failed-records parity: the engine run STORES a
    ready-to-run triage query per statement rule (the reference's
    failed_records_query.sql:36-116 rendering, with the `_dq_validation_*`
    column set); this query executes that stored SQL verbatim and returns
    its rows — the oracle replays the same statement + lineage columns in
    DuckDB. One deterministic payload field (o_orderkey, pulled from the
    JSON error echo) stands in for the whole error row."""
    eng = DqEngine(spark, _dq_registry(), table_name_vars={"sf_dir": sf_dir})
    res = eng.run(["RB_ORDERS_DUP"], execution_ts=TS,
                  invocation_id="fixed-inv", write_summary=False)
    stored = res.summary.collect()[0]["failed_records_query"]
    return spark.sql(stored).select(
        "_dq_validation_invocation_id",
        "_dq_validation_rule_binding_id",
        "_dq_validation_rule_id",
        "_dq_validation_dimension",
        F.col("_dq_validation_complex_rule_validation_errors_count")
         .cast("bigint").alias("errors_count"),
        F.col("_dq_validation_complex_rule_validation_success_flag")
         .alias("success_flag"),
        F.get_json_object("custom_sql_statement_validation_errors",
                          "$.o_orderkey").cast("bigint").alias("o_orderkey"))


ORACLE_FAILED_RECORDS_DUP_STATEMENT = """
with data as (select * from orders where (True)),
validation_errors as (
  select a.* from data a
  inner join (select o_custkey from data group by o_custkey having count(*) > 1) d
  using (o_custkey)),
errs as (select count(*) as n from validation_errors)
select 'fixed-inv' as _dq_validation_invocation_id,
       'RB_ORDERS_DUP' as _dq_validation_rule_binding_id,
       'NO_DUP_CUSTKEY' as _dq_validation_rule_id,
       'DUPLICATION' as _dq_validation_dimension,
       errs.n::BIGINT as errors_count,
       (errs.n = 0) as success_flag,
       o_orderkey::BIGINT as o_orderkey
from validation_errors cross join errs
"""


# --------------------------------------------------------------------------
# Web-text analysis queries (documents table)
# --------------------------------------------------------------------------

# html wrapper used by the extraction round-trip query — one constant, both
# engines (the pages GENERATOR uses a richer wrapper; this one exercises the
# same strip classes: head block, body script, comment, tags)
_HTML_PREFIX = ("<html><head><title>t</title><script>var x=1;</script>"
                "<style>p{margin:0}</style></head><body><!-- c --><p>")
_HTML_SUFFIX = "</p><script>track()</script></body></html>"


def q_extract_text_roundtrip(spark, sf_dir):
    """North-rule invariant: byte-identical extracted text per row. Builds
    html BYTES from documents.text (entity-escape + wrap + utf-8 encode),
    runs the real extraction operator (functions/html_extract.extract_text,
    a pure JVM Column expression), and returns the extracted text plus the
    identity flag. The oracle replays escape→wrap→extract with DuckDB's
    RE2 engine from the same generated constants — two independent regex
    engines agreeing on every byte."""
    from cloud_data_quality_spark.functions.html_extract import (
        escape_text,
        extract_text,
    )
    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    html = F.encode(F.concat(F.lit(_HTML_PREFIX), escape_text(F.col("text")),
                             F.lit(_HTML_SUFFIX)), "UTF-8")
    return (d.withColumn("extracted", extract_text(html))
            .select("doc_id", "extracted",
                    (F.col("extracted") == F.col("text"))
                    .alias("matches_roundtrip")))


def _oracle_extract_text_roundtrip() -> str:
    pre = _HTML_PREFIX.replace("'", "''")
    suf = _HTML_SUFFIX.replace("'", "''")
    h = f"'{pre}' || {OF.sql_escape_text('text')} || '{suf}'"
    return f"""
with d as (select doc_id, text, {OF.sql_extract_text(h)} as extracted
           from documents where text is not null)
select doc_id, extracted, (extracted = text) as matches_roundtrip from d
"""


def q_text_stats(spark, sf_dir):
    t = F.col("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        TX.word_count(t).alias("n_words"),
        TX.char_count(t).alias("n_chars"),
        F.round(TX.mean_word_length(t), 6).alias("mean_word_len"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(TX.alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(TX.duplicate_token_fraction(t), 6).alias("dup_token_frac"),
    )


ORACLE_TEXT_STATS = f"""
select doc_id,
       {OF.sql_word_count('text')} as n_words,
       {OF.sql_char_count('text')} as n_chars,
       round({OF.sql_mean_word_len('text')}, 6) as mean_word_len,
       round({OF.sql_stopword_ratio('text')}, 6) as stopword_ratio,
       round({OF.sql_alpha_ratio('text')}, 6) as alpha_ratio,
       round({OF.sql_dup_token_frac('text')}, 6) as dup_token_frac
from documents
"""


def q_text_langid(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", TX.langid(F.col("text")).alias("lang_pred"))


ORACLE_TEXT_LANGID = f"""
select doc_id, {OF.sql_langid('text')} as lang_pred from documents
"""


def q_text_fingerprint(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fp"))


ORACLE_TEXT_FINGERPRINT = f"""
select doc_id, {OF.sql_fingerprint('text')} as fp from documents
"""


def q_pii_scrub(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", scrub_text(F.col("text")).alias("scrubbed_text"))


ORACLE_PII_SCRUB = f"""
select doc_id, {OF.sql_scrub('text')} as scrubbed_text from documents
"""


def q_quality_verdict(spark, sf_dir):
    ann = annotate_quality(_t(spark, sf_dir, "documents"), text_col="text",
                           with_perplexity=False, with_scrub=False)
    return ann.select("doc_id", "lang_pred", "keep", "drop_reason")


def _oracle_quality_verdict() -> str:
    from cloud_data_quality_spark.operators.quality_filter import QualityThresholds
    t = QualityThresholds()
    feat = f"""
select doc_id,
  {OF.sql_langid('text')} as lang_pred,
  {OF.sql_char_count('text')} as n_chars,
  {OF.sql_word_count('text')} as n_words,
  {OF.sql_mean_word_len('text')} as mean_word_len,
  {OF.sql_alpha_ratio('text')} as alpha_ratio,
  {OF.sql_cjk_ratio('text')} as cjk_ratio,
  {OF.sql_dup_token_frac('text')} as dup_token_frac,
  {OF.sql_dup_line_frac('text')} as dup_line_frac,
  coalesce(regexp_matches(text, '\\b(badword1|badword2|slur1)\\b'), false)
    as has_toxicity
from documents"""
    gates = {
        "words": (f"case when lang_pred = 'zh' "
                  f"then n_chars between {t.min_words * 2} and {t.max_words * 8} "
                  f"else n_words between {t.min_words} and {t.max_words} end"),
        "word_len": (f"(lang_pred = 'zh' or mean_word_len between "
                     f"{t.min_mean_word_len} and {t.max_mean_word_len})"),
        "alpha": (f"case when lang_pred = 'zh' then cjk_ratio >= {t.min_cjk_ratio} "
                  f"else alpha_ratio >= {t.min_alpha_ratio} end"),
        "repetition": (f"(dup_line_frac <= {t.max_dup_line_frac} and "
                       f"dup_token_frac <= {t.max_dup_token_frac})"),
        "lang": "lang_pred != 'und'",
        "toxicity": "not has_toxicity",
    }
    coalesced = {k: f"coalesce({v}, false)" for k, v in gates.items()}
    keep = " and ".join(coalesced.values())
    reason = "case " + " ".join(
        f"when not {coalesced[k]} then '{k}'" for k in coalesced
    ) + " else NULL end"
    return (f"with f as ({feat}) "
            f"select doc_id, lang_pred, ({keep}) as keep, {reason} as drop_reason "
            f"from f")


def q_quality_rollup(spark, sf_dir):
    ann = annotate_quality(_t(spark, sf_dir, "documents"), text_col="text",
                           with_perplexity=False, with_scrub=False)
    return (ann.groupBy("lang_pred", "keep", "drop_reason")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def _oracle_quality_rollup() -> str:
    return (f"with v as ({_oracle_quality_verdict()}) "
            f"select lang_pred, keep, drop_reason, count(*)::BIGINT as n_docs "
            f"from v group by 1, 2, 3")


def q_token_count_by_source(spark, sf_dir):
    t = F.col("text")
    return (_t(spark, sf_dir, "documents")
            .groupBy("source")
            .agg(F.sum(TX.word_count(t)).alias("total_words"),
                 F.count(F.lit(1)).alias("n_docs")))


ORACLE_TOKEN_COUNT_BY_SOURCE = f"""
select source, sum({OF.sql_word_count('text')})::BIGINT as total_words,
       count(*)::BIGINT as n_docs
from documents group by source
"""


def q_unigram_logprob(spark, sf_dir):
    """Corpus-unigram negative mean log-prob per doc (KenLM-style scoring
    with the corpus itself as the model — two passes, both distributed).

    Scale posture: the token TOTAL comes from summing the freq table (one
    tiny agg over the vocab) rather than a third full tokenize+count pass,
    attached as a broadcast scalar cross-join. The freq table itself is NOT
    hint-broadcast — at web scale distinct tokens are 10^8+ and a forced
    broadcast OOMs; AQE picks broadcast when it actually fits. For bounded
    executor memory use q_unigram_logprob_topk."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id",
                       F.explode(TX.tokens(F.col("text"))).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("__total"))
    scored = (toks.join(freq, "w")
              .crossJoin(F.broadcast(total))
              .groupBy("doc_id")
              .agg(F.round(F.avg(-F.log(F.col("c") / F.col("__total"))), 4)
                   .alias("nll")))
    return scored


ORACLE_UNIGRAM_LOGPROB = f"""
with toks as (
  select doc_id, unnest({OF.sql_tokens('text')}) as w from documents),
freq as (select w, count(*) c from toks group by w),
total as (select count(*) n from toks)
select doc_id, round(avg(-ln(c::DOUBLE / (select n from total))), 4) as nll
from toks join freq using (w)
group by doc_id
"""

_UNIGRAM_TOPK = 500


def q_unigram_logprob_topk(spark, sf_dir):
    """Bounded-memory variant: model = top-K vocabulary (deterministic
    tie-break on the token) + OOV floor count of 1. The K-row model is the
    ONLY thing broadcast — executor memory stays O(K) no matter how large
    the corpus vocabulary grows; orderBy().limit(K) is a per-partition
    top-K then single small reduce, not a global sort."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id",
                       F.explode(TX.tokens(F.col("text"))).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("__total"))
    topk = freq.orderBy(F.col("c").desc(), F.col("w")).limit(_UNIGRAM_TOPK)
    scored = (toks.join(F.broadcast(topk), "w", "left")
              .crossJoin(F.broadcast(total))
              .groupBy("doc_id")
              .agg(F.round(F.avg(-F.log(F.coalesce(F.col("c"), F.lit(1))
                                        / F.col("__total"))), 4)
                   .alias("nll")))
    return scored


ORACLE_UNIGRAM_LOGPROB_TOPK = f"""
with toks as (
  select doc_id, unnest({OF.sql_tokens('text')}) as w from documents),
freq as (select w, count(*) c from toks group by w),
total as (select count(*) n from toks),
topk as (select w, c from freq order by c desc, w limit {_UNIGRAM_TOPK})
select doc_id,
       round(avg(-ln(coalesce(t.c, 1)::DOUBLE / (select n from total))), 4)
         as nll
from toks left join topk t using (w)
group by doc_id
"""


_TRI_VOCAB = 500
_TRI_ALPHA = 0.4
_TRI_PRUNE = 2


def q_trigram_logprob(spark, sf_dir):
    """Stupid-backoff word-trigram NLL per document (CCNet-faithful n-gram
    LM scoring — functions/ngram_lm.trigram_backoff_logprob): top-V vocab
    with <unk> mapping, singleton-pruned trigram/bigram tables, backoff
    penalty alpha per level. The model is trained on the corpus inside the
    same job; every count and division replays exactly in DuckDB."""
    from cloud_data_quality_spark.functions.ngram_lm import (
        trigram_backoff_logprob)
    return trigram_backoff_logprob(
        _t(spark, sf_dir, "documents"), text_col="text", id_col="doc_id",
        vocab_size=_TRI_VOCAB, alpha=_TRI_ALPHA, prune_below=_TRI_PRUNE)


ORACLE_TRIGRAM_LOGPROB = f"""
with s0 as (select doc_id, {OF.sql_tokens('text')} as words from documents),
toks as (select doc_id, g.i - 1 as pos, words[g.i] as w_raw
         from s0 cross join unnest(generate_series(1, len(words))) as g(i)),
freq as (select w_raw, count(*) c from toks group by w_raw),
vocab as (select w_raw from freq order by c desc, w_raw limit {_TRI_VOCAB}),
mapped as (select doc_id, pos,
                  case when w_raw in (select w_raw from vocab) then w_raw
                       else '<unk>' end as w
           from toks),
adj as (select doc_id, pos, w as w1,
               lead(w, 1) over (partition by doc_id order by pos) as w2,
               lead(w, 2) over (partition by doc_id order by pos) as w3
        from mapped),
tri as (select * from adj where w3 is not null),
bi as (select w1 as b1, w2 as b2, count(*) cb
       from adj where w2 is not null group by 1, 2),
uni as (select w as u, count(*) cu from mapped group by 1),
ctri as (select w1 t1, w2 t2, w3 t3, count(*) ct from tri group by 1, 2, 3),
ntot as (select count(*)::DOUBLE n from mapped),
scored as (
  select tri.doc_id,
         case when ct.ct is not null
              then ct.ct::DOUBLE / cb_ctx.cb
              when bp.cb is not null
              then {_TRI_ALPHA} * (bp.cb::DOUBLE / u2.cu)
              else {_TRI_ALPHA} * {_TRI_ALPHA}
                   * (u3.cu::DOUBLE / (select n from ntot))
         end as s
  from tri
  left join (select * from ctri where ct >= {_TRI_PRUNE}) ct
    on tri.w1 = ct.t1 and tri.w2 = ct.t2 and tri.w3 = ct.t3
  left join bi cb_ctx on tri.w1 = cb_ctx.b1 and tri.w2 = cb_ctx.b2
  left join (select * from bi where cb >= {_TRI_PRUNE}) bp
    on tri.w2 = bp.b1 and tri.w3 = bp.b2
  left join uni u2 on tri.w2 = u2.u
  left join uni u3 on tri.w3 = u3.u)
select doc_id, round(avg(-ln(s)), 4) as nll, count(*)::BIGINT as n_trigrams
from scored group by doc_id
"""


# --------------------------------------------------------------------------
# Dedup / similarity queries
# --------------------------------------------------------------------------

def q_dedup_exact_prefix(spark, sf_dir):
    """Exact-dup groups keyed on normalized 40-char prefix fingerprint (the
    documents corpus has no full-text dups; prefix collisions stand in).
    sample_ids is the capped member sample (10 smallest ids) — the full
    member list is never materialized in any aggregation buffer, so a hot
    fingerprint (viral boilerplate at web scale) cannot OOM an executor."""
    df = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text"))
    return exact_duplicates(df, text_col="text", id_col="doc_id").select(
        "fp", F.col("dup_count").cast("bigint").alias("dup_count"),
        F.array_join(F.transform("sample_ids", lambda x: x.cast("string")),
                     ",").alias("sample_ids"))


ORACLE_DEDUP_EXACT_PREFIX = """
select md5(lower(trim(substr(text, 1, 40), ' '))) as fp, count(*)::BIGINT as dup_count,
       array_to_string(list_sort(list(doc_id))[1:10], ',') as sample_ids
from documents group by 1 having count(*) > 1
"""


def q_minhash_pairs(spark, sf_dir):
    # broadcast_verify: test-scale corpora fit comfortably; at 10^9 docs the
    # caller leaves it False and the verify join shuffles
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"),
                             text_col="text", id_col="doc_id",
                             n=3, k=8, jaccard_threshold=0.5,
                             broadcast_verify=True)


ORACLE_MINHASH_PAIRS = f"""
with d as (
  select doc_id, {OF.sql_word_shingles('text', 3)} as sh from documents),
d2 as (select doc_id,
              list_transform(list_sort(list_transform(sh, s -> md5(s))),
                             h -> ('0x' || substr(h, 1, 15))::BIGINT) as hs,
              (list_sort(list_transform(sh, s -> md5(s))))[1:8] as sig
       from d where len(sh) >= 1),
buckets as (select doc_id, unnest(sig) as h from d2),
cand as (select distinct a.doc_id as id_a, b.doc_id as id_b
         from buckets a join buckets b using (h) where a.doc_id < b.doc_id),
joined as (select id_a, id_b, x.hs as sh_a, y.hs as sh_b
           from cand join d2 x on x.doc_id = id_a join d2 y on y.doc_id = id_b)
select id_a, id_b,
       round(len(list_intersect(sh_a, sh_b))::DOUBLE /
             nullif(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)), 0),
             6) as jaccard
from joined
where round(len(list_intersect(sh_a, sh_b))::DOUBLE /
            nullif(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)), 0),
            6) >= 0.5
"""


def q_minhash_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: connected components over the MinHash pair list
    (pairs chain: A~B, B~C ⇒ one {A,B,C} cluster). The oracle replays the
    identical pair derivation, then closes it with a recursive CTE."""
    from cloud_data_quality_spark.functions.dedup import duplicate_clusters
    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"),
                              text_col="text", id_col="doc_id",
                              n=3, k=8, jaccard_threshold=0.5,
                              broadcast_verify=True).select("id_a", "id_b")
    labels = duplicate_clusters(pairs)
    return (labels.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list("id")),
                                 lambda x: x.cast("string")), ",")
                  .alias("member_ids")))


_ORACLE_MINHASH_PAIRS_CTES = ORACLE_MINHASH_PAIRS.strip().removeprefix(
    "with ").rsplit("select id_a", 1)


ORACLE_MINHASH_CLUSTERS = f"""
with recursive {_ORACLE_MINHASH_PAIRS_CTES[0]},
pr as (select id_a{_ORACLE_MINHASH_PAIRS_CTES[1]}),
edges as (select id_a as a, id_b as b from pr
          union select id_b, id_a from pr),
reach as (select a as n, b as m from edges
          union
          select r.n, e.b from reach r join edges e on r.m = e.a),
labels as (select n as id, least(n, min(m)) as cluster_id
           from reach group by n)
select cluster_id, count(*)::BIGINT as n_members,
       array_to_string(list_sort(list(id)), ',') as member_ids
from labels group by cluster_id
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"),
                               text_col="text", id_col="doc_id",
                               n=3, jaccard_threshold=0.3, length_bucket=32)


ORACLE_NGRAM_JACCARD_PAIRS = f"""
with d as (
  select doc_id, {OF.sql_word_shingles('text', 3)} as sh,
         floor(length(text) / 32) as lb
  from documents),
d2 as (select * from d where len(sh) >= 1),
cand as (select a.doc_id id_a, b.doc_id id_b, a.sh sh_a, b.sh sh_b
         from d2 a join d2 b
           on a.doc_id < b.doc_id and abs(a.lb - b.lb) <= 1)
select id_a, id_b,
       round(len(list_intersect(sh_a, sh_b))::DOUBLE /
             nullif(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)), 0),
             6) as jaccard
from cand
where round(len(list_intersect(sh_a, sh_b))::DOUBLE /
            nullif(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)), 0),
            6) >= 0.3
"""


def q_embedding_pairs(spark, sf_dir):
    return embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"),
                                  vec_col="embedding", id_col="vec_id",
                                  threshold=0.4)


ORACLE_EMBEDDING_PAIRS = """
with p as (
  select a.vec_id id_a, b.vec_id id_b,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         nullif(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
              * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])),
                0) as c
  from embeddings a join embeddings b on a.vec_id < b.vec_id)
select id_a, id_b, round(c, 6) as cosine from p where round(c, 6) >= 0.4
"""


def q_ann_topk(spark, sf_dir):
    # BLAS path — element-wise identical to the JVM brute_force_topk
    # (pytest-asserted) and ~7x faster; the DuckDB oracle checks the values
    emb = _t(spark, sf_dir, "embeddings")
    probes = (emb.where(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    return brute_force_topk_np(emb, probes, k=5)


ORACLE_ANN_TOPK = """
with probes as (select vec_id probe_id, embedding pe from embeddings where vec_id < 10),
scored as (
  select probe_id, e.vec_id neighbor_id,
         list_dot_product(pe::DOUBLE[], e.embedding::DOUBLE[]) /
         nullif(sqrt(list_dot_product(pe::DOUBLE[], pe::DOUBLE[]))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])),
                0) as c
  from probes, embeddings e where e.vec_id != probe_id),
ranked as (select probe_id, neighbor_id, c,
                  row_number() over (partition by probe_id
                                     order by c desc, neighbor_id asc) as rank
           from scored)
select probe_id, neighbor_id, rank::INT as rank, round(c, 6) as cosine
from ranked where rank <= 5
"""


_SIMHASH_MAX_HAMMING = 6
# band layout derived exactly as simhash_pairs derives it (n_bands =
# max_hamming+1 → pigeonhole-complete); generated into the oracle predicate
# from the same helper so Spark and DuckDB can't drift
_SIMHASH_BAND_PRED = "\n    or ".join(
    f"((a.sh >> {off}) & {(1 << w) - 1}) = ((b.sh >> {off}) & {(1 << w) - 1})"
    for off, w in simhash_bands(_SIMHASH_MAX_HAMMING + 1))


def q_simhash_pairs(spark, sf_dir):
    """60-bit SimHash near-dup pairs (banded candidates, exact hamming
    verify; n_bands derived = max_hamming+1 so the candidate set is
    pigeonhole-complete). The oracle replays the full bit-vote in SQL:
    hex→BIGINT via '0x' cast, per-bit votes over distinct tokens, the SAME
    generated band-share predicate, bit_count(xor) hamming."""
    return simhash_pairs(_t(spark, sf_dir, "documents"),
                         text_col="text", id_col="doc_id",
                         max_hamming=_SIMHASH_MAX_HAMMING)


ORACLE_SIMHASH_PAIRS = f"""
with d as (select doc_id, list_distinct({OF.sql_tokens('text')}) as toks
           from documents where text is not null),
tok as (select doc_id, unnest(toks) as w from d),
h as (select doc_id,
             ('0x' || substr(md5(w), 1, 15))::BIGINT as hv from tok),
bits as (select doc_id, i,
                sum(case when (hv >> i) & 1 = 1 then 1 else -1 end) as vote
         from h, range(0, 60) t(i) group by 1, 2),
sh as (select doc_id,
              sum(case when vote > 0 then (1::BIGINT << i) else 0 end) as sh
       from bits group by 1)
select a.doc_id as id_a, b.doc_id as id_b,
       bit_count(xor(a.sh, b.sh))::INT as hamming
from sh a join sh b on a.doc_id < b.doc_id
where ({_SIMHASH_BAND_PRED})
  and bit_count(xor(a.sh, b.sh)) <= {_SIMHASH_MAX_HAMMING}
"""


def q_lsh_ann(spark, sf_dir):
    """LSH ANN — approximate w.r.t. BRUTE FORCE (recall asserted in pytest),
    but fully DETERMINISTIC given its hyperplanes, so it has an exact value
    oracle: the generated DuckDB SQL embeds the very same plane constants
    and replays bucketing → candidate join → cosine → rank identically."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = (emb.where(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    return lsh_bucketed_neighbors(emb, probes, k=5, n_planes=4, n_tables=8)


def _oracle_lsh_ann(k: int = 5, n_planes: int = 4, n_tables: int = 8,
                    dim: int = 64, seed: int = 7) -> str:
    """DuckDB replay of lsh_bucketed_neighbors, generated from the SAME
    hyperplane constants the Spark plan uses (similarity._hyperplanes), so
    the two sides cannot drift: repr(float64) round-trips exactly, the
    sign-bit signatures use the same left-to-right double dot product, and
    ranking uses the same (cosine desc, neighbor_id) order."""
    from cloud_data_quality_spark.functions.similarity import _hyperplanes
    sig_exprs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        bits = " || ".join(
            "(case when list_dot_product(v, ["
            + ", ".join(repr(float(x)) for x in p)
            + "]) >= 0 then '1' else '0' end)"
            for p in planes)
        sig_exprs.append(f"'t{t}:' || {bits}")
    sigs = ",\n    ".join(sig_exprs)
    return f"""
with emb as (select vec_id, embedding::DOUBLE[] as v from embeddings),
b as (select vec_id, v, unnest([
    {sigs}
  ]) as bucket from emb),
pb as (select vec_id as probe_id, v as pv, bucket from b where vec_id < 10),
cand as (select distinct probe_id, cb.vec_id as neighbor_id, pv, cb.v as cv
         from pb join b cb using (bucket) where cb.vec_id != probe_id),
scored as (select probe_id, neighbor_id,
                  list_dot_product(pv, cv) /
                  nullif(sqrt(list_dot_product(pv, pv))
                       * sqrt(list_dot_product(cv, cv)), 0) as c
           from cand),
ranked as (select probe_id, neighbor_id, c,
                  row_number() over (partition by probe_id
                                     order by c desc, neighbor_id asc) as rank
           from scored)
select probe_id, neighbor_id, rank::INT as rank, round(c, 6) as cosine
from ranked where rank <= {k}
"""


# --------------------------------------------------------------------------
# Aggregation / timeliness queries (events)
# --------------------------------------------------------------------------

_PACK_BUDGET, _PACK_BUCKETS = 256, 8


def q_pack_documents(spark, sf_dir, tokenizer: str = "words"):
    """Sequence packing (greedy token-budget packing within md5 hash
    buckets) — the training-data operator downstream of dedup + quality
    filter. Deterministic: bucket and in-bucket order are pure functions of
    the data, so the DuckDB oracle replays the greedy fold exactly with a
    recursive CTE."""
    from cloud_data_quality_spark.functions.packing import pack_documents
    return pack_documents(_t(spark, sf_dir, "documents"),
                          budget=_PACK_BUDGET, n_buckets=_PACK_BUCKETS,
                          tokenizer=tokenizer) \
        .select("doc_id", "pack_id",
                F.col("pack_seq").cast("int").alias("pack_seq"),
                F.col("pack_pos").cast("int").alias("pack_pos"),
                F.col("n_tokens").cast("bigint").alias("n_tokens"))


def q_pack_documents_bpe(spark, sf_dir):
    """Sequence packing measured in SUBWORD (BPE) tokens — what a real
    training pipeline budgets by. The merge-table artifact is embedded in
    functions/bpe_artifact.py and replayed verbatim by the DuckDB oracle
    (a chain of replace() calls over a sentinel encoding)."""
    return q_pack_documents(spark, sf_dir, tokenizer="bpe")


def _oracle_pack(tok_expr: str) -> str:
    """The recursive-CTE greedy-pack replay, parameterized over the
    token-count expression (whitespace words or BPE subwords)."""
    return f"""
with recursive d as (
  select doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
          % {_PACK_BUCKETS})::INT as bucket,
         {tok_expr} as tok
  from documents where text is not null),
ordered as (
  select doc_id, bucket, tok,
         row_number() over (partition by bucket order by doc_id) as rn
  from d),
packed as (
  select bucket, rn, doc_id, tok, tok as acc, 0 as pack_seq, 0 as pack_pos
  from ordered where rn = 1
  union all
  select o.bucket, o.rn, o.doc_id, o.tok,
         case when p.acc + o.tok > {_PACK_BUDGET} then o.tok
              else p.acc + o.tok end,
         case when p.acc + o.tok > {_PACK_BUDGET} then p.pack_seq + 1
              else p.pack_seq end,
         case when p.acc + o.tok > {_PACK_BUDGET} then 0
              else p.pack_pos + 1 end
  from packed p join ordered o on o.bucket = p.bucket and o.rn = p.rn + 1)
select doc_id, bucket::VARCHAR || '-' || pack_seq::VARCHAR as pack_id,
       pack_seq::INT as pack_seq, pack_pos::INT as pack_pos,
       tok::BIGINT as n_tokens
from packed
"""


ORACLE_PACK_DOCUMENTS = _oracle_pack(OF.sql_word_count("text"))
ORACLE_PACK_DOCUMENTS_BPE = _oracle_pack(OF.sql_bpe_token_count("text"))


def q_pack_documents_bpe_1k(spark, sf_dir):
    """Sequence packing budgeted by the PRODUCTION-SIZE tokenizer: the
    1024-merge artifact (functions/bpe_large_artifact). Spark side runs the
    Arrow memoized encoder (a 1024-deep nested replace chain would blow up
    whole-stage codegen); the oracle replays the same table as a flat
    step-joined recursive CTE (no nesting — DuckDB's expression-depth limit
    never engages)."""
    return q_pack_documents(spark, sf_dir, tokenizer="bpe_large")


def _oracle_pack_bpe_large() -> str:
    """Greedy-pack oracle with token counts from the 1024-merge table:
    distinct words are sentinel-encoded once, the merge chain applies as a
    recursive CTE joined to a 1024-row merge TABLE by step index, and
    per-doc counts come back through a join on the stripped word."""
    from cloud_data_quality_spark.functions.bpe_large_artifact import (
        BPE_MERGES_LARGE,
        N_MERGES_LARGE,
    )

    def q(s: str) -> str:
        return s.replace("'", "''")

    rows = ",\n".join(
        f"({i + 1}, chr(2)||'{q(a)}'||chr(3)||chr(2)||'{q(b)}'||chr(3), "
        f"chr(2)||'{q(a + b)}'||chr(3))"
        for i, (a, b) in enumerate(BPE_MERGES_LARGE))
    return f"""
with recursive
dw_raw as (select doc_id, unnest({OF.sql_tokens('text')}) as w
           from documents where text is not null),
dw as (select doc_id,
              replace(replace(w, chr(2), ''), chr(3), '') as w from dw_raw),
words as (select distinct w from dw),
merges(step, pat, rep) as (select * from (values
{rows}
) t(step, pat, rep)),
enc as (
  select w, 0 as step,
         array_to_string(list_transform(range(1, length(w) + 1),
           i -> chr(2) || substr(w, i, 1) || chr(3)), '') as s
  from words
  union all
  select e.w, e.step + 1, replace(e.s, m.pat, m.rep)
  from enc e join merges m on m.step = e.step + 1),
wtok as (select w, (length(s) - length(replace(s, chr(2), '')))::BIGINT as n
         from enc where step = {N_MERGES_LARGE}),
dt as (select dw.doc_id, sum(wtok.n)::BIGINT as tok
       from dw join wtok using (w) group by dw.doc_id),
d as (select documents.doc_id,
         (('0x' || substr(md5(documents.doc_id::VARCHAR), 1, 15))::BIGINT
          % {_PACK_BUCKETS})::INT as bucket,
         coalesce(dt.tok, 0) as tok
      from documents left join dt using (doc_id) where text is not null),
ordered as (
  select doc_id, bucket, tok,
         row_number() over (partition by bucket order by doc_id) as rn
  from d),
packed as (
  select bucket, rn, doc_id, tok, tok as acc, 0 as pack_seq, 0 as pack_pos
  from ordered where rn = 1
  union all
  select o.bucket, o.rn, o.doc_id, o.tok,
         case when p.acc + o.tok > {_PACK_BUDGET} then o.tok
              else p.acc + o.tok end,
         case when p.acc + o.tok > {_PACK_BUDGET} then p.pack_seq + 1
              else p.pack_seq end,
         case when p.acc + o.tok > {_PACK_BUDGET} then 0
              else p.pack_pos + 1 end
  from packed p join ordered o on o.bucket = p.bucket and o.rn = p.rn + 1)
select doc_id, bucket::VARCHAR || '-' || pack_seq::VARCHAR as pack_id,
       pack_seq::INT as pack_seq, pack_pos::INT as pack_pos,
       tok::BIGINT as n_tokens
from packed
"""


ORACLE_PACK_DOCUMENTS_BPE_1K = _oracle_pack_bpe_large()


# ------------------------------------------------------- host curation ops

_HOST_BLOCKLIST = ["src1.example.com", "ads.src2.example.com"]
_HOST_CAP = 25
#: deterministic URL synthesized from documents columns — doc_id % 7 == 0
#: rows get an `ads.` subdomain so the SUFFIX semantics of the blocklist
#: (src1.example.com must also block ads.src1.example.com) are exercised.
_HOST_URL_SQL = ("'https://' || case when doc_id % 7 = 0 then 'ads.' "
                 "else '' end || source || '.example.com/d/' || doc_id")


def q_host_capped_sample(spark, sf_dir):
    """Host blocklist (suffix semantics, broadcast anti-joins) + per-host
    document cap (bounded-key rank) over deterministic URLs synthesized
    from the documents table — the C4 §2.1 / RefinedWeb §3.1 curation step."""
    from cloud_data_quality_spark.functions.hosts import (
        cap_per_host,
        drop_blocklisted,
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_HOST_URL_SQL).alias("url"))
    kept = drop_blocklisted(docs, _HOST_BLOCKLIST, suffix_match=True)
    capped = cap_per_host(kept, _HOST_CAP, order_col="doc_id")
    return capped.select("doc_id", "host")


def _oracle_host_capped_sample() -> str:
    from cloud_data_quality_spark.functions.hosts import URL_HOST_PATTERN
    block = " or ".join(
        f"host = '{d}' or host like '%.{d}'" for d in _HOST_BLOCKLIST)
    return f"""
with u as (select doc_id, {_HOST_URL_SQL} as url from documents),
h as (select doc_id,
             lower(coalesce(regexp_extract(url, '{URL_HOST_PATTERN}', 1), ''))
               as host
      from u),
keep as (select * from h where not ({block})),
ranked as (select doc_id, host,
                  row_number() over (partition by host order by doc_id) as rn
           from keep)
select doc_id, host from ranked where rn <= {_HOST_CAP}
"""


_PIPE_MIN_WORDS = 20
_PIPE_HOST_CAP = 30


def q_curation_pipeline_docs(spark, sf_dir):
    """The COMPOSED resumable pipeline (engine/pipeline.py) end-to-end on
    the documents table: partition-stage word-count gate → global per-source
    cap → global exact dedup (canonical min doc_id per fingerprint). Every
    stage materializes + journals lineage; this query replays the full
    staged run and returns the survivor set the DuckDB oracle re-derives in
    one SQL chain — so the staging machinery itself is value-checked, not
    just the individual operators."""
    import shutil
    import uuid

    from cloud_data_quality_spark.engine.pipeline import (
        PipelineStage,
        ResumableCurationPipeline,
    )
    from cloud_data_quality_spark.functions.text import fingerprint, word_count
    from pyspark.sql.window import Window

    def gate(df):
        return df.where(word_count(F.col("text")) >= _PIPE_MIN_WORDS)

    def cap(df):
        w = Window.partitionBy("source").orderBy("doc_id")
        return (df.withColumn("__r", F.row_number().over(w))
                .where(F.col("__r") <= _PIPE_HOST_CAP).drop("__r"))

    def dedup(df):
        w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
        return (df.withColumn("__r", F.row_number().over(w))
                .where("__r = 1").drop("__r"))

    work = f"/tmp/cdq_pipeline_{uuid.uuid4().hex}"
    pipe = ResumableCurationPipeline(spark, work, n_buckets=8,
                                     id_col="doc_id")
    res = pipe.run(
        _t(spark, sf_dir, "documents"),
        [PipelineStage("gate", gate, kind="partition"),
         PipelineStage("cap", cap, kind="global"),
         PipelineStage("dedup", dedup, kind="global")],
        run_id="oracle")
    out = (spark.read.parquet(res.stages[-1].output_path)
           .select("doc_id", "source").localCheckpoint())
    shutil.rmtree(work, ignore_errors=True)
    return out


def _oracle_curation_pipeline() -> str:
    return f"""
with gate as (select doc_id, source, text from documents
              where {OF.sql_word_count('text')} >= {_PIPE_MIN_WORDS}),
cap as (select doc_id, source, text from (
          select *, row_number() over (partition by source
                                       order by doc_id) as rn from gate)
        where rn <= {_PIPE_HOST_CAP}),
dedup as (select doc_id, source from (
            select doc_id, source,
                   row_number() over (partition by {OF.sql_fingerprint('text')}
                                      order by doc_id) as rn from cap)
          where rn = 1)
select doc_id, source from dedup
"""


# deterministic multiline+punctuation synthesis over the word-soup docs so
# the C4 line heuristics have real structure to act on: '.'/'?' line breaks
# before common words, terminal '.', and doc-level '{'/'Lorem Ipsum'
# injections on id residues. chr(10) because a '\n' literal is an escape in
# Spark SQL but two characters in DuckDB.
_C4_SYNTH_SQL = (
    "replace(replace(text, ' table ', '.' || chr(10) || 'table '), "
    "' row ', '?' || chr(10) || 'row ') || '.'"
    " || case when doc_id % 13 = 0 then ' {' else '' end"
    " || case when doc_id % 17 = 0 then ' Lorem Ipsum' else '' end")
# every 7th doc uses CRLF line endings — pins the CR-normalization contract
# (Java '$' matches before a final '\r', RE2/DuckDB '$' does not)
_C4_SYNTH_SQL = (
    f"case when doc_id % 7 = 0 then "
    f"replace({_C4_SYNTH_SQL}, chr(10), chr(13) || chr(10)) "
    f"else {_C4_SYNTH_SQL} end")


def q_c4_line_filter(spark, sf_dir):
    """C4 §2.2 line-level cleaning (terminal punctuation, ≥5-word lines, no
    javascript; ≥3 surviving lines, no '{'/'lorem ipsum') as a pure Column
    plan over deterministically line-structured document text."""
    from cloud_data_quality_spark.functions.corpus import c4_line_filter
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_C4_SYNTH_SQL).alias("text"))
    return c4_line_filter(docs)


def _oracle_c4_line_filter() -> str:
    from cloud_data_quality_spark.functions.corpus import (
        C4_DOC_BLOCK_SUBSTRINGS,
        C4_LINE_BLOCK_SUBSTRING,
        C4_MIN_LINE_WORDS,
        C4_MIN_LINES_KEPT,
        C4_TERMINAL_PUNCT_RE,
    )
    line_ok = (
        f"regexp_matches(trim(x, ' '), '{C4_TERMINAL_PUNCT_RE}') "
        f"and len(list_filter(regexp_split_to_array(trim(x, ' '), "
        f"'[\\t\\x0b\\f\\r ]+'), w -> w != '')) >= {C4_MIN_LINE_WORDS} "
        f"and not contains(lower(trim(x, ' ')), '{C4_LINE_BLOCK_SUBSTRING}')")
    doc_block = " ".join(
        f"and not contains(lower(text), '{s}')"
        for s in C4_DOC_BLOCK_SUBSTRINGS)
    return f"""
with s as (select doc_id, {_C4_SYNTH_SQL} as text from documents),
l as (select doc_id, text,
             list_filter(string_split(
                 regexp_replace(text, '\\r\\n?', chr(10), 'g'), chr(10)),
                         x -> {line_ok}) as kept
      from s),
v as (select doc_id, kept,
             (len(kept) >= {C4_MIN_LINES_KEPT} {doc_block}) as keep
      from l)
select doc_id,
       case when keep then array_to_string(kept, chr(10)) end as clean_text,
       coalesce(len(kept), 0)::BIGINT as n_lines_kept,
       keep
from v
"""


#: mixed-case scheme/host, default port, tracking params, fragments — every
#: canonicalization rule exercised on deterministic synthesized URLs.
_CANON_URL_SQL = (
    "'HTTPS://' || upper(source) || '.Example.COM:443/path/' || doc_id"
    " || case when doc_id % 3 = 0 then '?utm_source=x&id=' || doc_id ||"
    " '&fbclid=z' else '?id=' || doc_id || '&page=2' end"
    # ref must drop (exact tracking name) while refund_id must SURVIVE —
    # pins the exact-vs-prefix matching contract cross-engine
    " || case when doc_id % 5 = 0 then '&ref=tw&refund_id=' || doc_id"
    " else '' end"
    " || case when doc_id % 4 = 0 then '#frag' else '' end")


def q_canonical_urls(spark, sf_dir):
    """URL canonicalization (lowercase scheme/host, strip default port,
    drop tracking params + fragment) — the identity-normalization step
    before exact URL dedup and per-host caps."""
    from cloud_data_quality_spark.functions.hosts import canonicalize_url
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_CANON_URL_SQL).alias("url"))
    return docs.select("doc_id",
                       canonicalize_url(F.col("url")).alias("canon_url"))


def _oracle_canonical_urls() -> str:
    from cloud_data_quality_spark.functions.hosts import (
        TRACKING_PARAM_PREFIXES,
        TRACKING_PARAMS_EXACT,
        URL_SPLIT_PATTERN,
    )
    exact = ", ".join(f"'{p}'" for p in TRACKING_PARAMS_EXACT)
    tracking = " or ".join(
        [f"lower(string_split(kv, '=')[1]) in ({exact})"]
        + [f"starts_with(lower(string_split(kv, '=')[1]), '{p}')"
           for p in TRACKING_PARAM_PREFIXES])
    return f"""
with u as (select doc_id, {_CANON_URL_SQL} as url from documents),
p as (select doc_id, url,
             lower(coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 1), ''))
               as scheme,
             lower(coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 2), ''))
               as rawhost,
             coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 3), '') as path,
             coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 4), '') as query
      from u),
h as (select *, case when scheme = 'http'
                     then regexp_replace(rawhost, ':80$', '')
                     when scheme = 'https'
                     then regexp_replace(rawhost, ':443$', '')
                     else rawhost end as host
      from p),
q as (select doc_id, url, scheme, host,
             case when length(path) = 0 then '/' else path end as path,
             array_to_string(
               list_filter(string_split(query, '&'),
                           kv -> length(kv) > 0 and not ({tracking})),
               '&') as qs
      from h)
select doc_id,
       case when length(scheme) > 0
            then scheme || '://' || host || path ||
                 case when length(qs) > 0 then '?' || qs else '' end
            else url end as canon_url
from q
"""


def _img_blob_hex_sql(hexfn: str) -> str:
    """Hex string of a synthesized image blob per doc_id — evaluated by
    BOTH engines (`hexfn` = 'hex' on Spark, 'to_hex' on DuckDB; unhex is
    case-insensitive so their case difference is immaterial). The layouts
    are byte-identical to multimodal.make_png/make_gif/make_jpeg, so the
    parser runs against real header bytes: PNG sig+IHDR (u32-BE dims at
    16/20, color type 6=RGBA), GIF89a logical screen (u16-LE dims at 6/8),
    JPEG SOI + JFIF APP0 (skipped by its declared length) + SOF0 (u16-BE
    height/width, 3 components). Every 11th doc is garbage bytes — the
    strict-mode INVALID row, not an exception."""
    w = "((doc_id % 613) + 16)"
    h = "(((doc_id * 7) % 509) + 16)"
    wbe = f"lpad({hexfn}({w}), 4, '0')"
    hbe = f"lpad({hexfn}({h}), 4, '0')"
    wbe32 = f"lpad({hexfn}({w}), 8, '0')"
    hbe32 = f"lpad({hexfn}({h}), 8, '0')"
    wle = f"(substr({wbe}, 3, 2) || substr({wbe}, 1, 2))"
    hle = f"(substr({hbe}, 3, 2) || substr({hbe}, 1, 2))"
    png = (f"('89504e470d0a1a0a' || '0000000d' || '49484452' || {wbe32} "
           f"|| {hbe32} || '0806000000' || '00000000')")
    gif = f"('474946383961' || {wle} || {hle} || 'f70000')"
    jpeg = (f"('ffd8' || 'ffe000104a46494600010100000100010000' || "
            f"'ffc00011' || '08' || {hbe} || {wbe} || "
            f"'03012200021101031101' || 'ffd9')")
    return (f"case when doc_id % 11 = 0 then 'deadbeef' "
            f"when doc_id % 3 = 0 then {png} "
            f"when doc_id % 3 = 1 then {gif} "
            f"else {jpeg} end")


def q_image_metadata(spark, sf_dir):
    """Real image-header decode (multimodal.parse_image_header): blobs are
    synthesized JVM-side via unhex() from the shared hex fragment, then
    width/height/channels/format are parsed from the actual bytes in the
    strict-mode mapInPandas stage (no deterministic fake, no codec
    library). The oracle knows the dims it encoded, so any parser drift —
    endianness, offset, marker walk — value-mismatches."""
    from cloud_data_quality_spark.functions.multimodal import image_metadata
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"unhex({_img_blob_hex_sql('hex')})").alias("blob"))
    out = image_metadata(docs, blob_col="blob", deterministic_fake=False)
    # this DuckDB build hashes VARCHAR only, so byte-equality of the blob
    # is pinned via sha256 over its lowercase hex (the Python-side
    # content_sha256 over raw bytes is pytest-pinned instead)
    return out.select(
        "doc_id", F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        "format",
        F.sha2(F.lower(F.hex(F.col("blob"))), 256).alias("blob_hex_sha256"))


def _oracle_image_metadata() -> str:
    """Dims/channels/format come straight from the synthesis arithmetic
    (the encoder's inputs); blob_hex_sha256 hashes the identical lowercase
    hex both sides — proving the two engines built (and the parser read)
    the same bytes. (sha256 over raw BLOB isn't available in this DuckDB
    build, hence hex-string hashing.)"""
    blob = _img_blob_hex_sql("to_hex")
    return f"""
select doc_id,
       (case when doc_id % 11 = 0 then null
             else (doc_id % 613) + 16 end)::INT as width,
       (case when doc_id % 11 = 0 then null
             else ((doc_id * 7) % 509) + 16 end)::INT as height,
       (case when doc_id % 11 = 0 then null
             when doc_id % 3 = 0 then 4 else 3 end)::INT as channels,
       case when doc_id % 11 = 0 then 'INVALID'
            when doc_id % 3 = 0 then 'PNG'
            when doc_id % 3 = 1 then 'GIF'
            else 'JPEG' end as format,
       sha256(lower({blob})) as blob_hex_sha256
from documents
"""


#: blank-line paragraph structure synthesized deterministically: paragraph
#: breaks before common words, and doc_id % 5 == 0 docs get the SAME
#: 40-char paragraph twice (an exact duplicate pair for the dup fractions).
_PARA_SYNTH_SQL = (
    "replace(text, ' value ', chr(10) || chr(10) || 'value ')"
    " || case when doc_id % 5 = 0 then"
    " chr(10) || chr(10) || substr(text, 1, 40)"
    " || chr(10) || chr(10) || substr(text, 1, 40) else '' end")


def q_paragraph_stats(spark, sf_dir):
    """Gopher paragraph-duplication fractions (pure Column, O(P²) in-doc
    occurrence counting, zero shuffle) over deterministically
    paragraph-structured document text."""
    from cloud_data_quality_spark.functions.corpus import paragraph_stats
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PARA_SYNTH_SQL).alias("text"))
    return paragraph_stats(docs)


def _oracle_paragraph_stats() -> str:
    from cloud_data_quality_spark.functions.corpus import _PARA_CONTENT_RE
    occ = "len(list_filter(paras, x -> x = p))"
    return f"""
with s as (select doc_id, {_PARA_SYNTH_SQL} as text from documents),
p as (select doc_id, text,
             list_filter(regexp_split_to_array(text, '\\n{{2,}}'),
                         p -> regexp_matches(p, '{_PARA_CONTENT_RE}'))
               as paras
      from s),
m as (select doc_id,
             len(paras) as n,
             length(text) as chars,
             len(list_distinct(paras)) as nd,
             list_sum(list_transform(list_distinct(paras),
                 p -> ({occ} - 1) * length(p))) as dup_chars,
             list_max(list_transform(list_distinct(paras),
                 p -> {occ} * length(p))) as top
      from p)
select doc_id,
       coalesce(n, 0)::BIGINT as n_paras,
       round(case when n > 0 then 1.0 - nd / n::DOUBLE end, 6)
         as dup_para_frac,
       round(case when n > 0 then dup_chars::DOUBLE / nullif(chars, 0) end, 6)
         as dup_para_char_frac,
       round(case when n > 0 then top::DOUBLE / nullif(chars, 0) end, 6)
         as top_para_char_frac
from m
"""


_CONT_N, _CONT_THR, _CONT_MAX_DF = 3, 0.9, 50
_CONT_QUOTE_WORDS = 8


def q_containment_pairs(spark, sf_dir):
    """Directed near-containment (Broder containment coefficient) via a
    DF-capped shingle inverted index. The corpus is documents plus a
    synthesized 8-word 'quote' of each doc (negative-id namespace) — every quote is
    fully contained in its source, so the detector must find the directed
    (quote → source) pairs Jaccard would miss."""
    from cloud_data_quality_spark.functions.dedup import containment_pairs
    docs = _t(spark, sf_dir, "documents")
    # quote ids live in the NEGATIVE namespace — collision-proof against
    # real doc_ids at any scale factor (an additive offset would collide
    # once the table exceeds the offset)
    quotes = docs.select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.array_join(F.slice(TX.tokens(F.col("text")), 1,
                             _CONT_QUOTE_WORDS), " ").alias("text"))
    corpus = docs.select("doc_id", "text").unionAll(quotes)
    return containment_pairs(corpus, n=_CONT_N,
                             containment_threshold=_CONT_THR,
                             max_shingle_df=_CONT_MAX_DF)


def _oracle_containment_pairs() -> str:
    toks = OF.sql_tokens("text")
    sh = OF.sql_word_shingles("text", _CONT_N)
    return f"""
with corpus as (
  select doc_id, text from documents
  union all
  select -doc_id - 1 as doc_id,
         array_to_string(({toks})[1:{_CONT_QUOTE_WORDS}], ' ') as text
  from documents),
s as (select doc_id as id, {sh} as sh from corpus where text is not null),
e as (select id, unnest(sh) as s from s),
rare as (select s from e group by s having count(*) <= {_CONT_MAX_DF}),
f as (select e.id, e.s from e join rare using (s)),
sizes as (select id, len(sh) as n_sh from s where len(sh) > 0),
common as (select a.id as inner_id, b.id as outer_id,
                  count(*) as n_common
           from f a join f b using (s)
           where a.id != b.id group by 1, 2)
select inner_id, outer_id, n_common::BIGINT as n_common,
       round(n_common / sz.n_sh::DOUBLE, 6) as containment
from common join sizes sz on sz.id = common.inner_id
where round(n_common / sz.n_sh::DOUBLE, 6) >= {_CONT_THR}
"""


_TOP_FRACTION = 0.2


def q_top_quality_docs(spark, sf_dir):
    """Final corpus selection: keep the top 20% of documents by word count
    with a deterministic md5 tie-break (exact mode → TakeOrderedAndProject,
    never a full global sort — plan-pinned in test_corpus)."""
    from cloud_data_quality_spark.functions.corpus import (
        top_fraction_by_score)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", TX.word_count(F.col("text")).alias("score"))
    return top_fraction_by_score(docs, _TOP_FRACTION, "score",
                                 exact=True)


ORACLE_TOP_QUALITY = f"""
select doc_id, {OF.sql_word_count('text')} as score
from documents
order by score desc, md5(doc_id::VARCHAR) asc
limit (select floor(count(*) * {_TOP_FRACTION})::BIGINT from documents)
"""


def q_bpe_tokens(spark, sf_dir):
    """Per-document SUBWORD tokens as a pure JVM Column plan (the
    training-ready tokenized output; zero Python in the plan — plan test
    in test_packing). DuckDB replays the identical merge chain."""
    from cloud_data_quality_spark.functions.bpe_artifact import (
        bpe_tokens_column)
    toks = bpe_tokens_column("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("tokens"),
        F.coalesce(F.size(toks), F.lit(0)).cast("bigint").alias("n_tokens"))


ORACLE_BPE_TOKENS = f"""
select doc_id, {{toks}} as tokens,
       coalesce(len({{toks}}), 0)::BIGINT as n_tokens
from documents
"""


def _oracle_bpe_tokens() -> str:
    toks = OF.sql_bpe_tokens("text")
    return ORACLE_BPE_TOKENS.format(toks=toks)


def q_events_volume_per_day(spark, sf_dir):
    return (_t(spark, sf_dir, "events")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value")))


ORACLE_EVENTS_VOLUME_PER_DAY = """
select ts::DATE as day, count(*)::BIGINT as n_events,
       round(sum(value), 4) as total_value
from events group by 1
"""


def q_accuracy_distribution_events(spark, sf_dir):
    """A8-style distribution check: per-type share of total (countif ratio).
    Total attached as a broadcast scalar cross-join (same pattern as
    q_accuracy_distribution_true) — no driver-side count() round trip."""
    ev = _t(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(total))
            .select("event_type", "n",
                    F.round(F.col("n") / F.col("__total"), 6).alias("share")))


ORACLE_ACCURACY_DISTRIBUTION_EVENTS = """
select event_type, count(*)::BIGINT as n,
       round(count(*)::DOUBLE / (select count(*) from events), 6) as share
from events group by event_type
"""


def q_integrity_lineitem_part(spark, sf_dir):
    """J4 referential integrity: semi/anti counts of lineitem vs part."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey")
    matched = li.join(F.broadcast(part), li.l_partkey == part.p_partkey,
                      "left_semi").count()
    orphans = li.join(F.broadcast(part), li.l_partkey == part.p_partkey,
                      "left_anti").count()
    return spark.createDataFrame(
        [(int(matched), int(orphans))], "n_matched bigint, n_orphans bigint")


ORACLE_INTEGRITY_LINEITEM_PART = """
select
  (select count(*) from lineitem where l_partkey in
     (select p_partkey from part))::BIGINT as n_matched,
  (select count(*) from lineitem where l_partkey not in
     (select p_partkey from part))::BIGINT as n_orphans
"""


# --------------------------------------------------------------------------
# UNNEST rules, verbatim from the reference rule library (dialect-shim path)
# --------------------------------------------------------------------------

# Copied byte-for-byte from the reference YAMLs; tests/test_dialect.py parses
# those files and asserts equality, so "runs unchanged" is pinned:
#   docs/examples/advanced_rules/integrity_subquery.yaml:99
REF_UNNEST_INTEGRITY_EXPR = (
    "exists (select 1 from unnest($column) t inner join "
    "`$ref_data_dataset.$ref_data_table_id` r on t.iq = r.id and "
    "t.type = r.type and t.qyty = r.data)")
#   docs/examples/advanced_rules/correctness_complex_rule.yaml:64-69
REF_UNNEST_SUM_EXPR = (
    "(select\n"
    "    sum(SaleLine.dItemTotalNetAmount) + sum(SaleLine.dVatAmount)\n"
    "  from\n"
    "    unnest(SaleLineList.SaleLine) as SaleLine\n"
    ") between $column - $error_margin and $column + $error_margin")


def _unnest_registry() -> ConfigRegistry:
    reg = ConfigRegistry()
    reg.entities["SALES_ORDERS"] = Entity.from_dict("SALES_ORDERS", {
        "table_name": "cdq_sales_unnest", "source_format": "table",
        "columns": {"O_ORDERKEY": {"data_type": "INT64"},
                    "SALE_LINE_LIST": {"data_type": "RECORD"}}})
    reg.entities["INVOICES"] = Entity.from_dict("INVOICES", {
        "table_name": "cdq_invoices_unnest", "source_format": "table",
        "columns": {"O_ORDERKEY": {"data_type": "INT64"},
                    "SALELINELIST": {"data_type": "RECORD"},
                    "INVOICE_GROSS_TOTAL_AMOUNT": {"data_type": "FLOAT64"}}})
    reg.row_filters["NONE"] = RowFilter.from_dict("NONE",
                                                  {"filter_sql_expr": "True"})
    reg.rules["NO_REFERENTIAL_INTEGRITY_VIOLATION_SUBQUERY2"] = Rule.from_dict(
        "NO_REFERENTIAL_INTEGRITY_VIOLATION_SUBQUERY2",
        {"rule_type": "CUSTOM_SQL_EXPR", "dimension": "integrity",
         "params": {
             "custom_sql_arguments": ["ref_data_dataset", "ref_data_table_id"],
             "custom_sql_expr": REF_UNNEST_INTEGRITY_EXPR}})
    reg.rules["NO_COMPLEX_RULES_MISMATCH"] = Rule.from_dict(
        "NO_COMPLEX_RULES_MISMATCH",
        {"rule_type": "CUSTOM_SQL_EXPR", "dimension": "correctness",
         "params": {"custom_sql_arguments": ["error_margin"],
                    "custom_sql_expr": REF_UNNEST_SUM_EXPR}})
    reg.rule_bindings["RB_UNNEST_INTEGRITY"] = RuleBinding.from_dict(
        "RB_UNNEST_INTEGRITY", {
            "entity_id": "SALES_ORDERS", "column_id": "SALE_LINE_LIST",
            "row_filter_id": "NONE",
            "rule_ids": [{"NO_REFERENTIAL_INTEGRITY_VIOLATION_SUBQUERY2": {
                "ref_data_dataset": "global_temp",
                "ref_data_table_id": "cdq_ref_items"}}]})
    reg.rule_bindings["RB_INVOICE_UNNEST_SUM"] = RuleBinding.from_dict(
        "RB_INVOICE_UNNEST_SUM", {
            "entity_id": "INVOICES", "column_id": "INVOICE_GROSS_TOTAL_AMOUNT",
            "row_filter_id": "NONE",
            "rule_ids": [{"NO_COMPLEX_RULES_MISMATCH": {
                "error_margin": "0.03"}}]})
    return reg


def _register_unnest_views(spark: SparkSession, sf_dir: str) -> None:
    """Synthesize the array-of-struct entities the reference rules expect
    from the flat TPC-H lineitem table (deterministic: per-order arrays
    sorted by linenumber-first struct order)."""
    li = _t(spark, sf_dir, "lineitem")
    sale_struct = F.struct(
        F.col("l_linenumber").alias("ln"), F.col("l_partkey").alias("iq"),
        F.col("l_returnflag").alias("type"), F.col("l_quantity").alias("qyty"))
    (li.groupBy("l_orderkey")
     .agg(F.array_sort(F.collect_list(sale_struct)).alias("raw"))
     .select(F.col("l_orderkey").alias("o_orderkey"),
             F.transform("raw", lambda x: F.struct(
                 x["iq"].alias("iq"), x["type"].alias("type"),
                 x["qyty"].alias("qyty"))).alias("sale_line_list"))
     .createOrReplaceTempView("cdq_sales_unnest"))
    (li.where(F.col("l_quantity") <= 25)
     .select(F.col("l_partkey").alias("id"),
             F.col("l_returnflag").alias("type"),
             F.col("l_quantity").alias("data")).distinct()
     .createOrReplaceGlobalTempView("cdq_ref_items"))
    inv_struct = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_extendedprice").alias("dItemTotalNetAmount"),
        F.col("l_tax").alias("dVatAmount"))
    (li.groupBy("l_orderkey")
     .agg(F.array_sort(F.collect_list(inv_struct)).alias("raw"),
          F.sum("l_extendedprice").alias("s"), F.sum("l_tax").alias("v"))
     .select(F.col("l_orderkey").alias("o_orderkey"),
             F.struct(F.transform("raw", lambda x: F.struct(
                 x["dItemTotalNetAmount"].alias("dItemTotalNetAmount"),
                 x["dVatAmount"].alias("dVatAmount"))).alias("SaleLine"))
              .alias("salelinelist"),
             # 1/3 of invoices get +1.0 → fail the ±0.03 margin check
             (F.round(F.col("s") + F.col("v"), 2)
              + F.when(F.col("l_orderkey") % 3 == 0, F.lit(1.0))
                 .otherwise(F.lit(0.0)))
             .alias("invoice_gross_total_amount"))
     .createOrReplaceTempView("cdq_invoices_unnest"))


def q_integrity_unnest_join(spark, sf_dir):
    """The reference's UNNEST rule SQL, byte-identical, through the dialect
    shim: correlated `exists(select 1 from unnest($column) t join ref)` and
    the correlated scalar `(select sum(...) from unnest(...))` aggregate.
    The oracle derives the same verdicts from the FLAT lineitem table
    (independent derivation — no nested arrays needed in DuckDB)."""
    _register_unnest_views(spark, sf_dir)
    return _run_dq(spark, sf_dir,
                   ["RB_UNNEST_INTEGRITY", "RB_INVOICE_UNNEST_SUM"],
                   registry=_unnest_registry())


ORACLE_INTEGRITY_UNNEST_JOIN = """
with ok1 as (
  -- a line's (partkey, returnflag, quantity) triple appears in the qty<=25
  -- reference subset iff the line's own quantity is <=25 (the triple embeds
  -- the quantity), so the exists-join collapses to this per-line test
  select l_orderkey, max(case when l_quantity <= 25 then 1 else 0 end) ok
  from lineitem group by l_orderkey),
inv as (select l_orderkey, sum(l_extendedprice) s, sum(l_tax) v
        from lineitem group by l_orderkey),
ok2 as (select l_orderkey,
               case when (s + v) between total - 0.03 and total + 0.03
                    then 1 else 0 end ok
        from (select *, round(s + v, 2)
                        + case when l_orderkey % 3 = 0 then 1.0 else 0.0 end
                          as total
              from inv))
select 'RB_UNNEST_INTEGRITY' as rule_binding_id,
       'NO_REFERENTIAL_INTEGRITY_VIOLATION_SUBQUERY2' as rule_id,
       count(*)::BIGINT as rows_validated, sum(ok)::BIGINT as success_count,
       (count(*) - sum(ok))::BIGINT as failed_count, 0::BIGINT as null_count,
       NULL::BIGINT as errors_count, NULL::BOOLEAN as success_flag
from ok1
union all
select 'RB_INVOICE_UNNEST_SUM', 'NO_COMPLEX_RULES_MISMATCH',
       count(*)::BIGINT, sum(ok)::BIGINT, (count(*) - sum(ok))::BIGINT,
       0::BIGINT, NULL::BIGINT, NULL::BOOLEAN
from ok2
"""


def q_timeliness_recent_events(spark, sf_dir):
    """A9-style delayed-ingestion check anchored at max(ts) (deterministic
    stand-in for current_timestamp). The anchor stays inside the plan as a
    broadcast scalar — collecting it to a Python datetime and re-injecting
    via F.lit would convert NTZ through the session timezone."""
    ev = _t(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("m"))
    recent = (ev.crossJoin(F.broadcast(anchor))
              .where(F.col("ts") >= F.col("m") - F.expr("INTERVAL 24 HOURS")))
    return recent.agg(
        F.count(F.lit(1)).alias("n_recent"),
        F.lit(True).alias("ingestion_ok"))


ORACLE_TIMELINESS_RECENT_EVENTS = """
with anchor as (select max(ts) m from events)
select count(*)::BIGINT as n_recent, true as ingestion_ok
from events where ts >= (select m - interval 24 hours from anchor)
"""


def q_accuracy_distribution_true(spark, sf_dir):
    """A8's exact shape (accuracy_distribution_based.yaml): per-bucket counts
    vs the distribution's mean/stddev → deviation flag. The reference writes
    it with global windows; here bucket counts groupBy-aggregate and the
    scalar stats attach via a broadcast cross join — no single-partition
    window (SURVEY.md §2.7 trap)."""
    ev = _t(spark, sf_dir, "events")
    buckets = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    stats = buckets.agg(F.avg("n").alias("mean_n"),
                        F.stddev_pop("n").alias("stddev_n"))
    joined = buckets.crossJoin(F.broadcast(stats))
    return joined.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("mean_n", 6).alias("mean_n"),
        F.round("stddev_n", 6).alias("stddev_n"),
        (F.abs(F.col("n") - F.col("mean_n"))
         > 2 * F.col("stddev_n")).alias("deviates"),
    )


ORACLE_ACCURACY_DISTRIBUTION_TRUE = """
with buckets as (select event_type, count(*)::BIGINT n from events group by 1),
stats as (select avg(n) mean_n, stddev_pop(n) stddev_n from buckets)
select event_type, n, round(mean_n, 6) as mean_n, round(stddev_n, 6) as stddev_n,
       (abs(n - mean_n) > 2 * stddev_n) as deviates
from buckets, stats
"""


def q_json_field_threshold(spark, sf_dir):
    """Scalar-function surface: extract a numeric field from the JSON props
    column (portable via regexp_extract) and aggregate a COUNTIF-style
    threshold check per event type."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'\{"k": ([0-9]+)\}', 1).cast("bigint")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count_if(F.col("k") >= 50).alias("n_high"),
                 F.count(F.lit(1)).alias("n")))


ORACLE_JSON_FIELD_THRESHOLD = """
select event_type,
       count_if(CAST(regexp_extract(props, '\\{"k": ([0-9]+)\\}', 1) AS BIGINT)
                >= 50)::BIGINT as n_high,
       count(*)::BIGINT as n
from events group by event_type
"""


def q_array_aggregate_rule(spark, sf_dir):
    """A11's per-row aggregate-over-array shape
    (correctness_complex_rule.yaml: sum over UNNESTed array BETWEEN bounds)
    as a higher-order function — no explode, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    tok_char_sum = F.aggregate(toks, F.lit(0).cast("bigint"),
                               lambda acc, t: acc + F.length(t))
    valid = tok_char_sum.between(F.col("n_chars") * 0.5, F.col("n_chars"))
    return docs.select("doc_id",
                       tok_char_sum.alias("tok_char_sum"),
                       valid.alias("row_is_valid"))


ORACLE_ARRAY_AGGREGATE_RULE = f"""
select doc_id,
       list_sum(list_transform({OF.sql_tokens('text')}, t -> length(t)))::BIGINT
         as tok_char_sum,
       list_sum(list_transform({OF.sql_tokens('text')}, t -> length(t)))
         between n_chars * 0.5 and n_chars as row_is_valid
from documents
"""


def q_sessionize_events(spark, sf_dir):
    """Sessionization: per-user sessions split on >30-minute gaps (lag +
    cumulative-sum-of-gap-flags window pattern). Windows partition by
    user_id — bounded keys, no global window. Output: per-user session
    count + max session length."""
    from pyspark.sql.window import Window
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-subtraction yields an interval: TZ-independent (an epoch cast
    # would depend on the session timezone, which the driver's session may
    # not pin to UTC)
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    sess = (ev
            .withColumn("new_sess",
                        F.when(gap.isNull()
                               | (gap > F.expr("INTERVAL 30 MINUTES")),
                               1).otherwise(0))
            .withColumn("sess_id", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"))
    return (per_sess.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.max("n_events").cast("bigint").alias("max_session_events")))


ORACLE_SESSIONIZE_EVENTS = """
with ordered as (
  select user_id, event_id, ts,
         case when ts - lag(ts) over
                (partition by user_id order by ts, event_id)
                > interval 30 minutes
              or lag(ts) over (partition by user_id order by ts, event_id)
                is null
              then 1 else 0 end as new_sess
  from events),
sess as (
  select user_id,
         sum(new_sess) over (partition by user_id order by ts, event_id
                             rows between unbounded preceding and current row)
           as sess_id
  from ordered),
per_sess as (select user_id, sess_id, count(*)::BIGINT n_events
             from sess group by 1, 2)
select user_id, count(*)::BIGINT as n_sessions,
       max(n_events)::BIGINT as max_session_events
from per_sess group by user_id
"""


def q_rollup_quality(spark, sf_dir):
    """ROLLUP aggregation over the verdict dimensions (subtotals + grand
    total) — multi-level summary reporting in one pass."""
    ann = annotate_quality(_t(spark, sf_dir, "documents"), text_col="text",
                           with_perplexity=False, with_scrub=False)
    return (ann.rollup("lang_pred", "keep")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select("lang_pred", "keep", "n_docs"))


def _oracle_rollup_quality() -> str:
    return (f"with v as ({_oracle_quality_verdict()}) "
            f"select lang_pred, keep, count(*)::BIGINT as n_docs "
            f"from v group by rollup(lang_pred, keep)")


def q_topk_docs_per_lang(spark, sf_dir):
    """Top-3 docs per language by size — rank window partitioned by a
    bounded key (deterministic tie-break on doc_id)."""
    from pyspark.sql.window import Window
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(),
                                           F.col("doc_id").asc())
    return (docs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("lang", "doc_id", "n_chars", F.col("rank").cast("int")))


ORACLE_TOPK_DOCS_PER_LANG = """
select lang, doc_id, n_chars,
       row_number() over (partition by lang
                          order by n_chars desc, doc_id asc)::INT as rank
from documents
qualify rank <= 3
"""


def q_span_dedup_docs(spark, sf_dir):
    """C4-style cross-document span dedup (functions/corpus.span_dedup):
    3-word chunks, each distinct span survives only at its corpus-wide
    smallest (doc_id, pos); documents reassembled from surviving spans.
    The oracle replays the identical canonical-occurrence rule with a
    window (oracle-side only — the Spark plan is a groupBy struct-min)."""
    from cloud_data_quality_spark.functions.corpus import span_dedup
    return span_dedup(_t(spark, sf_dir, "documents"),
                      text_col="text", id_col="doc_id", chunk_words=3)


ORACLE_SPAN_DEDUP_DOCS = f"""
with s0 as (select doc_id, {OF.sql_tokens('text')} as words from documents),
spans as (
  select doc_id, g.i - 1 as pos,
         array_to_string(words[(g.i-1)*3+1:(g.i-1)*3+3], ' ') as span
  from s0 cross join unnest(generate_series(1, ((len(words)+2)//3)::INT)) as g(i)),
nz as (select doc_id, pos, span, md5(lower(trim(span, ' '))) as fp
       from spans where length(trim(span, ' ')) > 0),
flagged as (select *,
                   (row_number() over (partition by fp
                                       order by doc_id, pos)) = 1 as kept
            from nz)
select doc_id,
       coalesce(string_agg(span, ' ' order by pos) filter (where kept), '')
         as text_deduped,
       count(*)::BIGINT as n_spans,
       (count(*) filter (where kept))::BIGINT as n_spans_kept
from flagged group by doc_id
"""


def q_substring_dedup_docs(spark, sf_dir):
    """Exact duplicated-substring removal at arbitrary offsets
    (functions/corpus.substring_dedup — the word-granular ExactSubstr of
    Lee et al. 2022): every overlapping 5-word shingle keeps only its
    corpus-wide canonical occurrence; non-canonical windows are cut and
    documents reassembled from the surviving words."""
    from cloud_data_quality_spark.functions.corpus import substring_dedup
    return substring_dedup(_t(spark, sf_dir, "documents"),
                           text_col="text", id_col="doc_id", k=5)


_SUBSTR_K = 5

ORACLE_SUBSTRING_DEDUP_DOCS = f"""
with s0 as (select doc_id, {OF.sql_tokens('text')} as words from documents),
base as (select doc_id, words from s0 where len(words) > 0),
sh as (select doc_id, g.i - 1 as pos,
              md5(lower(trim(array_to_string(
                words[g.i:g.i+{_SUBSTR_K - 1}], ' '), ' '))) as fp
       from base cross join
         unnest(generate_series(1, greatest(len(words) - {_SUBSTR_K} + 1, 0)))
           as g(i)),
dups as (select doc_id, pos from (
          select doc_id, pos,
                 row_number() over (partition by fp order by doc_id, pos) as rn
          from sh) t where rn > 1),
covered as (select distinct doc_id, pos + g.i as wpos
            from dups cross join
              unnest(generate_series(0, {_SUBSTR_K - 1})) as g(i)),
w as (select doc_id, g.i - 1 as wpos, words[g.i] as word
      from base cross join unnest(generate_series(1, len(words))) as g(i))
select w.doc_id,
       coalesce(string_agg(w.word, ' ' order by w.wpos)
                filter (where c.wpos is null), '') as text_deduped,
       count(*)::BIGINT as n_words,
       (count(*) filter (where c.wpos is null))::BIGINT as n_words_kept
from w left join covered c on c.doc_id = w.doc_id and c.wpos = w.wpos
group by w.doc_id
"""


def q_decontaminate_docs(spark, sf_dir):
    """Benchmark decontamination (functions/corpus.contamination): the
    'benchmark' is the deterministic doc_id%50==0 slice standing in for an
    eval set; every remaining doc reports its 4-word-shingle overlap."""
    from cloud_data_quality_spark.functions.corpus import contamination
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    return contamination(corpus, bench, text_col="text", id_col="doc_id",
                         shingle_words=4)


ORACLE_DECONTAMINATE_DOCS = f"""
with d as (select doc_id, {OF.sql_word_shingles('text', 4)} as sh
           from documents),
bench as (select distinct md5(lower(trim(u.s, ' '))) as h
          from d cross join unnest(sh) as u(s) where doc_id % 50 = 0),
corpus_sh as (select doc_id, md5(lower(trim(u.s, ' '))) as h
              from d cross join unnest(sh) as u(s) where doc_id % 50 != 0),
hits as (select doc_id, count(*)::BIGINT as n_contaminated
         from corpus_sh where h in (select h from bench) group by doc_id)
select d.doc_id, len(sh)::BIGINT as n_shingles,
       coalesce(n_contaminated, 0)::BIGINT as n_contaminated,
       round(coalesce(n_contaminated, 0)::DOUBLE / nullif(len(sh), 0), 6)
         as contaminated_frac,
       coalesce(n_contaminated, 0) > 0 as is_contaminated
from d left join hits using (doc_id)
where d.doc_id % 50 != 0
"""


def _oracle_stratified_sample() -> str:
    """Generated from the SAME fraction dict + sample_threshold constants as
    the Spark query — thresholds are exact integers, so the two engines make
    bit-identical keep decisions (md5-prefix trick)."""
    from cloud_data_quality_spark.functions.corpus import sample_threshold
    cases = " ".join(
        f"when '{k}' then {sample_threshold(v)}"
        for k, v in sorted(STRATIFIED_FRACTIONS.items()))
    return f"""
select doc_id, lang from documents
where ('0x' || substr(md5(doc_id::VARCHAR || '|r3'), 1, 15))::BIGINT <
      case lang {cases} else {sample_threshold(0.0)} end
"""


STRATIFIED_FRACTIONS = {"en": 0.5, "de": 0.2}


def q_stratified_sample_docs(spark, sf_dir):
    """Deterministic hash-threshold stratified sampling
    (functions/corpus.stratified_sample): keep 50% of en, 20% of de, 0%
    elsewhere — decisions replayable bit-identically by the oracle, unlike
    rand()-based df.sample()."""
    from cloud_data_quality_spark.functions.corpus import stratified_sample
    return stratified_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        STRATIFIED_FRACTIONS, stratum_col="lang", id_col="doc_id",
        salt="r3")


def q_incremental_dedup_docs(spark, sf_dir):
    """Cross-run incremental dedup (functions/corpus.incremental_dedup):
    the 'previously seen' store is the fingerprints of the doc_id%7==0
    slice (standing in for all prior crawl waves); the wave is the whole
    corpus on 40-char prefix fingerprints (prefix collisions stand in for
    exact dups). Survivors = within-wave min-id canonicals whose
    fingerprint is new."""
    from cloud_data_quality_spark.functions.corpus import incremental_dedup
    wave = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text"))
    seen = (wave.where(F.col("doc_id") % 7 == 0)
            .select(F.md5(F.lower(F.trim("text"))).alias("fp")).distinct())
    return incremental_dedup(wave, seen).select("doc_id", "fp")


ORACLE_INCREMENTAL_DEDUP_DOCS = """
with w as (select doc_id, md5(lower(trim(substr(text, 1, 40), ' '))) as fp
           from documents),
seen as (select distinct fp from w where doc_id % 7 = 0),
canon as (select fp, min(doc_id) as doc_id from w group by fp)
select doc_id, fp from canon where fp not in (select fp from seen)
"""


_INC_MINHASH_K = 8
_INC_MINHASH_THRESHOLD = 0.5
_INC_MINHASH_STORE_MOD = 5  # doc_id % 5 == 0 slice stands in for history


def q_incremental_minhash_docs(spark, sf_dir):
    """Cross-run NEAR-dup dedup (corpus.incremental_minhash_dedup): the
    'history' is the band rows of the doc_id%5==0 slice (standing in for
    all prior crawl waves, persisted by SeenMinhashStore); the wave is the
    rest of the corpus. Wave docs whose bottom-k Jaccard estimate against
    any historical doc reaches 0.5 are dropped — catching the
    boilerplate-tweaked recrawls an exact-fingerprint store misses."""
    from cloud_data_quality_spark.functions.corpus import (
        incremental_minhash_dedup, minhash_band_rows)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    store = minhash_band_rows(docs.where(
        F.col("doc_id") % _INC_MINHASH_STORE_MOD == 0), k=_INC_MINHASH_K)
    wave = docs.where(F.col("doc_id") % _INC_MINHASH_STORE_MOD != 0)
    out = incremental_minhash_dedup(
        wave, store, k=_INC_MINHASH_K,
        jaccard_threshold=_INC_MINHASH_THRESHOLD)
    return out.select("doc_id")


# sketch + estimator replayed from the SAME constants: bottom-k of sorted
# md5 hex digests, truncated to 60-bit longs (hex sort order == numeric
# order of the truncation); estimator = |K_k(A∪B) ∩ A ∩ B| / |K_k(A∪B)|
ORACLE_INCREMENTAL_MINHASH_DOCS = f"""
with d as (
  select doc_id, {OF.sql_word_shingles('text', 3)} as sh from documents),
d2 as (select doc_id,
              list_transform(
                (list_sort(list_transform(sh, s -> md5(s))))[1:{_INC_MINHASH_K}],
                h -> ('0x' || substr(h, 1, 15))::BIGINT) as sig
       from d where len(sh) >= 1),
store as (select doc_id as sid, sig as sig_b, unnest(sig) as h from d2
          where doc_id % {_INC_MINHASH_STORE_MOD} = 0),
wave as (select doc_id, sig, unnest(sig) as h from d2
         where doc_id % {_INC_MINHASH_STORE_MOD} != 0),
cand as (select distinct w.doc_id, w.sig, s.sid, s.sig_b
         from wave w join store s using (h)),
matched as (
  select distinct doc_id from cand
  where len(list_intersect(
              (list_sort(list_distinct(sig || sig_b)))[1:{_INC_MINHASH_K}],
              list_intersect(sig, sig_b)))::DOUBLE
        / nullif(len((list_sort(list_distinct(sig || sig_b)))[1:{_INC_MINHASH_K}]), 0)
        >= {_INC_MINHASH_THRESHOLD})
select doc_id from documents
where doc_id % {_INC_MINHASH_STORE_MOD} != 0
  and doc_id not in (select doc_id from matched)
"""


RESAMPLE_TARGET = {"en": 0.4, "es": 0.2, "de": 0.2, "fr": 0.2}  # zh dropped


def q_importance_resample_docs(spark, sf_dir):
    """Data-mixing rebalance (functions/corpus.importance_resample): thin
    the English-heavy corpus to a target language mix; the scarcest-vs-
    target stratum is kept in full, everything else downsampled
    proportionally via the deterministic md5-threshold."""
    from cloud_data_quality_spark.functions.corpus import importance_resample
    return importance_resample(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        RESAMPLE_TARGET, stratum_col="lang", id_col="doc_id", salt="mix")


def _oracle_importance_resample() -> str:
    """Generated from the SAME target dict; the threshold expression keeps
    the exact double-op order of the Spark plan (C·t/n·2^60) so both
    engines floor identical IEEE values."""
    cases = " ".join(f"when '{k}' then {v}"
                     for k, v in sorted(RESAMPLE_TARGET.items()))
    two60 = float(1 << 60)
    return f"""
with counts as (
  select lang, count(*)::DOUBLE as n,
         (case lang {cases} end)::DOUBLE as t
  from documents group by lang),
valid as (select * from counts where t is not null and t > 0),
c as (select min(n / t) as c from valid),
rates as (select lang, floor(c.c * t / n * {two60!r})::BIGINT as thr
          from valid cross join c)
select d.doc_id, d.lang from documents d join rates using (lang)
where ('0x' || substr(md5(d.doc_id::VARCHAR || '|mix'), 1, 15))::BIGINT < thr
"""


def q_repetition_stats_docs(spark, sf_dir):
    """Gopher n-gram repetition signals (functions/corpus.repetition_stats):
    per-doc duplicate-2-gram and top-2-gram character fractions."""
    from cloud_data_quality_spark.functions.corpus import repetition_stats
    return repetition_stats(_t(spark, sf_dir, "documents"),
                            text_col="text", id_col="doc_id", n=2)


ORACLE_REPETITION_STATS_DOCS = f"""
with t as (select doc_id, length(text) as chars,
                  {OF.sql_tokens('text')} as toks from documents),
grams as (
  select doc_id, chars,
         array_to_string(toks[g.i:g.i+1], ' ') as g
  from t cross join unnest(generate_series(1, len(toks) - 1)) as g(i)
  where len(toks) >= 2),
per_gram as (select doc_id, g, count(*) as cnt,
                    any_value(chars) as chars from grams group by 1, 2),
stats as (
  select doc_id, sum(cnt)::BIGINT as n_grams,
         round(max(cnt * length(g))::DOUBLE / any_value(chars), 6)
           as top_gram_char_frac,
         round(coalesce(sum(case when cnt > 1 then cnt * length(g) end), 0)
               ::DOUBLE / any_value(chars), 6) as dup_gram_char_frac
  from per_gram group by doc_id)
select d.doc_id, coalesce(n_grams, 0)::BIGINT as n_grams,
       top_gram_char_frac, dup_gram_char_frac
from documents d left join stats using (doc_id)
"""


def q_chunk_documents(spark, sf_dir):
    """Context-window chunking (functions/corpus.chunk_documents): 64-token
    windows, 8-token overlap — the long-doc sibling of pack_documents."""
    from cloud_data_quality_spark.functions.corpus import chunk_documents
    return chunk_documents(_t(spark, sf_dir, "documents"),
                           budget_tokens=64, overlap_tokens=8,
                           text_col="text", id_col="doc_id")


ORACLE_CHUNK_DOCUMENTS = f"""
with t as (select doc_id, {OF.sql_tokens('text')} as toks from documents),
n as (select doc_id, toks,
             greatest(ceil((len(toks) - 8) / 56.0)::INT,
                      case when len(toks) > 0 then 1 else 0 end) as n_chunks
      from t),
chunks as (
  select doc_id, (g.i - 1)::INT as chunk_id,
         toks[(g.i-1)*56+1:(g.i-1)*56+64] as ctoks
  from n cross join unnest(generate_series(1, n_chunks)) as g(i))
select doc_id, chunk_id, array_to_string(ctoks, ' ') as chunk_text,
       len(ctoks)::BIGINT as n_tokens
from chunks
"""


def q_ivf_ann(spark, sf_dir):
    """IVF ANN (functions/similarity.ivf_topk): corpus bucketed by nearest
    k-means centroid (offline-trained artifact, functions/ivf_artifact),
    probes search their 4 nearest cells. Approximate vs brute force (recall
    pytest-gated) but deterministic given the centroids → exact value
    oracle, like lsh_ann."""
    from cloud_data_quality_spark.functions.ivf_artifact import (
        IVF_CENTROIDS_64,
    )
    from cloud_data_quality_spark.functions.similarity import ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    probes = (emb.where(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    return ivf_topk(emb, probes, IVF_CENTROIDS_64, k=5, n_probe=4)


def _oracle_ivf_ann(k: int = 5, n_probe: int = 4) -> str:
    """DuckDB replay of ivf_topk from the SAME centroid artifact: per-cell
    score |c|²−2·v·c with the identical left-to-right double dot product,
    ties by centroid index, probe cells by (score, index) rank."""
    from cloud_data_quality_spark.functions.ivf_artifact import (
        IVF_CENTROIDS_64,
    )
    import numpy as np
    cells = []
    for i, c in enumerate(IVF_CENTROIDS_64):
        lits = ", ".join(repr(float(x)) for x in c)
        c2 = repr(float(np.dot(c, c)))
        cells.append(f"({i}, {c2} - 2 * list_dot_product(v, [{lits}]))")
    cell_rows = ",\n      ".join(cells)
    return f"""
with emb as (select vec_id, embedding::DOUBLE[] as v from embeddings),
scores as (
  select vec_id, v, s.i as cell, s.d
  from emb cross join lateral (
    select * from (values
      {cell_rows}
    ) as t(i, d)) s),
assigned as (
  select vec_id, v, cell from (
    select *, row_number() over (partition by vec_id order by d, cell) as rn
    from scores) where rn = 1),
probe_cells as (
  select vec_id as probe_id, v as pv, cell from (
    select *, row_number() over (partition by vec_id order by d, cell) as rn
    from scores where vec_id < 10) where rn <= {n_probe}),
cand as (select probe_id, a.vec_id as neighbor_id, pv, a.v as cv
         from probe_cells p join assigned a using (cell)
         where a.vec_id != p.probe_id),
scored as (select probe_id, neighbor_id,
                  list_dot_product(pv, cv) /
                  nullif(sqrt(list_dot_product(pv, pv))
                       * sqrt(list_dot_product(cv, cv)), 0) as c
           from cand),
ranked as (select probe_id, neighbor_id, c,
                  row_number() over (partition by probe_id
                                     order by c desc, neighbor_id asc) as rank
           from scored)
select probe_id, neighbor_id, rank::INT as rank, round(c, 6) as cosine
from ranked where rank <= {k}
"""


# ---------------------------------------- learned quality classifier ops

def q_classifier_score_docs(spark, sf_dir):
    """Model-based quality filter: the offline-trained hashed-n-gram linear
    classifier (functions/qc_artifact) applied as a pure-JVM plan —
    broadcast weight join + exact int64 aggregation, so every score and
    keep/drop decision replays bit-for-bit in the oracle."""
    from cloud_data_quality_spark.functions.classifier import (
        classifier_scores)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return classifier_scores(docs)


def _classifier_score_ctes() -> str:
    """Shared WITH-block replaying the classifier scoring plan in DuckDB
    (weight list literal, tokenize, unigram+bigram features, md5 bucket
    join, per-doc int64 sum) — ONE spelling, consumed by both classifier
    oracles so the feature/hash lockstep can't drift between them."""
    from cloud_data_quality_spark.functions.qc_artifact import (
        QC_BUCKETS, QC_WEIGHTS_MICRO)
    weights = ",".join(str(int(v)) for v in QC_WEIGHTS_MICRO)
    toks = OF.sql_tokens("text")
    return f"""
wl as (select [{weights}]::BIGINT[] as l),
w as (select i as bucket, l[i::INT + 1] as wm from wl cross join range({QC_BUCKETS}) t(i)),
toks as (select doc_id, {toks} as t from documents),
feats as (
  select doc_id, unnest(list_concat(t,
    case when len(t) >= 2
         then list_transform(list_slice(t, 2, len(t)), (x, i) -> t[i] || ' ' || x)
         else []::VARCHAR[] end)) as f
  from toks),
summed as (
  select doc_id, sum(wm)::BIGINT as ws
  from feats join w
    on (('0x' || substr(md5(f), 1, 15))::BIGINT % {QC_BUCKETS}) = w.bucket
  group by doc_id)"""


def _oracle_classifier_score() -> str:
    from cloud_data_quality_spark.functions.qc_artifact import QC_BIAS_MICRO
    return f"""
with {_classifier_score_ctes()}
select d.doc_id,
       (coalesce(s.ws, 0) + {QC_BIAS_MICRO})::BIGINT as score_micro,
       (coalesce(s.ws, 0) + {QC_BIAS_MICRO}) >= 0 as ml_keep
from documents d left join summed s using (doc_id)
"""


_TOKEN_BUDGET = 15_000


def q_token_budget_select(spark, sf_dir):
    """Budgeted corpus selection: rank every document by the learned
    classifier score (int64-exact) and keep documents until the corpus
    token budget is met — the distributed prefix-sum of
    functions/selection.select_token_budget (range partition +
    per-partition totals + driver offset merge; never a single-partition
    global window)."""
    from cloud_data_quality_spark.functions.classifier import (
        classifier_scores)
    from cloud_data_quality_spark.functions.selection import (
        select_token_budget)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = (classifier_scores(docs)
              .join(docs.select(
                  "doc_id",
                  TX.word_count(F.col("text")).alias("n_tokens")),
                  "doc_id")
              .select("doc_id", F.col("score_micro").alias("score"),
                      "n_tokens"))
    sel = select_token_budget(scored, _TOKEN_BUDGET, score_col="score",
                              token_col="n_tokens", id_col="doc_id")
    return sel.select("doc_id", "n_tokens", "cum_tokens")


def _oracle_token_budget_select() -> str:
    from cloud_data_quality_spark.functions.qc_artifact import QC_BIAS_MICRO
    wc = OF.sql_word_count("text")
    return f"""
with {_classifier_score_ctes()},
scored as (
  select d.doc_id, (coalesce(s.ws, 0) + {QC_BIAS_MICRO})::BIGINT as score,
         {wc} as n_tokens
  from documents d left join summed s using (doc_id)),
c as (
  select doc_id, n_tokens,
         sum(n_tokens) over (order by score desc, doc_id asc
                             rows between unbounded preceding
                                      and current row) as cum
  from scored)
select doc_id, n_tokens::BIGINT as n_tokens, cum::BIGINT as cum_tokens
from c where cum <= {_TOKEN_BUDGET}
"""


_PPL_CUTS = [(1, 3), (2, 3)]
_PPL_LABELS = ["head", "middle", "tail"]


def q_perplexity_buckets_docs(spark, sf_dir):
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): label
    every doc by which exact corpus-perplexity tercile it falls in
    (functions/selection.quantile_buckets over the corpus-unigram NLL).
    Rank targets are integer-exact (ceil(n·k/3) via integer arithmetic),
    so both engines derive identical boundary scores — no approximate
    percentile anywhere."""
    from cloud_data_quality_spark.functions.selection import quantile_buckets
    scored = q_unigram_logprob(spark, sf_dir)
    return quantile_buckets(scored, "nll", cuts=_PPL_CUTS,
                            labels=_PPL_LABELS)


def _oracle_perplexity_buckets() -> str:
    # boundaries replayed with the SAME integer rank targets over the same
    # 4dp-rounded nll the unigram oracle produces
    cuts_sql = []
    for k, (num, den) in enumerate(_PPL_CUTS):
        cuts_sql.append(
            f"b{k} as (select min(nll) as b from cum "
            f"where c >= (n * {num} + {den - 1}) // {den})")
    whens = " ".join(
        f"when s.nll <= (select b from b{k}) then '{label}'"
        for k, label in enumerate(_PPL_LABELS[:-1]))
    return f"""
with scored as ({ORACLE_UNIGRAM_LOGPROB}),
f as (select nll, count(*) cnt from scored group by nll),
cum as (select nll, sum(cnt) over (order by nll) as c,
               (select count(*) from scored) as n from f),
{", ".join(cuts_sql)}
select s.doc_id, s.nll,
       case {whens} else '{_PPL_LABELS[-1]}' end as bucket
from scored s
"""


_DUP_NGRAM_N = 8


def q_dup_ngram_stats_docs(spark, sf_dir):
    """Cross-document duplicated n-gram coverage
    (functions/corpus.duplicated_ngram_stats): per-doc fraction of distinct
    8-word shingles that occur in other documents — the RefinedWeb-style
    boilerplate signal; exact integer ratios end to end."""
    from cloud_data_quality_spark.functions.corpus import (
        duplicated_ngram_stats)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicated_ngram_stats(docs, n=_DUP_NGRAM_N)


def _oracle_dup_ngram_stats() -> str:
    sh = OF.sql_word_shingles("text", _DUP_NGRAM_N)
    return f"""
with s as (select doc_id, {sh} as sh from documents where text is not null),
e as (select doc_id, md5(unnest(sh)) as fp from s),
c as (select fp, count(*) as docs from e group by fp),
d as (select e.doc_id, count(*) as n_sh,
             sum(case when c.docs > 1 then 1 else 0 end) as n_dup
      from e join c using (fp) group by e.doc_id)
select s.doc_id,
       coalesce(d.n_sh, 0)::BIGINT as n_shingles,
       coalesce(d.n_dup, 0)::BIGINT as n_dup_shingles,
       round(coalesce(d.n_dup, 0) /
             nullif(coalesce(d.n_sh, 0), 0)::DOUBLE, 6) as dup_ngram_frac
from s left join d using (doc_id)
"""


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SALT = "split1"


def q_dataset_split_docs(spark, sf_dir):
    """Deterministic exclusive train/val/test assignment
    (functions/corpus.dataset_split): 60-bit id-hash vs cumulative integer
    thresholds — exhaustive, exclusive, reproducible across engines and
    partitionings (re-runs MUST NOT leak eval docs into training)."""
    from cloud_data_quality_spark.functions.corpus import dataset_split
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return dataset_split(docs, _SPLIT_WEIGHTS, id_col="doc_id",
                         salt=_SPLIT_SALT)


def _oracle_dataset_split() -> str:
    """Generated from the SAME weights/salt via split_boundaries — the two
    engines compare the same integers against the same md5 prefix."""
    from cloud_data_quality_spark.functions.corpus import split_boundaries
    bounds = split_boundaries(_SPLIT_WEIGHTS)
    h = (f"('0x' || substr(md5(doc_id::VARCHAR || '|{_SPLIT_SALT}'), "
         f"1, 15))::BIGINT")
    whens = " ".join(f"when {h} < {bound} then '{name}'"
                     for name, bound in bounds[:-1])
    return f"""
select doc_id, case {whens} else '{bounds[-1][0]}' end as split
from documents
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "rb_customer_rules": q_rb_customer_rules,
    "rb_orders_dup_statement": q_rb_orders_dup_statement,
    "rb_entity_uri_and_env": q_rb_entity_uri_and_env,
    "rb_events_window": q_rb_events_window,
    "failed_records_acctbal": q_failed_records_acctbal,
    "failed_records_dup_statement": q_failed_records_dup_statement,
    "extract_text_roundtrip": q_extract_text_roundtrip,
    "pack_documents": q_pack_documents,
    "pack_documents_bpe": q_pack_documents_bpe,
    "pack_documents_bpe_1k": q_pack_documents_bpe_1k,
    "text_stats": q_text_stats,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "pii_scrub": q_pii_scrub,
    "quality_verdict": q_quality_verdict,
    "quality_rollup": q_quality_rollup,
    "token_count_by_source": q_token_count_by_source,
    "unigram_logprob": q_unigram_logprob,
    "unigram_logprob_topk": q_unigram_logprob_topk,
    "trigram_logprob": q_trigram_logprob,
    "dedup_exact_prefix": q_dedup_exact_prefix,
    "minhash_pairs": q_minhash_pairs,
    "minhash_clusters": q_minhash_clusters,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_pairs": q_embedding_pairs,
    "ann_topk": q_ann_topk,
    "simhash_pairs": q_simhash_pairs,
    "lsh_ann": q_lsh_ann,
    "events_volume_per_day": q_events_volume_per_day,
    "accuracy_distribution_events": q_accuracy_distribution_events,
    "accuracy_distribution_true": q_accuracy_distribution_true,
    "json_field_threshold": q_json_field_threshold,
    "array_aggregate_rule": q_array_aggregate_rule,
    "sessionize_events": q_sessionize_events,
    "rollup_quality": q_rollup_quality,
    "topk_docs_per_lang": q_topk_docs_per_lang,
    "integrity_lineitem_part": q_integrity_lineitem_part,
    "integrity_unnest_join": q_integrity_unnest_join,
    "timeliness_recent_events": q_timeliness_recent_events,
    "span_dedup_docs": q_span_dedup_docs,
    "substring_dedup_docs": q_substring_dedup_docs,
    "incremental_dedup_docs": q_incremental_dedup_docs,
    "incremental_minhash_docs": q_incremental_minhash_docs,
    "importance_resample_docs": q_importance_resample_docs,
    "repetition_stats_docs": q_repetition_stats_docs,
    "chunk_documents": q_chunk_documents,
    "ivf_ann": q_ivf_ann,
    "decontaminate_docs": q_decontaminate_docs,
    "stratified_sample_docs": q_stratified_sample_docs,
    "host_capped_sample": q_host_capped_sample,
    "curation_pipeline_docs": q_curation_pipeline_docs,
    "c4_line_filter": q_c4_line_filter,
    "canonical_urls": q_canonical_urls,
    "image_metadata": q_image_metadata,
    "bpe_tokens": q_bpe_tokens,
    "paragraph_stats_docs": q_paragraph_stats,
    "top_quality_docs": q_top_quality_docs,
    "containment_pairs": q_containment_pairs,
    "classifier_score_docs": q_classifier_score_docs,
    "token_budget_select": q_token_budget_select,
    "dataset_split_docs": q_dataset_split_docs,
    "dup_ngram_stats_docs": q_dup_ngram_stats_docs,
    "perplexity_buckets_docs": q_perplexity_buckets_docs,
}

ORACLES = {
    "rb_customer_rules": ORACLE_RB_CUSTOMER_RULES,
    "rb_orders_dup_statement": ORACLE_RB_ORDERS_DUP,
    "rb_entity_uri_and_env": ORACLE_RB_ENTITY_URI_AND_ENV,
    "rb_events_window": ORACLE_RB_EVENTS_WINDOW,
    "failed_records_acctbal": ORACLE_FAILED_RECORDS_ACCTBAL,
    "failed_records_dup_statement": ORACLE_FAILED_RECORDS_DUP_STATEMENT,
    "extract_text_roundtrip": _oracle_extract_text_roundtrip(),
    "pack_documents": ORACLE_PACK_DOCUMENTS,
    "pack_documents_bpe": ORACLE_PACK_DOCUMENTS_BPE,
    "pack_documents_bpe_1k": ORACLE_PACK_DOCUMENTS_BPE_1K,
    "text_stats": ORACLE_TEXT_STATS,
    "text_langid": ORACLE_TEXT_LANGID,
    "text_fingerprint": ORACLE_TEXT_FINGERPRINT,
    "pii_scrub": ORACLE_PII_SCRUB,
    "quality_verdict": _oracle_quality_verdict(),
    "quality_rollup": _oracle_quality_rollup(),
    "token_count_by_source": ORACLE_TOKEN_COUNT_BY_SOURCE,
    "unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "unigram_logprob_topk": ORACLE_UNIGRAM_LOGPROB_TOPK,
    "trigram_logprob": ORACLE_TRIGRAM_LOGPROB,
    "dedup_exact_prefix": ORACLE_DEDUP_EXACT_PREFIX,
    "minhash_pairs": ORACLE_MINHASH_PAIRS,
    "minhash_clusters": ORACLE_MINHASH_CLUSTERS,
    "ngram_jaccard_pairs": ORACLE_NGRAM_JACCARD_PAIRS,
    "embedding_pairs": ORACLE_EMBEDDING_PAIRS,
    "ann_topk": ORACLE_ANN_TOPK,
    "simhash_pairs": ORACLE_SIMHASH_PAIRS,
    # approximate vs brute force, but deterministic given its planes →
    # exact value oracle generated from the shared hyperplane constants
    "lsh_ann": _oracle_lsh_ann(),
    "events_volume_per_day": ORACLE_EVENTS_VOLUME_PER_DAY,
    "accuracy_distribution_events": ORACLE_ACCURACY_DISTRIBUTION_EVENTS,
    "accuracy_distribution_true": ORACLE_ACCURACY_DISTRIBUTION_TRUE,
    "json_field_threshold": ORACLE_JSON_FIELD_THRESHOLD,
    "array_aggregate_rule": ORACLE_ARRAY_AGGREGATE_RULE,
    "sessionize_events": ORACLE_SESSIONIZE_EVENTS,
    "rollup_quality": _oracle_rollup_quality(),
    "topk_docs_per_lang": ORACLE_TOPK_DOCS_PER_LANG,
    "integrity_lineitem_part": ORACLE_INTEGRITY_LINEITEM_PART,
    "integrity_unnest_join": ORACLE_INTEGRITY_UNNEST_JOIN,
    "timeliness_recent_events": ORACLE_TIMELINESS_RECENT_EVENTS,
    "span_dedup_docs": ORACLE_SPAN_DEDUP_DOCS,
    "substring_dedup_docs": ORACLE_SUBSTRING_DEDUP_DOCS,
    "incremental_dedup_docs": ORACLE_INCREMENTAL_DEDUP_DOCS,
    "incremental_minhash_docs": ORACLE_INCREMENTAL_MINHASH_DOCS,
    "importance_resample_docs": _oracle_importance_resample(),
    "repetition_stats_docs": ORACLE_REPETITION_STATS_DOCS,
    "chunk_documents": ORACLE_CHUNK_DOCUMENTS,
    "ivf_ann": _oracle_ivf_ann(),
    "decontaminate_docs": ORACLE_DECONTAMINATE_DOCS,
    "stratified_sample_docs": _oracle_stratified_sample(),
    "host_capped_sample": _oracle_host_capped_sample(),
    "curation_pipeline_docs": _oracle_curation_pipeline(),
    "c4_line_filter": _oracle_c4_line_filter(),
    "canonical_urls": _oracle_canonical_urls(),
    "image_metadata": _oracle_image_metadata(),
    "bpe_tokens": _oracle_bpe_tokens(),
    "paragraph_stats_docs": _oracle_paragraph_stats(),
    "top_quality_docs": ORACLE_TOP_QUALITY,
    "containment_pairs": _oracle_containment_pairs(),
    "classifier_score_docs": _oracle_classifier_score(),
    "token_budget_select": _oracle_token_budget_select(),
    "dataset_split_docs": _oracle_dataset_split(),
    "dup_ngram_stats_docs": _oracle_dup_ngram_stats(),
    "perplexity_buckets_docs": _oracle_perplexity_buckets(),
}
