"""Skew handling for hot-key workloads (north-rule requirement; the reference
has no equivalent — BigQuery absorbs skew server-side).

Web corpora are host-skewed (a few domains contribute a large share of
pages). Two tools:

* salted_repartition — spread a hot key across n_salts partitions by
  hashing (key, salt). Deterministic salt = pmod(xxhash64(full row key), n)
  so re-runs place rows identically (required for resumable lineage).
* url_host — extract the host for per-host grouping/salting.
* hot_keys — find keys above a frequency threshold (one cheap agg) so
  salting can be applied selectively: only hot keys get salted, cold keys
  keep single-partition locality for their aggregations.

AQE's skewJoin handles the JOIN case automatically (session factory enables
it); these utilities cover the groupBy/repartition case AQE doesn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(col: Column) -> Column:
    """Skew key for URL-hosted corpora — delegates to the canonical parser
    (functions/hosts.py: case-folded, userinfo/port-stripped) so the skew
    salt and the host-curation operators always agree on what a host is."""
    from cloud_data_quality_spark.functions.hosts import url_host as _uh
    return _uh(col)


def salted_repartition(df: DataFrame, key_col: str, n_salts: int = 16,
                       num_partitions: int | None = None,
                       salt_col: str | None = None) -> DataFrame:
    """Repartition by (key, deterministic salt): a key that would land on one
    partition spreads over n_salts. Downstream per-key aggregations must be
    algebraic (partial per salt → final combine) — the standard two-phase
    pattern.

    The salt must vary WITHIN a hot key or the whole function is a no-op
    (a salt that is a pure function of the key sends every row of the key to
    the same partition). Salt source, in order: the caller-named per-row
    column, else ``url`` (per-row distinct in web corpora), else a hash over
    ALL columns — deterministic across re-runs (required for resumable
    lineage) yet row-distinct whenever rows are."""
    if salt_col is not None:
        src = [F.col(salt_col)]
    elif "url" in df.columns:
        src = [F.col("url")]
    else:
        src = [F.col(c) for c in df.columns]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*src), F.lit(n_salts)))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    return salted.repartition(n, F.col(key_col), F.col("__salt"))


def hot_keys(df: DataFrame, key_col: str, min_fraction: float = 0.05) -> DataFrame:
    """Keys holding more than min_fraction of all rows (the salting set)."""
    total = df.count()
    return (df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= total * min_fraction))


def per_host_doc_counts(df: DataFrame, url_col: str = "url",
                        n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe per-host aggregation: partial counts per
    (host, salt) — map-side combine keeps hot hosts from funneling into one
    reducer — then final combine per host."""
    hosts = df.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__salt", F.pmod(F.xxhash64(url_col), F.lit(n_salts)))
    partial = hosts.groupBy("__host", "__salt").agg(
        F.count(F.lit(1)).alias("n_partial"))
    return (partial.groupBy("__host")
            .agg(F.sum("n_partial").cast("bigint").alias("n_docs"))
            .withColumnRenamed("__host", "host"))
