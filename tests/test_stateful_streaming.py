"""Custom stateful streaming operators: state evolves across micro-batches
(maxFilesPerTrigger forces multiple batches from the file source)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


@pytest.fixture(scope="module")
def multi_file_pages(spark, tmp_path_factory):
    """Pages written as several files so maxFilesPerTrigger yields several
    micro-batches."""
    from cloud_data_quality_spark.sources.pages import generate_pages
    path = str(tmp_path_factory.mktemp("mfpages") / "pages")
    generate_pages(spark, 1200, seed=21, partitions=6) \
        .write.mode("overwrite").parquet(path)
    return path


def run_stream(spark, src, build, name):
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 2).parquet(src))
    out = build(stream)
    q = (out.writeStream.outputMode("update" if name == "hostq" else "append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.sql(f"select * from {name}")


class TestRunningHostQuality:
    def test_final_state_matches_batch_totals(self, spark, multi_file_pages):
        from cloud_data_quality_spark.functions.skew import url_host
        from cloud_data_quality_spark.operators.quality_filter import (
            annotate_quality_arrow,
        )
        from cloud_data_quality_spark.streaming.stateful import (
            running_host_quality,
        )
        got = run_stream(spark, multi_file_pages, running_host_quality, "hostq")
        # update mode emits one row per host per batch it appears in; the
        # LAST row per host carries the lifetime totals
        latest = {}
        for r in got.collect():
            latest[r["host"]] = r  # memory sink appends in batch order
        batch = (annotate_quality_arrow(
                    spark.read.parquet(multi_file_pages),
                    with_perplexity=False)
                 .withColumn("host", url_host(F.col("url")))
                 .groupBy("host")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.count_if(F.col("keep")).alias("n_kept")))
        expected = {r["host"]: r for r in batch.collect()}
        assert set(latest) == set(expected)
        for host, r in expected.items():
            assert latest[host]["n_docs"] == r["n_docs"], host
            assert latest[host]["n_kept"] == r["n_kept"], host

    def test_state_accumulates_across_batches(self, spark, multi_file_pages):
        got = spark.sql("select * from hostq").collect()
        by_host = {}
        for r in got:
            by_host.setdefault(r["host"], []).append(r["n_docs"])
        # hot host appears in several micro-batches → strictly growing totals
        hot = by_host["hot.example.com"]
        assert len(hot) >= 2
        assert hot == sorted(hot) and hot[0] < hot[-1]


class TestStreamingDedup:
    def test_first_occurrence_only(self, spark, multi_file_pages):
        from cloud_data_quality_spark.streaming.stateful import (
            streaming_dedup_exact,
        )
        got = run_stream(spark, multi_file_pages, streaming_dedup_exact,
                         "sdedup")
        rows = got.collect()
        fps = [r["fp"] for r in rows]
        assert len(fps) == len(set(fps))  # one row per fingerprint
        # matches batch distinct count of normalized non-null text
        from cloud_data_quality_spark.functions.text import fingerprint
        batch_distinct = (spark.read.parquet(multi_file_pages)
                          .select(fingerprint(F.col("text")).alias("fp"))
                          .where(F.col("fp").isNotNull())
                          .distinct().count())
        assert len(fps) == batch_distinct
