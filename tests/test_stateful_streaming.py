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


class TestStreamingDedupTTL:
    """Bounded-state mode: idle fingerprints evict after the TTL, so a
    later duplicate re-emits (dedup exact within the window) while state
    stays O(active window), not O(stream lifetime)."""

    @staticmethod
    def _write_batch(spark, src, text, url):
        import datetime as dt
        spark.createDataFrame(
            [(url, dt.datetime(2026, 1, 1), None, text, "en")],
            PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    @staticmethod
    def _run_once(spark, src, ckpt, out_dir, ttl):
        """One availableNow run against a persistent checkpoint; returns the
        number of rows this run appended (file sink — the memory sink does
        not support checkpoint recovery across restarts)."""
        from cloud_data_quality_spark.streaming.stateful import (
            streaming_dedup_exact,
        )
        import glob

        def _count(path):
            files = glob.glob(f"{path}/*.parquet")
            return spark.read.parquet(path).count() if files else 0

        before = _count(out_dir)
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
        out = streaming_dedup_exact(stream, ttl_minutes=ttl)
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", out_dir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        return _count(out_dir) - before

    def test_ttl_evicts_then_reemits(self, spark, tmp_path):
        """TTL mode runs under a continuous trigger (ProcessingTimeTimeout
        keeps shouldRunAnotherBatch=true, so availableNow would never
        terminate — see streaming_dedup_exact docstring). One long-running
        query: duplicate text arriving after its fingerprint's TTL expired
        is re-emitted because the idle state was evicted by the timer."""
        import glob
        import time

        from cloud_data_quality_spark.streaming.stateful import (
            streaming_dedup_exact,
        )
        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        def count():
            if not glob.glob(f"{out}/*.parquet"):
                return 0
            try:
                return spark.read.parquet(out).count()
            except Exception:
                return -1  # sink mid-write (zero-length part file) — retry

        def wait_for(n, timeout=180):
            deadline = time.time() + timeout
            got = 0
            while time.time() < deadline:
                got = count()
                if got >= n:
                    return got
                time.sleep(0.5)
            return got

        self._write_batch(spark, src, "hello ttl dedup", "https://a/1")
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
        q = (streaming_dedup_exact(stream, ttl_minutes=0.001)  # 60 ms TTL
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(processingTime="500 milliseconds").start())
        try:
            assert wait_for(1) == 1
            time.sleep(2)  # >> TTL: the continuous batches fire the timer
            self._write_batch(spark, src, "a different text", "https://a/2")
            assert wait_for(2) == 2
            time.sleep(2)
            # duplicate arrives after eviction → re-emitted (window semantics)
            self._write_batch(spark, src, "hello ttl dedup", "https://a/3")
            assert wait_for(3) == 3
        finally:
            q.stop()

    def test_no_ttl_suppresses_forever(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "src2"), str(tmp_path / "ckpt2")
        out = str(tmp_path / "out2")
        self._write_batch(spark, src, "hello forever dedup", "https://b/1")
        assert self._run_once(spark, src, ckpt, out, None) == 1
        self._write_batch(spark, src, "some other text", "https://b/2")
        assert self._run_once(spark, src, ckpt, out, None) == 1
        self._write_batch(spark, src, "hello forever dedup", "https://b/3")
        assert self._run_once(spark, src, ckpt, out, None) == 0


class TestStreamingHostQuota:
    def test_quota_enforced_across_batches(self, spark, multi_file_pages):
        from cloud_data_quality_spark.streaming.stateful import (
            streaming_host_quota,
        )
        got = run_stream(spark, multi_file_pages,
                         lambda s: streaming_host_quota(s, 7), "quota7")
        rows = got.collect()
        by_host = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r["url"])
        # never over quota, and each url admitted at most once
        assert all(len(v) <= 7 for v in by_host.values()), \
            {h: len(v) for h, v in by_host.items() if len(v) > 7}
        assert all(len(set(v)) == len(v) for v in by_host.values())
        # the deliberate hot host (~20% of 1200 rows) hits the cap exactly
        assert len(by_host["hot.example.com"]) == 7
        # a host with fewer docs than the quota is passed through untouched
        batch_counts = {r["host"]: r["n"] for r in
                        spark.read.parquet(multi_file_pages)
                        .groupBy(F.expr(
                            "lower(regexp_extract(url, "
                            "'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?"
                            "([^/?#:]+)', 1))").alias("host"))
                        .agg(F.count(F.lit(1)).alias("n")).collect()}
        for host, urls in by_host.items():
            assert len(urls) == min(7, batch_counts[host]), host

    def test_rejects_nonpositive_quota(self, spark, multi_file_pages):
        import pytest as _pytest
        from cloud_data_quality_spark.streaming.stateful import (
            streaming_host_quota,
        )
        df = spark.read.parquet(multi_file_pages)
        with _pytest.raises(ValueError):
            streaming_host_quota(df, 0)

    def test_custom_url_col_and_schema_passthrough(self, spark, tmp_path):
        """Regression: the quota output schema is derived from the input
        (all columns + host), and url_col is honored — not hardcoded."""
        from cloud_data_quality_spark.streaming.stateful import (
            streaming_host_quota,
        )
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(f"https://h{i % 3}.org/p{i}", i) for i in range(30)],
            "link string, n int").coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("link string, n int").parquet(src)
        out_path, cp = str(tmp_path / "out"), str(tmp_path / "cp")
        q = (streaming_host_quota(stream, 4, url_col="link")
             .writeStream.outputMode("append").format("parquet")
             .option("path", out_path).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        got = spark.read.parquet(out_path)
        assert set(got.columns) == {"link", "n", "host"}
        counts = {r["host"]: r["c"] for r in
                  got.groupBy("host").agg(F.count("*").alias("c")).collect()}
        assert all(c == 4 for c in counts.values())  # 10 per host, capped
        # deterministic: lowest 4 links per host admitted (one batch)
        links = sorted(r["link"] for r in got.where("host = 'h0.org'")
                       .collect())
        want = sorted(f"https://h0.org/p{i}" for i in range(0, 30, 3))[:4]
        assert links == want


class TestStreamingLatestRevision:
    @pytest.fixture(scope="class")
    def revision_files(self, spark, tmp_path_factory):
        """Three files → three micro-batches; revisions of the same
        canonical URL spread across batches, newest NOT last."""
        path = str(tmp_path_factory.mktemp("revs") / "caps")
        rows = []
        for i in range(60):
            page = i % 10
            rows.append((i, f"https://s{i % 3}.test/p/{page}"
                         f"?utm_source=b{i % 6}",
                         1_000_000 + ((i * 37) % 500), i % 7))
        df = spark.createDataFrame(
            rows, "doc_id long, url string, warc_ts long, part int")
        for b in range(3):
            df.where(F.col("part") % 3 == b).drop("part").coalesce(1) \
                .write.mode("append").parquet(path)
        return path

    def test_converges_to_batch_answer(self, spark, revision_files):
        from cloud_data_quality_spark.functions.hosts import latest_revision
        from cloud_data_quality_spark.streaming.stateful import (
            streaming_latest_revision)
        stream = (spark.readStream
                  .schema("doc_id long, url string, warc_ts long")
                  .option("maxFilesPerTrigger", 1).parquet(revision_files))
        q = (streaming_latest_revision(stream).writeStream
             .outputMode("update").format("memory").queryName("revs")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        emitted = spark.sql("select * from revs")
        # last emission per canon_url = the one with the highest n_revisions
        from pyspark.sql.window import Window
        w = Window.partitionBy("canon_url").orderBy(
            F.col("n_revisions").desc())
        final = (emitted.withColumn("rn", F.row_number().over(w))
                 .where("rn = 1").drop("rn"))
        batch = latest_revision(
            spark.read.parquet(revision_files))
        got = {r["canon_url"]: (r["doc_id"], r["warc_ts"], r["n_revisions"])
               for r in final.collect()}
        want = {r["canon_url"]: (r["doc_id"], r["warc_ts"], r["n_revisions"])
                for r in batch.collect()}
        assert got == want
        # state really evolved across batches: more emissions than urls
        assert emitted.count() > len(want)
