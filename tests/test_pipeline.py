"""Composed resumable curation pipeline: staging, crash/resume, parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_data_quality_spark.engine.pipeline import (
    PipelineStage,
    ResumableCurationPipeline,
)


def _quality(df):
    from cloud_data_quality_spark.operators.quality_filter import (
        annotate_quality_arrow)
    ann = annotate_quality_arrow(df, with_perplexity=False)
    return ann.where("keep").select(*df.columns)


def _cap_hosts(df):
    from cloud_data_quality_spark.functions.hosts import cap_per_host
    return cap_per_host(df, 50, order_col="url").drop("host")


def _exact_dedup(df):
    from cloud_data_quality_spark.functions.text import fingerprint
    from pyspark.sql.window import Window
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("url")
    return (df.withColumn("__r", F.row_number().over(w))
            .where("__r = 1").drop("__r"))


STAGES = [
    PipelineStage("quality", _quality, kind="partition"),
    PipelineStage("host_cap", _cap_hosts, kind="global"),
    PipelineStage("dedup", _exact_dedup, kind="global"),
]


@pytest.fixture(scope="module")
def pages(spark, pages_parquet):
    return spark.read.parquet(pages_parquet)


def _expected(pages):
    """Uninterrupted single-plan restatement of the staged pipeline."""
    return _exact_dedup(_cap_hosts(_quality(pages)))


class TestComposedPipeline:
    def test_end_to_end_matches_unstaged(self, spark, pages, tmp_path):
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w"),
                                         n_buckets=8)
        res = pipe.run(pages, STAGES, run_id="r1")
        assert [s.name for s in res.stages] == ["quality", "host_cap", "dedup"]
        got = sorted(r["url"] for r in
                     spark.read.parquet(res.stages[-1].output_path)
                     .select("url").collect())
        want = sorted(r["url"] for r in
                      _expected(pages).select("url").collect())
        assert got == want
        assert res.rows_out == len(want)
        # monotone narrowing + bookkeeping consistency
        assert res.stages[0].rows_in == pages.count()
        assert res.stages[0].rows_out >= res.stages[1].rows_out \
            >= res.stages[2].rows_out

    def test_crash_in_partition_stage_resumes(self, spark, pages, tmp_path):
        work = str(tmp_path / "w2")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8,
                                         partitions_per_commit=2)
        with pytest.raises(RuntimeError, match="simulated crash"):
            pipe.run(pages, STAGES, run_id="r2", fail_at=("quality", 5))
        res = pipe.run(pages, STAGES, run_id="r2")
        # buckets 0-4 committed pre-crash and were NOT re-processed
        q = res.stages[0]
        assert not q.resumed  # partially done, finished now
        got = sorted(r["url"] for r in
                     spark.read.parquet(res.stages[-1].output_path)
                     .select("url").collect())
        want = sorted(r["url"] for r in
                      _expected(pages).select("url").collect())
        assert got == want

    def test_crash_in_global_stage_resumes(self, spark, pages, tmp_path):
        work = str(tmp_path / "w3")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8)
        with pytest.raises(RuntimeError, match="host_cap"):
            pipe.run(pages, STAGES, run_id="r3", fail_at=("host_cap", None))
        res = pipe.run(pages, STAGES, run_id="r3")
        assert res.stages[0].resumed        # quality fully committed pre-crash
        assert not res.stages[1].resumed    # host_cap ran this time
        got = spark.read.parquet(res.stages[-1].output_path).count()
        assert got == _expected(pages).count()

    def test_rerun_is_fully_resumed_and_cheap(self, spark, pages, tmp_path):
        work = str(tmp_path / "w4")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8)
        first = pipe.run(pages, STAGES, run_id="r4")
        again = pipe.run(pages, STAGES, run_id="r4")
        assert all(s.resumed for s in again.stages)
        # resumed global stages report their original lineage counts
        assert again.stages[1].rows_out == first.stages[1].rows_out
        assert again.stages[2].rows_out == first.stages[2].rows_out

    def test_distinct_run_ids_isolated(self, spark, pages, tmp_path):
        work = str(tmp_path / "w5")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8)
        pipe.run(pages, STAGES, run_id="a")
        res_b = pipe.run(pages, STAGES, run_id="b")
        assert not any(s.resumed for s in res_b.stages)

    def test_duplicate_stage_names_rejected(self, spark, pages, tmp_path):
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w6"))
        with pytest.raises(ValueError, match="duplicate"):
            pipe.run(pages, [STAGES[0], STAGES[0]], run_id="x")

    def test_downstream_partition_stage_reuses_part_key(
            self, spark, pages, tmp_path):
        """A partition stage following another partition stage keys on the
        inherited part_key column, so its wave filter physically prunes the
        upstream partitioned output."""
        stages = [
            PipelineStage("quality", _quality, kind="partition"),
            PipelineStage("mark", lambda d: d.withColumn(
                "n_words", F.size(F.split("text", " "))), kind="partition"),
        ]
        work = str(tmp_path / "w7")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8,
                                         partitions_per_commit=4)
        res = pipe.run(pages, stages, run_id="r7")
        assert res.stages[1].rows_in == res.stages[0].rows_out
        out = spark.read.parquet(res.stages[1].output_path)
        assert "n_words" in out.columns and "part_key" in out.columns
        # bucket assignment consistent across the two stages: every url in
        # stage-2 bucket k came from stage-1 bucket k
        a = {r["url"]: r["part_key"] for r in
             spark.read.parquet(res.stages[0].output_path)
             .select("url", "part_key").collect()}
        b = {r["url"]: r["part_key"] for r in
             out.select("url", "part_key").collect()}
        assert a == b


def _mark_words(df):
    return df.withColumn("n_words", F.size(F.split("text", " ")))


class TestFusedPipeline:
    """Stage fusion (run(fuse=...)): adjacent narrow stages share one
    lineage unit / one materialization; explicit fuse_with_previous folds
    a stage into the preceding unit. Results must be identical to the
    unfused run — fusion is a physical choice, never a semantic one."""

    def test_narrow_fuses_partition_chain_keeps_wave_resume(
            self, spark, pages, tmp_path):
        stages = [
            PipelineStage("quality", _quality, kind="partition"),
            PipelineStage("mark", _mark_words, kind="partition"),
            PipelineStage("dedup", _exact_dedup, kind="global"),
        ]
        work = str(tmp_path / "w")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8,
                                         partitions_per_commit=2)
        # crash mid-way through the FUSED partition unit (by member name)
        with pytest.raises(RuntimeError, match="simulated crash"):
            pipe.run(pages, stages, run_id="r", fail_at=("mark", 5),
                     fuse="narrow")
        res = pipe.run(pages, stages, run_id="r", fuse="narrow")
        assert [s.name for s in res.stages] == ["quality+mark", "dedup"]
        assert res.stages[0].kind == "partition"
        assert res.stages[0].members == ["quality", "mark"]
        out = spark.read.parquet(res.stages[0].output_path)
        assert "part_key" in out.columns  # wave machinery intact
        got = sorted(r["url"] for r in
                     spark.read.parquet(res.stages[-1].output_path)
                     .select("url").collect())
        want = sorted(r["url"] for r in
                      _exact_dedup(_mark_words(_quality(pages)))
                      .select("url").collect())
        assert got == want

    def test_marked_global_fusion_matches_unfused(self, spark, pages,
                                                  tmp_path):
        fused = [
            PipelineStage("quality", _quality, kind="partition"),
            PipelineStage("host_cap", _cap_hosts, kind="global",
                          fuse_with_previous=True),
            PipelineStage("dedup", _exact_dedup, kind="global",
                          fuse_with_previous=True),
        ]
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w"),
                                         n_buckets=8)
        res = pipe.run(pages, fused, run_id="r", fuse="narrow")
        assert [s.name for s in res.stages] == ["quality+host_cap+dedup"]
        assert res.stages[0].kind == "global"
        got = sorted(r["url"] for r in
                     spark.read.parquet(res.stages[-1].output_path)
                     .select("url").collect())
        want = sorted(r["url"] for r in
                      _expected(pages).select("url").collect())
        assert got == want
        assert res.rows_out == len(want)

    def test_crash_in_fused_global_unit_reruns_unit_only(
            self, spark, pages, tmp_path):
        stages = [
            PipelineStage("quality", _quality, kind="partition"),
            PipelineStage("host_cap", _cap_hosts, kind="global"),
            PipelineStage("dedup", _exact_dedup, kind="global",
                          fuse_with_previous=True),
        ]
        work = str(tmp_path / "w")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=8)
        # member name addresses the fused unit
        with pytest.raises(RuntimeError, match="dedup"):
            pipe.run(pages, stages, run_id="r", fail_at=("dedup", None),
                     fuse="narrow")
        res = pipe.run(pages, stages, run_id="r", fuse="narrow")
        assert res.stages[0].resumed          # quality committed pre-crash
        assert not res.stages[1].resumed      # fused unit ran now
        assert res.stages[1].name == "host_cap+dedup"
        assert (spark.read.parquet(res.stages[-1].output_path).count()
                == _expected(pages).count())

    def test_max_fuses_everything(self, spark, pages, tmp_path):
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w"),
                                         n_buckets=8)
        res = pipe.run(pages, STAGES, run_id="r", fuse="max")
        assert len(res.stages) == 1
        assert res.stages[0].members == ["quality", "host_cap", "dedup"]
        assert res.rows_out == _expected(pages).count()

    def test_unknown_policy_rejected(self, spark, pages, tmp_path):
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w"))
        with pytest.raises(ValueError, match="fuse policy"):
            pipe.run(pages, STAGES, run_id="r", fuse="eager")

    def test_fused_unit_with_all_rows_dropped(self, spark, pages, tmp_path):
        """The empty-output schema fallback and the AQE observation guard
        both hold for a fused unit containing a persist barrier."""
        stages = [
            PipelineStage("drop_all",
                          lambda d: d.where(F.length("text") < 0),
                          kind="partition"),
            PipelineStage("dedup", _exact_dedup, kind="global",
                          fuse_with_previous=True),
        ]
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w"),
                                         n_buckets=4)
        res = pipe.run(pages, stages, run_id="e", fuse="narrow")
        assert res.stages[0].rows_in > 0 and res.stages[0].rows_out == 0


class TestEmptyOutputObservation:
    """Regression: AQE's empty-relation propagation used to drop the
    CollectMetrics node whenever a wave/stage filtered out EVERY row (an
    empty shuffle feeding the partitioned write), crashing Observation.get
    with 'assertion failed'. preserve_observations scopes that rule out."""

    def test_partition_stage_all_rows_dropped(self, spark, pages, tmp_path):
        from cloud_data_quality_spark.engine.incremental import (
            ResumableQualityRun)
        r = ResumableQualityRun(
            spark, output_path=str(tmp_path / "o"),
            lineage_path=str(tmp_path / "l"), n_buckets=4)
        res = r.run(pages, lambda d: d.where(F.length("text") < 0),
                    run_id="empty")
        assert res.rows_in > 0 and res.rows_kept == 0
        assert sorted(res.processed_partitions) == [0, 1, 2, 3]

    def test_pipeline_with_all_dropping_stage(self, spark, pages, tmp_path):
        pipe = ResumableCurationPipeline(spark, str(tmp_path / "w"),
                                         n_buckets=4)
        stages = [
            PipelineStage("drop_all",
                          lambda d: d.where(F.length("text") < 0),
                          kind="partition"),
            PipelineStage("dedup_empty", _exact_dedup, kind="global"),
        ]
        res = pipe.run(pages, stages, run_id="e1")
        assert res.stages[0].rows_out == 0
        assert res.stages[1].rows_in == 0 and res.stages[1].rows_out == 0

    def test_excluded_rule_is_restored(self, spark, pages, tmp_path):
        from cloud_data_quality_spark.engine.incremental import (
            _AQE_EXCLUDE_KEY, preserve_observations)
        assert spark.conf.get(_AQE_EXCLUDE_KEY, None) is None
        with preserve_observations(spark):
            assert "AQEPropagateEmptyRelation" in \
                spark.conf.get(_AQE_EXCLUDE_KEY)
        assert spark.conf.get(_AQE_EXCLUDE_KEY, None) is None
        spark.conf.set(_AQE_EXCLUDE_KEY, "x.y.SomeRule")
        with preserve_observations(spark):
            v = spark.conf.get(_AQE_EXCLUDE_KEY)
            assert "x.y.SomeRule" in v and "AQEPropagateEmptyRelation" in v
        assert spark.conf.get(_AQE_EXCLUDE_KEY) == "x.y.SomeRule"
        spark.conf.unset(_AQE_EXCLUDE_KEY)


class TestRunIsolationNoStaleRows:
    def test_new_run_never_reads_previous_runs_output(
            self, spark, pages, tmp_path):
        """Regression: stage outputs used to share one directory across
        run_ids; dynamic partition overwrite only replaces the partitions
        the new run writes, so a run whose stage dropped every row would
        silently hand the PREVIOUS run's output to its next stage."""
        work = str(tmp_path / "w")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=4)
        full = [PipelineStage("s", lambda d: d, kind="partition"),
                PipelineStage("dedup", _exact_dedup, kind="global")]
        res_a = pipe.run(pages, full, run_id="a")
        assert res_a.rows_out > 0
        empty = [PipelineStage("s", lambda d: d.where(F.length("text") < 0),
                               kind="partition"),
                 PipelineStage("dedup", _exact_dedup, kind="global")]
        res_b = pipe.run(pages, empty, run_id="b")
        assert res_b.rows_out == 0
        assert res_b.stages[0].output_path != res_a.stages[0].output_path

    def test_resumed_partition_stage_reports_lineage_totals(
            self, spark, pages, tmp_path):
        """Regression: a fully-resumed partition stage used to report
        rows_in/rows_out 0 (no waves ran in this process)."""
        work = str(tmp_path / "w2")
        pipe = ResumableCurationPipeline(spark, work, n_buckets=4)
        stages = [PipelineStage("q", _quality, kind="partition")]
        first = pipe.run(pages, stages, run_id="r")
        again = pipe.run(pages, stages, run_id="r")
        assert again.stages[0].resumed
        assert again.stages[0].rows_in == first.stages[0].rows_in > 0
        assert again.stages[0].rows_out == first.stages[0].rows_out > 0
        assert again.rows_out == first.rows_out
