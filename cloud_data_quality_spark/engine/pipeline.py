"""Composed resumable curation pipeline: extract → filter → curate → dedup
→ pack as ONE restartable run.

The north rule asks for a killed run to "resume from checkpoint with
per-partition lineage"; engine/incremental.py provides that for a single
transform. Real corpus builds are multi-STAGE — each stage a different
operator family with different resume semantics:

* ``partition`` stages (extract, quality filter, scrub, per-doc scoring,
  packing within buckets) are embarrassingly partition-parallel →
  partition-granular resume via ResumableQualityRun, one lineage row per
  bucket.
* ``global`` stages (cross-partition exact/near dedup, per-host caps) need
  the whole input in one plan → stage-granular resume (the stage either
  committed or reruns; its write is an idempotent overwrite).

Composition contract:
* every execution UNIT (a stage, or a fused group of stages — see
  ``run(fuse=...)``) MATERIALIZES its output as parquet under
  ``{work_dir}/{idx:02d}_{name}/out`` — the explicit unit boundary is what
  makes resume possible AND caps lineage recomputation: a 5-stage pipeline
  over 100 TB never re-runs a finished unit's compute, it re-reads its
  (column-pruned, partition-pruned) output. Adjacent narrow zero-shuffle
  stages do NOT deserve a boundary each — a parquet write+read per trivial
  Column rewrite is pure I/O tax at any scale — so ``fuse='narrow'`` merges
  partition-stage chains (keeping wave resume), and
  ``PipelineStage(fuse_with_previous=True)`` lets the author fold a stage
  whose recompute is provably cheaper than its materialization into the
  preceding unit;
* stage i>0 reads stage i-1's committed output. Partition stages keep the
  ``part_key`` column through their write (``partitionBy("part_key")``), so
  the NEXT partition stage uses ``partition_expr="part_key"`` — aligned
  with the physical directory layout, meaning a resumed wave's ``.isin``
  filter lands in the scan's PartitionFilters and prunes files, not rows
  (the same plan-pinned property as test_quality_filter.TestResume);
* a stage's completion is recorded in the shared pipeline lineage
  (``{work_dir}/lineage``) as one row per partition (partition stages) or
  one row with ``part_key = -1`` (global stages). Resume consults lineage
  only — never output-directory existence, which a half-written stage also
  has.

Reference basis: CloudDQ's resumability is a high-watermark + MERGE
idempotency on dq_run_id (clouddq/lib.py:274-306, dq_summary.sql:15-26);
this module is the north-star generalization to multi-stage corpus builds.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Literal, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from cloud_data_quality_spark.engine.incremental import (
    LINEAGE_SCHEMA,
    ResumableQualityRun,
    preserve_observations,
)
from cloud_data_quality_spark.engine.sinks import _hadoop_path_exists

GLOBAL_PART_KEY = -1


@dataclass
class PipelineStage:
    """One stage of the composed pipeline.

    kind='partition': transform is applied per bucket wave (it must be
    per-partition closed — no cross-partition joins on the corpus itself;
    joins against OTHER tables, Arrow stages, filters are all fine).
    kind='global': transform sees the full stage input in one plan.

    fuse_with_previous=True folds this stage into the PREVIOUS execution
    unit regardless of the pipeline's fuse policy — the author's statement
    that this stage's recompute is cheaper than a parquet materialization
    boundary (e.g. two adjacent cheap hygiene shuffles, or packing right
    after selection). A fused stage loses its own resume point: a crash
    inside the unit reruns the whole unit.
    """
    name: str
    transform: Callable[[DataFrame], DataFrame]
    kind: Literal["partition", "global"] = "partition"
    fuse_with_previous: bool = False


@dataclass
class StageResult:
    name: str
    kind: str
    output_path: str
    rows_in: int
    rows_out: int
    resumed: bool  # True if the whole stage was already committed
    seconds: float = 0.0  # wall time of this stage in THIS run (~0 if resumed)
    members: list[str] = field(default_factory=list)  # fused stage names


@dataclass
class PipelineResult:
    run_id: str
    stages: list[StageResult] = field(default_factory=list)

    @property
    def rows_out(self) -> int:
        return self.stages[-1].rows_out if self.stages else 0


class ResumableCurationPipeline:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        n_buckets: int = 16,
        partitions_per_commit: int | None = None,
        id_col: str = "url",
    ):
        self.spark = spark
        self.work_dir = work_dir.rstrip("/")
        self.n_buckets = n_buckets
        self.partitions_per_commit = partitions_per_commit
        self.id_col = id_col
        self.lineage_path = f"{self.work_dir}/lineage"

    # ---------- lineage ----------

    def _lineage(self):
        if not _hadoop_path_exists(self.spark, self.lineage_path):
            return None
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_path)

    def _stage_run_id(self, run_id: str, idx: int, name: str) -> str:
        return f"{run_id}/{idx:02d}_{name}"

    def _mark_stage(self, stage_run_id: str, n_in: int, n_out: int) -> None:
        self.spark.createDataFrame(
            [(stage_run_id, GLOBAL_PART_KEY, "stage_committed",
              n_in, n_out, time.time())],
            schema=LINEAGE_SCHEMA,
        ).write.mode("append").parquet(self.lineage_path)

    # ---------- stage execution ----------

    def _stage_paths(self, run_id: str, idx: int, name: str) -> str:
        # run_id in the path: stage outputs from DIFFERENT runs must never
        # share a directory — dynamic partition overwrite only replaces the
        # partitions the new run writes, so a shared dir would leak a
        # previous run's rows into any bucket the new run leaves empty
        return f"{self.work_dir}/{run_id}/{idx:02d}_{name}"

    def _stage_totals(self, stage_run_id: str) -> tuple[int, int]:
        """Whole-stage (n_in, n_kept) summed over committed lineage rows —
        correct on resume, when the current process ran zero waves."""
        lineage = self._lineage()
        if lineage is None:
            return 0, 0
        row = (lineage.where((F.col("run_id") == stage_run_id)
                             & (F.col("status") == "committed"))
               .agg(F.coalesce(F.sum("n_in"), F.lit(0)).alias("i"),
                    F.coalesce(F.sum("n_kept"), F.lit(0)).alias("k"))
               .collect()[0])
        return row["i"], row["k"]

    def _run_partition_stage(
        self, df: DataFrame, stage: PipelineStage, idx: int, run_id: str,
        fail_at_partition: int | None,
    ) -> StageResult:
        base = self._stage_paths(run_id, idx, stage.name)
        # the first stage buckets by id hash; any stage whose input already
        # carries part_key (a previous stage's partitioned output) reuses it
        # → wave filters prune the upstream output PHYSICALLY
        expr = "part_key" if "part_key" in df.columns else \
            f"pmod(xxhash64({self.id_col}), {self.n_buckets})"
        runner = ResumableQualityRun(
            self.spark,
            output_path=f"{base}/out",
            lineage_path=self.lineage_path,
            n_buckets=self.n_buckets,
            partition_expr=expr,
            partitions_per_commit=self.partitions_per_commit,
        )
        stage_run_id = self._stage_run_id(run_id, idx, stage.name)
        already = runner.committed_partitions(stage_run_id)
        runner.run(df, stage.transform, run_id=stage_run_id,
                   fail_at_partition=fail_at_partition)
        # report lineage totals, not this process's delta — a resumed stage
        # would otherwise claim rows_in/rows_out 0
        n_in, n_kept = self._stage_totals(stage_run_id)
        return StageResult(
            name=stage.name, kind="partition", output_path=f"{base}/out",
            rows_in=n_in, rows_out=n_kept,
            resumed=len(already) == self.n_buckets)

    def _run_global_stage(
        self, df: DataFrame, stage: PipelineStage, idx: int, run_id: str,
    ) -> StageResult:
        base = self._stage_paths(run_id, idx, stage.name)
        out_path = f"{base}/out"
        stage_run_id = self._stage_run_id(run_id, idx, stage.name)
        lineage = self._lineage()
        if lineage is not None:
            prior = (lineage.where((F.col("run_id") == stage_run_id)
                                   & (F.col("status") == "stage_committed"))
                     .select("n_in", "n_kept").limit(1).collect())
            if prior:
                return StageResult(stage.name, "global", out_path,
                                   rows_in=prior[0]["n_in"],
                                   rows_out=prior[0]["n_kept"], resumed=True)
        obs_in, obs_out = Observation(), Observation()
        keyed = df.observe(obs_in, F.count(F.lit(1)).alias("n"))
        # the transform CALL must sit inside preserve_observations too: a
        # transform with eager internal jobs (selection's prefix-sum pass,
        # a checkpoint) executes the observed input subtree right there —
        # on an empty corpus AQE would drop the CollectMetrics during
        # those jobs, long before the guarded write
        with preserve_observations(self.spark):
            out = stage.transform(keyed).observe(
                obs_out, F.count(F.lit(1)).alias("n"))
            writer_df = out
            if "part_key" in out.columns:
                # cluster rows by bucket before the partitioned write —
                # same rationale as ResumableQualityRun's compact_output:
                # without it every write task opens a file in every bucket
                # dir (tasks × buckets small files that tax every
                # downstream stage read) and the dynamic-partition writer
                # sorts each task's rows by part_key first
                writer_df = out.repartition(self.n_buckets, "part_key")
            writer = writer_df.write.mode("overwrite")
            if "part_key" in out.columns:
                writer = writer.partitionBy("part_key")
            writer.parquet(out_path)
            n_in, n_out = obs_in.get["n"], obs_out.get["n"]
        self._mark_stage(stage_run_id, n_in, n_out)
        return StageResult(stage.name, "global", out_path, n_in, n_out,
                           resumed=False)

    def _stage_output_frame(self, stage: PipelineStage, input_df: DataFrame,
                            output_path: str) -> DataFrame:
        """Stage output for the next stage. A stage that dropped EVERY row
        wrote no parquet files (dynamic partition overwrite writes nothing;
        a plain empty write leaves only _SUCCESS), so schema inference
        fails — reconstruct an empty frame from the transform's ANALYZED
        schema instead (pure plan analysis, no execution)."""
        from pyspark.errors import AnalysisException
        try:
            return self.spark.read.parquet(output_path)
        except AnalysisException:
            probe = input_df
            if stage.kind == "partition" and "part_key" not in probe.columns:
                probe = probe.withColumn("part_key", F.lit(0).cast("int"))
            return self.spark.createDataFrame(
                [], stage.transform(probe).schema)

    # ---------- fusion ----------

    @staticmethod
    def _fuse_units(
        stages: Sequence[PipelineStage], fuse: str,
    ) -> list[list[PipelineStage]]:
        """Group stages into execution units (each unit = one lineage
        entry + one materialization).

        fuse='none':   every stage is its own unit (classic behavior).
        fuse='narrow': maximal runs of consecutive PARTITION stages merge
                       into one partition-kind unit — adjacent narrow
                       zero-shuffle rewrites share a single codegen'd plan
                       and a single parquet write, and the fused unit KEEPS
                       partition-granular wave resume.
        fuse='max':    the whole pipeline is one unit (resume = rerun;
                       for corpora where recompute beats any journaling).

        A stage with fuse_with_previous=True joins the preceding unit in
        every mode except when it is the first stage.
        """
        if fuse not in ("none", "narrow", "max"):
            raise ValueError(f"unknown fuse policy {fuse!r}")
        units: list[list[PipelineStage]] = []
        for s in stages:
            join = bool(units) and (
                fuse == "max"
                or s.fuse_with_previous
                or (fuse == "narrow" and s.kind == "partition"
                    and all(m.kind == "partition" for m in units[-1])))
            if join:
                units[-1].append(s)
            else:
                units.append([s])
        return units

    def _unit_stage(
        self, members: list[PipelineStage],
    ) -> tuple[PipelineStage, list[DataFrame]]:
        """One PipelineStage representing a fused unit. The composed
        transform inserts ONE persist(MEMORY_AND_DISK) barrier: between
        the narrow (partition-kind) prefix and the first global member.
        Global transforms routinely scan their input more than once
        (span-dedup's join-back, dedup's survivor semi-join), and a narrow
        prefix — often an Arrow UDF chain with no Exchange — would execute
        once per scan without the barrier. Between GLOBAL members no
        barrier is needed: a global member's output subtree contains an
        Exchange, and Catalyst's ReusedExchange dedups repeated scans of
        an identical shuffle within the unit's one write job. persist (not
        localCheckpoint) keeps the lineage: an executor loss recomputes
        the lost blocks instead of failing the unit. The pinned frames are
        returned for unpersist after the unit's write."""
        if len(members) == 1:
            return members[0], []
        from pyspark import StorageLevel
        pinned: list[DataFrame] = []

        def composed(d: DataFrame) -> DataFrame:
            out = d
            for i, m in enumerate(members):
                if (m.kind == "global" and i > 0 and not pinned
                        and all(p.kind == "partition" for p in members[:i])):
                    out = out.persist(StorageLevel.MEMORY_AND_DISK)
                    pinned.append(out)
                out = m.transform(out)
            return out

        kind = ("partition"
                if all(m.kind == "partition" for m in members) else "global")
        name = "+".join(m.name for m in members)
        return PipelineStage(name, composed, kind=kind), pinned

    # ---------- pipeline ----------

    def run(
        self,
        df: DataFrame,
        stages: Sequence[PipelineStage],
        run_id: str,
        fail_at: tuple[str, int | None] | None = None,  # test crash hook
        fuse: str = "none",
    ) -> PipelineResult:
        """Execute (or resume) the staged pipeline. ``fail_at=(stage_name,
        partition|None)`` simulates a crash inside that stage — partition
        stages crash before the given bucket, global stages crash before
        their commit mark; naming a FUSED member crashes its whole unit.
        ``fuse`` picks the stage-fusion policy (see _fuse_units); resume
        keys include the fused unit name, so a run must be resumed under
        the same fuse configuration it started with."""
        if not stages:
            raise ValueError("pipeline needs at least one stage")
        names = [s.name for s in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        result = PipelineResult(run_id=run_id)
        current = df
        for idx, members in enumerate(self._fuse_units(stages, fuse)):
            stage, pinned = self._unit_stage(members)
            member_names = [m.name for m in members]
            crash_here = fail_at is not None and fail_at[0] in member_names
            t0 = time.perf_counter()
            try:
                if stage.kind == "partition":
                    res = self._run_partition_stage(
                        current, stage, idx, run_id,
                        fail_at_partition=fail_at[1] if crash_here else None)
                elif stage.kind == "global":
                    if crash_here:
                        raise RuntimeError(
                            f"simulated crash in global stage "
                            f"{fail_at[0]!r} (unit {stage.name!r})")
                    res = self._run_global_stage(current, stage, idx, run_id)
                else:
                    raise ValueError(f"unknown stage kind {stage.kind!r}")
            finally:
                for f in pinned:
                    f.unpersist()
                pinned.clear()
            res.seconds = round(time.perf_counter() - t0, 3)
            res.members = member_names
            result.stages.append(res)
            current = self._stage_output_frame(stage, current, res.output_path)
        return result
