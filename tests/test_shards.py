"""Shard writer: order-preserving output shards + manifest, crash/resume,
byte-stable re-runs."""

from __future__ import annotations

import glob
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cloud_data_quality_spark.functions.selection import global_enumerate
from cloud_data_quality_spark.functions.shards import (
    shard_manifest_frame,
    write_shards,
)

N_DOCS = 1000
PER_SHARD = 128  # 8 shards: 7 full + 1 ragged tail


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(f"u{i:05d}", f"doc body {i} " * 3) for i in range(N_DOCS)]
    df = spark.createDataFrame(rows, "url string, text string")
    return global_enumerate(df, ["url"]).localCheckpoint()


class TestWriteShards:
    def test_layout_order_and_manifest(self, spark, corpus, tmp_path):
        out = str(tmp_path / "s")
        manifest = write_shards(corpus, out, PER_SHARD)
        rows = {r["shard_id"]: r for r in manifest.collect()}
        assert sorted(rows) == list(range(8))
        for sid, r in rows.items():
            lo, hi = sid * PER_SHARD + 1, min((sid + 1) * PER_SHARD, N_DOCS)
            assert (r["pos_min"], r["pos_max"]) == (lo, hi)
            assert r["n_rows"] == hi - lo + 1
            assert r["bytes"] > 0
            files = glob.glob(f"{out}/data/shard_id={sid}/*.parquet")
            assert len(files) == 1, f"shard {sid} must be ONE file"
            # order preserved inside the file
            pos = [x["position"] for x in
                   spark.read.parquet(files[0]).select("position").collect()]
            assert pos == list(range(lo, hi + 1))
        # manifest checksum equals the pure-data restatement
        pure = {r["shard_id"]: r["checksum"] for r in
                shard_manifest_frame(corpus, PER_SHARD).collect()}
        assert {s: r["checksum"] for s, r in rows.items()} == pure

    def test_resume_skips_committed_and_heals_partials(
            self, spark, corpus, tmp_path):
        out = str(tmp_path / "s2")
        first = write_shards(corpus, out, PER_SHARD)
        want = {(r["shard_id"], r["checksum"], r["n_rows"])
                for r in first.collect()}
        # simulate a crash AFTER shards 0-3 committed: drop manifest rows
        # for shards 4+, corrupt shard 5's data (half-written file), and
        # delete shard 6 entirely
        kept = spark.read.parquet(f"{out}/manifest") \
            .where("shard_id <= 3").localCheckpoint()
        shutil.rmtree(f"{out}/manifest")
        kept.write.parquet(f"{out}/manifest")
        f5 = glob.glob(f"{out}/data/shard_id=5/*.parquet")[0]
        Path(f5).write_bytes(b"torn write")
        shutil.rmtree(f"{out}/data/shard_id=6")
        # track committed shard files: resume must NOT rewrite them
        f0 = glob.glob(f"{out}/data/shard_id=0/*.parquet")[0]
        f0_mtime = Path(f0).stat().st_mtime_ns

        again = write_shards(corpus, out, PER_SHARD)
        assert ({(r["shard_id"], r["checksum"], r["n_rows"])
                 for r in again.collect()} == want)
        assert Path(f0).stat().st_mtime_ns == f0_mtime  # untouched
        # healed shards readable and ordered
        for sid in (5, 6):
            files = glob.glob(f"{out}/data/shard_id={sid}/*.parquet")
            assert len(files) == 1
            got = spark.read.parquet(files[0]).count()
            assert got == PER_SHARD

    def test_rerun_complete_set_is_noop(self, spark, corpus, tmp_path):
        out = str(tmp_path / "s3")
        write_shards(corpus, out, PER_SHARD)
        files_before = sorted(glob.glob(f"{out}/data/*/*.parquet"))
        mtimes = [Path(f).stat().st_mtime_ns for f in files_before]
        manifest = write_shards(corpus, out, PER_SHARD)
        assert manifest.count() == 8
        files_after = sorted(glob.glob(f"{out}/data/*/*.parquet"))
        assert files_before == files_after
        assert [Path(f).stat().st_mtime_ns for f in files_after] == mtimes

    def test_byte_stable_rerun(self, spark, corpus, tmp_path):
        """Two independent writes of the same enumerated corpus produce
        byte-identical shard files (deterministic order + codec)."""
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_shards(corpus, a, PER_SHARD)
        write_shards(corpus, b, PER_SHARD)
        for sid in range(8):
            fa = glob.glob(f"{a}/data/shard_id={sid}/*.parquet")[0]
            fb = glob.glob(f"{b}/data/shard_id={sid}/*.parquet")[0]
            assert Path(fa).read_bytes() == Path(fb).read_bytes(), sid

    def test_partitioning_invariant_manifest(self, spark, corpus):
        """Checksums depend only on (position, id, text) — not on input
        partitioning."""
        a = shard_manifest_frame(corpus, PER_SHARD).collect()
        b = shard_manifest_frame(corpus.repartition(17), PER_SHARD).collect()
        key = lambda r: r["shard_id"]  # noqa: E731
        assert sorted(map(tuple, a), key=lambda t: t[0]) == \
            sorted(map(tuple, b), key=lambda t: t[0])

    def test_bad_docs_per_shard_rejected(self, spark, corpus):
        with pytest.raises(ValueError, match="docs_per_shard"):
            shard_manifest_frame(corpus, 0)
