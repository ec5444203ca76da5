"""End-to-end spark-submit deployment: the north rule's run shape is
`spark-submit --py-files cdq_spark.zip ... cli.py quality-filter ...` on a
cluster; this drives exactly that, with the package imported from the zip
artifact (not the repo), in a fresh JVM."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or str(
    Path(sys.executable).parent / "spark-submit")


@pytest.mark.skipif(not (shutil.which("spark-submit")
                         or Path(SPARK_SUBMIT).exists()),
                    reason="spark-submit not on PATH")
def test_quality_filter_via_spark_submit(spark, tmp_path, pages_parquet):
    from cloud_data_quality_spark.package import build_zip

    zip_path = build_zip(str(tmp_path / "cdq_spark.zip"))
    out, lineage = str(tmp_path / "kept"), str(tmp_path / "lineage")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    # cwd=tmp_path so the repo checkout is NOT importable — imports must
    # resolve through the shipped zip
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         str(REPO / "cloud_data_quality_spark" / "cli.py"),
         "quality-filter", "--input", pages_parquet,
         "--output", out, "--lineage", lineage,
         "--run-id", "submit-e2e", "--buckets", "4"],
        capture_output=True, text=True, timeout=480, cwd=str(tmp_path),
        env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    stats = json.loads([ln for ln in res.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["run_id"] == "submit-e2e"
    assert stats["processed_partitions"] == 4
    assert stats["rows_kept"] > 0

    kept = spark.read.parquet(out)
    assert kept.count() == stats["rows_kept"]
    lin = spark.read.parquet(lineage)
    assert lin.count() == 4  # one lineage row per bucket, single-scan wave
