"""Build the --py-files artifact for spark-submit deployment.

North-rule deployment shape: `spark-submit --py-files cdq_spark.zip
cloud_data_quality_spark/cli.py ...` on a multi-executor cluster. This
module produces that zip — the package source only, no tests/configs — so
executors can import cloud_data_quality_spark.* without a cluster-wide pip
install (the reference ships itself the same way: a self-contained artifact
submitted per job, clouddq/integration/clouddq_pyspark_driver.py).

Usage:
    python -m cloud_data_quality_spark.package [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path


def build_zip(out_path: str = "cdq_spark.zip") -> str:
    pkg_root = Path(__file__).resolve().parent
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_root.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, arcname=str(Path(pkg_root.name)
                                     / py.relative_to(pkg_root)))
    return out_path


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "cdq_spark.zip"))
