#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement; everything exploratory lives here).

Modes:
  python bench_extra.py legs [--conf k=v ...] [--sf-dir DIR] [--rows N]
      Isolated per-leg timings (noop-sink where applicable, best-of-3,
      fresh session) for the suite's heavy legs, with arbitrary Spark conf
      overrides — the A/B harness used to justify session-default changes.
  python bench_extra.py batch
      Pure-Python per-core throughput of the Arrow batch kernels
      (quality/classifier/dsir/scrub) at the session's Arrow batch size.

Results are quoted in OPTIMIZATION_r07.md; this file is NOT part of the
driver's timed contract.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
import uuid
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
PAGES_CACHE = "/tmp/cdq_pages_cache"


def _pages(spark, n_rows=100_000, seed=42):
    from cloud_data_quality_spark.sources.pages import write_pages_parquet
    path = f"{PAGES_CACHE}/pages_{seed}_{n_rows}.parquet"
    if not (Path(path) / "_SUCCESS").exists():
        write_pages_parquet(spark, path, n_rows=n_rows, seed=seed)
    return spark.read.parquet(path)


def _best(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def run_legs(conf_overrides: dict[str, str], sf_dir: str,
             n_rows: int) -> dict:
    import pyspark.sql.functions as F

    from cloud_data_quality_spark.sources.session import get_spark
    spark = get_spark(app_name="bench_extra", master="local[32]",
                      extra_conf=conf_overrides)
    sc = spark.sparkContext
    pages = _pages(spark, n_rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out: dict = {"conf": conf_overrides, "rows": n_rows}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    from cloud_data_quality_spark.operators.quality_filter import (
        annotate_quality, annotate_quality_arrow)
    sc.setJobDescription("quality_filter (noop)")
    out["quality_filter"] = _best(
        lambda: annotate_quality_arrow(pages, with_perplexity=True)
        .where(F.col("keep")).count())
    sc.setJobDescription("scrub (sum length)")
    out["scrub"] = _best(
        lambda: annotate_quality(pages, with_perplexity=False,
                                 with_scrub=True)
        .agg(F.sum(F.length("scrubbed_text"))).collect())
    sc.setJobDescription("minhash cold (fresh persist)")
    from cloud_data_quality_spark.functions.dedup import minhash_lsh_pairs

    def minhash_cold():
        res = minhash_lsh_pairs(docs, jaccard_threshold=0.5,
                                broadcast_verify=True)
        res.count()
        spark.catalog.clearCache()
    out["minhash_cold"] = _best(minhash_cold)
    sc.setJobDescription("semantic_dedup_np")
    from cloud_data_quality_spark.functions.ivf_artifact import (
        IVF_CENTROIDS_64)
    from cloud_data_quality_spark.functions.similarity import (
        semantic_dedup_np)
    out["semantic_dedup"] = _best(
        lambda: noop(semantic_dedup_np(emb, IVF_CENTROIDS_64, 0.92)))
    sc.setJobDescription("resumable_filter_write")

    def resumable():
        from cloud_data_quality_spark.engine.incremental import (
            ResumableQualityRun)
        work = f"{PAGES_CACHE}/resx"
        shutil.rmtree(work, ignore_errors=True)
        runner = ResumableQualityRun(
            spark, output_path=f"{work}/out",
            lineage_path=f"{work}/lineage", n_buckets=16)
        runner.run(pages,
                   lambda d: annotate_quality_arrow(d).where("keep"),
                   run_id=uuid.uuid4().hex)
    out["resumable_write"] = _best(resumable)
    sc.setJobDescription("span_dedup")
    from cloud_data_quality_spark.functions.corpus import span_dedup
    out["span_dedup"] = _best(
        lambda: span_dedup(pages.where(F.col("text").isNotNull()),
                           text_col="text", id_col="url", delimiter="\n")
        .agg(F.sum("n_spans_kept")).collect())
    spark.stop()
    return out


def run_batch() -> dict:
    import numpy as np

    from cloud_data_quality_spark.functions.classifier import (
        classifier_scores_batch)
    from cloud_data_quality_spark.functions.dsir import dsir_scores_batch
    from cloud_data_quality_spark.functions.webtext_rules import (
        quality_annotations_batch, scrub_batch)
    from cloud_data_quality_spark.sources.pages import generate_rows
    texts = generate_rows(np.arange(0, 20_000), seed=42)["text"]
    chunk = 4096
    out = {}
    for name, fn in [
            ("quality", lambda c: quality_annotations_batch(
                c, with_perplexity=True)),
            ("classifier", classifier_scores_batch),
            ("dsir", dsir_scores_batch),
            ("scrub", scrub_batch)]:
        fn(texts.head(256))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(0, len(texts), chunk):
                fn(texts.iloc[i:i + chunk])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec_20k": round(best, 3),
                     "docs_per_sec_core": round(len(texts) / best)}
    return out


def main() -> None:
    args = sys.argv[1:]
    mode = args[0] if args else "legs"
    if mode == "batch":
        print(json.dumps(run_batch(), indent=1))
        return
    conf: dict[str, str] = {}
    sf_dir, n_rows = SF_DIR, 100_000
    it = iter(args[1:])
    for a in it:
        if a == "--conf":
            k, _, v = next(it).partition("=")
            conf[k] = v
        elif a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--rows":
            n_rows = int(next(it))
    print(json.dumps(run_legs(conf, sf_dir, n_rows), indent=1))


if __name__ == "__main__":
    main()
