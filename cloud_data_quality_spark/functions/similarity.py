"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (SURVEY-mandated training-pipeline component, no CloudDQ
equivalent):

* brute_force_topk — exact cosine top-k per probe. The probe set is small by
  construction (queries), so it broadcasts; the corpus streams through one
  narrow pass. Correctness baseline + oracle-comparable.
* lsh_bucketed_neighbors — random-hyperplane LSH: sign-bit signature over h
  fixed deterministic hyperplanes → bucket; only same-bucket candidates are
  scored. The scale path: at 10^9 vectors the bucket join shuffles uniformly
  distributed signature keys, candidate scoring is bucket-local. Recall is
  tunable via n_planes/n_tables (tested vs the brute-force baseline).

Hyperplanes are generated from a seeded PCG64 — deterministic across runs and
cluster sizes, broadcast to executors as a plain literal array column (a few
KB; no SparkContext.broadcast ceremony needed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud_data_quality_spark.functions.dedup import cosine

#: Default ceiling on probe-set size for the entry points that collect or
#: broadcast the probes. 10^4 probes × a few-hundred-dim float64 is a few
#: tens of MB — comfortably closure/broadcast-sized; a corpus-sized probe
#: frame would OOM the driver instead of erroring.
MAX_PROBES = 10_000


def _guard_probes(probes: DataFrame, operator: str,
                  max_probes: int | None) -> DataFrame:
    """Fail fast when a probe frame is too large to collect/broadcast —
    same contract as dedup.guard_exact_baseline: bounded limit+count probe
    (never a full count), None disables, and the error names the scale
    path (lsh_bucketed_neighbors — probes are bucketed like the corpus,
    nothing is collected)."""
    if max_probes is None:
        return probes
    n = probes.limit(max_probes + 1).count()
    if n > max_probes:
        raise ValueError(
            f"{operator} collects/broadcasts the probe set; input exceeds "
            f"max_probes={max_probes}. Use lsh_bucketed_neighbors for "
            f"corpus-sized probe sets, or pass max_probes=None to force.")
    return probes


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    max_probes: int | None = MAX_PROBES,
) -> DataFrame:
    """Exact top-k by cosine per probe: broadcast the probes, score the corpus
    in one pass, take k per probe with a rank window partitioned by probe
    (bounded partitions: one per probe, each corpus-sized scores but the
    window only sorts within probe groups — acceptable for probe counts in
    the thousands; for probe~corpus use lsh_bucketed_neighbors)."""
    probes = _guard_probes(probes, "brute_force_topk", max_probes)
    p = probes.select(F.col(probe_id_col).alias("probe_id"),
                      F.col(vec_col).alias("pv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(p))
              .where(F.col("neighbor_id") != F.col("probe_id"))
              .select("probe_id", "neighbor_id",
                      cosine(F.col("pv"), F.col("cv")).alias("cos")))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "rank",
                    F.round("cos", 6).alias("cosine")))


def brute_force_topk_np(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    max_probes: int | None = MAX_PROBES,
) -> DataFrame:
    """Exact cosine top-k, BLAS path: probes collected (small by contract)
    and shipped in the task closure; each corpus Arrow batch is scored as ONE
    matrix product (batch×dim @ dim×probes), per-batch top-k candidates
    (ties at the kth score kept) flow to a tiny global rank window. Same
    results as brute_force_topk — asserted element-wise in pytest — at a
    fraction of the cost: the JVM path evaluates three higher-order array
    folds per (row, probe) pair, this does one dgemm per batch.

    Scale posture: identical to the JVM path (one corpus pass, probe set
    broadcast via closure, no shuffle before the k·|probes|-row window)."""
    probes = _guard_probes(probes, "brute_force_topk_np", max_probes)
    pr = probes.select(F.col(probe_id_col), F.col(vec_col)).collect()
    pids = np.array([r[0] for r in pr], dtype=np.int64)
    P = np.array([list(r[1]) for r in pr], dtype=np.float64)
    Pn = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-300)

    def score(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            C = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                                1e-300)
            S = Cn @ Pn.T                      # (batch, probes)
            out_p, out_n, out_c = [], [], []
            for j in range(len(pids)):
                col = S[:, j].copy()
                col[ids == pids[j]] = -np.inf  # exclude self
                kk = min(k, n)
                kth = np.partition(col, -kk)[-kk]
                take = np.flatnonzero(col >= kth)  # ties at kth kept
                out_p.append(np.full(len(take), pids[j], dtype=np.int64))
                out_n.append(ids[take])
                out_c.append(col[take])
            yield pd.DataFrame({
                "probe_id": np.concatenate(out_p),
                "neighbor_id": np.concatenate(out_n),
                "cos": np.concatenate(out_c),
            })

    cand = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema="probe_id bigint, neighbor_id bigint, cos double")
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "rank",
                    F.round("cos", 6).alias("cosine")))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit LSH signature as a compact string key."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    bits = []
    for p in planes:
        lits = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(vd, lits, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def embedding_lsh_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate PAIRS by cosine ≥ threshold — the scale path for
    dedup.embedding_cosine_pairs (which is O(n²)). Random-hyperplane buckets
    per table; docs sharing any bucket are candidates; exact cosine verifies.
    With p = 1 - θ/π per plane, P(candidate | cos=θ) = 1-(1-p^planes)^tables
    — high-threshold pairs are caught with near-certainty, and the bucket
    join shuffles uniform signature keys (no skew). Output schema matches
    embedding_cosine_pairs for recall measurement."""
    tables = [(t, _hyperplanes(dim, n_planes, seed + t)) for t in range(n_tables)]
    sigs = F.array(*[
        F.concat(F.lit(f"t{t}:"), _signature(F.col(vec_col), planes))
        for t, planes in tables
    ])
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     F.explode(sigs).alias("bucket"))
    cand = (base.alias("a").join(base.alias("b"), "bucket")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
            .dropDuplicates(["id_a", "id_b"]))
    scored = cand.select("id_a", "id_b",
                         F.round(cosine(F.col("va"), F.col("vb")), 6)
                          .alias("cosine"))
    return scored.where(F.col("cosine") >= threshold)


def lsh_bucketed_neighbors(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """ANN: score only candidates sharing an LSH bucket with the probe in any
    of n_tables signature tables. Output schema matches brute_force_topk so
    recall can be measured by direct comparison."""
    tables = [(t, _hyperplanes(dim, n_planes, seed + t)) for t in range(n_tables)]

    def bucketize(df: DataFrame, idc: str) -> DataFrame:
        sigs = F.array(*[
            F.concat(F.lit(f"t{t}:"), _signature(F.col(vec_col), planes))
            for t, planes in tables
        ])
        return df.select(F.col(idc), F.col(vec_col),
                         F.explode(sigs).alias("bucket"))

    cb = bucketize(corpus, id_col).withColumnRenamed(id_col, "neighbor_id") \
                                  .withColumnRenamed(vec_col, "cv")
    pb = bucketize(probes, probe_id_col).withColumnRenamed(probe_id_col, "probe_id") \
                                        .withColumnRenamed(vec_col, "pv")
    cand = (cb.join(pb, "bucket")
            .where(F.col("neighbor_id") != F.col("probe_id"))
            .select("probe_id", "neighbor_id", "pv", "cv")
            .dropDuplicates(["probe_id", "neighbor_id"]))
    scored = cand.select("probe_id", "neighbor_id",
                         cosine(F.col("pv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "rank",
                    F.round("cos", 6).alias("cosine")))


# ------------------------------------------------------------------- IVF

def kmeans_centroids(vectors: np.ndarray, n_centroids: int,
                     n_iter: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer, trained
    OFFLINE on a bounded sample (production IVF ships the trained centroids
    to executors as an artifact — the north rule's 'broadcast model
    artifacts' pattern; at 10^12 vectors you train on ~10^5 sampled rows,
    never the corpus). Seeded init, fixed iteration count, empty clusters
    keep their previous centroid — bit-reproducible for a given input."""
    X = np.asarray(vectors, dtype=np.float64)
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(len(X), n_centroids, replace=False)].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _cell_scores(vec: Column, centroids: np.ndarray) -> Column:
    """Array of (squared-distance-score, cell-index) structs, one per
    centroid: score_i = |c_i|² − 2·v·c_i (the |v|² term is constant across
    cells, so argmin is unchanged). Dot products are the same left-to-right
    JVM fold as the LSH signatures — bit-identical to the oracle's
    list_dot_product."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    entries = []
    for i, c in enumerate(centroids):
        lits = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(F.zip_with(vd, lits, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        c2 = float(np.dot(c, c))  # python-float dot of CONSTANTS: exact in
        # both engines because it is evaluated once here and embedded as a
        # literal, never recomputed
        entries.append(F.struct((F.lit(c2) - 2.0 * dot).alias("d"),
                                F.lit(i).alias("i")))
    return F.array(*entries)


def ivf_assign(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid cell id; ties broken by smallest index (struct min
    compares d first, then i — deterministic with no epsilon games)."""
    return F.array_min(_cell_scores(vec, centroids))["i"]


def ivf_assign_np_exact(X: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Bit-exact numpy twin of the ivf_assign JVM expression, vectorized
    across rows instead of across dims: per centroid the dot is a
    0.0-seeded LEFT-TO-RIGHT fold (acc += x_j * c_j — the identical IEEE
    op sequence as F.aggregate's ((0.0 + p0) + p1) + …), the score is the
    same `c2 − 2.0·dot` with c2 the same plan-time float(np.dot(c, c))
    literal, and the strict-less scan keeps the smallest index on exact
    ties like array_min's (d, i) struct ordering. NaN scores never win a
    strict-less compare, matching Java's NaN-sorts-last double ordering;
    a row whose every score is NaN lands in cell 0 on both paths.

    X must be float64 (cast from the stored float32 exactly like the
    JVM's element cast). ~30× the interpreted per-row fold at 64×64."""
    n = X.shape[0]
    best = np.full(n, np.inf)
    cell = np.zeros(n, dtype=np.int32)
    for i, c in enumerate(np.asarray(centroids)):
        dot = np.zeros(n)
        for j in range(X.shape[1]):
            dot += X[:, j] * float(c[j])
        d = float(np.dot(c, c)) - 2.0 * dot
        take = d < best
        if take.any():
            cell[take] = i
            best[take] = d[take]
    return cell


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    max_probes: int | None = MAX_PROBES,
) -> DataFrame:
    """IVF ANN: corpus vectors are bucketed by nearest centroid (the
    inverted file); each probe searches only its n_probe nearest cells.
    Approximate w.r.t. brute force (recall grows with n_probe — pytest
    measures it) but fully deterministic given the centroid artifact, so
    every emitted (probe, neighbor, cosine) is exactly oracle-checkable —
    the same determinism contract as lsh_bucketed_neighbors.

    Scale shape: assignment is a narrow pass (centroid literals live in the
    plan, broadcast with the task closure); the candidate join keys on cell
    id — cells are balanced by construction of k-means on a representative
    sample — and scoring is cell-local. Output schema matches
    brute_force_topk."""
    probes = _guard_probes(probes, "ivf_topk", max_probes)
    cells = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"),
                          ivf_assign(F.col(vec_col), centroids).alias("cell"))
    probe_cells = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
        F.explode(F.transform(
            F.slice(F.array_sort(_cell_scores(F.col(vec_col), centroids)),
                    1, n_probe),
            lambda s: s["i"])).alias("cell"))
    cand = (cells.join(F.broadcast(probe_cells), "cell")
            .where(F.col("neighbor_id") != F.col("probe_id"))
            .select("probe_id", "neighbor_id", "pv", "cv"))
    scored = cand.select("probe_id", "neighbor_id",
                         cosine(F.col("pv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "rank",
                    F.round("cos", 6).alias("cosine")))


def ivf_topk_np(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    max_probes: int | None = MAX_PROBES,
) -> DataFrame:
    """IVF ANN, BLAS path — the performance twin of ivf_topk (same results,
    asserted element-wise in pytest; same pairing as brute_force_topk vs
    brute_force_topk_np). The JVM-fold formulation evaluates 16 interpreted
    higher-order folds per row (~7 s for 2 000 vectors); here cell
    assignment AND probe scoring are two dgemms per Arrow batch, with
    scores masked to each probe's n_probe cells before the per-batch top-k
    prefilter. Use ivf_topk when oracle-grade bit parity of every
    intermediate matters; use this in pipelines."""
    probes = _guard_probes(probes, "ivf_topk_np", max_probes)
    Cent = np.asarray(centroids, dtype=np.float64)
    c2 = (Cent * Cent).sum(axis=1)

    pr = probes.select(F.col(probe_id_col), F.col(vec_col)).collect()
    pids = np.array([r[0] for r in pr], dtype=np.int64)
    P = np.array([list(r[1]) for r in pr], dtype=np.float64)
    Pn = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-300)
    pd_dist = c2[None, :] - 2.0 * (P @ Cent.T)        # (probes, cells)
    probe_cells = np.argsort(pd_dist, axis=1, kind="stable")[:, :n_probe]
    cell_mask = np.zeros((len(pids), len(Cent)), dtype=bool)
    for j, cells in enumerate(probe_cells):
        cell_mask[j, cells] = True

    def score(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            C = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cell = (c2[None, :] - 2.0 * (C @ Cent.T)).argmin(axis=1)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                                1e-300)
            S = Cn @ Pn.T                              # (batch, probes)
            out_p, out_n, out_c = [], [], []
            for j in range(len(pids)):
                col = S[:, j].copy()
                col[~cell_mask[j][cell]] = -np.inf     # outside probe cells
                col[ids == pids[j]] = -np.inf          # exclude self
                live = np.flatnonzero(col > -np.inf)
                if not len(live):
                    continue
                kk = min(k, len(live))
                kth = np.partition(col[live], -kk)[-kk]
                take = live[col[live] >= kth]          # ties at kth kept
                out_p.append(np.full(len(take), pids[j], dtype=np.int64))
                out_n.append(ids[take])
                out_c.append(col[take])
            if not out_p:
                continue
            yield pd.DataFrame({
                "probe_id": np.concatenate(out_p),
                "neighbor_id": np.concatenate(out_n),
                "cos": np.concatenate(out_c),
            })

    cand = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema="probe_id bigint, neighbor_id bigint, cos double")
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "rank",
                    F.round("cos", 6).alias("cosine")))


def semantic_dedup(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.92,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by coarse k-means clustering + intra-cluster cosine.
    A document is dropped iff some SAME-CELL document with a smaller id
    scores cosine >= threshold against it — pairwise dominance by id, the
    paper's "keep one representative per duplicate group" with min-id as
    the deterministic representative (the paper picks low-centroid-
    similarity/random; min-id is order-free and oracle-replayable).

    Returns (id_col, cell int, keep boolean) for EVERY input row.

    Scale shape (the reason SemDeDup beats all-pairs cosine at corpus
    scale): centroid assignment is a narrow pass — the centroid literals
    travel in the plan, no shuffle; the ONLY shuffle is the cell-keyed
    self-join, and pair work is cell-local, O(sum c_i^2) instead of
    O(n^2). Cells are balanced by the quantizer by construction; at 10^9+
    docs you raise n_centroids ~ sqrt(N) (training stays an offline
    bounded-sample artifact — functions/ivf_artifact) so expected cell
    population stays ~sqrt(N) and intra-cell pairwork stays bounded.
    Cosine is rounded to 6 dp BEFORE the threshold compare, same contract
    as dedup.embedding_cosine_pairs, so the keep decision is replayable
    bit-for-bit from the centroid artifact."""
    # per-vector double cast + norm once (not per pair — see
    # embedding_cosine_pairs for the measured 3x)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cells = corpus.select(
        F.col(id_col).alias("id"),
        ivf_assign(F.col(vec_col), centroids).alias("cell"),
        vd.alias("v"),
        F.sqrt(F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0),
                           lambda acc, x: acc + x)).alias("nrm"))
    a = cells.select(F.col("id").alias("a_id"), "cell",
                     F.col("v").alias("av"), F.col("nrm").alias("anrm"))
    b = cells.select(F.col("id").alias("b_id"), "cell",
                     F.col("v").alias("bv"), F.col("nrm").alias("bnrm"))
    dot = F.aggregate(F.zip_with(F.col("av"), F.col("bv"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    dropped = (a.join(b, "cell")
               .where(F.col("b_id") < F.col("a_id"))
               .select("a_id",
                       F.round(dot / F.nullif(F.col("anrm") * F.col("bnrm"),
                                              F.lit(0.0)), 6).alias("cos"))
               .where(F.col("cos") >= F.lit(threshold))
               .select("a_id").distinct()
               .withColumn("_dup", F.lit(True)))
    return (cells.join(dropped, cells["id"] == dropped["a_id"], "left")
            .select(F.col("id").alias(id_col), "cell",
                    F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")))


def semantic_dedup_np(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.92,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow GEMM twin of :func:`semantic_dedup` — element-wise identical
    keep decisions (pytest-pinned), one float64 matrix product per cell
    instead of an interpreted `F.aggregate` fold per intra-cell PAIR.
    This is the same twin pattern as ivf_topk_np / quantized_topk_np,
    applied to the one pairwise-cosine operator that lacked it: at 10^9
    docs SemDeDup's O(Σ cell²) pairwork is exactly where a per-pair
    interpreted fold bites (the repo measured higher-order folds 7-9×
    slower than BLAS on the IVF path).

    Cell assignment is the NUMPY FOLD TWIN of the ivf_assign expression
    (ivf_assign_np_exact: same 0.0-seeded left-to-right product fold per
    centroid, same c2 − 2.0·dot score, strict-less scan ⇒ smallest index
    on ties — every float op in the same order, so the grouping — and
    therefore which pairs are compared — stays bit-identical to the JVM
    path; pytest pins assignment equality on fixtures and adversarial
    vectors). The interpreted per-row 64×64 JVM fold was ~half this
    operator's wall time. Raw dots come from one symmetric dgemm; the
    denominator is
    the same single-multiply norm product as the JVM's `anrm * bnrm`
    (never normalize-first, which would change the float op order); zero
    norms are masked to -inf exactly where the JVM's nullif yields NULL
    (NULL >= threshold is false). The 6-dp round before the threshold
    compare matches the JVM contract, which is what makes GEMM-vs-fold
    summation-order drift (~1 ulp) invisible to the keep decision.

    Scale shape: ONE hash shuffle on cell (applyInPandas), strictly less
    than the JVM path's self-join (two Exchanges of the vector column) —
    plus the vectors cross the Arrow boundary once per cell, not once per
    pair."""
    import pandas as pd

    from pyspark.sql.types import (ArrayType, BooleanType, DoubleType,
                                   IntegerType, StructField, StructType)
    id_field = corpus.schema[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("cell", IntegerType(), True),
        StructField("keep", BooleanType(), False),
    ])
    mid_schema = StructType([
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("cell", IntegerType(), True),
        StructField("__v", ArrayType(DoubleType()), True),
    ])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vs = pdf[vec_col]
            null_v = vs.isna().to_numpy()
            # NULL vector ⇒ every (d, i) struct has a NULL score, so the
            # JVM's array_min tie-breaks to index 0 — cell 0 (verified)
            cell = np.zeros(len(pdf), dtype=object)
            vout = [None if m else np.asarray(v, dtype=np.float64)
                    for v, m in zip(vs, null_v)]
            if not null_v.all():
                X = np.vstack([v for v in vout if v is not None])
                cell[~null_v] = [int(c) for c in
                                 ivf_assign_np_exact(X, centroids)]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "cell": cell, "__v": vout})

    cells = corpus.select(F.col(id_col), F.col(vec_col)) \
        .mapInPandas(assign, mid_schema)

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        null_v = pdf["__v"].isna().to_numpy()
        if n > 1 and not null_v.all():
            X = np.vstack([v if v is not None else
                           np.zeros(len(centroids[0]), dtype=np.float64)
                           for v in pdf["__v"]]).astype(np.float64)
            nrm = np.sqrt(np.einsum("ij,ij->i", X, X))
            nrm[null_v] = 0.0  # NULL vector == zero-norm: cos is NULL JVM-side
            G = X @ X.T
            denom = np.outer(nrm, nrm)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(denom > 0, G / denom, -np.inf)
            S = np.round(S, 6)
            # dropped iff any SMALLER-id same-cell row scores >= threshold:
            # strict lower triangle in id order
            keep = ~np.tril(S >= threshold, k=-1).any(axis=1)
        else:
            keep = np.ones(n, dtype=bool)
        return pd.DataFrame({id_col: pdf[id_col],
                             "cell": pdf["cell"],
                             "keep": keep})

    return cells.groupBy("cell").applyInPandas(dedup_cell, out_schema)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: one corpus-wide
    scale 127/max|x| (a single tiny aggregate broadcast back), each
    component rounded to an integer in [-127, 127]. At 10^9+ vectors this
    is the 4x memory / bandwidth lever that makes brute-force and IVF
    scans feasible — and integer dot products are EXACT (no float
    summation order anywhere), so downstream scores are bit-replayable in
    any engine.

    Returns (id, qvec array<int>, scale double); NULL embeddings drop out
    (they cannot be scored).

    Every arithmetic step is IEEE correctly-rounded (max, abs, division,
    multiply, round-half-away) — the quantized vectors are bit-identical
    cross-engine, which is why the quantized ANN oracle can assert exact
    values rather than recall bounds."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = df.where(F.col(vec_col).isNotNull()).agg(
        F.max(F.array_max(F.transform(vd, lambda x: F.abs(x))))
        .alias("__amax"))
    return (df.where(F.col(vec_col).isNotNull())
            .crossJoin(F.broadcast(amax))
            .select(
                F.col(id_col),
                F.transform(vd, lambda x: F.round(
                    x * (F.lit(127.0) / F.col("__amax")), 0).cast("int"))
                .alias("qvec"),
                (F.lit(127.0) / F.col("__amax")).alias("scale")))


def _quantized_frames(corpus, probes, vec_col, id_col, probe_id_col):
    """Shared by the JVM-fold and Arrow-GEMM quantized paths: the corpus
    quantized by quantize_embeddings, and the probes quantized IN SPARK
    with the corpus scale — both twins consume identical integers (numpy
    half-to-even rounding never enters), which is what makes them
    element-wise comparable."""
    scale_src = quantize_embeddings(corpus, vec_col=vec_col, id_col=id_col)
    qc = scale_src.select(F.col(id_col).alias("__nid"),
                          F.col("qvec").alias("__cv"), "scale")
    pv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qp = (probes.crossJoin(F.broadcast(
              scale_src.select(F.max("scale").alias("__s"))))
          .select(F.col(probe_id_col),
                  F.transform(pv, lambda x: F.round(
                      x * F.col("__s"), 0).cast("int")).alias("__pv")))
    return qc, qp


def quantized_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors: corpus and
    probes share the CORPUS scale (so a probe quantizes the same way its
    duplicates in the corpus did), cosine is integer-dot / integer-norms
    — exact bigint arithmetic with float entering only at the final
    divide, rounded to 6 dp before the rank cut (neighbor-id tiebreak).

    Scale shape: the probe set is guarded small (same contract as
    brute_force_topk), the corpus is streamed once; the JVM fold here is
    the exact-parity anchor, quantized_topk_np the batch twin. What int8
    buys at 10^9 vectors is FOOTPRINT — persisted/shuffled vectors are 4x
    smaller than float32, 8x smaller than float64 — plus engine-exact
    replayability; it is NOT a local FLOPs win in this stack (numpy
    integer matmul has no BLAS kernel — measured 2.2x slower than the
    float64 dgemm at 500k x 64; a real int8 win needs a dedicated kernel
    such as FAISS/oneDNN, absent in this container)."""
    from pyspark.sql.window import Window
    _guard_probes(probes, "quantized_topk", 10_000)
    qc, qp = _quantized_frames(corpus, probes, vec_col, id_col,
                               probe_id_col)

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
            F.lit(0).cast("bigint"), lambda acc, x: acc + x)

    dot = idot(F.col("__pv"), F.col("__cv"))
    na = idot(F.col("__pv"), F.col("__pv"))
    nb = idot(F.col("__cv"), F.col("__cv"))
    scored = (qp.crossJoin(qc)
              .where(F.col(probe_id_col) != F.col("__nid"))
              .select(F.col(probe_id_col),
                      F.col("__nid").alias("neighbor_id"),
                      F.round(dot.cast("double")
                              / F.nullif(F.sqrt(na.cast("double"))
                                         * F.sqrt(nb.cast("double")),
                                         F.lit(0.0)), 6).alias("cos_sim")))
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def quantized_topk_np(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Arrow twin of :func:`quantized_topk` — element-wise identical
    results (pytest-pinned), one int64 matrix product per corpus batch
    instead of three interpreted JVM folds per (row, probe) pair. The
    quantized integers come from the SAME Spark expressions as the JVM
    path (_quantized_frames), so the only float op is the final
    exact-ints divide — bit-identical in numpy and the JVM. Note numpy
    integer matmul bypasses BLAS (measured 1.3 s float64 dgemm vs 2.8 s
    int64 at 500k x 64, best-of-3): use this twin for exactness and
    footprint, brute_force_topk_np for raw local speed.

    Per-batch candidate pruning keeps ties at the kth score minus 1e-6:
    the global rank runs on the 6-dp ROUNDED score (as the JVM path
    does), and a raw-score cut exactly at the kth value could drop a
    candidate that ties after rounding and wins the id tiebreak.

    Zero-norm corpus vectors score -inf inside the pruning (NaN would
    poison np.partition: NaN sorts largest, so a batch with >= k
    zero-norm rows would make kth NaN and silently drop EVERY candidate
    from that batch) and surface as NULL cos_sim — exactly the JVM twin's
    nullif(0.0) behavior, ranked last by the desc window, eligible for
    the top-k only when a probe has fewer than k finite neighbors."""
    from pyspark.sql.window import Window
    _guard_probes(probes, "quantized_topk_np", 10_000)
    qc, qp = _quantized_frames(corpus, probes, vec_col, id_col,
                               probe_id_col)
    pr = qp.collect()
    pids = np.array([r[0] for r in pr], dtype=np.int64)
    P = np.array([list(r[1]) for r in pr], dtype=np.int64)
    pn = np.sqrt(np.einsum("ij,ij->i", P, P).astype(np.float64))

    def score(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            C = np.vstack(pdf["__cv"].to_numpy()).astype(np.int64)
            ids = pdf["__nid"].to_numpy(dtype=np.int64)
            cn = np.sqrt(np.einsum("ij,ij->i", C, C).astype(np.float64))
            D = (C @ P.T).astype(np.float64)       # exact: int64 dots
            denom = np.outer(cn, pn)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(denom > 0, D / denom, -np.inf)
            out_p, out_n, out_c = [], [], []
            for j in range(len(pids)):
                col = S[:, j].copy()
                col[ids == pids[j]] = -np.inf
                kk = min(k, n)
                kth = np.partition(col, -kk)[-kk]
                take = np.flatnonzero(col >= kth - 1e-6)
                # a probe's own corpus row is masked to -inf above, so it
                # can pass the cut when kth itself is -inf (short / all-
                # zero-norm batches) — the JVM twin filters it with
                # `probe_id != __nid`; mirror that here
                take = take[ids[take] != pids[j]]
                out_p.append(np.full(len(take), pids[j], dtype=np.int64))
                out_n.append(ids[take])
                out_c.append(col[take])
            yield pd.DataFrame({
                "probe_id": np.concatenate(out_p),
                "neighbor_id": np.concatenate(out_n),
                "cos": np.concatenate(out_c),
            })

    cand = qc.select("__nid", "__cv").mapInPandas(
        score, schema="probe_id bigint, neighbor_id bigint, cos double")
    # window AFTER the rename, partitioned on the caller's probe_id_col
    # (a literal "probe_id" here breaks every non-default probe_id_col)
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    # -inf marks zero-norm neighbors; surface them as NULL like the JVM
    # twin's nullif(0.0) divide (desc ordering ranks NULL last)
    cos = F.when(F.col("cos") == F.lit(float("-inf")), F.lit(None)
                 ).otherwise(F.round("cos", 6))
    return (cand.select(F.col("probe_id").alias(probe_id_col),
                        "neighbor_id",
                        cos.alias("cos_sim"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
