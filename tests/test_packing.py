"""Sequence packing: greedy budget semantics, determinism, scale shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloud_data_quality_spark.functions.packing import (
    greedy_pack_lengths,
    pack_documents,
    pack_stats,
)


class TestGreedyCore:
    def test_basic_fill(self):
        seq = greedy_pack_lengths(np.array([100, 100, 60, 100]), budget=256)
        # 100+100=200 fits; +60 → 260 overflows → 60 starts pack 1; 60+100 fits
        assert seq.tolist() == [0, 0, 1, 1]

    def test_oversize_doc_gets_own_pack(self):
        seq = greedy_pack_lengths(np.array([300, 10, 10]), budget=256)
        assert seq.tolist() == [0, 1, 1]
        seq2 = greedy_pack_lengths(np.array([10, 300, 10]), budget=256)
        assert seq2.tolist() == [0, 1, 2]  # oversize never shares

    def test_empty_and_exact_budget(self):
        assert greedy_pack_lengths(np.array([], dtype=np.int64), 256).tolist() == []
        assert greedy_pack_lengths(np.array([128, 128, 1]), 256).tolist() == [0, 0, 1]

    def test_matches_naive_loop_randomized(self):
        rng = np.random.Generator(np.random.PCG64(5))
        for _ in range(20):
            toks = rng.integers(1, 400, size=int(rng.integers(1, 200)))
            budget = int(rng.integers(100, 600))
            got = greedy_pack_lengths(toks, budget)
            # naive reference
            seq, acc, p = [], 0, 0
            for t in toks:
                if seq and acc + t > budget:
                    p += 1
                    acc = 0
                acc += int(t)
                seq.append(p)
            assert got.tolist() == seq


class TestPackDocuments:
    @pytest.fixture(scope="class")
    def packed(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        return pack_documents(docs, budget=256, n_buckets=8), docs

    def test_budget_invariant(self, spark, packed):
        out, _ = packed
        stats = pack_stats(out, budget=256)
        assert stats.where(~F.col("within_budget")).count() == 0

    def test_every_doc_packed_once(self, packed):
        out, docs = packed
        n_docs = docs.where(F.col("text").isNotNull()).count()
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs

    def test_deterministic_across_partitioning(self, packed):
        out, docs = packed
        a = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in out.collect()}
        b = {r["doc_id"]: (r["pack_id"], r["pack_pos"])
             for r in pack_documents(docs.repartition(13), budget=256,
                                     n_buckets=8).collect()}
        assert a == b

    def test_in_pack_order_is_id_order(self, packed):
        out, _ = packed
        w = out.orderBy("pack_id", "pack_pos").collect()
        by_pack = {}
        for r in w:
            by_pack.setdefault(r["pack_id"], []).append(r["doc_id"])
        assert all(ids == sorted(ids) for ids in by_pack.values())

    def test_single_shuffle_plan(self, spark):
        """Scale shape: exactly one Exchange (the bucket groupBy) feeds the
        Arrow packing stage — no extra sorts/shuffles."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = pack_documents(docs, budget=256, n_buckets=8)._jdf \
            .queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
