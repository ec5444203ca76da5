"""Trigram stupid-backoff LM vs an independent plain-Python replay."""

from __future__ import annotations

import math
from collections import Counter

from cloud_data_quality_spark.functions.ngram_lm import (
    UNK,
    trigram_backoff_logprob,
)


def _py_reference(rows, vocab_size, alpha, prune_below):
    """Plain-python restatement of the spec (not the Spark code path)."""
    toks = {i: t.split() for i, t in rows}
    freq = Counter(w for ws in toks.values() for w in ws)
    vocab = set(w for w, _ in sorted(freq.items(),
                                     key=lambda kv: (-kv[1], kv[0]))
                [:vocab_size])
    mapped = {i: [w if w in vocab else UNK for w in ws]
              for i, ws in toks.items()}
    uni = Counter(w for ws in mapped.values() for w in ws)
    n_total = sum(uni.values())
    bi = Counter((ws[j], ws[j + 1])
                 for ws in mapped.values() for j in range(len(ws) - 1))
    tri = Counter((ws[j], ws[j + 1], ws[j + 2])
                  for ws in mapped.values() for j in range(len(ws) - 2))
    tri_kept = {g: c for g, c in tri.items() if c >= prune_below}
    bi_kept = {g: c for g, c in bi.items() if c >= prune_below}

    out = {}
    for i, ws in mapped.items():
        if len(ws) < 3:
            continue
        lps = []
        for j in range(len(ws) - 2):
            w1, w2, w3 = ws[j], ws[j + 1], ws[j + 2]
            if (w1, w2, w3) in tri_kept:
                s = tri_kept[(w1, w2, w3)] / bi[(w1, w2)]
            elif (w2, w3) in bi_kept:
                s = alpha * (bi_kept[(w2, w3)] / uni[w2])
            else:
                s = alpha * alpha * (uni[w3] / n_total)
            lps.append(-math.log(s))
        out[i] = (round(sum(lps) / len(lps), 4), len(lps))
    return out


def _run_both(spark, rows, **kw):
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    got = {r["doc_id"]: (r["nll"], r["n_trigrams"])
           for r in trigram_backoff_logprob(df, **kw).collect()}
    want = _py_reference(rows, kw.get("vocab_size", 500),
                         kw.get("alpha", 0.4), kw.get("prune_below", 2))
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1], f"doc {i} trigram count"
        assert abs(got[i][0] - want[i][0]) < 1e-9, f"doc {i} nll"
    return got


class TestTrigramBackoff:
    def test_matches_python_replay_with_backoff_firing(self, spark):
        # 'e f g' appears once -> pruned -> trigram backoff fires for it;
        # 'f g' appears once -> pruned too -> unigram backoff fires.
        rows = [
            (1, "a b c a b c a b c"),
            (2, "a b c d e f g"),
            (3, "c d e c d e"),
            (4, "x y"),  # <3 tokens: no row
        ]
        got = _run_both(spark, rows, vocab_size=500, alpha=0.4,
                        prune_below=2)
        assert 4 not in got

    def test_unk_mapping_on_small_vocab(self, spark):
        # vocab_size=3 forces the rarer words through <unk>
        rows = [
            (1, "a a a b b c d e f a b c"),
            (2, "q r s a a b"),
        ]
        _run_both(spark, rows, vocab_size=3, alpha=0.4, prune_below=2)

    def test_prune_one_never_backs_off_on_train_corpus(self, spark):
        # scoring the training corpus with no pruning: every trigram exists,
        # so every score is a pure ML ratio (sanity anchor for the spec)
        rows = [(1, "a b c d"), (2, "a b c e")]
        got = _run_both(spark, rows, prune_below=1)
        # 'a b c' count 2 / 'a b' count 2 = 1.0; 'b c d' 1/'b c' 2 = .5
        assert got[1][0] == round((0.0 + math.log(2)) / 2, 4)

    def test_feeds_quantile_buckets(self, spark):
        from cloud_data_quality_spark.functions.selection import (
            quantile_buckets)
        rows = [(i, " ".join(
            ["common words here"] * 3 + [f"rare{i % 7} tail{i % 5} bit"]))
            for i in range(30)]
        df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
        scored = trigram_backoff_logprob(df)
        labeled = quantile_buckets(scored, "nll")
        counts = {r["bucket"]: r["n"] for r in
                  labeled.groupBy("bucket").count()
                  .withColumnRenamed("count", "n").collect()}
        assert sum(counts.values()) == 30
        assert set(counts) <= {"head", "middle", "tail"}
        # terciles over 30 docs: head gets ceil-boundary mass, all non-empty
        assert all(v > 0 for v in counts.values())
