"""Sequence packing: greedy assignment of documents to fixed token budgets.

The training-data operator that follows dedup + quality filtering: group
documents into "packs" whose token totals fit a context-window budget, so
the trainer wastes minimal padding. No CloudDQ analogue (SURVEY training-
pipeline mandate) — this is the canonical example of an operator Spark has
no built-in for, implemented as (b) in the custom-operator ladder: a
composition of one hash-bucket shuffle + an Arrow ``applyInPandas`` stage.

Semantics (deterministic, engine-replayable):
* documents are split into ``n_buckets`` hash buckets (md5 of the id — the
  portable-hash trick, bit-identical in DuckDB/BigQuery);
* within a bucket, docs are taken in ascending id order and packed greedily:
  a doc joins the current pack unless that would exceed ``budget`` tokens,
  in which case it starts the next pack. A doc longer than the budget gets
  a pack of its own (never split, never dropped — truncation is a separate
  policy decision);
* pack identity is (bucket, seq) — stable across runs and parallelism
  levels because both bucket assignment and in-bucket order are pure
  functions of the data.

Scale posture: ONE shuffle (groupBy bucket); per-task state is one bucket's
(id, n_tokens) pairs — bounded by n_buckets sizing, skew-free because md5
buckets are uniform regardless of id distribution. The greedy loop is
O(#packs · log n) numpy (cumsum + searchsorted), not a per-doc Python loop.

Packing quality: greedy-by-id is the *streaming* packing used in practice
(docs arrive in corpus order); bin-packing-optimal would need a global sort
by length (one extra shuffle) for marginal padding gains — callers who want
it can pre-sort and pass ``order_col``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_data_quality_spark.functions.text import word_count

def _packed_schema(id_type: str) -> str:
    """Output schema follows the id column's type (bigint doc ids, string
    urls, ... all valid pack keys)."""
    return (f"doc_id {id_type}, bucket int, pack_id string, pack_seq int, "
            f"pack_pos int, n_tokens bigint")


def _bucket_col(id_col: str, n_buckets: int):
    # 60-bit md5 prefix → non-negative long → mod — replayable in DuckDB as
    # ('0x'||substr(md5(...),1,15))::BIGINT % n (both values are positive)
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def greedy_pack_lengths(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Pack sequence numbers for an ordered token-length array.

    Vectorized greedy: cumulative sums + searchsorted finds each pack's end
    in O(log n); total O(#packs log n). A doc with tokens > budget gets its
    own pack (j clamped to advance at least one doc)."""
    seq = np.zeros(len(tokens), dtype=np.int32)
    if not len(tokens):
        return seq
    cums = np.cumsum(tokens, dtype=np.int64)
    i, pack, base = 0, 0, np.int64(0)
    while i < len(tokens):
        j = int(np.searchsorted(cums, base + budget, side="right"))
        j = max(j, i + 1)
        seq[i:j] = pack
        base = cums[j - 1]
        i = j
        pack += 1
    return seq


def pack_documents(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    tokenizer: str = "words",
) -> DataFrame:
    """(doc_id, bucket, pack_id, pack_seq, pack_pos, n_tokens): greedy
    token packing within hash buckets. ``pack_id = '<bucket>-<seq>'``;
    ``pack_pos`` is the doc's 0-based position inside its pack.

    tokenizer: 'words' measures the budget in whitespace words (pure JVM
    Column); 'bpe' measures it in subword tokens from the embedded BPE
    merge artifact (functions/bpe_artifact — Arrow-vectorized pandas UDF,
    memoized per distinct word) — what a real training pipeline packs by."""
    if tokenizer == "words":
        n_tokens = word_count(F.col(text_col))
    elif tokenizer == "bpe":
        from cloud_data_quality_spark.functions.bpe_artifact import (
            bpe_token_count_column)
        n_tokens = bpe_token_count_column(text_col)
    elif tokenizer == "bpe_large":
        from cloud_data_quality_spark.functions.bpe_artifact import (
            bpe_token_count_column)
        from cloud_data_quality_spark.functions.bpe_large_artifact import (
            BPE_MERGES_LARGE)
        n_tokens = bpe_token_count_column(text_col, merges=BPE_MERGES_LARGE)
    elif tokenizer == "bpe_8k":
        from cloud_data_quality_spark.functions.bpe_8k_artifact import (
            BPE_MERGES_8K)
        from cloud_data_quality_spark.functions.bpe_artifact import (
            bpe_token_count_column)
        n_tokens = bpe_token_count_column(text_col, merges=BPE_MERGES_8K)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r} "
                         "(expected 'words', 'bpe', 'bpe_large' or "
                         "'bpe_8k')")
    base = (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    _bucket_col(id_col, n_buckets).alias("bucket"),
                    n_tokens.alias("n_tokens")))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq = greedy_pack_lengths(pdf["n_tokens"].to_numpy(np.int64), budget)
        pdf["pack_seq"] = seq.astype("int32")
        pdf["pack_pos"] = pdf.groupby("pack_seq").cumcount().astype("int32")
        pdf["pack_id"] = (pdf["bucket"].astype(str) + "-"
                          + pdf["pack_seq"].astype(str))
        return pdf[["doc_id", "bucket", "pack_id", "pack_seq",
                    "pack_pos", "n_tokens"]]

    id_type = dict(df.dtypes)[id_col]
    return base.groupBy("bucket").applyInPandas(
        pack, schema=_packed_schema(id_type))


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack roll-up + budget-respect flag (total ≤ budget unless the
    pack is a single oversize doc) — the invariant consumers assert."""
    return (packed.groupBy("pack_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"))
            .withColumn("within_budget",
                        (F.col("total_tokens") <= budget)
                        | (F.col("n_docs") == 1)))


def pack_utilization(
    manifest: DataFrame,
    budget: int,
    pack_col: str = "pack_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Packing observability: per-pack document count, token total, and
    fill fraction (integer micro-units of the budget) from a
    :func:`pack_documents` manifest — the waste metric that tells a
    training-prep pipeline whether its packing budget/bucketing is
    leaving context-window capacity on the floor.

    Scale shape: one partial-aggregated shuffle on the pack id (uniform —
    pack ids are hash-bucket derived); integer `div` keeps the fill
    fraction exactly replayable."""
    return (manifest.groupBy(pack_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(token_col).cast("bigint").alias("pack_tokens"))
            .withColumn(
                "fill_micro",
                F.expr(f"(pack_tokens * 1000000) div {int(budget)}")
                .cast("bigint")))
