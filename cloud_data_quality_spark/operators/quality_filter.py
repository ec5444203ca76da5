"""The web-text quality-filter pipeline (north-star payload).

Input: Common-Crawl-style pages (url, warc_ts, html, text, lang). Output: the
same rows annotated with language prediction, quality features, a keep/drop
verdict + first-failing-gate reason, and byte-stable scrubbed text.

Gate set (C4/Gopher-style heuristics, SURVEY.md §2.10 / BASELINE.json):
  words       — token count within [min_words, max_words]
  word_len    — mean word length within [3,12] (skipped for CJK)
  alpha       — alphabetic char ratio ≥ 0.55 (CJK pages gate on cjk_ratio)
  repetition  — duplicate-token fraction ≤ 0.6
  lang        — language identified (not 'und')
  toxicity    — no lexicon hit
Optional Arrow stage: char-bigram perplexity ≤ threshold (model-backed, via
functions/webtext_rules.py) — off in the oracle-checked profile because the
model isn't SQL-expressible, on in the full profile.

Everything except perplexity is built-in Column expressions → whole-stage
codegen, pushdown-friendly, and exactly reproducible in the DuckDB oracle.

Determinism guarantees (north-star invariant "byte-identical scrubbed text
per url"): verdict and scrub depend only on the text value — never on
partitioning, order, or cluster size; scrub order is pinned in
functions/scrub.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cloud_data_quality_spark.functions import text as TX
from cloud_data_quality_spark.functions.scrub import scrub_text
from cloud_data_quality_spark.functions.webtext_rules import perplexity_batch


@dataclass(frozen=True)
class QualityThresholds:
    min_words: int = 10
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 12.0
    min_alpha_ratio: float = 0.55
    min_cjk_ratio: float = 0.30
    # Gopher-style repetition: duplicate LINE fraction is the primary signal
    # (natural prose reuses tokens heavily — stopwords alone push dup-token
    # fraction past 0.5 — so the token bound is a loose backstop only)
    max_dup_line_frac: float = 0.30
    max_dup_token_frac: float = 0.80
    max_perplexity: float = 30.0


TOX_PATTERN = r"\b(badword1|badword2|slur1)\b"


def quality_features(text_col: Column) -> dict[str, Column]:
    return {
        "lang_pred": TX.langid(text_col),
        "n_chars": TX.char_count(text_col),
        "n_words": TX.word_count(text_col),
        "mean_word_len": TX.mean_word_length(text_col),
        "alpha_ratio": TX.alpha_ratio(text_col),
        "cjk_ratio": TX.cjk_ratio(text_col),
        "dup_token_frac": TX.duplicate_token_fraction(text_col),
        "dup_line_frac": TX.duplicate_line_fraction(text_col),
        "has_toxicity": F.coalesce(text_col.rlike(TOX_PATTERN), F.lit(False)),
    }


def gates(feat: dict[str, Column], t: QualityThresholds) -> list[tuple[str, Column]]:
    """Ordered (name, passes) gate list — order defines drop_reason priority.
    A NULL feature fails its gate (coalesce False): NULL/empty text drops."""
    is_cjk = feat["lang_pred"] == "zh"
    g = [
        # CJK text has no whitespace word boundaries: gate on chars instead
        ("words", F.when(is_cjk,
                         feat["n_chars"].between(t.min_words * 2,
                                                 t.max_words * 8))
                   .otherwise(feat["n_words"].between(t.min_words, t.max_words))),
        ("word_len", is_cjk | feat["mean_word_len"].between(
            t.min_mean_word_len, t.max_mean_word_len)),
        ("alpha", F.when(is_cjk, feat["cjk_ratio"] >= t.min_cjk_ratio)
                   .otherwise(feat["alpha_ratio"] >= t.min_alpha_ratio)),
        ("repetition", (feat["dup_line_frac"] <= t.max_dup_line_frac)
                       & (feat["dup_token_frac"] <= t.max_dup_token_frac)),
        ("lang", feat["lang_pred"] != "und"),
        ("toxicity", ~feat["has_toxicity"]),
    ]
    return [(name, F.coalesce(cond, F.lit(False))) for name, cond in g]


def annotate_quality(
    df: DataFrame,
    text_col: str = "text",
    thresholds: QualityThresholds | None = None,
    with_perplexity: bool = False,
    with_scrub: bool = True,
) -> DataFrame:
    """One projection pass adding features + keep verdict + drop_reason
    (+ scrubbed_text, + perplexity when enabled)."""
    t = thresholds or QualityThresholds()
    col = F.col(text_col)
    feat = quality_features(col)
    out = df
    for name, c in feat.items():
        out = out.withColumn(name, c)
    if with_perplexity:
        @F.pandas_udf("double")
        def _ppl(s: pd.Series) -> pd.Series:
            return perplexity_batch(s)
        out = out.withColumn("perplexity", _ppl(col))

    feat_cols = {k: F.col(k) for k in feat}
    gate_list = gates(feat_cols, t)
    if with_perplexity:
        # the embedded bigram model is English-profile — gate en docs only
        gate_list.append(
            ("perplexity",
             F.when(F.col("lang_pred") == "en",
                    F.coalesce(F.col("perplexity") <= t.max_perplexity,
                               F.lit(False))).otherwise(F.lit(True))))

    keep = F.lit(True)
    for _, cond in gate_list:
        keep = keep & cond
    # first failing gate, in order — deterministic drop reason
    reason = F.lit(None).cast("string")
    for name, cond in reversed(gate_list):
        reason = F.when(~cond, F.lit(name)).otherwise(reason)

    out = out.withColumn("keep", keep).withColumn("drop_reason", reason)
    if with_scrub:
        out = out.withColumn("scrubbed_text", scrub_text(col))
    return out


def filter_kept(df: DataFrame, **kw) -> DataFrame:
    return annotate_quality(df, **kw).where(F.col("keep"))


def quality_summary(annotated: DataFrame) -> DataFrame:
    """Per-(lang_pred, drop_reason) roll-up — the quality-filter analogue of
    the dq_summary COUNTIF aggregation (one shuffle of tiny partial aggs)."""
    return (
        annotated.groupBy("lang_pred", "keep", "drop_reason")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.coalesce(F.col("n_words"), F.lit(0))).alias("n_words_total"))
        .orderBy("lang_pred", "keep", "drop_reason")
    )
