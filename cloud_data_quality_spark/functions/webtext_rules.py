"""Vectorized (Arrow/pandas) web-text rule implementations.

These register into the CUSTOM_PANDAS_BATCH registry and back the
mapInPandas pipeline stages. They are the Python slow-path counterparts of
functions/text.py's pure-Column builders — used where the heuristic needs
model state (n-gram tables) that would be unwieldy as a SQL expression.

All models are deterministic and self-contained (embedded profile text, no
downloads): this sandbox has no fastText/KenLM artifacts, so the *mechanism*
is real (hashed n-gram linear scoring, bigram log-prob tables, broadcast-once
per executor via module globals) while the *weights* are tiny embedded
profiles. Swapping in real model files = replacing `_PROFILES` /
`_BIGRAM_LOGPROB` loading with a file read shipped via spark.files.

Executor-side state pattern: tables are built lazily at module import on each
executor (cheap, deterministic) — the recommended alternative to pickling a
driver-side global into every task closure.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from cloud_data_quality_spark.functions.batch_registry import register_batch_function
from cloud_data_quality_spark.functions.text import (
    DE_MARKERS,
    EN_STOPWORDS,
    ES_MARKERS,
    FR_MARKERS,
)
from cloud_data_quality_spark.functions.scrub import SCRUB_PATTERNS, TOXICITY_WORDS

# ---------------------------------------------------------------- language ID

_MARKER_SETS: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    "es": ES_MARKERS,
    "fr": FR_MARKERS,
    "de": DE_MARKERS,
}
_MARKER_RE = {
    lang: re.compile(r"\b(?:" + "|".join(map(re.escape, words)) + r")\b")
    for lang, words in _MARKER_SETS.items()
}
_CJK_RE = re.compile("[一-鿿]")
_LANG_PRIORITY = ["en", "es", "fr", "de"]  # deterministic tie-break


def langid_batch(texts: pd.Series, params: dict | None = None) -> pd.Series:
    """Marker-word + CJK-ratio language ID, vectorized with pandas str.count.
    Intentionally agrees with functions.text.langid (cross-checked in tests)."""
    t = texts.fillna("")
    n_chars = t.str.len().replace(0, 1)
    cjk = t.str.count(_CJK_RE) / n_chars
    scores = {lang: t.str.count(rx) for lang, rx in _MARKER_RE.items()}
    out = pd.Series("und", index=texts.index, dtype="object")
    best = pd.Series(0, index=texts.index)
    for lang in reversed(_LANG_PRIORITY):  # earlier priority wins ties (>=)
        s = scores[lang]
        take = (s >= best) & (s >= 1)
        out[take] = lang
        best = best.where(best > s, s)
    out[cjk > 0.30] = "zh"
    out[texts.isna()] = None
    return out


@register_batch_function("LANGID_IS")
def langid_is(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: document language == params['lang']. NULL text → NULL."""
    want = str(params.get("lang", "en")).lower()
    pred = langid_batch(texts) == want
    return pred.where(texts.notna(), other=pd.NA)


# ------------------------------------------------------------- perplexity

# Embedded English character-bigram profile (KenLM stand-in). Deterministic:
# probabilities derived from this fixed sample at import time.
_PROFILE_TEXT = (
    "the quick brown fox jumps over the lazy dog and then it runs back home "
    "data quality rules validate each record in the table while the engine "
    "counts success failure and null values for every rule binding in spark "
    "a sentence with common english words keeps the language model perplexity "
    "low while random symbol spam makes it very high"
)
_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
_A = len(_ALPHABET)
_CHAR_IDX = {c: i for i, c in enumerate(_ALPHABET)}


def _build_bigram_logprob() -> np.ndarray:
    counts = np.ones((_A, _A), dtype=np.float64)  # Laplace smoothing
    prev = None
    for ch in _PROFILE_TEXT:
        cur = _CHAR_IDX.get(ch)
        if prev is not None and cur is not None:
            counts[prev, cur] += 1.0
        prev = cur
    return np.log(counts / counts.sum(axis=1, keepdims=True))


_BIGRAM_LOGPROB = _build_bigram_logprob()
_MAX_PPL_CHARS = 1024  # bound per-doc work; perplexity stabilizes long before


def perplexity_batch(texts: pd.Series, params: dict | None = None) -> pd.Series:
    """Char-bigram perplexity: exp(-mean log P(c_i | c_{i-1})) over the
    lowercase [a-z ] projection of the first 1024 chars. NULL/too-short → NaN.
    """
    out = np.full(len(texts), np.nan)
    lp = _BIGRAM_LOGPROB
    for i, text in enumerate(texts.array):
        if not isinstance(text, str):
            continue
        s = text[:_MAX_PPL_CHARS].lower()
        idx = np.array([_CHAR_IDX.get(c, -1) for c in s], dtype=np.int64)
        idx = idx[idx >= 0]
        if len(idx) < 2:
            continue
        out[i] = float(np.exp(-lp[idx[:-1], idx[1:]].mean()))
    return pd.Series(out, index=texts.index)


@register_batch_function("PERPLEXITY_BELOW")
def perplexity_below(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: perplexity <= params['threshold'] (default 30).
    NULL text → NULL; unscorable (too short) → FALSE."""
    thr = float(params.get("threshold", 30.0))
    ppl = perplexity_batch(texts)
    pred = (ppl <= thr).fillna(False)
    return pred.where(texts.notna(), other=pd.NA)


# ----------------------------------------------------- C4/Gopher heuristics

_WS_RE = re.compile(r"\s+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_STOP_RE = _MARKER_RE["en"]


def gopher_stats_batch(texts: pd.Series) -> pd.DataFrame:
    t = texts.fillna("")
    toks = t.str.split(_WS_RE)
    toks = toks.map(lambda xs: [x for x in xs if x])
    n_words = toks.map(len)
    n_chars_words = toks.map(lambda xs: sum(len(x) for x in xs))
    n_distinct = toks.map(lambda xs: len(set(xs)))
    mean_word_len = (n_chars_words / n_words.replace(0, np.nan))
    dup_frac = 1.0 - n_distinct / n_words.replace(0, np.nan)
    n_chars = t.str.len()
    alpha_ratio = t.str.count(_ALPHA_RE) / n_chars.replace(0, np.nan)
    stop_ratio = t.str.count(_STOP_RE) / n_words.replace(0, np.nan)
    return pd.DataFrame({
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "dup_token_frac": dup_frac,
        "alpha_ratio": alpha_ratio,
        "stopword_ratio": stop_ratio,
    }, index=texts.index)


@register_batch_function("GOPHER_QUALITY")
def gopher_quality(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: passes the Gopher-style gate set. Tunable via params
    (min_words, max_words, min_mean_word_len, max_mean_word_len,
    max_dup_token_frac, min_alpha_ratio, min_stopword_ratio)."""
    p = {
        "min_words": 10, "max_words": 100000,
        "min_mean_word_len": 3.0, "max_mean_word_len": 12.0,
        "max_dup_token_frac": 0.6, "min_alpha_ratio": 0.55,
        "min_stopword_ratio": 0.0,
        **(params or {}),
    }
    s = gopher_stats_batch(texts)
    ok = (
        s.n_words.between(p["min_words"], p["max_words"])
        & s.mean_word_len.between(p["min_mean_word_len"], p["max_mean_word_len"])
        & (s.dup_token_frac <= p["max_dup_token_frac"])
        & (s.alpha_ratio >= p["min_alpha_ratio"])
        & (s.stopword_ratio >= p["min_stopword_ratio"])
    ).fillna(False)
    return ok.where(texts.notna(), other=pd.NA)


# --------------------------------------------------------------- PII / scrub

_PII_RES = [re.compile(p) for _, p, _ in SCRUB_PATTERNS]
_SCRUB_STEPS = [(re.compile(p), repl) for _, p, repl in SCRUB_PATTERNS] + [
    (re.compile(rf"\b{w}\b"), "<TOX>") for w in TOXICITY_WORDS
]


@register_batch_function("NO_PII")
def no_pii(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: TRUE iff no PII pattern matches. NULL text → NULL."""
    hit = pd.Series(False, index=texts.index)
    t = texts.fillna("")
    for rx in _PII_RES:
        hit = hit | t.str.contains(rx, regex=True)
    return (~hit).where(texts.notna(), other=pd.NA)


def scrub_batch(texts: pd.Series, params: dict | None = None) -> pd.Series:
    """Canonical scrub chain (same order as functions.scrub.scrub_text — the
    two paths are asserted byte-identical in tests)."""
    out = texts.copy()
    mask = out.notna()
    s = out[mask]
    for rx, repl in _SCRUB_STEPS:
        s = s.str.replace(rx, repl, regex=True)
    out[mask] = s
    return out
