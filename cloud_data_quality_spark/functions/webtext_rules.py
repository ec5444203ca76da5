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
import pyarrow as pa
import pyarrow.compute as pc

from cloud_data_quality_spark.functions.batch_registry import register_batch_function
from cloud_data_quality_spark.functions.text import (
    DE_MARKERS,
    EN_STOPWORDS,
    ES_MARKERS,
    FR_MARKERS,
    PY_ONLY_WS_RE,
    py_tokens,
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


def _java_ws_token_lists(s: pd.Series) -> pd.Series:
    """Vectorized str.split() with per-row correction on the (rare) rows
    where Python's Unicode whitespace diverges from Java \\s — keeps the
    fast path for ASCII web text while staying byte-parity with
    functions/text.tokens (the Column path) and sql_tokens (the oracle).
    (The quality/classifier hot paths use _arrow_token_core instead —
    Arrow's ascii split IS the Java class, no correction pass needed.)"""
    tok_lists = s.str.split()
    mask = s.str.contains(PY_ONLY_WS_RE, na=False)
    if mask.any():
        tok_lists = tok_lists.copy()
        tok_lists[mask] = s[mask].map(py_tokens)
    return tok_lists


#: bool LUT over the full codepoint plane for the scrub/PII candidate
#: detector the batch path replaces with one gather over its decoded
#: stream ('@' or a digit — every scrub pattern needs one; the
#: 'badword'/'slur' literals are checked separately with C substring scans)
def _lut_from_ranges(ranges: list[tuple[int, int]]) -> np.ndarray:
    lut = np.zeros(0x110000, dtype=bool)
    for lo, hi in ranges:
        lut[lo:hi + 1] = True
    return lut


_SCRUB_CHAR_LUT = _lut_from_ranges([(0x30, 0x39), (0x40, 0x40)])


def _arrow_token_core(arr: "pa.Array"):
    """Whitespace-tokenize a null-free Arrow string batch entirely in C++.

    `pc.ascii_split_whitespace` splits on exactly the ASCII class Java \\s
    uses ([ \\t\\n\\x0B\\f\\r]) and collapses interior runs, emitting empty
    tokens only at row boundaries; after filtering zero-length tokens the
    token lists are EXACTLY py_tokens / functions.text.tokens — pinned by
    tests over adversarial whitespace (incl. \\x0b, \\x1c, NBSP, U+2028,
    U+3000, which Python's str.split treats differently).

    Returns (rows int64[], codes int64[], flat pa.StringArray,
    dictionary pa.StringArray, n_tokens int64[n]): `flat` is the filtered
    in-order token stream, `codes` its dictionary indices — every
    token-derived feature then reduces to bincounts over ints, and string
    work (marker membership, lengths) happens once per DICTIONARY entry
    in Arrow, never per occurrence in Python."""
    n = len(arr)
    tok = pc.ascii_split_whitespace(arr)
    nl = pc.list_value_length(tok).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(tok)
    empty = pa.array([], type=pa.string())
    if len(flat) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), empty,
                empty, np.zeros(n, np.int64))
    rows = np.repeat(np.arange(n, dtype=np.int64), nl)
    ne = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    if not ne.all():
        rows = rows[ne]
        flat = flat.filter(pa.array(ne))
        if len(flat) == 0:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64), empty,
                    empty, np.zeros(n, np.int64))
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return (rows, codes, flat, enc.dictionary,
            np.bincount(rows, minlength=n).astype(np.int64))


def _tokenized_marker_scores(s: pd.Series) -> dict[str, np.ndarray]:
    """Occurrence count of each language's marker words over whitespace
    tokens, via one Arrow split + dictionary-encode + bincount (token
    membership — the same semantics as functions.text.langid's
    array_contains, NOT regex \\b matching, which differs on
    punctuation-adjacent tokens)."""
    n = len(s)
    rows, codes, _flat, vocab_pa, _lens = _arrow_token_core(
        pa.Array.from_pandas(s))
    if not len(codes):
        return {lang: np.zeros(n) for lang in _MARKER_SETS}
    out = {}
    for lang, words in _MARKER_SETS.items():
        flag = pc.is_in(vocab_pa, value_set=pa.array(words,
                                                    type=pa.string())) \
            .to_numpy(zero_copy_only=False)
        out[lang] = np.bincount(rows[flag[codes]], minlength=n)
    return out


def _langid_from_scores(s: pd.Series, scores: dict[str, np.ndarray],
                        cjk: pd.Series) -> pd.Series:
    out = np.full(len(s), "und", dtype=object)
    best = np.zeros(len(s))
    for lang in reversed(_LANG_PRIORITY):  # earlier priority wins ties (>=)
        sc = scores[lang]
        take = (sc >= best) & (sc >= 1)
        out[take] = lang
        best = np.maximum(best, sc)
    out[np.asarray(cjk > 0.30)] = "zh"
    return pd.Series(out, index=s.index)


def langid_batch(texts: pd.Series, params: dict | None = None) -> pd.Series:
    """Marker-word + CJK-ratio language ID — exact semantic twin of
    functions.text.langid (cross-checked in tests)."""
    t = texts.fillna("")
    n_chars = t.str.len().replace(0, 1)
    cjk = t.str.count(_CJK_RE) / n_chars
    out = _langid_from_scores(t, _tokenized_marker_scores(t), cjk)
    out[texts.isna()] = None
    return out


@register_batch_function("LANGID_IS")
def langid_is(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: document language == params['lang']. NULL text → NULL."""
    want = str(params.get("lang", "en")).lower()
    pred = langid_batch(texts) == want
    return pred.where(texts.notna(), other=pd.NA)


# ----------------------------------------- hashed n-gram language ID
# fastText-mechanism inference (char 1-3-gram → hashed bucket → per-language
# linear weights → argmax), per BASELINE.json's "fastText language-ID". The
# weights are a deterministic embedded stand-in trained at import from the
# profile paragraphs below (same posture as the KenLM stand-in: mechanism
# real, artifact tiny); swapping in real fastText weights = replacing
# _LANGID_W with a loaded matrix of the same shape.

_LANGID_BUCKETS = 4096
_LANGID_LANGS = ["en", "es", "fr", "de", "zh"]  # index order = tie-break
_HASH_P = np.uint64(1_000_003)

_LANGID_PROFILES = {
    "en": ("the quick brown fox jumps over the lazy dog and it was not "
           "there when we came back for all of this that is what they "
           "said about the world market and science news from an engine "
           "that can have data quality rules on each table page content "
           "article report story sport culture by with as at be or had "
           "are but what were when there can this have from reading"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y no "
           "estaba allí cuando volvimos por todo esto que es lo que "
           "dijeron sobre el mundo mercado y ciencia noticias de los "
           "datos calidad tabla de la que y en los se del las un por "
           "con no una su para es al como más pero sus le ya este sí "
           "porque esta entre había mucho siempre también después"),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux et "
           "il était pas là quand nous sommes revenus pour tout cela qui "
           "est ce que ils ont dit sur le monde marché et science "
           "nouvelles des données qualité la de et les des en un du une "
           "est que dans qui par pour au sur plus ne se pas ce sont avec "
           "son ses mais comme toujours aussi après beaucoup très"),
    "de": ("der schnelle braune fuchs springt über den faulen hund und "
           "er war nicht da als wir für all das zurück kamen was sie "
           "über die welt markt und wissenschaft nachrichten von daten "
           "qualität gesagt haben die und das den von mit ist des ein "
           "dem nicht sie auf für es im eine auch als an werden aus er "
           "hat dass sich nach immer viele sehr dann wieder zwischen"),
    "zh": ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时"
           "年得就那要下以生会自着去之过家学对可她里后的一是不了人我在"
           "有他这中大来上国个到说们为子和你地出道也时年得就那要下以生"),
}


def _gram_buckets(codes: np.ndarray, doc: np.ndarray,
                  n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, doc) pairs for every char 1/2/3-gram, via a rolling
    polynomial hash over codepoints — fully vectorized, no string hashing.
    Gram orders get distinct additive salts so '1-gram c' and '2-gram
    starting c' land in independent buckets."""
    nb = np.uint64(n_buckets)
    c = codes.astype(np.uint64)
    outs, docs = [c % nb], [doc]
    if len(c) >= 2:
        h2 = c[:-1] * _HASH_P + c[1:]
        m2 = doc[:-1] == doc[1:]
        outs.append((h2[m2] + np.uint64(0x9E3779B9)) % nb)
        docs.append(doc[:-1][m2])
        if len(c) >= 3:
            h3 = h2[:-1] * _HASH_P + c[2:]
            m3 = m2[:-1] & (doc[1:-1] == doc[2:])
            outs.append((h3[m3] + np.uint64(0x85EBCA6B)) % nb)
            docs.append(doc[:-2][m3])
    return (np.concatenate(outs).astype(np.int64),
            np.concatenate(docs).astype(np.int64))


def _train_langid_weights() -> np.ndarray:
    """Per-language bucket log-probabilities (naive-Bayes-trained linear
    model in the hashed feature space — the shape fastText inference uses)."""
    W = np.zeros((len(_LANGID_LANGS), _LANGID_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(_LANGID_LANGS):
        text = _LANGID_PROFILES[lang].lower()
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        bkt, _ = _gram_buckets(codes, np.zeros(len(codes), dtype=np.int64),
                               _LANGID_BUCKETS)
        cnt = np.bincount(bkt, minlength=_LANGID_BUCKETS).astype(np.float64)
        W[li] = np.log((cnt + 0.1) / (cnt.sum() + 0.1 * _LANGID_BUCKETS))
    return W.astype(np.float32)


_LANGID_W = _train_langid_weights()
_LANGID_MIN_GRAMS = 3  # fewer grams than this → "und"


def hashed_ngram_langid_batch(texts: pd.Series,
                              params: dict | None = None) -> pd.Series:
    """fastText-style language ID: hash the doc's char 1-3-grams, sum each
    language's bucket weights, argmax. NULL text → None; < 3 grams → 'und'.
    One codepoint decode + L bincounts per Arrow batch — no per-row Python."""
    n = len(texts)
    t = texts.fillna("").str.lower().str.replace(r"\s+", " ", regex=True)
    codes, doc, _ = _codepoints(list(t.array), n)
    out = np.full(n, "und", dtype=object)
    if len(codes):
        bkt, bdoc = _gram_buckets(codes, doc.astype(np.int64), _LANGID_BUCKETS)
        scores = np.zeros((len(_LANGID_LANGS), n))
        for li in range(len(_LANGID_LANGS)):
            scores[li] = np.bincount(bdoc, weights=_LANGID_W[li][bkt],
                                     minlength=n)
        counts = np.bincount(bdoc, minlength=n)
        best = np.argmax(scores, axis=0)  # first index wins ties → lang order
        langs = np.asarray(_LANGID_LANGS, dtype=object)
        scored = counts >= _LANGID_MIN_GRAMS
        out[scored] = langs[best[scored]]
    res = pd.Series(out, index=texts.index)
    res[texts.isna()] = None
    return res


@register_batch_function("LANGID_HASHED_IS")
def langid_hashed_is(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: hashed-n-gram model predicts params['lang'].
    NULL text → NULL."""
    want = str(params.get("lang", "en")).lower()
    pred = hashed_ngram_langid_batch(texts) == want
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


# full-codepoint → alphabet-index LUT (one gather, no clipping/where);
# 1.1M int8 entries = ~1 MB, built once per worker. Uppercase A-Z map to the
# same index as their lowercase forms, which is exactly equivalent to
# .lower()-then-LUT: every non-ASCII character lowercases to another
# character outside [a-z ] and hits -1 either way.
_CHAR_LUT_FULL = np.full(0x110000, -1, dtype=np.int8)
for _c, _i in _CHAR_IDX.items():
    _CHAR_LUT_FULL[ord(_c)] = _i
    if "a" <= _c <= "z":
        _CHAR_LUT_FULL[ord(_c.upper())] = _i
_BIGRAM_LP_FLAT = _BIGRAM_LOGPROB.ravel()

# char-CLASS LUT: the perplexity alphabet (0-25 letters case-folded, 26
# space) PLUS class 27 for the CJK Unified Ideographs block — one int8
# gather over the codepoint stream replaces the four uint32 range compares
# (alpha) + two (cjk) + the perplexity LUT's second gather, and int8 masks
# quarter the memory traffic of uint32 compares (these passes are
# bandwidth-bound; see quality_annotations_batch)
_CLS_CJK = np.int8(27)
_CLASS_LUT = _CHAR_LUT_FULL.copy()
_CLASS_LUT[0x4E00:0xA000] = _CLS_CJK


def _codepoints(vals: list[str], n: int):
    """(codes uint32, doc int32, lens int64) for a list of strings — one
    utf-32 encode of the concatenated batch."""
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    joined = "".join(vals)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    doc = np.repeat(np.arange(n, dtype=np.int32), lens)
    return codes, doc, lens


def _truncate_idx(idx: np.ndarray, lens: np.ndarray, n: int,
                  inplace: bool = False) -> np.ndarray:
    """Invalidate (-1) every char past the per-doc _MAX_PPL_CHARS cap —
    touches ONLY the long docs (a slice assignment each) instead of
    building a full-stream position array (arange + repeat over every char
    was the hottest line in profiles). Marking -1 before the single valid
    filter is exactly equivalent to slicing the string first: the
    projection drops non-alphabet chars either way, and pair adjacency is
    formed on the filtered stream."""
    if lens.max(initial=0) <= _MAX_PPL_CHARS:
        return idx
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    if not inplace:
        idx = idx.copy()
    for d in np.flatnonzero(lens > _MAX_PPL_CHARS):
        idx[starts[d] + _MAX_PPL_CHARS:starts[d] + lens[d]] = -1
    return idx


def _perplexity_from_idx(idx: np.ndarray, doc: np.ndarray,
                         n: int) -> np.ndarray:
    """Scorer over a pre-classified int8 alphabet-index stream (truncation
    already applied; any value outside [0, 26] is invalid)."""
    out = np.full(n, np.nan)
    valid = (idx >= 0) & (idx < _A)
    idx, doc = idx[valid], doc[valid]
    if len(idx) < 2:
        return out
    same_doc = doc[:-1] == doc[1:]
    pair = idx[:-1].astype(np.int16) * _A + idx[1:]
    pair_doc = doc[:-1][same_doc]
    lps = _BIGRAM_LP_FLAT[pair[same_doc]]
    sums = np.bincount(pair_doc, weights=lps, minlength=n)
    counts = np.bincount(pair_doc, minlength=n)
    scorable = counts >= 1
    out[scorable] = np.exp(-(sums[scorable] / counts[scorable]))
    return out


def _perplexity_from_codes(codes: np.ndarray, doc: np.ndarray,
                           lens: np.ndarray, n: int) -> np.ndarray:
    """Core scorer over a pre-decoded codepoint stream (shared with
    quality_annotations_batch so the batch pipeline decodes the text ONCE).
    Truncation to the first _MAX_PPL_CHARS chars per doc is applied as a
    position mask — identical to slicing the string first."""
    if len(codes) == 0:
        return np.full(n, np.nan)
    idx = _truncate_idx(_CHAR_LUT_FULL[codes], lens, n, inplace=True)
    return _perplexity_from_idx(idx, doc, n)


def perplexity_batch(texts: pd.Series, params: dict | None = None) -> pd.Series:
    """Char-bigram perplexity: exp(-mean log P(c_i | c_{i-1})) over the
    case-folded [a-z ] projection of the first 1024 chars. NULL/too-short →
    NaN.

    Fully numpy-vectorized across the Arrow batch: one utf-32 decode, one
    int8 LUT gather (case folding baked into the LUT), flat-table bigram
    lookup, bincount-segmented mean — no per-row Python (the loop version
    cost ~10 µs/char; this is ~0.1 µs/char)."""
    n = len(texts)
    vals = ["" if not isinstance(t, str) else t for t in texts.array]
    codes, doc, lens = _codepoints(vals, n)
    return pd.Series(_perplexity_from_codes(codes, doc, lens, n),
                     index=texts.index)


@register_batch_function("PERPLEXITY_BELOW")
def perplexity_below(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: perplexity <= params['threshold'] (default 30).
    NULL text → NULL; unscorable (too short) → FALSE."""
    thr = float(params.get("threshold", 30.0))
    ppl = perplexity_batch(texts)
    pred = (ppl <= thr).fillna(False)
    return pred.where(texts.notna(), other=pd.NA)


# ----------------------------------------------------- C4/Gopher heuristics

_ALPHA_RE = re.compile(r"[A-Za-z]")
_STOP_RE = _MARKER_RE["en"]


def gopher_stats_batch(texts: pd.Series) -> pd.DataFrame:
    t = texts.fillna("")
    n = len(t)
    # token stats via the Arrow core (same dictionary/bincount shapes as
    # quality_annotations_batch); the alpha/stopword REGEX counts keep
    # their original pandas semantics (stop_ratio is deliberately \b-regex
    # over text here, unlike langid's token membership)
    rows, codes, _flat, vocab_pa, lens = _arrow_token_core(
        pa.Array.from_pandas(t))
    n_words = pd.Series(lens, index=texts.index)
    if len(codes):
        vocab_len = pc.utf8_length(vocab_pa) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tok_chars = np.bincount(rows, weights=vocab_len[codes], minlength=n)
        nv = len(vocab_pa)
        distinct = np.bincount(np.unique(rows * nv + codes) // nv,
                               minlength=n)
    else:
        tok_chars = np.zeros(n)
        distinct = np.zeros(n, dtype=np.int64)
    lens_nan = np.where(lens == 0, np.nan, lens)
    mean_word_len = pd.Series(tok_chars / lens_nan, index=texts.index)
    dup_frac = pd.Series(1.0 - distinct / lens_nan, index=texts.index)
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


def quality_annotations_batch(texts: pd.Series, thresholds=None,
                              with_perplexity: bool = True) -> pd.DataFrame:
    """All quality features + verdict for a batch, vectorized.

    Exactly mirrors operators/quality_filter.annotate_quality's Column path
    (gate set, thresholds, drop-reason priority) — parity is pytest-enforced.
    This is the pipeline's hot path: one Arrow transfer of the text column,
    one pandas pass, no Catalyst expression blowup.
    """
    from cloud_data_quality_spark.operators.quality_filter import (
        QualityThresholds,
    )
    t = thresholds or QualityThresholds()
    s = texts.fillna("")
    n = len(s)
    idx = s.index

    # decode the codepoint stream FIRST: it feeds the char-class ratios and
    # perplexity below, n_chars (len == codepoint count), and the
    # scrub-candidate prefilter (one bool-LUT gather + scatter instead of
    # a per-row regex scan)
    codes_full, doc_full, lens_chars = _codepoints(list(s.array), n)
    n_chars = pd.Series(lens_chars, index=idx).astype("int64")
    scrub_char_rows = np.zeros(n, dtype=bool)
    if len(codes_full):
        scrub_char_rows[doc_full[_SCRUB_CHAR_LUT[codes_full]]] = True

    # ---- token core, fully Arrow (C++): ONE ascii-whitespace split with
    # exact Java-\s parity (see _arrow_token_core), then every
    # token-derived feature (counts, lengths, marker hits, distinct) via
    # integer bincounts over the dictionary-encoded token stream — no
    # Python string objects are ever materialized for tokens
    arr_pa = pa.Array.from_pandas(s)
    rows, codes, _flat, vocab_pa, lens = _arrow_token_core(arr_pa)
    total = len(codes)
    n_words = pd.Series(lens, index=idx)
    if total:
        vocab_len = pc.utf8_length(vocab_pa) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tok_chars = np.bincount(rows, weights=vocab_len[codes], minlength=n)
        # distinct tokens per row: unique (row, code) pairs
        nv = len(vocab_pa)
        pair = rows * nv + codes
        uniq_rows = np.unique(pair) // nv
        distinct = np.bincount(uniq_rows, minlength=n)

        def marker_counts(words: list[str]) -> np.ndarray:
            # membership once per DICTIONARY entry, bincount per occurrence
            flag = pc.is_in(vocab_pa,
                            value_set=pa.array(words, type=pa.string())) \
                .to_numpy(zero_copy_only=False)
            return np.bincount(rows[flag[codes]], minlength=n)
    else:
        tok_chars = np.zeros(n)
        distinct = np.zeros(n, dtype=np.int64)

        def marker_counts(words: list[str]) -> np.ndarray:
            return np.zeros(n)

    lens_nan = np.where(lens == 0, np.nan, lens)
    mean_word_len = pd.Series(tok_chars / lens_nan, index=idx)
    dup_token_frac = pd.Series(1.0 - distinct / lens_nan, index=idx)

    # char-class ratios from ONE int8 class-LUT gather over the stream
    # (replaces two per-row regex scans, and the six uint32 range compares
    # this pass used before — these passes are memory-bandwidth bound, so
    # int8 class masks are the cheap form; the same class stream feeds
    # perplexity below, saving its second LUT gather)
    nchars_nan = n_chars.replace(0, np.nan).to_numpy(dtype=np.float64)
    if len(codes_full):
        cls = _CLASS_LUT[codes_full]
        # letters are classes 0-25 (case folded); space is 26, CJK 27
        alpha_cnt = np.bincount(doc_full[(cls >= 0) & (cls < 26)],
                                minlength=n)
        cjk_cnt = np.bincount(doc_full[cls == _CLS_CJK], minlength=n)
    else:
        cls = np.empty(0, dtype=np.int8)
        alpha_cnt = np.zeros(n)
        cjk_cnt = np.zeros(n)
    alpha = pd.Series(alpha_cnt / nchars_nan, index=idx)
    cjk = pd.Series(cjk_cnt / nchars_nan, index=idx)
    # duplicate-line fraction via the same Arrow dictionary trick (the
    # pandas path built a Python set per row); split_pattern keeps empty
    # segments exactly like str.split("\n"), so counts are identical
    ln = pc.split_pattern(arr_pa, pattern="\n")
    lcnt = pc.list_value_length(ln).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lenc = pc.list_flatten(ln).dictionary_encode()
    lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lrows = np.repeat(np.arange(n, dtype=np.int64), lcnt)
    nl_v = max(len(lenc.dictionary), 1)
    l_distinct = np.bincount(np.unique(lrows * nl_v + lcodes) // nl_v,
                             minlength=n)
    dup_line_frac = pd.Series(
        1.0 - l_distinct / np.where(lcnt == 0, np.nan, lcnt), index=idx)
    # toxicity regex only on rows that can match: two C-level substring
    # scans prefilter (exact superset — every pattern word contains
    # 'badword' or 'slur'), the \b regex then runs on the few candidates
    tox_cand = (s.str.contains("badword", regex=False)
                | s.str.contains("slur", regex=False))
    tox_np = np.zeros(n, dtype=bool)
    if bool(tox_cand.any()):
        # stay in numpy bool: assigning a pandas bool Series into a bool
        # Series upcasts to object dtype, where `~` is Python's bitwise-not
        # (~True == -2, truthy) and the toxicity gate silently passes everyone
        tox_np[tox_cand.to_numpy()] = s[tox_cand].str.contains(
            r"\b(?:badword1|badword2|slur1)\b", regex=True).to_numpy()
    tox = pd.Series(tox_np, index=idx)

    # langid from the same factorized marker counts (token membership —
    # identical semantics to functions.text.langid; parity pytest-enforced)
    scores = {lang_name: marker_counts(words)
              for lang_name, words in _MARKER_SETS.items()}
    lang = _langid_from_scores(s, scores, cjk.fillna(0.0))

    is_zh = lang == "zh"
    gates = [
        ("words", np.where(is_zh,
                           n_chars.between(t.min_words * 2, t.max_words * 8),
                           n_words.between(t.min_words, t.max_words))),
        ("word_len", is_zh | mean_word_len.between(
            t.min_mean_word_len, t.max_mean_word_len).fillna(False)),
        ("alpha", np.where(is_zh, (cjk >= t.min_cjk_ratio).fillna(False),
                           (alpha >= t.min_alpha_ratio).fillna(False))),
        ("repetition", ((dup_line_frac <= t.max_dup_line_frac)
                        & (dup_token_frac <= t.max_dup_token_frac)).fillna(False)),
        ("lang", (lang != "und").fillna(False)),
        ("toxicity", (~tox).fillna(False)),
    ]
    out = {
        "lang_pred": lang, "n_chars": n_chars, "n_words": n_words,
        "mean_word_len": mean_word_len, "alpha_ratio": alpha,
        "cjk_ratio": cjk, "dup_token_frac": dup_token_frac,
        "dup_line_frac": dup_line_frac, "has_toxicity": tox,
    }
    if with_perplexity:
        # reuse the class stream already gathered above — CJK (27) is
        # outside the scoring alphabet, so _perplexity_from_idx's
        # [0, 26] validity mask treats it exactly like the old LUT's -1
        ppl_idx = _truncate_idx(cls, n_chars.to_numpy(), n)
        ppl = pd.Series(_perplexity_from_idx(ppl_idx, doc_full, n)
                        if len(cls) else np.full(n, np.nan), index=idx)
        ppl[texts.isna()] = np.nan
        out["perplexity"] = ppl
        gates.append(("perplexity",
                      np.where(lang == "en",
                               (ppl <= t.max_perplexity).fillna(False), True)))
    reason = pd.Series([None] * len(s), index=s.index, dtype="object")
    decided = pd.Series(False, index=s.index)
    for name, ok in gates:
        ok = pd.Series(np.asarray(ok, dtype=bool), index=s.index)
        fail_here = ~ok & ~decided
        reason[fail_here] = name
        decided = decided | fail_here
    out["drop_reason"] = reason
    out["keep"] = ~decided
    out["scrubbed_text"] = scrub_batch(
        texts, candidates=pd.Series(scrub_char_rows | tox_cand.to_numpy(),
                                    index=idx))
    return pd.DataFrame(out, index=texts.index)


@register_batch_function("REPETITION_OK")
def repetition_ok(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule over the Gopher n-gram repetition signals
    (functions/corpus.repetition_fractions_batch): TRUE iff
    dup_gram_char_frac <= max_dup_frac AND top_gram_char_frac <=
    max_top_frac. Docs too short to form an n-gram are not judged (TRUE);
    NULL text → NULL. params: n (2), max_dup_frac (0.20),
    max_top_frac (0.18) — Gopher's published 2-gram bounds."""
    from cloud_data_quality_spark.functions.corpus import (
        repetition_fractions_batch,
    )
    n = int(params.get("n", 2))
    max_dup = float(params.get("max_dup_frac", 0.20))
    max_top = float(params.get("max_top_frac", 0.18))
    fr = repetition_fractions_batch(texts, n=n)
    fr.index = texts.index
    ok = ((fr["dup_gram_char_frac"].fillna(0.0) <= max_dup)
          & (fr["top_gram_char_frac"].fillna(0.0) <= max_top))
    return ok.where(texts.notna(), other=pd.NA)


@register_batch_function("NO_PII")
def no_pii(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule: TRUE iff no PII pattern matches. NULL text → NULL."""
    hit = pd.Series(False, index=texts.index)
    t = texts.fillna("")
    for rx in _PII_RES:
        hit = hit | t.str.contains(rx, regex=True)
    return (~hit).where(texts.notna(), other=pd.NA)


# cheap candidate detector: every scrub pattern needs '@' or a digit, and
# every toxicity word contains 'badword'/'slur' — rows without any of these
# cannot be changed, so the (7-regex) chain only runs on the matching subset.
# Deliberately a coarse superset: a full-pattern alternation detector costs
# as much as the chain itself (nested-quantifier backtracking per position).
_SCRUB_DETECT = re.compile(r"[@0-9]|badword|slur")


def scrub_batch(texts: pd.Series, params: dict | None = None,
                candidates: pd.Series | None = None) -> pd.Series:
    """Canonical scrub chain (same order as functions.scrub.scrub_text — the
    two paths are asserted byte-identical in tests).

    candidates: optional precomputed _SCRUB_DETECT row mask (must be an
    exact superset of rows any pattern can change); quality_annotations_
    batch derives it from its codepoint stream instead of the regex scan."""
    out = texts.copy()
    if candidates is None:
        candidates = out.fillna("").str.contains(_SCRUB_DETECT, regex=True)
    candidates = out.notna() & candidates
    s = out[candidates]
    for rx, repl in _SCRUB_STEPS:
        s = s.str.replace(rx, repl, regex=True)
    out[candidates] = s
    return out


@register_batch_function("CLASSIFIER_KEEP")
def classifier_keep(texts: pd.Series, params: dict) -> pd.Series:
    """Validity rule from the learned quality model (functions/classifier):
    TRUE iff the hashed-n-gram linear classifier's exact int64 score ≥
    min_score_micro (default 0 — the trained decision boundary). NULL text
    → NULL (the model would score it bias-only, but a missing document is
    a missingness fact, not a quality verdict — consistent with the other
    text rules here)."""
    from cloud_data_quality_spark.functions.classifier import (
        classifier_scores_batch,
    )
    min_score = int(params.get("min_score_micro", 0))
    scores = classifier_scores_batch(texts)
    ok = pd.Series(scores >= min_score, index=texts.index)
    return ok.where(texts.notna(), other=pd.NA)
