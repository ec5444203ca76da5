"""Property-based parity: the pandas batch path and the Column path must
agree on arbitrary text — unicode, weird whitespace, emptiness, punctuation.

Strategy: hypothesis generates a small corpus per case; we compare verdict
columns between annotate_quality (Column) and quality_annotations_batch
(pandas) driver-side (no Spark per example — the Column semantics are
checked against Spark once via the sampled-corpus test at the end)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from cloud_data_quality_spark.functions.webtext_rules import (
    langid_batch,
    quality_annotations_batch,
    scrub_batch,
)

text_strategy = st.one_of(
    st.none(),
    st.text(max_size=200),
    st.text(alphabet="abcdefghij @.-\n\t0123456789", max_size=300),
    st.sampled_from([
        "", " ", "\n\n", "the the the", "a@b.co", "555-123-4567",
        "这是中文", "der hund und die katze", "el la de que y en",
        "word " * 50, "#" * 40,
    ]),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_batch_annotator_never_crashes_and_is_deterministic(texts):
    s = pd.Series(texts, dtype="object")
    a = quality_annotations_batch(s, with_perplexity=True)
    b = quality_annotations_batch(s, with_perplexity=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["keep"].notna().all()
    # NULL/empty text never kept
    for i, t in enumerate(texts):
        if t is None or (isinstance(t, str) and not t.strip()):
            assert not a["keep"].iloc[i]


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_scrub_idempotent_and_null_preserving(texts):
    s = pd.Series(texts, dtype="object")
    once = scrub_batch(s)
    twice = scrub_batch(once)
    pd.testing.assert_series_equal(once, twice)
    for i, t in enumerate(texts):
        assert (once.iloc[i] is None or isinstance(once.iloc[i], str)) \
            if t is None or isinstance(t, str) else True
        if t is None:
            assert once.iloc[i] is None or pd.isna(once.iloc[i])


@settings(max_examples=150, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_langid_stable_under_batch_composition(texts):
    """Per-row function: splitting the batch must not change any answer."""
    s = pd.Series(texts, dtype="object")
    whole = langid_batch(s)
    parts = pd.concat([langid_batch(s.iloc[[i]]) for i in range(len(s))])
    assert list(whole) == list(parts)


@pytest.mark.parametrize("seed", [3, 11])
def test_spark_column_vs_batch_on_fuzzed_corpus(spark, seed):
    """Bridge to Spark: run both engines over a generated corpus slice and
    require identical verdict columns (the hypothesis tests above cover the
    pandas side broadly; this pins the Column path to it)."""
    from pyspark.sql import functions as F

    from cloud_data_quality_spark.operators.quality_filter import (
        annotate_quality,
        annotate_quality_arrow,
    )
    from cloud_data_quality_spark.sources.pages import generate_pages
    df = generate_pages(spark, 300, seed=seed)
    cols = ["url", "keep", "drop_reason", "lang_pred", "scrubbed_text"]
    a = annotate_quality_arrow(df).select(cols)
    b = annotate_quality(df, with_perplexity=True).select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


# ---- whitespace/tokenizer parity (the round-4 divergence class) ----

ws_text_strategy = st.one_of(
    st.none(),
    st.text(max_size=150),
    # heavy on the divergent whitespace: NBSP, line sep, \x0b, \x1c, ...
    st.text(alphabet="ab \t\n\x0b\x0c\r\x1c\x85\xa0 　.", max_size=80),
)


@settings(max_examples=300, deadline=None)
@given(ws_text_strategy)
def test_py_tokens_matches_duckdb_sql_tokens_fuzzed(text):
    """py_tokens is the sanctioned Python tokenizer; it must equal the
    generated DuckDB fragment on ARBITRARY unicode, not just ASCII."""
    import duckdb

    from cloud_data_quality_spark.functions.text import py_tokens
    from cloud_data_quality_spark.plans.oracle_fragments import sql_tokens
    con = duckdb.connect()
    con.execute("create table t(x varchar)")
    con.execute("insert into t values (?)", [text])
    got, = con.execute(f"select {sql_tokens('x')} from t").fetchone()
    assert py_tokens(text) == got, repr(text)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abqueryfastream\x02\x03 -", max_size=40))
def test_bpe_count_matches_duckdb_fuzzed(word_soup):
    """doc_token_count (Python/Arrow core) equals the DuckDB merge-chain
    replay, including sentinel chars in the input."""
    import duckdb

    from cloud_data_quality_spark.functions.bpe_artifact import (
        doc_token_count)
    from cloud_data_quality_spark.plans.oracle_fragments import (
        sql_bpe_token_count)
    con = duckdb.connect()
    con.execute("create table t(x varchar)")
    con.execute("insert into t values (?)", [word_soup])
    got, = con.execute(
        f"select {sql_bpe_token_count('x')} from t").fetchone()
    assert doc_token_count(word_soup) == got, repr(word_soup)


def test_spark_tokens_vs_py_tokens_fuzzed_corpus(spark):
    """Bridge to Spark for the tokenizer: one job over a hypothesis-shaped
    corpus of divergent-whitespace strings."""
    import random

    from pyspark.sql import functions as F

    from cloud_data_quality_spark.functions import text as TX
    rng = random.Random(7)
    alphabet = "ab \t\n\x0b\x0c\r\x1c\x85\xa0 　."
    rows = [(i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 60))))
            for i in range(300)]
    df = spark.createDataFrame(rows, "i int, x string")
    got = {r["i"]: r["t"] for r in
           df.select("i", TX.tokens(F.col("x")).alias("t")).collect()}
    for i, x in rows:
        assert got[i] == TX.py_tokens(x), repr(x)


def test_canonicalize_url_vs_duckdb_fuzzed_corpus(spark):
    """Spark canonicalize_url vs a DuckDB replay generated from the SAME
    pattern/prefix constants, over fuzzed URLs (mixed-case schemes, ports,
    userinfo, tracking params, fragments, garbage)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from cloud_data_quality_spark.functions.hosts import (
        TRACKING_PARAM_PREFIXES,
        TRACKING_PARAMS_EXACT,
        URL_SPLIT_PATTERN,
        canonicalize_url,
    )
    rng = random.Random(13)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp", ""]
    hosts = ["A.org", "x.Y.net:443", "b.io:80", "c.d:8080", "user@e.f"]
    paths = ["", "/", "/P/q", "/a b"]
    queries = ["", "?utm_source=1", "?id=2&UTM_x=3&k=4", "?REF=z&q=t",
               "?a=1&a=2", "?gclid=9", "?refund_id=5&ref=y&referrer=x"]
    frags = ["", "#f", "#x?y"]
    urls = []
    for i in range(400):
        if i % 17 == 0:
            urls.append(rng.choice(["not a url", "", "://x", "a b c"]))
        else:
            urls.append(f"{rng.choice(schemes)}://{rng.choice(hosts)}"
                        f"{rng.choice(paths)}{rng.choice(queries)}"
                        f"{rng.choice(frags)}")
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c"))
           .collect()}
    exact = ", ".join(f"'{p}'" for p in TRACKING_PARAMS_EXACT)
    tracking = " or ".join(
        [f"lower(string_split(kv, '=')[1]) in ({exact})"]
        + [f"starts_with(lower(string_split(kv, '=')[1]), '{p}')"
           for p in TRACKING_PARAM_PREFIXES])
    con = duckdb.connect()
    con.execute("create table u(i int, url varchar)")
    con.executemany("insert into u values (?, ?)", list(enumerate(urls)))
    duck = dict(con.execute(f"""
with p as (select i, url,
      lower(coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 1), '')) as scheme,
      lower(coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 2), '')) as rawhost,
      coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 3), '') as path,
      coalesce(regexp_extract(url, '{URL_SPLIT_PATTERN}', 4), '') as query
   from u),
h as (select *, case when scheme = 'http' then regexp_replace(rawhost, ':80$', '')
                     when scheme = 'https' then regexp_replace(rawhost, ':443$', '')
                     else rawhost end as host from p),
q as (select i, url, scheme, host,
             case when length(path) = 0 then '/' else path end as path,
             array_to_string(list_filter(string_split(query, '&'),
                 kv -> length(kv) > 0 and not ({tracking})), '&') as qs
      from h)
select i, case when length(scheme) > 0
          then scheme || '://' || host || path ||
               case when length(qs) > 0 then '?' || qs else '' end
          else url end from q""").fetchall())
    assert got == duck


def test_c4_line_filter_vs_python_replay_fuzzed(spark):
    """c4_line_filter (pure Column) vs an independent Python restatement of
    the C4 §2.2 rules, over fuzzed multi-line docs."""
    import random
    import re as _re

    from cloud_data_quality_spark.functions.corpus import (
        C4_DOC_BLOCK_SUBSTRINGS,
        C4_LINE_BLOCK_SUBSTRING,
        C4_MIN_LINE_WORDS,
        C4_MIN_LINES_KEPT,
        c4_line_filter,
    )
    rng = random.Random(29)
    frag = ["good solid line with many proper words",
            "short", "uses javascript inside it plenty of words",
            "Lorem ipsum mention", "curly { brace", "tab\thonors words"]
    docs = []
    for i in range(300):
        lines = []
        for _ in range(rng.randrange(0, 7)):
            base = rng.choice(frag)
            end = rng.choice([".", "!", "?", '"', "", " .", ". "])
            lines.append(base + end)
        docs.append((i, "\n".join(lines) if lines else
                     rng.choice([None, "", "   "])))
    out = {r["doc_id"]: r for r in c4_line_filter(
        spark.createDataFrame(docs, "doc_id int, text string")).collect()}

    def line_ok(line):
        t = line.strip(" ")
        words = [w for w in _re.split(r"[\t\x0b\f\r ]+", t) if w]
        return (bool(_re.search(r'[.!?"]$', t))
                and len(words) >= C4_MIN_LINE_WORDS
                and C4_LINE_BLOCK_SUBSTRING not in t.lower())

    for i, text in docs:
        kept = [ln for ln in (text or "").split("\n") if line_ok(ln)] \
            if text is not None else []
        keep = (len(kept) >= C4_MIN_LINES_KEPT
                and text is not None
                and not any(s in text.lower()
                            for s in C4_DOC_BLOCK_SUBSTRINGS))
        r = out[i]
        assert r["keep"] == keep, (i, text)
        assert r["n_lines_kept"] == len(kept), (i, text)
        if keep:
            assert r["clean_text"] == "\n".join(kept), i


@pytest.mark.parametrize("seed", [5, 23])
def test_vocab_oov_parity_on_nasty_corpus(spark, seed):
    """Vocabulary + OOV-rate cross-engine parity on the divergence-prone
    text class: exotic whitespace (\\x0b is Java-\\s but not RE2-\\s),
    CRLF, trailing separators, unicode, NULL/empty — the tokenizer is the
    only shared semantic, so this fuzzes exactly the layer that can
    drift."""
    import random

    import duckdb

    from cloud_data_quality_spark.functions.corpus import (
        build_vocabulary,
        oov_stats,
    )
    from cloud_data_quality_spark.plans.registry_corpus import (
        _VOCAB_TOP_N,
        _oracle_vocab_oov_docs,
    )
    rng = random.Random(seed)
    pieces = ["w%d" % i for i in range(30)] + [
        "", " ", "\t", "\x0b", "\r\n", "\n", "…", " x", "中文",
        "a,b", "end.", "x " * 5]
    rows = []
    for i in range(120):
        txt = (None if i % 17 == 0 else
               "".join(rng.choice(pieces) + rng.choice([" ", "\n", ""])
                       for _ in range(rng.randint(0, 12))))
        rows.append((i, txt))
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = (oov_stats(sdf, build_vocabulary(sdf, top_n=_VOCAB_TOP_N))
           .orderBy("doc_id").collect())
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    want = con.sql(_oracle_vocab_oov_docs() + " order by doc_id").fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]


def test_dedup_lines_vs_python_replay_fuzzed(spark):
    """dedup_lines_in_doc (higher-order Column filter) vs an independent
    pure-Python replay over nasty line structures: CRs kept verbatim (the
    operator splits on \\n ONLY — CRLF handling is normalize_text's job),
    unicode spaces, repeated blanks, dup lines at every offset, empties."""
    import random
    from cloud_data_quality_spark.functions.corpus import dedup_lines_in_doc

    rng = random.Random(7)
    pieces = ["a", "b b", "", " ", " ", "x\r", "x", "tail words",
              "​zw", "a", "line line line"]
    texts = [None, "", "\n", "\n\n", "a\na\na"]
    for _ in range(120):
        texts.append("\n".join(rng.choice(pieces)
                               for _ in range(rng.randrange(0, 9))))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in dedup_lines_in_doc(df).collect()}
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] == (None, None, None)
            continue
        lines = t.split("\n")
        kept = [ln for j, ln in enumerate(lines)
                if ln == "" or lines.index(ln) == j]
        assert got[i] == ("\n".join(kept), len(lines),
                          len(lines) - len(kept)), f"doc {i}: {t!r}"


def test_encoding_stats_vs_duckdb_fuzzed_corpus(spark):
    """encoding_stats vs a DuckDB replay generated from the SAME class
    constants over fuzzed mojibake: replacement chars, C0 controls, zero
    widths, curly punctuation, NBSP, clean ASCII, NULL/empty."""
    import random

    import duckdb

    from cloud_data_quality_spark.functions.corpus import encoding_stats
    from cloud_data_quality_spark.functions.text import (
        NORM_CTRL_RE,
        NORM_ZERO_WIDTH_RE,
    )
    from cloud_data_quality_spark.plans.oracle_fragments import (
        sql_normalize_text,
    )
    rng = random.Random(21)
    atoms = ["ok", "�", "\x07", "\x1f", "​", "‍", "﻿",
             "“q”", "—", " ", " ", "\t", "\n", "x\r",
             "…", "tail"]
    texts = [None, "", "���"]
    for _ in range(150):
        texts.append("".join(rng.choice(atoms)
                             for _ in range(rng.randrange(1, 12))))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r["doc_id"]: (r["n_chars"], r["n_replacement"], r["n_ctrl"],
                         r["n_zero_width"], r["is_normalized"])
           for r in encoding_stats(df).collect()}
    con = duckdb.connect()
    con.execute("create table d(doc_id int, text varchar)")
    con.executemany("insert into d values (?, ?)",
                    list(enumerate(texts)))
    norm = sql_normalize_text("text")
    duck = {r[0]: tuple(r[1:]) for r in con.execute(f"""
select doc_id,
  length(text)::BIGINT,
  (length(text) - length(regexp_replace(text, '\\x{{FFFD}}', '', 'g')))::BIGINT,
  (length(text) - length(regexp_replace(text, '{NORM_CTRL_RE}', '', 'g')))::BIGINT,
  (length(text) - length(regexp_replace(text, '{NORM_ZERO_WIDTH_RE}', '', 'g')))::BIGINT,
  ({norm} = text)
from d""").fetchall()}
    assert got == duck


def test_temperature_mix_vs_duckdb_fuzzed_strata(spark):
    """temperature_mix (alpha=0.5) vs a DuckDB replay of the
    sqrt(n_min/n_s) 60-bit thresholds over fuzzed stratum layouts:
    extreme skew, singletons, equal sizes, two strata of size 1."""
    import random

    import duckdb
    rng = random.Random(99)
    from cloud_data_quality_spark.functions.corpus import temperature_mix
    layouts = [
        {"a": 1, "b": 1},
        {"a": 1000, "b": 1},
        {"a": 7, "b": 7, "c": 7},
        {rng.choice("abcdef"): rng.randrange(1, 400) for _ in range(5)},
        {"x": 313},
    ]
    for li, layout in enumerate(layouts):
        rows = [(f"{s}{i}", s) for s, n in sorted(layout.items())
                for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id string, lang string")
        got = {r["doc_id"] for r in
               temperature_mix(df, "lang", alpha=0.5,
                               salt=f"z{li}").collect()}
        con = duckdb.connect()
        con.execute("create table d(doc_id varchar, lang varchar)")
        con.executemany("insert into d values (?, ?)", rows)
        duck = {r[0] for r in con.execute(f"""
with counts as (select lang, count(*)::DOUBLE as n from d group by lang),
mn as (select min(n) as m from counts),
rates as (select lang,
                 floor(sqrt(m / n) * 1152921504606846976.0)::BIGINT as thr
          from counts cross join mn)
select doc_id from d join rates using (lang)
where ('0x' || substr(md5(doc_id || '|z{li}'), 1, 15))::BIGINT < thr
""").fetchall()}
        assert got == duck, f"layout {li}: {layout}"


def test_script_stats_vs_duckdb_fuzzed_corpus(spark):
    """script_stats vs a DuckDB replay from the SAME range constants over
    fuzzed script mixes (incl. boundary codepoints of each range)."""
    import random

    import duckdb

    from cloud_data_quality_spark.functions.corpus import (
        SCRIPT_RANGES,
        script_stats,
    )
    rng = random.Random(5)
    atoms = ["a", "Z", "À", "ɏ", "぀", "ヿ", "一",
             "鿿", "가", "Ѐ", "ӿ", "؀", "ݿ",
             "Ͱ", "Ͽ", "ऀ", "ॿ", " ", "1", "!",
             "☃"]  # snowman: in NO range
    texts = [None, "", "☃☃"]
    for _ in range(150):
        texts.append("".join(rng.choice(atoms)
                             for _ in range(rng.randrange(1, 15))))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r["doc_id"]: tuple(r)[1:] for r in script_stats(df).collect()}
    con = duckdb.connect()
    con.execute("create table d(doc_id int, text varchar)")
    con.executemany("insert into d values (?, ?)", list(enumerate(texts)))
    names = [n for n, _ in SCRIPT_RANGES]
    cnt = ", ".join(
        f"(length(text) - length(regexp_replace(text, '{rg}', '', 'g')))"
        f"::BIGINT as n_{n}" for n, rg in SCRIPT_RANGES)
    dom = " ".join(
        f"when n_{n} = greatest({', '.join('n_' + m for m in names)}) "
        f"and n_{n} > 0 then '{n}'" for n in names)
    duck = {r[0]: tuple(r)[1:] for r in con.execute(f"""
with c as (select doc_id, {cnt} from d)
select doc_id, ({' + '.join('n_' + n for n in names)}) as n_letters,
       {', '.join('n_' + n for n in names)},
       case {dom} end as dominant from c""").fetchall()}
    assert got == duck


def test_readability_vs_python_replay_fuzzed(spark):
    """readability_stats vs an independent pure-Python replay of the
    counts (words via py_tokens, sentences via [.!?]+ runs, syllables via
    whole-text vowel runs + vowel-less-word floor) over fuzzed text."""
    import random
    import re

    from cloud_data_quality_spark.functions.corpus import readability_stats
    from cloud_data_quality_spark.functions.text import py_tokens

    rng = random.Random(17)
    atoms = ["The cat sat.", "xyz", "a!!", "why try fly", "", "  ",
             "Mr. O'Neil went home?!", "co-op re-entry.", "\trhythm\n",
             "AEIOU aeiou yyy."]
    texts = [None, "", "..."]
    for _ in range(120):
        texts.append(" ".join(rng.choice(atoms)
                              for _ in range(rng.randrange(1, 6))))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"])
           for r in readability_stats(df).collect()}
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] == (None, None, None)
            continue
        toks = py_tokens(t)
        n_sent = len(re.findall(r"[.!?]+", t))
        runs = len(re.findall(r"[aeiouy]+", t.lower()))
        no_vowel = sum(1 for w in toks
                       if not re.search(r"[aeiouy]", w.lower()))
        assert got[i] == (len(toks), n_sent, runs + no_vowel), \
            f"doc {i}: {t!r}"
