"""DuckDB-SQL fragments mirroring functions/text.py Column builders.

Every heuristic the driver's correctness gate checks has TWO implementations:
the Spark Column expression (functions/text.py) and the ANSI/DuckDB SQL here.
To keep them in lockstep, the SQL is *generated from the same Python
constants* (stopword lists, thresholds) — a drifted list would break parity
tests immediately.

DuckDB-vs-Spark dialect notes embedded per fragment:
* split: regexp_split_to_array vs split — both regex, both keep no empties
  after trim-guard;
* regexp_replace needs the 'g' flag in DuckDB (Spark replaces all by default);
* CJK class: DuckDB RE2 wants \\x{4e00}; Spark Java regex accepts the literal
  range (we use literal chars in Spark, \\x escapes here);
* integer division: `/` yields double in both (DuckDB `//` is the int one).
"""

from __future__ import annotations

from cloud_data_quality_spark.functions.text import (
    DE_MARKERS,
    EN_STOPWORDS,
    ES_MARKERS,
    FR_MARKERS,
)

def sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def sql_trim(col: str) -> str:
    """Spark's trim() strips SPACES only; DuckDB's default trim strips
    Unicode whitespace (NBSP etc.) — pin the char set explicitly."""
    return f"trim({col}, ' ')"


#: the one whitespace definition both engines run identically: Java \s
#: includes \x0B, RE2 \s does not, so both sides spell the class out
SQL_WS_CLASS = r"[\t\n\x0b\f\r ]+"


def sql_tokens(col: str) -> str:
    # list_filter mirrors tokens()'s empty-token filter (trim strips spaces
    # only, so trailing newlines would otherwise yield a phantom '' token)
    return (f"case when length({sql_trim(col)}) = 0 or {col} is null "
            f"then []::VARCHAR[] "
            f"else list_filter(regexp_split_to_array({sql_trim(col)}, "
            f"'{SQL_WS_CLASS}'), t -> t != '') end")


def sql_word_count(col: str) -> str:
    return f"len({sql_tokens(col)})::BIGINT"


def sql_char_count(col: str) -> str:
    return f"coalesce(length({col}), 0)::BIGINT"


def sql_mean_word_len(col: str) -> str:
    t = sql_tokens(col)
    return (f"(list_sum(list_transform({t}, w -> length(w)))::DOUBLE"
            f" / nullif(len({t}), 0))")


def sql_marker_count(col: str, words: list[str]) -> str:
    t = sql_tokens(col)
    return f"len(list_filter({t}, w -> list_contains({sql_list(words)}, w)))::BIGINT"


def sql_stopword_ratio(col: str) -> str:
    t = sql_tokens(col)
    return (f"({sql_marker_count(col, EN_STOPWORDS)}::DOUBLE"
            f" / nullif(len({t}), 0))")


def sql_alpha_ratio(col: str) -> str:
    return (f"(length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))::DOUBLE"
            f" / nullif(length({col}), 0))")


def sql_cjk_ratio(col: str) -> str:
    return (f"(length(regexp_replace({col}, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))"
            f"::DOUBLE / nullif(length({col}), 0))")


def sql_dup_token_frac(col: str) -> str:
    t = sql_tokens(col)
    return (f"(1.0 - len(list_distinct({t}))::DOUBLE / nullif(len({t}), 0))")


def sql_dup_line_frac(col: str) -> str:
    ls = f"string_split({col}, chr(10))"
    return (f"(1.0 - len(list_distinct({ls}))::DOUBLE / nullif(len({ls}), 0))")


def sql_langid(col: str) -> str:
    """Mirrors functions.text.langid: CJK ratio gate then marker-count argmax
    with en > es > fr > de priority, 'und' fallback."""
    s_en = sql_marker_count(col, EN_STOPWORDS)
    s_es = sql_marker_count(col, ES_MARKERS)
    s_fr = sql_marker_count(col, FR_MARKERS)
    s_de = sql_marker_count(col, DE_MARKERS)
    return f"""case
      when {sql_cjk_ratio(col)} > 0.30 then 'zh'
      when {s_en} >= {s_es} and {s_en} >= {s_fr} and {s_en} >= {s_de}
           and {s_en} >= 1 then 'en'
      when {s_es} >= {s_fr} and {s_es} >= {s_de} and {s_es} >= 1 then 'es'
      when {s_fr} >= {s_de} and {s_fr} >= 1 then 'fr'
      when {s_de} >= 1 then 'de'
      else 'und' end"""


def sql_fingerprint(col: str) -> str:
    return f"md5(lower({sql_trim(col)}))"


def sql_word_shingles(col: str, n: int = 3) -> str:
    t = sql_tokens(col)
    # starts are 1-based 1..len-n+1; DuckDB range(a, b) is [a, b)
    return (f"case when len({t}) < {n} then []::VARCHAR[] else "
            f"list_distinct(list_transform(range(1, len({t}) - {n} + 2), "
            f"i -> array_to_string(({t})[i:i+{n - 1}], ' '))) end")


# scrub chain — same canonical order as functions/scrub.py (generated from
# the same SCRUB_PATTERNS/TOXICITY_WORDS constants)
def sql_scrub(col: str) -> str:
    from cloud_data_quality_spark.functions.scrub import (
        SCRUB_PATTERNS,
        TOXICITY_WORDS,
    )
    out = col
    for _, pattern, repl in SCRUB_PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    for w in TOXICITY_WORDS:
        out = f"regexp_replace({out}, '\\b{w}\\b', '<TOX>', 'g')"
    return out


# html → text extraction — generated from the SAME pattern/entity constants
# as functions/html_extract.py so the two engines cannot drift. DuckDB note:
# regexp_replace needs the 'g' flag; (?s) inline dotall works in RE2 exactly
# as in Java regex for these patterns (no backrefs/lookaround).
def sql_extract_text(col: str) -> str:
    from cloud_data_quality_spark.functions.html_extract import (
        HTML_ENTITIES,
        HTML_STRIP_PATTERNS,
    )
    out = col
    for pat in HTML_STRIP_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '', 'g')"
    for ent, ch in HTML_ENTITIES:
        e, c = ent.replace("'", "''"), ch.replace("'", "''")
        out = f"replace({out}, '{e}', '{c}')"
    return out


# BPE token count — generated from the SAME embedded merge table as the
# Spark/Arrow encoder (functions/bpe_artifact.py). Encoding: each word is
# exploded to chr(2)||c||chr(3) per character, then the merge chain is a
# sequence of replace() calls (leftmost non-overlapping in both engines —
# the exact training-time semantics); token count = remaining chr(2)
# markers summed over the document's whitespace words.
def sql_bpe_token_count(col: str) -> str:
    from cloud_data_quality_spark.functions.bpe_artifact import BPE_MERGES

    def q(s: str) -> str:
        return s.replace("'", "''")

    enc = ("array_to_string(list_transform(range(1, length(w) + 1), "
           "i -> chr(2) || substr(w, i, 1) || chr(3)), '')")
    for a, b in BPE_MERGES:
        pat = f"chr(2) || '{q(a)}' || chr(3) || chr(2) || '{q(b)}' || chr(3)"
        rep = f"chr(2) || '{q(a + b)}' || chr(3)"
        enc = f"replace({enc}, {pat}, {rep})"
    toks = sql_tokens(col)
    stripped = (f"list_transform({toks}, "
                f"w -> replace(replace(w, chr(2), ''), chr(3), ''))")
    encoded = f"list_transform({stripped}, w -> {enc})"
    return (f"coalesce(list_sum(list_transform({encoded}, "
            f"s -> length(s) - length(replace(s, chr(2), '')))), 0)"
            f"::BIGINT")


def sql_bpe_tokens(col: str) -> str:
    """Subword token ARRAYS per document — same merge-chain replay as
    sql_bpe_token_count, but returning the tokens themselves (the twin of
    bpe_artifact.bpe_tokens_column)."""
    from cloud_data_quality_spark.functions.bpe_artifact import BPE_MERGES

    def q(s: str) -> str:
        return s.replace("'", "''")

    enc = ("array_to_string(list_transform(range(1, length(w) + 1), "
           "i -> chr(2) || substr(w, i, 1) || chr(3)), '')")
    for a, b in BPE_MERGES:
        pat = f"chr(2) || '{q(a)}' || chr(3) || chr(2) || '{q(b)}' || chr(3)"
        rep = f"chr(2) || '{q(a + b)}' || chr(3)"
        enc = f"replace({enc}, {pat}, {rep})"
    stripped = (f"list_transform({sql_tokens(col)}, "
                f"w -> replace(replace(w, chr(2), ''), chr(3), ''))")
    word_toks = (f"list_transform(list_filter(string_split({enc}, chr(2)), "
                 f"t -> t != ''), t -> substr(t, 1, length(t) - 1))")
    return (f"coalesce(flatten(list_transform({stripped}, w -> {word_toks})), "
            f"[]::VARCHAR[])")


def sql_escape_text(col: str) -> str:
    from cloud_data_quality_spark.functions.html_extract import HTML_ENTITIES
    out = col
    for ent, ch in reversed(HTML_ENTITIES):
        e, c = ent.replace("'", "''"), ch.replace("'", "''")
        out = f"replace({out}, '{c}', '{e}')"
    return out


def sql_normalize_text(col: str) -> str:
    """DuckDB twin of text.normalize_text, generated from the same
    constants. DuckDB string literals are escape-free, so the \\x{...}
    regex escapes pass to RE2 verbatim; translate() has identical
    shorter-replacement-deletes semantics in both engines."""
    from cloud_data_quality_spark.functions.text import (
        NORM_CTRL_RE,
        NORM_TRANSLATE_FROM,
        NORM_TRANSLATE_TO,
        NORM_ZERO_WIDTH_RE,
    )
    to_escaped = NORM_TRANSLATE_TO.replace("'", "''")
    s = f"regexp_replace({col}, '{NORM_ZERO_WIDTH_RE}', '', 'g')"
    s = f"translate({s}, '{NORM_TRANSLATE_FROM}', '{to_escaped}')"
    s = f"regexp_replace({s}, '…', '...', 'g')"
    s = f"regexp_replace({s}, '{NORM_CTRL_RE}', '', 'g')"
    s = f"regexp_replace({s}, '[\\t ]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' \\n', chr(10), 'g')"
    return f"trim({s}, ' ')"
