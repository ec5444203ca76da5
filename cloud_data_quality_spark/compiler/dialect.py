"""BigQuery-SQL → Spark-SQL dialect shim.

The reference's rule library is written in BigQuery Standard SQL (e.g.
configs/rules/base-rules.yml, docs/examples/advanced_rules/*.yaml). So that
those YAML configs run unchanged on this engine, we rewrite the handful of
BQ-isms they use into Spark SQL. This is a *narrow, rule-library-scoped* shim
— not a general transpiler; unknown constructs pass through and fail loudly at
Spark analysis time.

Covered function surface (SURVEY.md §2.9):
REGEXP_CONTAINS → RLIKE, COUNTIF → count_if, SAFE_DIVIDE → try_divide,
IFNULL → coalesce (Spark has ifnull but coalesce is canonical),
PARSE_DATE('%Y%m', x) → to_date(x,'yyyyMM'), PARSE_TIMESTAMP,
TIMESTAMP_SUB/DATE_SUB(…, INTERVAL n unit) → interval arithmetic,
TIMESTAMP_TRUNC/DATE_TRUNC argument order, CAST('inf' AS FLOAT64),
FLOAT64/INT64 type names, UNNEST (three forms — see _rewrite_unnest),
`dotted.table.names` quoted whole → per-part backtick quoting; plus
user-authored BQ-isms beyond the shipped library: SAFE_CAST → try_cast,
ARRAY_LENGTH → size, STARTS_WITH/ENDS_WITH, LOGICAL_AND/OR → bool_and/or,
TIMESTAMP_DIFF/DATE_DIFF (BQ's a−b becomes Spark's (unit, b, a) order),
FORMAT_DATE/FORMAT_TIMESTAMP → date_format.

Regex-dialect caveat (SURVEY.md hard-part #2): BQ regexes are RE2, Spark's
are java.util.regex. Common classes (\\d \\w \\s, character classes,
anchors, bounded repeats) behave identically; RE2-only or Java-only
constructs (backreferences, lookaround — Java-only; \\p{...} differences)
are NOT translated. Rule authors stay within the common subset, which is
all the reference's shipped rules use.
"""

from __future__ import annotations

import re

_DATE_FMT = {
    "%Y%m": "yyyyMM",
    "%Y-%m-%d": "yyyy-MM-dd",
    "%Y%m%d": "yyyyMMdd",
    "%F %T %Z": "yyyy-MM-dd HH:mm:ss zzz",
    "%F %T": "yyyy-MM-dd HH:mm:ss",
}


_RULES: list[tuple[re.Pattern, object]] = [
    # name-only rewrites (argument-shape-agnostic, safe under nesting)
    (re.compile(r"\bCOUNTIF\s*\(", re.IGNORECASE), "count_if("),
    (re.compile(r"\bSAFE_DIVIDE\s*\(", re.IGNORECASE), "try_divide("),
    (re.compile(r"\bIFNULL\s*\(", re.IGNORECASE), "coalesce("),
    (re.compile(r"\bFLOAT64\b", re.IGNORECASE), "DOUBLE"),
    (re.compile(r"\bINT64\b", re.IGNORECASE), "BIGINT"),
    (re.compile(r"\bTIMESTAMP_MILLIS\s*\(", re.IGNORECASE), "timestamp_millis("),
    # common user-authored BQ-isms beyond the shipped rule library
    (re.compile(r"\bSAFE_CAST\s*\(", re.IGNORECASE), "try_cast("),
    (re.compile(r"\bARRAY_LENGTH\s*\(", re.IGNORECASE), "size("),
    (re.compile(r"\bSTARTS_WITH\s*\(", re.IGNORECASE), "startswith("),
    (re.compile(r"\bENDS_WITH\s*\(", re.IGNORECASE), "endswith("),
    (re.compile(r"\bLOGICAL_AND\s*\(", re.IGNORECASE), "bool_and("),
    (re.compile(r"\bLOGICAL_OR\s*\(", re.IGNORECASE), "bool_or("),
]


# --------------------------------------------------------------------------
# Multi-argument call rewrites — paren/quote-balance scanned, NOT regex
# argument matching: nested calls (TIMESTAMP_DIFF(a, COALESCE(b, c), DAY))
# and string literals containing commas/parens split correctly. A call whose
# argument shape a renderer doesn't recognize is left UNTRANSLATED (its
# arguments still recursively rewritten), so Spark fails loudly with the
# original BQ function name instead of executing mangled SQL.
# --------------------------------------------------------------------------

_INTERVAL_ARG = re.compile(r"^INTERVAL\s+(\d+)\s+(\w+)$", re.IGNORECASE)
_WORD_ARG = re.compile(r"^\w+$")
_SIMPLE_LIT = re.compile(r"^r?('(?:[^'\\]|\\.)*')$", re.IGNORECASE)


def _lit(arg: str) -> str | None:
    """Inner text of a plain (optionally r-prefixed) string literal, else None."""
    m = _SIMPLE_LIT.match(arg.strip())
    return m.group(1)[1:-1] if m else None


def _r_regexp_contains(args: list[str]) -> str | None:
    # REGEXP_CONTAINS(x, 'p') → (x RLIKE 'p'); non-literal patterns stay BQ
    if len(args) != 2 or _lit(args[1]) is None:
        return None
    pat = args[1].strip()
    if pat[0] in "rR":  # Spark has no r'' literals; the shim layer below
        pat = pat[1:]   # (RE2→Java) already handles dialect differences
    return f"({args[0]} RLIKE {pat})"


def _r_parse(fn: str):
    def render(args: list[str]) -> str | None:
        fmt = _lit(args[0]) if len(args) == 2 else None
        if fmt is None:
            return None
        return f"{fn}({args[1]}, '{_DATE_FMT.get(fmt, fmt)}')"
    return render


def _r_ts_sub(args: list[str]) -> str | None:
    # TIMESTAMP_SUB(ts, INTERVAL n UNIT) → (ts - INTERVAL n UNIT)
    m = _INTERVAL_ARG.match(args[1].strip()) if len(args) == 2 else None
    return f"({args[0]} - INTERVAL {m.group(1)} {m.group(2)})" if m else None


def _r_date_addsub(fn: str):
    def render(args: list[str]) -> str | None:
        m = _INTERVAL_ARG.match(args[1].strip()) if len(args) == 2 else None
        if not m or m.group(2).upper() != "DAY":
            return None
        return f"{fn}({args[0]}, {m.group(1)})"
    return render


def _r_trunc(args: list[str]) -> str | None:
    # BQ: TIMESTAMP_TRUNC(ts, DAY) → date_trunc('DAY', ts)
    if len(args) != 2 or not _WORD_ARG.match(args[1].strip()):
        return None
    return f"date_trunc('{args[1].strip().upper()}', {args[0]})"


def _r_ts_diff(args: list[str]) -> str | None:
    # BQ TIMESTAMP_DIFF(a, b, UNIT) = a - b in UNITs;
    # Spark timestampdiff(UNIT, start, end) = end - start → swap the args
    if len(args) != 3 or not _WORD_ARG.match(args[2].strip()):
        return None
    return f"timestampdiff({args[2].strip().upper()}, {args[1]}, {args[0]})"


def _r_date_diff(args: list[str]) -> str | None:
    if len(args) != 3 or args[2].strip().upper() != "DAY":
        return None
    return f"datediff({args[0]}, {args[1]})"


def _r_format(args: list[str]) -> str | None:
    fmt = _lit(args[0]) if len(args) == 2 else None
    if fmt is None:
        return None
    return f"date_format({args[1]}, '{_DATE_FMT.get(fmt, fmt)}')"


_CALL_RENDER: dict[str, object] = {
    "REGEXP_CONTAINS": _r_regexp_contains,
    "PARSE_DATE": _r_parse("to_date"),
    "PARSE_TIMESTAMP": _r_parse("to_timestamp"),
    "TIMESTAMP_SUB": _r_ts_sub,
    "DATETIME_SUB": _r_ts_sub,
    "DATE_SUB": _r_date_addsub("date_sub"),
    "DATE_ADD": _r_date_addsub("date_add"),
    "TIMESTAMP_TRUNC": _r_trunc,
    "DATE_TRUNC": _r_trunc,
    "TIMESTAMP_DIFF": _r_ts_diff,
    "DATETIME_DIFF": _r_ts_diff,
    "DATE_DIFF": _r_date_diff,
    "FORMAT_DATE": _r_format,
    "FORMAT_TIMESTAMP": _r_format,
}

_CALL_OPEN = re.compile(
    r"\b(" + "|".join(_CALL_RENDER) + r")\s*\(", re.IGNORECASE)


def _skip_string(sql: str, i: int) -> int:
    """i at an opening quote; return index just past the closing quote.
    Handles backslash escapes and '' doubling (BQ string semantics)."""
    n = len(sql)
    i += 1
    while i < n:
        c = sql[i]
        if c == "\\":
            i += 2
            continue
        if c == "'":
            if i + 1 < n and sql[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return n


def _scan_balanced(sql: str, i: int) -> int | None:
    """i just past an opening '('; return index just past its match."""
    depth, n = 1, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i = _skip_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return None


def _split_args(inner: str) -> list[str]:
    """Split on top-level commas only (quote- and paren-aware)."""
    out, start, depth, i, n = [], 0, 0, 0, len(inner)
    while i < n:
        c = inner[i]
        if c == "'":
            i = _skip_string(inner, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(inner[start:i].strip())
            start = i + 1
        i += 1
    out.append(inner[start:].strip())
    return out


def _string_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of single-quoted literals — call-name matches
    inside them must be ignored (a regex pattern mentioning DATE_TRUNC is
    DATA, not a call)."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = _skip_string(sql, i)
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _rewrite_calls(sql: str) -> str:
    out: list[str] = []
    spans = _string_spans(sql)
    pos = 0
    while True:
        m = _CALL_OPEN.search(sql, pos)
        if not m:
            break
        inside = next((e for s, e in spans if s <= m.start() < e), None)
        if inside is not None:  # function name inside a string literal
            out.append(sql[pos:inside])
            pos = inside
            continue
        end = _scan_balanced(sql, m.end())
        if end is None:  # unbalanced — leave the tail untouched
            break
        args = [_rewrite_calls(a)
                for a in _split_args(sql[m.end():end - 1])]
        rendered = _CALL_RENDER[m.group(1).upper()](args)  # type: ignore[operator]
        if rendered is None:
            rendered = f"{m.group(1)}({', '.join(args)})"
        out.append(sql[pos:m.start()])
        out.append(rendered)
        pos = end
    out.append(sql[pos:])
    return "".join(out)


_CAST_INF = re.compile(r"CAST\s*\(\s*'inf'\s+AS\s+FLOAT64\s*\)",
                       re.IGNORECASE)

_UNNEST_OPEN = re.compile(r"\bunnest\s*\(", re.IGNORECASE)
# words that can follow `unnest(...)` without being its alias
_NOT_ALIAS = {"inner", "join", "left", "right", "full", "cross", "on",
              "where", "group", "order", "having", "union", "limit",
              "lateral", "and", "or", "between", "not", "is", "in", "then",
              "else", "end", "when", "from", "select"}
_ALIAS = re.compile(r"\s*(?:as\s+)?([A-Za-z_]\w*)", re.IGNORECASE)


_IN_CONTEXT = re.compile(r"(\bnot\s+)?\bin\s*$", re.IGNORECASE)
_IN_LHS = re.compile(r"([A-Za-z_`][\w.`$]*)\s*$")


def _rewrite_unnest(sql: str) -> str:
    """BQ `unnest(expr) [as] alias` → Spark.

    Three positions, three targets (all verified against Spark 4.1):
    * after FROM (incl. inside correlated EXISTS / scalar subqueries):
      `from unnest(X) t`  →  `from explode(X) AS __unnest_t0(t)` — Spark's
      explode() table-valued function supports outer references, so the
      reference's correlated `exists (select 1 from unnest($column) t join
      ref ...)` (integrity_subquery.yaml:90-99) and `(select sum(...) from
      unnest(...) s)` (correctness_complex_rule.yaml:64-69) run as-is;
    * after a comma join (`from data d, unnest(d.arr) t`): Spark's comma
      join can't correlate a TVF, so it becomes
      `from data d lateral view explode(d.arr) __unnest_t as t`;
    * expression context `x IN UNNEST(arr)` / `x NOT IN UNNEST(arr)` (a
      common BQ idiom, not used by the reference rule library but by
      user-authored rules) → `(not) array_contains(arr, x)`. The LHS must
      be a simple (possibly dotted/backticked) identifier — anything more
      exotic raises ConfigError rather than producing invalid Spark SQL.

    Fallback table aliases are unique per occurrence (__unnest_t0, _t1, …)
    so two unaliased UNNESTs in one FROM clause can't collide. The array
    expression is paren-balance scanned (regexes can't nest)."""
    out: list[str] = []
    pos = 0
    n_anon = 0
    while True:
        m = _UNNEST_OPEN.search(sql, pos)
        if not m:
            break
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        expr = sql[m.end():i - 1]
        before = sql[pos:m.start()]
        in_m = _IN_CONTEXT.search(before)
        if in_m:
            head = before[:in_m.start()]
            lhs_m = _IN_LHS.search(head)
            if not lhs_m:
                from cloud_data_quality_spark.config.model import ConfigError
                raise ConfigError(
                    f"IN UNNEST with a non-identifier left-hand side is not "
                    f"translatable; rewrite as array_contains(...) directly: "
                    f"...{before[-60:]}unnest(...)")
            neg = "not " if in_m.group(1) else ""
            out.append(head[:lhs_m.start()])
            out.append(f"{neg}array_contains({expr}, {lhs_m.group(1)})")
            pos = i
            continue
        am = _ALIAS.match(sql, i)
        alias = am.group(1) if am and am.group(1).lower() not in _NOT_ALIAS \
            else None
        end = am.end() if alias else i
        comma = before.rstrip().endswith(",")
        if comma:
            before = before.rstrip()[:-1]
            a = alias or "col"
            repl = f" lateral view explode({expr}) __unnest_{a} as {a}"
        elif alias:
            repl = f"explode({expr}) AS __unnest_{alias}({alias})"
        else:
            repl = f"explode({expr}) AS __unnest_t{n_anon}(col)"
            n_anon += 1
        out.append(before)
        out.append(repl)
        pos = end
    out.append(sql[pos:])
    return "".join(out)


# BQ quotes whole dotted names as one identifier (`dataset.table`,
# `project.dataset.table`); Spark needs each part quoted separately so the
# name resolves through the catalog (e.g. `global_temp`.`ref_view`).
_DOTTED_IDENT = re.compile(r"`([A-Za-z_][\w$-]*(?:\.[A-Za-z_][\w$-]*)+)`")


def _split_dotted(m: re.Match) -> str:
    return ".".join(f"`{part}`" for part in m.group(1).split("."))


def bq_to_spark_sql(sql: str) -> str:
    """Rewrite the BQ-SQL subset used by the reference rule library to Spark SQL."""
    out = _rewrite_unnest(sql)
    out = _DOTTED_IDENT.sub(_split_dotted, out)
    # runs BEFORE literal protection — this one rewrite intentionally spans
    # a string literal (the 'inf' token is part of the pattern itself)
    out = _CAST_INF.sub("CAST('Infinity' AS DOUBLE)", out)
    out = _rewrite_calls(out)

    def name_rules(segment: str) -> str:
        for pat, repl in _RULES:
            segment = pat.sub(repl, segment)  # type: ignore[arg-type]
        return segment

    # name rewrites never touch string literals either (a regex pattern
    # mentioning COUNTIF( or FLOAT64 is data, not SQL)
    spans = _string_spans(out)
    parts: list[str] = []
    pos = 0
    for s, e in spans:
        parts.append(name_rules(out[pos:s]))
        parts.append(out[s:e])
        pos = e
    parts.append(name_rules(out[pos:]))
    return "".join(parts)
