"""Deterministic HTML → text extraction.

North-rule per-row invariant: "byte-identical extracted text per url". The
input table carries both `html:binary` (the raw capture) and `text:string`
(the extracted text); this module is the extraction step that produces the
latter from the former — the first stage of a Common-Crawl-style pipeline
(reference analogue: CloudDQ consumes already-extracted columns; a web-text
quality pipeline must own this step and it must be reproducible to the byte
at any parallelism).

Design constraints, in order:
* DETERMINISTIC and byte-stable: same bytes in → same text out, everywhere.
  No whitespace "tidying", no lossy entity guessing — normalization is a
  separate opt-in (functions.text / webtext_rules own that).
* JVM-side: the whole transform is a Column expression (decode + regexp
  chain + literal replaces) — whole-stage codegen, zero Python in the hot
  path, pushdown-friendly.
* Oracle-replayable: the strip patterns and entity table are module
  constants; the DuckDB oracle SQL is GENERATED from the same constants
  (plans/oracle_fragments.sql_extract_text), so the two engines cannot
  drift. That bounds the entity table to the 5 XML-named entities both
  regex engines and SQL `replace` handle identically; numeric character
  references pass through unchanged (documented limitation — a production
  fork can widen the table behind the same constants).

Algorithm (applied in this exact order on the UTF-8 decoded bytes):
  1. drop the <head> block (title/script/style/meta live there);
  2. drop <script>/<style> blocks anywhere in the body;
  3. drop HTML comments;
  4. strip every remaining tag;
  5. decode named entities, &amp; strictly LAST (else "&amp;lt;" would
     double-decode — the classic unescape ordering bug).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?s): dot matches newlines — multi-line script/style/head blocks.
# (?i): real-world captures use <SCRIPT>/<Style>/<HEAD> freely; without it
# only the tags were stripped (by the final <[^>]*> rule) and the block
# CONTENTS leaked into extracted text. Non-greedy bodies so adjacent blocks
# don't merge. Identical semantics in Java regex (Spark) and RE2 (DuckDB):
# no backreferences, no lookaround; both support inline (?si).
HTML_STRIP_PATTERNS: tuple[str, ...] = (
    r"(?si)<head[^>]*>.*?</head>",
    r"(?si)<script[^>]*>.*?</script>",
    r"(?si)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]*>",
)

# decode order matters: &amp; LAST (see module docstring).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def extract_text(html_col: Column) -> Column:
    """`html:binary` → extracted text, as a pure Column expression."""
    s = F.decode(html_col, "UTF-8")
    for pat in HTML_STRIP_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def escape_text(text_col: Column) -> Column:
    """Inverse direction (text → entity-escaped html payload): the encode
    half of the round-trip invariant, and what the synthetic pages
    generator embeds in its html. Escape order is the inverse of decode:
    & FIRST."""
    s = text_col
    for ent, ch in reversed(HTML_ENTITIES):
        s = F.replace(s, F.lit(ch), F.lit(ent))
    return s
