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


# robots/canonical metadata — same cross-engine contract as the strip
# patterns: (?i) + explicit [ \t\n\r] whitespace (NEVER \s — Java \s
# includes \x0b, RE2 \s excludes it), no lookaround, one capture group.
# Attribute-order contract is documented: name before content in the
# robots meta tag, and both rel-first and href-first canonical links are
# matched via the alternation.
ROBOTS_META_RE = (
    "(?i)<meta[ \\t\\n\\r][^>]*name[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']robots[\"'][^>]*content[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']")
CANONICAL_RE_REL_FIRST = (
    "(?i)<link[ \\t\\n\\r][^>]*rel[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']canonical[\"'][^>]*href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']")
CANONICAL_RE_HREF_FIRST = (
    "(?i)<link[ \\t\\n\\r][^>]*href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"'][^>]*rel[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']canonical[\"']")


def html_meta(html_col: Column) -> list[Column]:
    """Robots/canonical page metadata as three pure Columns (zero shuffle,
    zero Python — the same codegen'd posture as extract_text):

    * ``robots_noindex`` / ``robots_nofollow``: the crawl-hygiene gates a
      corpus builder must respect — a page that says noindex asked to be
      left out of derived datasets;
    * ``canonical_url``: the page's self-declared canonical location
      (first matching <link rel=canonical>), the strongest dedup key
      there is — stronger than hosts.canonicalize_url's syntactic
      normalization, and the natural join input for latest_revision.

    NULL html → NULL flags/url; pages without the tags → false / NULL.
    Patterns are shared constants replayed verbatim by the DuckDB oracle
    (regexp_extract group 1 in both engines)."""
    s = F.decode(html_col, "UTF-8")
    robots = F.lower(F.regexp_extract(s, ROBOTS_META_RE, 1))
    canon = F.regexp_extract(s, CANONICAL_RE_REL_FIRST, 1)
    canon2 = F.regexp_extract(s, CANONICAL_RE_HREF_FIRST, 1)
    pick = F.when(F.length(canon) > 0, canon) \
        .when(F.length(canon2) > 0, canon2)
    return [
        robots.contains("noindex").alias("robots_noindex"),
        robots.contains("nofollow").alias("robots_nofollow"),
        pick.alias("canonical_url"),
    ]
