"""HTML → training text: the extraction pass a web corpus runs before
every text operator in this package (quality, dedup, lang-id, packing
all assume PLAIN text — raw crawl HTML would score markup, not prose).

Spark-first shape: the whole extraction is ONE chain of JVM
``regexp_replace`` / ``replace`` expressions — a single projection, no
UDF, no shuffle, linear in bytes — so Catalyst fuses it into the scan
stage like the rest of `pipeline/text.py`. Link extraction
(``extract_links``) feeds the existing URL ladder (canonicalize →
dedup → domain stats) the same way.

Every pattern is written to the COMMON subset of Java regex (Spark)
and RE2 (the DuckDB oracle): no backreferences (RE2 has none — script
and style get separate patterns instead of ``</\\1>``), no ``\\s``
(Java's includes U+000B, RE2's doesn't — explicit ``[ \\t\\r\\f]``
classes instead), inline ``(?is)`` flags only (supported by both).
That is what makes the extraction value-checkable: the oracle replays
the identical chain on the identical synthesized HTML.

Honest limits (documented, not hidden): this is a TAG-STRIPPER with
entity decoding, the WET-extraction shape — not a DOM parser. An
attribute value containing a literal ``>`` ends its tag early; only
the common named entities (amp/lt/gt/quot/apos/nbsp and the numeric
forms of those) decode; CDATA and conditional comments are treated as
plain comments. Real-world boilerplate removal composes DOWNSTREAM of
this pass via the existing line-level ops (``duplicate_lines`` /
``strip_duplicate_lines`` — the CCNet shape) and ``gopher_rules``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tags whose boundaries imply a line break in the rendered text.
BLOCK_TAGS = (
    "p|div|br|li|tr|td|th|h1|h2|h3|h4|h5|h6|ul|ol|table|thead|tbody|"
    "section|article|header|footer|blockquote|pre|hr|dt|dd|form"
)

# (pattern, replacement) chain — ORDER IS LOAD-BEARING: invisible
# containers drop with their content first, then block boundaries
# become newlines, then remaining tags drop, then entities decode
# (&amp; LAST, the single-pass HTML rule), then whitespace folds.
HTML_TEXT_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script[ \t]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t]*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)</?(" + BLOCK_TAGS + r")\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
)

# Literal entity decodes (exact string replaces — zero dialect risk).
HTML_ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&#60;", "<"),
    ("&gt;", ">"),
    ("&#62;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&amp;", "&"),
    ("&#38;", "&"),
)

# Whitespace folding: spaces/tabs collapse, newline islands collapse,
# outer whitespace trims.
HTML_SPACE_STEPS: tuple[tuple[str, str], ...] = (
    (r"[ \t\r\f]+", " "),
    (r"[ \t\r\f]*\n[ \t\r\f\n]*", "\n"),
    (r"^[ \t\r\f\n]+", ""),
    (r"[ \t\r\f\n]+$", ""),
)

# href/src values — double-quoted, single-quoted, and unquoted forms
# as THREE patterns (group 1 is the URL in each): matched-quote
# pairing needs a backreference, which RE2 (the oracle engine) does
# not have, and a mixed ["']…["'] class would let an apostrophe
# truncate a double-quoted URL (r14 review finding).
LINK_PATTERNS: tuple[str, ...] = (
    '(?i)(?:href|src)[ \\t]*=[ \\t]*"([^"]*)"',
    "(?i)(?:href|src)[ \\t]*=[ \\t]*'([^']*)'",
    "(?i)(?:href|src)[ \\t]*=[ \\t]*([^\"' \\t\\r\\n>][^ \\t\\r\\n>]*)",
)


def html_text_expr(col: Column | str) -> Column:
    """The full HTML→text chain as one JVM expression (see module
    docstring for the exact steps and their dialect constraints)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_TEXT_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for lit, rep in HTML_ENTITY_STEPS:
        out = F.replace(out, F.lit(lit), F.lit(rep))
    for pat, rep in HTML_SPACE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def html_to_text(
    df: DataFrame,
    html_col: str = "html",
    *,
    id_col: str = "doc_id",
    out_col: str = "text",
) -> DataFrame:
    """(id, text) extracted from raw HTML — one projection, fused into
    the scan; NULL html stays NULL (auditable, never silently
    empty)."""
    return df.select(
        F.col(id_col),
        html_text_expr(F.col(html_col)).alias(out_col),
    )


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, link) per href/src occurrence — the inlet of the URL
    ladder (``canonicalize_urls`` → ``url_dedup`` → ``domain_stats``).
    Rows group by quoting style (double-quoted, then single-quoted,
    then unquoted), document order within each. One projection +
    explode, no shuffle; documents without links contribute no
    rows (count them upstream if the fraction matters)."""
    arrays = [
        F.regexp_extract_all(F.col(html_col), F.lit(p), 1)
        for p in LINK_PATTERNS
    ]
    return df.select(
        F.col(id_col),
        F.explode(F.concat(*arrays)).alias("link"),
    )
