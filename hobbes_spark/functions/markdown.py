"""Markdown → text extraction — the code-corpus sibling of
``web.html_to_text``: READMEs, docs sites, and wiki dumps (The-Stack-
style corpora) ship as markdown, and quality scoring / dedup
fingerprints / token counts are garbage on the markup.

Same design as HTML_RULES: ONE ordered rule table of RE2-compatible
regexes (no lookaround, no backrefs) compiled into BOTH engines — the
Spark side chains ``regexp_replace``, the DuckDB oracle replays the
SAME rules — so cross-engine agreement is structural, not sampled.

Scope (documented, deliberately conservative): this strips MARKUP and
keeps CONTENT — fenced-code bodies survive (code is exactly what a
code corpus trains on; only the ``` fence lines drop), link/image
syntax resolves to its text/alt, emphasis and headers keep their
words.  It is a markup stripper, not a renderer: reference-style link
definitions and HTML blocks embedded in markdown are left to
``html_to_text`` composition, and the whitespace-canonicalization tail
COLLAPSES indentation (including inside fence bodies) — this output
feeds quality scoring / dedup fingerprints / token counts, not
compilers; keep the raw column when source-exact code matters.

Reference parity note: the reference engine has no document-format
layer (SURVEY §2.12 treats payloads as opaque); this is part of the
beyond-reference LLM-pipeline surface.

Scale posture: pure chained Column ``regexp_replace`` — map-only,
JVM-side codegen, zero shuffle, NULL propagates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hobbes_spark.expressions import c

__all__ = ["MD_RULES", "markdown_to_text", "SPDX_TAG_RE",
           "LICENSE_HEADER_RULES", "detect_license"]

#: ordered (pattern, replacement) — order is load-bearing: images
#: before links (the syntaxes nest), fences before inline code
MD_RULES: tuple[tuple[str, str], ...] = (
    # fence lines (``` or ~~~ with an optional language tag) drop whole;
    # the code BODY between them survives
    (r"(?m)^[ \t]{0,3}(```|~~~)[^\n]*$", ""),
    # images: ![alt](url "title") -> alt ; ![alt][ref] -> alt
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),
    (r"!\[([^\]]*)\]\[[^\]]*\]", "$1"),
    # links: [text](url) -> text ; [text][ref] -> text
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),
    (r"\[([^\]]*)\]\[[^\]]*\]", "$1"),
    # reference-style link definitions drop whole lines
    (r"(?m)^[ \t]{0,3}\[[^\]]+\]:[^\n]*$", ""),
    # ATX headers: leading #s (and optional closing #s) strip
    (r"(?m)^[ \t]{0,3}#{1,6}[ \t]+", ""),
    (r"(?m)[ \t]+#+[ \t]*$", ""),
    # setext underlines and thematic breaks drop whole lines
    (r"(?m)^[ \t]{0,3}(=+|-{3,}|\*{3,}|_{3,})[ \t]*$", ""),
    # blockquote markers strip per line (possibly nested)
    (r"(?m)^[ \t]{0,3}(>[ \t]?)+", ""),
    # list bullets / ordered markers strip, content keeps
    (r"(?m)^[ \t]*[-*+][ \t]+", ""),
    (r"(?m)^[ \t]*\d{1,9}[.)][ \t]+", ""),
    # emphasis/strong/strikethrough delimiters drop, words keep
    # (RE2-safe: no lookaround — the bare-* rule is deliberately
    # conservative and only fires when the span has no inner * or
    # space at the edges, the common prose case)
    (r"(\*\*|__)([^*_\n]*)(\*\*|__)", "$2"),
    (r"\*([^*\n ][^*\n]*)\*", "$1"),
    (r"~~([^~\n]+)~~", "$1"),
    # inline code: backticks drop, content keeps
    (r"`{1,3}([^`\n]*)`{1,3}", "$1"),
    # table pipes become spaces, delimiter rows drop
    (r"(?m)^[ \t]*\|?[ \t]*:?-{2,}:?[ \t]*(\|[ \t]*:?-{2,}:?[ \t]*)*\|?[ \t]*$", ""),
    (r"[ \t]*\|[ \t]*", " "),
    # whitespace canonicalization (the html_to_text tail)
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^[ \t\n]+", ""),
    (r"[ \t\n]+$", ""),
)


def markdown_to_text(col: Column | str) -> Column:
    """Plain text from a markdown column per :data:`MD_RULES` — the
    step between a docs/code crawl and every text operator.  Pure
    chained ``regexp_replace`` (map-only, codegen, shuffle-free),
    replayed rule-for-rule by the DuckDB oracle.  NULL propagates."""
    out = c(col)
    for pat, rep in MD_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


# --------------------------------------------------------------------- #
# License detection (round 11): code-corpus governance — The-Stack-
# style pipelines route files by license BEFORE training (permissive
# in, copyleft flagged, unknown quarantined).  Two signal tiers, both
# shared verbatim with the oracle:
#   1. an SPDX-License-Identifier tag (the machine-readable contract,
#      spdx.dev) — authoritative when present;
#   2. header phrases of the common license families — a heuristic
#      fallback for the pre-SPDX long tail.
# --------------------------------------------------------------------- #

#: SPDX tag: group 1 is the license expression up to end-of-line
SPDX_TAG_RE = r"(?im)SPDX-License-Identifier:[ \t]*([A-Za-z0-9 .()+-]+)"

#: (family, RE2-safe header-phrase pattern) — first match wins, so
#: more specific families come first
LICENSE_HEADER_RULES: tuple[tuple[str, str], ...] = (
    ("Apache-2.0", r"(?is)Licensed under the Apache License,? Version 2\.0"),
    ("GPL", r"(?is)GNU (Lesser |Affero )?General Public License"),
    ("MPL-2.0", r"(?is)Mozilla Public License,? (v\.? ?2\.0|Version 2\.0)"),
    ("MIT", r"(?is)Permission is hereby granted, free of charge"),
    ("BSD", r"(?is)Redistribution and use in source and binary forms"),
    ("Unlicense", r"(?is)This is free and unencumbered software"),
)


def detect_license(col: Column | str) -> dict[str, Column]:
    """``spdx`` (the tag's license expression, trimmed; NULL when
    absent), ``family`` (SPDX tag verbatim when present, else the
    first matching header phrase, else NULL) and ``licensed`` — for a
    text/code column.  Pure Column regex over the two shared rule
    tiers: map-only, JVM-side, zero shuffle.  This is an indexing
    heuristic, not legal advice: route-and-review, never
    route-and-forget."""
    raw = c(col)
    spdx = F.nullif(
        F.trim(F.regexp_extract(raw, SPDX_TAG_RE, 1)), F.lit(""))
    fam = spdx
    for family, pat in LICENSE_HEADER_RULES:
        fam = F.coalesce(
            fam, F.when(raw.rlike(pat), F.lit(family)))
    return {"spdx": spdx, "family": fam, "licensed": fam.isNotNull()}
