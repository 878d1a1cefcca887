"""Unified document-extraction front-end: sniff the container type of
an opaque binary column and route to the right decoder — the single
entry point a 100 TB ingest actually wants, composing the per-format
layers this package already has (``pdf.py``, ``office.py``,
``web.HTML_RULES``, ``warc.sniff_charset``, ``multimodal.header_dims``)
behind ONE Arrow ``mapInPandas`` boundary.

Routing is magic-byte sniffing (never trust a filename/mime column at
crawl scale):

* ``%PDF-`` (first 1 KiB)      → ``pdf``   → :func:`pdf.pdf_text`
* ``PK\\x03\\x04``             → ``docx``/``pptx``/``xlsx`` via the
  prose part (:func:`office.office_text`); prose-free archives →
  ``zip`` with NULL text
* ``WARC/``                    → ``warc`` with NULL text — shards are
  record CONTAINERS, they belong in the ``warc_records`` path, not a
  per-document extractor
* image/audio/video magics     → ``image``/``audio``/``video`` with
  NULL text (metadata/features live in ``multimodal.py``)
* markup (``<!doctype``/``<html``/leading ``<``) → ``html`` →
  charset-ladder decode + the SAME ``HTML_RULES`` table the Column
  extractor and the DuckDB oracle replay (:func:`html_to_text_py` is
  the third engine of that one spec)
* anything that decodes as text → ``text`` (charset ladder)
* undecodable binary           → dropped (refusal = absent)

Python's ``re`` accepts the RE2-compatible ``HTML_RULES`` patterns
verbatim (each carries its flags at pattern START — the mid-pattern
flag restriction that forced stripping in ``html_meta`` does not apply
here), so the Python replay is rule-for-rule identical.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from hobbes_spark.functions.web import HTML_RULES

_HTML_RULES_C = tuple((re.compile(p), r) for p, r in HTML_RULES)


def html_to_text_py(s: str) -> str:
    """Pure-Python replay of ``web.html_to_text`` — the same
    ``HTML_RULES`` table, rule for rule (tested equal to the Column
    variant; the DuckDB oracle replays the same table, so all THREE
    engines pin one spec)."""
    for pat, rep in _HTML_RULES_C:
        s = pat.sub(rep, s)
    return s


_IMAGE_BRANDS = (b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1")
_AUDIO_BRANDS = (b"M4A ", b"M4B ")

#: RTF destination groups whose text is data, not prose (font tables,
#: style sheets, embedded pictures, metadata) — their content drops
_RTF_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "footerl", "footerr",
    "ftnsep", "ftnsepc", "xe", "tc", "field", "fldinst", "themedata",
    "colorschememapping", "datastore", "latentstyles", "listtable",
    "listoverridetable", "generator",
}

_RTF_CW = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\(.)")


def rtf_to_text(data: bytes) -> str:
    """RTF 1.x prose extraction (Word RTF spec — public): group-aware
    scan dropping data destinations (:data:`_RTF_SKIP_DESTS` and
    ``{\\*`` ignorable groups), expanding ``\\par``/``\\line`` to
    newlines, ``\\tab`` to TAB, ``\\'hh`` cp1252-ish bytes and
    ``\\uN`` unicode (with the ``\\ucN`` fallback-skip convention).
    Never raises; unknown control words are ignored."""
    out: list[str] = []
    # stack entries: [skipping, uc_skip_count]
    stack: list[list] = [[False, 1]]
    pending_uc_skip = 0
    i, n = 0, len(data)
    while i < n:
        ch = data[i : i + 1]
        if ch == b"{":
            stack.append(list(stack[-1]))
            i += 1
            # ignorable destination {\* ...}
            if data[i : i + 2] == b"\\*":
                stack[-1][0] = True
                i += 2
            continue
        if ch == b"}":
            if len(stack) > 1:
                stack.pop()
            i += 1
            continue
        if ch == b"\\":
            m = _RTF_CW.match(data, i)
            if not m:
                i += 1
                continue
            i = m.end()
            word, param, hexb, esc = m.groups()
            skipping = stack[-1][0]
            if hexb is not None:
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(bytes([int(hexb, 16)]).decode("latin-1"))
                continue
            if esc is not None:
                if esc in (b"{", b"}", b"\\") and not skipping:
                    out.append(esc.decode("latin-1"))
                elif esc == b"~" and not skipping:
                    out.append("\u00a0")
                continue
            w = word.decode("ascii")
            if w in _RTF_SKIP_DESTS:
                stack[-1][0] = True
            elif w == "uc" and param is not None:
                stack[-1][1] = int(param)
            elif w == "u" and param is not None:
                if not skipping:
                    cp = int(param)
                    out.append(chr(cp + 65536 if cp < 0 else cp))
                pending_uc_skip = stack[-1][1]
            elif not skipping:
                if w in ("par", "line", "sect", "page"):
                    out.append("\n")
                elif w == "tab":
                    out.append("\t")
                elif w == "cell":
                    out.append("\t")
                elif w == "row":
                    out.append("\n")
            continue
        if ch in (b"\r", b"\n"):
            i += 1
            continue
        if not stack[-1][0]:
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            else:
                out.append(ch.decode("latin-1"))
        i += 1
    text = "".join(out)
    text = re.sub(r"[ \t]+\n", "\n", text)
    return text.strip("\n ").rstrip()


def sniff_kind(data: bytes) -> str | None:
    """Container kind by magic bytes; None when nothing matches (the
    caller then tries a text decode)."""
    # ANCHORED to payload start (modulo leading pad bytes): a `%PDF-`
    # substring anywhere in the head is not a PDF — an HTML/text doc
    # that mentions '%PDF-1.4' must keep routing to its own branch
    # (ADVICE r12).  The ISO 32000 "header within the first 1024 bytes"
    # leniency is handled downstream by pdf_version on sniffed PDFs.
    if data[:1024].lstrip(b" \t\r\n\x00").startswith(b"%PDF-"):
        return "pdf"
    if data[:5] == b"{\\rtf":
        return "rtf"
    if data[:4] == b"PK\x03\x04":
        return "zip"  # refined to docx/pptx/xlsx by office_text
    if data[:5] == b"WARC/":
        return "warc"
    if (data[:8] == b"\x89PNG\r\n\x1a\n" or data[:3] == b"\xff\xd8\xff"
            or data[:4] in (b"GIF8",) or data[:2] == b"BM"):
        return "image"
    if data[:4] == b"RIFF":
        if data[8:12] == b"WEBP":
            return "image"
        if data[8:12] == b"WAVE":
            return "audio"
        return None
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "audio"
    if data[:4] == b"fLaC":
        return "audio"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand in _IMAGE_BRANDS:
            return "image"
        return "audio" if brand in _AUDIO_BRANDS else "video"
    head = data[:256].lstrip(b" \t\r\n\x00")
    low = head[:64].lower()
    if (low.startswith(b"<!doctype") or b"<html" in data[:256].lower()
            or low.startswith(b"<")):
        return "html"
    return None


def extract_any(data: bytes) -> tuple[str | None, str | None]:
    """``(kind, text)`` for one payload; ``(None, None)`` = refusal."""
    from hobbes_spark.functions.office import office_text
    from hobbes_spark.functions.pdf import pdf_objects, pdf_text, pdf_version
    from hobbes_spark.functions.warc import decode_payload

    kind = sniff_kind(data)
    if kind == "pdf":
        if pdf_version(data) is not None and pdf_objects(data):
            return "pdf", pdf_text(data)
        # %PDF- header at payload start but the object walk found
        # nothing: fall through to the plain-text gate instead of
        # silently refusing a decodable document (ADVICE r12) — true
        # corrupt binary PDFs still refuse at the strict-decode gate
        kind = None
    if kind == "zip":
        okind, text, _n = office_text(data)
        return (okind, text) if okind is not None else ("zip", None)
    if kind == "rtf":
        return "rtf", rtf_to_text(bytes(data))
    if kind in ("warc", "image", "audio", "video"):
        return kind, None
    if kind == "html":
        _, raw = decode_payload(data, None, default="utf-8")
        return "html", html_to_text_py(raw)
    # no magic matched: accept CLEAN text, refuse binary — a strict
    # decode (not the replace-mode ladder) is the binary/text gate
    try:
        txt = bytes(data).decode("utf-8")
    except UnicodeDecodeError:
        return None, None
    if "\x00" in txt:
        return None, None
    return "text", txt


_EXTRACT_OUT = "media_id long, kind string, n_bytes long, n_chars int, text string"


def extract_text_any(
    media: DataFrame, *, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """The extraction front-end over Arrow batches: one row per payload
    that routes (media_id, kind, n_bytes, n_chars, text); text is NULL
    for non-document kinds (image/audio/video/warc/zip) and refusals
    are ABSENT (undecodable binary, corrupt PDFs — the warc/pdf
    posture).  Map-only, zero shuffle; each per-format decoder keeps
    its own caps, so one adversarial payload cannot OOM an executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, blob in zip(pdf_batch[id_col], pdf_batch[content_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                kind, text = extract_any(data)
                if kind is None:
                    continue
                rows.append((int(mid), kind, len(data),
                             len(text) if text is not None else None, text))
            out = pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "n_chars", "text"],
            )
            out["n_chars"] = pd.array(out["n_chars"], dtype="Int32")
            yield out

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    return media.mapInPandas(run, schema=_EXTRACT_OUT)
