"""Office Open XML text extraction (docx/pptx/xlsx) — pure Python,
Arrow-batched.

After HTML and PDF, the ZIP+XML Office containers are the next most
common document modality in a web-scale corpus.  Same posture as
``pdf.py``/``multimodal.py``: real parsing with the stdlib only
(``zlib`` for deflate), never-raises, best-effort on truncation,
one ``mapInPandas`` boundary, zero shuffle.

Container layer: ECMA-376 packages are ZIP archives (APPNOTE.TXT
layout).  :func:`zip_entries` reads the central directory when the End
Of Central Directory record parses, and FALLS BACK to a sequential
local-file-header walk (``PK\\x03\\x04`` scan) when the tail is
truncated — a half-uploaded docx keeps the members that made it, the
WARC/PDF keep-your-head posture.  Stored (0) and deflate (8) members
decode; anything else is skipped.  Per-member inflate capped (32 MiB).

Text layer: the WordprocessingML / DrawingML / SpreadsheetML subsets
that carry prose —

* docx: ``word/document.xml`` — ``<w:t>`` runs concatenated per
  ``<w:p>`` paragraph, ``<w:tab/>`` → TAB, ``<w:br/>``/``<w:cr/>`` →
  newline; paragraphs joined with newlines.
* pptx: ``ppt/slides/slideN.xml`` in slide-number order — ``<a:t>``
  runs, paragraphs (``<a:p>``) per line, slides separated by blank
  lines.
* xlsx: ``xl/sharedStrings.xml`` — ``<t>`` values, one per line (cell
  prose; numbers/formulas are data, not text).

XML is processed with the same chained-regex discipline as
``web.html_to_text`` (shared-rule, oracle-replayable, no parser deps):
extract runs, decode the five XML entities plus numeric references.
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MEMBER_CAP = 32 << 20
_MAX_MEMBERS = 4096

_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def _inflate_member(method: int, raw: bytes, cap: int = _MEMBER_CAP) -> bytes | None:
    if method == 0:  # stored
        return raw if len(raw) <= cap else None
    if method == 8:  # deflate
        d = zlib.decompressobj(-15)
        try:
            out = d.decompress(raw, cap)
        except zlib.error:
            return None
        return out
    return None  # bzip2/lzma/ppmd members are rare in OOXML; skip


def zip_entries(data: bytes) -> dict[str, bytes]:
    """``{member name: decoded bytes}`` for a ZIP payload.  Central
    directory first (authoritative); sequential local-header walk as
    the truncated-tail fallback.  Never raises; undecodable members
    are absent."""
    out: dict[str, bytes] = {}
    # find EOCD in the last 64 KiB + 22 bytes (max comment length)
    tail = data[-(65536 + 22):]
    eocd = tail.rfind(_EOCD_SIG)
    if eocd >= 0 and len(tail) - eocd >= 22:
        base = len(data) - len(tail) + eocd
        try:
            (n_entries,) = struct.unpack("<H", data[base + 10 : base + 12])
            _cd_size, cd_off = struct.unpack("<II", data[base + 12 : base + 20])
        except struct.error:
            n_entries, cd_off = 0, -1
        # self-extracting / prefixed archives: every stored offset is
        # shifted by the prefix length — re-anchor on the actual
        # central-directory signature and apply the same shift to the
        # per-entry local-header offsets
        shift = 0
        if 0 <= cd_off and data[cd_off : cd_off + 4] != _CDIR_SIG:
            hit = data.find(_CDIR_SIG)
            if hit >= 0:
                shift = hit - cd_off
                cd_off = hit
        pos = cd_off
        for _ in range(min(n_entries, _MAX_MEMBERS)):
            if data[pos : pos + 4] != _CDIR_SIG or pos + 46 > len(data):
                break
            try:
                (method,) = struct.unpack("<H", data[pos + 10 : pos + 12])
                (csize,) = struct.unpack("<I", data[pos + 20 : pos + 24])
                (nlen,) = struct.unpack("<H", data[pos + 28 : pos + 30])
                (elen,) = struct.unpack("<H", data[pos + 30 : pos + 32])
                (clen,) = struct.unpack("<H", data[pos + 32 : pos + 34])
                (lho,) = struct.unpack("<I", data[pos + 42 : pos + 46])
            except struct.error:
                break
            name = data[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
            pos += 46 + nlen + elen + clen
            got = _read_local(data, lho + shift, method, csize)
            if got is not None:
                out[name] = got
        if out:
            return out
    # fallback: walk local headers from the front (truncated tail)
    pos = 0
    while len(out) < _MAX_MEMBERS:
        pos = data.find(_LOCAL_SIG, pos)
        if pos < 0 or pos + 30 > len(data):
            break
        try:
            (method,) = struct.unpack("<H", data[pos + 8 : pos + 10])
            (csize,) = struct.unpack("<I", data[pos + 18 : pos + 22])
            (nlen,) = struct.unpack("<H", data[pos + 26 : pos + 28])
            (elen,) = struct.unpack("<H", data[pos + 28 : pos + 30])
        except struct.error:
            break
        name = data[pos + 30 : pos + 30 + nlen].decode("utf-8", "replace")
        body_at = pos + 30 + nlen + elen
        got = _read_local(data, pos, method, csize)
        if got is not None:
            out[name] = got
            pos = body_at + csize
        else:
            pos += 4
    return out


def _read_local(data: bytes, lho: int, method: int, csize: int) -> bytes | None:
    """Decode one member given its local-header offset (sizes from the
    central directory are authoritative; streamed entries with
    data-descriptor sizes of 0 fall back to an inflate-until-EOS)."""
    if data[lho : lho + 4] != _LOCAL_SIG or lho + 30 > len(data):
        return None
    try:
        (nlen,) = struct.unpack("<H", data[lho + 26 : lho + 28])
        (elen,) = struct.unpack("<H", data[lho + 28 : lho + 30])
    except struct.error:
        return None
    body = lho + 30 + nlen + elen
    if csize > 0:
        raw = data[body : body + csize]
        if len(raw) < csize:
            raw = data[body:]  # truncated: inflate what's there
        return _inflate_member(method, raw)
    # size unknown (bit-3 streaming entry): inflate to end-of-stream
    return _inflate_member(method, data[body:])


# --------------------------------------------------------------------- #
# XML run extraction (regex discipline — no XML parser dependency)
# --------------------------------------------------------------------- #

_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _ENT.get(body, m.group(0))

    return re.sub(r"&([A-Za-z]+|#x?[0-9A-Fa-f]+);", sub, s)


_W_P = re.compile(r"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_W_RUN = re.compile(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:(tab|br|cr)\s*/>", re.S)
_A_P = re.compile(r"<a:p>.*?</a:p>", re.S)
_A_T = re.compile(r"<a:t>(.*?)</a:t>", re.S)
_SST_T = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def docx_paragraphs(xml: str) -> list[str]:
    """WordprocessingML → paragraph strings (runs concatenated, tabs
    and breaks expanded)."""
    out = []
    for pm in _W_P.finditer(xml):
        parts: list[str] = []
        for rm in _W_RUN.finditer(pm.group(0)):
            if rm.group(2) == "tab":
                parts.append("\t")
            elif rm.group(2) in ("br", "cr"):
                parts.append("\n")
            elif rm.group(1) is not None:
                parts.append(_unescape(rm.group(1)))
        out.append("".join(parts))
    return out


_OPF_ROOTFILE = re.compile(r'<rootfile[^>]*full-path\s*=\s*["\']([^"\']+)["\']')
_OPF_ITEM = re.compile(
    r'<item\s[^>]*/?>', re.S)
_ATTR = {
    "id": re.compile(r'\bid\s*=\s*["\']([^"\']+)["\']'),
    "href": re.compile(r'\bhref\s*=\s*["\']([^"\']+)["\']'),
}
_OPF_ITEMREF = re.compile(r'<itemref\s[^>]*\bidref\s*=\s*["\']([^"\']+)["\']')


def epub_text(entries: dict[str, bytes]) -> str | None:
    """EPUB (OCF/OPF) reading-order text: container.xml → the OPF
    package → manifest id→href → spine itemref order; each XHTML
    member extracts through the SAME html_to_text rule table
    (``extract.html_to_text_py``), chapters separated by blank lines.
    A broken OPF falls back to every .xhtml/.html member in name
    order — truncated books keep the chapters that made it."""
    from hobbes_spark.functions.extract import html_to_text_py

    container = entries.get("META-INF/container.xml")
    docs: list[str] = []
    if container is not None:
        m = _OPF_ROOTFILE.search(container.decode("utf-8", "replace"))
        if m:
            opf_path = m.group(1)
            opf = entries.get(opf_path)
            if opf is not None:
                xml = opf.decode("utf-8", "replace")
                base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
                hrefs = {}
                for im in _OPF_ITEM.finditer(xml):
                    tag = im.group(0)
                    mid = _ATTR["id"].search(tag)
                    mhref = _ATTR["href"].search(tag)
                    if mid and mhref:
                        hrefs[mid.group(1)] = base + mhref.group(1)
                for ref in _OPF_ITEMREF.finditer(xml):
                    name = hrefs.get(ref.group(1))
                    if name and name in entries:
                        docs.append(name)
    if not docs:  # fallback: name-ordered markup members
        docs = sorted(n for n in entries
                      if n.endswith((".xhtml", ".html", ".htm")))
    chapters = []
    for name in docs:
        txt = html_to_text_py(entries[name].decode("utf-8", "replace"))
        if txt:
            chapters.append(txt)
    return "\n\n".join(chapters) if chapters else None


def office_text(data: bytes) -> tuple[str | None, str | None, int]:
    """``(kind, text, n_members)`` for one payload.  kind ∈
    {docx, pptx, xlsx, epub} by which prose part is present;
    (None, None, n) when the payload is not a ZIP or carries none."""
    # accept a bounded self-extracting prefix: the walk re-anchors on
    # the real signatures (router sniffing stays strict offset-0)
    if data[:4] != _LOCAL_SIG and _LOCAL_SIG not in bytes(data[:65536]):
        return None, None, 0
    entries = zip_entries(bytes(data))
    if not entries:
        return None, None, 0
    if "word/document.xml" in entries:
        xml = entries["word/document.xml"].decode("utf-8", "replace")
        text = "\n".join(docx_paragraphs(xml)).strip("\n")
        return "docx", text, len(entries)
    slides = sorted(
        (int(m.group(1)), name)
        for name, m in ((n, _SLIDE_RE.match(n)) for n in entries)
        if m is not None
    )
    if slides:
        blocks = []
        for _, name in slides:
            xml = entries[name].decode("utf-8", "replace")
            paras = [
                "".join(_unescape(t.group(1)) for t in _A_T.finditer(p.group(0)))
                for p in _A_P.finditer(xml)
            ]
            blocks.append("\n".join(x for x in paras if x))
        return "pptx", "\n\n".join(blocks).strip("\n"), len(entries)
    if "xl/sharedStrings.xml" in entries:
        xml = entries["xl/sharedStrings.xml"].decode("utf-8", "replace")
        vals = [_unescape(m.group(1)) for m in _SST_T.finditer(xml)]
        return "xlsx", "\n".join(vals).strip("\n"), len(entries)
    if (entries.get("mimetype", b"").strip() == b"application/epub+zip"
            or "META-INF/container.xml" in entries):
        text = epub_text(entries)
        if text is not None:
            return "epub", text, len(entries)
    return None, None, len(entries)


# --------------------------------------------------------------------- #
# Spark surface
# --------------------------------------------------------------------- #

_OFFICE_OUT = (
    "media_id long, kind string, n_members int, n_chars int, text string"
)


def office_features(
    media: DataFrame, *, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-document OOXML parse over Arrow batches: one row per payload
    that is a ZIP with a recognized prose part (docx body, pptx
    slides, xlsx shared strings).  Non-ZIP payloads and ZIPs with no
    prose part are DROPPED (refusal = absent, the warc/pdf posture);
    truncated archives keep the members that parse.  Map-only, zero
    shuffle, per-member decompression capped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, blob in zip(pdf_batch[id_col], pdf_batch[content_col]):
                if blob is None:
                    continue
                kind, text, n = office_text(bytes(blob))
                if kind is None:
                    continue
                rows.append((int(mid), kind, n,
                             len(text) if text is not None else None, text))
            out = pd.DataFrame(
                rows, columns=["media_id", "kind", "n_members",
                               "n_chars", "text"])
            out["n_members"] = pd.array(out["n_members"], dtype="Int32")
            out["n_chars"] = pd.array(out["n_chars"], dtype="Int32")
            yield out

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    return media.mapInPandas(run, schema=_OFFICE_OUT)
