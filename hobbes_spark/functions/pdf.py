"""PDF text extraction over binary columns — pure Python, Arrow-batched.

The single most common non-HTML document container in a web-scale
corpus (r11 verdict item 3).  Reference scope: the reference engine has
no PDF path at all — this module is part of the beyond-reference
LLM-pipeline surface, same posture as ``multimodal.py``'s image/audio
decoders: REAL pure-Python parsing (no external libs), best-effort and
never-raises, behind one ``mapInPandas`` boundary so the plan stays
map-only / zero-shuffle and scales embarrassingly.

What is implemented (ISO 32000-1 subset):

- **Object walk without xref.** Top-level ``N G obj … endobj`` spans are
  scanned directly; a broken or truncated xref table therefore cannot
  take down extraction (truncated shards keep their parseable head,
  the WARC posture).  Object streams (``/Type /ObjStm``) are inflated
  and their embedded objects parsed for page counting.
- **Filter cascades.** ``FlateDecode`` (zlib, tolerant of truncated
  tails via ``decompressobj``), ``ASCIIHexDecode``, ``ASCII85Decode``,
  ``RunLengthDecode``, and ``LZWDecode`` (MSB-first, early-change, the
  TIFF/PDF variant — distinct from GIF's LSB-first in multimodal.py),
  plus the PNG predictor family from ``/DecodeParms`` (ObjStm/xref
  streams in 1.5+ files).  ``DCTDecode``/``JPXDecode`` payloads are
  images, not text — skipped.
- **Content-stream text operators.** ``BT``/``ET`` blocks with ``Tj``,
  ``'``, ``"``, and ``TJ`` shows; ``Td``/``TD``/``T*``/``Tm`` line
  breaks; literal strings with the full escape set (octal, line
  continuations, nesting) and hex strings with a UTF-16BE sniff.
  WITHOUT font CMaps the byte→glyph map is identity (PDFDocEncoding ≈
  latin-1) — the documented best-effort boundary: simple fonts extract
  exactly, subset-embedded CID fonts extract garbage-free but
  approximate.  A kern more negative than ``-180`` thousandths in a
  ``TJ`` array reads as a word space (the standard heuristic).

Never raises on garbage: every entry point returns ``None`` /
empty-string signals instead.  Caps bound decompression (32 MiB per
stream) and object counts (10k) so one adversarial payload cannot OOM
an executor.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_STREAM_CAP = 32 << 20  # decompressed bytes per stream
_MAX_OBJECTS = 10_000

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# --------------------------------------------------------------------- #
# filters
# --------------------------------------------------------------------- #


def _flate(data: bytes, cap: int = _STREAM_CAP) -> bytes | None:
    """zlib inflate, tolerant of truncated tails (keeps what inflated)."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, cap)
    except zlib.error:
        # some writers emit raw deflate without the zlib wrapper
        d = zlib.decompressobj(-15)
        try:
            out = d.decompress(data, cap)
        except zlib.error:
            return None
    return out if out else None


def _ascii_hex(data: bytes) -> bytes | None:
    body = data.split(b">", 1)[0]
    hx = b"".join(body.split())
    if len(hx) % 2:
        hx += b"0"  # spec: odd count pads with 0
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return None


def _ascii85(data: bytes) -> bytes | None:
    import base64

    body = data.split(b"~>", 1)[0]
    body = bytes(ch for ch in body if ch not in _WS)
    if body.startswith(b"<~"):
        body = body[2:]
    try:
        return base64.a85decode(body)
    except ValueError:
        return None


def _runlength(data: bytes) -> bytes | None:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break  # EOD
        if n < 128:
            out += data[i + 1 : i + 2 + n]
            i += 2 + n
        else:
            if i + 1 >= len(data):
                break
            out += data[i + 1 : i + 2] * (257 - n)
            i += 2
        if len(out) > _STREAM_CAP:
            return None
    return bytes(out)


def _lzw(data: bytes, cap: int = _STREAM_CAP) -> bytes | None:
    """PDF/TIFF LZW: MSB-first bit packing, 9→12-bit codes, early
    change (code width bumps one code BEFORE the table fills), 256 =
    clear, 257 = EOD.  Distinct from the GIF variant (LSB-first) in
    ``multimodal._gif_lzw_decode``."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, acc, nbits = 9, 0, 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            if len(out) > cap:
                return None
            prev = entry
            # early change: width grows when the NEXT code would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Undo PNG row filters (RFC 2083 §6) — /Predictor >= 10."""
    bpp = max(1, (colors * bpc) // 8)
    stride = (colors * bpc * columns + 7) // 8
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    while i + 1 + stride <= len(data) + stride and i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + stride])
        if len(row) < stride:
            row += bytes(stride - len(row))
        i += 1 + stride
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ft == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ft == 3:
                row[x] = (row[x] + ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[x] = (row[x] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def decode_stream(raw: bytes, filters, parms) -> bytes | None:
    """Run a /Filter cascade (name or list of names) over raw stream
    bytes; ``None`` when any stage fails or names an image codec."""
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, pm in zip(filters, parms + [None] * len(filters)):
        name = f if isinstance(f, str) else None
        if name in ("FlateDecode", "Fl"):
            data = _flate(data)
        elif name in ("ASCIIHexDecode", "AHx"):
            data = _ascii_hex(data)
        elif name in ("ASCII85Decode", "A85"):
            data = _ascii85(data)
        elif name in ("RunLengthDecode", "RL"):
            data = _runlength(data)
        elif name in ("LZWDecode", "LZW"):
            data = _lzw(data)
        elif name in ("DCTDecode", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode"):
            return None  # image codecs: no text inside
        else:
            return None  # Crypt / unknown
        if data is None:
            return None
        if isinstance(pm, dict):
            pred = pm.get("Predictor", 1)
            if isinstance(pred, (int, float)) and pred >= 10:
                data = _png_predictor(
                    data,
                    int(pm.get("Colors", 1)),
                    int(pm.get("BitsPerComponent", 8)),
                    int(pm.get("Columns", 1)),
                )
    return data


# --------------------------------------------------------------------- #
# object / dictionary parsing
# --------------------------------------------------------------------- #


class _Ref(tuple):
    """Indirect reference ``(num, gen)`` — a distinct type so a dict
    value of 5 and a reference to object 5 never collide."""


def _skip_ws(b: bytes, i: int) -> int:
    n = len(b)
    while i < n:
        ch = b[i]
        if ch == 0x25:  # '%' comment to EOL
            while i < n and b[i] not in b"\r\n":
                i += 1
        elif ch in _WS:
            i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")


def _parse_value(b: bytes, i: int, depth: int = 0):
    """Parse ONE PDF object value at ``i`` → ``(value, next_i)``;
    ``(None, i)`` on garbage (callers skip forward).  Values map to
    Python: dict, list, str (names AND text strings — names keep their
    leading '/' stripped), bytes never escape this layer, bool, None,
    int/float, :class:`_Ref`."""
    if depth > 32:
        return None, i + 1
    i = _skip_ws(b, i)
    if i >= len(b):
        return None, i
    ch = b[i : i + 1]
    if b[i : i + 2] == b"<<":
        d = {}
        i += 2
        while True:
            i = _skip_ws(b, i)
            if b[i : i + 2] == b">>":
                return d, i + 2
            if i >= len(b):
                return d, i
            if b[i : i + 1] != b"/":
                # junk inside dict: bail to the closing marker
                j = b.find(b">>", i)
                return d, (j + 2 if j >= 0 else len(b))
            key, i = _parse_name(b, i)
            val, i2 = _parse_value(b, i, depth + 1)
            if i2 == i:
                i2 += 1
            d[key] = val
            i = i2
    if ch == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(b, i)
            if i >= len(b):
                return arr, i
            if b[i : i + 1] == b"]":
                return arr, i + 1
            val, i2 = _parse_value(b, i, depth + 1)
            if i2 == i:
                i2 += 1
            else:
                arr.append(val)
            i = i2
    if ch == b"/":
        return _parse_name(b, i)
    if ch == b"(":
        raw, i = _parse_literal_string(b, i)
        return _string_to_text(raw), i
    if ch == b"<":
        j = b.find(b">", i + 1)
        if j < 0:
            return None, len(b)
        hx = b"".join(b[i + 1 : j].split())
        if len(hx) % 2:
            hx += b"0"
        try:
            return _string_to_text(bytes.fromhex(hx.decode("ascii"))), j + 1
        except (ValueError, UnicodeDecodeError):
            return None, j + 1
    if b[i : i + 4] == b"true":
        return True, i + 4
    if b[i : i + 5] == b"false":
        return False, i + 5
    if b[i : i + 4] == b"null":
        return None, i + 4
    m = _NUM_RE.match(b, i)
    if m:
        # lookahead for `N G R` indirect reference
        j = _skip_ws(b, m.end())
        m2 = _NUM_RE.match(b, j)
        if m2 and b"." not in m.group() and b"." not in m2.group():
            k = _skip_ws(b, m2.end())
            if b[k : k + 1] == b"R" and (
                k + 1 >= len(b) or b[k + 1] in _WS or b[k + 1] in _DELIM
            ):
                return _Ref((int(m.group()), int(m2.group()))), k + 1
        tok = m.group()
        return (float(tok) if b"." in tok else int(tok)), m.end()
    return None, i + 1


def _parse_name(b: bytes, i: int):
    # i at '/'
    j = i + 1
    n = len(b)
    while j < n and b[j] not in _WS and b[j] not in _DELIM:
        j += 1
    raw = b[i + 1 : j]
    raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]), raw)
    return raw.decode("latin-1"), j


def _parse_literal_string(b: bytes, i: int):
    """``(...)`` body with escapes → raw bytes; i at '('."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(b)
    while i < n:
        ch = b[i]
        if ch == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f"}[e]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                o = 0
                k = 0
                while k < 3 and i < n and 0x30 <= b[i] <= 0x37:
                    o = o * 8 + (b[i] - 0x30)
                    i += 1
                    k += 1
                out.append(o & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif ch == 0x28:
            depth += 1
            out.append(ch)
            i += 1
        elif ch == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(ch)
            i += 1
        else:
            out.append(ch)
            i += 1
    return bytes(out), i


def _string_to_text(raw: bytes) -> str:
    """PDF string bytes → text: UTF-16BE when BOM'd or NUL-striped
    (bare CID-ish two-byte strings), else PDFDocEncoding ≈ latin-1."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    if (
        len(raw) >= 4
        and len(raw) % 2 == 0
        and all(raw[k] == 0 for k in range(0, len(raw), 2))
    ):
        return raw.decode("utf-16-be", "replace")
    return raw.decode("latin-1")


# --------------------------------------------------------------------- #
# document walk
# --------------------------------------------------------------------- #

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_VERSION_RE = re.compile(rb"%PDF-(\d+\.\d+)")


def pdf_objects(data: bytes) -> dict[int, dict]:
    """Scan every top-level ``N G obj … endobj`` span →
    ``{num: {"dict": {...}|value, "stream": bytes|None}}`` (latest
    generation wins — incremental updates append re-definitions).
    No xref needed; truncated tails keep their parseable head."""
    out: dict[int, dict] = {}
    for m in _OBJ_RE.finditer(data):
        if len(out) >= _MAX_OBJECTS:
            break
        num = int(m.group(1))
        i = m.end()
        val, j = _parse_value(data, i)
        stream = None
        k = _skip_ws(data, j)
        if data[k : k + 6] == b"stream":
            k += 6
            if data[k : k + 2] == b"\r\n":
                k += 2
            elif data[k : k + 1] in (b"\n", b"\r"):
                k += 1
            length = val.get("Length") if isinstance(val, dict) else None
            end = -1
            if isinstance(length, int) and 0 <= length <= len(data) - k:
                cand = k + length
                probe = _skip_ws(data, cand)
                if data[probe : probe + 9] == b"endstream":
                    end = cand
            if end < 0:  # /Length missing, indirect, or wrong: scan
                e = data.find(b"endstream", k)
                if e >= 0:
                    end = e
                    while end > k and data[end - 1] in b"\r\n":
                        end -= 1
            if end >= 0:
                stream = data[k:end]
        out[num] = {"dict": val, "stream": stream}
    # r13: merge ObjStm-EMBEDDED objects into the number space so
    # _resolve reaches font dicts / page-tree nodes / /Resources that
    # modern compressed-xref files keep inside object streams (their
    # /ToUnicode CMap STREAMS are necessarily top-level — streams
    # cannot nest in an ObjStm — so the CMap path composes).  A
    # top-level (re)definition wins: incremental updates append
    # top-level objects that override ObjStm-stored ones.
    for onum, val in _objstm_objects(out):
        if onum not in out and len(out) < _MAX_OBJECTS:
            out[onum] = {"dict": val, "stream": None}
    return out


def _resolve(objs: dict, v, depth: int = 0):
    while isinstance(v, _Ref) and depth < 16:
        entry = objs.get(v[0])
        v = entry["dict"] if entry else None
        depth += 1
    return v


def _decoded_stream(objs: dict, entry: dict) -> bytes | None:
    d = entry.get("dict")
    raw = entry.get("stream")
    if raw is None or not isinstance(d, dict):
        return None
    return decode_stream(
        raw, _resolve(objs, d.get("Filter")), _resolve(objs, d.get("DecodeParms"))
    )


def _objstm_objects(objs: dict) -> list[tuple[int, object]]:
    """``(objnum, value)`` pairs embedded in /Type /ObjStm payloads —
    1.5+ compressed-xref files store most non-stream objects (font
    dicts, page-tree nodes, /Resources) there."""
    found: list[tuple[int, object]] = []
    for entry in objs.values():
        d = entry.get("dict")
        if not (isinstance(d, dict) and d.get("Type") == "ObjStm"):
            continue
        payload = _decoded_stream(objs, entry)
        if payload is None:
            continue
        n = _resolve(objs, d.get("N"))
        first = _resolve(objs, d.get("First"))
        if not (isinstance(n, int) and isinstance(first, int)):
            continue
        # header: N pairs of "objnum offset"
        head = payload[:first].split()
        for k in range(min(n, len(head) // 2)):
            try:
                onum = int(head[2 * k])
                off = int(head[2 * k + 1])
            except ValueError:
                continue
            val, _ = _parse_value(payload, first + off)
            if val is not None:
                found.append((onum, val))
    return found


def pdf_version(data: bytes) -> str | None:
    m = _VERSION_RE.search(data[:1024])
    return m.group(1).decode("ascii") if m else None


def pdf_page_count(data: bytes, objs: dict | None = None) -> int | None:
    """Page count: the root (parentless) ``/Type /Pages`` node's
    ``/Count`` when it parses, else a census of ``/Type /Page`` dicts
    (top-level and ObjStm-embedded)."""
    if objs is None:
        objs = pdf_objects(data)
    # objs already includes ObjStm-embedded objects (merged in
    # pdf_objects since r13) — no separate embedded pass, which would
    # double-count
    dicts = [e["dict"] for e in objs.values() if isinstance(e["dict"], dict)]
    best = None
    for d in dicts:
        if d.get("Type") == "Pages" and "Parent" not in d:
            cnt = d.get("Count")
            if isinstance(cnt, int) and cnt >= 0:
                best = max(best or 0, cnt)
    if best is not None:
        return best
    pages = sum(1 for d in dicts if d.get("Type") == "Page")
    return pages if pages else None


# --------------------------------------------------------------------- #
# ToUnicode CMaps (ISO 32000-1 §9.10.3; Adobe CMap syntax)
# --------------------------------------------------------------------- #

_HEX_TOK = re.compile(rb"<([0-9A-Fa-f\s]*)>|\[|\]")
_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_MAX_SINGLES = 100_000


def _utf16be_hex(hx: bytes) -> str | None:
    """Hex token body → text (UTF-16BE code units, surrogate pairs
    combine into astral codepoints); None on malformed hex."""
    hx = b"".join(hx.split())
    if len(hx) % 2:
        hx += b"0"
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        return None
    return raw.decode("utf-16-be", "replace")


class ToUnicodeCMap:
    """Parsed ``/ToUnicode`` character map: code → Unicode text.

    ``single`` holds bfchar (and array-form bfrange) entries keyed by
    ``(code_byte_length, code)``; ``ranges`` holds bfrange triples as
    ``(length, lo, hi, prefix, last_cp)`` — the spec increments the
    LAST character of the destination, and doing the arithmetic on the
    decoded CODEPOINT (not the raw UTF-16 unit) makes a range whose
    destination is an astral-plane pair (e.g. mathematical alphanumerics
    at U+1D400) step correctly across surrogate boundaries.  Codespace
    ranges drive how many bytes each code consumes (multi-byte CIDs)."""

    __slots__ = ("single", "ranges", "codespaces", "lengths")

    def __init__(self):
        self.single: dict[tuple[int, int], str] = {}
        self.ranges: list[tuple[int, int, int, str, int]] = []
        self.codespaces: list[tuple[int, int, int]] = []
        self.lengths: list[int] = []

    def _finish(self):
        lens = {L for L, _, _ in self.codespaces}
        lens |= {L for (L, _c) in self.single}
        lens |= {L for L, *_ in self.ranges}
        self.lengths = sorted(lens)
        return self

    def lookup(self, k: int, code: int) -> str | None:
        v = self.single.get((k, code))
        if v is not None:
            return v
        for L, lo, hi, prefix, last_cp in self.ranges:
            if L == k and lo <= code <= hi:
                cp = last_cp + (code - lo)
                return prefix + (chr(cp) if cp <= 0x10FFFF else "�")
        return None

    def decode(self, raw: bytes) -> str:
        """String-object bytes → text through the map.  Byte length per
        code comes from the codespace ranges; codes outside every
        declared codespace consume the shortest declared length.
        Unmapped 1-byte codes fall back to the identity path (latin-1,
        the pre-CMap behavior); unmapped multi-byte codes contribute
        nothing (glyph indices without a mapping are garbage, the exact
        failure mode this class exists to remove)."""
        out: list[str] = []
        i, n = 0, len(raw)
        lengths = self.lengths or [1]
        shortest = lengths[0]
        while i < n:
            k_used = None
            code = None
            for k in lengths:
                if i + k > n:
                    continue
                c = int.from_bytes(raw[i : i + k], "big")
                if any(
                    L == k and lo <= c <= hi for L, lo, hi in self.codespaces
                ):
                    k_used, code = k, c
                    break
            if k_used is None:
                k_used = min(shortest, n - i)
                code = int.from_bytes(raw[i : i + k_used], "big")
            s = self.lookup(k_used, code)
            if s is None and k_used == 1:
                s = bytes([code]).decode("latin-1")
            if s:
                out.append(s)
            i += k_used
        return "".join(out)


def parse_tounicode(data: bytes) -> ToUnicodeCMap | None:
    """Parse a decoded ``/ToUnicode`` CMap stream; ``None`` when no
    usable mapping parses (corrupt CMap → caller falls back to the
    identity path — refusal, never garbage amplification)."""
    cmap = ToUnicodeCMap()
    for m in _CODESPACE_RE.finditer(data):
        toks = [t for t in _HEX_TOK.findall(m.group(1)) if t not in (b"", None)]
        hexes = [t for t in toks if isinstance(t, bytes) and t not in (b"[", b"]")]
        for j in range(0, len(hexes) - 1, 2):
            lo_h = b"".join(hexes[j].split())
            hi_h = b"".join(hexes[j + 1].split())
            if not lo_h or len(lo_h) != len(hi_h) or len(lo_h) % 2:
                continue
            try:
                lo = int(lo_h, 16)
                hi = int(hi_h, 16)
            except ValueError:
                continue
            cmap.codespaces.append((len(lo_h) // 2, lo, hi))
    for m in _BFCHAR_RE.finditer(data):
        hexes = re.findall(rb"<([0-9A-Fa-f\s]*)>", m.group(1))
        for j in range(0, len(hexes) - 1, 2):
            src_h = b"".join(hexes[j].split())
            if not src_h or len(src_h) % 2:
                continue
            dst = _utf16be_hex(hexes[j + 1])
            if dst is None:
                continue
            try:
                code = int(src_h, 16)
            except ValueError:
                continue
            if len(cmap.single) < _CMAP_MAX_SINGLES:
                cmap.single[(len(src_h) // 2, code)] = dst
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        toks: list = []
        for t in _HEX_TOK.finditer(body):
            toks.append(t.group(1) if t.group(1) is not None else t.group(0))
        j = 0
        while j + 2 < len(toks):
            lo_t, hi_t = toks[j], toks[j + 1]
            if lo_t in (b"[", b"]") or hi_t in (b"[", b"]"):
                j += 1
                continue
            lo_h = b"".join(lo_t.split())
            hi_h = b"".join(hi_t.split())
            if not lo_h or len(lo_h) != len(hi_h) or len(lo_h) % 2:
                j += 2
                continue
            try:
                lo = int(lo_h, 16)
                hi = int(hi_h, 16)
            except ValueError:
                j += 2
                continue
            L = len(lo_h) // 2
            if j + 2 < len(toks) and toks[j + 2] == b"[":
                # array form: <lo> <hi> [<d0> <d1> ...]
                k = j + 3
                off = 0
                while k < len(toks) and toks[k] != b"]":
                    dst = _utf16be_hex(toks[k])
                    if dst is not None and lo + off <= hi and (
                        len(cmap.single) < _CMAP_MAX_SINGLES
                    ):
                        cmap.single[(L, lo + off)] = dst
                    off += 1
                    k += 1
                j = k + 1
                continue
            if j + 2 >= len(toks):
                break
            dst = _utf16be_hex(toks[j + 2])
            j += 3
            if dst is None or hi < lo or not dst:
                continue
            cmap.ranges.append((L, lo, hi, dst[:-1], ord(dst[-1])))
    cmap._finish()
    if not cmap.single and not cmap.ranges:
        return None
    return cmap


def _font_cmaps(objs: dict, resources) -> dict[str, ToUnicodeCMap]:
    """Font-name → parsed ToUnicode CMap for one /Resources dict (ref
    or inline); fonts without a usable /ToUnicode are simply absent
    (identity fallback)."""
    res = _resolve(objs, resources)
    if not isinstance(res, dict):
        return {}
    fonts = _resolve(objs, res.get("Font"))
    if not isinstance(fonts, dict):
        return {}
    out: dict[str, ToUnicodeCMap] = {}
    for name, ref in fonts.items():
        fd = _resolve(objs, ref)
        if not isinstance(fd, dict):
            continue
        tu = fd.get("ToUnicode")
        if not isinstance(tu, _Ref):
            continue
        entry = objs.get(tu[0])
        if entry is None:
            continue
        payload = _decoded_stream(objs, entry)
        if payload is None:
            continue
        cmap = parse_tounicode(payload)
        if cmap is not None:
            out[name] = cmap
    return out


# --------------------------------------------------------------------- #
# content-stream text
# --------------------------------------------------------------------- #

_OP_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


class _RawStr(bytes):
    """A string object captured RAW from a content stream — decoding
    waits until show time, when the current font's CMap is known."""


def _parse_show_array(b: bytes, i: int):
    """``[ ... ]`` operand of TJ with strings kept raw; i at '['."""
    arr: list = []
    i += 1
    n = len(b)
    while i < n:
        i = _skip_ws(b, i)
        if i >= n or b[i : i + 1] == b"]":
            return arr, i + 1
        ch = b[i : i + 1]
        if ch == b"(":
            raw, i = _parse_literal_string(b, i)
            arr.append(_RawStr(raw))
        elif ch == b"<":
            j = b.find(b">", i + 1)
            if j < 0:
                return arr, n
            hx = b"".join(b[i + 1 : j].split())
            if len(hx) % 2:
                hx += b"0"
            try:
                arr.append(_RawStr(bytes.fromhex(hx.decode("ascii"))))
            except ValueError:
                pass
            i = j + 1
        else:
            m = _NUM_RE.match(b, i)
            if m:
                tok = m.group()
                arr.append(float(tok) if b"." in tok else int(tok))
                i = m.end()
            else:
                i += 1
    return arr, i


def extract_text_ops(
    stream: bytes, fonts: dict[str, ToUnicodeCMap] | None = None
) -> str:
    """Run the text operators of ONE decoded content stream →
    best-effort text.  String operands stay RAW until a show operator
    fires, then decode through the CURRENT font's ``/ToUnicode`` CMap
    (tracked via ``Tf``; r13 — subset-embedded CID fonts now extract
    real text); fonts without a usable CMap keep the r12 identity path
    (``_string_to_text``, PDFDocEncoding ≈ latin-1)."""
    fonts = fonts or {}
    out: list[str] = []
    stack: list = []
    in_bt = False
    line_has_text = False
    cur_cmap: ToUnicodeCMap | None = None
    i = 0
    n = len(stream)

    def newline():
        nonlocal line_has_text
        if line_has_text:
            out.append("\n")
            line_has_text = False

    def show(s):
        nonlocal line_has_text
        if isinstance(s, _RawStr):
            s = cur_cmap.decode(bytes(s)) if cur_cmap else _string_to_text(s)
        if s:
            out.append(s)
            line_has_text = True

    while i < n:
        i = _skip_ws(stream, i)
        if i >= n:
            break
        ch = stream[i : i + 1]
        if ch == b"(":
            raw, i = _parse_literal_string(stream, i)
            stack.append(_RawStr(raw))
        elif stream[i : i + 2] == b"<<":
            d, i = _parse_value(stream, i)
            stack.append(d)
        elif ch == b"<":
            j = stream.find(b">", i + 1)
            if j < 0:
                break
            hx = b"".join(stream[i + 1 : j].split())
            if len(hx) % 2:
                hx += b"0"
            try:
                stack.append(_RawStr(bytes.fromhex(hx.decode("ascii"))))
            except ValueError:
                pass
            i = j + 1
        elif ch == b"[":
            v, i = _parse_show_array(stream, i)
            stack.append(v)
        elif ch == b"/":
            v, i = _parse_name(stream, i)
            stack.append(v)
        elif _NUM_RE.match(stream, i):
            m = _NUM_RE.match(stream, i)
            tok = m.group()
            stack.append(float(tok) if b"." in tok else int(tok))
            i = m.end()
        else:
            m = _OP_RE.match(stream, i)
            if not m:
                i += 1
                continue
            op = m.group()
            i = m.end()
            if op == b"BT":
                in_bt = True
            elif op == b"ET":
                newline()
                in_bt = False
            elif op == b"Tf":
                # [/FontName size] Tf — switch the active CMap (works
                # outside BT too; viewers allow it)
                name = stack[-2] if len(stack) >= 2 else None
                cur_cmap = fonts.get(name) if isinstance(name, str) else None
            elif in_bt and op == b"Tj":
                if stack and isinstance(stack[-1], _RawStr):
                    show(stack[-1])
            elif in_bt and op == b"'":
                newline()
                if stack and isinstance(stack[-1], _RawStr):
                    show(stack[-1])
            elif in_bt and op == b'"':
                newline()
                if stack and isinstance(stack[-1], _RawStr):
                    show(stack[-1])
            elif in_bt and op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, _RawStr):
                            show(el)
                        elif isinstance(el, (int, float)) and el < -180:
                            # big negative kern = inter-word space
                            if line_has_text and not out[-1].endswith(" "):
                                out.append(" ")
            elif in_bt and op in (b"Td", b"TD"):
                ty = stack[-1] if stack else 0
                tx = stack[-2] if len(stack) >= 2 else 0
                if isinstance(ty, (int, float)) and ty != 0:
                    newline()
                elif isinstance(tx, (int, float)) and tx != 0 and line_has_text:
                    if not out[-1].endswith(" "):
                        out.append(" ")
            elif in_bt and op == b"T*":
                newline()
            elif in_bt and op == b"Tm":
                newline()
            stack.clear()
    return "".join(out).rstrip("\n")


def _page_content_streams(
    objs: dict,
) -> tuple[list[tuple[bytes, dict]], set[int]]:
    """Decoded ``(content, fonts)`` pairs in PAGE-TREE order (catalog →
    /Pages → /Kids depth-first → per-page /Contents ref-or-array) —
    ``fonts`` is the page's font-name → ToUnicode CMap map, inherited
    /Resources resolved down the tree — plus the set of object numbers
    consumed.  A page's /Contents ARRAY concatenates with a space
    separator per ISO 32000 §7.8.2 — operators may straddle the stream
    boundary, so pieces must be joined BEFORE tokenizing, never
    tokenized separately.  Broken/absent trees return ([], set()) and
    the caller falls back to document order."""
    catalog = None
    for entry in objs.values():
        d = entry.get("dict")
        if isinstance(d, dict) and d.get("Type") == "Catalog":
            catalog = d
    if catalog is None:
        return [], set()
    out: list[tuple[bytes, dict]] = []
    used: set[int] = set()
    seen: set[int] = set()

    def walk(ref, depth: int = 0, inherited_res=None):
        if not isinstance(ref, _Ref) or depth > 64 or ref[0] in seen:
            return
        seen.add(ref[0])
        node = _resolve(objs, ref)
        if not isinstance(node, dict):
            return
        res = node.get("Resources", inherited_res)
        if node.get("Type") == "Pages":
            kids = node.get("Kids")
            if isinstance(kids, list):
                for kid in kids:
                    walk(kid, depth + 1, res)
        elif node.get("Type") == "Page":
            contents = node.get("Contents")
            refs = contents if isinstance(contents, list) else [contents]
            pieces: list[bytes] = []
            for r in refs:
                if not isinstance(r, _Ref):
                    continue
                entry = objs.get(r[0])
                if entry is None:
                    continue
                payload = _decoded_stream(objs, entry)
                if payload is not None:
                    pieces.append(payload)
                    used.add(r[0])
            if pieces:
                out.append((b" ".join(pieces), _font_cmaps(objs, res)))

    walk(catalog.get("Pages"))
    return out, used


def pdf_text(data: bytes) -> str | None:
    """Whole-document best-effort text: pages in PAGE-TREE order when
    the tree parses (objects stored out of document order — common
    after incremental updates — still read page 1 first, and split
    /Contents arrays concatenate before tokenizing), then any
    UNREFERENCED text-bearing streams (Form XObjects, broken-tree
    leftovers) in document order.  ``None`` when ``data`` is not a PDF
    (no ``%PDF-`` header in the first 1 KiB) or no text stream
    parses."""
    if pdf_version(data) is None:
        return None
    objs = pdf_objects(data)
    if not objs:
        return None
    pieces: list[str] = []
    page_streams, used = _page_content_streams(objs)
    doc_fonts: dict = {}
    for payload, fonts in page_streams:
        doc_fonts.update(fonts)
        if b"BT" not in payload:
            continue
        txt = extract_text_ops(payload, fonts).strip("\n")
        if txt:
            pieces.append(txt)
    for num, entry in objs.items():
        if num in used:
            continue
        d = entry.get("dict")
        if isinstance(d, dict) and d.get("Type") in ("ObjStm", "XRef", "Metadata"):
            continue
        payload = _decoded_stream(objs, entry)
        if payload is None or b"BT" not in payload:
            continue
        # orphan streams (Form XObjects, broken trees): best-effort
        # decode with the union of every page's fonts
        txt = extract_text_ops(payload, doc_fonts).strip("\n")
        if txt:
            pieces.append(txt)
    return "\n".join(pieces) if pieces else None


def pdf_info(data: bytes, objs: dict | None = None) -> dict:
    """``{"title": …, "producer": …}`` from the trailer's /Info object
    (classic trailers and XRef-stream trailers both carry /Info);
    missing → NULLs."""
    if objs is None:
        objs = pdf_objects(data)
    refs = []
    for m in re.finditer(rb"trailer\b", data):
        d, _ = _parse_value(data, _skip_ws(data, m.end()))
        if isinstance(d, dict) and isinstance(d.get("Info"), _Ref):
            refs.append(d["Info"])
    for entry in objs.values():
        d = entry.get("dict")
        if isinstance(d, dict) and d.get("Type") == "XRef" and isinstance(
            d.get("Info"), _Ref
        ):
            refs.append(d["Info"])
    title = producer = None
    for ref in refs:
        info = _resolve(objs, ref)
        if isinstance(info, dict):
            title = info.get("Title") if isinstance(info.get("Title"), str) else title
            producer = (
                info.get("Producer")
                if isinstance(info.get("Producer"), str)
                else producer
            )
    return {"title": title, "producer": producer}


# --------------------------------------------------------------------- #
# Spark surface
# --------------------------------------------------------------------- #

_PDF_OUT = (
    "media_id long, n_bytes long, pdf_version string, n_pages int, "
    "title string, producer string, n_chars int, text string"
)


def pdf_features(
    media: DataFrame, *, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-document PDF parse over the Arrow ``mapInPandas`` boundary:
    one row per payload that carries a ``%PDF-`` header AND yields at
    least a version + object walk — version, page count, /Info title
    and producer, extracted text and its length.  Non-PDF payloads and
    shards so corrupt that nothing parses are DROPPED (the
    ``warc_records`` refusal posture: a half-uploaded document is
    absent, never silently empty); a truncated-but-headed PDF keeps
    whatever pages parse, ``text`` NULL when no text stream survives.
    Map-only, zero shuffle, embarrassingly parallel — the same 100 TB
    posture as the image/audio decoders in ``multimodal.py``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, blob in zip(pdf_batch[id_col], pdf_batch[content_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                ver = pdf_version(data)
                if ver is None:
                    continue
                objs = pdf_objects(data)
                if not objs:
                    continue  # headed but nothing parses: refusal
                txt = pdf_text(data)
                info = pdf_info(data, objs)
                rows.append(
                    (
                        int(mid),
                        len(data),
                        ver,
                        pdf_page_count(data, objs),
                        info["title"],
                        info["producer"],
                        len(txt) if txt is not None else None,
                        txt,
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "pdf_version", "n_pages",
                    "title", "producer", "n_chars", "text",
                ],
            )
            out["n_pages"] = pd.array(out["n_pages"], dtype="Int32")
            out["n_chars"] = pd.array(out["n_chars"], dtype="Int32")
            yield out

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    return media.mapInPandas(run, schema=_PDF_OUT)
