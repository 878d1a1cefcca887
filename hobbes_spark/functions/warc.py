"""WARC (Web ARChive, ISO 28500) record framing — the missing layer
between the compressed-shard codecs (``multimodal.sniff_decompress``)
and the HTML/text stack (``web.html_to_text``, quality scoring, dedup).

A 100 TB web corpus lands as WARC: Common-Crawl-style shards where each
record is its own gzip member (so readers can seek), or whole-shard
zstd/gzip, or plain concatenated records.  A record is:

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: http://example.com/\\r\\n
    Content-Length: 123\\r\\n
    \\r\\n
    <block: exactly Content-Length bytes>\\r\\n\\r\\n

For ``application/http`` response records the block itself is an HTTP
message (status line, headers, blank line, body) and the body is what
feeds the text pipeline.

Reference parity note: the reference engine has no crawl-ingest layer
(its sources are OData/REST/git — hobbes.core submodule, SURVEY §2.1);
this module is part of the beyond-reference LLM-training-data surface
the build plan calls for, alongside dedup/quality/tokenizers.

Scale posture: :func:`warc_records` is map-only over Arrow batches —
one shard in, its records out, zero shuffle.  At 100 TB the work is
CPU-bound inflate+parse per shard and embarrassingly parallel; fan-out
is bounded by records-per-shard (CC shards hold ~50k records over
~1 GB, well inside an Arrow batch after projection).  The bomb cap in
``sniff_decompress`` bounds per-row memory; a half-uploaded shard
refuses whole rather than surfacing silently-truncated records.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import _DECOMPRESS_CAP, sniff_decompress

__all__ = [
    "parse_warc_records",
    "split_http_response",
    "warc_records",
    "sniff_charset",
    "decode_payload",
    "gzip_member_spans",
    "zstd_frame_spans",
    "cdx_index",
    "cdx_fetch",
    "cdx_to_cdxj",
    "cdxj_records",
    "cdx_merge",
]

#: headers surfaced as typed columns (canonical lower-case keys)
_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str] | None:
    """``Name: value`` lines to a lower-cased dict; None on any line
    without a colon (malformed header block).  Values are latin-1
    decoded — WARC headers are ASCII per spec, and latin-1 never
    raises on the bytes a crawler actually wrote."""
    out: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and out:  # obs-fold continuation
            out[last] = out[last] + " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            return None
        last = name.strip().decode("latin-1").lower()
        out[last] = value.strip().decode("latin-1")
    return out


def parse_warc_records(data: bytes, max_records: int = 1 << 20) -> list[dict]:
    """Walk the WARC records in ``data`` (already decompressed).

    Returns a list of dicts with ``version``, the lower-cased header
    map, and ``block`` (the raw Content-Length bytes).  Tolerant in the
    same way the media parsers are: a malformed version line, header
    block, or Content-Length TERMINATES the walk, returning the records
    parsed so far — never raises.  ``max_records`` is a runaway guard
    for crafted input (a real CC shard holds ~5e4)."""
    out: list[dict] = []
    i, n = 0, len(data)
    while i < n and len(out) < max_records:
        # tolerate stray CRLFs between records (some writers pad)
        while data[i : i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        if data[i : i + 5] != b"WARC/":
            break
        head_end = data.find(_CRLF + _CRLF, i)
        if head_end < 0:
            break
        ver_end = data.find(_CRLF, i)
        version = data[i + 5 : ver_end].decode("latin-1")
        headers = _parse_headers(data[ver_end + 2 : head_end])
        if headers is None:
            break
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0 or head_end + 4 + length > n:
            break  # truncated block: refuse the tail, keep the parsed
        block = data[head_end + 4 : head_end + 4 + length]
        out.append({
            "version": version, "headers": headers, "block": block,
            # byte addressing within THIS stream (r13, CDX index build):
            # record start (version line) and total record bytes
            # (headers + separator + block; the inter-record CRLFs are
            # the next record's padding)
            "offset": i, "nbytes": head_end + 4 + length - i,
        })
        i = head_end + 4 + length
    return out


def gzip_member_spans(data: bytes) -> list[tuple[int, int]] | None:
    """``(offset, compressed_length)`` of every gzip MEMBER in a
    multi-member gzip stream — the Common Crawl WARC layout writes one
    member per record precisely so a CDX index can address records in
    the COMPRESSED file and a consumer can range-read one record
    without inflating the shard.  Walks members with
    ``zlib.decompressobj(31)`` + ``unused_data`` (each member's end is
    where the decoder hands back the remainder).  ``None`` when
    ``data`` is not gzip; a trailing corrupt/truncated member ends the
    walk (keep-your-head)."""
    import zlib as _z

    if data[:2] != b"\x1f\x8b":
        return None
    spans: list[tuple[int, int]] = []
    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 2] == b"\x1f\x8b":
        d = _z.decompressobj(31)
        try:
            d.decompress(data[pos:], _DECOMPRESS_CAP)
        except _z.error:
            break
        if not d.eof:
            break  # truncated member
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        spans.append((pos, consumed))
        pos += consumed
    return spans if spans else None


def zstd_frame_spans(data: bytes) -> list[tuple[int, int]] | None:
    """``(offset, compressed_length)`` of every standard zstd frame in
    a multi-frame stream — the ``.warc.zst`` layout (one frame per
    record, the zstd twin of per-record gzip members).  SIZES ONLY, no
    entropy decode: RFC 8878 frame headers + the block-header chain
    (a compressed block's header carries its on-wire size) walk to
    each frame end exactly.  Skippable frames are skipped (warcio puts
    a dictionary there — and a stream whose frames declare a
    dictionary id returns None: such frames cannot decode standalone,
    so per-frame addressing would lie; the caller falls back to
    whole-stream addressing).  ``None`` when not zstd / truncated."""
    from hobbes_spark.functions.multimodal import (
        _ZSTD_MAGIC,
        _zstd_is_skippable,
    )

    n = len(data)
    if n < 4 or (data[:4] != _ZSTD_MAGIC and not _zstd_is_skippable(data[:4])):
        return None
    spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        magic = data[i : i + 4]
        if _zstd_is_skippable(magic):
            if i + 8 > n:
                break
            i += 8 + int.from_bytes(data[i + 4 : i + 8], "little")
            if i > n:
                break
            continue
        if magic != _ZSTD_MAGIC:
            break
        start = i
        j = i + 4
        if j >= n:
            break
        fhd = data[j]
        j += 1
        if fhd & 0x08:  # reserved bit
            break
        single = (fhd >> 5) & 1
        has_checksum = (fhd >> 2) & 1
        did_len = (0, 1, 2, 4)[fhd & 3]
        if did_len:
            return None  # dictionary frames are not standalone
        if not single:
            j += 1  # window descriptor
        fcs_len = (1 if single else 0, 2, 4, 8)[fhd >> 6]
        j += fcs_len
        ok = True
        while True:
            if j + 3 > n:
                ok = False
                break
            hdr = int.from_bytes(data[j : j + 3], "little")
            j += 3
            last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
            if btype == 3:  # reserved
                ok = False
                break
            size = 1 if btype == 1 else bsize  # RLE stores one byte
            if j + size > n:
                ok = False
                break
            j += size
            if last:
                break
        if not ok:
            break
        if has_checksum:
            j += 4
            if j > n:
                break
        spans.append((start, j - start))
        i = j
    return spans if spans else None


def split_http_response(block: bytes):
    """Split an ``application/http; msgtype=response`` block into
    ``(status:int|None, headers:dict, body:bytes)``.  A block that does
    not start with an HTTP status line returns ``(None, {}, block)`` —
    the caller still gets the payload."""
    if not block.startswith(b"HTTP/"):
        return None, {}, block
    head_end = block.find(_CRLF + _CRLF)
    if head_end < 0:
        return None, {}, block
    lines = block[:head_end].split(_CRLF)
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers = _parse_headers(_CRLF.join(lines[1:])) or {}
    return status, headers, block[head_end + 4 :]


#: non-``text/*`` media types whose payloads are still text — decoded
#: rather than NULLed by :func:`warc_records`'s text gate
_TEXTY_EXACT = {
    "application/warc-fields", "application/json",
    "application/javascript", "application/x-javascript",
    "application/xml", "application/xhtml+xml",
    "application/rss+xml", "application/atom+xml",
    "application/x-www-form-urlencoded",
}


def _dechunk_http_body(body: bytes) -> bytes | None:
    """Undo HTTP/1.1 chunked transfer framing (hex size line, CRLF,
    chunk bytes, CRLF, …, 0-size terminator; chunk extensions after
    ';' ignored).  Raw captures keep the wire framing — without this
    the text column interleaves hex lengths into the prose.  Truncated
    streams keep the chunks that parsed (the shard posture); a payload
    that doesn't start with a valid size line returns None (caller
    falls back to the body as-is — many writers strip the framing but
    forget to drop the header)."""
    out = bytearray()
    i = 0
    n = len(body)
    first = True
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            break
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None if first else bytes(out)
        first = False
        if size == 0:
            return bytes(out)
        chunk = body[eol + 2 : eol + 2 + size]
        out += chunk
        if len(chunk) < size:
            return bytes(out)  # truncated: keep what arrived
        i = eol + 2 + size + 2  # skip trailing CRLF
    return bytes(out) if not first else None


#: lazily-loaded libbrotlidec handle: False = not probed yet, None =
#: absent (the zstd precedent, multimodal._load_zstd — ctypes against
#: the OS library, no wheel; refusal fallback when it is missing)
_BROTLI_LIB = False


def _load_brotli():
    """Resolve the system libbrotlidec once via ctypes; None if absent
    or its symbols don't bind (then ``br`` bodies refuse to NULL,
    exactly the pre-r13 posture)."""
    global _BROTLI_LIB
    if _BROTLI_LIB is not False:
        return _BROTLI_LIB
    import ctypes
    import ctypes.util

    lib = None
    name = ctypes.util.find_library("brotlidec")
    if name:
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            lib.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
            lib.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t)]
        except (OSError, AttributeError):
            lib = None
    _BROTLI_LIB = lib
    return lib


def _brotli_decompress(b: bytes, cap: int = _DECOMPRESS_CAP) -> bytes | None:
    """Streaming brotli decode through BrotliDecoderDecompressStream
    (RFC 7932 wire format; the C API is the reference brotli library's
    public surface).  Output drains in 128 KiB chunks under ``cap``;
    truncated input (NEEDS_MORE_INPUT at end of data), decoder error,
    or an absent library all return None — refusal, never noise."""
    import ctypes

    lib = _load_brotli()
    if lib is None:
        return None
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        return None
    try:
        src = ctypes.create_string_buffer(b, len(b))
        avail_in = ctypes.c_size_t(len(b))
        next_in = ctypes.c_void_p(ctypes.addressof(src))
        chunk = 1 << 17
        dst = ctypes.create_string_buffer(chunk)
        parts: list[bytes] = []
        total = 0
        while True:
            avail_out = ctypes.c_size_t(chunk)
            next_out = ctypes.c_void_p(ctypes.addressof(dst))
            total_out = ctypes.c_size_t(0)
            res = lib.BrotliDecoderDecompressStream(
                ctypes.c_void_p(state),
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out),
                ctypes.byref(total_out))
            produced = chunk - avail_out.value
            total += produced
            if total > cap:
                return None
            parts.append(dst.raw[:produced])
            if res == 1:  # BROTLI_DECODER_RESULT_SUCCESS
                return b"".join(parts)
            if res == 3:  # NEEDS_MORE_OUTPUT: drain and continue
                continue
            return None  # ERROR (0) or NEEDS_MORE_INPUT (2): truncated
    finally:
        lib.BrotliDecoderDestroyInstance(ctypes.c_void_p(state))


def _inflate_http_body(body: bytes, coding: str) -> bytes | None:
    """Undo an HTTP ``Content-Encoding`` chain: gzip (tolerant of
    truncated tails), zlib-wrapped AND raw deflate (both spellings
    exist in the wild), x-gzip alias, br via the system libbrotlidec
    (refusal fallback when absent).  A comma-separated list is undone
    in REVERSE order (RFC 9110 §8.4: codings are listed in application
    order, so the last is the outermost), skipping ``identity`` tokens
    — 'deflate, gzip' un-gzips then un-deflates, 'gzip, identity'
    un-gzips (both mis-handled before r13, ADVICE r12).  ``None`` as
    soon as any non-identity layer is unsupported (zstd-without-
    dictionary, compress) or fails — the caller NULLs the body instead
    of surfacing binary noise as text."""
    import zlib as _z

    data: bytes | None = body
    for tok in reversed([t.strip().lower() for t in coding.split(",")]):
        if tok in ("", "identity"):
            continue
        if tok in ("gzip", "x-gzip"):
            d = _z.decompressobj(31)
            try:
                data = d.decompress(data, _DECOMPRESS_CAP)
            except _z.error:
                return None
        elif tok == "deflate":
            inner = None
            for wbits in (15, -15):  # zlib-wrapped first, then raw
                d = _z.decompressobj(wbits)
                try:
                    out = d.decompress(data, _DECOMPRESS_CAP)
                except _z.error:
                    continue
                if out:
                    inner = out
                    break
            if inner is None:
                return None
            data = inner
        elif tok == "br":
            data = _brotli_decompress(data)
            if data is None:
                return None
        else:
            return None
    return data


def _texty_content_type(ct) -> bool:
    """True when a Content-Type names a text-like payload worth
    decoding to a string.  A MISSING content type reads True (legacy
    HTML frequently ships without one; the charset ladder copes), but
    a declared binary type (image/*, application/pdf, octet-stream)
    reads False so :func:`warc_records` NULLs the body instead of
    surfacing replacement-character noise — at real-crawl scale most
    resource-record bytes are binary, and ``content_length`` stays as
    the size signal."""
    if not ct:
        return True
    t = str(ct).split(";", 1)[0].strip().lower()
    return (
        t.startswith("text/")
        or t in _TEXTY_EXACT
        or t.endswith("+json")
        or t.endswith("+xml")
        or t.startswith("application/http")
    )


def warc_records(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    encoding: str = "utf-8",
    cap: int = _DECOMPRESS_CAP,
) -> DataFrame:
    """WARC shard ingestion over a binary column through the Arrow
    ``mapInPandas`` boundary: per shard, sniff-and-inflate the codec
    (gzip with per-record members — the Common Crawl layout — zstd,
    bzip2, xz, or already-plain ``WARC/`` text), walk the record
    framing, and emit one row per record with the headers a corpus
    pipeline routes on (``WARC-Type``, ``WARC-Target-URI``,
    ``WARC-Date``) plus, for HTTP response records, the parsed status
    / Content-Type and the HTTP body decoded as text through the
    :func:`sniff_charset` ladder (BOM > Content-Type charset > <meta>
    prescan > ``encoding`` default, always ``errors='replace'``) ready
    for :func:`~hobbes_spark.functions.web.html_to_text` — legacy
    windows-1252/shift_jis pages decode correctly instead of
    mojibaking.  Non-HTTP records surface their block as the body.
    Payloads whose DECLARED content type is binary (image responses,
    application/pdf resource records) get a NULL body instead of
    replacement-character noise (:func:`_texty_content_type`);
    ``content_length`` remains the size signal.
    Shards that neither inflate nor start with ``WARC/`` are DROPPED
    (same posture as ``decompress_text``: a half-uploaded shard is
    absent, never silently truncated)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                raw = bytes(blob)
                if raw[:5] == b"WARC/":
                    codec, data = "none", raw
                else:
                    got = sniff_decompress(raw, cap)
                    if got is None:
                        continue
                    codec, data = got
                for k, rec in enumerate(parse_warc_records(data)):
                    h = rec["headers"]
                    ctype = h.get("content-type", "")
                    if ctype.replace(" ", "").startswith("application/http"):
                        status, hh, body = split_http_response(rec["block"])
                        http_ct = hh.get("content-type")
                        location = hh.get("location")
                        texty = _texty_content_type(http_ct)
                        # HTTP Content-Encoding: served-compressed
                        # bodies (gzip/deflate are common on real
                        # crawls) inflate BEFORE charset decode —
                        # without this the text column is binary noise.
                        # Unsupported codings (br/zstd without stored
                        # context) NULL the body rather than mojibake.
                        tenc = (hh.get("transfer-encoding") or "").strip().lower()
                        if texty and "chunked" in tenc:
                            dechunked = _dechunk_http_body(body)
                            if dechunked is not None:
                                body = dechunked
                        cenc = (hh.get("content-encoding") or "").strip().lower()
                        if texty and cenc and cenc != "identity":
                            inflated = _inflate_http_body(body, cenc)
                            if inflated is None:
                                texty = False
                            else:
                                body = inflated
                    else:
                        status, http_ct, body = None, None, rec["block"]
                        location = None
                        texty = _texty_content_type(ctype)
                    if texty:
                        _, text = decode_payload(body, http_ct, default=encoding)
                    else:
                        # declared-binary payload (image response, raw
                        # resource record): body NULL, size signal stays
                        text = None
                    rows.append((
                        int(mid), k, codec, rec["version"],
                        h.get("warc-type"), h.get("warc-target-uri"),
                        h.get("warc-date"), len(rec["block"]),
                        status, http_ct, text,
                        h.get("warc-record-id"),
                        h.get("warc-refers-to"),
                        h.get("warc-refers-to-target-uri"),
                        h.get("warc-payload-digest"),
                        location,
                    ))
            pdf_out = pd.DataFrame(
                rows,
                columns=["media_id", "record_index", "codec", "warc_version",
                         "warc_type", "target_uri", "warc_date",
                         "content_length", "http_status", "http_content_type",
                         "body", "warc_record_id", "warc_refers_to",
                         "warc_refers_to_target_uri", "warc_payload_digest",
                         "http_location"],
            )
            # typed NULLs across Arrow for the nullable int column
            pdf_out["http_status"] = pd.array(
                pdf_out["http_status"], dtype="Int32")
            yield pdf_out

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    return media.mapInPandas(
        run,
        schema=("media_id long, record_index int, codec string, "
                "warc_version string, warc_type string, target_uri string, "
                "warc_date string, content_length long, http_status int, "
                "http_content_type string, body string, "
                "warc_record_id string, warc_refers_to string, "
                "warc_refers_to_target_uri string, "
                "warc_payload_digest string, http_location string"),
    )


def redirect_edges(records: DataFrame) -> DataFrame:
    """URL alias edges from 3xx responses: a crawl's redirect graph —
    (from_uri → to_uri, status, permanent) — feeds canonical-URL
    collapse exactly like ``rel=canonical`` and revisit linkage do.
    Relative ``Location`` values resolve per RFC 3986 §5.3: absolute-
    path ``/p`` against the request's ORIGIN (scheme + full authority,
    port preserved — ``http://site:8080/x`` → ``http://site:8080/p``,
    not the default port; ADVICE r12), protocol-relative ``//host/p``
    against its lowercased scheme, and bare-relative ``p`` against the
    request path's DIRECTORY (merge step; dot-segment normalization of
    ``../`` is deliberately not applied — crawl 3xx Locations are
    overwhelmingly absolute or root-relative and the alias graph only
    needs byte-stable keys).  Input is :func:`warc_records` output;
    one map-only projection + filter, zero shuffle."""
    rec = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(300, 399)
        & F.col("http_location").isNotNull()
        & F.col("target_uri").isNotNull()
    )
    loc = F.trim(F.col("http_location"))
    scheme = F.lower(
        F.regexp_extract(F.col("target_uri"), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    # full authority (host[:port], userinfo if any) — url_host would
    # strip the port and change the origin
    authority = F.regexp_extract(
        F.col("target_uri"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    origin = F.concat(scheme, F.lit("://"), authority)
    path = F.regexp_extract(
        F.col("target_uri"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    dirpath = F.regexp_replace(path, r"[^/]*$", "")
    dirpath = F.when(dirpath == "", F.lit("/")).otherwise(dirpath)
    resolved = (
        F.when(loc.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), loc)
        .when(loc.startswith("//"), F.concat(scheme, F.lit(":"), loc))
        .when(loc.startswith("/"), F.concat(origin, loc))
        .otherwise(F.concat(origin, dirpath, loc))
    )
    return rec.select(
        "media_id",
        "record_index",
        F.col("target_uri").alias("from_uri"),
        resolved.alias("to_uri"),
        F.col("http_status").alias("status"),
        F.col("http_status").isin(301, 308).alias("permanent"),
    )


def revisit_edges(records: DataFrame) -> DataFrame:
    """URL-level duplicate edges from crawler-side ``revisit`` records
    (ISO 28500 §6.7.2 / Common Crawl practice): when a crawler re-fetches
    a URL and the payload digest matches something already stored, it
    writes a ``WARC-Type: revisit`` record carrying ``WARC-Refers-To``
    (the original record's ID) and/or ``WARC-Refers-To-Target-URI`` —
    dedup the crawler ALREADY computed, which a corpus pipeline should
    consume instead of re-hashing text (r11 verdict item 4: without
    this, a real CC run re-discovers work the crawler did).

    Input is :func:`warc_records` output.  One broadcast-or-shuffle
    equi-join keyed on the record ID (the revisit side of a crawl is a
    small fraction of records; Catalyst/AQE picks the strategy):
    revisit rows LEFT-join original ``response`` rows on
    ``warc_refers_to = warc_record_id``, and the original URI falls
    back to ``WARC-Refers-To-Target-URI`` when the referred record is
    not in this corpus slice (cross-segment references are normal in
    CC).  Output: one edge per revisit record —
    ``(dup_uri, orig_uri, resolved, media_id, record_index,
    warc_payload_digest)`` with ``resolved`` true iff the original
    record was found.  No text column is ever read."""
    rev = records.filter(F.col("warc_type") == "revisit").select(
        F.col("media_id"),
        F.col("record_index"),
        F.col("target_uri").alias("dup_uri"),
        F.col("warc_refers_to").alias("__rv_ref"),
        F.col("warc_refers_to_target_uri").alias("__rv_ref_uri"),
        F.col("warc_payload_digest"),
    )
    orig = records.filter(
        (F.col("warc_type") == "response") & F.col("warc_record_id").isNotNull()
    ).select(
        F.col("warc_record_id").alias("__rv_ref"),
        F.col("target_uri").alias("__rv_orig_uri"),
    )
    joined = rev.join(orig, "__rv_ref", "left")
    return joined.select(
        "media_id",
        "record_index",
        "dup_uri",
        F.coalesce("__rv_orig_uri", "__rv_ref_uri").alias("orig_uri"),
        F.col("__rv_orig_uri").isNotNull().alias("resolved"),
        "warc_payload_digest",
    )


# --------------------------------------------------------------------- #
# Charset detection (round 11): real crawls are NOT all utf-8 — legacy
# pages declare windows-1252/iso-8859-1/shift_jis via the HTTP
# Content-Type charset parameter or a <meta charset> tag, and decoding
# them as utf-8 mojibakes exactly the long-tail text a multilingual
# corpus wants.  Detection order per the WHATWG encoding sniff: BOM
# beats HTTP header beats in-document <meta>, else the caller default.
# --------------------------------------------------------------------- #

_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

import re as _re

_META_CHARSET = _re.compile(
    rb"""(?is)<meta\s[^>]*charset\s*=\s*["']?\s*([a-z0-9_.:-]+)"""
)
_CT_CHARSET = _re.compile(r"(?i)charset\s*=\s*\"?([A-Za-z0-9_.:-]+)")


def sniff_charset(body: bytes, content_type: str | None = None) -> str | None:
    """Declared charset of an HTML/text payload, or None: BOM first
    (authoritative), then the Content-Type header's charset parameter,
    then a ``<meta charset>`` / ``http-equiv`` declaration in the first
    1024 bytes (the WHATWG prescan window).  Returns the name as
    declared (lowercased) — validity is the decoder's problem."""
    for bom, name in _BOMS:
        if body[: len(bom)] == bom:
            return name
    if content_type:
        m = _CT_CHARSET.search(content_type)
        if m:
            return m.group(1).lower()
    m = _META_CHARSET.search(body[:1024])
    if m:
        return m.group(1).decode("ascii", errors="replace").lower()
    return None


def decode_payload(
    body: bytes, content_type: str | None = None, default: str = "utf-8"
) -> tuple[str, str]:
    """``(charset_used, text)``: decode with the sniffed charset,
    falling back to ``default`` when nothing is declared or the
    declared name is not a known codec; ``errors='replace'`` always —
    one mojibake page must not kill an executor batch."""
    cs = sniff_charset(body, content_type) or default
    try:
        text = body.decode(cs, errors="replace")
    except LookupError:  # declared garbage like charset=unicode
        cs, text = default, body.decode(default, errors="replace")
    # utf-8-sig strips its BOM; the utf-16/32 -le/-be codecs do not —
    # a leading U+FEFF is framing, not content, either way
    return cs, text.lstrip("﻿")


# --------------------------------------------------------------------- #
# CDX(J) capture index + selective fetch (round 13 verdict item 7).
# Real Common Crawl consumers never scan WARC bytes to find pages: they
# query the CDX index (SURT key -> shard/offset/length) and range-read
# ONLY the matching records.  cdx_index builds that index from shard
# columns; cdx_fetch is the consumer half — it touches O(matches)
# bytes, not O(records), whenever the shard layout is addressable
# (plain, or the CC one-gzip-member-per-record layout).
# --------------------------------------------------------------------- #

_CDX_OUT = (
    "media_id long, record_index int, surt string, ts string, url string, "
    "status int, mime string, digest string, offset long, length long, "
    "addressing string"
)


def _bare_mime(ct) -> str | None:
    if not ct:
        return None
    return str(ct).split(";", 1)[0].strip().lower() or None


def _cdx_rows_for_stream(mid, base_offset, comp_len, raw, addressing):
    """Index rows for the records of ONE addressable stream (a whole
    plain shard, or one inflated gzip member)."""
    import hashlib
    import re

    rows = []
    for rec in parse_warc_records(raw):
        h = rec["headers"]
        status, hh, _body = (
            split_http_response(rec["block"])
            if h.get("warc-type") == "response"
            else (None, {}, rec["block"])
        )
        ts = re.sub(r"\D", "", h.get("warc-date") or "")[:14] or None
        digest = h.get("warc-payload-digest") or (
            "md5:" + hashlib.md5(rec["block"]).hexdigest()
        )
        mime = _bare_mime(hh.get("content-type")) or _bare_mime(
            h.get("content-type")
        )
        if addressing in ("gzip-member", "zstd-frame"):
            # frame-addressed layouts: the record's address IS its
            # compressed frame/member
            off, ln = base_offset, comp_len
        else:
            off, ln = base_offset + rec["offset"], rec["nbytes"]
        rows.append((
            int(mid), h.get("warc-target-uri"), ts, status, mime, digest,
            off, ln, addressing,
        ))
    return rows


def cdx_index(
    media: DataFrame, *, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """CDXJ-style capture index over a WARC-shard binary column: one
    row per record with the fields a crawl consumer prunes on — SURT
    key (``web.surt_key``, range-prunable by host/domain), 14-digit
    timestamp, URL, HTTP status, bare mime, payload digest
    (``WARC-Payload-Digest`` when the writer recorded one, else
    ``md5:`` over the block), and the byte ADDRESS of the record:

    * ``gzip-member`` — the CC layout: offset/length of the record's
      own gzip member in the COMPRESSED shard (range-read + inflate
      one member);
    * ``raw`` — plain shards: offset/length of the record bytes;
    * ``decompressed`` — whole-stream codecs (zstd/bzip2/xz): offsets
      into the inflated stream; selective access still prunes which
      RECORDS parse, but the stream must inflate once per shard (the
      documented cost of non-member layouts — re-shard to member gzip
      for true range reads).

    Map-only over Arrow batches, zero shuffle; write sorted by
    ``surt, ts`` for a range-prunable on-disk index."""
    from hobbes_spark.functions.web import surt_key

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                shard_rows = []
                spans = gzip_member_spans(data)
                zspans = None if spans else zstd_frame_spans(data)
                if spans is not None:
                    import zlib as _z

                    for off, ln in spans:
                        d = _z.decompressobj(31)
                        try:
                            raw = d.decompress(
                                data[off : off + ln], _DECOMPRESS_CAP)
                        except _z.error:
                            continue
                        shard_rows += _cdx_rows_for_stream(
                            mid, off, ln, raw, "gzip-member")
                elif zspans is not None:
                    # .warc.zst: one standard frame per record — the
                    # zstd twin of the CC member layout
                    for off, ln in zspans:
                        got = sniff_decompress(
                            data[off : off + ln], _DECOMPRESS_CAP)
                        if got is None:
                            continue
                        shard_rows += _cdx_rows_for_stream(
                            mid, off, ln, got[1], "zstd-frame")
                elif data[:5] == b"WARC/":
                    shard_rows = _cdx_rows_for_stream(
                        mid, 0, len(data), data, "raw")
                else:
                    got = sniff_decompress(data, _DECOMPRESS_CAP)
                    if got is None or not got[1].startswith(b"WARC/"):
                        continue
                    shard_rows = _cdx_rows_for_stream(
                        mid, 0, len(data), got[1], "decompressed")
                rows += [
                    (r[0], k) + r[1:] for k, r in enumerate(shard_rows)
                ]
            out = pd.DataFrame(
                rows,
                columns=["media_id", "record_index", "url", "ts", "status",
                         "mime", "digest", "offset", "length", "addressing"],
            )
            out["record_index"] = pd.array(out["record_index"], dtype="Int32")
            out["status"] = pd.array(out["status"], dtype="Int32")
            yield out

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    flat = media.mapInPandas(
        run,
        schema=("media_id long, record_index int, url string, ts string, "
                "status int, mime string, digest string, offset long, "
                "length long, addressing string"),
    )
    return flat.select(
        "media_id", "record_index", surt_key("url").alias("surt"), "ts",
        "url", "status", "mime", "digest", "offset", "length", "addressing",
    )


def cdx_fetch(
    media: DataFrame,
    matches: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    encoding: str = "utf-8",
) -> DataFrame:
    """Selective record fetch — the consumer half of the CDX plan:
    ``matches`` is a pruned slice of :func:`cdx_index` output
    (``media_id, record_index, offset, length, addressing``), and only
    THOSE byte ranges are read and parsed.  One keyed equi-join
    co-locates each shard with its match list (shards with no matches
    never ship), then a map-only slice+parse per match: O(matches)
    record parses and — on ``raw``/``gzip-member`` layouts —
    O(matches) bytes touched.  Body decodes through the same
    charset/texty gate as :func:`warc_records`."""
    sel = matches.groupBy(F.col(id_col).alias("__cid")).agg(
        F.collect_list(
            F.struct("record_index", "offset", "length", "addressing")
        ).alias("__spans")
    )
    joined = media.join(
        sel, F.col(id_col) == F.col("__cid"), "inner"
    ).select(id_col, content_col, "__spans")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _z

        for pdf in batches:
            rows = []
            for mid, blob, spans in zip(
                pdf[id_col], pdf[content_col], pdf["__spans"]
            ):
                if blob is None:
                    continue
                data = bytes(blob)
                inflated = None  # lazy, once per shard, decompressed only
                for sp in spans:
                    ridx, off, ln, addressing = (
                        int(sp["record_index"]), int(sp["offset"]),
                        int(sp["length"]), sp["addressing"],
                    )
                    if addressing == "gzip-member":
                        d = _z.decompressobj(31)
                        try:
                            raw = d.decompress(data[off : off + ln],
                                               _DECOMPRESS_CAP)
                        except _z.error:
                            continue
                    elif addressing == "zstd-frame":
                        got = sniff_decompress(
                            data[off : off + ln], _DECOMPRESS_CAP)
                        if got is None:
                            continue
                        raw = got[1]
                    elif addressing == "raw":
                        raw = data[off : off + ln]
                    else:  # decompressed addressing: inflate once
                        if inflated is None:
                            got = sniff_decompress(data, _DECOMPRESS_CAP)
                            inflated = got[1] if got else b""
                        raw = inflated[off : off + ln]
                    recs = parse_warc_records(raw)
                    if not recs:
                        continue
                    rec = recs[0]
                    h = rec["headers"]
                    if h.get("warc-type") == "response":
                        status, hh, body = split_http_response(rec["block"])
                        ct = hh.get("content-type")
                        coding = hh.get("content-encoding")
                        if coding:
                            body = _inflate_http_body(body, coding)
                        if body is not None and _texty_content_type(ct):
                            _, text = decode_payload(body, ct, default=encoding)
                        else:
                            text = None
                    else:
                        status, text = None, None
                    rows.append((
                        int(mid), ridx, h.get("warc-target-uri"),
                        status, text,
                    ))
            out = pd.DataFrame(
                rows,
                columns=["media_id", "record_index", "target_uri",
                         "http_status", "body"],
            )
            out["record_index"] = pd.array(out["record_index"], dtype="Int32")
            out["http_status"] = pd.array(out["http_status"], dtype="Int32")
            yield out

    return joined.mapInPandas(
        run,
        schema=("media_id long, record_index int, target_uri string, "
                "http_status int, body string"),
    )


def cdx_to_cdxj(idx: DataFrame) -> DataFrame:
    """Serialize :func:`cdx_index` output to CDXJ text lines — the
    interchange format real crawl indexes ship in (OpenWayback/pywb):
    ``<SURT key> <14-digit ts> <JSON>`` with the JSON fields
    stringified per convention and the shard named in ``filename``.
    One string column ``line``, ORDERED BY (surt, ts) — the sort IS
    the format's contract (binary-searchable / range-prunable on
    disk).  Pure Column ``to_json`` — map-side, the only exchange is
    the final sort.  NULL fields (non-response records) are omitted
    from the JSON, as writers do."""
    js = F.to_json(F.struct(
        F.col("url").alias("url"),
        F.col("digest").alias("digest"),
        F.col("mime").alias("mime"),
        F.col("status").cast("string").alias("status"),
        F.col("offset").cast("string").alias("offset"),
        F.col("length").cast("string").alias("length"),
        F.concat(F.lit("shard-"), F.col("media_id").cast("string"))
            .alias("filename"),
    ))
    return (
        idx.select(
            F.concat_ws(
                " ", F.col("surt"), F.coalesce(F.col("ts"), F.lit("-")), js
            ).alias("line"),
            F.col("surt"), F.col("ts"),
        )
        .orderBy("surt", "ts")
        .select("line")
    )


def cdxj_records(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ lines back to typed capture columns — the consumer
    side of the interchange: ``surt, ts, url, status, mime, digest,
    offset, length, media_id``.  SURT keys never contain spaces, so a
    3-way split is exact; JSON fields come out via get_json_object
    with absent fields reading NULL (writers omit NULLs).  Map-only,
    zero shuffle."""
    parts = F.split(F.col(line_col), " ", 3)
    js = parts[2]
    return df.select(
        parts[0].alias("surt"),
        F.nullif(parts[1], F.lit("-")).alias("ts"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").cast("int").alias("status"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.offset").cast("long").alias("offset"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
        F.regexp_extract(
            F.get_json_object(js, "$.filename"), r"^shard-(\d+)$", 1
        ).cast("long").alias("media_id"),
    )


def cdx_merge(
    old: DataFrame, new: DataFrame, keep: str = "earliest"
) -> DataFrame:
    """Layer two capture indexes (e.g. consecutive monthly crawls) into
    one consumer view: duplicate captures of the SAME content at the
    SAME url key — ``(surt, digest)`` — collapse to a single row,
    keeping the ``earliest`` (default; the canonical original, matching
    revisit-record semantics) or ``latest`` capture by timestamp.  A
    changed page (new digest under the same surt) keeps one row per
    version.  One union + one keyed window — the shuffle key
    (surt, digest) is the index's own sort key, so at 100 TB the merge
    rides the layout the index is already written in."""
    if keep not in ("earliest", "latest"):
        raise ValueError(f"cdx_merge: keep must be earliest|latest, not {keep!r}")
    u = old.unionByName(new)
    order = [
        F.col("ts").asc_nulls_last() if keep == "earliest"
        else F.col("ts").desc_nulls_last(),
        # deterministic tie-break so equal-ts captures pick stably
        F.col("media_id").asc(), F.col("offset").asc(),
    ]
    from pyspark.sql import Window as _W

    w = _W.partitionBy("surt", "digest").orderBy(*order)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
