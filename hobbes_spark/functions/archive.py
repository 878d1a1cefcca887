"""Tar / compressed-tar archive ingestion — pure Python, Arrow-batched.

Web-scale corpora ship as ``.tar.gz``/``.tar.zst`` bundles (source-code
dumps, paper bundles, dataset shards).  This layer walks the USTAR/PAX
block structure directly and routes every regular-file member through
the unified extraction front-end (``extract.extract_any``), so one
archive column explodes into per-member documents with kind + text —
the recursive composition the router was built for.

Codec sniffing reuses ``warc.sniff_decompress`` (gzip multi-member,
zstd via libzstd/pure fallback, bzip2, xz, plain) with the same
decompression cap and the same refusal posture: an archive that
neither inflates nor starts with a tar header is absent, a TRUNCATED
tar keeps the members whose 512-byte blocks made it (the keep-your-
head discipline).

Tar specifics handled: USTAR magic optional (pre-POSIX tars), octal
and GNU base-256 sizes, ``prefix`` field joining, PAX extended headers
(``x``/``g`` — ``path=`` overrides from the keyword block), GNU
longname (``L``) entries, hardlink/symlink/dir/char/block/fifo members
skipped as non-documents.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MAX_MEMBERS = 100_000
#: per-member payload clip: one giant member must not dominate an
#: executor batch — the member still APPEARS (true size reported), its
#: payload is just clipped (ADVICE r12: silent skip contradicted the
#: complete-inventory contract)
_MEMBER_CAP = 64 << 20
#: whole-archive decompression cap (sniff_decompress in untar_any) —
#: distinct from the per-member clip: a tar of many member-cap-sized
#: files is legitimate
_ARCHIVE_CAP = 512 << 20


def _tar_num(field: bytes) -> int | None:
    """Octal (NUL/space-terminated) or GNU base-256 numeric field."""
    if not field:
        return None
    if field[0] & 0x80:  # GNU base-256
        val = field[0] & 0x7F
        for b in field[1:]:
            val = (val << 8) | b
        return val
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        return None


def tar_members(data: bytes):
    """Yield ``(name, payload, size)`` for every regular-file member of
    a (already decompressed) tar stream.  ``payload`` may be SHORTER
    than ``size``: a truncated archive tail (keep-your-head) or an
    over-:data:`_MEMBER_CAP` member whose payload is clipped — either
    way the inventory row survives with the member's TRUE size.  Never
    raises; stops at the first unparseable header or end-of-archive
    marker."""
    pos = 0
    n = len(data)
    pending_longname: str | None = None
    pax_path: str | None = None
    count = 0
    while pos + 512 <= n and count < _MAX_MEMBERS:
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break  # end-of-archive
        size = _tar_num(hdr[124:136])
        if size is None or size < 0:
            break
        typeflag = hdr[156:157]
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if prefix and hdr[257:262] == b"ustar":
            name = prefix + "/" + name
        body = data[pos + 512 : pos + 512 + size]
        pos += 512 + ((size + 511) // 512) * 512
        count += 1
        if typeflag == b"L":  # GNU longname: body is the NEXT name
            pending_longname = body.split(b"\x00", 1)[0].decode(
                "utf-8", "replace")
            continue
        if typeflag in (b"x", b"g"):  # PAX keywords: length key=value\n
            pax_path = None
            i = 0
            while i < len(body):
                sp = body.find(b" ", i)
                if sp < 0:
                    break
                try:
                    ln = int(body[i:sp])
                except ValueError:
                    break
                kv = body[sp + 1 : i + ln - 1]
                if kv.startswith(b"path="):
                    pax_path = kv[5:].decode("utf-8", "replace")
                i += ln if ln > 0 else len(body)
            continue
        if pending_longname is not None:
            name = pending_longname
            pending_longname = None
        if pax_path is not None:
            name = pax_path
            pax_path = None
        if typeflag in (b"0", b"\x00", b""):  # regular file
            yield name, body[:_MEMBER_CAP], size
            if len(body) < size:
                break  # truncated tail: partial last member surfaced


def untar_any(data: bytes):
    """Sniff-decompress (gzip/zstd/bzip2/xz/plain) then walk tar
    members; ``None`` when the payload is neither a tar nor inflates
    to one."""
    from hobbes_spark.functions.multimodal import sniff_decompress

    raw = bytes(data)
    if _looks_tar(raw):
        return list(tar_members(raw))
    got = sniff_decompress(raw, _ARCHIVE_CAP)
    if got is None:
        return None
    _codec, inflated = got
    if not _looks_tar(inflated):
        return None
    return list(tar_members(inflated))


def _looks_tar(b: bytes) -> bool:
    if len(b) < 512:
        return False
    if b[257:262] == b"ustar":
        return True
    # pre-POSIX: validate the header checksum
    hdr = b[:512]
    stored = _tar_num(hdr[148:156])
    if stored is None:
        return False
    calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
    return stored == calc


_ARCHIVE_OUT = (
    "media_id long, member_index int, name string, n_bytes long, "
    "kind string, n_chars int, text string"
)


def archive_documents(
    media: DataFrame, *, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Explode tar/tgz/tzst archives into per-member DOCUMENTS: each
    regular file routes through :func:`extract.extract_any` — one row
    per member with (name, size, kind, text); members that refuse to
    route (undecodable binary) still surface with kind NULL so the
    archive's inventory is complete.  Payloads that are not archives
    are DROPPED.  Map-only over Arrow batches, zero shuffle; member
    count and decompression both capped."""
    from hobbes_spark.functions.extract import extract_any

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, blob in zip(pdf_batch[id_col], pdf_batch[content_col]):
                if blob is None:
                    continue
                members = untar_any(blob)
                if members is None:
                    continue
                for k, (name, body, size) in enumerate(members):
                    kind, text = extract_any(body)
                    # n_bytes is the member's TRUE size even when the
                    # payload was clipped/truncated — the size signal
                    rows.append((
                        int(mid), k, name, size, kind,
                        len(text) if text is not None else None, text,
                    ))
            out = pd.DataFrame(
                rows,
                columns=["media_id", "member_index", "name", "n_bytes",
                         "kind", "n_chars", "text"],
            )
            out["member_index"] = pd.array(out["member_index"], dtype="Int32")
            out["n_chars"] = pd.array(out["n_chars"], dtype="Int32")
            yield out

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    return media.mapInPandas(run, schema=_ARCHIVE_OUT)
