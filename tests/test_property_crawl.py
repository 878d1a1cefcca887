"""Property tests for the round-11 crawl-ingest parsers: round-trip
laws (serialize -> parse == identity) that hand-picked fixtures can't
exhaust.  Pure-Python properties — no Spark session — so hypothesis
can run hundreds of examples cheaply."""

import gzip
import string

from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------------------------ #
# WARC: records serialized per ISO 28500 parse back to the same
# headers and the byte-exact block, for ARBITRARY binary blocks
# (including blocks containing CRLFCRLF — Content-Length framing, not
# delimiter scanning).
# ------------------------------------------------------------------ #

_token = st.text(string.ascii_letters + string.digits + "-_.", min_size=1,
                 max_size=12)
_uri = st.text(string.ascii_letters + string.digits + ":/.?=&-_%", min_size=1,
               max_size=40)
_block = st.binary(min_size=0, max_size=300)


@given(recs=st.lists(st.tuples(_token, _uri, _block), min_size=1, max_size=6),
       compress=st.booleans())
@settings(max_examples=200, deadline=None)
def test_warc_serialize_parse_roundtrip(recs, compress):
    from hobbes_spark.functions.multimodal import sniff_decompress
    from hobbes_spark.functions.warc import parse_warc_records

    shard = b""
    for rtype, uri, block in recs:
        shard += (b"WARC/1.0\r\n"
                  b"WARC-Type: " + rtype.encode() + b"\r\n"
                  b"WARC-Target-URI: " + uri.encode("utf-8") + b"\r\n"
                  b"Content-Length: " + str(len(block)).encode() + b"\r\n"
                  b"\r\n" + block + b"\r\n\r\n")
    payload = (b"".join(gzip.compress(shard, mtime=0) for _ in [0])
               if compress else shard)
    data = payload
    if compress:
        codec, data = sniff_decompress(payload)
        assert codec == "gzip"
    got = parse_warc_records(data)
    assert len(got) == len(recs)
    for (rtype, uri, block), rec in zip(recs, got):
        assert rec["headers"]["warc-type"] == rtype
        # header values are latin-1 round-tripped; compare bytes-wise
        assert rec["headers"]["warc-target-uri"] == uri.encode("utf-8").decode("latin-1")
        assert rec["block"] == block


@given(members=st.lists(_block, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_multimember_gzip_concatenation_law(members):
    """decompress(concat(gzip(m_i))) == concat(m_i) — the Common Crawl
    shard law the r10 advisor note was about."""
    from hobbes_spark.functions.multimodal import sniff_decompress

    blob = b"".join(gzip.compress(m, mtime=0) for m in members)
    assert sniff_decompress(blob) == ("gzip", b"".join(members))


# ------------------------------------------------------------------ #
# zstd: the hand-built store-mode encoder round-trips through BOTH
# decoders (pure frame walk and, when present, libzstd) — and through
# the real system CLI where available.
# ------------------------------------------------------------------ #


def _zstd_store(data: bytes) -> bytes:
    out = bytearray(b"\x28\xb5\x2f\xfd")
    n = len(data)
    if n <= 255:
        out.append(0x20)
        out += bytes([n])
    else:
        out.append((1 << 6) | 0x20)
        out += (n - 256).to_bytes(2, "little")
    half = n // 2
    out += ((half << 3) | 0).to_bytes(3, "little") + data[:half]
    rest = n - half
    out += ((rest << 3) | 1).to_bytes(3, "little") + data[half:]
    return bytes(out)


@given(chunks=st.lists(st.binary(min_size=0, max_size=400), min_size=1,
                       max_size=4))
@settings(max_examples=100, deadline=None)
def test_zstd_store_frames_roundtrip_both_decoders(chunks):
    from hobbes_spark.functions.multimodal import (
        _load_zstd,
        _zstd_frames_pure,
        _zstd_lib_decompress,
    )

    blob = b"".join(_zstd_store(ch) for ch in chunks)
    want = b"".join(chunks)
    assert _zstd_frames_pure(blob, 1 << 20) == want
    lib = _load_zstd()
    if lib is not None:
        assert _zstd_lib_decompress(lib, blob, 1 << 20) == want


@given(data=st.binary(min_size=0, max_size=500), cut=st.integers(1, 50))
@settings(max_examples=100, deadline=None)
def test_zstd_truncation_always_refuses(data, cut):
    from hobbes_spark.functions.multimodal import _zstd_frames_pure

    blob = _zstd_store(data)
    cut = min(cut, len(blob) - 1)
    assert _zstd_frames_pure(blob[: len(blob) - cut], 1 << 20) is None


# ------------------------------------------------------------------ #
# Subtitles: timestamp format <-> milliseconds is a bijection on the
# valid domain, and a serialized cue list parses back exactly.
# ------------------------------------------------------------------ #


@given(h=st.integers(0, 99), m=st.integers(0, 59), s=st.integers(0, 59),
       ms=st.integers(0, 999))
@settings(max_examples=200, deadline=None)
def test_subtitle_timestamp_bijection(h, m, s, ms):
    from hobbes_spark.functions.subtitles import _ts_ms

    total = ((h * 60 + m) * 60 + s) * 1000 + ms
    assert _ts_ms(f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}") == total
    assert _ts_ms(f"{h:02d}:{m:02d}:{s:02d},{ms:03d}") == total


_cue_text = st.text(
    alphabet=st.characters(blacklist_characters="\r\n<>",
                           blacklist_categories=("Cs",)),
    min_size=1, max_size=40,
).filter(lambda t: t.strip() and "-->" not in t)


@given(cues=st.lists(
    st.tuples(st.integers(0, 10_000_000), st.integers(1, 60_000), _cue_text),
    min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_srt_serialize_parse_roundtrip(cues):
    from hobbes_spark.functions.subtitles import parse_srt

    def fmt(ms):
        s, ms_ = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d},{ms_:03d}"

    text = ""
    for k, (start, dur, body) in enumerate(cues, 1):
        text += f"{k}\n{fmt(start)} --> {fmt(start + dur)}\n{body}\n\n"
    got = parse_srt(text)
    assert [(c["start_ms"], c["end_ms"]) for c in got] == [
        (s, s + d) for s, d, _ in cues]
    assert [c["text"] for c in got] == [b.strip() for _, _, b in cues]


# ------------------------------------------------------------------ #
# robots: the Column CASE and the pure-Python matcher share the spec;
# here the PYTHON side's decision laws are fuzzed directly (the
# Spark-vs-Python equivalence is pinned in test_functions.py).
# ------------------------------------------------------------------ #

_rpath = st.text(string.ascii_lowercase + "/.-", min_size=1, max_size=20).map(
    lambda p: "/" + p.lstrip("/"))


@given(paths=st.lists(_rpath, min_size=1, max_size=10), probe=_rpath)
@settings(max_examples=200, deadline=None)
def test_robots_longest_match_and_allow_tie_laws(paths, probe):
    from hobbes_spark.functions.web import robots_match

    # law 1: with no rules, everything is allowed
    assert robots_match([], probe) is True
    # law 2: a Disallow of an exact prefix blocks, and adding the SAME
    # pattern as Allow flips it (Allow wins ties)
    rules = [(False, probe)]
    assert robots_match(rules, probe) is False
    assert robots_match(rules + [(True, probe)], probe) is True
    # law 3: a longer Allow beats a shorter Disallow on its subtree
    rules = [(False, "/"), (True, probe)]
    assert robots_match(rules, probe) is True
    # law 4: order of the rule list never matters
    import random

    rules = [(k % 2 == 0, p) for k, p in enumerate(paths)]
    shuffled = rules[::-1]
    assert robots_match(rules, probe) == robots_match(shuffled, probe)
