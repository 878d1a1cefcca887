"""WARC record framing (round 11): ISO 28500 record walk, HTTP
response split, and the Spark ``warc_records`` boundary over all three
shard layouts a crawl lands in (per-record gzip members, zstd, plain).
"""

import gzip

from hobbes_spark.functions.warc import (
    parse_warc_records,
    split_http_response,
    warc_records,
)


def _rec(rtype, uri, block, ctype=None, version=b"1.0"):
    h = [b"WARC/" + version, b"WARC-Type: " + rtype.encode()]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    h.append(b"WARC-Date: 2026-01-15T08:30:00Z")
    if ctype:
        h.append(b"Content-Type: " + ctype.encode())
    h.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body, ct=b"text/html"):
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ct
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)


class TestParseWarcRecords:
    def test_multi_record_walk(self):
        shard = (_rec("warcinfo", None, b"software: t",
                      "application/warc-fields")
                 + _rec("response", "http://a/", _http(b"<p>x</p>"),
                        "application/http; msgtype=response")
                 + _rec("request", "http://a/", b"GET / HTTP/1.1",
                        "application/http; msgtype=request"))
        recs = parse_warc_records(shard)
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo", "response", "request"]
        assert recs[1]["headers"]["warc-target-uri"] == "http://a/"
        assert recs[0]["version"] == "1.0"
        # the block is EXACTLY Content-Length bytes, CRLFs excluded
        assert recs[0]["block"] == b"software: t"

    def test_warc_11_and_binary_block(self):
        # a WARC/1.1 record whose block is binary (contains \r\n\r\n —
        # the walk must use Content-Length, not delimiter scanning)
        block = b"\x00\x01\r\n\r\n\xff tail"
        recs = parse_warc_records(
            _rec("resource", "http://b/", block, version=b"1.1")
            + _rec("metadata", "http://b/", b"k: v"))
        assert len(recs) == 2 and recs[0]["block"] == block
        assert recs[0]["version"] == "1.1"

    def test_truncated_tail_keeps_head(self):
        shard = (_rec("metadata", "http://a/", b"one: 1")
                 + _rec("metadata", "http://a/", b"two: 2"))
        # cut into the second record's block
        recs = parse_warc_records(shard[:-10])
        assert len(recs) == 1 and recs[0]["block"] == b"one: 1"

    def test_never_raises_on_garbage(self):
        valid = _rec("response", "http://a/", _http(b"x"),
                     "application/http;msgtype=response")
        for cut in range(len(valid)):
            assert isinstance(parse_warc_records(valid[:cut]), list)
        for off in range(0, len(valid), 7):
            for m in (0x00, 0xFF, valid[off] ^ 0x55):
                mut = valid[:off] + bytes([m]) + valid[off + 1:]
                assert isinstance(parse_warc_records(mut), list)
        assert parse_warc_records(b"") == []
        assert parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n") == []

    def test_missing_or_bad_content_length_stops(self):
        no_len = (b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody\r\n\r\n")
        assert parse_warc_records(no_len) == []
        bad = (b"WARC/1.0\r\nWARC-Type: m\r\nContent-Length: ten\r\n\r\n")
        assert parse_warc_records(bad) == []

    def test_max_records_guard(self):
        one = _rec("metadata", None, b"")
        assert len(parse_warc_records(one * 10, max_records=3)) == 3

    def test_header_obs_fold_continuation(self):
        rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
               b"WARC-Target-URI: http://long.example/\r\n\tpath\r\n"
               b"Content-Length: 0\r\n\r\n\r\n\r\n")
        recs = parse_warc_records(rec)
        assert recs[0]["headers"]["warc-target-uri"] == (
            "http://long.example/ path")


class TestSplitHttpResponse:
    def test_response_split(self):
        st, hh, body = split_http_response(_http(b"<html>hi</html>"))
        assert st == 200 and hh["content-type"] == "text/html"
        assert body == b"<html>hi</html>"

    def test_non_http_block_passthrough(self):
        st, hh, body = split_http_response(b"GET / HTTP/1.1")
        assert st is None and hh == {} and body == b"GET / HTTP/1.1"

    def test_malformed_status_line(self):
        st, _, body = split_http_response(b"HTTP/1.1 OK\r\n\r\nx")
        assert st is None and body == b"HTTP/1.1 OK\r\n\r\nx"


class TestWetConversionRecords:
    def test_wet_layout(self, spark):
        """WET shards (the pre-extracted-text sibling of WARC) are
        ordinary WARC files whose records are ``WARC-Type: conversion``
        with ``text/plain`` blocks — the generic record walk must
        surface the text body unchanged, no HTTP split."""
        recs = (_rec("warcinfo", None, b"software: wet-extractor",
                     "application/warc-fields")
                + _rec("conversion", "http://a/page",
                       "extracted plain text café".encode(),
                       "text/plain"))
        media = spark.createDataFrame(
            [(1, bytearray(gzip.compress(recs, mtime=0)))],
            "media_id long, content binary")
        got = [r.asDict() for r in
               warc_records(media).orderBy("record_index").collect()]
        assert got[1]["warc_type"] == "conversion"
        assert got[1]["http_status"] is None
        assert got[1]["body"] == "extracted plain text café"
        assert got[1]["target_uri"] == "http://a/page"


class TestInflateHttpBody:
    """Content-Encoding chains + brotli (r13, ADVICE r12): codings are
    undone in reverse application order, identity tokens skip, brotli
    goes through the system libbrotlidec with refusal fallback."""

    RAW = "chain body café ".encode("utf-8") * 40

    def test_reverse_chain_and_identity(self):
        import zlib

        from hobbes_spark.functions.warc import _inflate_http_body

        gz = gzip.compress(zlib.compress(self.RAW), mtime=0)
        assert _inflate_http_body(gz, "deflate, gzip") == self.RAW
        plain_gz = gzip.compress(self.RAW, mtime=0)
        assert _inflate_http_body(plain_gz, "gzip, identity") == self.RAW
        assert _inflate_http_body(plain_gz, "identity, gzip") == self.RAW
        assert _inflate_http_body(plain_gz, "compress, gzip") is None

    def test_brotli_decode_and_refusal(self, monkeypatch):
        import hobbes_spark.functions.warc as W

        # fixed quality-11 brotli of b"hi br" (RFC 7932 byte literal)
        br = b"\x0b\x02\x80hi br\x03"
        if W._load_brotli() is not None:
            assert W._inflate_http_body(br, "br") == b"hi br"
            assert W._inflate_http_body(br[:3], "br") is None  # truncated
            assert W._inflate_http_body(b"\x0b\x01\x80junk", "br") is None
        # absent-library path: refusal to NULL, never an exception
        monkeypatch.setattr(W, "_BROTLI_LIB", None)
        assert W._inflate_http_body(br, "br") is None


class TestCharsetSniff:
    def test_whatwg_precedence(self):
        from hobbes_spark.functions.warc import sniff_charset

        # BOM beats header beats meta
        assert sniff_charset(b"\xef\xbb\xbfx", "text/html; charset=latin-1") \
            == "utf-8-sig"
        assert sniff_charset(b"\xff\xfeh\x00") == "utf-16-le"
        assert sniff_charset(b"\xfe\xffh") == "utf-16-be"
        assert sniff_charset(
            b"<meta charset='x'>", "text/html; charset=Shift_JIS"
        ) == "shift_jis"
        assert sniff_charset(
            b"<html><head><meta charset=\"ISO-8859-1\"></head>") == "iso-8859-1"
        assert sniff_charset(
            b"<META HTTP-EQUIV='Content-Type' "
            b"CONTENT='text/html; charset=windows-1252'>") == "windows-1252"
        assert sniff_charset(b"plain ascii") is None
        # the meta prescan window is 1024 bytes: a late meta is ignored
        assert sniff_charset(b" " * 1100 + b"<meta charset='utf-8'>") is None

    def test_decode_payload(self):
        from hobbes_spark.functions.warc import decode_payload

        assert decode_payload(
            "“Smart” café".encode("windows-1252"),
            "text/html; charset=windows-1252",
        ) == ("windows-1252", "“Smart” café")
        assert decode_payload(
            "日本".encode("shift_jis"), "text/html; charset=shift_jis"
        ) == ("shift_jis", "日本")
        # unknown codec name falls back to the default
        cs, text = decode_payload(b"x", "text/html; charset=notacodec")
        assert (cs, text) == ("utf-8", "x")
        # a BOM is framing, not content — stripped after decode
        cs, text = decode_payload("﻿hi".encode("utf-16-le"))
        assert cs == "utf-16-le" and text == "hi"
        # mojibake never raises
        cs, text = decode_payload(b"\xff\xfe\xfa garbage", None)
        assert isinstance(text, str)


class TestWarcRecordsDataFrame:
    def test_three_layouts_and_refusals(self, spark):
        html = b"<html><body><p>Page</p></body></html>"
        resp = _rec("response", "http://a/", _http(html),
                    "application/http; msgtype=response")
        meta = _rec("metadata", "http://a/", b"k: v",
                    "application/warc-fields")
        gz = b"".join(gzip.compress(r, mtime=0) for r in (resp, meta))
        rows = [
            (1, bytearray(gz)),                       # CC layout
            (2, bytearray(resp + meta)),              # plain
            (3, bytearray(b"neither warc nor codec")),  # dropped
            (4, bytearray(gzip.compress(resp, mtime=0)[:-4])),  # truncated
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        got = warc_records(media).orderBy("media_id", "record_index")
        out = [r.asDict() for r in got.collect()]
        assert [(r["media_id"], r["record_index"], r["codec"],
                 r["warc_type"]) for r in out] == [
            (1, 0, "gzip", "response"), (1, 1, "gzip", "metadata"),
            (2, 0, "none", "response"), (2, 1, "none", "metadata"),
        ]
        assert out[0]["http_status"] == 200
        assert out[0]["body"] == html.decode()
        assert out[1]["http_status"] is None  # typed NULL across Arrow
        assert out[0]["target_uri"] == "http://a/"

    def test_binary_payloads_null_body(self, spark):
        """Declared-binary payloads surface a NULL body, not
        replacement-character noise (r11 advisor): an image/png HTTP
        response and an application/pdf resource record both read
        body=NULL with content_length intact; text-like and
        UNDECLARED content types still decode."""
        png = b"\x89PNG\r\n\x1a\n" + bytes(range(32))
        rows = [
            (1, bytearray(
                _rec("response", "http://a/i.png", _http(png, b"image/png"),
                     "application/http; msgtype=response")
                + _rec("resource", "http://a/d.pdf", b"%PDF-1.4\x00\xff",
                       "application/pdf")
                + _rec("response", "http://a/p", _http(b"<p>hi</p>"),
                       "application/http; msgtype=response")
                # no HTTP Content-Type header: benefit of the doubt
                + _rec("response", "http://a/naked",
                       b"HTTP/1.1 200 OK\r\n\r\nplain text",
                       "application/http; msgtype=response"))),
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        out = [r.asDict() for r in
               warc_records(media).orderBy("record_index").collect()]
        assert [r["body"] for r in out] == [
            None, None, "<p>hi</p>", "plain text"]
        assert out[0]["http_status"] == 200
        assert out[0]["content_length"] == len(_http(png, b"image/png"))
        assert out[1]["content_length"] == len(b"%PDF-1.4\x00\xff")

    def test_content_encoding_inflates_before_decode(self, spark):
        """Served-compressed bodies (Content-Encoding: gzip/deflate)
        inflate before the charset ladder; unsupported codings (br)
        NULL the body instead of decoding binary noise."""
        import zlib

        html = "<p>café body</p>".encode("utf-8")

        def http(extra, payload):
            return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                    b"charset=utf-8\r\n" + extra + b"\r\n" + payload)

        shard = b"".join([
            _rec("response", "http://a/gz",
                 http(b"Content-Encoding: gzip\r\n",
                      gzip.compress(html, mtime=0)),
                 "application/http; msgtype=response"),
            _rec("response", "http://a/fl",
                 http(b"Content-Encoding: deflate\r\n",
                      zlib.compress(html)),
                 "application/http; msgtype=response"),
            _rec("response", "http://a/raw",
                 http(b"Content-Encoding: deflate\r\n",
                      zlib.compress(html)[2:-4]),  # raw-deflate spelling
                 "application/http; msgtype=response"),
            _rec("response", "http://a/br",
                 http(b"Content-Encoding: br\r\n", b"\x0b\x01\x80junk"),
                 "application/http; msgtype=response"),
            _rec("response", "http://a/plain", http(b"", html),
                 "application/http; msgtype=response"),
        ])
        media = spark.createDataFrame(
            [(1, bytearray(shard))], "media_id long, content binary")
        got = {r["target_uri"]: r["body"]
               for r in warc_records(media).collect()}
        want = "<p>café body</p>"
        assert got["http://a/gz"] == want
        assert got["http://a/fl"] == want
        assert got["http://a/raw"] == want
        assert got["http://a/br"] is None  # unsupported: refuse, no noise
        assert got["http://a/plain"] == want

    def test_chunked_transfer_encoding_deframes(self, spark):
        """Raw captures keep HTTP/1.1 chunked framing: hex size lines
        strip, chunk bytes concatenate, extensions ignored; a chunked
        header with an ALREADY-deframed body falls back unharmed."""
        import zlib

        payload = (b"7\r\n<p>chun\r\n"
                   b"B;ext=1\r\nked body</p\r\n"
                   b"1\r\n>\r\n"
                   b"0\r\n\r\n")

        def http(extra, body):
            return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + extra + b"\r\n" + body)

        shard = b"".join([
            _rec("response", "http://a/chunk",
                 http(b"Transfer-Encoding: chunked\r\n", payload),
                 "application/http; msgtype=response"),
            # chunked + gzip: de-frame, THEN inflate
            _rec("response", "http://a/both",
                 http(b"Transfer-Encoding: chunked\r\n"
                      b"Content-Encoding: gzip\r\n",
                      b"%x\r\n" % len(gzip.compress(b"<p>deep</p>", mtime=0))
                      + gzip.compress(b"<p>deep</p>", mtime=0)
                      + b"\r\n0\r\n\r\n"),
                 "application/http; msgtype=response"),
            # header present but body already plain: fall back verbatim
            _rec("response", "http://a/lies",
                 http(b"Transfer-Encoding: chunked\r\n", b"<p>plain</p>"),
                 "application/http; msgtype=response"),
        ])
        media = spark.createDataFrame(
            [(1, bytearray(shard))], "media_id long, content binary")
        got = {r["target_uri"]: r["body"]
               for r in warc_records(media).collect()}
        assert got["http://a/chunk"] == "<p>chunked body</p>"
        assert got["http://a/both"] == "<p>deep</p>"
        assert got["http://a/lies"] == "<p>plain</p>"
        del zlib

    def test_revisit_headers_and_edges(self, spark):
        """WARC revisit linkage (r12): the walk surfaces
        WARC-Record-ID / WARC-Refers-To[-Target-URI] / payload digest,
        and revisit_edges turns them into dedup edges — resolved by
        record-ID join, URI fallback for cross-segment refs, NULL for
        digest-only revisits — without touching any text column."""
        from hobbes_spark.functions.warc import revisit_edges

        def rec(rtype, uri, block, extra):
            h = [b"WARC/1.0", b"WARC-Type: " + rtype.encode(),
                 b"WARC-Target-URI: " + uri.encode(),
                 b"WARC-Date: 2026-02-01T10:00:00Z"]
            for k, v in extra.items():
                h.append(k.encode() + b": " + v.encode())
            h.append(b"Content-Length: " + str(len(block)).encode())
            return b"\r\n".join(h) + b"\r\n\r\n" + block + b"\r\n\r\n"

        shard = b"".join([
            rec("response", "http://a/1", _http(b"<p>x</p>"), {
                "WARC-Record-ID": "<urn:uuid:one>",
                "Content-Type": "application/http; msgtype=response"}),
            rec("revisit", "http://m/1", b"", {
                "WARC-Refers-To": "<urn:uuid:one>",
                "WARC-Refers-To-Target-URI": "http://a/1",
                "WARC-Payload-Digest": "sha1:AAA"}),
            rec("revisit", "http://m/2", b"", {
                "WARC-Refers-To": "<urn:uuid:absent>",
                "WARC-Refers-To-Target-URI": "http://elsewhere/2"}),
            rec("revisit", "http://m/3", b"", {
                "WARC-Payload-Digest": "sha1:BBB"}),
        ])
        media = spark.createDataFrame(
            [(7, bytearray(shard))], "media_id long, content binary")
        recs = warc_records(media)
        hdr = recs.filter(recs.warc_type == "response").first()
        assert hdr["warc_record_id"] == "<urn:uuid:one>"
        got = [r.asDict() for r in
               revisit_edges(recs).orderBy("record_index").collect()]
        assert [(g["dup_uri"], g["orig_uri"], g["resolved"]) for g in got] == [
            ("http://m/1", "http://a/1", True),
            ("http://m/2", "http://elsewhere/2", False),
            ("http://m/3", None, False),
        ]
        assert got[2]["warc_payload_digest"] == "sha1:BBB"

    def test_plan_is_map_only(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"x"))], "media_id long, content binary")
        plan = warc_records(media)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # zero shuffle: pure mapInPandas


class TestCdxIndexAndFetch:
    """r13: CDX(J) capture index + selective fetch."""

    @staticmethod
    def _rec(uri, body, status=b"200 OK"):
        http = (b"HTTP/1.1 " + status +
                b"\r\nContent-Type: text/html\r\n\r\n" + body)
        return (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
                + uri + b"\r\nWARC-Date: 2024-03-05T12:30:45Z\r\n"
                b"Content-Type: application/http; msgtype=response\r\n"
                b"Content-Length: %d\r\n\r\n" % len(http)
                + http + b"\r\n\r\n")

    def test_gzip_member_spans(self):
        from hobbes_spark.functions.warc import gzip_member_spans

        r1, r2 = self._rec(b"http://a/1", b"x"), self._rec(b"http://a/2", b"yy")
        g1, g2 = gzip.compress(r1, mtime=0), gzip.compress(r2, mtime=0)
        spans = gzip_member_spans(g1 + g2)
        assert spans == [(0, len(g1)), (len(g1), len(g2))]
        assert gzip_member_spans(b"not gzip") is None
        # truncated second member keeps the first (keep-your-head)
        assert gzip_member_spans(g1 + g2[:10]) == [(0, len(g1))]

    def test_surt_key(self, spark):
        from hobbes_spark.functions.web import surt_key

        cases = [
            ("https://News.Example.com:443/A/b?q=1",
             "com,example,news)/a/b?q=1"),
            ("http://other.example:8080/Page", "example,other)/page"),
            ("https://site.example/x#frag", "example,site)/x"),
            ("https://host.example", "example,host)/"),
            ("not a url", None),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
        got = [r["s"] for r in df.select(surt_key("u").alias("s")).collect()]
        assert got == [w for _, w in cases]

    def test_selective_fetch_touches_only_matches(self, spark):
        from hobbes_spark.functions.warc import cdx_fetch, cdx_index
        from pyspark.sql import functions as F

        # a CORRUPT record between two good ones: selective fetch of the
        # good records must succeed without ever parsing the bad bytes
        r1 = self._rec(b"https://keep.example/a", b"<p>a</p>")
        bad = b"WARC/1.0\r\nbroken header no colon\r\n\r\n"
        r3 = self._rec(b"https://keep.example/b", b"<p>b</p>")
        shard_gz = b"".join(gzip.compress(r, mtime=0) for r in (r1, bad, r3))
        media = spark.createDataFrame(
            [(7, bytearray(shard_gz))], "media_id long, content binary")
        idx = cdx_index(media)
        # the corrupt member indexes no record; the good two do
        assert idx.count() == 2
        sel = idx.filter(F.col("surt").startswith("example,keep)")) \
                 .select("media_id", "record_index", "offset", "length",
                         "addressing")
        got = {r["target_uri"]: r["body"]
               for r in cdx_fetch(media, sel).collect()}
        assert got == {"https://keep.example/a": "<p>a</p>",
                       "https://keep.example/b": "<p>b</p>"}

    def test_no_match_shards_never_ship(self, spark):
        from hobbes_spark.functions.warc import cdx_fetch

        media = spark.createDataFrame(
            [(1, bytearray(self._rec(b"http://x/1", b"z")))],
            "media_id long, content binary")
        empty = spark.createDataFrame(
            [], "media_id long, record_index int, offset long, "
                "length long, addressing string")
        assert cdx_fetch(media, empty).count() == 0


class TestCdxjLines:
    """r13: CDXJ interchange — sorted text lines out, typed rows back."""

    def test_roundtrip_and_sort(self, spark):
        from hobbes_spark.functions.warc import (
            cdx_index, cdx_to_cdxj, cdxj_records,
        )

        r1 = TestCdxIndexAndFetch._rec(b"https://b.example/z", b"<p>z</p>")
        r2 = TestCdxIndexAndFetch._rec(b"https://a.example/y", b"<p>y</p>")
        media = spark.createDataFrame(
            [(3, bytearray(r1 + r2))], "media_id long, content binary")
        idx = cdx_index(media)
        lines = [r["line"] for r in cdx_to_cdxj(idx).collect()]
        # sorted by SURT key, not capture order
        assert lines[0].startswith("example,a)/y 20240305123045 {")
        assert lines[1].startswith("example,b)/z 20240305123045 {")
        back = cdxj_records(
            spark.createDataFrame([(l,) for l in lines], "line string")
        ).collect()
        by_surt = {r["surt"]: r for r in back}
        a = by_surt["example,a)/y"]
        assert a["url"] == "https://a.example/y" and a["status"] == 200
        assert a["media_id"] == 3 and a["mime"] == "text/html"
        orig = {r["surt"]: r for r in idx.collect()}
        assert (a["offset"], a["length"]) == (
            orig["example,a)/y"]["offset"], orig["example,a)/y"]["length"])


class TestCdxMerge:
    def test_collapse_and_versions(self, spark):
        from hobbes_spark.functions.warc import cdx_merge

        cols = ("media_id long, record_index int, surt string, ts string, "
                "url string, status int, mime string, digest string, "
                "offset long, length long, addressing string")
        a = spark.createDataFrame([
            (1, 0, "com,x)/p", "20240101000000", "http://x/p", 200,
             "text/html", "md5:aaa", 0, 10, "raw"),
        ], cols)
        b = spark.createDataFrame([
            # unchanged re-capture: same (surt, digest), later ts
            (2, 0, "com,x)/p", "20240201000000", "http://x/p", 200,
             "text/html", "md5:aaa", 0, 10, "raw"),
            # changed page: new digest
            (2, 1, "com,x)/p", "20240201000000", "http://x/p", 200,
             "text/html", "md5:bbb", 10, 12, "raw"),
        ], cols)
        got = sorted((r["digest"], r["media_id"], r["ts"])
                     for r in cdx_merge(a, b).collect())
        assert got == [("md5:aaa", 1, "20240101000000"),
                       ("md5:bbb", 2, "20240201000000")]
        latest = sorted((r["digest"], r["media_id"])
                        for r in cdx_merge(a, b, keep="latest").collect())
        assert latest == [("md5:aaa", 2), ("md5:bbb", 2)]
        import pytest as _p

        with _p.raises(ValueError):
            cdx_merge(a, b, keep="newest")


class TestZstdFrameSpans:
    def test_multi_frame_walk_and_skippable(self):
        from hobbes_spark.functions.warc import zstd_frame_spans
        from tests.test_functions import _zstd_store_frame

        f1 = _zstd_store_frame(b"frame one payload " * 4)
        f2 = _zstd_store_frame(b"frame two " * 9)
        assert zstd_frame_spans(f1 + f2) == [(0, len(f1)),
                                             (len(f1), len(f2))]
        skip = (b"\x50\x2a\x4d\x18" + (4).to_bytes(4, "little") + b"dict")
        assert zstd_frame_spans(skip + f1) == [(len(skip), len(f1))]
        fc = _zstd_store_frame(b"with checksum", checksum=True)
        assert zstd_frame_spans(fc) == [(0, len(fc))]

    def test_refusals(self):
        from hobbes_spark.functions.warc import zstd_frame_spans
        from tests.test_functions import _zstd_store_frame

        assert zstd_frame_spans(b"not zstd at all") is None
        f1 = _zstd_store_frame(b"truncated tail keeps head " * 3)
        # truncated second frame: keep the first span
        assert zstd_frame_spans(f1 + f1[: len(f1) // 2]) == [(0, len(f1))]
        # dictionary-id frames refuse per-frame addressing outright
        dict_frame = bytearray(f1)
        dict_frame[4] |= 0x01  # did_field_size = 1
        dict_frame.insert(5, 0x07)  # dictionary id byte
        assert zstd_frame_spans(bytes(dict_frame)) is None
