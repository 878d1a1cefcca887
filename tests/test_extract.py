"""Unified extraction front-end (round 12): magic-byte routing,
per-format decode composition, and the Python/JVM HTML_RULES twin."""

import io
import zipfile

from pyspark.sql import functions as F

from hobbes_spark.functions.extract import (
    extract_any,
    extract_text_any,
    html_to_text_py,
    sniff_kind,
)


def _zip(members):
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        for n, p in members.items():
            z.writestr(zipfile.ZipInfo(n, date_time=(2026, 1, 1, 0, 0, 0)),
                       p, compress_type=zipfile.ZIP_DEFLATED)
    return bio.getvalue()


class TestSniff:
    def test_magic_routing(self):
        cases = {
            b"%PDF-1.4\nrest": "pdf",
            b"PK\x03\x04zipzip": "zip",
            b"WARC/1.0\r\n": "warc",
            b"\x89PNG\r\n\x1a\n": "image",
            b"\xff\xd8\xff\xe0jpeg": "image",
            b"GIF89a": "image",
            b"BMxxxx": "image",
            b"RIFF0000WEBPVP8 ": "image",
            b"RIFF0000WAVEfmt ": "audio",
            b"ID3\x04tag": "audio",
            b"fLaCdata": "audio",
            b"\x00\x00\x00\x18ftypisom": "video",
            b"\x00\x00\x00\x18ftypavif": "image",
            b"\x00\x00\x00\x18ftypM4A fox": "audio",
            b"<!DOCTYPE html><p>x</p>": "html",
            b"  <html lang='en'>x</html>": "html",
            b"no magic here": None,
        }
        for payload, want in cases.items():
            assert sniff_kind(payload) == want, payload

    def test_text_vs_binary_gate(self):
        assert extract_any(b"hello unicode caf\xc3\xa9")[0] == "text"
        assert extract_any(b"\x00embedded nul") == (None, None)
        assert extract_any(b"\xfe\xff\x00b\x00a\x00d") == (None, None)

    def test_pdf_sniff_anchored_to_start(self):
        """ADVICE r12: a document that merely MENTIONS '%PDF-1.4' is
        not a PDF — the magic must sit at payload start (leading pad
        bytes allowed)."""
        html = b"<html><body>see the %PDF-1.4 spec</body></html>"
        assert sniff_kind(html) == "html"
        kind, text = extract_any(html)
        assert kind == "html" and "spec" in text
        assert sniff_kind(b"  \r\n%PDF-1.7 stuff") == "pdf"

    def test_pdf_header_without_objects_falls_through(self):
        """A %PDF- header whose object walk finds nothing is treated as
        the no-magic case: decodable text survives as kind 'text',
        binary still refuses."""
        kind, text = extract_any(b"%PDF-1.4 but actually a plain note")
        assert kind == "text" and "plain note" in text
        assert extract_any(b"%PDF-1.4\x00\xff\xfebinary junk") == (None, None)


class TestHtmlTwin:
    def test_python_replay_equals_column(self, spark):
        """html_to_text_py and the Column html_to_text are two engines
        of the one HTML_RULES table — byte-equal on markup exercising
        every rule class (the DuckDB third engine is pinned by the
        extract_any_stats oracle)."""
        from hobbes_spark.functions.web import html_to_text

        pages = [
            ('<html><head><script>if(1<2){x("&")}</script>'
             "<style>p{color:red}</style><!-- gone --></head>"
             "<body><h1>Head</h1><p>One &amp; two</p>"
             "<ul><li>a</li><li>b</li></ul>"
             "<span>inline &nbsp; &#8212; &lt;tag&gt;</span></body></html>"),
            "<p>bare</p>",
            "no markup at all",
            "   \n\t  ",
        ]
        df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)],
                                   "id long, raw string")
        jvm = {r["id"]: r["t"] for r in
               df.select("id", html_to_text("raw").alias("t")).collect()}
        for i, p in enumerate(pages):
            assert html_to_text_py(p) == jvm[i], i


class TestExtractAnyDataFrame:
    def test_routing_and_refusals(self, spark):
        html = b"<html><body><p>Para</p></body></html>"
        rows = [
            (1, bytearray(html)),
            (2, bytearray(b"plain text")),
            (3, bytearray(_zip({"word/document.xml":
                                "<w:p><w:t>doc text</w:t></w:p>"}))),
            (4, bytearray(_zip({"opaque.bin": "x"}))),
            (5, bytearray(b"\x89PNG\r\n\x1a\n123")),
            (6, bytearray(b"\x01\x02\xfe\xff")),
            (7, None),
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        got = {r["media_id"]: r.asDict()
               for r in extract_text_any(media).collect()}
        assert sorted(got) == [1, 2, 3, 4, 5]
        assert got[1]["kind"] == "html" and got[1]["text"] == "Para"
        assert got[2] == {"media_id": 2, "kind": "text", "n_bytes": 10,
                          "n_chars": 10, "text": "plain text"}
        assert got[3]["kind"] == "docx" and got[3]["text"] == "doc text"
        assert got[4]["kind"] == "zip" and got[4]["text"] is None
        assert got[5]["kind"] == "image" and got[5]["n_chars"] is None

    def test_feeds_the_text_stack(self, spark):
        """The router's output drops straight into the curation stack:
        token counts over extracted text, NULL-safe for media kinds."""
        from hobbes_spark.functions.text import tokens

        media = spark.createDataFrame(
            [(1, bytearray(b"<p>three token text</p>")),
             (2, bytearray(b"\x89PNG\r\n\x1a\n"))],
            "media_id long, content binary")
        out = extract_text_any(media).select(
            "media_id", F.size(tokens(F.col("text"))).alias("n_toks"))
        got = {r["media_id"]: r["n_toks"] for r in out.collect()}
        assert got == {1: 3, 2: 0}

    def test_plan_is_map_only(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"x"))], "media_id long, content binary")
        plan = extract_text_any(media)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestRtf:
    def test_prose_extraction(self):
        from hobbes_spark.functions.extract import extract_any, rtf_to_text

        emdash = b"\\" + b"u8212"  # keep the source ASCII-only
        rtf = (rb"{\rtf1\ansi\deff0{\fonttbl{\f0 Times New Roman;}}"
               rb"{\info{\title Secret}}"
               rb"{\*\generator Riched20}"
               rb"\uc1 First paragraph with \'e9 accent and "
               + emdash + rb"?dash.\par Second\tab column\line third\par}")
        got = rtf_to_text(rtf)
        assert got == ("First paragraph with é accent and "
                       "—dash.\nSecond\tcolumn\nthird")
        # data destinations drop: no font names, no \info title
        assert "Times" not in got and "Secret" not in got
        assert extract_any(rtf)[0] == "rtf"

    def test_escapes_and_signed_unicode(self):
        from hobbes_spark.functions.extract import rtf_to_text

        assert rtf_to_text(rb"{\rtf1 braces \{x\} and back\\slash\par}") \
            == "braces {x} and back\\slash"
        # \uN is a SIGNED 16-bit value: -3841 -> U+F0FF; the \uc1
        # fallback '?' after it is skipped
        got = rtf_to_text(rb"{\rtf1\uc1 neg \u-3841" + b"?ok}")
        assert got == "neg ok"

    def test_never_raises_on_garbage(self):
        from hobbes_spark.functions.extract import rtf_to_text

        rtf = rb"{\rtf1{\fonttbl{\f0 F;}}body \'e9 \par text}"
        for off in range(len(rtf)):
            for m in (0x00, 0x7B, 0x7D, 0x5C, rtf[off] ^ 0x55):
                rtf_to_text(rtf[:off] + bytes([m]) + rtf[off + 1:])
        for cut in range(len(rtf)):
            rtf_to_text(rtf[:cut])
