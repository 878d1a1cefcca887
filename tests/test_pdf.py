"""PDF text extraction (round 12): pure-Python object walk, filter
cascades, and BT/ET text operators over hand-assembled fixtures, plus
the Spark ``pdf_features`` boundary with the refusal posture."""

import zlib

from hobbes_spark.functions.pdf import (
    decode_stream,
    extract_text_ops,
    pdf_features,
    pdf_info,
    pdf_objects,
    pdf_page_count,
    pdf_text,
    pdf_version,
)


def _obj(num, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num, payload: bytes, extra: bytes = b"") -> bytes:
    return _obj(
        num,
        b"<< /Length %d %s>>\nstream\n" % (len(payload), extra)
        + payload
        + b"\nendstream",
    )


def make_pdf(content_streams, compress=False, title=None) -> bytes:
    """Minimal N-page PDF: one content stream per page, classic
    trailer, correct page tree.  Offsets are not xref-accurate — the
    parser walks objects directly, which is the point."""
    n = len(content_streams)
    kids = b" ".join(b"%d 0 R" % (3 + 2 * k) for k in range(n))
    out = [b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"]
    out.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    out.append(_obj(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n)))
    for k, cs in enumerate(content_streams):
        page, cont = 3 + 2 * k, 4 + 2 * k
        out.append(_obj(page, b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R "
                              b"/MediaBox [0 0 612 792] >>" % cont))
        if compress:
            out.append(_stream_obj(cont, zlib.compress(cs),
                                   b"/Filter /FlateDecode "))
        else:
            out.append(_stream_obj(cont, cs))
    info = b""
    if title is not None:
        out.append(_obj(90, b"<< /Title (%s) /Producer (hobbes-fixture) >>"
                        % title))
        info = b" /Info 90 0 R"
    out.append(b"trailer\n<< /Size 99 /Root 1 0 R%s >>\nstartxref\n0\n%%%%EOF\n"
               % info)
    return b"".join(out)


CS1 = (b"BT /F1 12 Tf 72 720 Td (Hello) Tj 0 -14 Td (World) Tj ET\n"
       b"BT 72 600 Td [(Sp) -50 (lit) -400 (words)] TJ ET")
CS2 = b"BT 72 720 Td (Page two: 50% \\(escaped\\) \\\\ \\110i) Tj ET"


class TestContentOps:
    def test_tj_lines_and_kerns(self):
        assert extract_text_ops(CS1) == "Hello\nWorld\nSplit words"

    def test_literal_escapes_and_octal(self):
        # \110 octal = 'H'; % inside a string is NOT a comment
        assert extract_text_ops(CS2) == "Page two: 50% (escaped) \\ Hi"

    def test_quote_ops_and_tstar(self):
        got = extract_text_ops(
            b"BT (a) Tj T* (b) ' 1 2 (c) \" ET")
        assert got == "a\nb\nc"

    def test_hex_and_utf16_strings(self):
        got = extract_text_ops(b"BT <48656c6c6f> Tj ET")
        assert got == "Hello"
        # UTF-16BE with BOM in a hex string
        got = extract_text_ops(b"BT <FEFF004800690021> Tj ET")
        assert got == "Hi!"
        # bare NUL-striped two-byte string (CID-ish) sniffs UTF-16BE
        got = extract_text_ops(b"BT <004f006b> Tj ET")
        assert got == "Ok"

    def test_show_outside_bt_ignored(self):
        assert extract_text_ops(b"(lost) Tj BT (kept) Tj ET") == "kept"

    def test_td_x_only_is_a_space(self):
        got = extract_text_ops(b"BT (a) Tj 10 0 Td (b) Tj ET")
        assert got == "a b"


class TestFilters:
    def test_flate_tolerates_truncation(self):
        z = zlib.compress(b"x" * 1000)
        assert decode_stream(z, "FlateDecode", None) == b"x" * 1000
        got = decode_stream(z[:-8], "FlateDecode", None)
        assert got is not None and got.startswith(b"xxx")

    def test_ascii_hex_and_85(self):
        assert decode_stream(b"48 65 6C 6C 6F>", "ASCIIHexDecode", None) == b"Hello"
        import base64

        enc = base64.a85encode(b"Hello world") + b"~>"
        assert decode_stream(enc, "ASCII85Decode", None) == b"Hello world"

    def test_runlength(self):
        # 2 literal bytes "ab", then 257-254=3 copies of "c", EOD
        assert decode_stream(b"\x01ab\xfec\x80", "RunLengthDecode", None) == b"abccc"

    def test_lzw_msb_early_change(self):
        # TIFF/PDF LZW of b"-----A---B" produced by a tiny reference
        # encoder: 256(clear) 45 258 258 65 259 66 257(EOD), 9-bit MSB
        import io

        def lzw_encode(data):
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
            out, acc, nbits = bytearray(), 0, 0

            def emit(code):
                nonlocal acc, nbits
                acc = (acc << width) | code
                nbits += width
                while nbits >= 8:
                    out.append((acc >> (nbits - 8)) & 0xFF)
                    nbits -= 8

            emit(256)
            w = b""
            for ch in data:
                wc = w + bytes([ch])
                if wc in table:
                    w = wc
                else:
                    emit(table[w])
                    table[wc] = nxt
                    nxt += 1
                    if nxt + 1 >= (1 << width) and width < 12:
                        width += 1
                    w = bytes([ch])
            if w:
                emit(table[w])
            emit(257)
            if nbits:
                out.append((acc << (8 - nbits)) & 0xFF)
            return bytes(out)

        payload = b"-----A---B-----A---B"
        assert decode_stream(lzw_encode(payload), "LZWDecode", None) == payload

    def test_cascade_hex_then_flate(self):
        z = zlib.compress(b"cascade")
        hx = z.hex().encode() + b">"
        got = decode_stream(hx, ["ASCIIHexDecode", "FlateDecode"], None)
        assert got == b"cascade"

    def test_image_codecs_refuse(self):
        assert decode_stream(b"\xff\xd8\xff", "DCTDecode", None) is None

    def test_png_predictor_up(self):
        # /Predictor 12 (PNG Up), 1 color, 8 bpc, 4 columns, 2 rows
        rows = b"\x02\x01\x02\x03\x04" + b"\x02\x01\x01\x01\x01"
        z = zlib.compress(rows)
        got = decode_stream(z, "FlateDecode",
                            {"Predictor": 12, "Columns": 4})
        assert got == b"\x01\x02\x03\x04\x02\x03\x04\x05"


class TestDocumentWalk:
    def test_version_pages_text_info(self):
        doc = make_pdf([CS1, CS2], title=b"Fixture Doc")
        assert pdf_version(doc) == "1.4"
        assert pdf_page_count(doc) == 2
        assert pdf_text(doc) == ("Hello\nWorld\nSplit words\n"
                                 "Page two: 50% (escaped) \\ Hi")
        info = pdf_info(doc)
        assert info == {"title": "Fixture Doc", "producer": "hobbes-fixture"}

    def test_flate_compressed_document(self):
        doc = make_pdf([CS1], compress=True)
        assert pdf_text(doc) == "Hello\nWorld\nSplit words"
        assert pdf_page_count(doc) == 1

    def test_page_census_fallback(self):
        # no /Pages root: count /Type /Page dicts directly
        doc = (b"%PDF-1.3\n"
               + _obj(1, b"<< /Type /Page /Contents 2 0 R >>")
               + _stream_obj(2, CS2))
        assert pdf_page_count(doc) == 1

    def test_objstm_page_count(self):
        inner = b"<< /Type /Page >> << /Type /Page >> << /Type /Page >>"
        header = b"5 0 6 18 7 36 "
        payload = header + inner
        doc = (b"%PDF-1.5\n"
               + _obj(3, b"<< /Type /ObjStm /N 3 /First %d /Length %d >>"
                      % (len(header), len(zlib.compress(payload))))
               .replace(b"endobj", b"")
               )
        # build the ObjStm with a stream body properly
        z = zlib.compress(payload)
        doc = (b"%PDF-1.5\n" + _obj(
            3,
            b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>"
            b"\nstream\n" % (len(header), len(z)) + z + b"\nendstream"))
        assert pdf_page_count(doc) == 3

    def test_out_of_order_objects_extract_in_page_order(self):
        """Objects stored out of document order (incremental-update
        layout): the page TREE decides extraction order, so page 1's
        text still comes first."""
        doc = (b"%PDF-1.4\n"
               + _stream_obj(6, CS2)                      # page 2 content FIRST
               + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
               + _obj(5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
               + _obj(2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>")
               + _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
               + _stream_obj(4, CS1))
        assert pdf_text(doc) == ("Hello\nWorld\nSplit words\n"
                                 "Page two: 50% (escaped) \\ Hi")

    def test_split_contents_array_concatenates_before_tokenizing(self):
        """A /Contents ARRAY split at a token boundary (the spec-valid
        split, ISO 32000 §7.8.2): the string operand lands in stream
        one, its Tj operator in stream two — extracting per-piece
        yields nothing; pieces must join BEFORE tokenizing."""
        doc = (b"%PDF-1.4\n"
               + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
               + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
               + _obj(3, b"<< /Type /Page /Parent 2 0 R "
                         b"/Contents [4 0 R 5 0 R] >>")
               + _stream_obj(4, b"BT (straddle)")
               + _stream_obj(5, b"Tj ET"))
        assert pdf_text(doc) == "straddle"

    def test_unreferenced_text_streams_still_extract(self):
        # a BT-bearing stream outside the page tree (Form XObject
        # shape) appends after the page-ordered text
        doc = (make_pdf([CS1])
               + _stream_obj(40, b"BT (xobject text) Tj ET"))
        got = pdf_text(doc)
        assert got.startswith("Hello") and got.endswith("xobject text")

    def test_truncated_keeps_head(self):
        doc = make_pdf([CS1, CS2])
        cut = doc[: doc.find(b"Page two") - 40]  # into page 2's object
        got = pdf_text(cut)
        assert got is not None and got.startswith("Hello")

    def test_refusals(self):
        assert pdf_text(b"not a pdf at all") is None
        assert pdf_text(b"%PDF-1.4\ngarbage with no objects") is None
        assert pdf_version(b"x" * 2048 + b"%PDF-1.4") is None  # header cap

    def test_never_raises_on_mutations(self):
        doc = make_pdf([CS1], compress=True, title=b"T")
        for off in range(0, len(doc), 11):
            for m in (0x00, 0xFF, doc[off] ^ 0x55):
                mut = doc[:off] + bytes([m]) + doc[off + 1:]
                pdf_text(mut)
                pdf_page_count(mut)
                pdf_info(mut)
        for cut in range(0, len(doc), 17):
            pdf_text(doc[:cut])


class TestPdfFeaturesDataFrame:
    def test_rows_and_refusals(self, spark):
        docs = [
            (1, bytearray(make_pdf([CS1, CS2], title=b"Doc One"))),
            (2, bytearray(make_pdf([CS2], compress=True))),
            (3, bytearray(b"plain text, not a pdf")),
            (4, bytearray(b"%PDF-1.6\nheader only, zero objects")),
            (5, None),
        ]
        media = spark.createDataFrame(docs, "media_id long, content binary")
        out = {r["media_id"]: r.asDict()
               for r in pdf_features(media).collect()}
        assert sorted(out) == [1, 2]  # refusal rows absent
        assert out[1]["n_pages"] == 2 and out[1]["title"] == "Doc One"
        assert out[1]["text"].startswith("Hello\nWorld")
        assert out[1]["n_chars"] == len(out[1]["text"])
        assert out[2]["pdf_version"] == "1.4"
        assert out[2]["text"] == "Page two: 50% (escaped) \\ Hi"
        assert out[2]["title"] is None

    def test_plan_is_map_only(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"x"))], "media_id long, content binary")
        plan = pdf_features(media)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestToUnicodeCMap:
    """r13: /ToUnicode CMap parsing + show-time decode (closes the r12
    identity-encoding caveat for subset-embedded CID fonts)."""

    CMAP = b"""
    1 begincodespacerange
    <0000> <FFFF>
    endcodespacerange
    2 beginbfchar
    <0001> <0048>
    <0003> <00480065006C006C006F>
    endbfchar
    2 beginbfrange
    <0010> <0015> <0061>
    <0100> <0102> <D835DFFE>
    endbfrange
    1 beginbfrange
    <0200> <0202> [<0058> <0059> <005A>]
    endbfrange
    """

    def test_bfchar_and_multichar_dst(self):
        from hobbes_spark.functions.pdf import parse_tounicode

        cm = parse_tounicode(self.CMAP)
        assert cm.decode(b"\x00\x01") == "H"
        assert cm.decode(b"\x00\x03") == "Hello"

    def test_bfrange_surrogate_boundary(self):
        from hobbes_spark.functions.pdf import parse_tounicode

        cm = parse_tounicode(self.CMAP)
        got = cm.decode(b"\x01\x00\x01\x01\x01\x02")
        # U+1D7FE, U+1D7FF, then the rollover ACROSS the low-surrogate
        # boundary to U+1D800 — codepoint arithmetic, not unit
        assert [ord(c) for c in got] == [0x1D7FE, 0x1D7FF, 0x1D800]

    def test_bfrange_array_form_and_ranges(self):
        from hobbes_spark.functions.pdf import parse_tounicode

        cm = parse_tounicode(self.CMAP)
        assert cm.decode(b"\x00\x10\x00\x15") == "af"
        assert cm.decode(b"\x02\x00\x02\x02") == "XZ"

    def test_corrupt_cmap_refuses(self):
        from hobbes_spark.functions.pdf import parse_tounicode

        assert parse_tounicode(b"not a cmap { ] <zz>") is None
        assert parse_tounicode(b"") is None
        # half-valid garbage: bfchar with malformed hex refuses cleanly
        assert parse_tounicode(
            b"beginbfchar <zz> <0041> endbfchar") is None

    def test_tf_switches_decode_at_show_time(self):
        from hobbes_spark.functions.pdf import (
            extract_text_ops,
            parse_tounicode,
        )

        fonts = {"F1": parse_tounicode(self.CMAP)}
        got = extract_text_ops(
            b"BT /F1 12 Tf <0001> Tj /F9 12 Tf ( simple) Tj ET", fonts)
        assert got == "H simple"

    def test_unmapped_codes(self):
        from hobbes_spark.functions.pdf import parse_tounicode

        cm = parse_tounicode(self.CMAP)
        # unmapped 2-byte code contributes nothing (glyph-index noise)
        assert cm.decode(b"\x99\x99\x00\x01") == "H"

    def test_objstm_stored_font_resolves(self):
        """r13: page tree, /Resources and the font dict inside a Flate
        /ObjStm (the 1.5+ compressed-xref layout) — the object-stream
        merge must let resolution reach the font so the CMap applies."""
        import zlib as _z

        from hobbes_spark.functions.pdf import pdf_page_count, pdf_text

        def objstm(num, pairs):
            offs, chunks, cur = [], [], 0
            for n, body in pairs:
                offs.append((n, cur))
                chunks.append(body + b" ")
                cur += len(body) + 1
            header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
            payload = header + b"".join(chunks)
            comp = _z.compress(payload)
            return _obj(num, b"<< /Type /ObjStm /N %d /First %d /Length %d "
                             b"/Filter /FlateDecode >>\nstream\n"
                             % (len(pairs), len(header), len(comp))
                             + comp + b"\nendstream")

        cmap = (b"1 begincodespacerange\n<0000> <FFFF>\n"
                b"endcodespacerange\n1 beginbfchar\n"
                b"<0003> <00480065006C006C006F>\nendbfchar\n")
        cm_comp = _z.compress(cmap)
        content = b"BT /F1 12 Tf <0003> Tj ET"
        doc = (b"%PDF-1.6\n"
               + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
               + objstm(5, [
                   (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
                   (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                       b"/Resources << /Font << /F1 10 0 R >> >> >>"),
                   (10, b"<< /Type /Font /Subtype /Type0 "
                        b"/ToUnicode 11 0 R >>"),
               ])
               + _obj(4, b"<< /Length %d >>\nstream\n" % len(content)
                      + content + b"\nendstream")
               + _obj(11, b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                      % len(cm_comp) + cm_comp + b"\nendstream")
               + b"trailer\n<< /Size 99 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
        assert pdf_text(doc) == "Hello"
        assert pdf_page_count(doc) == 1
        # a TOP-LEVEL redefinition outranks the ObjStm copy
        doc2 = doc + _obj(3, b"<< /Type /Page /Parent 2 0 R >>")
        assert pdf_text(doc2) is None or "Hello" not in (pdf_text(doc2) or "")
