"""Office Open XML extraction (round 12): pure-Python ZIP walk
(central directory + truncated-tail local-header fallback) and the
docx/pptx/xlsx prose parts, plus the Spark boundary with refusals."""

import io
import zipfile

from hobbes_spark.functions.office import (
    docx_paragraphs,
    office_features,
    office_text,
    zip_entries,
)

DOC_XML = (
    '<?xml version="1.0"?><w:document><w:body>'
    '<w:p><w:r><w:t>Hello docx</w:t></w:r>'
    '<w:r><w:t xml:space="preserve"> world &amp; more</w:t></w:r></w:p>'
    '<w:p><w:r><w:t>Second</w:t></w:r><w:tab/><w:r><w:t>col</w:t></w:r></w:p>'
    '<w:p><w:r><w:t>a</w:t></w:r><w:br/><w:r><w:t>b &#x263A;</w:t></w:r></w:p>'
    "<w:p/></w:body></w:document>"
)
SLIDE = ('<p:sld><p:txBody><a:p><a:r><a:t>{}</a:t></a:r></a:p>'
         "</p:txBody></p:sld>")
SST = ('<sst><si><t>cell one</t></si>'
       '<si><t xml:space="preserve">two &lt;3</t></si></sst>')

DOCX_TEXT = "Hello docx world & more\nSecond\tcol\na\nb ☺"


def make_zip(members, stored=False):
    bio = io.BytesIO()
    comp = zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
    with zipfile.ZipFile(bio, "w", comp) as z:
        for name, payload in members.items():
            zi = zipfile.ZipInfo(name, date_time=(2026, 1, 1, 0, 0, 0))
            z.writestr(zi, payload, compress_type=comp)
    return bio.getvalue()


def _docx():
    return make_zip({"[Content_Types].xml": "<Types/>",
                     "word/document.xml": DOC_XML})


class TestZipWalk:
    def test_central_directory_and_stored(self):
        z = make_zip({"a.txt": "alpha", "b/c.txt": "beta"}, stored=True)
        got = zip_entries(z)
        assert got == {"a.txt": b"alpha", "b/c.txt": b"beta"}

    def test_truncated_tail_falls_back_to_local_walk(self):
        z = _docx()
        cut = z[: z.find(b"PK\x01\x02")]  # central directory gone
        got = zip_entries(cut)
        assert "word/document.xml" in got

    def test_prefixed_archive_offsets_reanchor(self):
        """A self-extracting-style prefix shifts every stored offset;
        the walk re-anchors on the central-directory signature and
        applies the shift to local headers."""
        z = _docx()
        prefixed = b"#!/bin/sh\necho self-extracting stub\n" + z
        got = zip_entries(prefixed)
        assert "word/document.xml" in got
        assert office_text(prefixed)[0] == "docx"

    def test_never_raises_on_garbage(self):
        z = _docx()
        for off in range(0, len(z), 13):
            for m in (0x00, 0xFF, z[off] ^ 0x55):
                zip_entries(z[:off] + bytes([m]) + z[off + 1:])
                office_text(z[:off] + bytes([m]) + z[off + 1:])
        for c in range(0, len(z), 17):
            office_text(z[:c])
        assert zip_entries(b"") == {}


class TestProseParts:
    def test_docx_paragraph_semantics(self):
        paras = docx_paragraphs(DOC_XML)
        assert paras == ["Hello docx world & more", "Second\tcol",
                         "a\nb ☺", ""]
        assert office_text(_docx()) == ("docx", DOCX_TEXT, 2)

    def test_pptx_slide_number_order(self):
        # slide10 after slide2 (numeric, not lexicographic)
        z = make_zip({
            "ppt/slides/slide10.xml": SLIDE.format("ten"),
            "ppt/slides/slide2.xml": SLIDE.format("two"),
        })
        kind, text, _ = office_text(z)
        assert (kind, text) == ("pptx", "two\n\nten")

    def test_xlsx_shared_strings(self):
        z = make_zip({"xl/sharedStrings.xml": SST, "xl/workbook.xml": "<wb/>"})
        assert office_text(z) == ("xlsx", "cell one\ntwo <3", 2)

    def test_refusals(self):
        assert office_text(b"plain text") == (None, None, 0)
        z = make_zip({"data.bin": "no prose part"})
        assert office_text(z) == (None, None, 1)

    def test_epub_spine_order(self):
        """EPUB reading order comes from the OPF spine, not member
        names: chapter b.xhtml is spine-FIRST despite sorting last."""
        container = ('<?xml version="1.0"?><container><rootfiles>'
                     '<rootfile full-path="OEBPS/content.opf" '
                     'media-type="application/oebps-package+xml"/>'
                     "</rootfiles></container>")
        opf = ('<package><manifest>'
               '<item id="c1" href="b.xhtml" media-type="application/xhtml+xml"/>'
               '<item id="c2" href="a.xhtml" media-type="application/xhtml+xml"/>'
               '</manifest><spine>'
               '<itemref idref="c1"/><itemref idref="c2"/>'
               "</spine></package>")
        z = make_zip({
            "mimetype": "application/epub+zip",
            "META-INF/container.xml": container,
            "OEBPS/content.opf": opf,
            "OEBPS/a.xhtml": "<html><body><p>second chapter</p></body></html>",
            "OEBPS/b.xhtml": "<html><body><p>first chapter</p></body></html>",
        })
        kind, text, n = office_text(z)
        assert kind == "epub" and n == 5
        assert text == "first chapter\n\nsecond chapter"

    def test_epub_broken_opf_falls_back_to_name_order(self):
        z = make_zip({
            "META-INF/container.xml": "<container>broken, no rootfile",
            "x/2.xhtml": "<p>two</p>",
            "x/1.xhtml": "<p>one</p>",
        })
        assert office_text(z) == ("epub", "one\n\ntwo", 3)


class TestOfficeFeaturesDataFrame:
    def test_rows_and_refusals(self, spark):
        rows = [
            (1, bytearray(_docx())),
            (2, bytearray(make_zip(
                {"ppt/slides/slide1.xml": SLIDE.format("deck")}))),
            (3, bytearray(b"not a zip")),
            (4, bytearray(make_zip({"x.bin": "opaque"}))),
            (5, None),
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        got = {r["media_id"]: r.asDict()
               for r in office_features(media).collect()}
        assert sorted(got) == [1, 2]
        assert got[1]["kind"] == "docx" and got[1]["text"] == DOCX_TEXT
        assert got[1]["n_chars"] == len(DOCX_TEXT)
        assert got[2]["kind"] == "pptx" and got[2]["text"] == "deck"

    def test_plan_is_map_only(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"x"))], "media_id long, content binary")
        plan = office_features(media)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
