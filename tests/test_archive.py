"""Tar/tgz archive ingestion (round 12): USTAR/PAX/GNU walk, codec
sniff reuse, and the per-member routing through the extraction
front-end."""

import gzip
import io
import tarfile

from hobbes_spark.functions.archive import (
    archive_documents,
    tar_members,
    untar_any,
)


def make_tar(members, fmt=tarfile.USTAR_FORMAT):
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=fmt) as t:
        for name, payload in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            ti.mtime = 0
            t.addfile(ti, io.BytesIO(payload))
    return bio.getvalue()


MEMBERS = {
    "src/a.py": b"print('hi')\n",
    "doc/readme.html": b"<html><body><p>Read me</p></body></html>",
    "bin/blob.dat": b"\x00\x01\x02\xfe",
}


class TestTarWalk:
    def test_plain_gzip_and_names(self):
        tar = make_tar(MEMBERS)
        assert [m[0] for m in tar_members(tar)] == list(MEMBERS)
        assert [m[0] for m in untar_any(gzip.compress(tar, mtime=0))] \
            == list(MEMBERS)

    def test_pax_and_gnu_long_names(self):
        deep = {"d/" + "x" * 120 + "/file.txt": b"deep"}
        for fmt in (tarfile.PAX_FORMAT, tarfile.GNU_FORMAT):
            got = untar_any(make_tar(deep, fmt))
            assert [m[0] for m in got] == list(deep)

    def test_truncated_keeps_head(self):
        tar = make_tar(MEMBERS)
        got = list(tar_members(tar[:700]))
        assert got and got[0][0] == "src/a.py"

    def test_oversized_member_survives_clipped(self, monkeypatch):
        """ADVICE r12: a fully-present member larger than the per-member
        cap must still APPEAR in the inventory (true size, clipped
        payload) instead of being silently skipped."""
        import hobbes_spark.functions.archive as A

        monkeypatch.setattr(A, "_MEMBER_CAP", 12)
        big = {"big.bin": b"0123456789abcdef", "after.txt": b"still here"}
        got = list(A.tar_members(make_tar(big)))
        assert [(n, p, s) for n, p, s in got] == [
            ("big.bin", b"0123456789ab", 16),
            ("after.txt", b"still here", 10),
        ]

    def test_archive_cap_distinct_from_member_cap(self, monkeypatch):
        """The whole-archive decompression cap is its own (larger)
        constant: clamping the member cap must not refuse inflation of
        the archive itself."""
        import gzip as _gz

        import hobbes_spark.functions.archive as A

        monkeypatch.setattr(A, "_MEMBER_CAP", 8)
        tar = make_tar(MEMBERS)
        got = A.untar_any(_gz.compress(tar, mtime=0))
        assert [m[0] for m in got] == list(MEMBERS)

    def test_refusals_and_never_raises(self):
        assert untar_any(b"not an archive at all, but long " * 20) is None
        tar = make_tar(MEMBERS)
        for off in range(0, len(tar), 97):
            for m in (0x00, 0xFF, tar[off] ^ 0x55):
                untar_any(tar[:off] + bytes([m]) + tar[off + 1:])
        for cut in range(0, len(tar), 131):
            list(tar_members(tar[:cut]))


class TestArchiveDocumentsDataFrame:
    def test_members_route_through_extractor(self, spark):
        tar = make_tar(MEMBERS)
        rows = [
            (1, bytearray(gzip.compress(tar, mtime=0))),
            (2, bytearray(tar)),
            (3, bytearray(b"not an archive")),
            (4, None),
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        got = [r.asDict() for r in archive_documents(media)
               .orderBy("media_id", "member_index").collect()]
        # both archive rows explode to 3 members; non-archives absent
        assert [(g["media_id"], g["member_index"], g["name"]) for g in got] \
            == [(1, 0, "src/a.py"), (1, 1, "doc/readme.html"),
                (1, 2, "bin/blob.dat"),
                (2, 0, "src/a.py"), (2, 1, "doc/readme.html"),
                (2, 2, "bin/blob.dat")]
        assert got[0]["kind"] == "text" and got[0]["text"] == "print('hi')\n"
        assert got[1]["kind"] == "html" and got[1]["text"] == "Read me"
        # undecodable member stays in the inventory with kind NULL
        assert got[2]["kind"] is None and got[2]["n_bytes"] == 4

    def test_plan_is_map_only(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"x"))], "media_id long, content binary")
        plan = archive_documents(media)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
