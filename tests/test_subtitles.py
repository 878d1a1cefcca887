"""WebVTT/SRT caption parsing (round 11): timestamp math, tag
stripping, block skipping, format sniffing, and the Spark boundary."""

from hobbes_spark.functions.subtitles import (
    _ts_ms,
    parse_srt,
    parse_subtitles,
    parse_webvtt,
    subtitle_cues,
)


class TestTimestamps:
    def test_exact_millisecond_math(self):
        assert _ts_ms("00:00:01,000") == 1000
        assert _ts_ms("00:00:01.000") == 1000
        assert _ts_ms("01:02:03.004") == 3723004
        assert _ts_ms("02:03.004") == 123004      # hour-less (VTT)
        assert _ts_ms("00:02,5") == 2500          # MM:SS; ",5" = 500 ms
        assert _ts_ms("10:00:00.000") == 10 * 3600 * 1000  # 10 h

    def test_invalid_fields(self):
        assert _ts_ms("00:99:01.000") is None  # minutes >= 60
        assert _ts_ms("00:00:75.000") is None  # seconds >= 60
        assert _ts_ms("nonsense") is None
        assert _ts_ms("") is None


class TestSrt:
    def test_multiline_and_tagged_cues(self):
        srt = ("1\n00:00:01,000 --> 00:00:03,500\nHello.\n\n"
               "2\n00:00:04,000 --> 00:00:06,250\nTwo\nlines\n\n"
               "3\n00:01:00,000 --> 00:01:02,000\n<i>Tagged</i> text\n")
        cues = parse_srt(srt)
        assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
            (1000, 3500), (4000, 6250), (60000, 62000)]
        assert cues[1]["text"] == "Two\nlines"
        assert cues[2]["text"] == "Tagged text"

    def test_corrupt_blocks_skipped_not_fatal(self):
        srt = ("garbage without arrow\n\n"
               "1\n00:00:01,000 --> 00:00:02,000\nok\n\n"
               "2\nnot --> a timestamp\nbad\n")
        cues = parse_srt(srt)
        assert len(cues) == 1 and cues[0]["text"] == "ok"

    def test_never_raises_on_garbage(self):
        for payload in ("", "\n\n\n", "-->", "a --> b\nx",
                        "99:99:99,999 --> 00:00:01,000\nx"):
            assert isinstance(parse_srt(payload), list)


class TestWebvtt:
    def test_note_style_region_skipped(self):
        vtt = ("WEBVTT\n\nNOTE a note\nmore note\n\nSTYLE\n::cue {}\n\n"
               "REGION\nid:r\n\n"
               "00:01.000 --> 00:02.000\nReal cue\n")
        cues = parse_webvtt(vtt)
        assert len(cues) == 1 and cues[0]["text"] == "Real cue"

    def test_cue_ids_settings_voice_tags(self):
        vtt = ("WEBVTT - Kind: captions\n\n"
               "intro\n00:01.000 --> 00:03.000 position:10%,line-left\n"
               "<v Roger>Hi <b>there</b></v>\n")
        cues = parse_webvtt(vtt)
        assert cues == [{"start_ms": 1000, "end_ms": 3000,
                         "text": "Hi there"}]

    def test_signature_required_and_bom(self):
        assert parse_webvtt("1\n00:00:01,000 --> 00:00:02,000\nx") is None
        assert parse_webvtt("﻿WEBVTT\n\n00:01.000 --> 00:02.000\nx") == [
            {"start_ms": 1000, "end_ms": 2000, "text": "x"}]

    def test_header_glued_to_first_cue(self):
        cues = parse_webvtt("WEBVTT\n00:00.000 --> 00:01.000\nGlued\n")
        assert cues == [{"start_ms": 0, "end_ms": 1000, "text": "Glued"}]


class TestSniff:
    def test_formats_and_refusal(self):
        assert parse_subtitles(b"WEBVTT\n\n00:01.000 --> 00:02.000\nv")[0] == "vtt"
        assert parse_subtitles(
            b"1\n00:00:01,000 --> 00:00:02,000\ns")[0] == "srt"
        assert parse_subtitles(b"plain text, no captions") is None
        assert parse_subtitles(b"\xff\xfe\x00\x01 binary junk") is None

    def test_max_cues_guard(self):
        one = "1\n00:00:01,000 --> 00:00:02,000\nx\n\n"
        from hobbes_spark.functions import subtitles as S

        old = S._MAX_CUES
        S._MAX_CUES = 5
        try:
            assert len(parse_srt(one * 20)) == 5
        finally:
            S._MAX_CUES = old


class TestSubtitleCuesDataFrame:
    def test_boundary_and_refusals(self, spark):
        rows = [
            (1, bytearray(b"WEBVTT\n\n00:01.000 --> 00:02.500\nCue one\n\n"
                          b"00:03.000 --> 00:04.000\nCue two\n")),
            (2, bytearray(b"1\n00:00:05,000 --> 00:00:06,000\nSrt cue\n")),
            (3, bytearray(b"neither")),
            (4, None),
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        got = [r.asDict() for r in
               subtitle_cues(media).orderBy("media_id", "cue_index").collect()]
        assert [(r["media_id"], r["cue_index"], r["format"], r["start_ms"],
                 r["duration_ms"], r["text"]) for r in got] == [
            (1, 0, "vtt", 1000, 1500, "Cue one"),
            (1, 1, "vtt", 3000, 1000, "Cue two"),
            (2, 0, "srt", 5000, 1000, "Srt cue"),
        ]

    def test_plan_is_map_only(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"x"))], "media_id long, content binary")
        plan = subtitle_cues(media)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
