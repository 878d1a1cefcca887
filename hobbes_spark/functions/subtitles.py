"""Subtitle/caption parsing (WebVTT + SRT) — the TEXT a video corpus
actually trains on.  ``video_meta`` reads the container; this module
reads the captions that ride alongside it in a crawl (YouTube-style
``.vtt``, classic ``.srt``), yielding timed cues ready for the text
stack (quality scoring, dedup, token counts).

Both formats are line-oriented public specs (W3C WebVTT; SRT is the
de-facto SubRip format): cues are blocks of

    [optional id / index line]
    HH:MM:SS.mmm --> HH:MM:SS.mmm [settings]      (VTT: dot, SRT: comma)
    cue text, possibly multi-line, possibly <i>/<v Name>-tagged

Reference parity note: the reference engine has no media layer at all
(SURVEY §2.12 treats blobs as opaque); this is part of the
beyond-reference multimodal surface, same posture as the ID3/MP4
parsers — pure byte/text walking, tolerant of garbage, never raises.

Scale posture: :func:`subtitle_cues` is map-only over Arrow batches,
zero shuffle; one caption file is KBs and yields tens-to-hundreds of
rows, so the fan-out is bounded and CPU-trivial next to the scan.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["parse_srt", "parse_webvtt", "parse_subtitles", "subtitle_cues"]

#: ``HH:MM:SS.mmm`` / ``MM:SS.mmm``, comma or dot — crawled files mix
#: the two separators freely, so both parsers accept both
_TS = re.compile(
    r"(?:(\d{1,4}):)?(\d{1,2}):(\d{1,2})[.,](\d{1,3})"
)
_ARROW = re.compile(
    r"(?:(?:\d{1,4}:)?\d{1,2}:\d{1,2}[.,]\d{1,3})\s*-->\s*"
    r"(?:(?:\d{1,4}:)?\d{1,2}:\d{1,2}[.,]\d{1,3})"
)
#: inline markup: <i>, </b>, <v Speaker>, <00:00:01.000> mid-cue
#: timestamps, <c.classname> — all angle-bracket spans drop
_TAG = re.compile(r"<[^>\n]*>")

#: runaway guard for crafted payloads (a real caption file holds
#: hundreds of cues; a feature film a few thousand)
_MAX_CUES = 1 << 16


def _ts_ms(s: str) -> int | None:
    m = _TS.fullmatch(s.strip())
    if m is None:
        return None
    h = int(m.group(1) or 0)
    mm, ss = int(m.group(2)), int(m.group(3))
    ms = int(m.group(4).ljust(3, "0"))  # ".5" means 500 ms
    if mm >= 60 or ss >= 60:
        return None
    return ((h * 60 + mm) * 60 + ss) * 1000 + ms


def _cue_from_block(lines: list[str]) -> dict | None:
    """One cue from a block of non-blank lines: find the ``-->`` line
    (line 0 or 1 — anything before it is an SRT index / VTT cue id),
    parse both timestamps, join the remaining lines as the text with
    tags stripped.  None when the block carries no valid arrow line."""
    for k in (0, 1):
        if k >= len(lines) or "-->" not in lines[k]:
            continue
        left, _, right = lines[k].partition("-->")
        start = _ts_ms(left)
        # settings ("position:10%") follow the end stamp — split off
        end = _ts_ms(right.strip().split(" ")[0] if right.strip() else "")
        if start is None or end is None:
            return None
        text = "\n".join(_TAG.sub("", ln).strip() for ln in lines[k + 1 :])
        return {"start_ms": start, "end_ms": end, "text": text}
    return None


def _blocks(body: str) -> Iterator[list[str]]:
    block: list[str] = []
    for raw in body.split("\n"):
        line = raw.rstrip("\r")
        if line.strip():
            block.append(line)
        elif block:
            yield block
            block = []
    if block:
        yield block


def parse_srt(text: str) -> list[dict]:
    """Cues from an SRT payload: numbered blocks with comma-millisecond
    timestamps.  Blocks without a parsable arrow line are SKIPPED (a
    corrupt cue must not sink the file); never raises."""
    out = []
    for block in _blocks(text):
        cue = _cue_from_block(block)
        if cue is not None:
            out.append(cue)
            if len(out) >= _MAX_CUES:
                break
    return out


def parse_webvtt(text: str) -> list[dict] | None:
    """Cues from a WebVTT payload: requires the ``WEBVTT`` signature
    (after an optional BOM), skips NOTE/STYLE/REGION blocks, accepts
    cue ids, hour-less timestamps and cue settings, strips voice/format
    tags.  None when the signature is absent; never raises."""
    body = text.lstrip("﻿")
    if not body.startswith("WEBVTT"):
        return None
    out = []
    first = True
    for block in _blocks(body):
        if first:  # the signature block (may carry a title after it)
            first = False
            if block[0].startswith("WEBVTT") and not any(
                "-->" in ln for ln in block
            ):
                continue
            if block[0].startswith("WEBVTT"):
                block = block[1:]  # header glued to the first cue
        if block and block[0].split(" ")[0] in ("NOTE", "STYLE", "REGION"):
            continue
        cue = _cue_from_block(block)
        if cue is not None:
            out.append(cue)
            if len(out) >= _MAX_CUES:
                break
    return out


def parse_subtitles(b: bytes) -> tuple[str, list[dict]] | None:
    """Sniff-and-parse one subtitle payload: ``(format, cues)`` where
    format is ``'vtt'`` or ``'srt'``, or None when the payload is
    neither (no WEBVTT signature AND no SRT cue parses).  utf-8 with
    ``errors='replace'`` — one mojibake cue file must not kill an
    executor batch."""
    try:
        text = bytes(b).decode("utf-8", errors="replace")
    except (TypeError, ValueError):
        return None
    vtt = parse_webvtt(text)
    if vtt is not None:
        return ("vtt", vtt)
    if _ARROW.search(text) is None:
        return None  # cheap reject: no arrow line anywhere
    srt = parse_srt(text)
    return ("srt", srt) if srt else None


def subtitle_cues(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Timed caption cues over a binary column through the Arrow
    ``mapInPandas`` boundary: one row per cue with exact integer
    start/end/duration milliseconds and the tag-stripped text.
    Payloads that are neither WebVTT nor SRT are DROPPED (same posture
    as the media family).  Map-only, zero shuffle; at 100 TB the cost
    is the scan, not the parse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                got = parse_subtitles(bytes(blob))
                if got is None:
                    continue
                fmt, cues = got
                for k, cue in enumerate(cues):
                    rows.append((
                        int(mid), k, fmt, cue["start_ms"], cue["end_ms"],
                        cue["end_ms"] - cue["start_ms"], cue["text"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "cue_index", "format", "start_ms",
                         "end_ms", "duration_ms", "text"],
            )

    # mapInPandas ships every input column to Python — project to what's read
    media = media.select(id_col, content_col)
    return media.mapInPandas(
        run,
        schema=("media_id long, cue_index int, format string, "
                "start_ms bigint, end_ms bigint, duration_ms bigint, "
                "text string"),
    )
