"""SubRip (.srt) caption parsing — the other ubiquitous subtitle
format next to WebVTT (codec/vtt.py). Video corpora scraped from the
open web carry both; a caption column must parse either.

Pure stdlib from the public SubRip format: blank-line-separated
blocks of (sequence number, ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing
with COMMA millisecond separators and mandatory hours, one or more
payload lines). Fails loudly (ValueError) on a non-numeric index, a
malformed or out-of-range timestamp, end <= start, or an empty
payload — the engine's corrupt-skip contract, same as parse_webvtt.

``parse_captions`` is the magic-sniffing dispatch over both formats
(the caption twin of codec/image.py / codec/audio.py), normalizing to
the shared cue contract {start_ms, end_ms, text}.
"""

from __future__ import annotations

import re

_TS = re.compile(r"^(\d{2}):(\d{2}):(\d{2}),(\d{3})$")


def _parse_ts(text: str) -> int:
    m = _TS.match(text.strip())
    if not m:
        raise ValueError(f"bad SRT timestamp {text!r}")
    hh, mm, ss, ms = (int(g) for g in m.groups())
    if mm > 59 or ss > 59:
        raise ValueError(f"bad SRT timestamp field range {text!r}")
    return ((hh * 60 + mm) * 60 + ss) * 1000 + ms


def parse_srt(data: bytes) -> list[dict]:
    """Parse one SubRip file; returns one dict per cue:
    {start_ms, end_ms, text} in file order."""
    try:
        raw = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"SRT is not UTF-8: {e}") from e
    if raw.startswith("﻿"):
        raw = raw[1:]
    lines = raw.replace("\r\n", "\n").replace("\r", "\n").split("\n")

    cues: list[dict] = []
    i = 0
    n = len(lines)
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        if not lines[i].strip().isdigit():
            raise ValueError(f"SRT block must open with a numeric "
                             f"index, got {lines[i]!r}")
        i += 1
        if i >= n or "-->" not in lines[i]:
            raise ValueError("SRT index with no timing line")
        left, _, right = lines[i].partition("-->")
        start = _parse_ts(left)
        # cue settings after the end stamp are not part of SubRip, but
        # tolerate trailing coordinates (X1:.. Y1:..) some tools emit
        end = _parse_ts(right.strip().split(" ")[0])
        if end <= start:
            raise ValueError(f"SRT cue ends before it starts "
                             f"({start}ms .. {end}ms)")
        i += 1
        text_lines = []
        while i < n and lines[i].strip():
            text_lines.append(lines[i])
            i += 1
        if not text_lines:
            raise ValueError("SRT cue with empty payload")
        cues.append({"start_ms": start, "end_ms": end,
                     "text": "\n".join(text_lines)})
    if not cues:
        raise ValueError("SRT file contains no cues")
    return cues


def _fmt_ts(ms: int) -> str:
    hh, rem = divmod(ms, 3600000)
    mm, rem = divmod(rem, 60000)
    ss, mmm = divmod(rem, 1000)
    return f"{hh:02d}:{mm:02d}:{ss:02d},{mmm:03d}"


def build_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """Assemble a SubRip file from (start_ms, end_ms, text) tuples."""
    blocks = []
    for k, (start, end, text) in enumerate(cues):
        blocks.append(f"{k + 1}\n{_fmt_ts(start)} --> {_fmt_ts(end)}\n"
                      f"{text}")
    return ("\n\n".join(blocks) + "\n").encode("utf-8")


def parse_captions(data: bytes) -> list[dict]:
    """Sniffing dispatch over caption formats: WebVTT (signature
    line) vs SubRip (numeric first line). Shared cue contract."""
    head = data.lstrip(b"\xef\xbb\xbf")[:16]
    if head.startswith(b"WEBVTT"):
        from go_triton_spark.codec.vtt import parse_webvtt
        return parse_webvtt(data)
    first = head.split(b"\n", 1)[0].strip()
    if first.isdigit():
        return parse_srt(data)
    raise ValueError("unknown caption format (neither WEBVTT nor SRT)")
