"""WebVTT (W3C) caption parsing — the TEXT half of video training
pairs. A video-text dataset row is (frames, captions); codec/avi.py
decodes the frames, this module parses the caption track, and
operators/multimodal.py joins them into aligned (frame, caption)
training pairs.

Pure stdlib from the public WebVTT spec: the WEBVTT signature line,
blank-line-separated cue blocks, optional cue identifiers, the
``HH:MM:SS.mmm --> MM:SS.mmm``-style timings (hours optional, cue
settings after the end stamp tolerated and ignored), multi-line
payloads, and NOTE comment blocks. Fails loudly (ValueError) on a bad
signature, malformed timestamps, end <= start, or an empty payload —
the engine's corrupt-skip contract.
"""

from __future__ import annotations

import re

_TS = re.compile(
    r"^(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})$")
_ARROW = "-->"


def _parse_ts(text: str) -> int:
    """WebVTT timestamp -> milliseconds (hours component optional)."""
    m = _TS.match(text.strip())
    if not m:
        raise ValueError(f"bad WebVTT timestamp {text!r}")
    hh = int(m.group(1) or 0)
    mm, ss, ms = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if mm > 59 or ss > 59:
        raise ValueError(f"bad WebVTT timestamp field range {text!r}")
    return ((hh * 60 + mm) * 60 + ss) * 1000 + ms


def parse_webvtt(data: bytes) -> list[dict]:
    """Parse one WebVTT file; returns one dict per cue:
    {start_ms, end_ms, text} in file order."""
    try:
        raw = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"WebVTT is not UTF-8: {e}") from e
    if raw.startswith("﻿"):
        raw = raw[1:]
    lines = raw.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if not lines or not lines[0].startswith("WEBVTT"):
        raise ValueError("not a WebVTT file (missing WEBVTT signature)")

    cues = []
    i = 1
    n = len(lines)
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        if lines[i].startswith("NOTE"):           # comment block: skip
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional cue identifier line (no arrow)
        if _ARROW not in lines[i]:
            i += 1
            if i >= n or _ARROW not in lines[i]:
                raise ValueError("WebVTT cue identifier without timings")
        timing = lines[i]
        i += 1
        left, _, right = timing.partition(_ARROW)
        # cue settings (position/align/...) may follow the end stamp
        end_txt = right.strip().split(" ")[0] if right.strip() else ""
        start_ms = _parse_ts(left)
        end_ms = _parse_ts(end_txt)
        if end_ms <= start_ms:
            raise ValueError(
                f"WebVTT cue ends at {end_ms} ms, not after {start_ms} ms")
        payload = []
        while i < n and lines[i].strip():
            payload.append(lines[i])
            i += 1
        if not payload:
            raise ValueError("WebVTT cue with empty payload")
        cues.append({"start_ms": start_ms, "end_ms": end_ms,
                     "text": "\n".join(payload)})
    if not cues:
        raise ValueError("WebVTT file contains no cues")
    return cues


def _fmt_ts(ms: int) -> str:
    hh, rest = divmod(ms, 3_600_000)
    mm, rest = divmod(rest, 60_000)
    ss, mmm = divmod(rest, 1000)
    return f"{hh:02d}:{mm:02d}:{ss:02d}.{mmm:03d}"


def build_webvtt(cues: list[tuple[int, int, str]],
                 note: str | None = None) -> bytes:
    """Assemble a WebVTT file from (start_ms, end_ms, text) cues.
    Deterministic bytes — the gate/test producer."""
    out = ["WEBVTT", ""]
    if note:
        out += [f"NOTE {note}", ""]
    for k, (start, end, text) in enumerate(cues, 1):
        out.append(str(k))                        # cue identifier
        out.append(f"{_fmt_ts(start)} --> {_fmt_ts(end)}")
        out.append(text)
        out.append("")
    return "\n".join(out).encode("utf-8")
