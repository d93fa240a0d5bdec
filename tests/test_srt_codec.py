"""codec/srt.py: SubRip parse/build + caption dispatch."""

import pytest

from go_triton_spark.codec.srt import (build_srt, parse_captions,
                                       parse_srt)
from go_triton_spark.codec.vtt import build_webvtt

CUES = [(0, 1400, "hello there"), (1500, 2900, "line one\nline two"),
        (3600000 + 61000, 3600000 + 62500, "past the hour")]


def test_round_trip():
    got = parse_srt(build_srt(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == CUES


def test_golden_bytes():
    assert build_srt(CUES[:1]) == (
        b"1\n00:00:00,000 --> 00:00:01,400\nhello there\n")


def test_external_shape_tolerated():
    """CRLF, BOM, trailing X1 coordinates — shapes real rippers emit."""
    raw = ("﻿1\r\n00:00:01,000 --> 00:00:02,000 X1:10 Y1:10\r\n"
           "text\r\n\r\n2\r\n00:00:03,000 --> 00:00:04,000\r\nmore\r\n"
           ).encode("utf-8")
    got = parse_srt(raw)
    assert [c["start_ms"] for c in got] == [1000, 3000]


@pytest.mark.parametrize("mutant", [
    b"x\n00:00:00,000 --> 00:00:01,000\nhi\n",     # non-numeric index
    b"1\n00:00:00,000 -!> 00:00:01,000\nhi\n",     # broken arrow
    b"1\n00:00:02,000 --> 00:00:01,000\nhi\n",     # end before start
    b"1\n00:00:00,000 --> 00:00:01,000\n\n",       # empty payload
    b"1\n00:00:00.000 --> 00:00:01.000\nhi\n",     # VTT dots in SRT
    b"1\n00:77:00,000 --> 00:78:01,000\nhi\n",     # minute out of range
    b"",                                           # no cues at all
])
def test_corrupt_rejected(mutant):
    with pytest.raises(ValueError):
        parse_srt(mutant)


def test_dispatch_routes_both():
    srt = build_srt(CUES[:1])
    vtt = build_webvtt(CUES[:1])
    assert parse_captions(srt)[0]["text"] == "hello there"
    assert parse_captions(vtt)[0]["text"] == "hello there"
    with pytest.raises(ValueError):
        parse_captions(b"# neither format\n")
