"""codec/vtt.py: WebVTT caption parsing, golden-gated.

Goldens are hand-written WebVTT text from the public W3C spec — cue
identifiers, optional-hours timestamps, cue settings after the end
stamp, NOTE blocks, CRLF endings, BOM — none of which build_webvtt
emits in every combination; the builder is then pinned by roundtrip.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_triton_spark.codec.vtt import build_webvtt, parse_webvtt


def test_hand_written_golden_all_spec_shapes():
    raw = (
        "﻿WEBVTT some header text\n"
        "\n"
        "NOTE a comment\n"
        "spanning two lines\n"
        "\n"
        "intro-cue\n"
        "00:01.000 --> 00:02.500 align:start position:10%\n"
        "Hello there\n"
        "second line\n"
        "\n"
        "01:02:03.250 --> 01:02:04.000\n"
        "with hours\n"
    ).encode("utf-8")
    cues = parse_webvtt(raw)
    assert len(cues) == 2
    # 00:01.000 is MM:SS.mmm (optional hours absent) -> 1000 ms
    assert cues[0]["start_ms"] == 1000
    assert cues[0]["end_ms"] == 2500
    assert cues[0]["text"] == "Hello there\nsecond line"
    assert cues[1]["start_ms"] == 3_723_250
    assert cues[1]["end_ms"] == 3_724_000
    assert cues[1]["text"] == "with hours"


def test_crlf_and_no_identifier():
    raw = b"WEBVTT\r\n\r\n00:00.000 --> 00:01.000\r\nhi\r\n"
    cues = parse_webvtt(raw)
    assert cues == [{"start_ms": 0, "end_ms": 1000, "text": "hi"}]


def test_malformations_rejected():
    with pytest.raises(ValueError, match="signature"):
        parse_webvtt(b"WEBVT\n\n00:00.000 --> 00:01.000\nhi\n")
    with pytest.raises(ValueError, match="timestamp"):
        parse_webvtt(b"WEBVTT\n\n00:00.00 --> 00:01.000\nhi\n")
    with pytest.raises(ValueError, match="not after"):
        parse_webvtt(b"WEBVTT\n\n00:02.000 --> 00:01.000\nhi\n")
    with pytest.raises(ValueError, match="empty payload"):
        parse_webvtt(b"WEBVTT\n\n00:00.000 --> 00:01.000\n\n")
    with pytest.raises(ValueError, match="identifier without"):
        parse_webvtt(b"WEBVTT\n\nsome id\nnot a timing\nhi\n")
    with pytest.raises(ValueError, match="no cues"):
        parse_webvtt(b"WEBVTT\n\nNOTE only a comment\n")
    with pytest.raises(ValueError, match="field range"):
        parse_webvtt(b"WEBVTT\n\n00:61:00.000 --> 00:62:00.000\nhi\n")


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 8))
def test_roundtrip_property(seed, n):
    import random

    rng = random.Random(seed)
    cues = []
    t = rng.randrange(0, 10_000)
    for _ in range(n):
        start = t
        end = start + rng.randrange(1, 5_000)
        t = end + rng.randrange(0, 2_000)
        words = " ".join(f"tok{i}" for i in range(rng.randrange(1, 6)))
        cues.append((start, end, words))
    parsed = parse_webvtt(build_webvtt(cues, note="prop"))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in parsed] == cues


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 300), st.integers(0, 255))
def test_byte_flip_fuzz_never_crashes(pos, val):
    data = bytearray(build_webvtt([(0, 400, "a b"), (500, 900, "c")]))
    data[pos % len(data)] = val
    try:
        cues = parse_webvtt(bytes(data))
        assert cues
    except ValueError:
        pass
