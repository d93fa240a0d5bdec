"""codec/g711.py: ITU-T G.711 expansion vs an independent reference.

The stdlib ``audioop`` module (CPython's C implementation of the same
ITU-T integer algorithm) is an independent producer of the expansion
tables — all 256 codes of both laws must match it EXACTLY. audioop is
deprecated (removed in 3.13), so the differential test gates on its
presence and a pinned golden subset keeps coverage afterward.
"""

import numpy as np
import pytest

from go_triton_spark.codec.g711 import (ALAW_TABLE, ULAW_TABLE,
                                        alaw_decode, ulaw_decode)
from go_triton_spark.codec.wav import build_wav, parse_wav


def test_tables_match_audioop():
    audioop = pytest.importorskip("audioop")
    codes = bytes(range(256))
    u_ref = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    a_ref = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(u_ref.astype(np.int64), ULAW_TABLE)
    assert np.array_equal(a_ref.astype(np.int64), ALAW_TABLE)


def test_pinned_goldens():
    """Spec landmarks (survive audioop's removal): extremes and the
    zero codes of each law."""
    assert ULAW_TABLE[0x00] == -32124 and ULAW_TABLE[0x80] == 32124
    assert ULAW_TABLE[0xFF] == 0 and ULAW_TABLE[0x7F] == -0
    assert ALAW_TABLE[0x2A] == -32256 and ALAW_TABLE[0xAA] == 32256
    assert ALAW_TABLE[0xD5] == 8 and ALAW_TABLE[0x55] == -8


def test_wav_g711_round_trip():
    codes = np.arange(256, dtype=np.uint8)
    for law, table in (("ulaw", ULAW_TABLE), ("alaw", ALAW_TABLE)):
        m = parse_wav(build_wav(codes, codec=law))
        assert m["codec"] == law
        assert m["bit_depth"] == 8 and m["n_frames"] == 256
        assert np.array_equal(m["samples"][:, 0], table)


def test_decode_helpers():
    assert np.array_equal(ulaw_decode(b"\x00\xff"), [-32124, 0])
    assert np.array_equal(alaw_decode(b"\xd5\x55"), [8, -8])


def test_g711_rejects_wide_codes():
    """A G.711 fmt chunk claiming 16-bit codes is corrupt."""
    import struct
    good = bytearray(build_wav(np.zeros(4, dtype=np.uint8), codec="ulaw"))
    # fmt body starts at offset 20; bit_depth is the last H of the chunk
    struct.pack_into("<H", good, 34, 16)
    with pytest.raises(ValueError):
        parse_wav(bytes(good))
