"""G.711 companded telephony audio: mu-law and A-law code decode.

The ITU-T G.711 expansion formulas (public spec; the integer
reference algorithm published in ITU-T G.191's STL), implemented as
256-entry numpy lookup tables built from the closed-form segment
math — decode of a code column is a single fancy-index, no per-sample
Python. Telephony corpora (call-center audio, classic speech sets
like TIMIT-derived 8 kHz data) ship as G.711 WAV (format tags 7 =
mu-law, 6 = A-law); codec/wav.py routes those tags here.

The formulas are small enough to restate in ANSI SQL, which is
exactly what the mm_g711_decode oracle does — an INDEPENDENT
re-implementation, not a pinned golden.
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84      # mu-law bias (132)
_QUANT = 0x0F
_SEG = 0x70
_SIGN = 0x80


def _ulaw_expand_one(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & _QUANT) << 3) + _BIAS) << ((u & _SEG) >> 4)
    return (_BIAS - t) if (u & _SIGN) else (t - _BIAS)


def _alaw_expand_one(code: int) -> int:
    a = code ^ 0x55
    t = (a & _QUANT) << 4
    seg = (a & _SEG) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & _SIGN) else -t


ULAW_TABLE = np.array([_ulaw_expand_one(c) for c in range(256)],
                      dtype=np.int64)
ALAW_TABLE = np.array([_alaw_expand_one(c) for c in range(256)],
                      dtype=np.int64)


def ulaw_decode(codes) -> np.ndarray:
    """Expand mu-law code bytes to linear PCM (int64, 14-bit range)."""
    return ULAW_TABLE[np.frombuffer(bytes(codes), dtype=np.uint8)]


def alaw_decode(codes) -> np.ndarray:
    """Expand A-law code bytes to linear PCM (int64, 13-bit range)."""
    return ALAW_TABLE[np.frombuffer(bytes(codes), dtype=np.uint8)]
