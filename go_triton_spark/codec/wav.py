"""Real-bytes WAV (RIFF/PCM) parsing — the multimodal decode path that
needs no native media library, so the mm_* family has one format whose
decode is NOT a stub (VERDICT r3 ask; the PIL/ffmpeg formats keep their
documented swap points in operators/multimodal.py).

Scope: canonical RIFF/WAVE containers with integer PCM (format tag 1)
at 8/16/24/32-bit depth plus G.711 telephony companding (tag 6 =
A-law, tag 7 = mu-law; expanded to linear via codec/g711.py), mono or
multi-channel. The chunk walk is a real parser — it skips unknown
chunks (LIST, fact, cue, bext...), honors the RIFF odd-size pad byte,
and fails loudly (ValueError) on truncated or unsupported-tag input
so callers can apply the engine's corrupt-skip semantics (same
contract as the msgpack decode path).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_ALAW = 6
_ULAW = 7
_IMA_ADPCM = 0x11


def parse_wav(data: bytes) -> dict:
    """Parse one complete WAV file; return metadata + signal stats.

    Returns dict with: n_channels, sample_rate, bit_depth, n_frames,
    duration_ms (int, floor), peak (max |sample| across channels),
    rms_u (round(sqrt(mean(sample^2)))) — integer outputs only, so
    results hash identically across engines/platforms.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)

    fmt = None
    pcm = None
    pos = 12
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        csize = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        if body_start + csize > len(data):
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            (tag, n_channels, sample_rate, _byte_rate, _block_align,
             bit_depth) = struct.unpack_from("<HHIIHH", data, body_start)
            if tag not in (_PCM, _ALAW, _ULAW, _IMA_ADPCM):
                raise ValueError(f"unsupported WAV format tag {tag} "
                                 "(integer PCM, A-law, mu-law, IMA ADPCM)")
            if tag in (_ALAW, _ULAW) and bit_depth != 8:
                raise ValueError("G.711 WAV requires 8-bit codes, "
                                 f"got {bit_depth}")
            if tag == _IMA_ADPCM:
                if bit_depth != 4:
                    raise ValueError("IMA ADPCM WAV requires 4-bit "
                                     f"codes, got {bit_depth}")
                if n_channels != 1:
                    raise ValueError("IMA ADPCM: mono only")
            fmt = (tag, n_channels, sample_rate, bit_depth,
                   _block_align)
        elif cid == b"data":
            pcm = data[body_start:body_start + csize]
        # odd chunk sizes carry a pad byte (RIFF spec)
        pos = body_start + csize + (csize & 1)
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")

    tag, n_channels, sample_rate, bit_depth, block_align = fmt
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("corrupt fmt chunk")
    if tag == _IMA_ADPCM:
        from go_triton_spark.codec.adpcm import decode_ima_blocks
        x = decode_ima_blocks(pcm, block_align)
    elif tag == _ULAW:
        from go_triton_spark.codec.g711 import ulaw_decode
        x = ulaw_decode(pcm)
    elif tag == _ALAW:
        from go_triton_spark.codec.g711 import alaw_decode
        x = alaw_decode(pcm)
    elif bit_depth == 8:
        # 8-bit WAV is unsigned, biased at 128
        x = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64) - 128
    elif bit_depth == 16:
        x = np.frombuffer(pcm[:len(pcm) - len(pcm) % 2],
                          dtype="<i2").astype(np.int64)
    elif bit_depth == 24:
        b = np.frombuffer(pcm[:len(pcm) - len(pcm) % 3],
                          dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        x = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x -= (x & 0x800000) << 1  # sign-extend
    elif bit_depth == 32:
        x = np.frombuffer(pcm[:len(pcm) - len(pcm) % 4],
                          dtype="<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported bit depth {bit_depth}")

    n_frames = len(x) // n_channels
    duration_ms = n_frames * 1000 // sample_rate
    if len(x):
        peak = int(np.abs(x).max())
        # exact integer sum of squares, one float sqrt, one round.
        # int64 accumulation wraps for wide samples: one full-scale
        # 32-bit sample squared is ~2^62, so two of them overflow
        # silently. But for <=16-bit audio a squared sample is <=2^30,
        # so int64 stays exact up to 2^33 (~8.6e9) samples — keep the
        # hot path vectorized there and pay the ~10x-slower chunked
        # object-dtype (Python bigint) sum only for 24/32-bit depths.
        if bit_depth <= 16:
            sq = int(np.square(x).sum())
        else:
            sq = int(sum((x[i:i + 65536].astype(object) ** 2).sum()
                         for i in range(0, len(x), 65536)))
        rms_u = int(round(float(np.sqrt(sq / len(x)))))
    else:
        peak = rms_u = 0
    return {
        "n_channels": int(n_channels),
        "sample_rate": int(sample_rate),
        "bit_depth": int(bit_depth),
        "codec": {_PCM: "pcm", _ALAW: "alaw", _ULAW: "ulaw",
                  _IMA_ADPCM: "ima_adpcm"}[tag],
        "n_frames": int(n_frames),
        "duration_ms": int(duration_ms),
        "peak": peak,
        "rms_u": rms_u,
        # decoded PCM as (n_frames, n_channels) — same contract as
        # parse_flac's ``samples``, so audio feature operators are
        # container-agnostic (see codec/audio.py)
        "samples": x[:n_frames * n_channels].reshape(n_frames, n_channels),
    }


def build_wav(samples, sample_rate: int = 8000, n_channels: int = 1,
              bit_depth: int = 16, codec: str = "pcm") -> bytes:
    """Assemble a canonical 44-byte-header WAV from int samples
    (interleaved if multi-channel). Deterministic byte output — used
    to synthesize real in-flight WAV payloads for the mm_wav_decode
    operator's gate corpus and test fixtures.

    ``codec='ulaw'`` / ``'alaw'`` writes a G.711 container (format
    tag 7 / 6, 8-bit): ``samples`` are then the raw COMPANDED code
    bytes (0..255), not linear PCM."""
    if codec in ("ulaw", "alaw"):
        tag = _ULAW if codec == "ulaw" else _ALAW
        pcm = np.asarray(samples, dtype=np.uint8).tobytes()
        block_align = n_channels
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, tag, n_channels,
                                     sample_rate,
                                     sample_rate * block_align,
                                     block_align, 8)
        hdr += b"data" + struct.pack("<I", len(pcm))
        return hdr + pcm
    if bit_depth == 16:
        pcm = np.asarray(samples, dtype="<i2").tobytes()
    elif bit_depth == 8:
        pcm = (np.asarray(samples, dtype=np.int64) + 128).astype(
            np.uint8).tobytes()
    elif bit_depth == 32:
        pcm = np.asarray(samples, dtype="<i4").tobytes()
    else:
        raise ValueError(f"build_wav: unsupported bit depth {bit_depth}")
    block_align = n_channels * bit_depth // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, _PCM, n_channels,
                                 sample_rate, sample_rate * block_align,
                                 block_align, bit_depth)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm
