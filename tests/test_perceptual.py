"""dHash + perceptual-gate invariants (no Spark session needed).

The dedup_image_phash oracle states pairs from the generator's
ground-truth image key, which is only sound if (a) the base image's
dHash reproduces the key's bit pattern exactly, (b) the noise and
retouch variants stay within the Hamming verify threshold, and
(c) distinct keys sit far outside it. These tests pin all three, so
the differential gate can't silently go vacuous.
"""

import numpy as np
import pytest

from go_triton_spark.operators.perceptual import (
    _PH_MAX_HAMMING, _phash_gate_pixels, _phash_key_bits, dhash64)


def _u64(h: int) -> int:
    return h & ((1 << 64) - 1)


def _hamming(a: int, b: int) -> int:
    return bin(_u64(a) ^ _u64(b)).count("1")


def test_key_patterns_separate():
    """Distinct gate keys must sit far outside the verify threshold."""
    keys = [_phash_key_bits(k) for k in range(40)]
    mind = min(_hamming(a, b)
               for i, a in enumerate(keys) for b in keys[i + 1:])
    assert mind > 2 * _PH_MAX_HAMMING, mind  # measured floor: 19 bits


@pytest.mark.parametrize("img_key", [0, 7, 13, 39])
def test_base_image_hash_matches_key(img_key):
    h = dhash64(_phash_gate_pixels(img_key))  # variant 0 doc
    assert _u64(h) == _phash_key_bits(img_key)


def test_variants_within_threshold():
    for img_key in range(40):
        hs = [dhash64(_phash_gate_pixels(img_key + 40 * v))
              for v in range(3)]
        assert _hamming(hs[0], hs[1]) == 0       # noise: no bit moves
        assert _hamming(hs[0], hs[2]) == 1       # retouch: exactly one
        assert _hamming(hs[1], hs[2]) == 1


def test_dhash_resamples_any_size():
    """Same content at 2x/4x resolution hashes identically (the whole
    point of the area-average resample)."""
    base = _phash_gate_pixels(5)
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert dhash64(base) == dhash64(big)


def test_dhash_distinguishes_content():
    a = _phash_gate_pixels(1)
    b = _phash_gate_pixels(2)
    assert _hamming(dhash64(a), dhash64(b)) > _PH_MAX_HAMMING


# =====================================================================
# audio fingerprint invariants (dedup_audio_fingerprint's gate)
# =====================================================================

def test_afp_keys_distinct():
    """All 45 gate clip keys must fingerprint distinctly, else the
    differential oracle would under-count groups."""
    from go_triton_spark.operators.perceptual import (
        _afp_gate_signal, audio_fingerprint)
    fps = {audio_fingerprint(_afp_gate_signal(k)) for k in range(45)}
    assert len(fps) == 45


def test_afp_gain_invariant():
    from go_triton_spark.operators.perceptual import (
        _afp_gate_signal, audio_fingerprint)
    for key in (0, 7, 44):
        base = audio_fingerprint(_afp_gate_signal(key))          # gain 1
        for v in (2, 3):
            doc = key + 45 * (v - 1)
            assert (doc % 45, 1 + (doc // 45) % 3) == (key, v)
            assert audio_fingerprint(_afp_gate_signal(doc)) == base
    # plain numeric scaling of the samples is also invariant
    sig = _afp_gate_signal(3)
    assert audio_fingerprint(sig * 7) == audio_fingerprint(sig)


def test_afp_detects_different_content():
    from go_triton_spark.operators.perceptual import (
        _afp_gate_signal, audio_fingerprint)
    assert (audio_fingerprint(_afp_gate_signal(1))
            != audio_fingerprint(_afp_gate_signal(2)))
