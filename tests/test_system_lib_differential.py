"""Differential validation of the pure-Python codecs against REAL
system reference libraries via ctypes (skipped gracefully where a
library isn't installed).

Round-8 motivation: a same-author encoder/decoder pair round-trips
even when BOTH sides share a spec misreading. This suite caught
exactly that — vp8l.py wrote the meta-prefix bit before the
color-cache info (the spec orders them cache-first), invisible to
every self-test because the both-flags-off case writes the identical
00 bit pair, and rejected by libwebp on every cache/meta-enabled
stream. zstd/LZ4 get the same treatment against libzstd/liblz4
through pyarrow in their own test files.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from go_triton_spark.codec.vp8l import build_webp, parse_webp


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_WEBP = _load_libwebp()

pytestmark = pytest.mark.skipif(_WEBP is None,
                                reason="libwebp not installed")


def _libwebp_decode(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _WEBP.WebPDecodeRGBA(data, len(data),
                             ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    n = w.value * h.value * 4
    arr = np.ctypeslib.as_array(p, shape=(n,)).copy() \
        .reshape(h.value, w.value, 4)
    _WEBP.WebPFree(p)
    return arr


def _libwebp_encode_lossless(rgba: np.ndarray) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    size = _WEBP.WebPEncodeLosslessRGBA(rgba.tobytes(), w, h, w * 4,
                                        ctypes.byref(out))
    assert size, "libwebp lossless encode failed"
    buf = bytes(bytearray(np.ctypeslib.as_array(out, shape=(size,))))
    _WEBP.WebPFree(out)
    return buf


@pytest.mark.parametrize("transform", ["none", "predictor", "color",
                                       "palette"])
@pytest.mark.parametrize("cache_bits", [0, 1, 4, 8])
@pytest.mark.parametrize("use_meta", [False, True])
def test_own_streams_decode_in_libwebp(transform, cache_bits, use_meta):
    rng = np.random.default_rng(hash((transform, cache_bits)) & 0xFFFF)
    for trial in range(2):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        if transform == "palette":
            pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
            img = pal[rng.integers(0, 5, (h, w))]
        elif trial % 2:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
            img = np.dstack([base, (base + 40) % 256,
                             (base + 90) % 256]).astype(np.uint8)
        data = build_webp(img, transform=transform, use_meta=use_meta,
                          cache_bits=cache_bits)
        got = _libwebp_decode(data)
        assert got is not None, "libwebp rejected the stream"
        assert np.array_equal(got[:, :, :3], img)
        assert (got[:, :, 3] == 255).all()
        # and the stream still round-trips at home
        assert np.array_equal(parse_webp(data)["pixels"], img)


@pytest.mark.parametrize("kind", ["random", "gradient", "palette",
                                  "photoish"])
def test_libwebp_streams_decode_here(kind):
    """Real libwebp lossless output (which picks its own transforms,
    meta prefix groups and color-cache sizes) through this decoder."""
    rng = np.random.default_rng(hash(kind) & 0xFFFF)
    for _ in range(4):
        h, w = int(rng.integers(1, 200)), int(rng.integers(1, 200))
        if kind == "random":
            rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == "gradient":
            base = np.add.outer(np.arange(h) * 2, np.arange(w) * 7) % 256
            rgb = np.dstack([base, base, (base * 2) % 256]).astype(np.uint8)
        elif kind == "palette":
            pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
            rgb = pal[rng.integers(0, 7, (h, w))]
        else:
            rgb = (np.cumsum(rng.integers(-3, 4, (h, w, 3)), axis=1)
                   % 256).astype(np.uint8)
        rgba = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
        data = _libwebp_encode_lossless(rgba)
        r = parse_webp(data)
        assert np.array_equal(r["pixels"], rgb), (kind, h, w)
