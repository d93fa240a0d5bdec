"""Native fast-path equality suite (codec/native.py, r9 verdict #2).

The opt-in system-library decode path must be INVISIBLE except for
speed: bit-identical output for WebP (lossy via WebPDecodeYUV + the
engine's own yuv_to_rgb; lossless via WebPDecodeRGBA), PNG, TIFF, and
byte-identical for zstd/lz4/xz decompression. JPEG is the documented
exception — ITU-T T.81 leaves IDCT precision implementation-defined,
so the pure float-IDCT decoder and libjpeg's islow integer IDCT
legitimately differ; the bound here (+-2 per channel, metadata exact)
is measured and pinned. Corrupt bytes must raise the SAME loud
ValueError with the flag on (native rejection falls back to the pure
decoder, which owns the verdict).

Each test skips when its system library is absent, so the suite stays
green on a minimal container while pinning the contract wherever the
fast path can actually engage.
"""

from __future__ import annotations

import lzma

import numpy as np
import pytest

from go_triton_spark.codec import native
from go_triton_spark.codec.image import parse_image
from go_triton_spark.codec.jpeg import build_jpeg_ycbcr, parse_jpeg
from go_triton_spark.codec.lz4 import frame_compress, frame_decompress
from go_triton_spark.codec.png import build_png, parse_png
from go_triton_spark.codec.tiff import build_tiff, parse_tiff
from go_triton_spark.codec.vp8l import build_webp, build_webp_anim, \
    parse_webp
from go_triton_spark.codec.xz import xz_decompress
from go_triton_spark.codec.zstd import decompress as zstd_decompress

_ST = native.native_status()

_webp = pytest.mark.skipif(not _ST["webp"], reason="libwebp absent")
_png = pytest.mark.skipif(not _ST["png"], reason="libpng absent")
_tiff = pytest.mark.skipif(not _ST["tiff"], reason="libtiff absent")
_jpeg = pytest.mark.skipif(not _ST["jpeg_shim"],
                           reason="jpeg shim unavailable (no gcc?)")
_zstd = pytest.mark.skipif(not _ST["zstd"], reason="libzstd absent")
_lz4 = pytest.mark.skipif(not _ST["lz4"], reason="liblz4 absent")


def _img(kind: str, h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), 130, np.uint8)
    base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
    return np.dstack([base, (base + 40) % 256,
                      (base + 90) % 256]).astype(np.uint8)


def _same_dict(a: dict, b: dict) -> None:
    assert set(a) == set(b), (sorted(a), sorted(b))
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, np.ndarray):
            assert np.array_equal(va, vb), k
        else:
            assert va == vb, (k, va, vb)


# ------------------------------------------------------------- webp

@_webp
@pytest.mark.parametrize("transform", ["none", "predictor", "color",
                                       "palette"])
def test_webp_lossless_bit_identical(transform):
    for trial, (h, w) in enumerate(((1, 1), (7, 31), (40, 40), (33, 17))):
        if transform == "palette":
            rng = np.random.default_rng(trial)
            pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
            img = pal[rng.integers(0, 6, (h, w))]
        else:
            img = _img(("noise", "grad")[trial % 2], h, w, seed=trial)
        data = build_webp(img, transform=transform)
        _same_dict(parse_webp(data), parse_webp(data, prefer_native=True))


@_webp
def test_webp_lossless_alpha_bit_identical():
    rng = np.random.default_rng(5)
    img = _img("grad", 22, 18)
    alpha = rng.integers(0, 256, (22, 18), dtype=np.uint8)
    data = build_webp(img, alpha=alpha)
    _same_dict(parse_webp(data), parse_webp(data, prefer_native=True))


@_webp
def test_webp_lossy_bit_identical():
    """The hot claim: native lossy = WebPDecodeYUV planes (proven
    bit-exact vs the pure decoder elsewhere) + the ENGINE'S integer
    YUV->RGB — so pixels AND the y/u/v plane keys match exactly."""
    from tests.test_vp8_codec import _encode_simple

    for trial, (h, w, q) in enumerate(((16, 16, 20), (33, 17, 60),
                                       (64, 48, 85), (5, 3, 50))):
        img = _img(("noise", "grad", "flat")[trial % 3], h, w, seed=trial)
        data = _encode_simple(img, float(q))
        _same_dict(parse_webp(data), parse_webp(data, prefer_native=True))


@_webp
def test_webp_vp8x_falls_back_to_pure():
    """Extended containers (here: animation) have no native path —
    the flag must not change their output."""
    base = np.full((8, 8, 3), 50, np.uint8)
    data = build_webp_anim([dict(rgb=base, no_blend=True)], 8, 8)
    a = parse_webp(data)
    b = parse_webp(data, prefer_native=True)
    assert a["n_frames"] == b["n_frames"] == 1
    assert np.array_equal(a["pixels"], b["pixels"])


@_webp
def test_webp_corrupt_still_raises_with_flag_on():
    # truncation is the corruption BOTH paths reject (VP8L carries no
    # payload checksum, so a mid-stream byte flip is a different-but-
    # valid stream — both decode it, identically, covered above)
    img = _img("grad", 12, 12)
    data = build_webp(img)
    with pytest.raises(ValueError):
        parse_webp(data[:-6], prefer_native=True)
    with pytest.raises(ValueError):
        parse_webp(b"RIFF\x04\x00\x00\x00WEBP", prefer_native=True)


# -------------------------------------------------------------- png

@_png
@pytest.mark.parametrize("interlace", [False, True])
def test_png_bit_identical(interlace):
    for trial, (h, w) in enumerate(((1, 1), (9, 40), (40, 9), (32, 32))):
        img = _img(("noise", "grad")[trial % 2], h, w, seed=trial)
        data = build_png(img, interlace=interlace)
        _same_dict(parse_png(data), parse_png(data, prefer_native=True))


@_png
def test_png_corrupt_still_raises_with_flag_on():
    data = bytearray(build_png(_img("grad", 10, 10)))
    data[40] ^= 0xFF  # inside IHDR/IDAT region: CRC breaks
    with pytest.raises(ValueError):
        parse_png(bytes(data), prefer_native=True)


@_png
@pytest.mark.parametrize("cut", [1, 9, 11, 12, 13])
def test_png_truncated_iend_rejected_with_flag_on(cut):
    """r12 find (native-default flip): libpng's simplified API decodes
    a PNG whose trailing IEND chunk is truncated away, silently
    WIDENING the accept set vs parse_png's loud 'truncated PNG chunk
    header' — exactly the corrupt-skip shape the cross-format dedup
    gates synthesize (last 9/11 bytes cut). The structural pre-walk
    must route these to the pure path so flag-on == flag-off accept."""
    data = build_png(_img("grad", 12, 7))
    with pytest.raises(ValueError):
        parse_png(data[:-cut], prefer_native=True)
    # and the walk must NOT reject the intact file (native still used)
    from go_triton_spark.codec import native as _n
    assert _n._png_chunks_structurally_pure(data)
    m = parse_png(data, prefer_native=True)
    assert m["width"] == 7 and m["height"] == 12


# ------------------------------------------------------------- tiff

@_tiff
@pytest.mark.parametrize("comp", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_bit_identical(comp, big_endian):
    img = _img("noise", 29, 41, seed=7)
    data = build_tiff(img, compression=comp, big_endian=big_endian,
                      predictor=(comp == "lzw"))
    _same_dict(parse_tiff(data), parse_tiff(data, prefer_native=True))


@_tiff
def test_tiff_corrupt_still_raises_with_flag_on():
    data = build_tiff(_img("grad", 8, 8))
    with pytest.raises(ValueError):
        parse_tiff(data[:30], prefer_native=True)


# ------------------------------------------------------------- jpeg

@_jpeg
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("progressive", [False, True])
def test_jpeg_within_bound_and_metadata_exact(sub, progressive):
    """T.81 IDCT variance: +-2 per channel vs the pure float-IDCT
    decoder (measured over the generator corpus); every metadata key
    (width/height/n_components/progressive/subsampling) exact."""
    rng = np.random.default_rng(13)
    h, w = 40, 56
    y = (np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256) \
        .astype(np.uint8)
    cb = ((np.add.outer(np.arange(h), np.arange(w) * 2) + 30) % 256) \
        .astype(np.uint8)
    cr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    data = build_jpeg_ycbcr(y, cb, cr, subsampling=sub,
                            progressive=progressive)
    a = parse_jpeg(data)
    b = parse_jpeg(data, prefer_native=True)
    for k in ("width", "height", "n_pixels", "n_components",
              "progressive", "subsampling"):
        assert a[k] == b[k], k
    d = np.abs(a["pixels"].astype(int) - b["pixels"].astype(int)).max()
    assert d <= 2, f"IDCT delta {d} exceeds the measured bound"


@_jpeg
def test_jpeg_grayscale_and_corrupt():
    y = (np.add.outer(np.arange(24) * 7, np.arange(24) * 3) % 256) \
        .astype(np.uint8)
    data = build_jpeg_ycbcr(y, None, None, subsampling="4:4:4")
    a = parse_jpeg(data)
    b = parse_jpeg(data, prefer_native=True)
    assert a["n_components"] == b["n_components"] == 1
    assert np.abs(a["pixels"].astype(int)
                  - b["pixels"].astype(int)).max() <= 2
    with pytest.raises(ValueError):
        parse_jpeg(data[:40], prefer_native=True)


# ----------------------------------------------- zstd / lz4 / xz

_PAYLOADS = [b"", b"x", b'{"doc": 1}\n' * 4000,
             bytes(range(256)) * 997, b"\x00" * 100_000]


@_zstd
def test_zstd_native_byte_identical():
    import pyarrow as pa
    codec = pa.Codec("zstd", compression_level=3)
    for raw in _PAYLOADS:
        comp = bytes(codec.compress(raw))
        got = native.zstd_decompress_native(comp)
        assert got == raw == zstd_decompress(comp)
    # via the ingest-facing wrapper, flag forced on
    comp = bytes(codec.compress(_PAYLOADS[2]))
    assert native.decompress_with_fallback(
        "zstd", comp, zstd_decompress, prefer_native=True) == _PAYLOADS[2]


@_zstd
def test_zstd_corrupt_falls_back_to_typed_error():
    from go_triton_spark.codec.zstd import ZstdError
    import pyarrow as pa
    comp = bytes(pa.Codec("zstd").compress(b"hello" * 1000))[:-3]
    with pytest.raises(ZstdError):
        native.decompress_with_fallback("zstd", comp, zstd_decompress,
                                        prefer_native=True)


@_lz4
def test_lz4_native_byte_identical():
    for raw in _PAYLOADS:
        comp = frame_compress(raw)
        got = native.lz4_frame_decompress_native(comp)
        assert got == raw == frame_decompress(comp)
    comp = frame_compress(_PAYLOADS[2])
    assert native.decompress_with_fallback(
        "lz4", comp, frame_decompress, prefer_native=True) == _PAYLOADS[2]


@_lz4
def test_lz4_real_liblz4_frames_via_pyarrow():
    """Frames produced by the REAL liblz4 (pyarrow's lz4 frame codec)
    decode identically through the native path and the pure decoder."""
    import pyarrow as pa
    codec = pa.Codec("lz4")
    for raw in _PAYLOADS:
        comp = bytes(codec.compress(raw))
        assert native.lz4_frame_decompress_native(comp) == raw \
            == frame_decompress(comp)


@_lz4
def test_lz4_corrupt_falls_back_to_typed_error():
    from go_triton_spark.codec.lz4 import Lz4Error
    comp = bytearray(frame_compress(b"hello" * 1000))
    comp[9] ^= 0xFF
    with pytest.raises(Lz4Error):
        native.decompress_with_fallback("lz4", bytes(comp),
                                        frame_decompress,
                                        prefer_native=True)


def test_xz_native_byte_identical():
    for raw in _PAYLOADS:
        comp = lzma.compress(raw, format=lzma.FORMAT_XZ,
                             check=lzma.CHECK_CRC64)
        assert native.xz_decompress_native(comp) == raw \
            == xz_decompress(comp)


def test_xz_corrupt_falls_back_to_typed_error():
    from go_triton_spark.codec.xz import XzError
    comp = bytearray(lzma.compress(b"hello" * 1000,
                                   format=lzma.FORMAT_XZ))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(XzError):
        native.decompress_with_fallback("xz", bytes(comp), xz_decompress,
                                        prefer_native=True)


# ------------------------------------------------------- dispatch

@_webp
@_png
@_tiff
def test_parse_image_dispatch_with_env_flag(monkeypatch):
    """The env opt-in engages per-call (executors read it at decode
    time) and the dispatch output stays identical across formats."""
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "1")
    assert native.native_enabled()
    img = _img("grad", 21, 13)
    for data in (build_png(img), build_webp(img), build_tiff(img)):
        m = parse_image(data)
        assert np.array_equal(m["pixels"], img)
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "0")
    assert not native.native_enabled()


def test_flag_off_never_touches_native(monkeypatch):
    """With the flag explicitly off (the pure clean-room
    configuration the test suite pins in conftest.py), maybe_image
    must not even attempt a native decode."""
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "0")
    calls = []
    monkeypatch.setitem(native._IMAGE_DECODERS, "png",
                        lambda d: calls.append(1))
    assert native.maybe_image("png", b"\x89PNG\r\n\x1a\n") is None
    assert not calls


def test_flag_defaults_on_when_unset(monkeypatch):
    """r12: the production default is native ON — an unset env means
    enabled, and only an explicit falsy token ('0'/'false'/'no'/empty)
    forces the pure path. The kwarg still wins over the env in both
    directions."""
    monkeypatch.delenv("TRITON_NATIVE_DECODE", raising=False)
    assert native.native_enabled()
    assert not native.native_enabled(prefer_native=False)
    for tok in ("0", "false", "no", "", "  0  "):
        monkeypatch.setenv("TRITON_NATIVE_DECODE", tok)
        assert not native.native_enabled(), repr(tok)
        assert native.native_enabled(prefer_native=True), repr(tok)
    for tok in ("1", "true", "yes"):
        monkeypatch.setenv("TRITON_NATIVE_DECODE", tok)
        assert native.native_enabled(), repr(tok)


def test_native_status_shape():
    st = native.native_status()
    assert set(st) == {"enabled_by_env", "webp", "png", "tiff",
                       "jpeg_shim", "crc32c_shim", "zstd", "lz4", "xz"}


# ------------------------------------------------------------ crc32c

_crc = pytest.mark.skipif(not _ST.get("crc32c_shim"),
                          reason="crc shim unavailable (no gcc?)")


@_crc
def test_crc32c_shim_bit_identical():
    """The compiled slice-by-8 CRC32C (the .tri framing hot loop —
    measured ~99% of frame_decompress wall in pure Python) must match
    the table-driven pure implementation on every size class,
    including the unaligned-head and sub-8-byte tails."""
    from go_triton_spark.codec.snappy_codec import crc32c

    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 7, 8, 9, 15, 63, 255, 4096, 99991):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert native.crc32c_native(d) == crc32c(d), n
        # and on a misaligned view of the same buffer
        assert native.crc32c_native(d[1:]) == crc32c(d[1:]), n


@_crc
def test_tri_snappy_framing_native_crc_equal(monkeypatch):
    """frame_decompress output (and its loud checksum rejection) is
    identical with the native CRC engaged."""
    from go_triton_spark.codec.snappy_codec import SnappyError, \
        frame_compress, frame_decompress

    raw = b'{"doc": 1, "text": "quick brown fox"}\n' * 5000
    fr = frame_compress(raw)
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "1")
    assert frame_decompress(fr) == raw
    bad = bytearray(fr)
    bad[-10] ^= 0xFF                       # flip inside the last chunk
    with pytest.raises(SnappyError):
        frame_decompress(bytes(bad))
    monkeypatch.delenv("TRITON_NATIVE_DECODE")
    assert frame_decompress(fr) == raw


@_lz4
def test_lz4_concatenated_frames_agree_across_paths():
    """r10 find: the pure decoder used to stop at the first EndMark,
    silently dropping the tail of a concatenated shard AND diverging
    from liblz4 (which decodes all frames). Both paths now decode the
    whole stream, skip skippable frames, and reject trailing junk."""
    import struct as _s
    a, b = b"A" * 300, b"B" * 300
    two = frame_compress(a) + frame_compress(b)
    assert frame_decompress(two) == a + b
    assert native.lz4_frame_decompress_native(two) == a + b
    skip = _s.pack("<I", 0x184D2A50) + _s.pack("<I", 4) + b"meta"
    mix = frame_compress(a) + skip + frame_compress(b)
    assert frame_decompress(mix) == a + b
    assert native.lz4_frame_decompress_native(mix) == a + b
    from go_triton_spark.codec.lz4 import Lz4Error
    with pytest.raises(Lz4Error):
        frame_decompress(frame_compress(a) + b"junk")


@_zstd
def test_zstd_concatenated_frames_agree_across_paths():
    """Concatenated zstd frames: the native one-shot (sized for the
    FIRST frame only) must fall through to the streaming loop, not
    give up — output equal to the pure decoder."""
    import pyarrow as pa
    codec = pa.Codec("zstd")
    a, b = b"A" * 300, b"B" * 300
    two = bytes(codec.compress(a)) + bytes(codec.compress(b))
    assert zstd_decompress(two) == a + b
    assert native.zstd_decompress_native(two) == a + b


# ------------------------------------------------ property fuzz

from hypothesis import given, settings
from hypothesis import strategies as st


@_png
@_webp
@_tiff
@given(st.integers(1, 48), st.integers(1, 48), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_fuzz_image_native_equality(h, w, seed):
    """Random planes through every bit-identical format: the native
    path must agree with the pure decoders on pixels AND metadata for
    arbitrary content/dimensions, not just the fixture shapes."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for data, parse in ((build_png(img), parse_png),
                        (build_webp(img), parse_webp),
                        (build_tiff(img, compression="lzw"), parse_tiff)):
        _same_dict(parse(data), parse(data, prefer_native=True))


@_zstd
@_lz4
@given(st.binary(max_size=5000), st.integers(0, 3))
@settings(max_examples=40, deadline=None)
def test_fuzz_decompress_native_equality(payload, mode):
    """Arbitrary payloads through zstd/lz4/xz: native decompress of a
    valid frame equals the pure decoder byte-for-byte."""
    import pyarrow as pa
    if mode == 0:
        comp = bytes(pa.Codec("zstd").compress(payload))
        assert native.zstd_decompress_native(comp) == payload \
            == zstd_decompress(comp)
    elif mode == 1:
        comp = frame_compress(payload)
        assert native.lz4_frame_decompress_native(comp) == payload \
            == frame_decompress(comp)
    elif mode == 2:
        comp = bytes(pa.Codec("lz4").compress(payload))
        assert native.lz4_frame_decompress_native(comp) == payload \
            == frame_decompress(comp)
    else:
        comp = lzma.compress(payload, format=lzma.FORMAT_XZ)
        assert native.xz_decompress_native(comp) == payload \
            == xz_decompress(comp)


@given(st.binary(max_size=2000))
@settings(max_examples=60, deadline=None)
def test_fuzz_crc32c_native_equality(data):
    from go_triton_spark.codec.snappy_codec import crc32c
    if native.crc32c_native(b"") is None:
        pytest.skip("crc shim unavailable")
    assert native.crc32c_native(data) == crc32c(data)


# -------------------------------------------------------------- gif

_gifshim = pytest.mark.skipif(not _ST.get("crc32c_shim"),
                              reason="util shim unavailable (no gcc?)")


@_gifshim
def test_gif_native_lzw_bit_identical():
    """The compiled-shim GIF LZW (parse_gif's one hot loop — 24x on
    random planes) must agree with the pure decoder across palette
    sizes, interlace, KwKwK-heavy planes and table growth to 4096."""
    from go_triton_spark.codec.gif import build_gif, parse_gif

    rng = np.random.default_rng(9)
    for trial in range(12):
        h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
        kbits = int(rng.integers(2, 9))
        ncol = 1 << kbits
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = (rng.integers(0, ncol, (h, w)).astype(np.uint8)
               if trial % 2 else
               (np.add.outer(np.arange(h), np.arange(w)) % ncol)
               .astype(np.uint8))
        g = build_gif(idx, pal, interlace=bool(trial % 3 == 0))
        a = parse_gif(g)
        b = parse_gif(g, prefer_native=True)
        for k in ("pixels", "alpha"):
            assert np.array_equal(a[k], b[k]), (trial, k)
    # table growth through every width up to 4096 entries
    big = (np.arange(200 * 300) % 251).astype(np.uint8).reshape(200, 300)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    g = build_gif(big, pal)
    assert np.array_equal(parse_gif(g)["pixels"],
                          parse_gif(g, prefer_native=True)["pixels"])


@_gifshim
@given(st.binary(min_size=1, max_size=3000), st.integers(2, 8))
@settings(max_examples=50, deadline=None)
def test_fuzz_gif_lzw_native_equality(raw, mcs):
    """Round-trip fuzz on the raw LZW layer: shim decode of every
    encoder output equals the pure decode AND the source bytes."""
    from go_triton_spark.codec.gif import lzw_decode, lzw_encode

    data = bytes(b & ((1 << mcs) - 1) for b in raw)
    enc = lzw_encode(data, mcs)
    assert native.gif_lzw_decode_native(enc, mcs, len(data)) \
        == bytes(lzw_decode(enc, mcs, len(data))) == data


@_gifshim
def test_gif_corrupt_still_raises_with_flag_on(monkeypatch):
    from go_triton_spark.codec.gif import build_gif, parse_gif

    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (20, 20)).astype(np.uint8)
    g = build_gif(idx, pal)
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "1")
    with pytest.raises(ValueError):
        parse_gif(g[:-8])              # truncated LZW/trailer


# ------------------------------------------------ review-find pins

@_lz4
def test_lz4_truncated_frame_native_parity():
    """A frame cut mid-block must NOT come back as silent partial
    output from the native path (review find): the wrapper must land
    on the pure decoder's loud Lz4Error either way."""
    from go_triton_spark.codec.lz4 import Lz4Error
    comp = frame_compress(b"payload " * 5000)
    cut = comp[:len(comp) // 2]
    assert native.lz4_frame_decompress_native(cut) is None
    with pytest.raises(Lz4Error):
        native.decompress_with_fallback("lz4", cut, frame_decompress,
                                        prefer_native=True)
    assert native.lz4_frame_decompress_native(b"") is None


@_png
def test_png_color_management_falls_back_to_pure():
    """A gAMA chunk makes libpng's simplified API CONVERT samples
    toward sRGB; the pure parser returns raw samples — the native
    path must decline such files so flag on/off stays identical
    (review find)."""
    import struct as _s
    import zlib

    base = build_png(_img("grad", 12, 9))
    gama = _s.pack(">I", 45455)
    chunk = _s.pack(">I", 4) + b"gAMA" + gama \
        + _s.pack(">I", zlib.crc32(b"gAMA" + gama) & 0xFFFFFFFF)
    # insert right after IHDR (8-byte sig + 25-byte IHDR chunk)
    data = base[:33] + chunk + base[33:]
    assert native._png_has_color_management(data)
    assert native.decode_png_native(data) is None
    a = parse_png(data)
    b = parse_png(data, prefer_native=True)
    assert np.array_equal(a["pixels"], b["pixels"])


# ------------------------------------- accept-set parity guards (r11)
#
# The flag must never WIDEN the accept set: libtiff/libjpeg decode
# configurations the pure decoders loudly reject (orientation, tiles,
# planar, JPEG-in-TIFF, SOF1, arithmetic coding), so flag-on row/skip
# counts could diverge on wild inputs without these gates — the same
# divergence class the PNG color-management guard closes.

def _mini_tiff(extra_tags=()):
    """Header + one IFD with the baseline tag set (no pixel data —
    the gate reads only the IFD)."""
    import struct as s
    base = [(256, 3, 1, 4), (257, 3, 1, 4), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 8),
            (277, 3, 1, 1), (279, 4, 1, 16)]
    tags = {t[0]: t for t in base}
    for t in extra_tags:
        tags[t[0]] = t
    entries = sorted(tags.values())
    out = s.pack("<4sI", b"II*\x00", 8)
    out += s.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += s.pack("<HHII", tag, typ, cnt, val)
    out += s.pack("<I", 0)
    return out


def test_tiff_gate_accepts_pure_set_only():
    gate = native._tiff_pure_compatible
    assert gate(_mini_tiff())
    assert gate(_mini_tiff([(259, 3, 1, 5)]))          # LZW
    assert not gate(_mini_tiff([(259, 3, 1, 7)]))      # JPEG-in-TIFF
    assert not gate(_mini_tiff([(274, 3, 1, 6)]))      # Orientation
    assert not gate(_mini_tiff([(284, 3, 1, 2)]))      # planar
    assert not gate(_mini_tiff([(258, 3, 1, 16)]))     # 16-bit
    assert not gate(_mini_tiff([(266, 3, 1, 2)]))      # FillOrder lsb
    assert not gate(_mini_tiff([(339, 3, 1, 3)]))      # float samples
    # RGB with an extra (alpha) sample: pure ignores it, libtiff may
    # premultiply — must route pure
    assert not gate(_mini_tiff([(262, 3, 1, 2), (277, 3, 1, 4)]))
    assert gate(_mini_tiff([(262, 3, 1, 2), (277, 3, 1, 3),
                            (279, 4, 1, 48)]))   # 4x4 RGB strip size
    # strip-geometry twins of parse_tiff's loud checks (review find)
    assert not gate(_mini_tiff([(279, 4, 1, 20)])), "padded strip"
    assert not gate(_mini_tiff([(273, 4, 1, 1 << 20)])), "strip OOB"
    assert not gate(_mini_tiff([(257, 3, 1, 1),
                                (273, 3, 2, 8 | (16 << 16)),
                                (279, 3, 2, 4 | (4 << 16))])), \
        "more strips than rows"
    # strip COUNT must cover the image (r11 advice): 4 rows at
    # rows_per_strip=1 needs 4 strips — one strip of the right SIZE
    # passes the per-strip loop but parse_tiff's reshape raises, so
    # the gate must reject without leaning on libtiff's stopOnError
    assert not gate(_mini_tiff([(278, 3, 1, 1), (279, 4, 1, 4)])), \
        "too few strips"
    assert not gate(_mini_tiff([(278, 3, 1, 0)])), "rows_per_strip 0"
    # tiled (no strip offsets): drop tag 273
    import struct as s
    tiled = _mini_tiff()
    assert not gate(tiled.replace(
        s.pack("<HHII", 273, 4, 1, 8), s.pack("<HHII", 322, 3, 1, 16)))
    assert not gate(b"II*\x00")                        # truncated


def _sof_stream(sof_marker, precision=8, comps=((1, 0x11, 0),)):
    import struct as s
    cbytes = b"".join(bytes(c) for c in comps)
    seg = (bytes([0xFF, sof_marker])
           + s.pack(">H", 2 + 6 + len(cbytes)) + bytes([precision])
           + s.pack(">HH", 4, 4) + bytes([len(comps)]) + cbytes)
    return (b"\xff\xd8" + b"\xff\xe0" + b"\x00\x04\x00\x00"  # APP0
            + seg + b"\xff\xd9")


def test_jpeg_gate_accepts_pure_set_only():
    gate = native._jpeg_pure_compatible
    assert gate(_sof_stream(0xC0))
    assert gate(_sof_stream(0xC2))
    assert not gate(_sof_stream(0xC1)), "SOF1: libjpeg-only"
    assert not gate(_sof_stream(0xC9)), "arithmetic sequential"
    assert not gate(_sof_stream(0xCA)), "arithmetic progressive"
    assert not gate(_sof_stream(0xC3)), "lossless"
    assert not gate(_sof_stream(0xC0, precision=12)), "12-bit"
    assert not gate(b"\xff\xd8\xff\xd9"), "no SOF at all"
    # component-level divergences (review find): libjpeg decodes
    # these; parse_jpeg rejects them loudly
    four = ((1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0), (4, 0x11, 0))
    assert not gate(_sof_stream(0xC0, comps=four)), "4-component CMYK"
    assert not gate(_sof_stream(0xC0, comps=((1, 0x41, 0), (2, 0x11, 0),
                                             (3, 0x11, 0)))), "4x1"
    assert not gate(_sof_stream(0xC0, comps=((1, 0x13, 0), (2, 0x11, 0),
                                             (3, 0x11, 0)))), "1x3"
    assert gate(_sof_stream(0xC0, comps=((1, 0x22, 0), (2, 0x11, 0),
                                         (3, 0x11, 0)))), "4:2:0 ok"
    # real encoder output (baseline + progressive) passes the gate
    from go_triton_spark.codec.jpeg import build_jpeg
    assert gate(build_jpeg(_img("grad", 16, 16)))
    assert gate(build_jpeg(_img("grad", 16, 16), progressive=True))


@_tiff
def test_tiff_gate_no_regression_on_builder_output():
    for comp in ("none", "lzw", "deflate", "packbits"):
        data = build_tiff(_img("grad", 9, 7), compression=comp)
        assert native._tiff_pure_compatible(data)
        assert native.decode_tiff_native(data) is not None


@_jpeg
def test_jpeg_native_declines_what_pure_rejects():
    # gate-rejected stream: native returns None (pure path owns the
    # loud rejection) even though libjpeg could decode some of these
    assert native.decode_jpeg_native(_sof_stream(0xC1)) is None
    with pytest.raises(ValueError):
        parse_jpeg(_sof_stream(0xC1), prefer_native=True)


# ------------------------------------------------------- flac (r11)

import contextlib
import os as _os


@contextlib.contextmanager
def _flag_on():
    prev = _os.environ.get("TRITON_NATIVE_DECODE")
    _os.environ["TRITON_NATIVE_DECODE"] = "1"
    try:
        yield
    finally:
        if prev is None:
            _os.environ.pop("TRITON_NATIVE_DECODE", None)
        else:
            _os.environ["TRITON_NATIVE_DECODE"] = prev


@contextlib.contextmanager
def _flag_off():
    # explicit "0", not delenv: since r12 an UNSET env defaults ON
    prev = _os.environ.get("TRITON_NATIVE_DECODE")
    _os.environ["TRITON_NATIVE_DECODE"] = "0"
    try:
        yield
    finally:
        if prev is None:
            _os.environ.pop("TRITON_NATIVE_DECODE", None)
        else:
            _os.environ["TRITON_NATIVE_DECODE"] = prev


_flacsh = pytest.mark.skipif(not _ST.get("crc32c_shim"),
                             reason="compiled shim unavailable (no gcc?)")


@_flacsh
@pytest.mark.parametrize("sub", ["constant", "verbatim", "fixed1",
                                 "fixed2", "lpc2"])
def test_flac_bit_identical(sub):
    from go_triton_spark.codec.flac import build_flac, parse_flac
    rng = np.random.default_rng(11)
    s = (np.full((4099, 2), 7, np.int32) if sub == "constant" else
         rng.integers(-2000, 2000, (4099, 2)).astype(np.int32))
    data = build_flac(s, subframe=sub)
    pure = parse_flac(data)
    with _flag_on():
        nat = parse_flac(data)
    assert np.array_equal(pure["samples"], nat["samples"])
    for k in ("sample_rate", "n_channels", "bits_per_sample",
              "n_samples"):
        assert pure[k] == nat[k]


@_flacsh
def test_flac_corrupt_parity_and_crc16_twin():
    from go_triton_spark.codec import flac as fl
    rng = np.random.default_rng(7)
    data = fl.build_flac(
        rng.integers(-500, 500, (1024, 1)).astype(np.int32),
        subframe="lpc2")
    for cut in (40, len(data) // 2, len(data) - 2):
        errs = []
        for on in (False, True):
            ctx = _flag_on() if on else _flag_off()
            with ctx:
                try:
                    fl.parse_flac(data[:cut])
                    errs.append("ok")
                except ValueError as e:
                    errs.append(str(e))
        assert errs[0] == errs[1], (cut, errs)
    # crc16 shim twin over random buffers
    for n in (0, 1, 7, 4096, 70000):
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        want = 0
        for b in buf:
            want = ((want << 8) & 0xFFFF) ^ fl._CRC16_TABLE[(want >> 8) ^ b]
        assert native.crc16_8005_native(buf) == want


@_flacsh
def test_flac_bitflip_fuzz_parity():
    """Random single-byte corruptions: flag-on and flag-off must agree
    on accept/reject AND on the decoded samples when both accept."""
    from go_triton_spark.codec.flac import build_flac, parse_flac
    rng = np.random.default_rng(3)
    base = build_flac(rng.integers(-800, 800, (2048, 2)).astype(np.int32),
                      subframe="fixed2")
    for _ in range(40):
        b = bytearray(base)
        i = int(rng.integers(42, len(b)))   # past fLaC+STREAMINFO magic
        b[i] ^= int(rng.integers(1, 256))
        outcomes = []
        for on in (False, True):
            ctx = _flag_on() if on else _flag_off()
            with ctx:
                try:
                    outcomes.append(parse_flac(bytes(b))["samples"])
                except ValueError:
                    outcomes.append(None)
        if outcomes[0] is None or outcomes[1] is None:
            assert outcomes[0] is None and outcomes[1] is None, i
        else:
            assert np.array_equal(outcomes[0], outcomes[1]), i


# ------------------------------------------------------ adpcm (r11)

@_flacsh
def test_ima_adpcm_bit_identical_and_fuzz():
    from go_triton_spark.codec.adpcm import decode_ima
    rng = np.random.default_rng(4)
    for trial in range(20):
        n = int(rng.integers(0, 4000))
        nib = rng.integers(0, 16, n, dtype=np.uint8)
        pred = int(rng.integers(-32768, 32768))
        idx = int(rng.integers(0, 89))
        pure = decode_ima(nib, pred, idx)
        got = native.ima_decode_native(nib, pred, idx)
        assert got is not None and np.array_equal(pure, got), trial
        with _flag_on():
            flagged = decode_ima(nib, pred, idx)
        assert np.array_equal(pure, flagged), trial
    # out-of-range index: native declines, pure (and flag-on via the
    # block parser) still raises its typed error
    assert native.ima_decode_native(np.zeros(4, np.uint8), 0, 89) is None


# -------------------------------------------------------- qoi (r11)

@_flacsh
def test_qoi_bit_identical_and_corrupt_parity():
    from go_triton_spark.codec.qoi import build_qoi, parse_qoi
    rng = np.random.default_rng(9)
    for kind, h, w in (("noise", 31, 17), ("grad", 40, 40),
                       ("flat", 8, 64), ("noise", 1, 1)):
        img = _img(kind, h, w, seed=h)
        data = build_qoi(img)
        pure = parse_qoi(data)
        with _flag_on():
            nat = parse_qoi(data)
        _same_dict(pure, nat)
    # palette-ish content exercises INDEX/RUN ops heavily
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 4, (33, 29))]
    data = build_qoi(img)
    with _flag_on():
        _same_dict(parse_qoi(data), parse_qoi(data))
    # corruption: truncation + byte flips must raise identically
    for cut in (20, len(data) // 2, len(data) - 9):
        errs = []
        for on in (False, True):
            ctx = _flag_on() if on else _flag_off()
            with ctx:
                try:
                    parse_qoi(data[:cut] + data[-8:])  # keep end marker
                    errs.append("ok")
                except ValueError as e:
                    errs.append(str(e))
        assert errs[0] == errs[1], (cut, errs)


@_flacsh
def test_qoi_bitflip_fuzz_parity():
    from go_triton_spark.codec.qoi import build_qoi, parse_qoi
    rng = np.random.default_rng(12)
    base = build_qoi(_img("noise", 24, 24, seed=3))
    for _ in range(60):
        buf = bytearray(base)
        i = int(rng.integers(14, len(buf) - 8))
        buf[i] ^= int(rng.integers(1, 256))
        outcomes = []
        for on in (False, True):
            ctx = _flag_on() if on else _flag_off()
            with ctx:
                try:
                    outcomes.append(parse_qoi(bytes(buf))["pixels"])
                except ValueError:
                    outcomes.append(None)
        if outcomes[0] is None or outcomes[1] is None:
            assert outcomes[0] is None and outcomes[1] is None, i
        else:
            assert np.array_equal(outcomes[0], outcomes[1]), i


@_flacsh
def test_qoi_prefer_native_kwarg_wins_over_env(monkeypatch):
    """Explicit kwarg beats the env flag for QOI like every other
    image decoder (r11 review find: it was hardcoded env-only)."""
    from go_triton_spark.codec.image import parse_image
    from go_triton_spark.codec.qoi import build_qoi

    calls = []
    orig = native.qoi_decode_native
    monkeypatch.setattr(native, "qoi_decode_native",
                        lambda *a: (calls.append(1), orig(*a))[1])
    data = build_qoi(np.zeros((4, 4, 3), np.uint8))
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "1")
    parse_image(data, prefer_native=False)
    assert not calls, "explicit opt-out must bypass the native path"
    parse_image(data, prefer_native=True)
    assert calls
    monkeypatch.setenv("TRITON_NATIVE_DECODE", "0")
    calls.clear()
    parse_image(data)
    assert not calls, "env 0, no kwarg -> pure path"
