"""codec/warc.py: WARC/1.0 shard parsing (Common Crawl layout),
golden-gated. Goldens are HAND-ASSEMBLED byte strings from the public
ISO 28500 grammar — header blocks and gzip members written out
explicitly, byte sequences build_warc never produced — so the parser
is pinned to the spec, then the builder is pinned to the parser by
roundtrip and mutation properties (same strategy as every codec
suite here)."""

import gzip

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_triton_spark.codec.warc import build_warc, parse_warc


def _hand_record(body: bytes, uri: str | None = "https://x.y/z",
                 wtype: str = "response", extra: str = "") -> bytes:
    hdr = "WARC/1.0\r\n"
    hdr += f"WARC-Type: {wtype}\r\n"
    if uri:
        hdr += f"WARC-Target-URI: {uri}\r\n"
    hdr += "WARC-Record-ID: <urn:uuid:hand-1>\r\n"
    hdr += "WARC-Date: 2024-02-02T00:00:00Z\r\n"
    hdr += f"Content-Length: {len(body)}\r\n"
    hdr += extra
    return hdr.encode() + b"\r\n" + body + b"\r\n\r\n"


def test_hand_assembled_plain_and_gzip_goldens():
    rec = _hand_record(b"hello world")
    out = parse_warc(rec)
    assert len(out) == 1
    assert out[0]["payload"] == b"hello world"
    assert out[0]["uri"] == "https://x.y/z"
    # Common Crawl layout: one gzip MEMBER per record, concatenated
    two = gzip.compress(rec) + gzip.compress(
        _hand_record(b"x" * 40, uri=None, wtype="warcinfo"))
    out = parse_warc(two)
    assert [r["type"] for r in out] == ["response", "warcinfo"]
    assert out[1]["uri"] is None and len(out[1]["payload"]) == 40


def test_extra_headers_carried_and_binary_payload():
    rec = _hand_record(bytes(range(256)),
                       extra="Content-Type: application/http\r\n")
    out = parse_warc(rec)
    assert out[0]["headers"]["Content-Type"] == "application/http"
    assert out[0]["payload"] == bytes(range(256))


def test_warc_1_1_accepted():
    """WARC/1.1 (current ISO 28500, modern wget/warcio output) frames
    records identically — must parse, while other versions still fail
    (round-7 advisory)."""
    rec = _hand_record(b"payload-bytes")
    rec11 = rec.replace(b"WARC/1.0", b"WARC/1.1", 1)
    out = parse_warc(rec11)
    assert len(out) == 1 and out[0]["payload"] == b"payload-bytes"
    for bad in (b"WARC/1.2", b"WARC/0.9", b"WARC/2.0"):
        with pytest.raises(ValueError, match="bad WARC version"):
            parse_warc(rec.replace(b"WARC/1.0", bad, 1))


def test_malformations_rejected():
    with pytest.raises(ValueError, match="empty"):
        parse_warc(b"")
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"WARC/2.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    rec = _hand_record(b"abc")
    # content-length lies short -> trailer check fires
    bad = rec.replace(b"Content-Length: 3", b"Content-Length: 2")
    with pytest.raises(ValueError, match="drift|trailer"):
        parse_warc(bad)
    # mandatory header dropped
    bad = rec.replace(b"WARC-Date: 2024-02-02T00:00:00Z\r\n", b"")
    with pytest.raises(ValueError, match="WARC-Date"):
        parse_warc(bad)
    # truncated payload
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(rec[:-5])
    # corrupt gzip member
    g = bytearray(gzip.compress(rec))
    g[12] ^= 0xFF
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(bytes(g))


def test_mid_member_truncation_always_rejected():
    data = build_warc([{"type": "response", "uri": "https://a/b",
                        "payload": "q" * 50}])
    for cut in range(1, len(data)):
        with pytest.raises(ValueError):
            parse_warc(data[:cut])


@given(st.integers(0, 10**6), st.integers(1, 6), st.booleans())
@settings(max_examples=50, deadline=None)
def test_roundtrip_property(seed, n, gzipped):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        body = bytes(rng.integers(0, 256, int(rng.integers(0, 300)),
                                  dtype=np.uint8))
        recs.append({"type": "response" if i % 2 else "request",
                     "uri": f"https://h{i}.example/p",
                     "payload": body})
    out = parse_warc(build_warc(recs, gzipped=gzipped))
    assert len(out) == n
    for got, want in zip(out, recs):
        assert got["payload"] == want["payload"]
        assert got["uri"] == want["uri"]
        assert got["type"] == want["type"]


@given(st.integers(0, 3000), st.integers(0, 255))
@settings(max_examples=80, deadline=None)
def test_byte_flip_fuzz_never_crashes(pos, val):
    data = bytearray(build_warc(
        [{"type": "response", "uri": "https://a/b", "payload": "z" * 90},
         {"type": "metadata", "payload": b"k: v"}]))
    data[pos % len(data)] = val
    try:
        out = parse_warc(bytes(data))
        assert out  # decoded something structurally valid
    except ValueError:
        pass
