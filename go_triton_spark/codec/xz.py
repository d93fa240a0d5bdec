"""Pure-Python XZ / LZMA2 / LZMA decoder (public .xz format spec +
the LZMA specification shipped with 7-Zip/xz-utils).

`.jsonl.xz` wraps real public corpora (Wikipedia dumps, many
HuggingFace datasets); this decoder makes them first-class ingest
without a native binding, and because stdlib ``lzma`` (liblzma) IS in
this container, every decode path here is differentially validated
against the reference implementation.

Layers, all implemented:

- **LZMA** — the 11-bit adaptive binary range coder; literal coding
  with lc/lp contexts and matched-byte decoding after matches; the
  12-state machine; match/rep0-3 distance history with short-rep; the
  choice/low/mid/high length coder; position slots, 4 special-position
  reverse bit trees and the 4-bit align tree; direct bits for large
  distances; the 0xFFFFFFFF end marker.
- **LZMA2** — the chunked re-framing liblzma actually emits: control
  bytes, uncompressed chunks, per-chunk state/props/dict resets,
  known-size chunks (no in-chunk end markers).
- **XZ container** — stream header/footer magics and CRC32-checked
  stream flags, block headers (filter chain, optional size varints,
  header CRC32), block padding, integrity checks (None / CRC32 /
  CRC64-ECMA / SHA-256 — all four verified), the index (record count,
  unpadded/uncompressed size varints, CRC32) cross-checked against
  the decoded blocks, stream concatenation and 4-byte stream padding.

Only the LZMA2 filter (0x21) is supported in the chain; delta/BCJ
filters are NAMED loudly rather than mis-decoded. Malformed input
raises ``XzError`` (a ValueError) for the ingest corrupt-skip
contract.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

_XZ_MAGIC = b"\xfd7zXZ\x00"
_XZ_FOOTER_MAGIC = b"YZ"
_LZMA2_FILTER = 0x21
_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}    # none, crc32, crc64, sha256


class XzError(ValueError):
    """Raised on malformed XZ/LZMA input."""


# ------------------------------------------------------------------ crc64

def _make_crc64_table() -> list[int]:
    poly = 0xC96C5795D7870F42      # reflected ECMA-182
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC64_TABLE = _make_crc64_table()


def crc64(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFFFFFFFFFF
    tbl = _CRC64_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFFFFFFFFFF


# ----------------------------------------------------------- range coder

_K_TOP = 1 << 24
_M32 = 0xFFFFFFFF


class _RangeDecoder:
    """The LZMA binary range decoder (11-bit adaptive probabilities)."""

    __slots__ = ("data", "pos", "range", "code")

    def __init__(self, data: bytes) -> None:
        if len(data) < 5 or data[0] != 0:
            raise XzError("bad LZMA range-coder preamble")
        self.data = data
        self.range = _M32
        self.code = int.from_bytes(data[1:5], "big")
        self.pos = 5

    def _normalize(self) -> None:
        while self.range < _K_TOP:
            if self.pos >= len(self.data):
                raise XzError("LZMA stream truncated mid-decode")
            self.code = ((self.code << 8) | self.data[self.pos]) & _M32
            self.range = (self.range << 8) & _M32
            self.pos += 1

    def bit(self, probs: list[int], i: int) -> int:
        p = probs[i]
        bound = (self.range >> 11) * p
        if self.code < bound:
            self.range = bound
            probs[i] = p + ((2048 - p) >> 5)
            b = 0
        else:
            self.range -= bound
            self.code -= bound
            probs[i] = p - (p >> 5)
            b = 1
        if self.range < _K_TOP:
            self._normalize()
        return b

    def bittree(self, probs: list[int], nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.bit(probs, m)
        return m - (1 << nbits)

    def bittree_reverse(self, probs: list[int], base: int,
                        nbits: int) -> int:
        m = 1
        sym = 0
        for i in range(nbits):
            b = self.bit(probs, base + m)
            m = (m << 1) | b
            sym |= b << i
        return sym

    def direct_bits(self, nbits: int) -> int:
        res = 0
        for _ in range(nbits):
            self.range >>= 1
            self.code = (self.code - self.range) & _M32
            t = (0 - (self.code >> 31)) & _M32
            self.code = (self.code + (self.range & t)) & _M32
            if self.range < _K_TOP:
                self._normalize()
            res = (res << 1) | (t + 1) & _M32
            res &= _M32
        return res

    def finished(self) -> bool:
        return self.code == 0


class _LenDecoder:
    """choice / low[16][8] / mid[16][8] / high[256] length coder."""

    def __init__(self) -> None:
        self.choice = [1024, 1024]
        self.low = [[1024] * 8 for _ in range(16)]
        self.mid = [[1024] * 8 for _ in range(16)]
        self.high = [1024] * 256

    def decode(self, rc: _RangeDecoder, pos_state: int) -> int:
        if not rc.bit(self.choice, 0):
            return 2 + rc.bittree(self.low[pos_state], 3)
        if not rc.bit(self.choice, 1):
            return 10 + rc.bittree(self.mid[pos_state], 3)
        return 18 + rc.bittree(self.high, 8)


class _LzmaState:
    """All adaptive state of one LZMA stream (resettable for LZMA2)."""

    def __init__(self, lc: int, lp: int, pb: int) -> None:
        if lc > 8 or lp > 4 or pb > 4:
            raise XzError(f"illegal LZMA props lc={lc} lp={lp} pb={pb}")
        self.lc, self.lp, self.pb = lc, lp, pb
        self.reset()

    def reset(self) -> None:
        self.state = 0
        self.reps = [1, 1, 1, 1]     # actual distances (1-based)
        self.is_match = [[1024] * 16 for _ in range(12)]
        self.is_rep = [1024] * 12
        self.is_rep_g0 = [1024] * 12
        self.is_rep_g1 = [1024] * 12
        self.is_rep_g2 = [1024] * 12
        self.is_rep0_long = [[1024] * 16 for _ in range(12)]
        self.pos_slot = [[1024] * 64 for _ in range(4)]
        self.spec_pos = [1024] * 115
        self.align = [1024] * 16
        self.len_dec = _LenDecoder()
        self.rep_len_dec = _LenDecoder()
        self.literal = [1024] * (0x300 << (self.lc + self.lp))


def _parse_props_byte(b: int) -> tuple[int, int, int]:
    if b >= 9 * 5 * 5:
        raise XzError(f"illegal LZMA props byte {b}")
    lc = b % 9
    b //= 9
    return lc, b % 5, b // 5


def _lzma_decode_into(rc: _RangeDecoder, st: _LzmaState, out: bytearray,
                      limit: int | None) -> None:
    """Decode symbols until `limit` output bytes exist (LZMA2 chunk) or
    the end marker arrives (limit None, classic .lzma)."""
    pb_mask = (1 << st.pb) - 1
    lp_mask = (1 << st.lp) - 1
    lc = st.lc
    while limit is None or len(out) < limit:
        if limit is None and rc.finished():
            break
        state = st.state
        pos_state = len(out) & pb_mask
        if not rc.bit(st.is_match[state], pos_state):
            # literal
            prev = out[-1] if out else 0
            lit_state = ((len(out) & lp_mask) << lc) + (prev >> (8 - lc))
            probs = st.literal
            base = 0x300 * lit_state
            sym = 1
            if state >= 7:
                if st.reps[0] > len(out):
                    raise XzError("LZMA matched-literal before stream start")
                match_byte = out[-st.reps[0]]
                while sym < 0x100:
                    match_bit = (match_byte >> 7) & 1
                    match_byte = (match_byte << 1) & 0xFF
                    b = rc.bit(probs, base + ((1 + match_bit) << 8) + sym)
                    sym = (sym << 1) | b
                    if match_bit != b:
                        break
            while sym < 0x100:
                sym = (sym << 1) | rc.bit(probs, base + sym)
            out.append(sym & 0xFF)
            st.state = state - 3 if 4 <= state < 10 else \
                (0 if state < 4 else state - 6)
            continue
        if rc.bit(st.is_rep, state):
            # rep match
            if not rc.bit(st.is_rep_g0, state):
                if not rc.bit(st.is_rep0_long[state], pos_state):
                    # short rep: one byte at rep0
                    if st.reps[0] > len(out):
                        raise XzError("LZMA short-rep before stream start")
                    out.append(out[-st.reps[0]])
                    st.state = 9 if state < 7 else 11
                    continue
            else:
                if not rc.bit(st.is_rep_g1, state):
                    dist = st.reps[1]
                    st.reps[1] = st.reps[0]
                else:
                    if not rc.bit(st.is_rep_g2, state):
                        dist = st.reps[2]
                    else:
                        dist = st.reps[3]
                        st.reps[3] = st.reps[2]
                    st.reps[2] = st.reps[1]
                    st.reps[1] = st.reps[0]
                st.reps[0] = dist
            length = st.rep_len_dec.decode(rc, pos_state)
            st.state = 8 if state < 7 else 11
        else:
            # new match
            st.reps[3] = st.reps[2]
            st.reps[2] = st.reps[1]
            st.reps[1] = st.reps[0]
            length = st.len_dec.decode(rc, pos_state)
            slot = rc.bittree(st.pos_slot[min(length - 2, 3)], 6)
            if slot < 4:
                dist = slot
            else:
                ndirect = (slot >> 1) - 1
                dist = (2 | (slot & 1)) << ndirect
                if slot < 14:
                    dist += rc.bittree_reverse(
                        st.spec_pos, dist - slot - 1, ndirect)
                else:
                    dist += rc.direct_bits(ndirect - 4) << 4
                    dist += rc.bittree_reverse(st.align, 0, 4)
            if dist == _M32:               # end marker
                if limit is not None and len(out) != limit:
                    raise XzError("LZMA end marker before declared size")
                return
            st.reps[0] = dist + 1
            st.state = 7 if state < 7 else 10
        # copy the match
        d = st.reps[0]
        if d > len(out):
            raise XzError("LZMA match distance before stream start")
        if limit is not None and len(out) + length > limit:
            raise XzError("LZMA match overruns declared chunk size")
        if d >= length:
            start = len(out) - d
            out += out[start:start + length]
        else:
            for _ in range(length):
                out.append(out[-d])
    return


# ----------------------------------------------------------- XZ container

def _varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(9):
        if pos >= len(data):
            raise XzError("truncated XZ varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return v, pos
    raise XzError("overlong XZ varint")


def xz_decompress(buf: bytes) -> bytes:
    """Decode one or more concatenated .xz streams (with padding)."""
    out = bytearray()
    pos = 0
    while pos < len(buf):
        # stream padding between streams: 4-byte groups of zeros
        if buf[pos] == 0:
            pad = 0
            while pos < len(buf) and buf[pos] == 0:
                pos += 1
                pad += 1
            if pad % 4:
                raise XzError("XZ stream padding not 4-byte aligned")
            if pos >= len(buf):
                break
        pos = _decode_stream(buf, pos, out)
    return bytes(out)


def _decode_stream(buf: bytes, pos: int, out: bytearray) -> int:
    if pos + 12 > len(buf):
        raise XzError("truncated XZ stream header")
    if buf[pos:pos + 6] != _XZ_MAGIC:
        raise XzError("bad XZ stream header magic")
    flags = buf[pos + 6:pos + 8]
    (want,) = struct.unpack_from("<I", buf, pos + 8)
    if zlib.crc32(flags) != want:
        raise XzError("XZ stream flags CRC mismatch")
    if flags[0] != 0 or flags[1] & 0xF0:
        raise XzError("reserved XZ stream flag bits set")
    check_type = flags[1] & 0x0F
    if check_type not in _CHECK_SIZES:
        raise XzError(f"unsupported XZ check type {check_type}")
    check_size = _CHECK_SIZES[check_type]
    pos += 12

    records = []                      # (unpadded, uncompressed) observed
    while True:
        if pos >= len(buf):
            raise XzError("XZ stream missing index")
        if buf[pos] == 0x00:          # index indicator
            break
        pos, rec = _decode_block(buf, pos, out, check_type, check_size)
        records.append(rec)

    # index
    idx_start = pos
    pos += 1
    count, pos = _varint(buf, pos)
    if count != len(records):
        raise XzError("XZ index record count mismatch")
    for want_rec in records:
        unpadded, pos = _varint(buf, pos)
        uncomp, pos = _varint(buf, pos)
        if (unpadded, uncomp) != want_rec:
            raise XzError("XZ index record disagrees with block")
    while (pos - idx_start) % 4:
        if pos >= len(buf) or buf[pos] != 0:
            raise XzError("bad XZ index padding")
        pos += 1
    if pos + 4 > len(buf):
        raise XzError("truncated XZ index CRC")
    (want,) = struct.unpack_from("<I", buf, pos)
    if zlib.crc32(buf[idx_start:pos]) != want:
        raise XzError("XZ index CRC mismatch")
    pos += 4
    index_size = pos - idx_start

    # footer: crc32(backward_size + flags), backward size, flags, magic
    if pos + 12 > len(buf):
        raise XzError("truncated XZ stream footer")
    (want,) = struct.unpack_from("<I", buf, pos)
    if zlib.crc32(buf[pos + 4:pos + 10]) != want:
        raise XzError("XZ footer CRC mismatch")
    (backward,) = struct.unpack_from("<I", buf, pos + 4)
    if (backward + 1) * 4 != index_size:
        raise XzError("XZ footer backward size disagrees with index")
    if buf[pos + 8:pos + 10] != bytes(
            (0, check_type)) or buf[pos + 10:pos + 12] != _XZ_FOOTER_MAGIC:
        raise XzError("bad XZ stream footer")
    return pos + 12


def _decode_block(buf: bytes, pos: int, out: bytearray, check_type: int,
                  check_size: int) -> tuple[int, tuple[int, int]]:
    block_start = pos
    header_size = (buf[pos] + 1) * 4
    if pos + header_size > len(buf):
        raise XzError("truncated XZ block header")
    hdr = buf[pos:pos + header_size]
    (want,) = struct.unpack_from("<I", hdr, header_size - 4)
    if zlib.crc32(hdr[:header_size - 4]) != want:
        raise XzError("XZ block header CRC mismatch")
    bflags = hdr[1]
    n_filters = (bflags & 0x03) + 1
    if bflags & 0x3C:
        raise XzError("reserved XZ block flag bits set")
    p = 2
    comp_size = unc_size = None
    if bflags & 0x40:
        comp_size, p = _varint(hdr, p)
    if bflags & 0x80:
        unc_size, p = _varint(hdr, p)
    dict_size_byte = None
    for i in range(n_filters):
        fid, p = _varint(hdr, p)
        props_len, p = _varint(hdr, p)
        props = hdr[p:p + props_len]
        p += props_len
        if fid != _LZMA2_FILTER:
            raise XzError(f"unsupported XZ filter 0x{fid:02x} "
                          "(LZMA2 only; delta/BCJ are a named swap point)")
        if props_len != 1:
            raise XzError("bad LZMA2 filter props length")
        dict_size_byte = props[0]
    if dict_size_byte is None or dict_size_byte > 40:
        raise XzError("bad LZMA2 dictionary size byte")
    if any(hdr[p:header_size - 4]):
        raise XzError("nonzero XZ block header padding")

    pos += header_size
    data_start = pos
    before = len(out)
    # LZMA2 chunks are self-delimiting; decode then verify sizes
    chunk_end, decoded = _lzma2_scan_decode(buf, pos, out)
    pos = chunk_end
    actual_comp = pos - data_start
    if comp_size is not None and comp_size != actual_comp:
        raise XzError("XZ block compressed size mismatch")
    if unc_size is not None and unc_size != len(out) - before:
        raise XzError("XZ block uncompressed size mismatch")
    while (pos - block_start) % 4:
        if pos >= len(buf) or buf[pos] != 0:
            raise XzError("bad XZ block padding")
        pos += 1
    body = bytes(out[before:])
    if check_size:
        chk = buf[pos:pos + check_size]
        if len(chk) != check_size:
            raise XzError("truncated XZ block check")
        if check_type == 1 and zlib.crc32(body) != \
                int.from_bytes(chk, "little"):
            raise XzError("XZ block CRC32 mismatch")
        if check_type == 4 and crc64(body) != \
                int.from_bytes(chk, "little"):
            raise XzError("XZ block CRC64 mismatch")
        if check_type == 10 and hashlib.sha256(body).digest() != chk:
            raise XzError("XZ block SHA-256 mismatch")
        pos += check_size
    unpadded = (data_start - block_start) + actual_comp + check_size
    return pos, (unpadded, len(body))


def _lzma2_scan_decode(buf: bytes, pos: int,
                       out: bytearray) -> tuple[int, int]:
    """Walk LZMA2 chunks in-place (they're self-delimiting), decoding
    into `out`; returns (position after the 0x00 terminator, n_bytes).

    Decoding runs against ``dict_buf`` — the output SINCE THE LAST
    DICTIONARY RESET — never against the global ``out``: pos_state,
    the previous-byte literal context, and match-distance bounds are
    all defined relative to the dictionary, so sharing the global
    buffer would make concatenated streams / multi-block files decode
    against data an encoder's fresh dictionary never saw (valid
    ``xz -T`` output would fail; some corrupt input would pass).
    Every block's first chunk must itself reset the dictionary, as
    liblzma requires.
    """
    before = len(out)
    st: _LzmaState | None = None
    dict_buf = bytearray()        # output since the last dict reset
    dict_live = False             # has any dict reset happened yet?
    state_live = False            # is the LZMA state continuable?
    while True:
        if pos >= len(buf):
            raise XzError("LZMA2 stream missing end-of-stream control")
        ctrl = buf[pos]
        pos += 1
        if ctrl == 0x00:
            break
        if ctrl in (0x01, 0x02):
            if ctrl == 0x01:              # dict reset
                out += dict_buf
                dict_buf = bytearray()
                dict_live = True
            elif not dict_live:
                raise XzError("LZMA2 first chunk does not reset dict")
            if pos + 2 > len(buf):
                raise XzError("truncated LZMA2 uncompressed-chunk size")
            size = ((buf[pos] << 8) | buf[pos + 1]) + 1
            pos += 2
            if pos + size > len(buf):
                raise XzError("LZMA2 uncompressed chunk overruns input")
            dict_buf += buf[pos:pos + size]
            pos += size
            state_live = False   # uncompressed data invalidates state
            continue
        if ctrl < 0x80:
            raise XzError(f"reserved LZMA2 control byte 0x{ctrl:02x}")
        if pos + 4 > len(buf):
            raise XzError("truncated LZMA2 chunk header")
        unpacked = (((ctrl & 0x1F) << 16)
                    | (buf[pos] << 8) | buf[pos + 1]) + 1
        packed = ((buf[pos + 2] << 8) | buf[pos + 3]) + 1
        pos += 4
        reset = (ctrl >> 5) & 0x03
        if reset == 3:                    # props + state + dict reset
            out += dict_buf
            dict_buf = bytearray()
            dict_live = True
        elif not dict_live:
            raise XzError("LZMA2 first chunk does not reset dict")
        if reset >= 2:
            if pos >= len(buf):
                raise XzError("truncated LZMA2 props byte")
            lc, lp, pb = _parse_props_byte(buf[pos])
            pos += 1
            st = _LzmaState(lc, lp, pb)
        elif reset == 1:
            if st is None:
                raise XzError("LZMA2 state reset before any props")
            st.reset()
        elif st is None or not state_live:
            raise XzError("LZMA2 chunk continues invalid state")
        state_live = True
        if pos + packed > len(buf):
            raise XzError("LZMA2 chunk overruns input")
        rc = _RangeDecoder(buf[pos:pos + packed])
        _lzma_decode_into(rc, st, dict_buf, len(dict_buf) + unpacked)
        if rc.pos != packed:
            raise XzError("LZMA2 chunk did not consume its packed size")
        if not rc.finished():
            # known-size chunks have no in-stream end marker; the
            # range coder's flush leaves code == 0 iff the packed
            # bytes are the true encoder output (liblzma's
            # rc_is_finished) — without this, a flipped final byte
            # can decode "cleanly"
            raise XzError("LZMA2 range coder not flushed at chunk end")
        pos += packed
    out += dict_buf
    return pos, len(out) - before
