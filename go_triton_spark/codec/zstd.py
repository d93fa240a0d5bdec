"""Pure-Python zstd decoder (RFC 8878) + raw-block frame writer.

Zstandard is THE shard compression of public LLM corpora (`.jsonl.zst`
in The Pile, Dolma, RedPajama, most of HuggingFace's large text drops).
No zstd binding ships in this container, so the full decode side of
RFC 8878 is implemented here from the spec:

- frame layer: magic, frame-header descriptor (content-size field in
  all four widths, single-segment, window descriptor), skippable
  frames, concatenated frames, xxHash64-low32 content checksum;
- block layer: raw / RLE / compressed, last-block flag, size caps;
- literals: raw, RLE, Huffman-compressed (single-stream and
  four-stream with jump table) and treeless (table reuse across
  blocks), with the Huffman table described either as direct 4-bit
  weights or as an FSE-compressed weight stream decoded with two
  interleaved states;
- FSE: the variable-bit table-description header (§4.1.1 low-bit
  threshold coding with zero-repeat flags), table construction from
  normalized probabilities including the less-than-one slots, and
  backward-bitstream state machines;
- sequences: the three interleaved FSE streams (predefined / RLE /
  FSE-described / repeat modes for literal-length, offset and
  match-length codes), baseline+extra-bit value tables, the
  three-entry repeat-offset history with the literals-length-zero
  index shift, and sequence execution with overlapping matches.

The ENCODER here emits raw-block frames only (legal per the spec —
every shard reader accepts them; entropy-coded corpora for the tests
and the driver gate come from the REAL libzstd bundled in pyarrow,
making every decode differentially validated against the reference
implementation). Malformed input raises ``ZstdError``.
"""

from __future__ import annotations

import struct

from go_triton_spark.codec.lz4 import xxh32  # noqa: F401  (xxh family)

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F
_MAX_OUT = 1 << 31


class ZstdError(ValueError):
    """Raised on malformed zstd input."""


# ----------------------------------------------------------------- xxh64

_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 per the public spec; zstd stores its low 32 bits."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        limit = n - 32
        while pos <= limit:
            a, b, c, d = struct.unpack_from("<4Q", data, pos)
            v1 = _round64(v1, a)
            v2 = _round64(v2, b)
            v3 = _round64(v3, c)
            v4 = _round64(v4, d)
            pos += 32
        acc = (_rotl64(v1, 1) + _rotl64(v2, 7)
               + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ _round64(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        acc = (seed + _P64_5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc = ((_rotl64(acc ^ _round64(0, lane), 27) * _P64_1)
               + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = ((_rotl64(acc ^ (lane * _P64_1) & _M64, 23) * _P64_2)
               + _P64_3) & _M64
        pos += 4
    while pos < n:
        acc = (_rotl64(acc ^ (data[pos] * _P64_5) & _M64, 11)
               * _P64_1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P64_2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P64_3) & _M64
    acc ^= acc >> 32
    return acc


# ----------------------------------------------- bitstreams (two kinds)

class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ZstdError("FSE table description overruns its data")
        out = 0
        got = 0
        pos = self.bitpos
        while got < n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n - got)
            out |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.bitpos = end
        return out

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) >> 3


class _BackwardBits:
    """Backward reader: starts below the padding sentinel bit of the
    LAST byte and yields bit groups top-down (RFC 8878 §3.1.1.3.2.1.1
    and every FSE/Huffman payload).

    Implemented as a small sliding accumulator refilled byte-by-byte
    from the tail — NOT one big int over the whole stream, whose
    per-read shifts are O(stream) and make Huffman decode quadratic
    (measured: 0.5 MB/s -> the accumulator restores linearity)."""

    __slots__ = ("data", "bpos", "acc", "nb")

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ZstdError("backward bitstream missing padding sentinel")
        self.data = data
        self.bpos = len(data) - 1        # count of bytes not yet pulled
        last = data[-1]
        self.nb = last.bit_length() - 1  # strip the sentinel bit
        self.acc = last & ((1 << self.nb) - 1)

    @property
    def pos(self) -> int:
        """Total unread bits (exhaustion checks)."""
        return self.nb + 8 * self.bpos

    def _refill(self, need: int) -> None:
        while self.nb < need and self.bpos > 0:
            self.bpos -= 1
            self.acc = (self.acc << 8) | self.data[self.bpos]
            self.nb += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nb < n:
            self._refill(n)
            if n > self.nb:
                raise ZstdError("backward bitstream exhausted")
        self.nb -= n
        v = self.acc >> self.nb
        self.acc &= (1 << self.nb) - 1
        return v

    def peek_padded(self, n: int) -> int:
        """Read n bits, zero-padding past the start (Huffman tail)."""
        if self.nb < n:
            self._refill(n)
        if n <= self.nb:
            return self.acc >> (self.nb - n)
        return self.acc << (n - self.nb)

    def consume(self, n: int) -> None:
        if self.nb < n:
            self._refill(n)
            if n > self.nb:
                raise ZstdError("backward bitstream exhausted")
        self.nb -= n
        self.acc &= (1 << self.nb) - 1


# ------------------------------------------------------------------ FSE

def _fse_read_distribution(fb: _ForwardBits,
                           max_accuracy: int) -> tuple[list[int], int]:
    """§4.1.1 table description -> (normalized probs, accuracy_log)."""
    accuracy_log = fb.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ZstdError(f"FSE accuracy log {accuracy_log} over cap")
    remaining = (1 << accuracy_log) + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > 255:
            raise ZstdError("FSE distribution lists too many symbols")
        bits = remaining.bit_length()
        val = fb.read(bits - 1)
        thresh = (1 << bits) - 1 - remaining
        if val < thresh:
            pass                       # small value: bits-1 were enough
        else:
            val |= fb.read(1) << (bits - 1)
            if val >= (1 << (bits - 1)):
                val -= thresh
        prob = val - 1
        probs.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            while True:
                repeat = fb.read(2)
                probs.extend([0] * repeat)
                if repeat != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return probs, accuracy_log


def _fse_build_table(probs: list[int],
                     accuracy_log: int) -> list[tuple[int, int, int]]:
    """Normalized probs -> decode table of (symbol, nb_bits, base)."""
    size = 1 << accuracy_log
    symbols = [0] * size
    # less-than-one symbols take the highest cells, one each
    high = size
    for s, p in enumerate(probs):
        if p == -1:
            high -= 1
            symbols[high] = s
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos >= high:           # skip the -1 cells
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE table spread did not complete")
    nxt = [1 if p == -1 else p for p in probs]
    table = []
    for cell in range(size):
        s = symbols[cell]
        state = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (state.bit_length() - 1)
        table.append((s, nb, (state << nb) - size))
    return table


class _FseState:
    def __init__(self, table: list[tuple[int, int, int]],
                 accuracy_log: int, bits: _BackwardBits) -> None:
        self.table = table
        self.state = bits.read(accuracy_log)

    @property
    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _BackwardBits) -> None:
        _, nb, base = self.table[self.state]
        self.state = base + bits.read(nb)


def _rle_table(symbol: int) -> list[tuple[int, int, int]]:
    """A 1-cell, 0-accuracy 'table': always that symbol, 0-bit update."""
    return [(symbol, 0, 0)]


# -------------------------------------------------------------- Huffman

def _huffman_table_from_weights(
        weights: list[int]) -> tuple[list[tuple[int, int]], int]:
    """Weights (last one implicit, supplied) -> flat peek table."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("Huffman weights are all zero")
    max_bits = (total - 1).bit_length()
    if (1 << max_bits) == total:          # already a power of two: the
        max_bits += 1                     # implicit symbol still fits
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("Huffman weights don't complete a power of two")
    weights = weights + [left.bit_length()]  # implicit last weight
    if max_bits > 11:
        raise ZstdError("Huffman code length over the format's 11 cap")
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            span = 1 << (w - 1)
            nb = max_bits + 1 - w
            for i in range(pos, pos + span):
                table[i] = (sym, nb)
            pos += span
    if pos != len(table):
        raise ZstdError("Huffman table not fully populated")
    return table, max_bits


def _read_huffman_description(
        data: bytes) -> tuple[list[tuple[int, int]], int, int]:
    """Huffman tree description -> (table, max_bits, bytes consumed)."""
    if not data:
        raise ZstdError("missing Huffman tree description")
    hdr = data[0]
    if hdr >= 128:
        n = hdr - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(data):
            raise ZstdError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            byte = data[1 + (i >> 1)]
            weights.append((byte >> 4) if i % 2 == 0 else (byte & 0x0F))
        consumed = 1 + nbytes
    else:
        if 1 + hdr > len(data):
            raise ZstdError("truncated FSE-compressed Huffman weights")
        payload = data[1:1 + hdr]
        fb = _ForwardBits(payload)
        probs, al = _fse_read_distribution(fb, max_accuracy=6)
        table = _fse_build_table(probs, al)
        rest = payload[fb.bytes_consumed():]
        bits = _BackwardBits(rest)
        even = _FseState(table, al, bits)
        odd = _FseState(table, al, bits)
        weights = []
        while True:
            if len(weights) > 254:
                raise ZstdError("runaway Huffman weight stream")
            weights.append(even.symbol)
            nb = table[even.state][1]
            if nb > bits.pos:
                weights.append(odd.symbol)
                break
            even.update(bits)
            weights.append(odd.symbol)
            nb = table[odd.state][1]
            if nb > bits.pos:
                weights.append(even.symbol)
                break
            odd.update(bits)
        consumed = 1 + hdr
    if any(w > 11 for w in weights):
        raise ZstdError("Huffman weight over 11")
    table, max_bits = _huffman_table_from_weights(weights)
    return table, max_bits, consumed


def _huffman_decode_stream(table: list[tuple[int, int]], max_bits: int,
                           data: bytes, regen: int) -> bytearray:
    bits = _BackwardBits(data)
    out = bytearray()
    while len(out) < regen:
        sym, nb = table[bits.peek_padded(max_bits)]
        if nb > bits.pos:
            raise ZstdError("Huffman stream exhausted early")
        bits.consume(nb)
        out.append(sym)
    return out


# ------------------------------------------------------------ sequences

# Literals-length code -> (baseline, extra bits)   [RFC 8878 §3.1.1.3.2.1.3]
_LL_TABLE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
# Match-length code -> (baseline, extra bits)
_ML_TABLE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

# Predefined FSE distributions [RFC 8878 §3.1.1.3.2.2]
_LL_DEFAULT = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1], 6)
_ML_DEFAULT = ([1, 4, 3, 2, 2, 2, 2, 2, 2] + [1] * 37 + [-1] * 7, 6)
_OF_DEFAULT = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], 5)

_MAX_AL = {"ll": 9, "of": 8, "ml": 9}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


class _FrameContext:
    """Decode state that persists across blocks within one frame."""

    def __init__(self) -> None:
        self.huffman: tuple | None = None          # (table, max_bits)
        self.fse: dict = {"ll": None, "of": None, "ml": None}
        self.rep = [1, 4, 8]


def _read_seq_table(kind: str, mode: int, data: bytes, pos: int,
                    ctx: _FrameContext) -> tuple[tuple, int]:
    """Resolve one of the three sequence tables per its 2-bit mode.
    Returns ((table, accuracy_log), new_pos)."""
    if mode == 0:                                   # predefined
        probs, al = _DEFAULTS[kind]
        return (_fse_build_table(probs, al), al), pos
    if mode == 1:                                   # RLE: 1-byte symbol
        if pos >= len(data):
            raise ZstdError("truncated RLE sequence table")
        sym = data[pos]
        if sym > _MAX_SYM[kind]:
            raise ZstdError(f"{kind} RLE symbol {sym} out of range")
        return (_rle_table(sym), 0), pos + 1
    if mode == 2:                                   # FSE-described
        fb = _ForwardBits(data[pos:])
        probs, al = _fse_read_distribution(fb, _MAX_AL[kind])
        if len(probs) - 1 > _MAX_SYM[kind]:
            raise ZstdError(f"{kind} FSE table lists too many symbols")
        return (_fse_build_table(probs, al), al), pos + fb.bytes_consumed()
    # mode 3: repeat
    prev = ctx.fse[kind]
    if prev is None:
        raise ZstdError(f"{kind} repeat mode with no previous table")
    return prev, pos


def _decode_literals(block: bytes, ctx: _FrameContext,
                     block_max: int) -> tuple[bytearray, int]:
    """Literals section -> (literals, bytes consumed from block)."""
    if not block:
        raise ZstdError("empty compressed block")
    b0 = block[0]
    lit_type = b0 & 0x03
    if lit_type in (0, 1):                          # raw / RLE
        if (b0 >> 2) & 1 == 0:
            regen = b0 >> 3
            hdr = 1
        elif (b0 >> 2) & 3 == 1:
            if len(block) < 2:
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            if len(block) < 3:
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if regen > block_max:
            raise ZstdError("literals exceed block size cap")
        if lit_type == 0:
            if hdr + regen > len(block):
                raise ZstdError("raw literals overrun block")
            return bytearray(block[hdr:hdr + regen]), hdr + regen
        if hdr >= len(block):
            raise ZstdError("RLE literals missing byte")
        return bytearray(block[hdr:hdr + 1] * regen), hdr + 1
    # compressed (2) / treeless (3)
    sf = (b0 >> 2) & 3
    if sf == 0:
        if len(block) < 3:
            raise ZstdError("truncated literals header")
        v = int.from_bytes(block[:3], "little") >> 4
        regen, comp, hdr, streams = v & 0x3FF, v >> 10, 3, 1
    elif sf == 1:
        if len(block) < 3:
            raise ZstdError("truncated literals header")
        v = int.from_bytes(block[:3], "little") >> 4
        regen, comp, hdr, streams = v & 0x3FF, v >> 10, 3, 4
    elif sf == 2:
        if len(block) < 4:
            raise ZstdError("truncated literals header")
        v = int.from_bytes(block[:4], "little") >> 4
        regen, comp, hdr, streams = v & 0x3FFF, v >> 14, 4, 4
    else:
        if len(block) < 5:
            raise ZstdError("truncated literals header")
        v = int.from_bytes(block[:5], "little") >> 4
        regen, comp, hdr, streams = v & 0x3FFFF, v >> 18, 5, 4
    if regen > block_max:
        raise ZstdError("literals exceed block size cap")
    if hdr + comp > len(block):
        raise ZstdError("compressed literals overrun block")
    body = block[hdr:hdr + comp]
    if lit_type == 2:
        table, max_bits, used = _read_huffman_description(body)
        ctx.huffman = (table, max_bits)
        body = body[used:]
    else:
        if ctx.huffman is None:
            raise ZstdError("treeless literals with no previous table")
        table, max_bits = ctx.huffman
    if streams == 1:
        lits = _huffman_decode_stream(table, max_bits, body, regen)
    else:
        if len(body) < 6:
            raise ZstdError("missing 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<3H", body, 0)
        parts = []
        off = 6
        for sz in (s1, s2, s3):
            if off + sz > len(body):
                raise ZstdError("jump table overruns literal streams")
            parts.append(body[off:off + sz])
            off += sz
        parts.append(body[off:])
        per = (regen + 3) // 4
        sizes = [per, per, per, regen - 3 * per]
        if sizes[3] < 0:
            raise ZstdError("negative fourth-stream size")
        lits = bytearray()
        for part, want in zip(parts, sizes):
            lits += _huffman_decode_stream(table, max_bits, part, want)
    if len(lits) != regen:
        raise ZstdError("literal stream produced wrong count")
    return lits, hdr + comp


def _decode_sequences(data: bytes, ctx: _FrameContext,
                      literals: bytearray, out: bytearray,
                      window: int) -> None:
    """Sequences section: parse, run the 3 FSE streams, execute."""
    if not data:
        raise ZstdError("missing sequences section")
    b0 = data[0]
    if b0 == 0:
        out += literals
        return
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        if len(data) < 2:
            raise ZstdError("truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) | data[1], 2
    else:
        if len(data) < 3:
            raise ZstdError("truncated sequence count")
        nseq, pos = data[1] | (data[2] << 8) | 0x7F00, 3
    if pos >= len(data):
        raise ZstdError("missing symbol-compression-modes byte")
    modes = data[pos]
    pos += 1
    if modes & 0x03:
        raise ZstdError("reserved sequence-mode bits set")
    ll_tab, pos = _read_seq_table("ll", (modes >> 6) & 3, data, pos, ctx)
    of_tab, pos = _read_seq_table("of", (modes >> 4) & 3, data, pos, ctx)
    ml_tab, pos = _read_seq_table("ml", (modes >> 2) & 3, data, pos, ctx)
    ctx.fse["ll"], ctx.fse["of"], ctx.fse["ml"] = ll_tab, of_tab, ml_tab

    bits = _BackwardBits(data[pos:])
    ll_st = _FseState(ll_tab[0], ll_tab[1], bits)
    of_st = _FseState(of_tab[0], of_tab[1], bits)
    ml_st = _FseState(ml_tab[0], ml_tab[1], bits)

    lit_pos = 0
    for i in range(nseq):
        of_code = of_st.symbol
        if of_code > 31:
            raise ZstdError("offset code out of range")
        of_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_st.symbol
        if ml_code > 52:
            raise ZstdError("match-length code out of range")
        ml_base, ml_extra = _ML_TABLE[ml_code]
        match_len = ml_base + bits.read(ml_extra)
        ll_code = ll_st.symbol
        if ll_code > 35:
            raise ZstdError("literals-length code out of range")
        ll_base, ll_extra = _LL_TABLE[ll_code]
        lit_len = ll_base + bits.read(ll_extra)

        # repeat-offset resolution (§3.1.1.5)
        rep = ctx.rep
        if of_value > 3:
            offset = of_value - 3
            ctx.rep = [offset, rep[0], rep[1]]
        else:
            idx = of_value + (1 if lit_len == 0 else 0)
            if idx == 1:
                offset = rep[0]
            elif idx == 2:
                offset = rep[1]
                ctx.rep = [offset, rep[0], rep[2]]
            elif idx == 3:
                offset = rep[2]
                ctx.rep = [offset, rep[0], rep[1]]
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                ctx.rep = [offset, rep[0], rep[1]]

        if lit_pos + lit_len > len(literals):
            raise ZstdError("sequence consumes more literals than exist")
        out += literals[lit_pos:lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out) or offset > window:
            raise ZstdError("match offset outside decoded window")
        if len(out) + match_len > _MAX_OUT:
            raise ZstdError("decoded output exceeds size bound")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start:start + match_len]
        else:
            for j in range(match_len):
                out.append(out[start + j])

        if i + 1 < nseq:
            ll_st.update(bits)
            ml_st.update(bits)
            of_st.update(bits)
    if bits.pos != 0:
        raise ZstdError("sequence bitstream not fully consumed")
    out += literals[lit_pos:]


# ------------------------------------------------------------ frame API

def decompress(buf: bytes) -> bytes:
    """Decode a concatenation of zstd frames (skippables skipped)."""
    out = bytearray()
    pos = 0
    while pos < len(buf):
        pos = _decode_one_frame(buf, pos, out)
    return bytes(out)


def _decode_one_frame(buf: bytes, pos: int, out: bytearray) -> int:
    if pos + 4 > len(buf):
        raise ZstdError("truncated frame magic")
    (magic,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
        if pos + 4 > len(buf):
            raise ZstdError("truncated skippable frame")
        (size,) = struct.unpack_from("<I", buf, pos)
        if pos + 4 + size > len(buf):
            raise ZstdError("skippable frame overruns input")
        return pos + 4 + size
    if magic != _MAGIC:
        raise ZstdError(f"bad zstd magic 0x{magic:08x}")
    if pos >= len(buf):
        raise ZstdError("truncated frame header")
    fhd = buf[pos]
    pos += 1
    fcs_flag = fhd >> 6
    single_segment = bool((fhd >> 5) & 1)
    if (fhd >> 3) & 1:
        raise ZstdError("reserved frame-header bit set")
    has_checksum = bool((fhd >> 2) & 1)
    did_size = (0, 1, 2, 4)[fhd & 3]
    window = None
    if not single_segment:
        if pos >= len(buf):
            raise ZstdError("truncated window descriptor")
        wd = buf[pos]
        pos += 1
        exp, mant = wd >> 3, wd & 7
        base = 1 << (10 + exp)
        window = base + (base // 8) * mant
    if did_size:
        if pos + did_size > len(buf):
            raise ZstdError("truncated dictionary id")
        did = int.from_bytes(buf[pos:pos + did_size], "little")
        pos += did_size
        if did != 0:
            raise ZstdError(f"dictionary {did} required but none loaded")
    fcs = None
    fcs_bytes = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    if fcs_bytes:
        if pos + fcs_bytes > len(buf):
            raise ZstdError("truncated frame content size")
        fcs = int.from_bytes(buf[pos:pos + fcs_bytes], "little")
        if fcs_bytes == 2:
            fcs += 256
        pos += fcs_bytes
    if single_segment:
        window = fcs if fcs is not None else 0
    if window > (1 << 30):
        raise ZstdError("window size over decoder limit")
    block_max = 1 << 17 if single_segment else min(window, 1 << 17)

    ctx = _FrameContext()
    # Frame-local buffer: match offsets may only reach THIS frame's
    # output (no dictionary), never a previous concatenated frame's.
    fout = bytearray()
    while True:
        if pos + 3 > len(buf):
            raise ZstdError("truncated block header")
        hdr = int.from_bytes(buf[pos:pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 0:                               # raw
            if pos + bsize > len(buf):
                raise ZstdError("raw block overruns input")
            fout += buf[pos:pos + bsize]
            pos += bsize
        elif btype == 1:                             # RLE
            if pos >= len(buf):
                raise ZstdError("RLE block missing byte")
            fout += buf[pos:pos + 1] * bsize
            pos += 1
        elif btype == 2:                             # compressed
            if bsize > block_max + (1 << 5):
                raise ZstdError("compressed block over size cap")
            if pos + bsize > len(buf):
                raise ZstdError("compressed block overruns input")
            block = buf[pos:pos + bsize]
            pos += bsize
            literals, used = _decode_literals(block, ctx, block_max)
            _decode_sequences(block[used:], ctx, literals, fout,
                              window or _MAX_OUT)
        else:
            raise ZstdError("reserved block type")
        if len(fout) > _MAX_OUT:
            raise ZstdError("decoded output exceeds size bound")
        if last:
            break
    if fcs is not None and len(fout) != fcs:
        raise ZstdError("frame content size mismatch "
                        f"(declared {fcs}, got {len(fout)})")
    if has_checksum:
        if pos + 4 > len(buf):
            raise ZstdError("truncated content checksum")
        (want,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if xxh64(bytes(fout)) & 0xFFFFFFFF != want:
            raise ZstdError("content checksum mismatch")
    out += fout
    return pos


def compress(data: bytes, checksum: bool = True) -> bytes:
    """Assemble a legal zstd frame of RAW blocks (RFC 8878 permits a
    frame of only raw/RLE blocks; entropy coding is optional for the
    WRITER, mandatory only for readers). Any zstd reader accepts it."""
    out = bytearray(struct.pack("<I", _MAGIC))
    fhd = (1 << 5)                                   # single segment
    if checksum:
        fhd |= 1 << 2
    n = len(data)
    if n < 256:
        out.append(fhd)                              # fcs_flag 0 = 1 byte
        out.append(n)
    else:
        out.append(fhd | (2 << 6))                   # 4-byte fcs
        out += struct.pack("<I", n)
    step = 1 << 17
    if n == 0:
        out += (1).to_bytes(3, "little")             # last, raw, size 0
    for i in range(0, n, step):
        chunk = data[i:i + step]
        last = 1 if i + step >= n else 0
        out += ((len(chunk) << 3) | last).to_bytes(3, "little")
        out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
