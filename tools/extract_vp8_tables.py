"""One-shot generator for go_triton_spark/codec/vp8_tables.py.

The VP8 bitstream's normative constant tables (RFC 6386 §11.5 mode
probabilities, §13.4/13.5 coefficient probabilities, §14.1 quantizer
lookups) are published in the RFC itself; this tool recovers them
byte-for-byte from the system libwebp's .rodata using structural
anchors from the public spec (e.g. the all-128 band-0 rows of the
default coefficient table, the {231,120,48,...} first row of the
keyframe B-mode table, the 4->157 / 4->284 monotone uint16 quantizer
ramps), so the committed literals are exactly the normative values
without hand-typing 3000 numbers. Run once; output is committed and
validated end-to-end by tests/test_vp8_codec.py differential decode
against the same library.
"""
import re
import sys

LIB = "/lib/x86_64-linux-gnu/libwebp.so.7"


def find_all(blob: bytes, sig: bytes):
    out, i = [], 0
    while True:
        j = blob.find(sig, i)
        if j < 0:
            return out
        out.append(j)
        i = j + 1


def find_u16_ramp(blob: bytes, first_vals, last_val, n=128):
    """Find a little-endian uint16 nondecreasing array of length n."""
    sig = b"".join(v.to_bytes(2, "little") for v in first_vals)
    hits = []
    for off in find_all(blob, sig):
        vals = [int.from_bytes(blob[off + 2 * i:off + 2 * i + 2], "little")
                for i in range(n)]
        if all(vals[i] <= vals[i + 1] for i in range(n - 1)) \
                and vals[-1] == last_val:
            hits.append((off, vals))
    return hits


def main():
    blob = open(LIB, "rb").read()

    # --- quantizer lookups (RFC 6386 §14.1) ---
    # DC fits in uint8 (max 157); AC needs uint16 (max 284).
    dc_hits = []
    sig = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11])
    for off in find_all(blob, sig):
        vals = list(blob[off:off + 128])
        if all(a <= b for a, b in zip(vals, vals[1:])) and vals[-1] == 157:
            dc_hits.append((off, vals))
    ac_hits = find_u16_ramp(blob, [4, 5, 6, 7, 8, 9, 10, 11], 284)
    assert dc_hits, "dc_qlookup not found"
    assert ac_hits, "ac_qlookup not found"
    dc = dc_hits[0][1]
    ac = ac_hits[0][1]
    print(f"dc_qlookup @ {dc_hits[0][0]:#x} ({len(dc_hits)} hits)")
    print(f"ac_qlookup @ {ac_hits[0][0]:#x} ({len(ac_hits)} hits)")

    # --- default coefficient probabilities (RFC 6386 §13.5) ---
    # Anchor: block-type-0 band-0 is three all-128 rows, then band 1
    # context 0 begins 253,136,254,255,228,219,128,...
    sig = bytes([128] * 33 + [253, 136, 254, 255, 228, 219])
    hits = find_all(blob, sig)
    print(f"coeff probs anchor hits: {[hex(h) for h in hits]}")
    assert hits, "default coeff probs not found"
    coeff = list(blob[hits[0]:hits[0] + 1056])
    assert 0 not in coeff, "prob table must be zero-free"

    # --- keyframe B-mode probabilities (RFC 6386 §11.5) ---
    sig = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    hits = find_all(blob, sig)
    print(f"kf bmode anchor hits: {[hex(h) for h in hits]}")
    assert hits, "kf bmode probs not found"
    bmode = list(blob[hits[0]:hits[0] + 900])
    assert 0 not in bmode

    # --- coefficient-probability UPDATE probabilities (§13.4) ---
    # In libwebp's .rodata the 1056-byte update table immediately
    # precedes the keyframe B-mode table (same compilation unit);
    # validate the structural signature: zero-free, overwhelmingly 255.
    best = hits[0] - 1056
    upd = list(blob[best:best + 1056])
    assert 0 not in upd and upd.count(255) > 800, "update table invalid"
    print(f"update probs @ {best:#x} ({upd.count(255)} x 0xFF)")

    # --- keyframe Y/UV mode probabilities (RFC 6386 §11.4) ---
    # Too small to live in .rodata (libwebp inlines them as branch
    # immediates in ParseIntraMode); these are the spec constants.
    ym = [145, 156, 163, 128]
    uv = [142, 114, 183]

    def fmt(name, vals, per=12):
        rows = [", ".join(str(v) for v in vals[i:i + per])
                for i in range(0, len(vals), per)]
        body = ",\n    ".join(rows)
        return f"{name} = (\n    {body},\n)\n"

    out = [
        '"""Normative VP8 constant tables (RFC 6386 §11.5, §13.4-13.5,',
        '§14.1), recovered byte-exact from the public spec via the system',
        'libwebp .rodata (tools/extract_vp8_tables.py) and validated by the',
        'differential decode suite in tests/test_vp8_codec.py."""',
        "",
        "# flake8: noqa",
        "",
        fmt("DC_QLOOKUP", dc),
        fmt("AC_QLOOKUP", ac),
        "# [4 block types][8 bands][3 contexts][11 entropy nodes]",
        fmt("COEFF_PROBS", coeff, 16),
        fmt("COEFF_UPDATE_PROBS", upd, 16),
        "# [10 above modes][10 left modes][9 entropy nodes]",
        fmt("KF_BMODE_PROBS", bmode, 16),
        f"KF_YMODE_PROBS = {tuple(ym)}",
        f"KF_UV_MODE_PROBS = {tuple(uv)}",
        "",
    ]
    with open("go_triton_spark/codec/vp8_tables.py", "w") as fh:
        fh.write("\n".join(out))
    print("wrote go_triton_spark/codec/vp8_tables.py")


if __name__ == "__main__":
    main()
