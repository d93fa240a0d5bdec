"""WARC (Web ARChive, ISO 28500) record codec — the ingest format of
Common Crawl, the largest public web corpus and the canonical source
for LLM pretraining text. Round 7.

Pure stdlib from the public specification: a WARC file is a sequence
of records, each "WARC/1.0\\r\\n" + named headers (WARC-Type,
WARC-Target-URI, Content-Length, ...) + CRLF CRLF + Content-Length
payload bytes + CRLF CRLF. Common Crawl ships each record as its own
gzip MEMBER concatenated into one .warc.gz — stdlib zlib decompresses
member-at-a-time, so records stream without decompressing the whole
shard. ``parse_warc`` accepts both the gzipped and the plain form
(sniffed by magic). Fails loudly (ValueError) on truncation, missing
mandatory headers, or Content-Length drift — the engine's
corrupt-skip contract (same as every codec/ parser).

``build_warc`` synthesizes spec-shaped shards for the gate corpus and
tests (the WARC analog of build_wav / build_png / build_jpeg).
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"
_MANDATORY = ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length")


def build_warc(records, gzipped: bool = True) -> bytes:
    """Assemble a WARC shard from record dicts ({type, uri, payload,
    id?, date?}). gzipped=True writes one gzip member per record
    (Common Crawl layout); False writes the plain concatenation."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        headers = [
            ("WARC-Type", rec.get("type", "response")),
            ("WARC-Record-ID",
             rec.get("id", f"<urn:uuid:deterministic-{i}>")),
            ("WARC-Date", rec.get("date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if rec.get("uri"):
            headers.insert(1, ("WARC-Target-URI", rec["uri"]))
        raw = bytearray(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            raw += f"{k}: {v}".encode("utf-8") + _CRLF
        raw += _CRLF + payload + _CRLF + _CRLF
        if gzipped:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(bytes(raw)) + co.flush()
        else:
            out += raw
    return bytes(out)


def _split_members(data: bytes) -> bytes:
    """Decompress a multi-member gzip stream to the plain byte form."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC: {exc}") from None
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("empty gzip member in WARC")
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse one WARC shard (gzipped members or plain); return one
    dict per record: type, uri (may be None), date, headers (full
    map), payload (bytes). ValueError on any malformation."""
    if not data:
        raise ValueError("empty WARC shard")
    if data[:2] == b"\x1f\x8b":
        data = _split_members(data)
    records = []
    pos = 0
    while pos < len(data):
        # WARC/1.1 (the current ISO 28500 revision, emitted by modern
        # wget/warcio) frames records identically to 1.0 — accept both,
        # keep the hard failure for anything else (round-7 advisory).
        if data[pos:pos + 8] not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(
                f"bad WARC version at offset {pos} "
                f"({data[pos:pos + 8]!r})")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        for line in data[pos + 10:hdr_end].split(_CRLF):
            if not line:
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
        for k in _MANDATORY:
            if k not in headers:
                raise ValueError(f"WARC record missing {k}")
        try:
            n = int(headers["Content-Length"])
        except ValueError:
            raise ValueError("non-integer Content-Length") from None
        body_start = hdr_end + 4
        body_end = body_start + n
        if body_end + 4 > len(data):
            raise ValueError("truncated WARC payload")
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError("Content-Length drift (no record trailer)")
        records.append({
            "type": headers["WARC-Type"],
            "uri": headers.get("WARC-Target-URI"),
            "date": headers["WARC-Date"],
            "headers": headers,
            "payload": data[body_start:body_end],
        })
        pos = body_end + 4
    if not records:
        raise ValueError("WARC shard contains no records")
    return records
