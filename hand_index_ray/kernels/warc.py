"""WARC/1.0 (ISO 28500) — the web-crawl archive format (Common Crawl,
WET/WARC files), from the public spec.

A WARC file is a sequence of records: a version line, CRLF-separated
named header fields (WARC-Type, WARC-Target-URI, Content-Length, ...),
a blank line, exactly Content-Length payload bytes, and two CRLFs. The
Common Crawl convention compresses EACH RECORD as its own gzip member
and concatenates the members — a reader must iterate gzip members (the
property that makes WARC splittable at scale). Both layouts are
supported here; gzip members use the stdlib zlib (the container
framing, member iteration, and record grammar are the from-spec part).
"""

from __future__ import annotations

import zlib

CRLF = b"\r\n"


def encode_record(rec_type: str, uri: str, payload: bytes,
                  extra: "dict | None" = None) -> bytes:
    heads = [b"WARC/1.0",
             f"WARC-Type: {rec_type}".encode(),
             f"WARC-Target-URI: {uri}".encode(),
             f"Content-Length: {len(payload)}".encode()]
    for k, v in (extra or {}).items():
        heads.append(f"{k}: {v}".encode())
    return CRLF.join(heads) + CRLF + CRLF + payload + CRLF + CRLF


def encode_warc(records: list, gzip_members: bool = True) -> bytes:
    """records: list of (rec_type, uri, payload bytes)."""
    out = []
    for rec_type, uri, payload in records:
        raw = encode_record(rec_type, uri, payload)
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


def _iter_gzip_members(buf: bytes):
    """Yield decompressed gzip members from a concatenated stream —
    the WARC splittability property (each member self-terminates)."""
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        chunk = d.decompress(buf[pos:])
        yield chunk + d.flush()
        consumed = len(buf) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def decode_warc(buf: bytes) -> list:
    """Parse a WARC byte stream (gzip-member or plain) into records:
    dicts with 'type', 'uri', 'headers', 'payload'."""
    if buf[:2] == b"\x1f\x8b":
        raw = b"".join(_iter_gzip_members(buf))
    else:
        raw = bytes(buf)
    recs = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = raw.index(CRLF + CRLF, pos)
        head = raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad record at {pos}: {head[0][:20]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body_start = hdr_end + 4
        payload = raw[body_start:body_start + clen]
        recs.append({"type": fields.get("warc-type", ""),
                     "uri": fields.get("warc-target-uri", ""),
                     "headers": fields, "payload": payload})
        pos = body_start + clen
    return recs
