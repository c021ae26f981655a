"""MJPEG-in-AVI codec — pure numpy/stdlib, from the public RIFF AVI
spec (Microsoft "AVI RIFF File Reference" / OpenDML). Motion-JPEG is a
real-world compressed video format (every frame an independent baseline
JPEG), and this sandbox already has a from-spec JPEG codec
(kernels/jpeg.py) with a vectorized lockstep batch decoder — so the
engine's compressed-VIDEO path becomes real: the multimodal frame
sampler previously decoded only uncompressed Y4M and stubbed every
compressed codec (reference treats video payloads as opaque blobs
handed to a codec, the stages/multimodal.py contract).

Container surface: RIFF 'AVI ' → LIST hdrl (avih MainAVIHeader, LIST
strl → strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) → LIST movi with
'00dc' frame chunks (word-aligned) → idx1 index. The decoder locates
frames by chunk scan (no entropy decode to seek — chunk headers carry
lengths), so sampling k frames of an n-frame video reads only those k
JPEG payloads; frame pixel decode goes through jpeg.decode_batch — all
requested frames across a whole map_batches batch decode as ONE
lockstep Huffman machine.

Interlaced/field-split MJPEG variants and non-MJPG fourccs raise
ValueError (not silently wrong); audio streams are skipped.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg


def is_avi(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI "


def encode_avi_mjpeg(frames: np.ndarray, fps: float = 30.0,
                     quality: int = 90, restart_mcus: int = 2) -> bytes:
    """(n, h, w) gray or (n, h, w, 3) RGB uint8 → MJPEG AVI bytes.

    Each frame is an independent baseline JPEG (kernels/jpeg.py) in a
    '00dc' chunk; idx1 is written so standard players can seek."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        n, h, w = frames.shape
    else:
        n, h, w, _ = frames.shape
    blobs = [jpeg.encode(frames[i], quality=quality,
                         restart_mcus=restart_mcus) for i in range(n)]

    usec = int(round(1_000_000 / fps)) if fps > 0 else 0
    maxb = max((len(b) for b in blobs), default=0)
    avih = struct.pack("<IIIIIIIIII4I", usec, maxb * int(max(fps, 1)), 0,
                       0x10,  # AVIF_HASINDEX
                       n, 0, 1, maxb, w, h, 0, 0, 0, 0)
    # dwScale/dwRate as a rational fps (scale=1000 keeps 29.97 exact enough)
    scale, rate = 1000, int(round(fps * 1000))
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIiI4h", 0, 0, 0, 0, scale, rate, 0, n,
                          maxb, -1, 0, 0, 0, int(w), int(h)))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\0" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    offsets = []
    for b in blobs:
        offsets.append(len(movi_body))  # offset of ckid within movi list
        movi_body += chunk(b"00dc", b)
    movi = chunk(b"LIST", movi_body)
    idx = b"".join(b"00dc" + struct.pack("<III", 0x10, off, len(b))
                   for off, b in zip(offsets, blobs))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in [pos, end)."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        clen = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen & 1)


def parse_avi(buf: bytes) -> dict:
    """Parse container metadata + per-frame JPEG chunk extents (offset,
    length) WITHOUT decoding any pixels — sampling stays O(k)."""
    if not is_avi(buf):
        raise ValueError("not a RIFF AVI stream")
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    meta = {"w": 0, "h": 0, "fps": 0.0, "n_frames": 0}
    frames: list[tuple[int, int]] = []
    for cid, s, ln in _walk_chunks(buf, 12, end):
        if cid != b"LIST":
            continue
        ltype = buf[s:s + 4]
        if ltype == b"hdrl":
            for c2, s2, l2 in _walk_chunks(buf, s + 4, s + ln):
                if c2 == b"avih" and l2 >= 40:
                    v = struct.unpack("<10I", buf[s2:s2 + 40])
                    meta["n_frames"] = v[4]
                    meta["w"], meta["h"] = v[8], v[9]
                    if v[0]:
                        meta["fps"] = 1_000_000 / v[0]
                elif c2 == b"LIST" and buf[s2:s2 + 4] == b"strl":
                    for c3, s3, l3 in _walk_chunks(buf, s2 + 4, s2 + l2):
                        if c3 == b"strh" and l3 >= 28:
                            if buf[s3:s3 + 4] == b"vids":
                                if buf[s3 + 4:s3 + 8] not in (b"MJPG", b"mjpg"):
                                    raise ValueError(
                                        f"unsupported video fourcc "
                                        f"{buf[s3 + 4:s3 + 8]!r} — only MJPG "
                                        "decodes without a codec library")
                                sc, rt = struct.unpack(
                                    "<II", buf[s3 + 20:s3 + 28])
                                if sc and rt:  # exact rational fps
                                    meta["fps"] = rt / sc
        elif ltype == b"movi":
            for c2, s2, l2 in _walk_chunks(buf, s + 4, s + ln):
                if c2[2:4] in (b"dc", b"db"):
                    frames.append((s2, l2))
    meta["frames"] = frames
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return meta


def decode_avi_frames(buf: bytes, indices=None) -> list[np.ndarray]:
    """Decode selected frame indices (default: all) → list of uint8
    arrays, via the lockstep batch JPEG decoder."""
    meta = parse_avi(buf)
    frames = meta["frames"]
    if indices is None:
        indices = range(len(frames))
    blobs = []
    for i in indices:
        if not 0 <= i < len(frames):
            raise IndexError(f"frame {i} of {len(frames)}")
        s, ln = frames[i]
        blobs.append(buf[s:s + ln])
    return jpeg.decode_batch(blobs)


def extract_frame_blobs(buf: bytes, indices) -> list[bytes]:
    """JPEG payloads for the given frame indices — lets a caller pool
    frames from MANY videos into one jpeg.decode_batch call (the
    multimodal frame sampler does this per map_batches batch)."""
    frames = parse_avi(buf)["frames"]
    out = []
    for i in indices:
        if not 0 <= i < len(frames):
            raise IndexError(f"frame {i} of {len(frames)}")
        s, ln = frames[i]
        out.append(buf[s:s + ln])
    return out
