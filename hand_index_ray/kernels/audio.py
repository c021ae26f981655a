"""WAV (RIFF PCM / IEEE-float) codec — pure numpy, public spec.

Implements the uncompressed WAVE container (RIFF 'WAVE' with 'fmt ' +
'data' chunks, format tags 1 = integer PCM and 3 = IEEE float) so the
engine's audio stages run REAL decode end-to-end in this sandbox;
compressed codecs (mp3/aac/...) remain explicit NotImplementedError
hooks in stages/multimodal.py. Spec references: RIFF/WAVE is the
Microsoft/IBM Multimedia Programming Interface spec (1991), format tag
semantics per RFC 2361; no external library is consulted.

Decode semantics:
- 8-bit PCM is unsigned (offset 128); 16/24/32-bit PCM are signed
  little-endian; float32/float64 pass through.
- Output is float64 in [-1, 1): integer samples divide by 2^(bits-1).
- Multi-channel audio downmixes to mono by the channel MEAN (documented
  engine convention; per-channel access is a slicing away if needed).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16,
               channels: int = 1) -> bytes:
    """Encode float samples in [-1, 1] as a PCM WAV blob.

    ``samples``: (n,) mono or (n, channels). Round-trips bit-exactly
    through ``decode_wav`` for values representable at ``bits``."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
        if channels != 1:
            x = np.repeat(x, channels, axis=1)
    n, ch = x.shape
    if bits == 16:
        data = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
        fmt_tag, block = 1, 2 * ch
    elif bits == 8:
        data = (np.clip(np.round(x * 128.0), -128, 127) + 128).astype(np.uint8).tobytes()
        fmt_tag, block = 1, ch
    elif bits == 24:
        v = np.clip(np.round(x * 8388608.0), -8388608, 8388607).astype("<i4")
        b4 = v.view(np.uint8).reshape(n, ch, 4)
        data = b4[:, :, :3].tobytes()
        fmt_tag, block = 1, 3 * ch
    elif bits == 32:
        data = x.astype("<f4").tobytes()
        fmt_tag, block = 3, 4 * ch
    else:
        raise ValueError(f"unsupported bits={bits}")
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> "tuple[np.ndarray, int]":
    """Decode a RIFF/WAVE blob → (mono float64 samples in [-1, 1),
    sample_rate). Raises ValueError on malformed containers and
    NotImplementedError on compressed format tags."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        clen = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _bps, _block, bits = fmt
    if ch < 1:
        raise ValueError("zero channels")
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data[:len(data) // 2 * 2], dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[:len(data) // 3 * 3], dtype=np.uint8).reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data[:len(data) // 4 * 4], dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data[:len(data) // 4 * 4], dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data[:len(data) // 8 * 8], dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise NotImplementedError(
            f"compressed WAVE format tag {tag} — only PCM (1) and IEEE "
            "float (3) are supported without a codec library")
    n = len(x) // ch
    x = x[: n * ch].reshape(n, ch)
    return x.mean(axis=1), int(rate)


def wht_batch(x: np.ndarray) -> np.ndarray:
    """Walsh–Hadamard transform (Hadamard/natural order) of each row:
    ``C[b, j] = Σ_t x[b, t] · (−1)^popcount(t & j)`` for power-of-two
    length N — the integer-exact spectral primitive (sequency
    analysis) where a DFT would be irrational. Fast butterfly,
    log₂N whole-batch passes, int64 throughout (|C| ≤ N·max|x|)."""
    v = np.asarray(x, np.int64).copy()
    b, n = v.shape
    if n & (n - 1):
        raise ValueError("wht_batch needs power-of-two length")
    h = 1
    while h < n:
        v = v.reshape(b, n // (2 * h), 2, h)
        a0 = v[:, :, 0, :] + v[:, :, 1, :]
        a1 = v[:, :, 0, :] - v[:, :, 1, :]
        v = np.stack([a0, a1], axis=2).reshape(b, n)
        h *= 2
    return v
