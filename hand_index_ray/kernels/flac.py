"""FLAC codec in pure numpy — from the public FLAC format spec
(xiph.org / RFC 9639). No audio libraries exist in this sandbox; this
makes the engine's COMPRESSED-audio path real: the multimodal audio
stage (stages/multimodal.py) previously decoded only uncompressed
RIFF/WAVE and stubbed every compressed codec. FLAC is lossless, so
unlike JPEG the realism claim is bit-exactness, which suits the
engine's integer-exact oracle model (reference parity: the reference
treats payload columns as opaque blobs decoded by a codec library,
/root/reference/load.py:83-117 analog).

Decoder (the realism surface — accepts real-world streams within the
subset): STREAMINFO + metadata skip, fixed- and variable-blocksize
frame headers with all published block-size/sample-rate/sample-size
codes, UTF-8-coded frame/sample numbers, CRC-8 header and CRC-16 frame
verification, subframe types CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32), wasted-bits-per-sample, Rice + Rice2 partitioned residuals
with escape partitions, and stereo decorrelation (left/side,
right/side, mid/side).

Encoder: fixed-blocksize frames, FIXED predictors with per-subframe
order selection (0-2), 4-bit Rice partitions, independent or mid/side
stereo, 8/16-bit input, STREAMINFO MD5.

Scale shape: everything bulk is vectorized. Rice decoding is the only
inherently serial part of FLAC (code j+1 starts where code j ended);
it runs as a POINTER-DOUBLING orbit over the stream's ones-index
domain: with S = prefix-popcount and ones = positions of 1-bits, the
terminator index of successive codes follows t' = h(t) = t + 1 +
S[ones[t]+1+k] - S[ones[t]+1], a dense self-map whose n-step orbit is
computed with log2(n) gathers (binary lifting), never a per-sample
Python loop. Frame CRC-16s fold as a GF(2) matrix tree (XOR-combine
with precomputed zero-extension matrices), vectorized over all bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"

_BLOCKSIZE_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                   256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                   8192: 13, 16384: 14, 32768: 15}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_RATE_CODE = {v: k for k, v in _SAMPLE_RATES.items()}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_SIZE_CODE = {v: k for k, v in _SAMPLE_SIZES.items()}

_POW1 = None  # lazy (1 << arange) tables


# --- CRC (frame integrity; polys from the spec) -----------------------------

def _crc_tables():
    global _CRC8_TBL, _CRC16_TBL
    t8 = np.zeros(256, np.uint16)
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8[b] = c
    t16 = np.zeros(256, np.uint32)
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t16[b] = c
    _CRC8_TBL, _CRC16_TBL = t8, t16


_crc_tables()


def crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header CRC."""
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def _m8_matrix() -> np.ndarray:
    # effect of one zero byte on the CRC-16 state: columns over GF(2)
    cols = np.empty(16, np.uint32)
    for bit in range(16):
        cols[bit] = int(_CRC16_TBL[(1 << bit) >> 8]) ^ ((1 << bit) << 8 & 0xFFFF)
    return cols


_M8 = _m8_matrix()


def _mat_apply(cols: np.ndarray, v: np.ndarray) -> np.ndarray:
    out = np.zeros_like(v)
    for bit in range(16):
        out ^= ((v >> np.uint32(bit)) & np.uint32(1)) * cols[bit]
    return out


def _mat_square(cols: np.ndarray) -> np.ndarray:
    return _mat_apply(cols, cols)


def crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — frame CRC.

    Tree-folded: per-byte CRCs from one table gather, then log2(n)
    XOR-combine levels through squared zero-extension matrices (leading
    zero bytes are CRC-neutral at init 0, so left-padding to a power of
    two is exact)."""
    n = len(data)
    if n == 0:
        return 0
    if n <= 64:
        c = 0
        for b in data:
            c = ((c << 8) & 0xFFFF) ^ int(_CRC16_TBL[(c >> 8) ^ b])
        return c
    m = 1 << (n - 1).bit_length()
    buf = np.zeros(m, np.uint8)
    buf[m - n:] = np.frombuffer(data, np.uint8)
    cs = _CRC16_TBL[buf].astype(np.uint32)
    mat = _M8.copy()
    while len(cs) > 1:
        cs = _mat_apply(mat, cs[0::2]) ^ cs[1::2]
        mat = _mat_square(mat)
    return int(cs[0])


# --- bit packing helpers (encode) -------------------------------------------

def _scalar_bits(pairs) -> np.ndarray:
    """[(value, nbits), ...] → uint8 bit array, MSB-first."""
    out = []
    for v, n in pairs:
        for i in range(n - 1, -1, -1):
            out.append((v >> i) & 1)
    return np.array(out, np.uint8)


def _fixed_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """Signed/unsigned ints → width-bit two's-complement bits, MSB-first."""
    if width == 0:
        return np.empty(0, np.uint8)
    v = vals.astype(np.int64) & ((1 << width) - 1)
    return ((v[:, None] >> np.arange(width - 1, -1, -1)) & 1).astype(np.uint8).ravel()


def _rice_bits(res: np.ndarray, k: int) -> np.ndarray:
    """Rice-code signed residuals at parameter k → bit array (vectorized:
    one scatter for terminators + k scatters for remainder bit-planes;
    unary zeros are the zero-initialized background)."""
    r = res.astype(np.int64)
    u = (r << 1) ^ (r >> 63)
    q = u >> k
    lens = q + 1 + k
    off = np.concatenate([[0], np.cumsum(lens)])
    bits = np.zeros(int(off[-1]), np.uint8)
    term = off[:-1] + q
    bits[term] = 1
    for b in range(k):
        bits[term + 1 + b] = (u >> (k - 1 - b)) & 1
    return bits


def _best_rice_k(res: np.ndarray) -> int:
    r = res.astype(np.int64)
    u = (r << 1) ^ (r >> 63)
    s = int(u.sum())
    n = max(len(u), 1)
    k = 0
    while k < 14 and (n << (k + 1)) < s:
        k += 1
    return k


# --- encoder -----------------------------------------------------------------

def _encode_subframe(x: np.ndarray, bps: int, partition_order: int) -> np.ndarray:
    """One channel of one frame → subframe bit array. FIXED order 0-2
    chosen by summed |residual|; CONSTANT when flat."""
    n = len(x)
    if n > 1 and bool(np.all(x == x[0])):
        return np.concatenate([_scalar_bits([(0, 1), (0, 6), (0, 1)]),
                               _fixed_bits(x[:1], bps)])
    best_o, best_c = 0, None
    max_o = min(2, n - 1)
    for o in range(max_o + 1):
        c = int(np.abs(np.diff(x, n=o)).sum())
        if best_c is None or c < best_c:
            best_o, best_c = o, c
    o = best_o
    res = np.diff(x, n=o)
    po = partition_order
    while po > 0 and (n % (1 << po) or (n >> po) <= o):
        po -= 1
    head = _scalar_bits([(0, 1), (0b001000 | o, 6), (0, 1)])
    warm = _fixed_bits(x[:o], bps)
    parts = [_scalar_bits([(0, 2), (po, 4)])]
    psz = n >> po
    pos = 0
    for p in range(1 << po):
        cnt = psz - o if p == 0 else psz
        seg = res[pos:pos + cnt]
        pos += cnt
        k = _best_rice_k(seg)
        parts.append(_scalar_bits([(k, 4)]))
        parts.append(_rice_bits(seg, k))
    return np.concatenate([head, warm] + parts)


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16,
                block_size: int = 4096, partition_order: int = 3,
                stereo: str = "independent") -> bytes:
    """Encode integer samples as a FLAC stream.

    ``samples``: int array (n,) mono or (n, ch); values must fit
    ``bits``-bit signed. ``stereo``: "independent" or "mid_side"
    (2-channel only). Round-trips bit-exactly through ``decode_flac``."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if not (1 <= ch <= 8):
        raise ValueError(f"unsupported channel count {ch}")
    if bits not in (8, 16):
        raise ValueError("encoder supports bits in (8, 16)")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if n and (x.min() < lo or x.max() > hi):
        raise ValueError(f"samples exceed {bits}-bit signed range")
    mid_side = stereo == "mid_side" and ch == 2

    md5 = hashlib.md5(
        x.astype("<i2" if bits == 16 else "i1").tobytes()).digest()
    si = _scalar_bits([
        (min(block_size, n) if n else block_size, 16), (block_size, 16),
        (0, 24), (0, 24), (sample_rate, 20), (ch - 1, 3), (bits - 1, 5),
        (n, 36)])
    header = (MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:]
              + np.packbits(si).tobytes() + md5)

    frames = []
    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = x[start:start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        hdr = bytearray()
        # sync(14) + reserved(1) + fixed-blocksize strategy(1) = 0xFFF8
        hdr += b"\xff\xf8"
        src = _SAMPLE_RATE_CODE.get(sample_rate, 0)
        hdr.append((0b0111 << 4) | src)  # blocksize-1 as trailing u16
        chan_code = 0b1010 if mid_side else ch - 1
        hdr.append((chan_code << 4) | (_SAMPLE_SIZE_CODE[bits] << 1))
        hdr += _utf8_number(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(crc8(bytes(hdr)))
        segs = [np.unpackbits(np.frombuffer(bytes(hdr), np.uint8))]
        if mid_side:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            segs.append(_encode_subframe(mid, bits, partition_order))
            segs.append(_encode_subframe(side, bits + 1, partition_order))
        else:
            for c in range(ch):
                segs.append(_encode_subframe(blk[:, c], bits, partition_order))
        allbits = np.concatenate(segs)
        pad = (-len(allbits)) % 8
        if pad:
            allbits = np.concatenate([allbits, np.zeros(pad, np.uint8)])
        body = np.packbits(allbits).tobytes()
        frames.append(body + struct.pack(">H", crc16(body)))
    return header + b"".join(frames)


def _utf8_number(v: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index, ≤36 bits)."""
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


# --- decoder -----------------------------------------------------------------

class _BitCursor:
    """Scalar header reader over the unpacked bit array (headers are a
    few dozen bits; the bulk — residuals, warmups — goes through the
    vectorized extractors below)."""

    __slots__ = ("bits", "pos")

    def __init__(self, bits: np.ndarray, pos: int):
        self.bits = bits
        self.pos = pos

    def read(self, n: int) -> int:
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError("truncated FLAC stream")
        self.pos += n
        v = 0
        for bit in b:
            v = (v << 1) | int(bit)
        return v

    def read_unary(self) -> int:
        nz = np.flatnonzero(self.bits[self.pos:self.pos + 4096])
        if len(nz) == 0:
            raise ValueError("unterminated unary code")
        q = int(nz[0])
        self.pos += q + 1
        return q

    def read_utf8(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        nb = 0
        probe = b0
        while probe & 0x80:
            nb += 1
            probe = (probe << 1) & 0xFF
        if nb < 2 or nb > 7:
            raise ValueError("bad UTF-8 coded number")
        v = b0 & (0x7F >> nb)
        for _ in range(nb - 1):
            c = self.read(8)
            if c & 0xC0 != 0x80:
                raise ValueError("bad UTF-8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v


def _extract_fixed(bits: np.ndarray, start: int, count: int, width: int,
                   signed: bool = True) -> tuple[np.ndarray, int]:
    """count × width-bit fields at bit offset start — one gather matrix."""
    if count == 0 or width == 0:
        return np.zeros(count, np.int64), start + count * width
    idx = start + np.arange(count)[:, None] * width + np.arange(width)
    if idx[-1, -1] >= len(bits):
        raise ValueError("truncated FLAC subframe")
    w = bits[idx].astype(np.int64)
    v = w @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
    if signed:
        v = np.where(v >= (1 << (width - 1)), v - (1 << width), v)
    return v, start + count * width


def _rice_orbit(ones: np.ndarray, pops: np.ndarray, t0: int, n: int,
                k: int) -> np.ndarray:
    """Terminator ones-indices for n successive Rice codes at param k,
    starting with terminator index t0: binary-lifted orbit of
    h(t) = t + 1 + popcount(tail bits after ones[t]) — no per-sample
    Python loop."""
    if n == 0:
        return np.zeros(0, np.int64)
    # dense domain: t advances by ≥1 per code, ≤ 1+k ones per code
    dom_hi = min(len(ones), t0 + n * (k + 1) + 1)
    dom = np.arange(t0, dom_hi, dtype=np.int64)
    if len(dom) == 0:
        raise ValueError("rice stream overruns frame")
    tails_lo = ones[dom] + 1
    tails_hi = np.minimum(tails_lo + k, len(pops) - 1)
    h = dom + 1 + (pops[tails_hi] - pops[np.minimum(tails_lo, len(pops) - 1)])
    h = np.minimum(h - t0, len(dom) - 1)  # rebase to domain index; clip
    orbit = np.empty(n, np.int64)
    orbit[0] = 0
    have = 1
    jump = h
    while have < n:
        take = min(have, n - have)
        orbit[have:have + take] = jump[orbit[:take]]
        have += take
        if have < n:
            jump = jump[jump]
    return orbit + t0


def _decode_rice_partition(bits, ones, pops, cursor: int, n: int, k: int):
    """n Rice codes at param k from bit offset cursor → (values, cursor')."""
    if n == 0:
        return np.zeros(0, np.int64), cursor
    t0 = int(np.searchsorted(ones, cursor))
    if t0 >= len(ones):
        raise ValueError("rice stream overruns frame")
    ts = _rice_orbit(ones, pops, t0, n, k)
    term = ones[ts]
    cursors = np.empty(n, np.int64)
    cursors[0] = cursor
    if n > 1:
        cursors[1:] = term[:-1] + 1 + k
    q = term - cursors
    if q.min() < 0:
        raise ValueError("corrupt rice stream")
    u = q << k
    if k:
        tail = np.zeros(n, np.int64)
        base = term + 1
        if int(base[-1]) + k > len(bits):
            raise ValueError("truncated rice tail")
        for b in range(k):
            tail = (tail << 1) | bits[base + b]
        u = u | tail
    vals = (u >> 1) ^ -(u & 1)
    return vals, int(term[-1]) + 1 + k


_FIXED_NEXT_CACHE: dict[int, np.ndarray] = {}


def _restore_fixed(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-p difference: p nested cumsums seeded from the
    warmup's difference pyramid (vectorized; FLAC guarantees int range)."""
    cur = res
    for j in range(order, 0, -1):
        first = np.diff(warm, n=j - 1)[0] if j > 1 else warm[0]
        cur = np.cumsum(np.concatenate([[first], cur]))
    return cur


def _restore_lpc(warm: np.ndarray, res: np.ndarray, coefs: np.ndarray,
                 shift: int) -> np.ndarray:
    """General LPC recurrence — inherently serial (each sample feeds the
    next prediction); per-sample loop, documented secondary path (the
    engine's own payloads are FIXED-predicted)."""
    p = len(coefs)
    out = np.concatenate([warm, np.zeros(len(res), np.int64)])
    c = coefs[::-1].astype(np.int64)
    for i in range(len(res)):
        pred = int(np.dot(out[i:i + p], c)) >> shift
        out[p + i] = pred + int(res[i])
    return out


def _decode_subframe(bits, ones, pops, cur: _BitCursor, bs: int, bps: int):
    if cur.read(1):
        raise ValueError("subframe padding bit set")
    ty = cur.read(6)
    wasted = 0
    if cur.read(1):
        wasted = cur.read_unary() + 1
    eff = bps - wasted
    if ty == 0b000000:  # CONSTANT
        v, cur.pos = _extract_fixed(bits, cur.pos, 1, eff)
        out = np.full(bs, v[0], np.int64)
    elif ty == 0b000001:  # VERBATIM
        out, cur.pos = _extract_fixed(bits, cur.pos, bs, eff)
    elif 0b001000 <= ty <= 0b001100:  # FIXED 0-4
        order = ty & 0x07
        warm, cur.pos = _extract_fixed(bits, cur.pos, order, eff)
        res = _decode_residual(bits, ones, pops, cur, bs, order)
        out = _restore_fixed(warm, res, order)
    elif ty & 0b100000:  # LPC
        order = (ty & 0x1F) + 1
        warm, cur.pos = _extract_fixed(bits, cur.pos, order, eff)
        prec = cur.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = cur.read(5)
        if shift >= 16:
            shift -= 32
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs, cur.pos = _extract_fixed(bits, cur.pos, order, prec)
        res = _decode_residual(bits, ones, pops, cur, bs, order)
        out = _restore_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {ty:#08b}")
    return out << wasted


def _decode_residual(bits, ones, pops, cur: _BitCursor, bs: int, order: int):
    method = cur.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    kbits = 4 + method
    esc = (1 << kbits) - 1
    po = cur.read(4)
    if bs % (1 << po):
        raise ValueError("partition order does not divide block size")
    psz = bs >> po
    out = []
    for p in range(1 << po):
        cnt = psz - order if p == 0 else psz
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        k = cur.read(kbits)
        if k == esc:
            w = cur.read(5)
            vals, cur.pos = _extract_fixed(bits, cur.pos, cnt, w) \
                if w else (np.zeros(cnt, np.int64), cur.pos)
            out.append(vals)
        else:
            vals, cur.pos = _decode_rice_partition(bits, ones, pops,
                                                   cur.pos, cnt, k)
            out.append(vals)
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def decode_flac(buf: bytes, verify_md5: bool = False):
    """Decode a FLAC stream → (samples int32 (n, ch), sample_rate, bits).

    Verifies every frame's CRC-8 (header) and CRC-16 (frame); raises
    ValueError on corruption, NotImplementedError never (the full
    baseline subframe/stereo surface is implemented)."""
    if buf[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated metadata")
        hdr = buf[pos]
        blen = int.from_bytes(buf[pos + 1:pos + 4], "big")
        body = buf[pos + 4:pos + 4 + blen]
        if hdr & 0x7F == 0:
            if blen < 34:
                raise ValueError("short STREAMINFO")
            bsmin, bsmax = struct.unpack(">HH", body[:4])
            raw = int.from_bytes(body[10:18], "big")
            rate = raw >> 44
            ch = ((raw >> 41) & 0x7) + 1
            bits = ((raw >> 36) & 0x1F) + 1
            total = raw & ((1 << 36) - 1)
            info = (rate, ch, bits, total, body[18:34])
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    s_rate, s_ch, s_bits, total, md5_ref = info

    data = np.frombuffer(buf, np.uint8)[pos:]
    bits_arr = np.unpackbits(data)
    ones = np.flatnonzero(bits_arr).astype(np.int64)
    pops = np.concatenate([[0], np.cumsum(bits_arr, dtype=np.int64)])

    chunks = []
    got = 0
    byte_pos = 0
    while byte_pos + 2 < len(data) and (total == 0 or got < total):
        frame_start = byte_pos
        cur = _BitCursor(bits_arr, byte_pos * 8)
        sync = cur.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"lost frame sync at byte {pos + byte_pos}")
        if cur.read(1):
            raise ValueError("reserved frame-header bit set")
        variable = cur.read(1)
        bs_code = cur.read(4)
        sr_code = cur.read(4)
        chan_code = cur.read(4)
        sz_code = cur.read(3)
        if cur.read(1):
            raise ValueError("reserved frame-header bit set")
        cur.read_utf8()  # frame/sample number (we decode sequentially)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = cur.read(8) + 1
        elif bs_code == 7:
            bs = cur.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = s_rate
        elif sr_code in _SAMPLE_RATES:
            rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = cur.read(8) * 1000
        elif sr_code == 13:
            rate = cur.read(16)
        elif sr_code == 14:
            rate = cur.read(16) * 10
        else:
            raise ValueError("invalid sample rate code")
        bps = s_bits if sz_code == 0 else _SAMPLE_SIZES.get(sz_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        hdr_end = cur.pos // 8
        if crc8(data[frame_start:hdr_end].tobytes()) != cur.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        if chan_code <= 7:
            nch = chan_code + 1
            chans = [ _decode_subframe(bits_arr, ones, pops, cur, bs, bps)
                      for _ in range(nch) ]
        elif chan_code in (8, 9, 10):
            nch = 2
            # the SIDE subframe carries bps+1 bits: left/side and
            # mid/side put it second; right/side puts it first
            extra = (1, 0) if chan_code == 9 else (0, 1)
            a = _decode_subframe(bits_arr, ones, pops, cur, bs, bps + extra[0])
            b = _decode_subframe(bits_arr, ones, pops, cur, bs, bps + extra[1])
            if chan_code == 8:      # left/side
                chans = [a, a - b]
            elif chan_code == 9:    # right/side
                chans = [a + b, b]
            else:                   # mid/side
                side = b
                m2 = (a << 1) | (side & 1)
                chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        if nch != s_ch:
            raise ValueError("frame channel count != STREAMINFO")
        cur.pos = (cur.pos + 7) & ~7  # byte-align
        body_end = cur.pos // 8
        want = struct.unpack(">H", data[body_end:body_end + 2].tobytes())[0]
        if crc16(data[frame_start:body_end].tobytes()) != want:
            raise ValueError("frame CRC-16 mismatch")
        byte_pos = body_end + 2
        frame = np.stack(chans, axis=1)
        if total and got + bs > total:
            frame = frame[:total - got]
        chunks.append(frame)
        got += len(frame)
        del variable, rate
    out = (np.concatenate(chunks) if chunks
           else np.zeros((0, s_ch), np.int64)).astype(np.int32)
    if verify_md5:
        width = (s_bits + 7) // 8
        dt = {1: "i1", 2: "<i2", 4: "<i4"}[width if width != 3 else 4]
        if width == 3:
            b4 = out.astype("<i4").view(np.uint8).reshape(-1, 4)
            raw = b4[:, :3].tobytes()
        else:
            raw = out.astype(dt).tobytes()
        if hashlib.md5(raw).digest() != md5_ref:
            raise ValueError("stream MD5 mismatch")
    return out, int(s_rate), int(s_bits)


def decode_flac_to_float(buf: bytes):
    """FLAC → (mono float64 in [-1, 1), sample_rate) — same conventions
    as kernels/audio.decode_wav (channel-mean downmix, /2^(bits-1))."""
    x, rate, bits = decode_flac(buf)
    return x.mean(axis=1) / float(1 << (bits - 1)), rate
