"""Progressive JPEG (SOF2) — pure numpy/stdlib, from ITU-T T.81 Annex G.

Real-world image corpora are full of progressive JPEGs (most web
encoders emit them); the engine's baseline decoder (kernels/jpeg.py)
previously quarantined those blobs. This module adds:

- ``decode_progressive``: full Annex-G decode — DC first + refinement
  scans, AC first scans with EOB-run coding, AC refinement scans with
  correction bits, spectral selection, successive approximation,
  interleaved and non-interleaved scans, restart intervals, tables
  redefined between scans. Shares the dequant/IDCT/assembly back half
  with the baseline decoder's conventions (bit-identical pipeline).
- ``encode_progressive``: a real progressive encoder (DC Al=1 → DC
  refine, per-component AC first Al=1 → AC refine) with per-scan
  OPTIMIZED Huffman tables built from symbol frequencies by the spec's
  Annex-K.2 code-length algorithm — the Annex-K example tables lack
  EOBn symbols, so progressive encoders must derive their own, exactly
  as libjpeg-style encoders do. Used to build test fixtures and as the
  self-consistency proof: both pipelines share the forward transform,
  so progressive decode must reproduce the BASELINE decode of the same
  quantized coefficients bit-exactly (tests/test_jpeg_progressive.py).

The entropy walk here is scalar per block (progressive is a
compatibility/ingest path, not the engine's payload format — engine
payloads stay baseline+RST where the lockstep batch decoder applies).
"""

from __future__ import annotations

import numpy as np

from .jpeg import (
    QCHROMA, QLUMA, UNZIGZAG, ZIGZAG, _BitReader, _BitWriter,
    _build_codes, _build_decode_lut, _extend, _fdct, _idct, _magnitude,
    _quality_scale, _unstuff,
)


def is_progressive(data: bytes) -> bool:
    """True if the stream's frame header is SOF2 (cheap marker walk)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < 4 or arr[0] != 0xFF or arr[1] != 0xD8:
        return False
    pos = 2
    while pos + 4 <= len(arr):
        if arr[pos] != 0xFF:
            return False
        while pos + 1 < len(arr) and arr[pos + 1] == 0xFF:
            pos += 1
        m = int(arr[pos + 1])
        pos += 2
        if m == 0xC2:
            return True
        if m in (0xC0, 0xC1, 0xDA, 0xD9) or 0xC3 <= m <= 0xCF and m != 0xC4:
            return False
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        pos += (int(arr[pos]) << 8) | int(arr[pos + 1])
    return False


# --- optimized Huffman construction (spec Annex K.2) -------------------------

def build_optimal_huffman(freq_in: np.ndarray) -> tuple[list, list]:
    """Symbol frequencies → (BITS[16], HUFFVAL) per the published
    Figure-K.1/K.2/K.3 procedure (reserved symbol 256 guarantees no
    all-ones code; lengths folded to ≤16)."""
    freq = np.zeros(257, np.int64)
    freq[: len(freq_in)] = freq_in
    freq[256] = 1
    codesize = np.zeros(257, np.int64)
    others = np.full(257, -1, np.int64)
    while True:
        nz = np.flatnonzero(freq > 0)
        if len(nz) <= 1:
            break
        fs = freq[nz]
        # least frequency, ties broken toward the LARGEST symbol value
        m = fs.min()
        v1 = int(nz[fs == m].max())
        rest = nz[nz != v1]
        fs2 = freq[rest]
        m2 = fs2.min()
        v2 = int(rest[fs2 == m2].max())
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(33, np.int64)
    for v in range(257):
        if codesize[v]:
            bits[min(int(codesize[v]), 32)] += 1
    # fold lengths > 16 (Figure K.3)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # remove the reserved symbol's code (the longest one)
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    order = sorted((int(codesize[v]), v) for v in range(256) if codesize[v])
    huffval = [v for _, v in order]
    return [int(b) for b in bits[1:17]], huffval


# --- shared forward transform -------------------------------------------------

def _coefs_and_grid(px: np.ndarray, quality: int, subsample: bool):
    """Identical forward path to jpeg.encode: plane split, MCU padding,
    FDCT, quantize, zigzag. Returns (comp_coefs[(by,bx,64)], samps,
    qtabs, h, w, mcux, mcuy)."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qy = _quality_scale(QLUMA, quality)
    qc = _quality_scale(QCHROMA, quality)
    if gray:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
    else:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            H2 = (h + 1) // 2 * 2
            W2 = (w + 1) // 2 * 2

            def down(p):
                q = np.empty((H2, W2))
                q[:h, :w] = p
                if H2 > h:
                    q[h:, :w] = p[-1:, :]
                if W2 > w:
                    q[:, w:] = q[:, w - 1: w]
                return 0.25 * (q[0::2, 0::2] + q[1::2, 0::2]
                               + q[0::2, 1::2] + q[1::2, 1::2])

            planes = [yy, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [yy, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_coefs = []
    qtabs = [qy] + [qc] * (len(planes) - 1)
    for plane, (hs, vs), qt in zip(planes, samps, qtabs):
        H = mcuy * vs * 8
        W = mcux * hs * 8
        p = np.empty((H, W))
        ph, pw = plane.shape
        p[:ph, :pw] = plane
        if H > ph:
            p[ph:, :pw] = plane[-1:, :]
        if W > pw:
            p[:, pw:] = p[:, pw - 1: pw]
        blocks = p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        co = _fdct(blocks - 128.0)
        qn = np.round(co / qt).astype(np.int64)
        comp_coefs.append(qn.reshape(-1, 64)[:, ZIGZAG]
                          .reshape(H // 8, W // 8, 64))
    return comp_coefs, samps, qtabs, h, w, mcux, mcuy


def _comp_dims(h, w, hs, vs, hmax, vmax):
    """Non-interleaved block grid of one component (spec A.2.2)."""
    cw = (w * hs + hmax - 1) // hmax
    ch = (h * vs + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


# --- progressive encoder -------------------------------------------------------

class _ScanWriter:
    """Two-pass scan emitter: pass 0 counts symbol frequencies (bits are
    dropped), pass 1 Huffman-codes for real."""

    def __init__(self):
        self.freq = np.zeros(256, np.int64)
        self.codes = None
        self.bw = None

    def start_emit(self):
        self.codes = _build_codes(*build_optimal_huffman(self.freq))
        self.bw = _BitWriter()

    def sym(self, s: int):
        if self.bw is None:
            self.freq[s] += 1
        else:
            c, ln = self.codes[s]
            self.bw.put(c, ln)

    def bits(self, v: int, n: int):
        if n and self.bw is not None:
            self.bw.put(v, n)


def _ac_first_scan(sw: _ScanWriter, blocks, ss: int, se: int, al: int):
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            sw.sym(nb << 4)
            sw.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0

    for blk in blocks:
        run = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = (abs(v) >> al)
            if t == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                sw.sym(0xF0)
                run -= 16
            tv = t if v > 0 else -t
            size, mag = _magnitude(tv)
            sw.sym((run << 4) | size)
            sw.bits(mag, size)
            run = 0
        if run:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _ac_refine_scan(sw: _ScanWriter, blocks, ss: int, se: int, al: int):
    eobrun = 0
    be: list[int] = []  # correction bits buffered across the EOB run

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            sw.sym(nb << 4)
            sw.bits(eobrun & ((1 << nb) - 1), nb)
        for b in be:
            sw.bits(b, 1)
        be.clear()
        eobrun = 0

    for blk in blocks:
        # last newly-nonzero position (abs>>al == 1) in the band
        eobpos = ss - 1
        for k in range(ss, se + 1):
            if (abs(int(blk[k])) >> al) == 1:
                eobpos = k
        run = 0
        br: list[int] = []  # correction bits since the last symbol
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                run += 1
                continue
            # ZRL hoisted to EVERY nonzero position (spec G.1.2.3 /
            # Figure G.10): the run must be reduced below 16 BEFORE a
            # correction bit joins br, or the decoder's ZRL walk and
            # the flushed bits desynchronize; only emitted while a
            # newly-nonzero coefficient still follows (k <= eobpos)
            while run > 15 and k <= eobpos:
                flush_eob()
                sw.sym(0xF0)
                run -= 16
                for b in br:
                    sw.bits(b, 1)
                br.clear()
            if t > 1:  # previously nonzero: correction bit, run untouched
                br.append(t & 1)
                continue
            # newly nonzero
            flush_eob()
            sw.sym((run << 4) | 1)
            sw.bits(1 if v > 0 else 0, 1)
            for b in br:
                sw.bits(b, 1)
            br.clear()
            run = 0
        if run or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_progressive(px: np.ndarray, quality: int = 90,
                       subsample: bool = False) -> bytes:
    """Encode uint8 (h, w) gray / (h, w, 3) RGB → progressive JFIF.

    Scan script (both Annex-G mechanisms exercised): interleaved DC
    first at Al=1, DC refinement to Al=0, then per component AC first
    (Ss=1..63, Al=1) and AC refinement to Al=0 — each entropy scan with
    its own frequency-optimized Huffman table."""
    comp_coefs, samps, qtabs, h, w, mcux, mcuy = \
        _coefs_and_grid(px, quality, subsample)
    nc = len(comp_coefs)
    gray = nc == 1
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"
    qy, qc = qtabs[0], qtabs[-1]
    for tid, qt in enumerate([qy] if gray else [qy, qc]):
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(v) for v in qt.reshape(-1)[ZIGZAG])
    out += b"\xFF\xC2" + (8 + 3 * nc).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hs, vs = samps[ci]
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])

    def emit_scan(comps_in_scan, ss, se, ah, al, body: bytes,
                  tables: list[tuple[int, int, tuple]]):
        for cls, tid, spec in tables:
            bits, vals = spec
            out.extend(b"\xFF\xC4" + (3 + 16 + len(vals)).to_bytes(2, "big"))
            out.extend(bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
        ns = len(comps_in_scan)
        out.extend(b"\xFF\xDA" + (6 + 2 * ns).to_bytes(2, "big") + bytes([ns]))
        for cid, td, ta in comps_in_scan:
            out.extend(bytes([cid, (td << 4) | ta]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(body)

    # --- scan 1: DC first, interleaved, Al=1
    def dc_first(sw: _ScanWriter):
        pred = [0] * nc
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    hs, vs = samps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            dc = int(comp_coefs[ci][my * vs + by,
                                                    mx * hs + bx, 0]) >> 1
                            size, mag = _magnitude(dc - pred[ci])
                            pred[ci] = dc
                            sw.sym(size)
                            sw.bits(mag, size)

    sw = _ScanWriter()
    dc_first(sw)
    sw.start_emit()
    dc_first(sw)
    sw.bw.flush()
    spec = build_optimal_huffman(sw.freq)
    emit_scan([(ci + 1, 0, 0) for ci in range(nc)], 0, 0, 0, 1,
              bytes(sw.bw.out), [(0, 0, spec)])

    # --- scan 2: DC refinement (raw bits, no Huffman table)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bw.put(int(comp_coefs[ci][my * vs + by,
                                                  mx * hs + bx, 0]) & 1, 1)
    bw.flush()
    emit_scan([(ci + 1, 0, 0) for ci in range(nc)], 0, 0, 1, 0,
              bytes(bw.out), [])

    # --- per component: AC first (Al=1), then AC refine (Al=0)
    def comp_blocks(ci):
        hs, vs = samps[ci]
        nby, nbx = _comp_dims(h, w, hs, vs, hmax, vmax)
        return [comp_coefs[ci][y, x] for y in range(nby) for x in range(nbx)]

    for ci in range(nc):
        sw = _ScanWriter()
        _ac_first_scan(sw, comp_blocks(ci), 1, 63, 1)
        sw.start_emit()
        _ac_first_scan(sw, comp_blocks(ci), 1, 63, 1)
        sw.bw.flush()
        spec = build_optimal_huffman(sw.freq)
        emit_scan([(ci + 1, 0, 0)], 1, 63, 0, 1, bytes(sw.bw.out),
                  [(1, 0, spec)])
    for ci in range(nc):
        sw = _ScanWriter()
        _ac_refine_scan(sw, comp_blocks(ci), 1, 63, 0)
        sw.start_emit()
        _ac_refine_scan(sw, comp_blocks(ci), 1, 63, 0)
        sw.bw.flush()
        spec = build_optimal_huffman(sw.freq)
        emit_scan([(ci + 1, 0, 0)], 1, 63, 1, 0, bytes(sw.bw.out),
                  [(1, 0, spec)])

    out += b"\xFF\xD9"
    return bytes(out)


# --- progressive decoder --------------------------------------------------------

def _parse_progressive(arr: np.ndarray):
    """Full marker walk: frame header + EVERY scan with the table state
    current at that scan (DHT/DQT/DRI may be redefined between scans)."""
    if len(arr) < 4 or arr[0] != 0xFF or arr[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = []
    h = w = 0
    ri = 0
    scans = []
    progressive = False
    n = len(arr)
    while pos + 2 <= n:
        if arr[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < n and arr[pos + 1] == 0xFF:
            pos += 1
        m = int(arr[pos + 1])
        pos += 2
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        ln = (int(arr[pos]) << 8) | int(arr[pos + 1])
        seg = bytes(arr[pos + 2: pos + ln])
        if m == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qts[tq] = np.frombuffer(seg[o + 1: o + 65],
                                        dtype=np.uint8).astype(np.int64)
                o += 65
        elif m in (0xC0, 0xC1, 0xC2):
            progressive = m == 0xC2
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            for ci in range(seg[5]):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * ci]))
        elif m == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1: o + 17])
                nv = sum(bits)
                huff[(tc, th)] = (bits, list(seg[o + 17: o + 17 + nv]))
                o += 17 + nv
        elif m == 0xDD:
            ri = (seg[0] << 8) | seg[1]
        elif m == 0xDA:
            ns = seg[0]
            sc = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                sc.append((cs, seg[2 + 2 * si] >> 4, seg[2 + 2 * si] & 0xF))
            ss, se, aa = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            data_start = pos + ln
            # entropy data runs to the next true marker (FF + not
            # 00/RST/FF-fill) — found with one vectorized scan
            ffs = np.flatnonzero(arr[data_start:n - 1] == 0xFF)
            nxt = arr[data_start + ffs + 1] if len(ffs) else np.array([], np.uint8)
            stop = ffs[(nxt != 0x00) & (nxt != 0xFF)
                       & ~((nxt >= 0xD0) & (nxt <= 0xD7))]
            p = int(data_start + stop[0]) if len(stop) else n
            scans.append({"comps": sc, "ss": ss, "se": se,
                          "ah": aa >> 4, "al": aa & 0xF,
                          "huff": dict(huff), "ri": ri,
                          "data": bytes(arr[data_start:p])})
            pos = p
            continue
        pos += ln
    if not progressive:
        raise ValueError("not a progressive (SOF2) stream")
    if not comps or not scans:
        raise ValueError("missing frame/scan data")
    return qts, comps, h, w, scans


def decode_progressive(data: bytes) -> np.ndarray:
    """Decode a progressive JFIF stream → (h, w) or (h, w, 3) uint8."""
    arr = np.frombuffer(data, dtype=np.uint8)
    qts, comps, h, w, scans = _parse_progressive(arr)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c[0]: ci for ci, c in enumerate(comps)}
    coefs = [np.zeros((mcuy * vs, mcux * hs, 64), np.int64)
             for _, hs, vs, _ in comps]

    for sc in scans:
        luts = {}
        for cs, td, ta in sc["comps"]:
            ci = by_id[cs]
            if sc["ss"] == 0 and sc["ah"] > 0:
                continue  # DC refinement reads raw bits, no table
            cls, tid = (0, td) if sc["ss"] == 0 else (1, ta)
            if (cls, tid) not in sc["huff"]:
                raise ValueError("missing Huffman table for scan")
            luts[ci] = _build_decode_lut(*sc["huff"][(cls, tid)])
        br = _BitReader(_unstuff(sc["data"]))

        def read_symbol(lut):
            maxlen, lv, ll = lut
            win = br.peek(maxlen)
            v = int(lv[win])
            if v < 0:
                raise ValueError("invalid Huffman code")
            br.pos += int(ll[win])
            return v

        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        ri = sc["ri"]

        def restart():
            if br.pos % 8:
                br.pos += 8 - (br.pos % 8)

        if ss == 0:  # DC scan (interleaved over its components)
            scomps = [by_id[cs] for cs, _, _ in sc["comps"]]
            if len(scomps) > 1 or len(comps) == 1:
                walk_x, walk_y, inter = mcux, mcuy, True
            else:
                ci0 = scomps[0]
                _, hs, vs, _ = comps[ci0]
                nby, nbx = _comp_dims(h, w, hs, vs, hmax, vmax)
                walk_x, walk_y, inter = nbx, nby, False
            pred = {ci: 0 for ci in scomps}
            unit = 0
            for my in range(walk_y):
                for mx in range(walk_x):
                    if ri and unit and unit % ri == 0:
                        restart()
                        pred = {ci: 0 for ci in scomps}
                    unit += 1
                    for ci in scomps:
                        _, hs, vs, _ = comps[ci]
                        if inter:
                            cells = [(my * vs + by, mx * hs + bx)
                                     for by in range(vs) for bx in range(hs)]
                        else:
                            cells = [(my, mx)]
                        for (yy, xx) in cells:
                            if ah == 0:
                                size = read_symbol(luts[ci])
                                diff = _extend(br.read(size), size) if size else 0
                                pred[ci] += diff
                                coefs[ci][yy, xx, 0] = pred[ci] << al
                            else:
                                if br.read(1):
                                    coefs[ci][yy, xx, 0] |= 1 << al
        else:  # AC scan — always one component, non-interleaved
            if len(sc["comps"]) != 1:
                raise ValueError("interleaved AC scan is illegal (G.1.1.1)")
            ci = by_id[sc["comps"][0][0]]
            _, hs, vs, _ = comps[ci]
            nby, nbx = _comp_dims(h, w, hs, vs, hmax, vmax)
            lut = luts[ci]
            eobrun = 0
            p1 = 1 << al
            m1 = -1 << al
            unit = 0
            for yy in range(nby):
                for xx in range(nbx):
                    if ri and unit and unit % ri == 0:
                        restart()
                        eobrun = 0
                    unit += 1
                    blk = coefs[ci][yy, xx]
                    if ah == 0:  # first scan for this band
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = read_symbol(lut)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            blk[k] = _extend(br.read(s), s) << al
                            k += 1
                    else:  # refinement scan (G.1.2.3)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = read_symbol(lut)
                                r, s = rs >> 4, rs & 0xF
                                sval = 0
                                if s == 0:
                                    if r != 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += br.read(r)
                                        break
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "refinement symbol size != 1")
                                    sval = p1 if br.read(1) else m1
                                while k <= se:
                                    v = int(blk[k])
                                    if v:
                                        if br.read(1) and not (v & p1):
                                            blk[k] = v + (p1 if v >= 0 else m1)
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if sval:
                                    if k > se:
                                        raise ValueError(
                                            "refinement run past band end")
                                    blk[k] = sval
                                k += 1
                        if eobrun > 0:
                            while k <= se:
                                v = int(blk[k])
                                if v and br.read(1) and not (v & p1):
                                    blk[k] = v + (p1 if v >= 0 else m1)
                                k += 1
                            eobrun -= 1

    # --- dequantize + IDCT + assemble (baseline decoder's conventions)
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        qt = qts[tq][UNZIGZAG].reshape(8, 8)
        nby, nbx = coefs[ci].shape[:2]
        dz = coefs[ci].reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8) * qt
        sp = _idct(dz.astype(np.float64)) + 128.0
        plane = sp.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(nby * 8, nbx * 8)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])
    if len(planes) == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    yy, cb, cr = (p[:h, :w] for p in planes)
    r = yy + 1.402 * (cr - 128.0)
    g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yy + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)
