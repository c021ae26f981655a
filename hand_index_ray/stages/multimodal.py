"""Multimodal payload stages: opaque binary columns + typed metadata.

Images are first-class in this engine (real codecs in kernels/image.py,
exercised by the flagship build). Audio and video payloads follow the
same pattern — an opaque ``binary`` column plus typed metadata columns.
These decode for real, from-spec, in pure numpy: RIFF/WAVE PCM + IEEE
float (kernels/audio.py), FLAC compressed audio (kernels/flac.py —
Rice-partitioned FIXED/LPC subframes, stereo decorrelation, CRC
verification), and YUV4MPEG2 / Y4M video (kernels/video.py). LOSSY
codecs (mp3/aac/h264/...) need a codec library this sandbox doesn't
have, so those paths are STUBS (clearly marked): the body raises
``NotImplementedError`` unless the
deterministic fake is requested; the Ray-side plumbing (schemas,
actor-pool signatures, batch sizing for wide binary rows, output
layout) is shared with the real paths and tested.

Schema conventions:
  audio:  (clip_id: string, bytes: binary, sample_rate: int32,
           n_samples: int64, codec: string)
  video:  (video_id: string, bytes: binary, w: int32, h: int32,
           fps: float64, n_frames: int32, codec: string)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.synth import splitmix64

AUDIO_SCHEMA = pa.schema([
    ("clip_id", pa.string()), ("bytes", pa.binary()),
    ("sample_rate", pa.int32()), ("n_samples", pa.int64()),
    ("codec", pa.string()),
])

VIDEO_SCHEMA = pa.schema([
    ("video_id", pa.string()), ("bytes", pa.binary()),
    ("w", pa.int32()), ("h", pa.int32()), ("fps", pa.float64()),
    ("n_frames", pa.int32()), ("codec", pa.string()),
])


class AudioFeatures:
    """Actor-pool stage: decode audio → fixed-size feature vector.

    ``fake=True`` uses a deterministic stand-in decoder (splitmix64 PRN
    samples keyed by the payload hash) so the full pipeline — batch
    sizing, schema, downstream aggregation — runs and is testable in
    this sandbox. With ``fake=False`` the real codec hook raises
    NotImplementedError (no audio library available here; on a real
    cluster, load the codec once per actor in __init__)."""

    def __init__(self, n_mel: int = 16, fake: bool = True):
        self.n_mel = n_mel
        self.fake = fake
        # real implementation would load codec/filterbank state here,
        # once per actor

    def _decode(self, buf: bytes, codec: str, n_samples: int) -> np.ndarray:
        # gate on the RIFF magic, not the codec label: fake-mode tables
        # may label synthetic non-RIFF payloads "wav" and still expect
        # the deterministic fake samples
        if buf[:4] == b"RIFF":
            # REAL from-spec decode (kernels/audio.py) — uncompressed
            # RIFF/WAVE needs no external library
            from ..kernels.audio import decode_wav

            return decode_wav(buf)[0]
        if buf[:4] == b"fLaC":
            # REAL from-spec COMPRESSED decode (kernels/flac.py):
            # Rice-partitioned FIXED/LPC subframes, CRC-verified
            from ..kernels.flac import decode_flac_to_float

            return decode_flac_to_float(buf)[0]
        if not self.fake:
            raise NotImplementedError(
                f"no codec library for lossy compressed audio ({codec!r}) "
                "in this sandbox; real decode (e.g. pyav/soundfile) plugs "
                "in here — 'wav' and 'flac' decode natively")
        h = splitmix64(np.frombuffer(buf[:8].ljust(8, b"\0"), dtype=np.uint64)
                       + np.arange(max(n_samples, 1), dtype=np.uint64))
        return (h % np.uint64(65536)).astype(np.float64) / 32768.0 - 1.0

    def __call__(self, t: pa.Table) -> pa.Table:
        # decode per row (codec work is inherently per payload), then
        # compute ALL band energies in one vectorized reduceat over the
        # concatenated sample buffer (no per-band Python loop)
        n = t.num_rows
        bts = t.column("bytes")
        codecs = t.column("codec").to_pylist()
        nsamp = t.column("n_samples").to_numpy()
        waves = [self._decode(bytes(bts[i].as_py() or b""), codecs[i], int(nsamp[i]))
                 for i in range(n)]
        lens = np.array([len(x) for x in waves], dtype=np.int64)
        allx = np.concatenate(waves) if waves else np.empty(0)
        row_off = np.concatenate([[0], np.cumsum(lens)])
        # band boundaries per row: np.array_split semantics (first
        # len%n_mel bands get one extra sample)
        k = self.n_mel
        base = lens // k
        extra = lens % k
        sizes = base[:, None] + (np.arange(k)[None, :] < extra[:, None])
        bounds = np.concatenate(
            [row_off[:-1, None], row_off[:-1, None] + np.cumsum(sizes, axis=1)], axis=1)
        starts = bounds[:, :-1].ravel()
        ends = bounds[:, 1:].ravel()
        sq = np.concatenate([[0.0], np.cumsum(allx * allx)])
        cnt = (ends - starts).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            feats = np.sqrt((sq[ends] - sq[starts]) / np.where(cnt == 0, 1.0, cnt))
        feats = np.where(cnt == 0, 0.0, feats).reshape(n, k)
        return pa.table({
            "clip_id": t.column("clip_id"),
            "features": pa.array(list(feats), pa.list_(pa.float64())),
        })


class FrameSampler:
    """Actor-pool stage: sample ``k`` frames per video and emit one row
    per (video, frame) — a flat_map-shaped map_batches. Decode is a
    deterministic fake under the same contract as AudioFeatures."""

    def __init__(self, k: int = 3, fake: bool = True):
        self.k = k
        self.fake = fake

    def _decode_frame(self, buf: bytes, idx: int, w: int, h: int) -> np.ndarray:
        if buf[:9] == b"YUV4MPEG2":
            # REAL from-spec decode (kernels/video.py) — frame located
            # by offset arithmetic, no scan through earlier frames
            from ..kernels.video import decode_y4m_frame

            return decode_y4m_frame(buf, idx)
        if not self.fake:
            raise NotImplementedError(
                "no codec library for inter-coded compressed video in "
                "this sandbox; real frame decode (e.g. pyav) plugs in "
                "here — uncompressed Y4M and MJPEG AVI decode natively")
        seed = splitmix64(np.array([len(buf) * 131071 + idx], dtype=np.uint64))[0]
        rng_vals = splitmix64(np.uint64(seed) + np.arange(h * w * 3, dtype=np.uint64))
        return (rng_vals % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..kernels import avi as avk
        from ..kernels import image as imk
        from ..kernels import jpeg as jpk

        n = t.num_rows
        nf = t.column("n_frames").to_numpy()
        ws = t.column("w").to_numpy()
        hs = t.column("h").to_numpy()
        ids = t.column("video_id").to_pylist()
        bts = t.column("bytes")
        # decode frames per row (codec work), but batch the phash kernel
        # per (h, w) group — one vectorized DCT pass per shape, like the
        # image decode stage (stages/encode.py). MJPEG AVI payloads pool
        # their sampled frames across the WHOLE batch into one
        # jpeg.decode_batch call (one lockstep Huffman machine).
        vids, frames, shapes, imgs = [], [], [], []
        mjpeg_slots: list[int] = []
        mjpeg_blobs: list[bytes] = []
        for i in range(n):
            buf = bytes(bts[i].as_py() or b"")
            picks = np.linspace(0, max(int(nf[i]) - 1, 0), self.k).astype(int)
            if avk.is_avi(buf):
                # REAL compressed video (kernels/avi.py): chunk-scan
                # seek, decode deferred to the pooled batch below
                for f, jb in zip(picks,
                                 avk.extract_frame_blobs(buf, picks.tolist())):
                    vids.append(ids[i])
                    frames.append(int(f))
                    shapes.append((int(hs[i]), int(ws[i])))
                    mjpeg_slots.append(len(imgs))
                    mjpeg_blobs.append(jb)
                    imgs.append(None)
                continue
            for f in picks:
                vids.append(ids[i])
                frames.append(int(f))
                shapes.append((int(hs[i]), int(ws[i])))
                imgs.append(self._decode_frame(buf, int(f), int(ws[i]), int(hs[i])))
        if mjpeg_slots:
            for pos, im in zip(mjpeg_slots, jpk.decode_batch(mjpeg_blobs)):
                imgs[pos] = np.stack([im] * 3, axis=-1) if im.ndim == 2 else im
        phashes = np.empty(len(imgs), dtype=np.int64)
        groups: dict[tuple[int, int], list[int]] = {}
        for j, shp in enumerate(shapes):
            groups.setdefault(shp, []).append(j)
        for (gh, gw), idxs in groups.items():
            stack = np.stack([imgs[j] for j in idxs])
            ph, _mean = imk.phash_and_graymean_batch(stack)
            phashes[idxs] = ph.astype(np.int64)
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_idx": pa.array(frames, pa.int32()),
            "frame_phash": pa.array(phashes, pa.int64()),
        })


def silence_runs(ds, threshold: int = 2048, min_run: int = 8):
    """Silence-trim ledger over REAL WAV payloads (AUDIO_SCHEMA rows):
    decode PCM16, mark samples with |v| < ``threshold``, and report
    per clip the number of silent runs of at least ``min_run``
    samples, the total samples inside those runs, and the longest run
    — the detector behind 'trim leading/trailing silence' and 'drop
    dead-air clips' in audio-corpus curation.

    Map-only: decode + one np.diff run-length pass per clip inside the
    batch; one slim row out per clip; never a shuffle."""
    import pyarrow as pa

    from ..kernels.audio import decode_wav

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("clip_id").to_pylist()
        bts = t.column("bytes")
        n_runs = np.zeros(t.num_rows, np.int64)
        n_silent = np.zeros(t.num_rows, np.int64)
        longest = np.zeros(t.num_rows, np.int64)
        for i in range(t.num_rows):
            x, _rate = decode_wav(bytes(bts[i].as_buffer()))
            v = np.round(x * 32768.0).astype(np.int64)
            s = np.abs(v) < threshold
            if not s.any():
                continue
            d = np.diff(np.concatenate(([0], s.view(np.int8), [0])))
            starts = np.flatnonzero(d == 1)
            ends = np.flatnonzero(d == -1)
            runs = ends - starts
            runs = runs[runs >= min_run]
            n_runs[i] = len(runs)
            n_silent[i] = int(runs.sum())
            longest[i] = int(runs.max()) if len(runs) else 0
        return pa.table({"clip_id": pa.array(ids, pa.string()),
                         "n_runs": pa.array(n_runs, pa.int64()),
                         "silent_samples": pa.array(n_silent, pa.int64()),
                         "longest_run": pa.array(longest, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def freeze_frames(ds):
    """Frozen-frame detector over REAL Y4M payloads (VIDEO_SCHEMA
    rows): decode every frame, compare each to its predecessor
    (exact array equality — no fingerprint, no collision caveat), and
    report per clip the number of frozen frames and the longest
    consecutive frozen run — the curation screen for stalled
    screen-recordings and corrupt transcodes.

    Map-only per clip (frames of one clip decode inside one task);
    at 100 TB the clip column partitions the corpus and this stage
    rides the same actor pool as FrameSampler."""
    import pyarrow as pa

    from ..kernels.video import decode_y4m_frame

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("video_id").to_pylist()
        bts = t.column("bytes")
        nf = t.column("n_frames").to_numpy()
        n_freeze = np.zeros(t.num_rows, np.int64)
        longest = np.zeros(t.num_rows, np.int64)
        for i in range(t.num_rows):
            buf = bytes(bts[i].as_buffer())
            prev = None
            run = best = total = 0
            for fidx in range(int(nf[i])):
                fr = decode_y4m_frame(buf, fidx)
                if prev is not None and np.array_equal(fr, prev):
                    total += 1
                    run += 1
                    best = max(best, run)
                else:
                    run = 0
                prev = fr
            n_freeze[i] = total
            longest[i] = best
        return pa.table({"video_id": pa.array(ids, pa.string()),
                         "n_freeze": pa.array(n_freeze, pa.int64()),
                         "longest_freeze": pa.array(longest, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def payload_audit(ds):
    """Metadata-vs-payload integrity audit over REAL WAV decode: decode
    every clip and emit the rows whose actual decoded sample count
    disagrees with the table's ``n_samples`` metadata column — the
    ingestion screen that catches truncated uploads and stale
    catalogs before they poison training shards. Map-only; emits only
    mismatches (empty result = healthy corpus)."""
    import pyarrow as pa

    from ..kernels.audio import decode_wav

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("clip_id").to_pylist()
        bts = t.column("bytes")
        meta = t.column("n_samples").to_numpy()
        actual = np.empty(t.num_rows, np.int64)
        for i in range(t.num_rows):
            x, _rate = decode_wav(bytes(bts[i].as_buffer()))
            actual[i] = len(x)
        bad = actual != meta
        return pa.table({
            "clip_id": pa.array([s for s, b in zip(ids, bad) if b],
                                pa.string()),
            "meta_samples": pa.array(meta[bad], pa.int64()),
            "actual_samples": pa.array(actual[bad], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ulaw_ledger(ds):
    """G.711 μ-law payload ledger: decode each clip's μ-law byte
    stream with the REAL companding kernel (kernels/g711.py) and emit
    the exact decoded-sample sum plus the raw code-byte sum — the
    wire-vs-linear reconciliation a telephony-ingest pipeline runs per
    shard. Map-only, fully vectorized per batch (one concatenated
    decode over every clip's codes, then offset segment sums)."""
    import pyarrow as pa

    from ..kernels.g711 import decode_ulaw

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("clip_id").to_pylist()
        bts = t.column("bytes")
        lens = np.array([len(bts[i].as_buffer()) for i in range(t.num_rows)],
                        dtype=np.int64)
        flat = np.frombuffer(
            b"".join(bytes(bts[i].as_buffer()) for i in range(t.num_rows)),
            dtype=np.uint8)
        dec = decode_ulaw(flat)
        cs = np.concatenate(([0], np.cumsum(dec)))
        ks = np.concatenate(([0], np.cumsum(flat.astype(np.int64))))
        off = np.concatenate(([0], np.cumsum(lens)))
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "dec_sum": pa.array(cs[off[1:]] - cs[off[:-1]], pa.int64()),
            "code_sum": pa.array(ks[off[1:]] - ks[off[:-1]], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def warc_extract(ds, id_col: str = "warc_id"):
    """Web-archive ingest: parse each WARC blob (kernels/warc.py —
    gzip-member or plain), keep response records, and emit per record
    (uri, payload_len, payload adler32) — the extraction pass a
    Common-Crawl-scale text pipeline runs before language ID and
    dedup. Map-only: one WARC file per row; at fleet scale the gzip-
    member framing is what makes these files splittable."""
    import pyarrow as pa
    import zlib as _z

    from ..kernels.warc import decode_warc

    def f(t: pa.Table) -> pa.Table:
        bts = t.column("bytes")
        uris, lens, adl = [], [], []
        for i in range(t.num_rows):
            for r in decode_warc(bytes(bts[i].as_buffer())):
                if r["type"] != "response":
                    continue
                uris.append(r["uri"])
                lens.append(len(r["payload"]))
                adl.append(_z.adler32(r["payload"]))
        return pa.table({"uri": pa.array(uris, pa.string()),
                         "payload_len": pa.array(lens, pa.int64()),
                         "adler32": pa.array(adl, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
