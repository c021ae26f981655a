"""Multimodal payload stages: opaque binary columns + typed metadata.

Images are first-class in this engine (real codecs in kernels/image.py,
exercised by the flagship build). Audio and video payloads follow the
same pattern — an opaque ``binary`` column plus typed metadata columns
— but no audio/video codec library exists in this sandbox, so the
*decode* steps below are STUBS (clearly marked): the Ray-side plumbing
(schemas, actor-pool signatures, batch sizing for wide binary rows,
output layout) is real and tested; the codec body raises
``NotImplementedError`` unless the deterministic fake is requested.

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
        if not self.fake:
            raise NotImplementedError(
                "no audio codec library in this sandbox; real decode "
                "(e.g. pyav/soundfile) plugs in here")
        h = splitmix64(np.frombuffer(buf[:8].ljust(8, b"\0"), dtype=np.uint64)
                       + np.arange(max(n_samples, 1), dtype=np.uint64))
        return (h % np.uint64(65536)).astype(np.float64) / 32768.0 - 1.0

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = np.empty((t.num_rows, self.n_mel))
        for i in range(t.num_rows):
            x = self._decode(bytes(t.column("bytes")[i].as_py() or b""),
                             t.column("codec")[i].as_py(),
                             int(t.column("n_samples")[i].as_py()))
            # band-energy features over equal splits (stands in for mel)
            bands = np.array_split(x, self.n_mel)
            feats[i] = [float(np.sqrt(np.mean(b * b))) if len(b) else 0.0 for b in bands]
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
        if not self.fake:
            raise NotImplementedError(
                "no video codec library in this sandbox; real frame "
                "decode (e.g. pyav) plugs in here")
        seed = splitmix64(np.array([len(buf) * 131071 + idx], dtype=np.uint64))[0]
        rng_vals = splitmix64(np.uint64(seed) + np.arange(h * w * 3, dtype=np.uint64))
        return (rng_vals % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..kernels import image as imk

        vids, frames, phashes = [], [], []
        for i in range(t.num_rows):
            n_frames = int(t.column("n_frames")[i].as_py())
            w = int(t.column("w")[i].as_py())
            h = int(t.column("h")[i].as_py())
            buf = bytes(t.column("bytes")[i].as_py() or b"")
            picks = np.linspace(0, max(n_frames - 1, 0), self.k).astype(int)
            for f in picks:
                img = self._decode_frame(buf, int(f), w, h)
                vids.append(t.column("video_id")[i].as_py())
                frames.append(int(f))
                phashes.append(np.uint64(imk.phash64(img)).astype(np.int64))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_idx": pa.array(frames, pa.int32()),
            "frame_phash": pa.array(phashes, pa.int64()),
        })
