"""Image-embedding pipeline: decode → embed (actor pool) → ANN.

Bridges the image side to the similarity-search operators: an
actor-pool ``map_batches`` stage that decodes tiles and emits an
L2-normalized embedding per row (the batched-model-inference shape —
a real model would load in ``__init__`` exactly where the deterministic
embedder sits), plus duplicate-tile detection over those embeddings
reusing pipelines/ann.py.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import DEFAULT, EngineConfig
from ..kernels import image as imk


class TileEmbedder:
    """Actor-pool stage: bytes → embedding (list<float64>).

    ``__init__`` is where a real model (ONNX/torch) would load once per
    actor; here the deterministic block-feature embedder needs no
    weights but keeps the exact signature and batch contract."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, t: pa.Table) -> pa.Table:
        bts = t.column("bytes")
        fmts = t.column("fmt").to_pylist()
        ws = t.column("w").to_numpy()
        hs = t.column("h").to_numpy()
        embs = []
        for i in range(t.num_rows):
            img = imk.decode(bts[i].as_buffer(), fmts[i], w=int(ws[i]), h=int(hs[i]))
            embs.append(imk.embed_tile(img, self.grid))
        return pa.table({
            "image_id": t.column("image_id"),
            "embedding": pa.array([e.tolist() for e in embs],
                                  pa.list_(pa.float64())),
        })


def embed_images(source: "str | ray.data.Dataset", grid: int = 4,
                 cfg: EngineConfig = DEFAULT) -> ray.data.Dataset:
    """images table → (image_id, embedding) Dataset."""
    from .build import list_fragments

    from .build import pool_size

    if isinstance(source, ray.data.Dataset):
        ds = source
    else:
        ds = ray.data.read_parquet(list_fragments(source))
    return ds.map_batches(TileEmbedder, fn_constructor_args=(grid,),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=cfg.decode_batch_size,
                          concurrency=pool_size(cfg.encode_concurrency))


def duplicate_tiles(source: "str | ray.data.Dataset", threshold: float = 0.9999,
                    cfg: EngineConfig = DEFAULT) -> pd.DataFrame:
    """Near-duplicate tile pairs by embedding cosine (LSH buckets +
    exact verify) — the image-payload analog of document dedup.
    Returns (id_a, id_b, sim) with string tile ids."""
    from .ann import dup_pairs

    emb = embed_images(source, cfg=cfg)

    # ann.dup_pairs keys on an integer id column; map image ids
    def add_int_id(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.cast(pc.utf8_slice_codeunits(t.column("image_id"), 4, 99), pa.int64())
        return t.append_column("vec_id", idx)

    with_ids = emb.map_batches(add_int_id, batch_format="pyarrow")
    pairs = dup_pairs(with_ids, threshold=threshold)
    pairs["id_a"] = pairs["id_a"].map(lambda i: f"img-{i:09d}")
    pairs["id_b"] = pairs["id_b"].map(lambda i: f"img-{i:09d}")
    return pairs
