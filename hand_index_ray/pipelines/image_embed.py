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


def exact_tile_dups(source: "str | ray.data.Dataset",
                    cfg: EngineConfig = DEFAULT) -> ray.data.Dataset:
    """Exact duplicate tile pairs by decoded-pixel digest.

    Decode each tile once (stateless tasks), emit (image_id, md5 of the
    raw RGB array); the one shuffle moves only those slim rows, keyed
    on the digest; identical pixels ⇒ identical digest regardless of
    which lossless codec stored them. Returns
    Dataset[(id_a, id_b)] with id_a < id_b — all pairs per digest
    group. The image-payload analog of text exact_dedup (reference A4),
    and the driver-oracled q33 path (planted dups are SQL-derivable)."""
    import hashlib

    from .build import list_fragments

    if isinstance(source, ray.data.Dataset):
        ds = source
    else:
        ds = ray.data.read_parquet(list_fragments(source))

    def digest(t: pa.Table) -> pa.Table:
        bts = t.column("bytes")
        fmts = t.column("fmt").to_pylist()
        ws = t.column("w").to_numpy()
        hs = t.column("h").to_numpy()
        out = []
        for i in range(t.num_rows):
            px = imk.decode(bts[i].as_buffer(), fmts[i], w=int(ws[i]), h=int(hs[i]))
            out.append(hashlib.md5(px.tobytes()).hexdigest())
        return pa.table({"image_id": t.column("image_id"),
                         "pxd": pa.array(out, pa.string())})

    slim = ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=cfg.decode_batch_size)

    def pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        ids = sorted(g["image_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    from ..relational import grouped_apply_bucketed

    return grouped_apply_bucketed(slim, ["pxd"], pairs, min_group_size=2)


def duplicate_tiles(source: "str | ray.data.Dataset", threshold: float = 0.9999,
                    cfg: EngineConfig = DEFAULT) -> pd.DataFrame:
    """Near-duplicate tile pairs by embedding cosine (LSH buckets +
    exact verify) — the image-payload analog of document dedup.
    Returns Dataset[(id_a, id_b, sim)] with string tile ids (streamed;
    the pair set never lands on the driver)."""
    from .ann import dup_pairs

    emb = embed_images(source, cfg=cfg)

    # ann.dup_pairs keys on an integer id column; map image ids
    def add_int_id(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.cast(pc.utf8_slice_codeunits(t.column("image_id"), 4, 99), pa.int64())
        return t.append_column("vec_id", idx)

    with_ids = emb.map_batches(add_int_id, batch_format="pyarrow")
    pairs = dup_pairs(with_ids, threshold=threshold)

    def to_tile_ids(t: pa.Table) -> pa.Table:
        a = [f"img-{int(i):09d}" for i in t.column("id_a").to_pylist()]
        b = [f"img-{int(i):09d}" for i in t.column("id_b").to_pylist()]
        out = t.set_column(t.schema.get_field_index("id_a"), "id_a", pa.array(a, pa.string()))
        return out.set_column(out.schema.get_field_index("id_b"), "id_b", pa.array(b, pa.string()))

    return pairs.map_batches(to_tile_ids, batch_format="pyarrow")
