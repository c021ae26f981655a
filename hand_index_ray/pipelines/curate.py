"""Corpus curation: the flagship training-data pipeline, composed from
the engine's own operators in one streaming chain —

  normalize → quality features → filter → fingerprint dedup →
  (optional MinHash near-dup removal) → deterministic split →
  partitioned write

Every SQL-expressible stage keeps its oracle parity (normalize: q54,
token counting: q18, dedup-first: q07/q20, hash split: q45), so the
whole composition is driver-verifiable end to end (q57). The near-dup
stage reuses ``text.minhash_lsh_pairs`` (banded LSH, exactly-once
emission) and is off by default because signature permutations are not
SQL-expressible.

Scale shape: the chain is map-only until the dedup's single
hash-bucket shuffle on the (16-byte) fingerprint; the split assignment
is map-only; the write streams one directory per split. Nothing
materializes the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import relational as rel
from . import text as tx


def prefix_fingerprint(ds: ray.data.Dataset, col: str = "norm",
                       n_tokens: int = 8,
                       out: str = "pfp") -> ray.data.Dataset:
    """md5 of the first ``n_tokens`` normalized tokens — a coarse
    content key that catches shared-prefix near-copies exact dedup
    misses (DuckDB oracle:
    ``md5(array_to_string(list_slice(string_split(norm,' '),1,n),' '))``)."""

    def f(t: pa.Table) -> pa.Table:
        toks = pc.list_slice(pc.split_pattern(t[col], " "), 0, n_tokens)
        joined = pc.binary_join(toks, " ")
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in joined.to_pylist()]
        return t.append_column(out, pa.array(fps, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def curate_corpus(ds: ray.data.Dataset, *, min_tokens: int = 30,
                  prefix_tokens: int = 8,
                  splits: "dict[str, float] | None" = None,
                  near_dup: bool = False,
                  near_dup_threshold: float = 0.8) -> ray.data.Dataset:
    """documents (doc_id, text, lang, ...) → curated rows
    (doc_id, lang, split, n_tokens, pfp).

    Keep rule: whitespace token count ≥ ``min_tokens`` (q18/q19
    semantics); exact-prefix dedup keeps the smallest doc_id per
    fingerprint; the split is the q45 md5-per-mille deal over doc_id.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}

    def tokens(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        return t.append_column("n_tokens", n)

    ds = ds.map_batches(tokens, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"],
                                            pa.scalar(min_tokens, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = tx.normalize_text(ds, col="text", out="norm")
    ds = prefix_fingerprint(ds, col="norm", n_tokens=prefix_tokens, out="pfp")
    ds = ds.drop_columns(["text", "norm"])
    ds = rel.dedup_first(ds, key="pfp", order_col="doc_id")
    if near_dup:
        ds = drop_near_dups(ds, threshold=near_dup_threshold)
    return rel.hash_split(ds, "doc_id", splits)


def drop_near_dups(ds: ray.data.Dataset, threshold: float = 0.8,
                   text_ds: "ray.data.Dataset | None" = None) -> ray.data.Dataset:
    """Remove the larger doc_id of every verified MinHash near-dup
    pair. Requires the text column; when the curated set has already
    dropped it, pass the original documents as ``text_ds`` (joined by
    doc_id). The pair set streams (text.minhash_lsh_pairs returns a
    Dataset); only the drop-id column is collected — at 100 TB the
    drop set is the pair count, not the corpus."""
    src = text_ds if text_ds is not None else ds
    pairs = tx.minhash_lsh_pairs(src, jaccard_threshold=threshold)
    drop = pairs.map_batches(
        lambda t: pa.table({"doc_id": pc.max_element_wise(t["id_a"], t["id_b"])}),
        batch_format="pyarrow", zero_copy_batch=True)
    drop_ids = pa.array(sorted(set(drop.to_pandas()["doc_id"].tolist())))
    if len(drop_ids) == 0:
        return ds
    return rel.semi_join(ds, "doc_id", drop_ids, anti=True)


def write_splits(ds: ray.data.Dataset, out_dir: str) -> "dict[str, int]":
    """Stream the curated corpus to hive-partitioned parquet
    (``split=train/``...) in ONE pass — per-split training readers
    then prune at the directory level. Returns per-split row counts
    read back from the written footers (cheap: metadata only)."""
    import os

    import pyarrow.parquet as pq

    ds.write_parquet(out_dir, partition_cols=["split"])
    counts: "dict[str, int]" = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("split="):
            continue
        sub = os.path.join(out_dir, name)
        n = sum(pq.ParquetFile(os.path.join(sub, f)).metadata.num_rows
                for f in os.listdir(sub) if f.endswith(".parquet"))
        counts[name.split("=", 1)[1]] = n
    return counts
