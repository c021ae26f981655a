"""JSONL / CSV document sources and sinks.

Training corpora commonly arrive as JSON-Lines or CSV shards, not
parquet. These are thin, schema-normalizing wrappers over Ray Data's
native distributed readers (`ray.data.read_json` / `read_csv` — each
file is a read task, so ingestion parallelism = shard count, the same
scale shape as the parquet sources): the reader output is coerced to
the engine's documents schema (doc_id int64, text string, plus
whatever metadata columns survive ``columns=``), so every downstream
operator (normalize, dedup, curate, token stats) runs unchanged.

Reference parity note: the reference ingests only spatial containers
(GPKG/GeoJSON, load.py:119-142) — text-file ingestion is part of the
beyond-reference training-data surface (SURVEY §2 extensions).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_REQUIRED = ("doc_id", "text")


def _normalize(ds: ray.data.Dataset,
               columns: "list[str] | None") -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        for c in _REQUIRED:
            if c not in t.schema.names:
                raise ValueError(
                    f"document source is missing required column {c!r} "
                    f"(found {t.schema.names})")
        out = t
        i = out.schema.get_field_index("doc_id")
        if not pa.types.is_int64(out.schema.field(i).type):
            out = out.set_column(i, "doc_id", pc.cast(out["doc_id"], pa.int64()))
        j = out.schema.get_field_index("text")
        if not pa.types.is_string(out.schema.field(j).type):
            out = out.set_column(j, "text", pc.cast(out["text"], pa.string()))
        if columns:
            out = out.select([c for c in columns if c in out.schema.names])
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def read_documents_jsonl(path: str,
                         columns: "list[str] | None" = None) -> ray.data.Dataset:
    """JSONL shards → documents Dataset (one read task per file)."""
    return _normalize(ray.data.read_json(path), columns)


def read_documents_csv(path: str,
                       columns: "list[str] | None" = None) -> ray.data.Dataset:
    """CSV shards → documents Dataset (one read task per file)."""
    return _normalize(ray.data.read_csv(path), columns)


def write_documents_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """documents Dataset → JSONL shards (streaming, one file per
    block — interchange with non-Arrow consumers)."""
    ds.write_json(out_dir)
