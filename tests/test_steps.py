"""Extension surface (SURVEY §2.10): kernel registry + Step protocol +
spec-assembled Pipeline — the engine's analog of the reference's
CLI-flag/DDL extension points (load.py:304-322)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def docs_path(tmp_path):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(8), pa.int64()),
        "text": pa.array([f"alpha beta gamma {i}" for i in range(8)], pa.string()),
        "lang": pa.array(["en"] * 8, pa.string()),
    }), p)
    return p


def test_pipeline_from_spec_runs(ray_session, docs_path):
    from hand_index_ray.steps import Pipeline

    spec = {
        "source": {"parquet": docs_path, "columns": ["doc_id", "text"]},
        "steps": [
            {"fn": "token_count"},
            {"kernel": "filter", "params": {"column": "n_tokens", "op": ">=", "value": 4}},
            {"kernel": "select", "params": {"columns": ["doc_id", "n_tokens"]}},
        ],
    }
    out = Pipeline.from_spec(spec).run().to_pandas()
    assert list(out.columns) == ["doc_id", "n_tokens"]
    assert len(out) == 8 and (out["n_tokens"] == 4).all()


def test_pipeline_sink_and_custom_kernel(ray_session, docs_path, tmp_path):
    from hand_index_ray.steps import KERNELS, Pipeline, kernel

    name = "test_upper_kernel"
    if name not in KERNELS:
        @kernel(name)
        def upper(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.set_column(t.schema.get_field_index("text"), "text",
                                pc.utf8_upper(t["text"]))
    sink = str(tmp_path / "out")
    spec = {
        "source": {"parquet": docs_path},
        "steps": [{"kernel": name}],
        "sink": {"path": sink},
    }
    assert Pipeline.from_spec(spec).run() == sink
    back = pq.read_table(sink).to_pandas()
    assert back["text"].str.isupper().all()


def test_actor_pool_kernel_class(ray_session, docs_path):
    from hand_index_ray.steps import Pipeline

    spec = {
        "source": {"parquet": docs_path},
        "steps": [{"kernel": "langid", "batch_size": 4, "concurrency": 2}],
    }
    out = Pipeline.from_spec(spec).run().to_pandas()
    assert "lang_pred" in out.columns or "lang" in out.columns


def test_unknown_kernel_rejected(docs_path):
    from hand_index_ray.steps import Pipeline

    with pytest.raises(ValueError, match="unknown kernel"):
        Pipeline.from_spec({"source": {"parquet": docs_path},
                            "steps": [{"kernel": "nope"}]})
    with pytest.raises(ValueError, match="unknown dataset fn"):
        Pipeline.from_spec({"source": {"parquet": docs_path},
                            "steps": [{"fn": "nope"}]})


def test_duplicate_kernel_rejected():
    from hand_index_ray.steps import KERNELS, kernel

    assert "select" in KERNELS
    with pytest.raises(ValueError, match="already registered"):
        @kernel("select")
        def dup(t):
            return t


def test_pipeline_tiles_source(ray_session, docs_path):
    """The 'tiles' spec source routes through the Lance/Parquet
    container seam (sources/tiles.py) with column pruning."""
    from hand_index_ray.steps import Pipeline

    spec = {
        "source": {"tiles": docs_path, "columns": ["doc_id"]},
        "steps": [],
    }
    out = Pipeline.from_spec(spec).run().to_pandas()
    assert list(out.columns) == ["doc_id"] and len(out) == 8


def test_round2_ops_registered():
    """Extension surface exposes the round-2 operators by name."""
    from hand_index_ray.steps import DATASET_FNS, KERNELS

    for name in ("normalize_text", "hash_split", "lag_delta",
                 "grouped_concat", "grouped_mode", "grouped_nunique",
                 "grouped_approx_distinct", "unnest", "histogram_int",
                 "pivot_sum", "rollup_counts", "curate_corpus"):
        assert name in DATASET_FNS
    for name in ("augment", "tile_embed"):
        assert name in KERNELS and isinstance(KERNELS[name], type)
