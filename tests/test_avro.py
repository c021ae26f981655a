"""Avro OCF codec + source (kernels/avro.py, sources/avro_src.py;
driver query q180). The vectorized all-varint block path must be
bit-identical to the scalar cursor path."""

import numpy as np
import pyarrow as pa
import pytest

from hand_index_ray.kernels import avro as avrolib
from hand_index_ray.sources import avro_src

SCHEMA_V = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "flag", "type": "boolean"},
    {"name": "cat", "type": "int"},
    {"name": "opt", "type": ["null", "long"]}]}


def _rows(n):
    return [{"id": i * 7 - 3_000_000_000, "flag": i % 3 == 0,
             "cat": i % 5, "opt": None if i % 4 == 0 else i * i}
            for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_varint_union_roundtrip(tmp_path, codec):
    rows = _rows(2500)
    p = str(tmp_path / "t.avro")
    avrolib.write_ocf(p, SCHEMA_V, rows, codec=codec, block_rows=700)
    _, cols = avrolib.read_ocf(p)
    assert list(cols["id"]) == [r["id"] for r in rows]
    assert list(cols["flag"]) == [r["flag"] for r in rows]
    assert list(cols["cat"]) == [r["cat"] for r in rows]
    for i, r in enumerate(rows):
        if r["opt"] is None:
            assert not cols["opt__present"][i]
        else:
            assert cols["opt__present"][i]
            assert cols["opt"][i] == r["opt"]


def test_vectorized_matches_scalar_cursor(tmp_path):
    rows = _rows(999)
    p = str(tmp_path / "t.avro")
    avrolib.write_ocf(p, SCHEMA_V, rows, codec="null", block_rows=256)
    schema, fast = avrolib.read_ocf(p)
    kinds = avrolib._field_kinds(schema)
    # force the scalar path over the same encoded bytes
    data = b"".join(avrolib.encode_record(kinds, r) for r in rows)
    slow = avrolib._decode_block_scalar(data, kinds, len(rows))
    assert list(fast["id"]) == slow["id"]
    assert list(fast["flag"]) == slow["flag"]
    for i in range(len(rows)):
        exp = slow["opt"][i]
        if exp is None:
            assert not fast["opt__present"][i]
        else:
            assert fast["opt"][i] == exp


def test_string_double_bytes_schema(tmp_path):
    schema = {"type": "record", "name": "r2", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "blob", "type": "bytes"}]}
    rows = [{"id": i, "name": f"row-{i}-é", "score": i * 0.5,
             "blob": bytes([i % 256, 255, 128])} for i in range(300)]
    p = str(tmp_path / "s.avro")
    avrolib.write_ocf(p, schema, rows, codec="deflate", block_rows=128)
    _, cols = avrolib.read_ocf(p)
    assert cols["name"] == [r["name"] for r in rows]
    assert cols["score"] == [r["score"] for r in rows]
    assert cols["blob"] == [r["blob"] for r in rows]


def test_dataset_source_nullable_column(tmp_path, ray_session):
    rows = _rows(400)
    p = str(tmp_path / "d.avro")
    avrolib.write_ocf(p, SCHEMA_V, rows, codec="deflate")
    ds = avro_src.read_avro([p])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df) == 400
    assert df["opt"].isna().sum() == sum(1 for r in rows
                                         if r["opt"] is None)
    assert df["flag"].dtype == bool


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"nope" + b"\x00" * 32)
    with pytest.raises(ValueError):
        avrolib.read_ocf(str(p))
