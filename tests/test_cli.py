"""CLI smoke tests (in-process: the CLI guards ray.init so the
session fixture's Ray is reused)."""

import json
import os

import pyarrow.parquet as pq

from hand_index_ray.__main__ import main
from hand_index_ray.sources import synth


def test_cli_build_query_knn(ray_session, smoke_dirs, tmp_path, capsys):
    idx = str(tmp_path / "cli_index")
    assert main(["build", "--images-dir", smoke_dirs["images"],
                 "--output-dir", idx, "--compact"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_built"] == 400
    assert out["compaction"]["cells"] >= 1

    # resume: second build skips everything
    assert main(["build", "--images-dir", smoke_dirs["images"],
                 "--output-dir", idx]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fragments_built"] == 0

    assert main(["bbox", "--index-dir", idx,
                 "--bbox", "-105", "35", "-100", "40"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] >= 0

    assert main(["knn", "--index-dir", idx, "--lon", "-98", "--lat", "36",
                 "-k", "5"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 5


def test_cli_query_and_validate(ray_session, smoke_dirs, tmp_path, capsys):
    ring = synth.roi_polygons()["huge"]
    geojson = tmp_path / "roi.geojson"
    geojson.write_text(json.dumps({
        "type": "Polygon", "coordinates": [ring.tolist() + [ring[0].tolist()]]}))
    cpath = os.path.join(smoke_dirs["vector"], "catchments.parquet")
    outdir = str(tmp_path / "per_catchment")
    assert main(["query", "-g", str(geojson), "-p", cpath,
                 "--vector-dir", smoke_dirs["vector"],
                 "-t", "10.0", "-o", outdir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kept_catchments"] > 0
    assert out["files"] == out["kept_catchments"]
    one = [f for f in os.listdir(outdir) if f.endswith(".parquet")][0]
    t = pq.read_table(os.path.join(outdir, one))
    assert "catchment_id" not in t.column_names

    assert main(["validate", "-g", str(geojson), "-p", cpath, "-t", "10.0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["consistent"]


def test_cli_pipeline_spec(ray_session, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6), pa.int64()),
        # mixed lengths so the filter must actually drop rows
        "text": pa.array(["a b c d e" if i % 2 == 0 else "a b" for i in range(6)],
                         pa.string()),
    }), docs)
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "source": {"parquet": docs},
        "steps": [{"fn": "token_count"},
                  {"kernel": "filter",
                   "params": {"column": "n_tokens", "op": ">=", "value": 5}}],
        "sink": {"path": str(tmp_path / "out")},
    }))
    assert main(["pipeline", "--spec", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pq.read_table(out["sink"]).num_rows == 3


def test_cli_validate_html_map(ray_session, smoke_dirs, tmp_path, capsys):
    """Reference viz parity (query_visualization.py:178-472): the
    validate CLI renders a self-contained SVG-in-HTML QA map with the
    three sets, per-feature tooltips and the count summary — no folium,
    no network."""
    ring = synth.roi_polygons()["huge"]
    geojson = tmp_path / "roi.geojson"
    geojson.write_text(json.dumps({
        "type": "Polygon", "coordinates": [ring.tolist() + [ring[0].tolist()]]}))
    cpath = os.path.join(smoke_dirs["vector"], "catchments.parquet")
    html_path = str(tmp_path / "qa.html")
    assert main(["validate", "-g", str(geojson), "-p", cpath, "-t", "10.0",
                 "--html-out", html_path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sets = out["html"]["sets"]
    assert sets["query"] == 1
    assert sets["kept"] == out["final_geoms"]
    assert sets["kept"] + sets["intersecting"] == out["initial_geoms"]
    page = open(html_path).read()
    assert page.startswith("<!DOCTYPE html>") and "<svg" in page
    assert page.count("<path") == out["initial_geoms"] + 1
    assert "overlap" in page and "kept" in page
    # tooltips carry real catchment ids
    assert "cat-" in page or "overlap" in page
