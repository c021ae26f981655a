"""Corpus-curation pipeline (pipelines/curate.py): filter → dedup →
split composition, hive-partitioned split write, near-dup removal."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from hand_index_ray.pipelines.curate import (curate_corpus, drop_near_dups,
                                             prefix_fingerprint, write_splits)


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    rows = []
    for i in range(60):
        body = " ".join(f"w{(i * 7 + j) % 23}" for j in range(40))
        rows.append({"doc_id": i, "text": f"Header {i % 5}! " + body,
                     "lang": "en" if i % 3 else "fr"})
    # short docs that must be filtered out
    for i in range(60, 70):
        rows.append({"doc_id": i, "text": "too short", "lang": "en"})
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)


def test_prefix_fingerprint_groups_shared_prefixes(docs):
    fp = prefix_fingerprint(
        curate_docs_norm(docs), col="norm", n_tokens=2).to_pandas()
    # docs sharing (header i%5, first body token) collide on the prefix key
    assert fp.groupby("pfp").size().max() > 1


def curate_docs_norm(ds):
    from hand_index_ray.pipelines import text as tx

    return tx.normalize_text(ds, col="text", out="norm")


def test_curate_corpus_filters_dedups_splits(docs):
    cur = curate_corpus(docs, min_tokens=10, prefix_tokens=3).to_pandas()
    # short docs dropped
    assert not set(range(60, 70)) & set(cur.doc_id)
    # dedup kept the smallest doc_id per prefix key
    assert cur.groupby("pfp").size().max() == 1
    first_per_key = cur.sort_values("doc_id").groupby("pfp").doc_id.min()
    assert set(cur.doc_id) == set(first_per_key)
    # split column present with valid values only
    assert set(cur.split) <= {"train", "val", "test"}
    # deterministic: rerun gives identical rows
    cur2 = curate_corpus(docs, min_tokens=10, prefix_tokens=3).to_pandas()
    pd.testing.assert_frame_equal(
        cur.sort_values("doc_id").reset_index(drop=True),
        cur2.sort_values("doc_id").reset_index(drop=True), check_like=True)


def test_write_splits_partitioned(docs, tmp_path):
    import pyarrow.parquet as pq

    cur = curate_corpus(docs, min_tokens=10, prefix_tokens=8)
    out = str(tmp_path / "corpus")
    counts = write_splits(cur, out)
    assert sum(counts.values()) == cur.count()
    for split, n in counts.items():
        sub = os.path.join(out, f"split={split}")
        assert os.path.isdir(sub)
        got = sum(pq.read_table(os.path.join(sub, f)).num_rows
                  for f in os.listdir(sub) if f.endswith(".parquet"))
        assert got == n


def test_drop_near_dups_removes_larger_id(ray_session):
    import ray.data

    base = " ".join(f"tok{j}" for j in range(60))
    rows = [{"doc_id": 1, "text": base, "lang": "en"},
            {"doc_id": 2, "text": base + " extra", "lang": "en"},  # near-dup of 1
            {"doc_id": 3, "text": " ".join(f"zz{j * 17}" for j in range(60)),
             "lang": "en"}]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    kept = drop_near_dups(ds, threshold=0.5).to_pandas()
    assert set(kept.doc_id) == {1, 3}


def test_cli_curate(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    docs = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "corpus")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "hand_index_ray", "curate",
         "--input", docs, "--out-dir", out, "--min-tokens", "30"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0 and set(res["splits"]) <= {"train", "val", "test"}
    got = sum(pq.read_table(os.path.join(out, d)).num_rows
              for d in os.listdir(out) if d.startswith("split="))
    assert got == res["rows"]
