"""Manifest at fleet width (VERDICT r3 item 5): SCALE.md claims 10^5-10^6
per-fragment records list "in seconds" — prove it with a measured bound.

Measured on this host (tools note, r4): listdir of 1e5 records 0.03 s,
resume set-difference 0.04 s, full records() JSON parse 1.9 s — far
under the 10 s bar, so no manifest-directory sharding is needed. The
resume path (completed_fragments + set difference) never parses record
bodies; only compaction reads them all, once."""

import json
import os
import time

from hand_index_ray.state.manifest import Manifest

N = 100_000


def _synthesize(manifest_dir: str, n: int) -> None:
    # plain writes (no per-record fsync) — simulating an EXISTING
    # manifest left by a fleet; write_record's atomicity is covered by
    # test_kill_resume.py
    os.makedirs(manifest_dir, exist_ok=True)
    rec = {"fragment_id": 0, "input_path": "frag.parquet", "row_count": 10,
           "status": "done",
           "partitions": [{"cell": 123, "path": "cell=123/p.parquet",
                           "row_count": 10, "bytes": 1000, "minx": 0.0,
                           "miny": 0.0, "maxx": 1.0, "maxy": 1.0}]}
    for i in range(n):
        rec["fragment_id"] = i
        with open(os.path.join(manifest_dir, f"frag-{i:06d}.json"), "w") as f:
            json.dump(rec, f)


def test_resume_set_difference_at_fleet_width(tmp_path):
    idx = str(tmp_path / "bigidx")
    man = Manifest(idx)
    _synthesize(man.dir, N)

    t0 = time.time()
    done = man.completed_fragments()
    todo = set(range(N + 20_000)) - done
    elapsed = time.time() - t0
    assert len(done) == N and len(todo) == 20_000
    # the 10 s bar from VERDICT r3 item 5 — with headroom: the listing
    # path is O(#entries) stat-free readdir + int parse
    assert elapsed < 10.0, f"resume listing took {elapsed:.1f}s at {N} records"


def test_records_parse_at_fleet_width_bounded(tmp_path):
    """Full record-body parse (the compaction path) stays bounded too —
    it runs once per compaction, not per query."""
    idx = str(tmp_path / "bigidx2")
    man = Manifest(idx)
    _synthesize(man.dir, N // 4)  # 25k: keeps suite wall-time sane
    t0 = time.time()
    recs = man.records()
    elapsed = time.time() - t0
    assert len(recs) == N // 4
    assert elapsed < 10.0, f"records() took {elapsed:.1f}s"
