"""600k-doc forced-carry minhash benchmark (VERDICT r4 item 5 → r5).

The r4 carry-vs-broadcast comparison ran only at 5k docs, where the
carry path's chained-Dataset fixed cost (two extra hash joins + one
lineage re-execution) dominated (8.4 s vs 2.2 s). This runs BOTH routes
on a 600k-document synthetic corpus — the scale where the carry path's
amortized advantage (no ×bands gram replication through the shuffle) is
supposed to pay — and checks output parity.

    python tools/minhash_carry_bench.py [n_docs]  # default 600_000

Prints ONE JSON line (append to CAMPAIGN_r5.jsonl). Deterministic: the
corpus is a pure function of doc_id (splitmix-style mixing), with every
20th doc a near-dup of its predecessor so the pair set is non-trivial.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data

N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
VOCAB = 20_000
TOKENS = 40
CORPUS = f"/dev/shm/graft_minhash_corpus_{N}"


def _gen(t: pa.Table) -> pa.Table:
    ids = t.column("id").to_numpy().astype(np.int64)
    texts = []
    for i in ids:
        base = int(i) - (1 if i % 20 == 19 else 0)  # every 20th: near-dup of i-1
        with np.errstate(over="ignore"):
            w = (np.uint64(base) * np.uint64(0x9E3779B97F4A7C15)
                 + np.arange(TOKENS, dtype=np.uint64)
                 * np.uint64(0xBF58476D1CE4E5B9))
            w ^= w >> np.uint64(31)
        toks = (w % np.uint64(VOCAB)).astype(np.int64)
        if i % 20 == 19:
            toks = toks.copy()
            toks[TOKENS // 2] = (toks[TOKENS // 2] + 1) % VOCAB  # one edit
        texts.append(" ".join(f"w{v}" for v in toks))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from hand_index_ray.pipelines.text import minhash_lsh_pairs

    if not os.path.isdir(CORPUS) or not os.listdir(CORPUS):
        shutil.rmtree(CORPUS, ignore_errors=True)
        (ray.data.range(N).map_batches(_gen, batch_format="pyarrow")
         .write_parquet(CORPUS))

    results = {}
    frames = {}
    for name, bb in (("carry_slim", 0), ("broadcast", 1 << 40)):
        ds = ray.data.read_parquet(CORPUS)
        t0 = time.perf_counter()
        out = minhash_lsh_pairs(ds, jaccard_threshold=0.5,
                                broadcast_bytes=bb).to_pandas()
        results[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
        frames[name] = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    parity = frames["carry_slim"].equals(frames["broadcast"])
    line = {
        "step": f"r5_minhash_carry_vs_broadcast_{N // 1000}k",
        "docs": N,
        **results,
        "pairs_both": int(len(frames["broadcast"])),
        "parity": bool(parity),
        "note": ("forced-carry at sf1-scale doc count: the 100 TB route's "
                 "at-scale evidence (r4 had only the 5k-doc row)"),
    }
    print(json.dumps(line))
    ray.shutdown()
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    main()
