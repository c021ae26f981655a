"""editdist_pairs hot-first-token benchmark (VERDICT r4 item 2 evidence).

Half the corpus shares ONE first token ("the") — the web-corpus skew
shape that made the r4 single-key blocking quadratic in one bucket.
With the (first-token, length-band) key the hot token splits across
~prefix_chars/max_dist bands; this row records wall time and pair count
at a doc count where the unbanded block would be a single
|hot|²-pair bucket.

    python tools/editdist_skew_bench.py [n_docs]   # default 60_000

Prints ONE JSON line (append to CAMPAIGN_r5.jsonl). Deterministic.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
CORPUS = f"/dev/shm/graft_editdist_corpus_{N}"


def _gen(t: pa.Table) -> pa.Table:
    ids = t.column("id").to_numpy().astype(np.int64)
    texts = []
    for i in ids:
        i = int(i)
        ft = "the" if i % 2 == 0 else f"tok{i % 977}"
        # independent pseudo-random characters per doc (splitmix-style),
        # so unrelated same-length docs have DIFFERENT byte histograms —
        # the realistic shape the histogram prefilter is built for; a
        # small near-dup family every 100 docs keeps the output non-empty
        fam = i - (i % 100) if i % 100 < 3 else i
        body_len = 15 + (fam * 131) % 40  # title-like lengths, many bands
        # (length keyed on fam so family members stay in the length
        # window; minimum 15: below ~max_dist chars EVERY same-band
        # pair is within edit distance trivially, swamping the pair set)
        with np.errstate(over="ignore"):
            w = (np.uint64(fam) * np.uint64(0x9E3779B97F4A7C15)
                 + np.arange(body_len, dtype=np.uint64)
                 * np.uint64(0xBF58476D1CE4E5B9))
            w ^= w >> np.uint64(31)
            w *= np.uint64(0x94D049BB133111EB)
        body = "".join(chr(97 + int(c)) for c in w % np.uint64(26))
        if fam != i and body:
            body = body[:-1] + chr(97 + (i % 26))
        texts.append(f"{ft} {body}")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from hand_index_ray.pipelines.text import editdist_pairs

    if not os.path.isdir(CORPUS) or not os.listdir(CORPUS):
        (ray.data.range(N).map_batches(_gen, batch_format="pyarrow")
         .write_parquet(CORPUS))

    ds = ray.data.read_parquet(CORPUS)
    t0 = time.perf_counter()
    n_pairs = 0
    for b in editdist_pairs(ds, max_dist=5).iter_batches(
            batch_format="pyarrow"):
        n_pairs += b.num_rows
    sec = round(time.perf_counter() - t0, 2)
    line = {
        "step": f"r5_editdist_hot_token_{N // 1000}k",
        "docs": N, "hot_frac": 0.5, "sec": sec, "pairs": int(n_pairs),
        "note": ("half the corpus shares first token 'the'; the "
                 "(first-token, length-band) key splits it into "
                 "~12 bands (max_dist=5 over 60-char prefixes), so no "
                 "single co-group sees the |hot|^2 pair space the r4 "
                 "single-key blocking would have"),
    }
    print(json.dumps(line))
    ray.shutdown()


if __name__ == "__main__":
    main()
