"""Per-stage Ray Data stats audit for the flagship pipelines.

Runs the Dataset-shaped pipelines over the cached sf0.1 bench fixture
and prints each one's `ds.stats()` — the evidence that wall time is
dominated by useful compute (UDF time) rather than scheduling or
format conversion. Usage (owns its Ray session):

    python tools/stage_stats.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()

    for name in ("q26_roi_footprints", "q28_zonal_pairs",
                 "q24_minhash_pairs", "q01_groupby_sum"):
        t0 = time.time()
        res = qs[name](sf)
        if hasattr(res, "stats"):
            res = res.materialize()
            print(f"\n===== {name} ({time.time()-t0:.2f}s) =====")
            print(res.stats())
        else:
            print(f"\n===== {name}: returns {type(res).__name__} "
                  f"(driver-merged result; no Dataset stats)")
    ray.shutdown()


if __name__ == "__main__":
    main()
