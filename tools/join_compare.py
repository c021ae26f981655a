"""Custom IPC co-group hash join vs Ray Data native Dataset.join
(VERDICT r2 item 8: re-evaluate the r2 measurement at larger inputs).

Runs the q29-shaped lineitem×orders inner join through both paths in
THIS process at a given scale, prints one JSON line. Drive it in a
probe-verified quiet window:

    python tools/join_compare.py [sf_dir] [repeat]

Scale knob: GRAFT_JOIN_MULT replicates lineitem M times (key-shifted)
to emulate sf≈0.1·M without needing an sf1 testdata directory.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mult = int(os.environ.get("GRAFT_JOIN_MULT", "1"))
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from hand_index_ray import relational as rel

    def load():
        orders = rel.add_cents(
            ray.data.read_parquet(os.path.join(sf, "orders.parquet"),
                                  columns=["o_orderkey", "o_totalprice"]),
            "o_totalprice", "total_cents") \
            .select_columns(["o_orderkey", "total_cents"])
        items = ray.data.read_parquet(os.path.join(sf, "lineitem.parquet"),
                                      columns=["l_orderkey", "l_returnflag"])

        def ren(t: pa.Table) -> pa.Table:
            return t.rename_columns(["o_orderkey", "l_returnflag"])

        items = items.map_batches(ren, batch_format="pyarrow")
        if mult > 1:
            def shift(m):
                def f(t: pa.Table) -> pa.Table:
                    k = t["o_orderkey"].to_numpy() + np.int64(m * 10 ** 9)
                    return t.set_column(0, "o_orderkey", pa.array(k))
                return f
            items = items.union(*[items.map_batches(shift(m + 1),
                                                    batch_format="pyarrow")
                                  for m in range(mult - 1)])
        return items, orders

    out = {"sf": sf, "mult": mult, "native_available":
           hasattr(ray.data.Dataset, "join")}
    for label, native in (("custom_ipc", False), ("native", True)):
        if native and not out["native_available"]:
            continue
        best = None
        for _ in range(reps):
            items, orders = load()
            t0 = time.perf_counter()
            j = rel.hash_join(items, orders, "o_orderkey", how="inner",
                              use_native=native)
            nrows = j.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[label] = {"sec_best": round(best, 3), "rows": int(nrows),
                      "rows_per_sec": round(nrows / best, 1)}
    if "native" in out and "custom_ipc" in out:
        out["native_over_custom"] = round(
            out["native"]["sec_best"] / out["custom_ipc"]["sec_best"], 3)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
