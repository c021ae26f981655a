"""Driver-contract mirror: run every queries() entry vs its oracle_sql()
at sf0.01 with the driver's dtype-sensitive canonical hash.

    python tools/verify_driver.py [sf_dir] [query_substr ...]

Prints one line per query (PASS/FAIL/ROWS-ONLY) and a summary; exit 1 on
any failure. Mirrors the external grader: columns sorted by name, rows
sorted by all columns, per-column dtype + values hashed.
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canonical_hash(df: pd.DataFrame) -> str:
    df = df.reindex(columns=sorted(df.columns))
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(str(df[c].dtype).encode())
        h.update(pd.util.hash_pandas_object(df[c], index=False).values.tobytes())
    return h.hexdigest()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subs = sys.argv[2:]
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    import importlib
    E = importlib.import_module("__ray_entry__")
    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = [n for n in qs if not subs or any(s in n for s in subs)]
    fails = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            mine = to_pandas(qs[name](sf))
            if name in oracles:
                want = con.execute(oracles[name]).df()
                ok_rows = len(mine) == len(want)
                ok_hash = canonical_hash(mine) == canonical_hash(want)
                status = "PASS" if (ok_rows and ok_hash) else "FAIL"
                if status == "FAIL":
                    fails.append(name)
                print(f"{status} {name} rows={len(mine)}/{len(want)} "
                      f"hash={'ok' if ok_hash else 'MISMATCH'} "
                      f"({time.time()-t0:.1f}s)", flush=True)
            else:
                print(f"ROWS-ONLY {name} rows={len(mine)} "
                      f"({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name} EXC {type(e).__name__}: {e}", flush=True)
    print(json.dumps({"n": len(names), "fails": fails,
                      "sec": round(time.time() - t_all, 1)}))
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
