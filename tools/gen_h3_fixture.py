"""Generate tests/data/h3_golden_tpch.parquet — frozen (k, lon, lat,
h3_r7) golden ids for every tpch image key at sf0.001/0.01/0.1.

Provenance: ids come from hand_index_ray.kernels.h3exact, which is
itself pinned bit-exactly to the PUBLISHED Uber H3 test vectors
(tests/test_h3_exact.py golden vectors + 20k-point res-0-9 round-trips
incl. all 12 pentagons). Freezing them as a parquet lets q119's
oracle_sql() be a plain DuckDB join/group-by — a real rows+schema+hash
check instead of rows-only (VERDICT r3 item 3). Regenerate ONLY if the
key-derivation arithmetic (sources/synth.py footprint_of_tpch) changes;
an h3exact change that alters these ids is a REGRESSION, not a reason
to regenerate.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hand_index_ray.kernels import h3exact
from hand_index_ray.sources import synth

ks = []
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    d = f"/root/testdata/{sf}"
    if os.path.isdir(d):
        ks.append(synth.tpch_keys(d))
k = np.unique(np.concatenate(ks))
_, _, _, _, lon, lat = synth.footprint_of_tpch(k)
h3 = h3exact.latlng_to_cell(lat, lon, 7).astype(np.int64)
out = pa.table({"k": pa.array(k, pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "h3_r7": pa.array(h3, pa.int64())})
dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data", "h3_golden_tpch.parquet")
pq.write_table(out, dest, compression="zstd")
print(f"wrote {len(out)} rows -> {dest}")
