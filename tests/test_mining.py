"""Tests for pipelines/mining.py (retrieval, linkage, sampling,
PQ, compact, topology) — each op vs a brute-force or DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hand_index_ray.pipelines import mining


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(3)


# ---------------------------------------------------------------------------


def test_bm25_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(7)
    vocab = ["hash", "merge", "sort", "scan", "join", "window", "dup"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
            for _ in range(60)]
    tbl = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(docs)})
    got = mining.bm25_topk(_ds(tbl), ["hash", "merge"], k=10)

    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
                     FROM documents),
        dln AS (SELECT doc_id, len(string_split(text,' ')) AS dl
                FROM documents),
        c AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT SUM(dl) FROM dln) AS a),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok WHERE term IN ('hash','merge') GROUP BY 1,2),
        df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
               FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id, dln.dl,
                      CAST(FLOOR(1000000.0 * (22*tf.tf*c.a*(2*c.n-2*df.df+1))
                           / ((10*c.a*tf.tf + 3*c.a + 9*dln.dl*c.n)
                              * (2*df.df+1)) + 0.5) AS BIGINT) AS s
               FROM tf JOIN df USING (term) JOIN dln USING (doc_id)
               CROSS JOIN c)
        SELECT doc_id, CAST(MAX(dl) AS BIGINT) AS dl,
               CAST(SUM(s) AS BIGINT) AS score_ppm
        FROM sc GROUP BY 1 ORDER BY score_ppm DESC, doc_id LIMIT 10
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want, check_dtype=False)


def test_boolean_and(ray_session):
    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(["a b c", "a c", "b a", "c b a a"]),
                    "n_chars": pa.array([5, 3, 3, 7], pa.int64())})
    out = (mining.boolean_and(_ds(tbl), ["a", "b"], keep=["n_chars"])
           .to_pandas().sort_values("doc_id"))
    assert out["doc_id"].tolist() == [1, 3, 4]


def test_k_anonymity(ray_session):
    tbl = pa.table({"g": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                    "h": pa.array([0, 0, 0, 0, 0, 0], pa.int64())})
    out = mining.k_anonymity_ledger(_ds(tbl), ["g", "h"], k=3)
    assert out.iloc[0].to_dict() == {
        "n_groups": 3, "n_rows": 6, "risky_groups": 2, "risky_rows": 3,
        "min_size": 1, "max_size": 3}


def test_linkage_pairs(ray_session):
    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "blk": pa.array([0, 0, 0, 1, 1], pa.int64()),
        "seg": pa.array(["x", "x", "y", "x", "x"]),
        "cents": pa.array([100, 150, 120, -50, 20000], pa.int64())})
    out = (mining.linkage_pairs(_ds(tbl), "blk", "id", "seg", "cents",
                                close=100, threshold=6)
           .to_pandas().sort_values(["id_a", "id_b"]))
    # (1,2): seg+close+sign = 7; (1,3)/(2,3): seg differs -> 3;
    # (4,5): seg match, far, sign differs -> 4
    assert out[["id_a", "id_b", "score"]].values.tolist() == [[1, 2, 7]]


def test_lttb_mean_brute(ray_session):
    rng = np.random.default_rng(3)
    rows = []
    for uid in range(4):
        n = int(rng.integers(8, 40))
        ts = np.sort(rng.choice(10 ** 6, size=n, replace=False)) \
            * 60_000_000
        y = rng.integers(-500, 500, size=n)
        for i, (t, v) in enumerate(zip(ts, y)):
            rows.append((uid, i, int(t), int(v)))
    tbl = pa.table({"uid": pa.array([r[0] for r in rows], pa.int64()),
                    "eid": pa.array([r[1] for r in rows], pa.int64()),
                    "us": pa.array([r[2] for r in rows], pa.int64()),
                    "cents": pa.array([r[3] for r in rows], pa.int64())})
    B = 5
    got = (mining.lttb_mean(_ds(tbl), "uid", "us", "cents", "eid", B)
           .to_pandas().sort_values(["uid", "bucket"])
           .reset_index(drop=True))

    # brute force
    exp = []
    df = tbl.to_pandas()
    for uid, g in df.groupby("uid"):
        g = g.sort_values(["us", "eid"])
        n = len(g)
        if n < B:
            continue
        x = ((g["us"] - g["us"].iloc[0]) // 60_000_000).to_numpy()
        y = g["cents"].to_numpy()
        b = np.arange(n) * B // n
        for bi in range(B):
            idx = np.flatnonzero(b == bi)
            if bi == 0:
                pick = 0
            elif bi == B - 1:
                pick = n - 1
            else:
                pidx = np.flatnonzero(b == bi - 1)
                cidx = np.flatnonzero(b == bi + 1)
                np_, nc = len(pidx), len(cidx)
                sxp, syp = x[pidx].sum(), y[pidx].sum()
                sxc, syc = x[cidx].sum(), y[cidx].sum()
                t = ((sxp * nc - sxc * np_) * (np_ * y[idx] - syp)
                     - (sxp - np_ * x[idx]) * (syp * nc - syc * np_))
                pick = idx[int(np.argmax(np.abs(t)))]
            exp.append((uid, bi, int(x[pick]), int(y[pick])))
    want = pd.DataFrame(exp, columns=["uid", "bucket", "x_min",
                                      "y_cents"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_priority_sample(ray_session):
    tbl = pa.table({"id": pa.array(range(1, 1001), pa.int64()),
                    "w": pa.array(np.arange(1, 1001) * 7 % 997 + 1,
                                  pa.int64())})
    got = mining.priority_sample(_ds(tbl), "id", "w", k=20)
    ids = np.arange(1, 1001, dtype=np.int64)
    w = (ids * 7 % 997 + 1)
    u = (ids * 2654435761) % 1048576 + 1
    pri = w.astype(np.float64) / u.astype(np.float64)
    order = np.lexsort((ids, -pri))[:20]
    assert got["id"].tolist() == ids[order].tolist()
    assert np.array_equal(got["priority"].to_numpy(), pri[order])


def test_pq_assign_brute(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 8)).astype(np.float32) * 0.2
    tbl = pa.table({"vec_id": pa.array(range(80), pa.int64()),
                    "embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    got = (mining.pq_assign(_ds(tbl), ncodes=4, m=2)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    cb = q[:4].reshape(4, 2, 4)
    bq = q.reshape(80, 2, 4)
    d = ((bq[:, None] - cb[None]) ** 2).sum(axis=3)  # (80, 4, 2)
    codes = d.argmin(axis=1)
    err = d.min(axis=1).sum(axis=1)
    assert got["c0"].tolist() == codes[:, 0].tolist()
    assert got["c1"].tolist() == codes[:, 1].tolist()
    assert got["err"].tolist() == err.tolist()


def test_compact_hierarchy_roundtrip(ray_session):
    # complete subtree (all 7 children of parent 3) + partial others
    leaves = list(range(21, 28))          # parent 3 complete (res1)
    leaves += [0, 5, 14]                  # partials
    # plus a fully complete root-0 subtree at depth 2: cells 0..48
    deep = list(range(49 * 1, 49 * 2))    # root 1's full 49 leaves
    tbl = pa.table({"cell": pa.array(leaves + deep, pa.int64())})
    out = (mining.compact_hierarchy(_ds(tbl), "cell", depth=2, arity=7,
                                    nroots=4)
           .to_pandas().sort_values(["res", "cell"]))
    got = set(map(tuple, out[["res", "cell"]].values.tolist()))
    assert (0, 1) in got                  # root 1 fully compacts
    assert (1, 3) in got                  # complete parent 3
    assert (2, 0) in got and (2, 5) in got and (2, 14) in got
    # uncompact reproduces the exact leaf set
    expand = set()
    for res, cell in got:
        span = 7 ** (2 - res)
        expand.update(range(cell * span, (cell + 1) * span))
    assert expand == set(leaves + deep)


def test_lead_lag(ray_session):
    # user 1: clicks at hours 10, 20; views at 12, 22 -> best lag +2
    us = [10, 20, 12, 22, 50]
    et = ["click", "click", "view", "view", "error"]
    tbl = pa.table({"uid": pa.array([1] * 5, pa.int64()),
                    "ts": pa.array(
                        np.array(us, np.int64) * 3_600_000_000,
                        pa.timestamp("us")),
                    "et": pa.array(et)})
    out = (mining.lead_lag(_ds(tbl), "uid", "ts", "et", "click", "view",
                           max_lag=3).to_pandas())
    assert out.values.tolist() == [[1, 2, 2]]


def test_zone_adjacency_and_euler(ray_session):
    import ray.data

    from hand_index_ray.kernels.geotiff import encode_geotiff

    lab = np.array([[0, 0, 1],
                    [0, 2, 1],
                    [2, 2, 1]], dtype=np.int32)
    blob = encode_geotiff(lab)
    ds = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([9], pa.int64()),
        "bytes": pa.array([blob], pa.binary())}))
    adj = (mining.zone_adjacency(ds).to_pandas()
           .sort_values(["za", "zb"]).reset_index(drop=True))
    # boundaries: 0-1: (0,1)-(0,2),(1,1)... count manually:
    # right pairs: (0,0)(0,1)=00 same; (0,1)(0,2)=0/1 ; (1,0)(1,1)=0/2 ;
    # (1,1)(1,2)=2/1 ; (2,0)(2,1)=2/2 same; (2,1)(2,2)=2/1
    # down pairs: (0,0)(1,0)=0/0; (0,1)(1,1)=0/2; (0,2)(1,2)=1/1;
    # (1,0)(2,0)=0/2; (1,1)(2,1)=2/2; (1,2)(2,2)=1/1
    assert adj[["za", "zb", "boundary_px"]].values.tolist() == [
        [0, 1, 1], [0, 2, 3], [1, 2, 2]]

    # Euler: diagonal pair -> E4=2 (two 4-components), E8=1
    diag = np.array([[200, 0], [0, 200]], dtype=np.int32)
    ds2 = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "bytes": pa.array([encode_geotiff(diag)], pa.binary())}))
    e = mining.euler_stats(ds2, thresh=128).to_pandas()
    assert e["euler4"].tolist() == [2]
    assert e["euler8"].tolist() == [1]

    # ring with a hole -> E4 = 1 - 1 = 0
    ring = np.full((3, 3), 200, dtype=np.int32)
    ring[1, 1] = 0
    ds3 = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([2], pa.int64()),
        "bytes": pa.array([encode_geotiff(ring)], pa.binary())}))
    e3 = mining.euler_stats(ds3, thresh=128).to_pandas()
    assert e3["euler4"].tolist() == [0]
    assert e3["euler8"].tolist() == [0]


def test_link_prediction_small(ray_session):
    # path graph 1-2-3 plus 2-4: non-edges with common nbr:
    # (1,3) cn=1 via 2; (1,4) cn=1 via 2; (3,4) cn=1 via 2
    tbl = pa.table({"u": pa.array([1, 2, 2], pa.int64()),
                    "v": pa.array([2, 3, 4], pa.int64())})
    out = mining.link_prediction(_ds(tbl), "u", "v", k=10)
    assert out[["a", "b", "cn"]].values.tolist() == [
        [1, 3, 1], [1, 4, 1], [3, 4, 1]]
    row = out[(out["a"] == 1) & (out["b"] == 3)].iloc[0]
    assert row["deg_a"] == 1 and row["deg_b"] == 1 and row["jac_den"] == 1


def test_join_cardinality_estimate(ray_session):
    ta = pa.table({"cell": pa.array([0, 0, 65, 65, 65, 130], pa.int64())})
    tb = pa.table({"cell": pa.array([0, 65, 130, 130], pa.int64())})
    out = mining.join_cardinality_estimate(_ds(ta), _ds(tb), "cell",
                                           dim=64, coarse_shift=3)
    # exact: 2*1 + 3*1 + 1*2 = 7
    assert out["exact_pairs"].tolist() == [7]
    # coarse 8x8: cells (0,0),(1,1),(2,2) -> coarse (0,0) all -> 6*4=24
    assert out["coarse_estimate"].tolist() == [24]


def test_fk_audit(ray_session):
    child = pa.table({"k": pa.array([1, 2, 2, 7, 9], pa.int64())})
    parent = pa.table({"p": pa.array([1, 2, 3, 4], pa.int64())})
    out = mining.fk_audit(_ds(child), "k", _ds(parent), "p")
    assert out.iloc[0].to_dict() == {
        "n_rows": 5, "n_orphan_rows": 2, "n_orphan_keys": 2,
        "n_parents": 4, "n_parents_referenced": 2}


def test_top_paths(ray_session):
    tbl = pa.table({"u": pa.array([1] * 4 + [2] * 3, pa.int64()),
                    "e": pa.array(range(7), pa.int64()),
                    "us": pa.array(range(7), pa.int64()),
                    "t": pa.array(["a", "b", "c", "a", "a", "b", "c"])})
    out = mining.top_paths(_ds(tbl), "u", "us", "e", "t", k=5)
    assert out.values.tolist() == [["a>b>c", 2], ["b>c>a", 1]]


def test_triangle_threshold_brute(ray_session):
    import ray.data

    from hand_index_ray.kernels.geotiff import encode_geotiff

    rng = np.random.default_rng(5)
    img = rng.integers(0, 32, size=(10, 14)).astype(np.int32)
    img[img < 8] = 3  # make a peak
    ds = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([4], pa.int64()),
        "bytes": pa.array([encode_geotiff(img)], pa.binary())}))
    out = mining.triangle_threshold(ds, nlevels=32).to_pandas()
    h = np.bincount(img.ravel(), minlength=32).astype(np.int64)
    p = int(h.argmax())
    e = int(np.flatnonzero(h)[-1])
    ts = np.arange(p, e + 1)
    cross = np.abs((e - p) * (h[ts] - h[p]) - (ts - p) * (h[e] - h[p]))
    assert out["thr"].tolist() == [int(ts[np.argmax(cross)])]
    assert out["cross_abs"].tolist() == [int(cross.max())]


def test_dominant_period(ray_session):
    tbl = pa.table({"u": pa.array([1] * 5, pa.int64()),
                    "e": pa.array(range(5), pa.int64()),
                    "us": pa.array([0, 10, 20, 35, 45], pa.int64())})
    out = mining.dominant_period(_ds(tbl), "u", "us", "e",
                                 unit_us=10).to_pandas()
    # gaps: 1,1,1(15//10),1 -> wait: 10,10,15,10 -> units 1,1,1,1
    assert out.values.tolist() == [[1, 1, 4]]


def test_pyramid_error_brute(ray_session):
    import ray.data

    from hand_index_ray.kernels.geotiff import encode_geotiff

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(6, 8)).astype(np.int32)
    ds = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([3], pa.int64()),
        "bytes": pa.array([encode_geotiff(img)], pa.binary())}))
    out = mining.pyramid_error(ds).to_pandas()
    v = img.astype(np.int64)
    down = (v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2]
            + v[1::2, 1::2]) // 4
    up = np.repeat(np.repeat(down, 2, 0), 2, 1)
    assert out["abs_err"].tolist() == [int(np.abs(v - up).sum())]


def test_radius_gyration(ray_session):
    tbl = pa.table({"u": pa.array([1, 1, 1, 2], pa.int64()),
                    "x": pa.array([0, 3, 6, 5], pa.int64()),
                    "y": pa.array([0, 0, 0, 5], pa.int64())})
    out = (mining.radius_gyration(_ds(tbl), "u", "x", "y")
           .to_pandas().sort_values("u"))
    # user 1: n=3, sxx=45, sx=9 -> 3*45 - 81 = 54; user 2: 0
    assert out[["u", "n", "rog_num"]].values.tolist() == [
        [1, 3, 54], [2, 1, 0]]


def test_cooccurrence_hand(ray_session):
    tbl = pa.table({"u": pa.array([1, 1, 1, 1], pa.int64()),
                    "e": pa.array([0, 1, 2, 3], pa.int64()),
                    "us": pa.array([0, 5, 11, 100], pa.int64()),
                    "t": pa.array(["a", "b", "a", "c"])})
    out = mining.cooccurrence(_ds(tbl), "u", "us", "e", "t", w_us=10)
    # pairs within 10: (0,1) a-b, (0,2)? 11-0=11 > 10 no, (1,2) b-a
    assert out.values.tolist() == [["a", "b", 2]]


def test_top_keyword(ray_session):
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["rare common common",
                                      "common common common"])})
    out = (mining.top_keyword(_ds(tbl)).to_pandas()
           .sort_values("doc_id"))
    # ctf: rare=1, common=5; doc1: rare 1/1 > common 2/5; doc2: common
    assert out[["doc_id", "term"]].values.tolist() == [
        [1, "rare"], [2, "common"]]
