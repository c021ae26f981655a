"""Unit tests for the round-2 extension operators: connected
components (Pregel min-label over raw task waves), skyline, funnel,
and TF-IDF top-k — each against a small brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


# ---------------------------------------------------------------- CC

def _brute_cc(edges):
    # union-find oracle
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize("nodes", ["int", "str"])
def test_connected_components_vs_union_find(ray_session, nodes):
    from hand_index_ray.pipelines.graph import connected_components

    rng = np.random.default_rng(7)
    # three chains + isolated pairs + a cycle
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (20, 21),
             (30, 31), (31, 32), (32, 30), (40, 41)]
    edges += [(int(a), int(b)) for a, b in rng.integers(100, 140, (30, 2))
              if a != b]
    if nodes == "str":
        edges = [(f"n{a:03d}", f"n{b:03d}") for a, b in edges]
    truth = _brute_cc(edges)
    typ = pa.int64() if nodes == "int" else pa.string()
    tbl = pa.table({"a": pa.array([e[0] for e in edges], typ),
                    "b": pa.array([e[1] for e in edges], typ)})
    got = connected_components(_ds(tbl), num_buckets=4).to_pandas()
    got_map = dict(zip(got["node"], got["comp"]))
    assert got_map == truth


def test_connected_components_single_component_diameter(ray_session):
    """A pure chain exercises multi-round propagation to fixpoint."""
    from hand_index_ray.pipelines.graph import connected_components

    n = 12
    tbl = pa.table({"a": pa.array(range(n - 1), pa.int64()),
                    "b": pa.array(range(1, n), pa.int64())})
    got = connected_components(_ds(tbl), num_buckets=3).to_pandas()
    assert len(got) == n
    assert set(got["comp"]) == {0}


# ----------------------------------------------------------- skyline

def test_skyline_vs_bruteforce(ray_session):
    from hand_index_ray.relational import skyline

    rng = np.random.default_rng(3)
    x = rng.integers(0, 50, 400)
    y = rng.integers(0, 50, 400)
    pts = set(zip(x.tolist(), y.tolist()))
    truth = sorted(p for p in pts
                   if not any(q[0] >= p[0] and q[1] >= p[1] and q != p
                              for q in pts))
    tbl = pa.table({"x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64())})
    got = skyline(_ds(tbl).repartition(8), "x", "y")
    assert sorted(zip(got["x"], got["y"])) == truth


def test_skyline_duplicates_and_ties(ray_session):
    from hand_index_ray.relational import skyline

    tbl = pa.table({"x": pa.array([1, 1, 1, 2, 2], pa.int64()),
                    "y": pa.array([5, 5, 9, 9, 1], pa.int64())})
    got = skyline(_ds(tbl), "x", "y")
    assert sorted(zip(got["x"], got["y"])) == [(2, 9)]


# ------------------------------------------------------------ funnel

def test_funnel_strict_ordering(ray_session):
    from hand_index_ray.relational import funnel_counts

    rows = [
        # u1 completes all three in order
        ("u1", 10, "signup"), ("u1", 20, "click"), ("u1", 30, "purchase"),
        # u2: click BEFORE signup (same-ts purchase not strictly after)
        ("u2", 50, "click"), ("u2", 60, "signup"), ("u2", 60, "purchase"),
        # u3 signup only
        ("u3", 5, "signup"),
        # u4 never signs up
        ("u4", 1, "click"), ("u4", 2, "purchase"),
        # u5: signup, click, purchase before click -> stops at 2
        ("u5", 1, "signup"), ("u5", 9, "purchase"), ("u5", 10, "click"),
    ]
    tbl = pa.table({"user_id": pa.array([r[0] for r in rows]),
                    "ts": pa.array([r[1] for r in rows], pa.int64()),
                    "event_type": pa.array([r[2] for r in rows])})
    got = funnel_counts(_ds(tbl).repartition(3), "user_id", "ts",
                        "event_type", ["signup", "click", "purchase"],
                        num_buckets=4)
    assert got["n_users"].tolist() == [4, 2, 1]


def test_funnel_empty_input(ray_session):
    from hand_index_ray.relational import funnel_counts

    tbl = pa.table({"user_id": pa.array([], pa.string()),
                    "ts": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string())})
    got = funnel_counts(_ds(tbl), "user_id", "ts", "event_type",
                        ["signup", "click"])
    assert got["n_users"].tolist() == [0, 0]


# ------------------------------------------------------------ tf-idf

def test_tfidf_topk_bruteforce(ray_session):
    from hand_index_ray.pipelines.text import tfidf_topk

    docs = {1: "a a b c", 2: "a b b d", 3: "c c c e a"}
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()))})
    got = tfidf_topk(_ds(tbl), k=2).to_pandas()
    # brute force
    tf = {}
    df = {}
    for d, s in docs.items():
        toks = s.split(" ")
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    scores = {(d, t): (n * 1_000_000) // df[t] for (d, t), n in tf.items()}
    for d in docs:
        mine = sorted(((row.term, row.score) for row in
                       got[got.doc_id == d].itertuples()))
        want = sorted((t, s) for (dd, t), s in sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0][1]))
            if dd == d)[:2]
        want = sorted((t, s) for (dd, t), s in sorted(
            ((k, v) for k, v in scores.items() if k[0] == d),
            key=lambda kv: (-kv[1], kv[0][1]))[:2])
        assert mine == want, (d, mine, want)


# ----------------------------------------------------- canonical_reps

def test_canonical_reps_assigns_min_and_self(ray_session):
    from hand_index_ray.pipelines.graph import canonical_reps

    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5, 9], pa.int64())})
    pairs = pa.table({"id_a": pa.array([2, 3], pa.int64()),
                      "id_b": pa.array([3, 5], pa.int64())})
    got = canonical_reps(_ds(docs), _ds(pairs)).to_pandas()
    rep = dict(zip(got["doc_id"], got["rep_id"]))
    assert rep == {1: 1, 2: 2, 3: 2, 4: 4, 5: 2, 9: 9}
    assert got["rep_id"].dtype.kind == "i"


def test_canonical_reps_no_pairs(ray_session):
    from hand_index_ray.pipelines.graph import canonical_reps

    docs = pa.table({"doc_id": pa.array([7, 8], pa.int64())})
    pairs = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    got = canonical_reps(_ds(docs), _ds(pairs)).to_pandas()
    assert dict(zip(got["doc_id"], got["rep_id"])) == {7: 7, 8: 8}


# -------------------------------------------------------------- cube

def test_cube_counts_vs_pandas(ray_session):
    from hand_index_ray.relational import cube_counts

    rng = np.random.default_rng(11)
    a = rng.choice(["x", "y", "z"], 300).tolist()
    b = rng.choice(["p", "q"], 300).tolist()
    v = rng.integers(0, 100, 300)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b),
                    "v": pa.array(v, pa.int64())})
    got = cube_counts(_ds(tbl).repartition(4), ["a", "b"],
                      sum_cols=["v"]).to_pandas()
    df = pd.DataFrame({"a": a, "b": b, "v": v})
    want = {}
    for keys in [["a", "b"], ["a"], ["b"], []]:
        if keys:
            g = df.groupby(keys)["v"].agg(["sum", "size"]).reset_index()
            for _, r in g.iterrows():
                k = (r["a"] if "a" in keys else "*",
                     r["b"] if "b" in keys else "*")
                want[k] = (r["sum"], r["size"])
        else:
            want[("*", "*")] = (df["v"].sum(), len(df))
    gotm = {(r.a, r.b): (r.v, r.n) for r in got.itertuples()}
    assert gotm == want


# ------------------------------------------------------------ cohort

def test_cohort_retention_vs_pandas(ray_session):
    from hand_index_ray.relational import cohort_retention

    B = 1000
    rows = [("u1", 100), ("u1", 1100), ("u1", 3100),
            ("u2", 1500), ("u2", 1600), ("u2", 2500),
            ("u3", 50)]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us"))})
    got = cohort_retention(_ds(tbl).repartition(2), "user_id", "ts",
                           bucket_us=B, num_buckets=4)
    gotm = {(r.cohort, r.offs): r.n_users for r in got.itertuples()}
    # u1: cohort 0, active buckets {0,1,3} -> offs {0,1,3}
    # u2: cohort 1, active buckets {1,2}  -> offs {0,1}
    # u3: cohort 0, active {0}            -> offs {0}
    assert gotm == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


# --------------------------------------------------- full outer join

def test_full_outer_join_vs_pandas(ray_session):
    from hand_index_ray.relational import hash_join

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "lv": pa.array(["a", "b", "c", "d"])})
    right = pa.table({"k": pa.array([3, 4, 5, 6], pa.int64()),
                      "rv": pa.array([30, 40, 50, 60], pa.int64())})
    got = hash_join(_ds(left).repartition(2), _ds(right).repartition(2),
                    key="k", how="full", num_buckets=4).to_pandas()
    got = got.fillna({"lv": "-", "rv": -1})
    m = {int(r.k): (r.lv, int(r.rv)) for r in got.itertuples()}
    assert m == {1: ("a", -1), 2: ("b", -1), 3: ("c", 30), 4: ("d", 40),
                 5: ("-", 50), 6: ("-", 60)}


# ----------------------------------------------------- cont quantiles

def test_percentile_cont_matches_numpy(ray_session):
    from hand_index_ray.relational import grouped_percentiles_cont

    rng = np.random.default_rng(5)
    g = rng.choice(["a", "b"], 200).tolist()
    v = rng.integers(0, 1000, 200)
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v, pa.int64())})
    got = grouped_percentiles_cont(_ds(tbl).repartition(4), ["g"], "v",
                                   num_buckets=4).to_pandas()
    df = pd.DataFrame({"g": g, "v": v})
    for _, r in got.iterrows():
        vals = df[df.g == r["g"]]["v"].to_numpy()
        assert r["n"] == len(vals)
        for p, c in [(25, "p25"), (50, "p50"), (75, "p75")]:
            assert r[c] == np.percentile(vals, p, method="linear"), (r["g"], c)


# ------------------------------------------------------------ bigrams

def test_bigram_topk_bruteforce(ray_session):
    from hand_index_ray.pipelines.text import bigram_topk

    texts = ["the cat sat", "the cat ran", "a cat sat still", "the", ""]
    tbl = pa.table({"text": pa.array(texts)})
    got = bigram_topk(_ds(tbl).repartition(3), k=3)
    from collections import Counter
    cnt = Counter()
    for s in texts:
        t = s.split(" ")
        cnt.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(got["bg"], got["n"])) == want


# ------------------------------------------------------ vector sums

def test_grouped_vector_sums_exact(ray_session):
    from hand_index_ray.relational import grouped_vector_sums

    rng = np.random.default_rng(9)
    lab = rng.integers(0, 3, 50).astype(np.int32)
    vecs = rng.normal(size=(50, 4)).astype(np.float32)
    tbl = pa.table({"label": pa.array(lab, pa.int32()),
                    "embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    got = grouped_vector_sums(_ds(tbl).repartition(4), "label", "embedding")
    v64 = vecs.astype(np.float64) * 1e6
    mi = (np.sign(v64) * np.floor(np.abs(v64) + 0.5)).astype(np.int64)
    for r in got.itertuples():
        sel = mi[lab == r.label, r.dim - 1]
        assert r.s_micro == sel.sum() and r.n == len(sel)


# -------------------------------------------------------- transitions

def test_event_transitions_vs_brute(ray_session):
    from hand_index_ray.relational import event_transitions

    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "a"),
            ("u2", 1, 4, "b"), ("u2", 1, 5, "a"),  # same ts -> id order
            ("u3", 9, 6, "c")]
    tbl = pa.table({"user_id": pa.array([r[0] for r in rows]),
                    "ts": pa.array([r[1] for r in rows], pa.int64()),
                    "event_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows])})
    got = event_transitions(_ds(tbl).repartition(2), "user_id", "ts",
                            "event_type", tiebreak="event_id",
                            num_buckets=4)
    m = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
    assert m == {("a", "b"): 1, ("b", "a"): 2}


# --------------------------------------------------------------- otsu

def test_otsu_matches_bruteforce(ray_session):
    """Otsu restricted to observed levels == full 0..255 scan (the
    score is constant between observed values)."""
    from hand_index_ray.kernels import image as imk
    from hand_index_ray.pipelines.image_embed import otsu_threshold

    rng = np.random.default_rng(21)
    ids, bufs, briefs = [], [], []
    for i in range(6):
        px = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
        if i == 0:
            px[:] = 7  # constant image: class-2 always empty
        ids.append(f"img-{i:09d}")
        bufs.append(imk.encode(px, "raw"))
        briefs.append(px)
    tbl = pa.table({"image_id": pa.array(ids),
                    "bytes": pa.array(bufs, pa.binary()),
                    "fmt": pa.array(["raw"] * len(ids)),
                    "w": pa.array([12] * len(ids), pa.int32()),
                    "h": pa.array([10] * len(ids), pa.int32())})
    got = otsu_threshold(_ds(tbl)).to_pandas().set_index("image_id")
    for i, px in enumerate(briefs):
        p = px[:, :, 0].astype(np.int64).ravel()
        n = p.size
        best, best_t = -1.0, None
        for t in range(256):
            w1 = int((p <= t).sum())
            if w1 == 0 or w1 == n:
                continue
            mu1 = p[p <= t].sum() / w1
            mu2 = p[p > t].sum() / (n - w1)
            sc = (mu1 - mu2) ** 2 * w1 * (n - w1)
            if sc > best + 1e-9:
                best, best_t = sc, t
        if best_t is None:
            assert got.loc[f"img-{i:09d}", "otsu_t"] == p[0]
        else:
            # engine picks an observed level on the same plateau
            eng = got.loc[f"img-{i:09d}", "otsu_t"]
            w1 = int((p <= eng).sum())
            mu1 = p[p <= eng].sum() / w1
            mu2 = p[p > eng].sum() / (n - w1)
            sc = (mu1 - mu2) ** 2 * w1 * (n - w1)
            assert abs(sc - best) < 1e-6 * max(best, 1.0)


# ------------------------------------------------------------ nn join

def test_nn_join_centers_bruteforce(ray_session, tmp_path):
    from hand_index_ray.config import EngineConfig
    from hand_index_ray.pipelines.build import build_index, compact_index
    from hand_index_ray.pipelines.query import nn_join_centers
    from hand_index_ray.sources import synth

    images = str(tmp_path / "imgs")
    index = str(tmp_path / "idx")
    synth.write_images_tpch(images, "/root/testdata/sf0.001", fragments=4)
    cfg = EngineConfig(footprint_formula="tpch")
    build_index(images, index, cfg)
    compact_index(index, cfg)
    got = nn_join_centers(index, target_mod=8).to_pandas()

    import pyarrow.parquet as pqt
    import glob as _g
    foot = pa.concat_tables([
        pqt.read_table(f, columns=["image_id", "minx", "miny",
                                   "maxx", "maxy"])
        for f in _g.glob(index + "/**/*.parquet", recursive=True)
        if "manifest" not in f])
    df = foot.to_pandas().drop_duplicates("image_id")
    k = df["image_id"].str.slice(4).astype(np.int64)
    df["cx"] = (df["minx"] + df["maxx"]) / 2.0
    df["cy"] = (df["miny"] + df["maxy"]) / 2.0
    tgt = df[k % 8 == 0].sort_values("image_id")
    src = df[k % 8 != 0]
    assert len(got) == len(src)
    gm = got.set_index("image_id")
    for r in src.itertuples():
        d2 = ((tgt["cx"] - r.cx) ** 2 + (tgt["cy"] - r.cy) ** 2).to_numpy()
        j = int(np.argmin(d2))
        assert gm.loc[r.image_id, "nn_id"] == tgt["image_id"].iloc[j]


# ------------------------------------------------------- concurrency

def test_peak_concurrency_sweepline(ray_session):
    from hand_index_ray.relational import peak_concurrency

    B = 1000  # µs bucket
    # bucket 0: intervals [0,500) [100,400) [300,600) -> peak 3 at t=300
    # one event at 900 with dur crossing the bucket -> clipped at 1000
    # bucket 1: single interval
    rows = [(0, 0.0005), (100, 0.0003), (300, 0.0003), (900, 0.5),
            (1500, 0.0001)]
    tbl = pa.table({"ts": pa.array([r[0] for r in rows],
                                   pa.timestamp("us")),
                    "value": pa.array([r[1] for r in rows], pa.float64())})
    got = peak_concurrency(_ds(tbl).repartition(2), "ts", "value",
                           bucket_us=B, num_buckets=4)
    m = dict(zip(got["day"], got["peak"]))
    assert m == {0: 3, 1: 1}


def test_peak_concurrency_brute(ray_session):
    from hand_index_ray.relational import peak_concurrency

    rng = np.random.default_rng(13)
    n = 300
    ts = np.sort(rng.integers(0, 5_000_000, n))
    dur = rng.uniform(0.001, 0.8, n)
    B = 1_000_000
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                    "value": pa.array(dur, pa.float64())})
    got = peak_concurrency(_ds(tbl).repartition(3), "ts", "value",
                           bucket_us=B, num_buckets=4)
    # brute force
    e = np.minimum(ts + (np.sign(dur * 1e6) * np.floor(np.abs(dur * 1e6)
                                                       + 0.5)).astype(np.int64),
                   (ts // B + 1) * B)
    want = {}
    for d in np.unique(ts // B):
        sel = ts // B == d
        s_, e_ = ts[sel], e[sel]
        peak = max(int(((s_ <= t) & (t < e_)).sum()) for t in s_)
        want[int(d)] = peak
    assert dict(zip(got["day"], got["peak"])) == want


# ---------------------------------------------------- dominant levels

def test_dominant_levels_bincount(ray_session):
    from hand_index_ray.kernels import image as imk
    from hand_index_ray.pipelines.image_embed import dominant_levels

    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    tbl = pa.table({"image_id": pa.array(["img-x"]),
                    "bytes": pa.array([imk.encode(px, "raw")], pa.binary()),
                    "fmt": pa.array(["raw"]),
                    "w": pa.array([8], pa.int32()),
                    "h": pa.array([8], pa.int32())})
    got = dominant_levels(_ds(tbl), k=2).to_pandas()
    p = px.astype(np.int64)
    lum = (77 * p[:, :, 0] + 150 * p[:, :, 1] + 29 * p[:, :, 2]) // 256
    cnt = np.bincount(lum.ravel(), minlength=256)
    order = sorted(range(256), key=lambda v: (-cnt[v], v))[:2]
    want = [(v, int(cnt[v]), r + 1) for r, v in enumerate(order) if cnt[v]]
    assert list(zip(got["lum"], got["n_px"], got["rank"])) == want


def test_connected_components_long_chain_pointer_jumping(ray_session):
    """A 1500-node chain converges via pointer jumping in far fewer
    than max_rounds=40 (pure propagation would need ~1500)."""
    from hand_index_ray.pipelines.graph import connected_components

    n = 1500
    tbl = pa.table({"a": pa.array(range(n - 1), pa.int64()),
                    "b": pa.array(range(1, n), pa.int64())})
    got = connected_components(_ds(tbl), num_buckets=4,
                               max_rounds=40).to_pandas()
    assert len(got) == n
    assert set(got["comp"]) == {0}


# ------------------------------------------------------- window frame

def test_windowed_sum_rolling(ray_session):
    from hand_index_ray.relational import windowed_sum

    tbl = pa.table({"k": pa.array(["a"] * 5 + ["b"] * 3),
                    "o": pa.array([1, 2, 3, 4, 5, 1, 2, 3], pa.int64()),
                    "v": pa.array([10, 20, 30, 40, 50, 1, 2, 3], pa.int64())})
    got = windowed_sum(_ds(tbl).repartition(3), ["k"], "o", "v",
                       frame_rows=3, num_buckets=4).to_pandas()
    got = got.sort_values(["k", "o"]).reset_index(drop=True)
    assert got["mv_sum"].tolist() == [10, 30, 60, 90, 120, 1, 3, 6]


def test_window_ntile_ansi_sizes(ray_session):
    from hand_index_ray.relational import window_ntile

    # m=7, n=4 -> tile sizes 2,2,2,1 ; m=3, n=4 -> 1,1,1
    tbl = pa.table({"k": pa.array(["a"] * 7 + ["b"] * 3),
                    "o": pa.array(list(range(7)) + list(range(3)), pa.int64()),
                    "t": pa.array(list(range(10)), pa.int64())})
    got = window_ntile(_ds(tbl).repartition(2), ["k"], "o", "t",
                       n_tiles=4, num_buckets=4).to_pandas()
    a = got[got.k == "a"].sort_values("o")["tile"].tolist()
    b = got[got.k == "b"].sort_values("o")["tile"].tolist()
    assert a == [1, 1, 2, 2, 3, 3, 4]
    assert b == [1, 2, 3]


def test_max_streak_islands(ray_session):
    from hand_index_ray.relational import max_streak

    B = 10
    rows = [("u1", 5), ("u1", 15), ("u1", 25), ("u1", 45),  # days 0,1,2,4
            ("u2", 5), ("u2", 95),                           # days 0, 9
            ("u3", 5), ("u3", 7)]                            # day 0 twice
    tbl = pa.table({"user_id": pa.array([r[0] for r in rows]),
                    "ts": pa.array([r[1] for r in rows],
                                   pa.timestamp("us"))})
    got = max_streak(_ds(tbl).repartition(2), "user_id", "ts",
                     bucket_us=B, num_buckets=4).to_pandas()
    m = dict(zip(got["user_id"], got["max_streak"]))
    assert m == {"u1": 3, "u2": 1, "u3": 1}


# --------------------------------------------------- json / unpivot

def test_extract_json_int(ray_session):
    from hand_index_ray.relational import extract_json_int

    tbl = pa.table({"props": pa.array(
        ['{"k": 87}', '{"k": -3}', '{"other": 1}', '{"k": 0, "x": 9}'])})
    got = extract_json_int(_ds(tbl), "props", "k", "kv").to_pandas()
    assert got["kv"].fillna(-999).tolist() == [87, -3, -999, 0]


def test_unpivot_roundtrip(ray_session):
    from hand_index_ray.relational import unpivot

    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "a": pa.array([10, 20], pa.int64()),
                    "b": pa.array([30, 40], pa.int64())})
    got = unpivot(_ds(tbl), ["id"], ["a", "b"]).to_pandas()
    got = got.sort_values(["id", "measure"]).reset_index(drop=True)
    assert list(zip(got["id"], got["measure"], got["value"])) == [
        (1, "a", 10), (1, "b", 30), (2, "a", 20), (2, "b", 40)]


# ------------------------------------------------------------ k-means

def test_kmeans_micro_vs_numpy(ray_session):
    from hand_index_ray.pipelines.kmeans import kmeans_micro

    rng = np.random.default_rng(17)
    n, d, k = 120, 6, 4
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    got = kmeans_micro(_ds(tbl).repartition(4), k=k, rounds=2)

    def rha(x):
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    v = rha(vecs.astype(np.float64) * 1e6)
    c = v[:k].copy()
    for _ in range(2):
        diff = v[:, None, :] - c[None, :, :]
        d2 = np.einsum("bkd,bkd->bk", diff, diff)
        a = np.argmin(d2, axis=1)
        for cl in range(k):
            sel = v[a == cl]
            if len(sel):
                c[cl] = rha(sel.sum(axis=0).astype(np.float64) / len(sel))
    sizes = np.bincount(a, minlength=k)
    want = {(cl, dim + 1): (int(c[cl, dim]), int(sizes[cl]))
            for cl in range(k) for dim in range(d)}
    gotm = {(r.cluster, r.dim): (r.c_micro, r.n) for r in got.itertuples()}
    assert gotm == want


# ----------------------------------------------------------- pagerank

def test_pagerank_int_vs_brute(ray_session):
    from hand_index_ray.pipelines.graph import pagerank_int

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (0, 1)]  # dup edge
    tbl = pa.table({"u": pa.array([e[0] for e in edges], pa.int64()),
                    "v": pa.array([e[1] for e in edges], pa.int64())})
    got = pagerank_int(_ds(tbl).repartition(2), iters=3)
    E = sorted(set(edges))
    nodes = sorted({u for u, _ in E} | {v for _, v in E})
    N = len(nodes)
    deg = {}
    for u, _ in E:
        deg[u] = deg.get(u, 0) + 1
    r = {n: 10 ** 9 // N for n in nodes}
    for _ in range(3):
        s = {n: 0 for n in nodes}
        for u, v in E:
            s[v] += r[u] // deg[u]
        r = {n: 150000000 // N + (85 * s[n]) // 100 for n in nodes}
    assert dict(zip(got["node"], got["rank"])) == r


# ---------------------------------------------------------- triangles

def test_triangle_counts_vs_brute(ray_session):
    from hand_index_ray.pipelines.graph import triangle_counts
    from itertools import combinations

    rng = np.random.default_rng(23)
    pairs = set()
    for a, b in rng.integers(0, 15, (60, 2)):
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    tbl = pa.table({"u": pa.array([p[0] for p in pairs], pa.int64()),
                    "v": pa.array([p[1] for p in pairs], pa.int64())})
    got = triangle_counts(_ds(tbl).repartition(3))
    want = {}
    for x, y, z in combinations(range(15), 3):
        if (x, y) in pairs and (y, z) in pairs and (x, z) in pairs:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert dict(zip(got["node"], got["n_tri"])) == want


# ------------------------------------------------------------ mad / eq

def test_grouped_mad_brute(ray_session):
    from hand_index_ray.relational import grouped_mad

    rng = np.random.default_rng(29)
    g = rng.choice(["a", "b"], 101).tolist()
    v = rng.integers(-50, 50, 101)
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v, pa.int64())})
    got = grouped_mad(_ds(tbl).repartition(3), ["g"], "v",
                      num_buckets=4).to_pandas()

    def disc_med(arr):
        arr = np.sort(arr)
        return int(arr[int(np.ceil(0.5 * len(arr))) - 1])

    df = pd.DataFrame({"g": g, "v": v})
    for r in got.itertuples():
        vals = df[df.g == r.g]["v"].to_numpy()
        med = disc_med(vals)
        assert (r.n, r.med, r.mad) == (len(vals), med,
                                       disc_med(np.abs(vals - med)))


def test_equalize_stats_lut(ray_session):
    from hand_index_ray.kernels import image as imk
    from hand_index_ray.pipelines.image_embed import equalize_stats

    rng = np.random.default_rng(33)
    px = rng.integers(0, 64, (9, 11, 3)).astype(np.uint8)  # narrow range
    tbl = pa.table({"image_id": pa.array(["i0"]),
                    "bytes": pa.array([imk.encode(px, "raw")], pa.binary()),
                    "fmt": pa.array(["raw"]),
                    "w": pa.array([11], pa.int32()),
                    "h": pa.array([9], pa.int32())})
    got = equalize_stats(_ds(tbl)).to_pandas()
    p = px[:, :, 0].astype(np.int64).ravel()
    n = p.size
    cnt = np.bincount(p, minlength=256)
    cdf = np.cumsum(cnt)
    cdf_min = int(cdf[np.flatnonzero(cnt)[0]])
    lut = ((cdf - cdf_min) * 255) // (n - cdf_min)
    assert got["eq_sum"].iloc[0] == int(lut[p].sum())


# ----------------------------------------------------------- pagination

def test_sorted_slice_vs_sort(ray_session):
    from hand_index_ray.relational import sorted_slice

    rng = np.random.default_rng(41)
    v = rng.integers(0, 1000, 500)
    i = np.arange(500)
    tbl = pa.table({"v": pa.array(v, pa.int64()),
                    "i": pa.array(i, pa.int64())})
    got = sorted_slice(_ds(tbl).repartition(8), ["v", "i"],
                       offset=37, k=10, descending=True)
    df = pd.DataFrame({"v": v, "i": i}).sort_values(
        ["v", "i"], ascending=False).iloc[37:47].reset_index(drop=True)
    assert got.equals(df)


# ----------------------------------------------- convert / drawdown

def test_time_to_convert_brute(ray_session):
    from hand_index_ray.relational import time_to_convert

    rows = [("u1", 100, "signup"), ("u1", 400, "purchase"),
            ("u2", 50, "signup"), ("u2", 60, "purchase"),
            ("u3", 10, "purchase"), ("u3", 20, "signup"),  # converted before signup
            ("u4", 5, "signup")]
    tbl = pa.table({"user_id": pa.array([r[0] for r in rows]),
                    "ts": pa.array([r[1] for r in rows],
                                   pa.timestamp("us")),
                    "event_type": pa.array([r[2] for r in rows])})
    got = time_to_convert(_ds(tbl).repartition(2), "user_id", "ts",
                          "event_type", "signup", "purchase",
                          num_buckets=4)
    # deltas: u1=300, u2=10 -> disc median of [10, 300] = 10
    assert got["n_converted"].iloc[0] == 2
    assert got["p50_us"].iloc[0] == 10


def test_max_drawdown_brute(ray_session):
    from hand_index_ray.relational import max_drawdown

    tbl = pa.table({"k": pa.array(["a"] * 5 + ["b"] * 3),
                    "o": pa.array([1, 2, 3, 4, 5, 1, 2, 3], pa.int64()),
                    "v": pa.array([10, 7, 12, 3, 8, 5, 5, 9], pa.int64())})
    got = max_drawdown(_ds(tbl).repartition(3), ["k"], "o", "v",
                       num_buckets=4).to_pandas()
    m = dict(zip(got["k"], got["max_dd"]))
    assert m == {"a": 9, "b": 0}  # a: peak 12 -> 3 ; b: never below peak


# ----------------------------------------------------------- BFS hops

def test_bfs_hops_brute(ray_session):
    from hand_index_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 200).astype(np.int64)
    b = rng.integers(0, 60, 200).astype(np.int64)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
    seeds = np.array([3, 41], dtype=np.int64)
    got = bfs_hops(_ds(tbl).repartition(5), seeds, num_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)

    # brute BFS over the symmetrized edge list
    from collections import deque
    adj = {}
    for u, v in zip(a, b):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {int(s): 0 for s in seeds if int(s) in adj}
    q = deque(dist)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    exp = pd.DataFrame(sorted(dist.items()), columns=["node", "hops"]) \
        .astype({"node": "int64", "hops": "int64"})
    assert got.equals(exp)


def test_bfs_hops_unreachable_and_seed_only(ray_session):
    from hand_index_ray.pipelines.graph import bfs_hops

    # two components: {1,2,3} and {10,11}; seed in the first only
    tbl = pa.table({"a": pa.array([1, 2, 10], pa.int64()),
                    "b": pa.array([2, 3, 11], pa.int64())})
    got = bfs_hops(_ds(tbl), np.array([1], np.int64), num_buckets=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == [1, 2, 3]
    assert got["hops"].tolist() == [0, 1, 2]


# ------------------------------------------------- trajectory / raster

def test_staypoint_stats_brute(ray_session):
    from hand_index_ray.pipelines.trajectory import staypoint_stats

    rng = np.random.default_rng(4)
    rows = []
    for k in range(6):
        T = 40
        xs = rng.integers(0, 30, T)
        ys = rng.integers(0, 30, T)
        if k == 5:  # one trajectory with a guaranteed dwell
            xs[10:20] = 7
            ys[10:20] = 9
        for t in range(T):
            rows.append((k, t, int(xs[t]), int(ys[t])))
    tbl = pa.table({c: pa.array([r[i] for r in rows], pa.int64())
                    for i, c in enumerate(["k", "t", "x", "y"])})
    W, R = 5, 3
    got = staypoint_stats(ray.data.from_arrow(tbl).repartition(4),
                          "k", "t", "x", "y", window=W, radius=R,
                          num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    exp_rows = []
    df = tbl.to_pandas()
    for k, g in df.groupby("k"):
        g = g.sort_values("t")
        xs, ys = g["x"].to_numpy(), g["y"].to_numpy()
        anchors = [t for t in range(len(xs) - W + 1)
                   if max(abs(xs[t:t + W] - xs[t]).max(),
                          abs(ys[t:t + W] - ys[t]).max()) <= R]
        if anchors:
            exp_rows.append((k, len(anchors), sum(anchors), anchors[0]))
    exp = pd.DataFrame(exp_rows,
                       columns=["k", "n_stay", "idx_sum", "first_stay"]) \
        .astype("int64")
    assert got.astype("int64").equals(exp)


def test_rasterize_lines_brute(ray_session):
    from hand_index_ray.pipelines.raster import rasterize_lines

    lines = [(0, 5, 40, 37), (3, 30, 50, 2), (10, 10, 45, 10)]
    tbl = pa.table({
        "x0": pa.array([l[0] for l in lines], pa.int64()),
        "y0": pa.array([l[1] for l in lines], pa.int64()),
        "x1": pa.array([l[2] for l in lines], pa.int64()),
        "y1": pa.array([l[3] for l in lines], pa.int64())})
    got = rasterize_lines(ray.data.from_arrow(tbl), tile_px=16,
                          tiles_x=4, num_buckets=4).to_pandas() \
        .sort_values("tile").reset_index(drop=True)

    from collections import defaultdict
    hits = defaultdict(list)
    for x0, y0, x1, y1 in lines:
        dx = x1 - x0
        for x in range(x0, x1 + 1):
            y = (2 * (y0 * (x1 - x) + y1 * (x - x0)) + dx) // (2 * dx)
            hits[(y // 16) * 4 + x // 16].append((x, y))
    exp_rows = []
    for tile in sorted(hits):
        pix = sorted(set(hits[tile]))
        exp_rows.append((tile, len(hits[tile]), len(pix),
                         sum(x + 131 * y for x, y in pix)))
    exp = pd.DataFrame(exp_rows,
                       columns=["tile", "n_hits", "n_pix", "checksum"]) \
        .astype("int64")
    assert got.astype("int64").equals(exp)


# ----------------------------------------------------------- k-core

def _brute_kcore(edges, k):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(s) for n, s in adj.items()}


def test_kcore_brute(ray_session):
    from hand_index_ray.pipelines.graph import kcore

    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 160).astype(np.int64)
    b = rng.integers(0, 40, 160).astype(np.int64)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
    for k in (2, 3, 4):
        got = kcore(_ds(tbl).repartition(5), k, num_buckets=4) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        exp = pd.DataFrame(sorted(_brute_kcore(zip(a, b), k).items()),
                           columns=["node", "deg"]).astype("int64")
        if len(exp) == 0:
            assert len(got) == 0
        else:
            assert got.equals(exp), k


def test_kcore_ignores_multi_edges_and_self_loops(ray_session):
    from hand_index_ray.pipelines.graph import kcore

    # triangle with every edge tripled + a self-loop: 2-core is the
    # triangle with degree 2 each (distinct-neighbor degrees)
    a = [1, 1, 1, 2, 2, 2, 1, 1, 1, 3] * 1
    b = [2, 2, 2, 3, 3, 3, 3, 3, 3, 3]
    tbl = pa.table({"a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64())})
    got = kcore(_ds(tbl), 2, num_buckets=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == [1, 2, 3]
    assert got["deg"].tolist() == [2, 2, 2]
    assert len(kcore(_ds(tbl), 3, num_buckets=2).to_pandas()) == 0


def test_copair_counts_brute(ray_session):
    from hand_index_ray.pipelines.graph import copair_counts

    rng = np.random.default_rng(12)
    u = rng.integers(0, 10, 120).astype(np.int64)
    w = rng.integers(0, 8, 120).astype(np.int64)
    tbl = pa.table({"u": pa.array(u), "w": pa.array(w)})
    got = copair_counts(_ds(tbl).repartition(4), num_buckets=4) \
        .to_pandas().sort_values(["u1", "u2"]).reset_index(drop=True)

    edges = set(zip(u, w))
    from collections import defaultdict
    nb = defaultdict(set)
    for a, b in edges:
        nb[a].add(b)
    rows = []
    us = sorted(nb)
    for i, a in enumerate(us):
        for b in us[i + 1:]:
            c = len(nb[a] & nb[b])
            if c >= 2:
                rows.append((a, b, c, c * (c - 1) // 2))
    exp = pd.DataFrame(rows, columns=["u1", "u2", "c", "bf"]) \
        .astype("int64")
    assert got.astype("int64").equals(exp)


# ---------------------------------------------------- forest_rank

def test_forest_rank_chain_and_forest(ray_session):
    from hand_index_ray.pipelines.graph import forest_rank

    # chain 1<-2<-...<-20 (depth 19) + a bushy second tree + isolated
    # root: exercises the doubling past several wave boundaries
    rows = [(1, 0)] + [(k, k - 1) for k in range(2, 21)]
    rows += [(100, 0), (101, 100), (102, 100), (103, 101), (104, 103)]
    rows += [(500, 0)]
    t = pa.table({"node": pa.array([r[0] for r in rows], pa.int64()),
                  "parent": pa.array([r[1] for r in rows], pa.int64())})
    got = forest_rank(_ds(t)).to_pandas().set_index("node")

    def brute(node):
        d = 0
        pmap = dict(rows)
        while pmap[node] > 0:
            node = pmap[node]
            d += 1
        return node, d

    for n, _ in rows:
        root, depth = brute(n)
        assert got.loc[n, "root"] == root, n
        assert got.loc[n, "depth"] == depth, n
    assert len(got) == len(rows)


def test_forest_rank_log_rounds(ray_session):
    """A 64-deep chain must converge in ~log2(64)+1 doubling rounds,
    not 64 — pinned by max_rounds=9."""
    from hand_index_ray.pipelines.graph import forest_rank

    rows = [(1, 0)] + [(k, k - 1) for k in range(2, 65)]
    t = pa.table({"node": pa.array([r[0] for r in rows], pa.int64()),
                  "parent": pa.array([r[1] for r in rows], pa.int64())})
    got = forest_rank(_ds(t), max_rounds=9).to_pandas()
    assert got["depth"].max() == 63
    assert (got["root"] == 1).all()


# ---------------------------------------------------- cheapest_hops

def test_cheapest_hops_vs_brute(ray_session):
    from hand_index_ray.pipelines.graph import cheapest_hops

    rng = np.random.RandomState(7)
    E = 300
    u = rng.randint(0, 60, E)
    v = rng.randint(0, 60, E)
    w = rng.randint(1, 20, E).astype(np.int64)
    seeds = np.array([3, 11])
    for hops in (1, 3):
        t = pa.table({"u": pa.array(u, pa.int64()),
                      "v": pa.array(v, pa.int64()),
                      "w": pa.array(w, pa.int64())})
        got = cheapest_hops(_ds(t), seeds, hops=hops).to_pandas()
        INF = 1 << 60
        d = {int(s): 0 for s in seeds}
        for _ in range(hops):
            nd = dict(d)
            for a, b, c in zip(u, v, w):
                a, b = int(a), int(b)
                if a in d and d[a] + c < nd.get(b, INF):
                    nd[b] = d[a] + int(c)
            d = nd
        gm = dict(zip(got["node"], got["cost"]))
        assert gm == d, hops


def test_reciprocity(ray_session):
    from hand_index_ray.pipelines.graph import reciprocity

    edges = [(1, 2), (2, 1), (1, 2),      # reciprocal pair, dup edge
             (3, 4), (4, 5), (5, 4),      # one one-way + one recip
             (6, 6)]                       # self-loop excluded
    t = pa.table({"u": pa.array([e[0] for e in edges], pa.int64()),
                  "v": pa.array([e[1] for e in edges], pa.int64())})
    got = reciprocity(_ds(t)).iloc[0]
    assert got["n_directed"] == 5       # (1,2),(2,1),(3,4),(4,5),(5,4)
    assert got["n_undirected"] == 3
    assert got["n_reciprocal"] == 2
