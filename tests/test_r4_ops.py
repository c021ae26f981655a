"""Property/brute-force checks for the round-4 operators: chunk dedup,
count-min exactness regime, kNN graph, mixture sampling, contamination
screen — each verified against a direct NumPy/pure-Python recomputation
on randomized inputs (the oracle mirror covers the fixed fixtures; this
covers the space around them)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }))


def _rand_corpus(rng, n_docs=40, vocab=8):
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n_docs):
        toks = [words[i] for i in rng.integers(0, vocab,
                                               rng.integers(1, 35))]
        rows.append((d, " ".join(toks), f"s{d % 3}"))
    return rows


def test_chunk_dedup_matches_bruteforce(ray_session):
    from hand_index_ray.pipelines.text import chunk_dedup

    rng = np.random.default_rng(7)
    rows = _rand_corpus(rng)
    got = chunk_dedup(_docs_ds(rows), window=5).to_pandas() \
        .set_index("doc_id").sort_index()

    # brute force: first (doc, idx) per distinct chunk string wins
    first: dict = {}
    totals: dict = {}
    for d, text, _s in rows:
        toks = text.split(" ")
        chunks = [" ".join(toks[i:i + 5]) for i in range(0, len(toks), 5)]
        totals[d] = len(chunks)
        for i, c in enumerate(chunks):
            if c not in first or (d, i) < first[c]:
                first[c] = (d, i)
    kept: dict = {}
    for (d, _i) in first.values():
        kept[d] = kept.get(d, 0) + 1
    for d in totals:
        assert got.loc[d, "n_chunks"] == totals[d]
        assert got.loc[d, "n_kept"] == kept.get(d, 0)


def test_cms_exact_regime_and_upper_bound(ray_session):
    """est == exact when width >> distinct; with a TINY width the
    estimate is still an upper bound (never undercounts)."""
    import ray.data

    from hand_index_ray.relational import cms_key_counts

    rng = np.random.default_rng(11)
    vals = [f"k{int(i)}" for i in rng.integers(0, 30, 5000)]
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.string())}))
    exact = pd.Series(vals).value_counts()

    wide = cms_key_counts(ds, "k", width=2048, depth=4).set_index("k")
    for k, n in exact.items():
        assert wide.loc[k, "est"] == n

    narrow = cms_key_counts(ds, "k", width=8, depth=2).set_index("k")
    for k, n in exact.items():
        assert narrow.loc[k, "est"] >= n  # CMS never undercounts


def test_knn_graph_matches_bruteforce(ray_session):
    import ray.data

    from hand_index_ray.pipelines.ann import knn_graph

    rng = np.random.default_rng(3)
    n, dim, k = 30, 8, 4
    m = rng.standard_normal((n, dim))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float64()))}))
    got = knn_graph(ds, k=k).to_pandas().sort_values(
        ["src", "rank"]).reset_index(drop=True)

    mn = m / np.linalg.norm(m, axis=1)[:, None]
    sims = np.round(mn @ mn.T * 1e6).astype(np.int64)
    for s in range(n):
        order = sorted((int(-sims[s, d]), d) for d in range(n) if d != s)
        want = [(d, -negsim) for negsim, d in order[:k]]
        sub = got[got["src"] == s]
        assert list(zip(sub["dst"], sub["sim_micro"])) == want
        assert list(sub["rank"]) == list(range(1, k + 1))


def test_mixture_sample_quota_rule(ray_session):
    from hand_index_ray.pipelines.text import mixture_sample

    rng = np.random.default_rng(5)
    rows = _rand_corpus(rng, n_docs=60)
    Q = 40
    got = mixture_sample(_docs_ds(rows), quota_tokens=Q).to_pandas()

    md5 = hashlib.md5
    for src in {r[2] for r in rows}:
        pool = [(int.from_bytes(md5(str(d).encode()).digest()[8:16],
                                "little") % 1_000_000, d,
                 len(t.split(" ")))
                for d, t, s in rows if s == src]
        pool.sort()
        cum, want = 0, []
        for _o, d, nt in pool:
            if cum < Q:
                cum += nt
                want.append((d, cum))
        sub = got[got["source"] == src].sort_values("cum_tokens")
        assert list(zip(sub["doc_id"], sub["cum_tokens"])) == want
        # selected total crosses the quota by at most one doc
        assert cum >= min(Q, sum(nt for _o, _d, nt in pool))


def test_contamination_screen_bipartite(ray_session):
    from hand_index_ray.pipelines.text import contamination_screen

    rows = [
        (0, "a b c d e", "s"),        # benchmark (0 % 2 == 0)
        (2, "x y z w v", "s"),        # benchmark
        (1, "q a b c r", "s"),        # shares gram "a b c" with doc 0
        (3, "p q r s t", "s"),        # clean
        (5, "x y z k m", "s"),        # shares "x y z" with doc 2
    ]
    got = contamination_screen(_docs_ds(rows), every=2, n=3) \
        .to_pandas().set_index("doc_id").sort_index()
    assert list(got.index) == [1, 3, 5]  # benchmark docs excluded
    assert bool(got.loc[1, "contaminated"]) is True
    assert bool(got.loc[3, "contaminated"]) is False
    assert bool(got.loc[5, "contaminated"]) is True
    assert got.loc[1, "n_shared"] == 1 and got.loc[5, "n_shared"] == 1


def test_editdist_pairs_matches_bruteforce(ray_session):
    from hand_index_ray.pipelines.text import editdist_pairs

    rng = np.random.default_rng(13)
    rows = []
    for d in range(30):
        toks = ["w%d" % i for i in rng.integers(0, 4, rng.integers(2, 8))]
        rows.append((d, " ".join(toks), "s"))
    got = editdist_pairs(_docs_ds(rows), max_dist=3).to_pandas()
    got_set = {(a, b): int(x) for a, b, x in
               zip(got["id_a"], got["id_b"], got["dist"])}

    def lev(a, b):
        la, lb = len(a), len(b)
        dp = np.zeros((la + 1, lb + 1), int)
        dp[:, 0] = np.arange(la + 1)
        dp[0, :] = np.arange(lb + 1)
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                               dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return dp[la, lb]

    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i][1][:60], rows[j][1][:60]
            if a.split(" ")[0] != b.split(" ")[0]:
                continue
            if abs(len(a) - len(b)) > 3:
                continue
            d = lev(a, b)
            if d <= 3:
                want[(i, j)] = int(d)
    assert got_set == want


def test_exact_substr_matches_bruteforce(ray_session):
    from hand_index_ray.pipelines.text import exact_substr_pairs

    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(10)]
    docs = []
    for d in range(12):
        docs.append([words[i] for i in rng.integers(0, 10, 30)])
    # plant a verbatim 15-token quote from doc 0 into docs 5 and 9
    docs[5][3:18] = docs[0][2:17]
    docs[9][10:25] = docs[0][2:17]
    rows = [(d, " ".join(t), "s") for d, t in enumerate(docs)]
    got = exact_substr_pairs(_docs_ds(rows), k=4, min_tokens=6).to_pandas()
    got_map = {(a, b): int(x) for a, b, x in
               zip(got["id_a"], got["id_b"], got["max_shared_tokens"])}

    def lcs_tokens(a, b):
        best = 0
        dp = np.zeros((len(a) + 1, len(b) + 1), int)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    dp[i, j] = dp[i - 1, j - 1] + 1
                    best = max(best, dp[i, j])
        return best

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            m = lcs_tokens(docs[i], docs[j])
            if m >= 6:
                want[(i, j)] = m
    assert got_map == want
    assert got_map[(0, 5)] >= 15 and got_map[(0, 9)] >= 15


def test_int8_calibration_constant_dim_matches_oracle_nulls(ray_session):
    """A constant dimension yields 0/0 → NULL in the SQL oracle; the
    engine must exclude it from sum_q and n_sat the same way."""
    import duckdb
    import ray.data

    from hand_index_ray.pipelines.ann import int8_calibration

    rng = np.random.default_rng(23)
    m = rng.standard_normal((20, 6))
    m[:, 2] = 1.25  # constant dim
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(20), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float64()))}))
    got = int8_calibration(ds).to_pandas().set_index("vec_id").sort_index()

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES " + ",".join(
        f"({i}, {list(map(float, m[i]))})" for i in range(20)) +
        ") t(vec_id, v)")
    o = con.execute("""
        WITH dims AS (SELECT generate_series AS i FROM generate_series(1, 6)),
        el AS (SELECT vec_id, i, v[i] AS x FROM e CROSS JOIN dims),
        b AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM el GROUP BY i),
        q AS (SELECT el.vec_id,
                     FLOOR((el.x - b.mn) * 255.0 / (b.mx - b.mn) + 0.5) AS qq
              FROM el JOIN b USING (i))
        SELECT vec_id, CAST(SUM(qq) AS BIGINT) AS sum_q,
               CAST(SUM(CASE WHEN qq = 0 OR qq = 255 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sat
        FROM q GROUP BY vec_id ORDER BY vec_id
    """).fetchdf().set_index("vec_id")
    assert got["sum_q"].tolist() == o["sum_q"].tolist()
    assert got["n_sat"].tolist() == o["n_sat"].tolist()
