"""Unit tests for the round-3 batch-9 operators: Haar subband stats,
dHash buckets, vocabulary growth, DAG layering, SAX words, phrase
counts — each against a hand-computed or brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa

from hand_index_ray.pipelines import mining
from hand_index_ray.pipelines.graph import dag_layers
from hand_index_ray.pipelines.text import phrase_counts, vocab_growth


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(3)


def _img_ds(arrays):
    from hand_index_ray.kernels import image as imk

    n = len(arrays)
    return _ds(pa.table({
        "image_id": pa.array([f"t{i}" for i in range(n)], pa.string()),
        "bytes": pa.array([imk.encode(a, "raw") for a in arrays],
                          pa.binary()),
        "w": pa.array([a.shape[1] for a in arrays], pa.int32()),
        "h": pa.array([a.shape[0] for a in arrays], pa.int32()),
        "fmt": pa.array(["raw"] * n, pa.string())}))


def _haar_ref(p):
    """Brute-force 2-level lifting Haar reference."""
    def lvl(m):
        a, b = m[0::2, 0::2], m[0::2, 1::2]
        c, d = m[1::2, 0::2], m[1::2, 1::2]
        return (a + b + c + d, (a + b) - (c + d),
                (a - b) + (c - d), (a - b) - (c - d))

    ll1, lh1, hl1, hh1 = lvl(p.astype(np.int64))
    ll2, _, _, hh2 = lvl(ll1)
    return {"e_lh1": int((lh1 ** 2).sum()), "e_hl1": int((hl1 ** 2).sum()),
            "e_hh1": int((hh1 ** 2).sum()), "ll2_sum": int(ll2.sum()),
            "e_hh2": int((hh2 ** 2).sum())}


def test_haar_stats(ray_session):
    from hand_index_ray.pipelines.image_embed import haar_stats

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, (8, 12, 3), dtype=np.uint8)
            for _ in range(3)]
    out = (haar_stats(_img_ds(imgs), channel=1).to_pandas()
           .set_index("image_id").sort_index())
    for i, img in enumerate(imgs):
        ref = _haar_ref(img[:, :, 1])
        row = out.loc[f"t{i}"]
        for k, v in ref.items():
            assert int(row[k]) == v, (i, k)


def test_dhash_bit_layout(ray_session):
    from hand_index_ray.pipelines.image_embed import dhash_counts

    # gradient image: every row strictly decreasing -> all 56 bits set
    dec = np.repeat(np.tile(np.arange(255, 255 - 32, -1,
                                      dtype=np.uint8)[None, :],
                            (24, 1))[:, :, None], 3, axis=2)
    # constant image -> no strict > anywhere -> hash 0
    flat = np.full((24, 32, 3), 9, np.uint8)
    out = (dhash_counts(_img_ds([dec, flat, flat]), channel=0)
           .to_pandas().sort_values("dhash").reset_index(drop=True))
    assert out["dhash"].tolist() == [0, (1 << 56) - 1]
    assert out["n"].tolist() == [2, 1]


def test_vocab_growth_brute(ray_session):
    texts = ["a b c", "b c d", "e", "a f f"]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(texts)})
    out = (vocab_growth(_ds(tbl), [1, 2, 4]).to_pandas()
           .sort_values("n_docs"))
    # first docs: a,b,c @0; d @1; e @2; f @3
    assert out[["n_docs", "vocab"]].values.tolist() == [
        [1, 3], [2, 4], [4, 6]]


def test_dag_layers_hand(ray_session):
    # 0->1->2->3 chain plus shortcut 0->2: layer = longest path
    tbl = pa.table({"u": pa.array([0, 1, 2, 0], pa.int64()),
                    "v": pa.array([1, 2, 3, 2], pa.int64())})
    out = (dag_layers(_ds(tbl), "u", "v").to_pandas()
           .sort_values("node"))
    assert out[["node", "layer"]].values.tolist() == [
        [0, 0], [1, 1], [2, 2], [3, 3]]


def test_sax_words_hand(ray_session):
    # 8 series of one value each fix quartiles: values 1..8 ->
    # q1=2, q2=4, q3=6 (percentile_disc = ceil(p*n) 1-based)
    ks = list(range(1, 9))
    tbl = pa.table({"k": pa.array(ks, pa.int64()),
                    "o": pa.array([0] * 8, pa.int64()),
                    "v": pa.array(ks, pa.int64())})
    out = mining.sax_words(_ds(tbl), "k", "o", "v", frames=4).to_pandas()
    got = dict(zip(out["word"], out["n"]))
    # v<2 -> a (k=1); v<4 -> b (2,3); v<6 -> c (4,5); else d (6,7,8)
    assert got == {"a": 1, "b": 2, "c": 2, "d": 3}


def test_phrase_counts_no_boundary_bleed(ray_session):
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["x data group y data group",
                                      "ends with data",
                                      "group starts"])})
    # doc1 has 2 matches; doc2's trailing "data" must NOT pair with
    # doc3's leading "group" (cross-document adjacency)
    out = phrase_counts(_ds(tbl), "data", "group").to_pandas()
    assert out.values.tolist() == [[1, 2]]


def test_phrase_counts_single_token_docs(ray_session):
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["data", "group"])})
    assert len(phrase_counts(_ds(tbl), "data", "group").to_pandas()) == 0


def test_trigram_lm_hand(ray_session):
    from hand_index_ray.pipelines.text import trigram_lm

    # "a b c" x3 and "a b d" x2 -> context (a,b) argmax = c (n=3)
    texts = ["a b c", "a b c", "a b c", "a b d", "a b d"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(texts)})
    out = trigram_lm(_ds(tbl), min_n=3).to_pandas()
    assert out[["w1", "w2", "w3", "n"]].values.tolist() == [
        ["a", "b", "c", 3]]


def test_trigram_lm_tie_break(ray_session):
    from hand_index_ray.pipelines.text import trigram_lm

    texts = ["x y a", "x y b", "x y a", "x y b", "x y a", "x y b"]
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "text": pa.array(texts)})
    out = trigram_lm(_ds(tbl), min_n=3).to_pandas()
    # tie 3-3 -> lexicographically smaller w3 wins
    assert out[["w1", "w2", "w3", "n"]].values.tolist() == [
        ["x", "y", "a", 3]]


def test_chunk_ledger_hand(ray_session):
    from hand_index_ray.pipelines.text import chunk_ledger

    toks = [f"t{i}" for i in range(10)]
    tbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array([" ".join(toks)])})
    out = (chunk_ledger(_ds(tbl), window=4, stride=3).to_pandas()
           .sort_values("chunk_idx"))
    # starts 0,3,6,9: lengths 4,4,4,1
    assert out["n_tokens"].tolist() == [4, 4, 4, 1]
    assert out["first_tok"].tolist() == ["t0", "t3", "t6", "t9"]
    assert out["last_tok"].tolist() == ["t3", "t6", "t9", "t9"]


def test_repeated_ngram_max_hand(ray_session):
    from hand_index_ray.pipelines.text import repeated_ngram_max

    texts = ["a b c d e f g h",          # no repeats -> 0
             "a b c a b c x y",          # "a b c" repeats -> max tested 2
             "p q r s p q r s",          # 4-gram repeats -> 4
             "z z z z z z z z z"]        # 8-gram repeats -> 8
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    out = (repeated_ngram_max(_ds(tbl)).to_pandas()
           .sort_values("doc_id"))
    assert out["max_rep"].tolist() == [0, 2, 4, 8]


def test_silence_runs_hand(ray_session):
    from hand_index_ray.kernels.audio import encode_wav
    from hand_index_ray.stages.multimodal import silence_runs

    v = np.concatenate([
        np.full(10, 5000), np.zeros(12), np.full(5, -4000),
        np.zeros(7), np.full(6, 3000)]).astype(np.int64)
    tbl = pa.table({"clip_id": pa.array(["c"], pa.string()),
                    "bytes": pa.array([encode_wav(v / 32768.0, 16000,
                                                  bits=16)], pa.binary()),
                    "sample_rate": pa.array([16000], pa.int32()),
                    "n_samples": pa.array([len(v)], pa.int64()),
                    "codec": pa.array(["wav"], pa.string())})
    out = silence_runs(_ds(tbl), threshold=2048, min_run=8).to_pandas()
    # runs of silence: 12 (kept) and 7 (below min_run 8 -> dropped)
    assert out[["n_runs", "silent_samples", "longest_run"]].values.tolist() \
        == [[1, 12, 12]]


def test_freeze_frames_hand(ray_session):
    from hand_index_ray.kernels.video import encode_y4m
    from hand_index_ray.stages.multimodal import freeze_frames

    h, w = 6, 8
    base = (np.arange(h * w).reshape(h, w) % 256).astype(np.uint8)
    frames = np.stack([base, base, base + 1, base + 1, base + 1, base])
    frames = np.repeat(frames[:, :, :, None], 3, axis=3)
    tbl = pa.table({"video_id": pa.array(["v"], pa.string()),
                    "bytes": pa.array([encode_y4m(frames)], pa.binary()),
                    "w": pa.array([w], pa.int32()),
                    "h": pa.array([h], pa.int32()),
                    "fps": pa.array([30.0], pa.float64()),
                    "n_frames": pa.array([len(frames)], pa.int32()),
                    "codec": pa.array(["y4m"], pa.string())})
    out = freeze_frames(_ds(tbl)).to_pandas()
    # frozen: frame1 (==0), frame3, frame4 (==2) -> 3 total, run of 2
    assert out[["n_freeze", "longest_freeze"]].values.tolist() == [[3, 2]]


def test_polyline_spec_vector():
    """The published spec example must encode bit-exactly."""
    from hand_index_ray.kernels import polyline as pl

    lat5 = np.array([3850000, 4070000, 4325200])
    lng5 = np.array([-12020000, -12095000, -12645300])
    enc = pl.encode_track(lat5, lng5)
    assert enc == b"_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    la, lg = pl.decode_track(enc)
    assert np.array_equal(la, lat5) and np.array_equal(lg, lng5)


def test_polyline_roundtrip_fuzz():
    from hand_index_ray.kernels import polyline as pl

    rng = np.random.default_rng(0)
    for _ in range(25):
        n = int(rng.integers(1, 40))
        a = rng.integers(-2**28, 2**28, n)
        b = rng.integers(-2**28, 2**28, n)
        la, lg = pl.decode_track(pl.encode_track(a, b))
        assert np.array_equal(la, a) and np.array_equal(lg, b)


def test_polyline_ledger(ray_session):
    from hand_index_ray.kernels import polyline as pl

    tbl = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                    "o": pa.array([0, 1, 2, 0], pa.int64()),
                    "la": pa.array([3850000, 4070000, 4325200, 5], pa.int64()),
                    "lg": pa.array([-12020000, -12095000, -12645300, 9],
                                   pa.int64())})
    out = (mining.polyline_ledger(_ds(tbl), "k", "o", "la", "lg")
           .to_pandas().sort_values("k"))
    spec = b"_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert out["n_pts"].tolist() == [3, 1]
    assert out["enc_len"].tolist()[0] == len(spec)
    assert out["char_sum"].tolist()[0] == sum(spec)


def test_survivorship_hand(ray_session):
    tbl = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                    "o": pa.array([10, 20, 30], pa.int64()),
                    "a": pa.array([7.0, None, None]),
                    "b": pa.array([None, 8.0, 9.0])})
    out = mining.survivorship(_ds(tbl), "k", "o", ["a", "b"]).to_pandas()
    assert out["last_ord"].tolist() == [30]
    assert out["n_rows"].tolist() == [3]
    assert out["last_a"].tolist() == [7.0]   # only row 10 set a
    assert out["last_b"].tolist() == [9.0]   # latest non-null b


def test_lev_le2_brute():
    from hand_index_ray.pipelines.text import _lev_le2

    def brute(a, b):
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                d[i][j] = min(d[i-1][j] + 1, d[i][j-1] + 1,
                              d[i-1][j-1] + (a[i-1] != b[j-1]))
        return d[la][lb]

    rng = np.random.default_rng(3)
    for _ in range(300):
        a = "".join(chr(97 + c) for c in rng.integers(0, 4, rng.integers(0, 8)))
        b = "".join(chr(97 + c) for c in rng.integers(0, 4, rng.integers(0, 8)))
        want = min(brute(a, b), 3)
        assert _lev_le2(a, b) == want, (a, b)


def test_edit2_pairs_brute(ray_session):
    from hand_index_ray.pipelines.text import _lev_le2, edit2_pairs

    strs = ["cat", "cut", "cast", "dog", "dg", "doge", "kitten", "cats"]
    tbl = pa.table({"s": pa.array(strs, pa.string())})
    out = edit2_pairs(_ds(tbl), "s").to_pandas()
    got = {(r.s_a, r.s_b, r.dist) for r in out.itertuples()}
    want = set()
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            a, b = sorted((strs[i], strs[j]))
            d = _lev_le2(a, b)
            if 1 <= d <= 2:
                want.add((a, b, d))
    assert got == want


def test_rolling_ols_hand(ray_session):
    tbl = pa.table({"k": pa.array([1] * 4, pa.int64()),
                    "o": pa.array([1, 2, 3, 4], pa.int64()),
                    "x": pa.array([1, 2, 3, 4], pa.int64()),
                    "y": pa.array([2, 4, 6, 8], pa.int64())})
    out = (mining.rolling_ols(_ds(tbl), "k", "o", "x", "y", window=3)
           .to_pandas().sort_values("o"))
    # perfect slope 2: num/den = 2 at both full windows
    assert out["o"].tolist() == [3, 4]
    assert (out["s_num"] == 2 * out["s_den"]).all()
    assert (out["s_den"] > 0).all()


def test_payload_audit_hand(ray_session):
    from hand_index_ray.kernels.audio import encode_wav
    from hand_index_ray.stages.multimodal import payload_audit

    v = np.arange(100, dtype=np.int64) * 100 - 5000
    buf = encode_wav(v / 32768.0, 16000, bits=16)
    tbl = pa.table({"clip_id": pa.array(["ok", "drift"], pa.string()),
                    "bytes": pa.array([buf, buf], pa.binary()),
                    "sample_rate": pa.array([16000] * 2, pa.int32()),
                    "n_samples": pa.array([100, 110], pa.int64()),
                    "codec": pa.array(["wav"] * 2, pa.string())})
    out = payload_audit(_ds(tbl)).to_pandas()
    assert out.values.tolist() == [["drift", 110, 100]]


def test_g711_spec_properties():
    from hand_index_ray.kernels.g711 import decode_ulaw, encode_ulaw

    assert encode_ulaw(np.array([0]))[0] == 0xFF  # spec: +0 -> 0xFF
    codes = np.arange(256, dtype=np.uint8)
    dec = decode_ulaw(codes)
    assert dec.min() == -32124 and dec.max() == 32124  # full scale
    # every code re-encodes to itself except 0x7F (mu-law negative
    # zero, which canonicalizes to 0xFF — spec-correct collapse)
    re = encode_ulaw(dec)
    bad = codes[re != codes]
    assert bad.tolist() == [0x7F]
    # quantizer is idempotent and monotone
    x = np.arange(-32768, 32768, 7)
    q = decode_ulaw(encode_ulaw(x))
    assert np.array_equal(q, decode_ulaw(encode_ulaw(q)))
    assert np.all(np.diff(q) >= 0)


def test_hgt_roundtrip_and_name():
    from hand_index_ray.kernels import hgt

    g = (np.arange(16 * 16).reshape(16, 16) % 5000 - 600).astype(np.int16)
    g[3, 4] = hgt.VOID
    back = hgt.decode_hgt(hgt.encode_hgt(g))
    assert np.array_equal(back, g)
    assert hgt.corner_from_name("N34W119.hgt") == (34, -119)
    assert hgt.corner_from_name("s05e112.HGT".lower()) == (-5, 112)


def test_pnm_roundtrip_and_comments():
    from hand_index_ray.kernels.pnm import decode_pnm, encode_pnm

    rng = np.random.RandomState(1)
    g = rng.randint(0, 256, (9, 7), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(g)), g)
    rgb = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(rgb)), rgb)
    # comment lines anywhere in header whitespace are legal
    blob = encode_pnm(g)
    blob = blob[:2] + b"\n# a comment\n# another\n" + blob[3:]
    assert np.array_equal(decode_pnm(blob), g)


def test_pnm_routes_through_image_decode():
    from hand_index_ray.kernels import image as imk
    from hand_index_ray.kernels.pnm import encode_pnm

    g = (np.arange(24 * 32).reshape(24, 32) % 256).astype(np.uint8)
    blob = encode_pnm(g)
    assert imk.sniff_format(blob) == "pnm"
    out = imk.decode(blob, "pnm")
    assert out.shape == (24, 32, 3)
    assert np.array_equal(out[:, :, 0], g) and np.array_equal(out[:, :, 2], g)


def test_slippy_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from hand_index_ray.pipelines.terrain import (read_slippy_png_tiles,
                                                  write_slippy_png_tiles)

    rng = np.random.RandomState(2)
    rows = []
    for z, x, y in [(1, 0, 0), (1, 1, 0), (2, 3, 2)]:
        px = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        rows.append({"z": z, "x": x, "y": y, "w": 8, "h": 8,
                     "px": px.tobytes(), "want": px})
    ds = rd.from_items([{k: v for k, v in r.items() if k != "want"}
                        for r in rows])
    n = write_slippy_png_tiles(ds, str(tmp_path))
    assert n == 3
    # rerun skips existing tiles (resume-safe)
    assert write_slippy_png_tiles(ds, str(tmp_path)) == 0
    out = (read_slippy_png_tiles(str(tmp_path)).to_pandas()
           .sort_values(["z", "x", "y"]).reset_index(drop=True))
    for i, r in enumerate(rows):
        a = r["want"].astype(np.int64)
        assert out.loc[i, "px_sum"] == a.sum()
        assert out.loc[i, "px_xw"] == (a.sum(axis=(0, 2))
                                       * np.arange(8)).sum()


def test_fits_roundtrip_and_bzero():
    from hand_index_ray.kernels.fits import decode_fits, encode_fits

    rng = np.random.RandomState(4)
    g = rng.randint(-30000, 30000, (12, 9))
    assert np.array_equal(decode_fits(encode_fits(g)), g)
    u = rng.randint(0, 65000, (7, 5))  # unsigned via BZERO convention
    assert np.array_equal(decode_fits(encode_fits(u, bzero=32768)), u)


def test_asc_roundtrip():
    from hand_index_ray.kernels.ascgrid import decode_asc, encode_asc

    rng = np.random.RandomState(5)
    a = rng.randint(-500, 4000, (6, 11))
    a[2, 3] = -9999
    dec, hdr = decode_asc(encode_asc(a, xll=100, yll=200, cellsize=30))
    assert np.array_equal(dec, a)
    assert hdr["cellsize"] == 30 and hdr["nodata_value"] == -9999


def test_fits_dark_subtract(ray_session):
    from hand_index_ray.kernels.fits import encode_fits
    from hand_index_ray.pipelines.terrain import fits_dark_subtract

    img = np.array([[100, 5], [80, 300]], dtype=np.int64)
    dark = np.array([[50, 10], [80, 100]], dtype=np.int64)
    tbl = pa.table({"frame_id": pa.array(["f"], pa.string()),
                    "bytes": pa.array([encode_fits(img)], pa.binary())})
    out = fits_dark_subtract(_ds(tbl), dark).to_pandas()
    # residuals: 50, -5->0 (clamped), 0, 200
    assert out[["cal_sum", "n_clamped"]].values.tolist() == [[250, 1]]


def test_composite_stats_hand(ray_session):
    from hand_index_ray.pipelines.image_embed import composite_stats

    base = np.full((4, 4, 3), 100, np.uint8)
    fg = np.full((2, 2, 3), 200, np.int64)
    alpha = np.array([[0, 255], [128, 255]], np.int64)
    out = composite_stats(_img_ds([base]), fg, alpha, ox=1, oy=1) \
        .to_pandas()
    # a=0 -> unchanged; a=255 -> 200; a=128 -> (200*128+100*127+127)//255;
    # counts are per CHANNEL value (3 per pixel), matching the oracle
    mid = (200 * 128 + 100 * 127 + 127) // 255
    want = 100 * 48 + (200 - 100) * 2 * 3 + (mid - 100) * 3
    assert out[["out_sum", "n_changed"]].values.tolist() == [[want, 9]]


def test_percent_rank_exact_hand(ray_session):
    tbl = pa.table({"k": pa.array([1, 1, 1, 1, 2], pa.int64()),
                    "i": pa.array([10, 11, 12, 13, 14], pa.int64()),
                    "v": pa.array([5, 5, 7, 3, 9], pa.int64())})
    out = (mining.percent_rank_exact(_ds(tbl), "k", "i", "v")
           .to_pandas().sort_values("i"))
    # k=1 ranks (min): 3->1, 5->2, 5->2, 7->4 ; n-1=3. single row -> (0,0)
    assert out[["pr_num", "pr_den"]].values.tolist() == [
        [1, 3], [1, 3], [3, 3], [0, 3], [0, 0]]


def test_crossing_points_brute(ray_session):
    import ray.data as rd

    from hand_index_ray.pipelines.overlay import crossing_points

    rng = np.random.RandomState(6)
    def layer(n, seed):
        r = np.random.RandomState(seed)
        return pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "x1": pa.array(r.randint(0, 60, n), pa.int64()),
            "y1": pa.array(r.randint(0, 60, n), pa.int64()),
            "x2": pa.array(r.randint(0, 60, n), pa.int64()),
            "y2": pa.array(r.randint(0, 60, n), pa.int64())})

    ta, tb = layer(25, 1), layer(25, 2)
    out = crossing_points(rd.from_arrow(ta).repartition(3),
                          rd.from_arrow(tb).repartition(3),
                          cs=8).to_pandas()
    got = {(r.a_id, r.b_id): (r.x_num, r.y_num, r.den)
           for r in out.itertuples()}
    # brute reference
    want = {}
    A = ta.to_pandas().to_numpy()
    B = tb.to_pandas().to_numpy()
    for ai, ax1, ay1, ax2, ay2 in A:
        for bi, bx1, by1, bx2, by2 in B:
            dax, day = ax2 - ax1, ay2 - ay1
            dbx, dby = bx2 - bx1, by2 - by1
            d1 = dax * (by1 - ay1) - day * (bx1 - ax1)
            d2 = dax * (by2 - ay1) - day * (bx2 - ax1)
            d3 = dbx * (ay1 - by1) - dby * (ax1 - bx1)
            d4 = dbx * (ay2 - by1) - dby * (ax2 - bx1)
            if d1 * d2 < 0 and d3 * d4 < 0:
                den = d1 - d2
                xn = bx1 * den + d1 * dbx
                yn = by1 * den + d1 * dby
                if den < 0:
                    den, xn, yn = -den, -xn, -yn
                want[(ai, bi)] = (xn, yn, den)
    assert got == want and len(want) > 0


def test_roaring_ledger_hand(ray_session):
    # chunk 0: dense run 0..9999 (run container: 2+4 bytes);
    # chunk 1: 5000 scattered evens (bitmap: array too big, runs 5000)
    v = np.concatenate([np.arange(10000),
                        65536 + 2 * np.arange(5000)])
    tbl = pa.table({"v": pa.array(v, pa.int64())})
    out = (mining.roaring_ledger(_ds(tbl), "v").to_pandas()
           .sort_values("chunk").reset_index(drop=True))
    assert out["container"].tolist() == ["run", "bitmap"]
    assert out["bytes"].tolist() == [6, 8192]
    assert out["n"].tolist() == [10000, 5000]
    assert out["runs"].tolist() == [1, 5000]


def test_cidr_assign_hand(ray_session):
    # /8 block 10.0.0.0 and nested /16 10.1.0.0 -> longest wins
    blocks = [(8, 10 << 24), (16, (10 << 24) | (1 << 16))]
    ips = [(10 << 24) | 5,              # /8 only
           (10 << 24) | (1 << 16) | 7,  # both -> /16
           (192 << 24)]                 # none -> /0
    tbl = pa.table({"ip": pa.array(ips, pa.int64())})
    out = (mining.cidr_assign(_ds(tbl), "ip", blocks).to_pandas()
           .sort_values(["plen", "net"]).reset_index(drop=True))
    assert out[["net", "plen", "n_ips"]].values.tolist() == [
        [0, 0, 1], [10 << 24, 8, 1], [(10 << 24) | (1 << 16), 16, 1]]


def test_iso_week_vs_isocalendar(ray_session):
    import datetime

    from hand_index_ray.pipelines.mining import iso_week_rollup

    # boundary-heavy dates: year starts/ends across several years
    days = []
    for y in (1998, 1999, 2000, 2004, 2005, 2020, 2021):
        for md in ((1, 1), (1, 4), (12, 28), (12, 31)):
            days.append(datetime.date(y, *md))
    us = [int((d - datetime.date(1970, 1, 1)).days) * 86_400_000_000
          for d in days]
    tbl = pa.table({"ts": pa.array(us, pa.timestamp("us")),
                    "q": pa.array([1] * len(us), pa.int64())})
    out = iso_week_rollup(_ds(tbl), "ts", "q").to_pandas()
    got = {(r.iso_year, r.iso_week): r.total for r in out.itertuples()}
    want: dict = {}
    for d in days:
        iy, iw, _ = d.isocalendar()
        want[(iy, iw)] = want.get((iy, iw), 0) + 1
    assert got == want


def test_debounce_sequential_carry(ray_session):
    # t=0 keep; t=3 drop; t=6 KEEP (>(0)+5 — the LAG approximation
    # would re-admit nothing here); t=9 drop; t=12 keep
    tbl = pa.table({"k": pa.array([1] * 5, pa.int64()),
                    "i": pa.array([10, 11, 12, 13, 14], pa.int64()),
                    "us": pa.array([0, 3, 6, 9, 12], pa.int64())})
    out = (mining.debounce(_ds(tbl), "k", "us", "i", gap_us=5)
           .to_pandas().sort_values("us"))
    assert out["us"].tolist() == [0, 6, 12]


def test_debounce_ties_and_series(ray_session):
    tbl = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                    "i": pa.array([5, 4, 9, 7], pa.int64()),
                    "us": pa.array([100, 100, 200, 50], pa.int64())})
    out = (mining.debounce(_ds(tbl), "k", "us", "i", gap_us=10)
           .to_pandas().sort_values(["k", "us"]))
    # equal ts: min id kept; 200 > 100+10 kept; series 2 independent
    assert out[["k", "i"]].values.tolist() == [[1, 4], [1, 9], [2, 7]]


def test_hdr_buckets_hand(ray_session):
    vals = [0, 1, 31, 32, 33, 63, 64, 1000]
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    out = mining.hdr_buckets(_ds(tbl), "v", sub_bits=5).to_pandas()
    got = {(r.bucket, r.sub): (r.lb, r.n) for r in out.itertuples()}
    # 0,1,31 -> bucket 0 subs 0,1,31; 32,33 -> bucket 1 subs 16 (lb 32);
    # 63 -> bucket 1 sub 31 (lb 62); 64 -> bucket 2 sub 16 (lb 64);
    # 1000 (bitlen 10) -> bucket 5 sub 31 (lb 992)
    assert got[(0, 0)] == (0, 1) and got[(0, 31)] == (31, 1)
    assert got[(1, 16)] == (32, 2) and got[(1, 31)] == (62, 1)
    assert got[(2, 16)] == (64, 1) and got[(5, 31)] == (992, 1)


def test_oov_audit_hand(ray_session):
    texts = ["a a a b", "a c", "d d"]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(texts)})
    out = (mining.oov_audit(_ds(tbl), vocab_k=2).to_pandas()
           .sort_values("doc_id"))
    # counts: a=4, d=2, b=1, c=1 -> vocab {a, d}
    assert out[["n_oov", "n_tokens"]].values.tolist() == [
        [1, 4], [1, 2], [0, 2]]


def test_dhash_hamming_pairs_brute(ray_session):
    from hand_index_ray.pipelines.image_embed import dhash_hamming_pairs

    # images whose dhashes differ in controlled bit counts
    base = np.tile(np.arange(255, 255 - 32, -1, dtype=np.uint8)[None, :],
                   (24, 1))  # strictly decreasing rows -> all bits set
    imgs = []
    for flips in (0, 0, 2, 5):
        g = base.copy().astype(np.int64)
        # flipping block-sum comparisons: raise `flips` columns so some
        # adjacent compares invert — construct via direct value bumps
        for f in range(flips):
            g[:, 4 * (f + 1)] += 200  # bump one column per flip
        imgs.append(np.repeat(np.clip(g, 0, 255).astype(np.uint8)
                              [:, :, None], 3, axis=2))
    out = dhash_hamming_pairs(_img_ds(imgs), channel=0,
                              max_hamming=3).to_pandas()
    # compute expected pairs brute from the actual hashes
    from hand_index_ray.pipelines.image_embed import dhash_counts
    hs = dhash_counts(_img_ds(imgs), channel=0).to_pandas()
    vals = hs["dhash"].tolist()
    cnt = dict(zip(hs["dhash"], hs["n"]))
    want = set()
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            a, b = sorted((vals[i], vals[j]))
            ham = bin(a ^ b).count("1")
            if ham <= 3:
                want.add((a, b, ham, cnt[a] * cnt[b]))
    got = {(r.h_a, r.h_b, r.hamming, r.n_pairs) for r in out.itertuples()}
    assert got == want


def test_feature_hash_hand(ray_session):
    import hashlib

    from hand_index_ray.pipelines.text import feature_hash

    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["ab ab cd"])})
    out = feature_hash(_ds(tbl), buckets=64).to_pandas()
    def hb(s):
        h = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
        return h % 64, 1 if (h // 64) % 2 == 0 else -1
    b1, s1 = hb("ab")
    b2, s2 = hb("cd")
    want = {}
    want[b1] = want.get(b1, 0) + 2 * s1
    want[b2] = want.get(b2, 0) + s2
    want = {b: v for b, v in want.items() if v != 0}
    got = dict(zip(out["bucket"], out["v"]))
    assert got == want


def test_bipartite_check_hand(ray_session):
    from hand_index_ray.pipelines.graph import bipartite_check

    # comp {0,1,2}: triangle (odd cycle) -> not bipartite
    # comp {10,11,12,13}: 4-cycle -> bipartite
    tbl = pa.table({"u": pa.array([0, 1, 2, 10, 11, 12, 13], pa.int64()),
                    "v": pa.array([1, 2, 0, 11, 12, 13, 10], pa.int64())})
    out = (bipartite_check(_ds(tbl), "u", "v").to_pandas()
           .sort_values("comp"))
    assert out[["comp", "n_nodes", "is_bipartite"]].values.tolist() == [
        [0, 3, 0], [10, 4, 1]]


def test_topic_scores_tie_break(ray_session):
    from hand_index_ray.pipelines.text import topic_scores

    tbl = pa.table({"doc_id": pa.array([5], pa.int64()),
                    "text": pa.array(["zz zz"])})
    out = topic_scores(_ds(tbl), n_topics=4).to_pandas()
    import hashlib
    h = int.from_bytes(hashlib.md5(b"zz").digest()[8:16], "little")
    scores = [2 * ((h // (7 ** t)) % 5) for t in range(4)]
    best = max(scores)
    want_topic = scores.index(best)
    assert out[["topic", "score"]].values.tolist() == [[want_topic, best]]


def test_base64_stdlib_parity():
    import base64 as b64

    from hand_index_ray.kernels.polyline import base64_encode

    rng = np.random.default_rng(2)
    for n in (0, 1, 2, 3, 4, 17, 100, 997):
        b = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert base64_encode(b) == b64.b64encode(b), n


def test_association_rules_hand(ray_session):
    # baskets: {1,2} x5, {1,3} x1 -> pair (1,2) n=5 passes min 5
    ks, it = [], []
    for b in range(5):
        ks += [b, b]
        it += [1, 2]
    ks += [9, 9]
    it += [1, 3]
    tbl = pa.table({"k": pa.array(ks, pa.int64()),
                    "p": pa.array(it, pa.int64())})
    out = (mining.association_rules(_ds(tbl), "k", "p", min_pair=5)
           .to_pandas().sort_values(["antecedent"]))
    # 1->2: conf 5/6 (1 appears in 6 baskets); 2->1: 5/5
    assert out[["antecedent", "consequent", "conf_num",
                "conf_den"]].values.tolist() == [[1, 2, 5, 6],
                                                 [2, 1, 5, 5]]


def test_luhn_known_numbers(ray_session):
    # 79927398713 is the canonical valid Luhn test number
    vals = [79927398713, 79927398710, 4539148803436467, 1234]
    tbl = pa.table({"acct": pa.array(vals, pa.int64())})
    out = mining.luhn_audit(_ds(tbl), "acct").to_pandas()
    # 4539148803436467 is a textbook valid card number; 1234 invalid
    assert out[["n_valid", "n_invalid"]].values.tolist() == [[2, 2]]


def test_adler32_zlib_parity(ray_session):
    import zlib

    from hand_index_ray.pipelines.mining import adler32_ledger

    texts = ["hello world", "", "a", "x" * 300, "the quick brown fox"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = (adler32_ledger(_ds(tbl), "text").to_pandas()
           .sort_values("doc_id"))
    assert out["adler32"].tolist() == [
        zlib.adler32(s.encode()) for s in texts]


def test_wow_delta_rollover(ray_session):
    import datetime

    from hand_index_ray.pipelines.mining import wow_delta

    # two consecutive weeks spanning a year boundary (2020-W53 ->
    # 2021-W1: 2020 is a 53-week ISO year)
    days = [datetime.date(2020, 12, 30), datetime.date(2021, 1, 5)]
    us = [int((d - datetime.date(1970, 1, 1)).days) * 86_400_000_000
          for d in days]
    tbl = pa.table({"ts": pa.array(us, pa.timestamp("us")),
                    "q": pa.array([10, 4], pa.int64())})
    out = (wow_delta(_ds(tbl), "ts", "q").to_pandas()
           .sort_values(["iso_year", "iso_week"]))
    assert out[["iso_year", "iso_week", "total", "delta"]].values \
        .tolist() == [[2020, 53, 10, 10], [2021, 1, 4, -6]]


def test_simpson_diversity_hand(ray_session):
    from hand_index_ray.pipelines.mining import simpson_diversity

    tbl = pa.table({"g": pa.array(["s", "s", "s", "t"], pa.string()),
                    "c": pa.array(["x", "x", "y", "z"], pa.string())})
    out = (simpson_diversity(_ds(tbl), "g", "c").to_pandas()
           .sort_values("g"))
    # s: counts {x:2, y:1} -> num 2, den 3*2=6; t: single -> 0/0
    assert out[["num", "den"]].values.tolist() == [[2, 6], [0, 0]]


def test_warc_roundtrip_and_extract(ray_session):
    import zlib

    from hand_index_ray.kernels.warc import decode_warc, encode_warc
    from hand_index_ray.stages.multimodal import warc_extract

    recs = [("metadata", "warc://0", b"info"),
            ("response", "http://a/1", b"hello page"),
            ("response", "http://a/2", b"x" * 777)]
    for gz in (True, False):
        back = decode_warc(encode_warc(recs, gzip_members=gz))
        assert [(r["type"], r["uri"], r["payload"]) for r in back] == recs
    tbl = pa.table({"warc_id": pa.array(["w0"], pa.string()),
                    "bytes": pa.array([encode_warc(recs)], pa.binary())})
    out = (warc_extract(_ds(tbl)).to_pandas()
           .sort_values("uri").reset_index(drop=True))
    # metadata record filtered; responses extracted with adler parity
    assert out["uri"].tolist() == ["http://a/1", "http://a/2"]
    assert out["payload_len"].tolist() == [10, 777]
    assert out["adler32"].tolist() == [zlib.adler32(b"hello page"),
                                       zlib.adler32(b"x" * 777)]
