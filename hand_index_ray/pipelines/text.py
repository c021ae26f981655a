"""Text-analysis + deduplication pipelines over a documents table.

Training-data-pipeline operators (a first-class requirement alongside
the reference's own surface): token counting, quality scoring,
language-ID, document fingerprinting, and the dedup family — exact,
MinHash+LSH, SimHash, n-gram Jaccard. All are ``map_batches`` stages;
the only shuffles are the final bucket groupbys, fed by pre-hashed
slim rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sources.synth import splitmix64

_STOPWORDS = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}


def token_count(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """Whitespace token count per document (Arrow kernels only)."""

    def f(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(t[col], " "))
        return t.append_column("n_tokens", pc.cast(toks, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# GPT-2-style pre-tokenizer pattern (public; simplified to the ASCII
# subset DuckDB's RE2 and Arrow's RE2 both support identically)
BPE_SPLIT_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """BPE-ish token count: occurrences of the GPT-2-style split regex
    (both Arrow and DuckDB run RE2, so the oracle matches exactly)."""

    def f(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.extract_regex_span(t[col], BPE_SPLIT_PATTERN)) \
            if hasattr(pc, "extract_regex_span") else None
        if n is None:
            # count_substring_regex counts non-overlapping matches (RE2)
            n = pc.count_substring_regex(t[col], BPE_SPLIT_PATTERN)
        return pa.table({"doc_id": t["doc_id"],
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """Length / punctuation / stopword-ratio quality features.

    stop_ratio is computed with vectorized numpy over the tokenized
    column; scores are per-row floats (IEEE-deterministic, oracle-safe).
    """

    def f(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t[col]).cast(pa.int64())
        toks = pc.split_pattern(t[col], " ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        # punctuation count: chars removed when '.' and ',' are stripped
        no_punct = pc.replace_substring(pc.replace_substring(t[col], ".", ""), ",", "")
        n_punct = pc.subtract(n_chars, pc.utf8_length(no_punct).cast(pa.int64()))
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        stop = np.zeros(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):
            ws = flat[i].as_py()
            stop[i] = sum(1 for w in ws if w in _STOPWORDS)
        out = t.append_column("n_chars_q", n_chars)
        out = out.append_column("n_tokens", n_tokens)
        out = out.append_column("n_punct", n_punct)
        out = out.append_column("n_stop", pa.array(stop, pa.int64()))
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LangId:
    """Actor-pool language-ID stage: character/stopword n-gram
    heuristic with per-language profiles built once in __init__."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "is"},
        "de": {"der", "die", "und", "ist", "das"},
        "fr": {"le", "la", "et", "est", "les"},
        "es": {"el", "la", "que", "es", "los"},
        "zh": set(),
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        langs = []
        for s in texts:
            ws = set(s.lower().split())
            best, score = "unknown", 0
            for lang, prof in self.profiles.items():
                sc = len(ws & prof)
                if sc > score:
                    best, score = lang, sc
            langs.append(best)
        return t.append_column("lang_pred", pa.array(langs, pa.string()))


def fingerprint(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """Document fingerprint = md5 hex of the text (stable across
    engines; DuckDB's md5() is the oracle)."""

    def f(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.column(col).to_pylist()]
        return t.append_column("fp", pa.array(fps, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(ds: ray.data.Dataset, col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup: keep min(id) per identical content. The shuffle
    moves (fingerprint, id) pairs only — content never moves."""
    with_fp = fingerprint(ds.select_columns([id_col, col]), col)
    slim = with_fp.select_columns([id_col, "fp"])
    from ..relational import grouped_agg

    return grouped_agg(slim, ["fp"], min_cols=[id_col], count=True)


# ---------------------------------------------------------------------------
# near-dup: MinHash + LSH


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    b = text.encode("utf-8")
    if len(b) < k:
        return splitmix64(np.array([len(b)], dtype=np.uint64))
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    # rolling polynomial hash of k-byte shingles, vectorized
    h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * np.uint64(1099511628211) + arr[j : len(arr) - k + 1 + j]
    return splitmix64(h)


def minhash_signatures(ds: ray.data.Dataset, num_hashes: int = 64,
                       col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc MinHash signature (vectorized: one permutation family
    via splitmix64(shingle ^ salt), min-reduced per salt)."""
    salts = splitmix64(np.arange(num_hashes, dtype=np.uint64) + np.uint64(0xABCD))

    def f(t: pa.Table) -> pa.Table:
        # vectorized across the whole batch: concatenate every doc's
        # shingle hashes, then segment-min per (doc, salt) — no
        # per-document Python beyond the shingle scan itself
        texts = t.column(col).to_pylist()
        shingle_lists = [_shingle_hashes(s) for s in texts]
        lens = np.array([len(x) for x in shingle_lists], dtype=np.int64)
        allsh = np.concatenate(shingle_lists) if shingle_lists else np.empty(0, np.uint64)
        doc_of = np.repeat(np.arange(t.num_rows), lens)
        sigs = np.full((t.num_rows, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = splitmix64(allsh[:, None] ^ salts[None, :])
        np.minimum.at(sigs, doc_of, m)
        return pa.table({
            id_col: t.column(id_col),
            "sig": pa.array(list(sigs)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(ds: ray.data.Dataset, num_hashes: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.5,
                      col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """MinHash+LSH near-dup candidate pairs, verified by signature
    Jaccard estimate: shingle→minhash→band→bucket groupby→verify
    (the canonical LSH pipeline; SURVEY.md training-data ops)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(ds, num_hashes, col, id_col)

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        sig = np.stack(t.column("sig").to_numpy(zero_copy_only=False))
        out_id, out_band, out_bucket, out_sig = [], [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            with np.errstate(over="ignore"):
                bucket = splitmix64(chunk.astype(np.uint64).sum(axis=1) ^ np.uint64(b * 7919))
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bucket.append(bucket)
            out_sig.append(sig)
        return pa.table({
            id_col: pa.array(np.concatenate(out_id)),
            "band": pa.array(np.concatenate(out_band), pa.int32()),
            "bucket": pa.array(np.concatenate(out_bucket), pa.uint64()),
            "sig": pa.array(list(np.vstack(out_sig))),
        })

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_est": []})
        ids = g[id_col].to_numpy()
        sig = np.stack(g["sig"].to_numpy())
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                est = float((sig[i] == sig[j]).mean())
                if est >= jaccard_threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(est)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard_est": out_j})

    from ..relational import grouped_apply_bucketed

    pairs = grouped_apply_bucketed(exploded, ["band", "bucket"],
                                   pairs_in_bucket).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "jaccard_est": pd.Series([], dtype=np.float64)})
    return (pairs.drop_duplicates(subset=["id_a", "id_b"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def simhash(ds: ray.data.Dataset, col: str = "text",
            id_col: str = "doc_id") -> ray.data.Dataset:
    """64-bit SimHash per document over word features."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        out = np.empty(t.num_rows, dtype=np.uint64)
        for i, s in enumerate(texts):
            words = s.split()
            if not words:
                out[i] = 0
                continue
            hs = splitmix64(np.array(
                [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") for w in words],
                dtype=np.uint64))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = np.uint64(0)
            v = np.where(vote > 0, 1, 0).astype(np.uint64)
            out[i] = (v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
        return pa.table({id_col: t.column(id_col), "simhash": pa.array(out, pa.uint64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(ds: ray.data.Dataset, n: int = 3, threshold: float = 0.8,
                        col: str = "text", id_col: str = "doc_id",
                        max_docs: int = 2000) -> pd.DataFrame:
    """Exact word-n-gram Jaccard similarity for doc pairs sharing an
    LSH bucket on their rarest n-gram (small-corpus exact verifier for
    the MinHash estimate)."""
    sub = ds.limit(max_docs)

    def grams(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        sets = []
        for s in texts:
            ws = s.split()
            gs = {" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 1))}
            sets.append(sorted(gs))
        return pa.table({id_col: t.column(id_col),
                         "grams": pa.array(sets, pa.list_(pa.string()))})

    gds = sub.map_batches(grams, batch_format="pyarrow").to_pandas()
    ids = gds[id_col].to_numpy()
    sets = [set(g) for g in gds["grams"]]
    out_a, out_b, out_j = [], [], []
    # inverted index on n-grams to avoid the full quadratic scan
    inv: dict[str, list[int]] = {}
    for i, gs in enumerate(sets):
        for g in gs:
            inv.setdefault(g, []).append(i)
    cand = set()
    for g, lst in inv.items():
        if len(lst) > 1:
            for i in range(len(lst)):
                for j in range(i + 1, len(lst)):
                    cand.add((lst[i], lst[j]))
    for i, j in sorted(cand):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        jac = inter / union if union else 0.0
        if jac >= threshold and ids[i] != ids[j]:
            a, b = sorted((int(ids[i]), int(ids[j])))
            out_a.append(a)
            out_b.append(b)
            out_j.append(jac)
    return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j}) \
        .drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)
