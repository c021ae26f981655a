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

from ..sources.synth import splitmix64, splitmix64_inplace

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


def _token_membership_counts(toks, vocab: list[str]) -> np.ndarray:
    """Vectorized per-row count of tokens ∈ vocab for a list<string>
    column: flatten once, one Arrow ``is_in`` over all tokens, then a
    segment-sum back to rows (no per-row Python loop)."""
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    values = pc.list_flatten(flat)
    hit = pc.is_in(values, value_set=pa.array(vocab, pa.string()))
    hitn = hit.to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(hitn)])
    off = np.concatenate([[0], np.cumsum(lens)])
    return cum[off[1:]] - cum[off[:-1]]


def quality_score(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """Length / punctuation / stopword-ratio quality features.

    Fully vectorized: stopword counts flatten the token lists once and
    run one Arrow ``is_in`` + segment-sum over the whole batch.
    """

    def f(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t[col]).cast(pa.int64())
        toks = pc.split_pattern(t[col], " ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        # punctuation count: chars removed when '.' and ',' are stripped
        no_punct = pc.replace_substring(pc.replace_substring(t[col], ".", ""), ",", "")
        n_punct = pc.subtract(n_chars, pc.utf8_length(no_punct).cast(pa.int64()))
        stop = _token_membership_counts(toks, sorted(_STOPWORDS))
        out = t.append_column("n_chars_q", n_chars)
        out = out.append_column("n_tokens", n_tokens)
        out = out.append_column("n_punct", n_punct)
        out = out.append_column("n_stop", pa.array(stop, pa.int64()))
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LangId:
    """Actor-pool language-ID stage: stopword-profile scoring with a
    deterministic argmax, fully vectorized (flatten + is_in +
    segment-sum per profile; no per-row Python loop).

    Semantics are deliberately SQL-expressible so the driver can oracle
    the whole stage with ``len(list_filter(string_split(lower(text),' '),
    w -> w IN (...)))`` per profile: prediction = the profile with the
    highest hit count, ties broken by alphabetical language order,
    zero hits → 'unknown'. (The synthetic corpus draws every document
    from one shared vocabulary, so the profiles here are disjoint
    vocabulary slices; for real text swap in real stopword lists — and
    see ``TrigramLangId`` for a character-n-gram scorer with actual
    language profiles.)"""

    PROFILES = {
        "de": ["column", "key", "row", "table", "value"],
        "en": ["a", "big", "fast", "slow", "the"],
        "es": ["agg", "group", "join", "merge", "sort"],
        "fr": ["batch", "filter", "scan", "stream", "window"],
    }

    def __init__(self):
        self.langs = sorted(self.PROFILES)  # alphabetical tie order

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column("text")), " ")
        counts = np.stack([_token_membership_counts(toks, self.PROFILES[lg])
                           for lg in self.langs])  # (L, rows)
        best = counts.argmax(axis=0)  # first max → alphabetical tie-break
        score = counts.max(axis=0)
        langs = np.array(self.langs, dtype=object)[best]
        langs[score == 0] = "unknown"
        return t.append_column("lang_pred", pa.array(langs.tolist(), pa.string()))


class TrigramLangId:
    """Character-trigram language-ID with real language profiles.

    Profiles are built once per actor in ``__init__`` from vendored
    seed text (most-frequent character trigrams per language, the
    Cavnar–Trenkle out-of-place method simplified to cosine over
    trigram count vectors). Not SQL-expressible — tested against
    labeled samples in tests/test_text_ann.py."""

    SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and this is a test of "
              "the english language which has many words that people write and read",
        "de": "der schnelle braune fuchs springt über den faulen hund und das ist "
              "ein test der deutschen sprache die viele wörter hat die geschrieben werden",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci est "
              "un test de la langue française qui a beaucoup de mots que les gens écrivent",
        "es": "el rápido zorro marrón salta sobre el perro perezoso y esta es una "
              "prueba de la lengua española que tiene muchas palabras que la gente escribe",
        "it": "la veloce volpe marrone salta sopra il cane pigro e questo è una "
              "prova della lingua italiana che ha molte parole che la gente scrive",
    }

    @staticmethod
    def _trigram_counts(s: str) -> dict[str, int]:
        s = f"  {s.lower()}  "
        out: dict[str, int] = {}
        for i in range(len(s) - 2):
            g = s[i : i + 3]
            out[g] = out.get(g, 0) + 1
        return out

    @staticmethod
    def _gram_codes(cp: np.ndarray) -> np.ndarray:
        """Trigram windows of a uint64 codepoint array packed into one
        uint64 each (21 bits per char covers all of Unicode)."""
        return (cp[:-2] << np.uint64(42)) | (cp[1:-1] << np.uint64(21)) \
            | cp[2:]

    def __init__(self, top: int = 200):
        self.langs = sorted(self.SEEDS)
        profs = {}
        for lg in self.langs:
            cnt = self._trigram_counts(self.SEEDS[lg])
            keep = sorted(cnt, key=lambda g: (-cnt[g], g))[:top]
            v = np.array([cnt[g] for g in keep], dtype=np.float64)
            profs[lg] = ({g: i for i, g in enumerate(keep)},
                         v / np.linalg.norm(v))
        # union of profile trigrams → one sorted code array plus a
        # (codes × langs) weight matrix, built ONCE per actor, so each
        # batch scores with searchsorted + one scatter-add (no per-row
        # Python, no per-lang dict probes)
        def code_of(g3: str) -> int:
            a, b, c = (ord(ch) for ch in g3)
            return (a << 42) | (b << 21) | c

        allcodes = sorted({code_of(g) for _, (idx, _) in profs.items()
                           for g in idx})
        self.pcodes = np.array(allcodes, dtype=np.uint64)
        self.W = np.zeros((len(allcodes), len(self.langs)))
        pos = {c: i for i, c in enumerate(allcodes)}
        for j, lg in enumerate(self.langs):
            idx, pv = profs[lg]
            for g, i in idx.items():
                self.W[pos[code_of(g)], j] = pv[i]
        self.lang_arr = np.array(self.langs + ["unknown"], dtype=object)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("lang_pred", pa.array([], pa.string()))
        # NUL is the document separator below, so strip any in-document
        # NULs first (vectorized; they carry no trigram signal)
        low = pc.replace_substring(pc.utf8_lower(t.column("text")),
                                   "\x00", "")
        texts = low.to_pylist()
        # one codepoint array for the whole batch: docs padded with the
        # same two-space margins as _trigram_counts and separated by a
        # NUL so no trigram window crosses a document boundary
        joined = "\x00".join(f"  {s}  " for s in texts) + "\x00"
        cp = np.frombuffer(joined.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.uint64)
        codes = self._gram_codes(cp)
        valid = (cp[:-2] != 0) & (cp[1:-1] != 0) & (cp[2:] != 0)
        doc_of = np.cumsum(cp == 0)[:-2]  # doc id of each window start
        codes, docs = codes[valid], doc_of[valid]
        # distinct (doc, gram) counts via one lexsort + run-length pass
        order = np.lexsort((codes, docs))
        dc, cc = docs[order], codes[order]
        if len(dc):
            new = np.empty(len(dc), bool)
            new[0] = True
            new[1:] = (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, len(dc))).astype(np.float64)
            udoc, ucode = dc[starts], cc[starts]
        else:
            counts = np.zeros(0)
            udoc = ucode = np.zeros(0, dtype=np.int64)
        norm = np.sqrt(np.bincount(udoc.astype(np.int64),
                                   counts * counts, minlength=n))
        norm[norm == 0] = 1.0
        pos = np.searchsorted(self.pcodes, ucode)
        pos_c = np.minimum(pos, len(self.pcodes) - 1)
        hit = self.pcodes[pos_c] == ucode if len(self.pcodes) else \
            np.zeros(len(ucode), bool)
        dots = np.zeros((n, self.W.shape[1]))
        if hit.any():
            contrib = counts[hit, None] * self.W[pos_c[hit]]
            np.add.at(dots, udoc[hit].astype(np.int64), contrib)
        sims = dots / norm[:, None]
        best = sims.argmax(axis=1)  # first max → alphabetical tie-break
        best[sims.max(axis=1) <= 0.0] = len(self.langs)  # → 'unknown'
        return t.append_column(
            "lang_pred", pa.array(self.lang_arr[best].tolist(), pa.string()))


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
    from ..relational import grouped_agg_hash

    # one group per distinct content fingerprint -> high cardinality:
    # the bucketed agg (grouped_agg_hash) beats the native Aggregate
    return grouped_agg_hash(slim, ["fp"], min_cols=[id_col], count=True)


# ---------------------------------------------------------------------------
# near-dup: MinHash + LSH


def _md5_u64(strings) -> np.ndarray:
    """64-bit hash of each string = little-endian bytes 8:16 of its md5
    digest — bit-identical to DuckDB's ``md5_number_lower`` (the oracle
    hash). Callers hash each UNIQUE string once per batch."""
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")
         for s in strings],
        dtype=np.uint64)


def _tokenize_batch(t: pa.Table, col: str):
    """Split on single spaces (== DuckDB ``string_split(text, ' ')``).
    Returns (token array as object ndarray, per-doc offsets)."""
    toks = pc.split_pattern(t[col], " ")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    words = np.asarray(pc.list_flatten(flat).to_pylist(), dtype=object)
    off = np.concatenate([[0], np.cumsum(lens)])
    return words, off


def _gram_hash_sets(t: pa.Table, col: str, n: int = 3) -> list[np.ndarray]:
    """Per-doc UNIQUE word-n-gram hash sets (sorted uint64 arrays).

    Gram definition matches the SQL oracle exactly: tokens are the
    single-space split; gram i = tokens[i:i+n] joined by spaces; a doc
    with fewer than n tokens contributes its whole token list as one
    gram. Token hashes (md5-lower, computed once per unique token per
    batch) combine positionally with splitmix64, so distinct gram
    strings map to distinct 64-bit hashes w.h.p. — set sizes (and
    hence exact Jaccard) agree with the string-set oracle."""
    words, off = _tokenize_batch(t, col)
    if len(words):
        # hash-based factorize beats sort-based np.unique on object
        # strings ~4x; gram math below only needs token ids
        inv, uniq = pd.factorize(words, sort=False)
        th = _md5_u64(np.asarray(uniq, dtype=object))[inv]
    else:
        th = np.array([], np.uint64)
    C = [np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9)]
    ndoc = len(off) - 1
    lens = off[1:] - off[:-1]
    doc_of = np.repeat(np.arange(ndoc), lens)
    W = len(th)
    # ONE vectorized pass over all tokens of the batch: gram at global
    # position p is valid iff p..p+n-1 stay inside one doc
    out: list[np.ndarray] = [np.empty(0, np.uint64)] * ndoc
    if W >= n:
        g = np.zeros(W - n + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                g = splitmix64(g ^ (th[j:W - n + 1 + j] * C[j % 3]))
        valid = doc_of[: W - n + 1] == doc_of[n - 1:]
        g, gdoc = g[valid], doc_of[: W - n + 1][valid]
        order = np.lexsort((g, gdoc))
        g, gdoc = g[order], gdoc[order]
        keep = np.concatenate([[True], (g[1:] != g[:-1]) | (gdoc[1:] != gdoc[:-1])])
        g, gdoc = g[keep], gdoc[keep]
        counts = np.bincount(gdoc, minlength=ndoc)
        bounds = np.zeros(ndoc + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        for d in np.nonzero(counts)[0]:
            out[d] = g[bounds[d]:bounds[d + 1]]
    # short docs (< n tokens): the whole token list is one gram — rare,
    # loop over just those
    for d in np.nonzero((lens < n) & (lens >= 0))[0]:
        h = th[off[d]:off[d + 1]]
        gg = np.zeros(1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(len(h)):
                gg = splitmix64(gg ^ (h[j:j + 1] * C[j % 3]))
        out[d] = gg
    return out


def minhash_signatures(ds: ray.data.Dataset, num_hashes: int = 64,
                       col: str = "text", id_col: str = "doc_id",
                       with_grams: bool = False) -> ray.data.Dataset:
    """Per-doc MinHash signature over word-3-gram shingles (vectorized:
    one permutation family via splitmix64(gram ^ salt), min-reduced per
    salt). ``with_grams=True`` also carries each doc's unique gram-hash
    set for downstream exact-Jaccard verification."""
    salts = splitmix64(np.arange(num_hashes, dtype=np.uint64) + np.uint64(0xABCD))

    def f(t: pa.Table) -> pa.Table:
        gram_sets = _gram_hash_sets(t, col)
        lens = np.array([len(g) for g in gram_sets], dtype=np.int64)
        allg = np.concatenate(gram_sets) if gram_sets else np.empty(0, np.uint64)
        sigs = np.full((t.num_rows, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
        if allg.size:
            # allocation-free hash of the (grams x salts) matrix, then
            # segment-min via reduceat (4x faster than minimum.at's
            # scatter path); zero-gram docs contribute no segment and
            # keep the sentinel max signature
            m = np.bitwise_xor(allg[:, None], salts[None, :])
            with np.errstate(over="ignore"):
                splitmix64_inplace(m, np.empty_like(m))
            starts = np.zeros(t.num_rows, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nz = lens > 0
            sigs[nz] = np.minimum.reduceat(m, starts[nz], axis=0)
        cols = {id_col: t.column(id_col), "sig": pa.array(list(sigs))}
        if with_grams:
            cols["grams"] = pa.array([g for g in gram_sets], pa.list_(pa.uint64()))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(ds: ray.data.Dataset, num_hashes: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.5,
                      col: str = "text", id_col: str = "doc_id",
                      broadcast_bytes: int = 256 * 1024 * 1024) -> ray.data.Dataset:
    """MinHash+LSH near-dup pairs, verified by EXACT word-3-gram
    Jaccard: shingle → minhash → band → bucket groupby → in-bucket
    verify → distributed cross-band dedup.

    Scale properties (VERDICT r1 fixes): the result is a Dataset — the
    pair set never lands on the driver; cross-band dedup needs NO
    second shuffle — each pair is emitted only by its minimal colliding
    band (recomputable from the carried signatures), so the global pair
    set is exactly-once by construction; in-bucket pair generation
    prefilters candidates with a vectorized signature-agreement matrix
    before the exact set intersections, so a degenerate bucket costs
    O(n²) bit-ops, not O(n²) Python pairs.
    When the corpus is broadcast-sized, the signature + gram payloads
    ship ONCE via the object store and the band explode moves slim
    (id, band, bucket) rows. Corpora above ``broadcast_bytes`` take the
    SLIM CARRY path: the LSH shuffle moves (id, band, bucket, sig) only
    — gram payloads never ride the ×bands explode — and candidate pairs
    are verified after the fact by rejoining grams by id (two
    partitioned hash joins moving |pairs| payloads once each). The
    signature stage re-executes once for the gram rejoin (Ray Data
    lineage); that one extra source read is far cheaper than ×bands
    payload write-amplification through the shuffle at 100 TB.

    Returns Dataset[(id_a, id_b, j_micro)] where
    j_micro = round(1e6 · |A∩B| / |A∪B|) — the SQL-oracle-exact form.
    """
    rows_per_band = num_hashes // bands
    thr_micro = int(round(jaccard_threshold * 1e6))
    sigs = minhash_signatures(ds, num_hashes, col, id_col, with_grams=True)

    try:
        _sz = ds.size_bytes()
    except Exception:
        _sz = None
    broadcast_payloads = _sz is not None and _sz <= broadcast_bytes
    if broadcast_payloads:
        sigs = sigs.materialize()

        @ray.remote(num_cpus=0.5)
        def _payload_chunk(block: pa.Table) -> tuple:
            if block.num_rows == 0 or id_col not in block.schema.names:
                z = np.empty(0, np.uint64)
                return (np.empty(0, np.int64),
                        np.empty((0, num_hashes), np.uint64), z,
                        np.empty(0, np.int64))
            ids_c = np.asarray(block.column(id_col).to_numpy(zero_copy_only=False))
            sig_c = np.stack(block.column("sig").to_numpy(zero_copy_only=False)).astype(np.uint64)
            gcol = block.column("grams").combine_chunks()
            flat = np.asarray(gcol.flatten(), dtype=np.uint64)
            lens = np.asarray(pc.list_value_length(gcol), dtype=np.int64)
            return ids_c, sig_c, flat, lens

        parts = ray.get([_payload_chunk.remote(r) for r in sigs.to_arrow_refs()])
        parts = [p for p in parts if len(p[0])]
        if not parts:  # empty corpus — nothing can pair
            return ray.data.from_arrow(pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "j_micro": pa.array([], pa.int64())}))
        _ids = np.concatenate([p[0] for p in parts])
        _sigm = np.concatenate([p[1] for p in parts])
        _flat = np.concatenate([p[2] for p in parts])
        _lens = np.concatenate([p[3] for p in parts])
        _order = np.argsort(_ids)
        _off = np.zeros(len(_ids) + 1, dtype=np.int64)
        np.cumsum(_lens, out=_off[1:])
        # FLAT arrays, not a dict of small objects: numpy buffers come
        # back from the object store zero-copy, so per-task ray.get is
        # O(1) instead of deserializing 2 small arrays per doc
        pay_ref = ray.put((_ids[_order], _sigm[_order],
                           _flat, _off, _order.astype(np.int64)))
    else:
        pay_ref = None

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        sig = np.stack(t.column("sig").to_numpy(zero_copy_only=False))
        out = []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            with np.errstate(over="ignore"):
                bucket = splitmix64(chunk.astype(np.uint64).sum(axis=1) ^ np.uint64(b * 7919))
            cols = {
                id_col: pa.array(ids),
                "band": pa.array(np.full(len(ids), b, dtype=np.int32), pa.int32()),
                "bucket": pa.array(bucket, pa.uint64()),
            }
            if pay_ref is None:  # carry path: SLIM — sig only, grams
                cols["sig"] = t.column("sig")  # rejoined by id post-LSH
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")
    _EMPTY = {"id_a": pd.Series([], dtype=np.int64),
              "id_b": pd.Series([], dtype=np.int64),
              "j_micro": pd.Series([], dtype=np.int64)}
    _EMPTY_CAND = {"id_a": pd.Series([], dtype=np.int64),
                   "id_b": pd.Series([], dtype=np.int64)}

    def band_buckets(sig: np.ndarray) -> np.ndarray:
        """(n, bands) bucket matrix — the same routing hash explode_bands
        uses, recomputed from the carried signatures."""
        chunks = sig.reshape(len(sig), bands, rows_per_band)
        with np.errstate(over="ignore"):
            sums = chunks.astype(np.uint64).sum(axis=2)
            return splitmix64(sums ^ (np.arange(bands, dtype=np.uint64) * np.uint64(7919)))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_EMPTY if pay_ref is not None else _EMPTY_CAND)
        this_band = int(g["band"].iloc[0])
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        if pay_ref is not None:
            sorted_ids, sig_mat, flat, off, orig_idx = ray.get(pay_ref)
            pos = np.searchsorted(sorted_ids, ids)
            sig = sig_mat[pos]
            oi = orig_idx[pos]
            gram_list = np.array([flat[off[o]:off[o + 1]] for o in oi],
                                 dtype=object)
        else:
            # slim carry mode: grams did NOT ride the shuffle — this
            # stage emits CANDIDATE pairs only; exact-Jaccard verify
            # happens after rejoining grams by id (see below)
            sig = np.stack(g["sig"].to_numpy())[order]
            gram_list = None
        # vectorized signature-agreement prefilter: estimated jaccard
        # from matching minhash positions, computed as an (n, n) count
        # matrix — far below the exact threshold cannot be a true pair
        n = len(ids)
        agree = np.zeros((n, n), dtype=np.int32)
        for k in range(sig.shape[1]):
            col_k = sig[:, k]
            agree += (col_k[:, None] == col_k[None, :]).astype(np.int32)
        est = agree / sig.shape[1]
        cut = max(jaccard_threshold - 0.25, 0.05)
        iu, ju = np.nonzero(np.triu(est >= cut, k=1))
        if len(iu):
            # emit each pair only from its MINIMAL colliding band: every
            # other band that buckets the pair together skips it, so the
            # global pair set is exactly-once WITHOUT a cross-band
            # distinct shuffle
            bb = band_buckets(sig)
            min_band = np.argmax(bb[iu] == bb[ju], axis=1)  # first True
            pick = min_band == this_band
            iu, ju = iu[pick], ju[pick]
        if gram_list is None:  # carry mode: candidates out, verify later
            if not len(iu):
                return pd.DataFrame(_EMPTY_CAND)
            keep = ids[iu] != ids[ju]
            a = np.minimum(ids[iu][keep], ids[ju][keep]).astype(np.int64)
            b = np.maximum(ids[iu][keep], ids[ju][keep]).astype(np.int64)
            if not len(a):
                return pd.DataFrame(_EMPTY_CAND)
            return pd.DataFrame({"id_a": a, "id_b": b})
        out_a, out_b, out_j = [], [], []
        for i, j in zip(iu, ju):
            if ids[i] == ids[j]:
                continue
            ga = np.asarray(gram_list[i], dtype=np.uint64)
            gb = np.asarray(gram_list[j], dtype=np.uint64)
            inter = np.intersect1d(ga, gb, assume_unique=True).size
            union = ga.size + gb.size - inter
            # floor(x+0.5): round-half-away-from-zero, matching DuckDB ROUND()
            # (np.round is half-to-even and diverges on exact .5 values).
            j_micro = int(np.floor(1e6 * inter / union + 0.5)) if union else 0
            if j_micro >= thr_micro:
                a, b = (int(ids[i]), int(ids[j])) if ids[i] < ids[j] else (int(ids[j]), int(ids[i]))
                out_a.append(a)
                out_b.append(b)
                out_j.append(j_micro)
        if not out_a:
            return pd.DataFrame(_EMPTY)
        return pd.DataFrame({"id_a": np.array(out_a, np.int64),
                             "id_b": np.array(out_b, np.int64),
                             "j_micro": np.array(out_j, np.int64)})

    from ..relational import grouped_apply_bucketed

    # exactly-once emission (min colliding band) means no cross-band
    # dedup shuffle is needed — the bucketed group-apply IS the result;
    # singleton LSH buckets (the vast majority) can never emit a pair,
    # so they're dropped vectorized before group iteration
    result = grouped_apply_bucketed(exploded, ["band", "bucket"],
                                    pairs_in_bucket, min_group_size=2)
    if pay_ref is not None:
        return result

    # ---- slim carry path, stage 2 (VERDICT r3 finding 2): rejoin grams
    # by id and verify exact Jaccard. The LSH shuffle above moved only
    # (id, band, bucket, sig) — never the ~1 KB gram payloads ×bands.
    # Candidates are tiny relative to the corpus (prefiltered by the
    # signature-agreement matrix), so these two partitioned hash joins
    # move only |pairs| gram payloads each, once. ------------------------
    from ..relational import hash_join

    grams_ds = sigs.select_columns([id_col, "grams"])

    def _pack(side: str):
        # list<uint64> → large_binary: Acero joins reject list-typed
        # payload columns; a packed little-endian byte blob joins fine
        # and np.frombuffer restores it without a copy at verify time.
        # large_binary (int64 offsets) — a plain binary's int32 offsets
        # would wrap silently past 2 GiB of gram payload in one batch
        # (ADVICE r4), exactly the batch size this 100 TB path courts
        def f(t: pa.Table) -> pa.Table:
            g = t.column("grams").combine_chunks()
            flat = np.ascontiguousarray(
                np.asarray(g.flatten(), dtype=np.uint64))
            lens = np.asarray(pc.list_value_length(g), dtype=np.int64)
            off = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens, out=off[1:])
            packed = pa.Array.from_buffers(
                pa.large_binary(), len(lens),
                [None, pa.py_buffer((off * 8).tobytes()),
                 pa.py_buffer(flat.tobytes())])
            return pa.table({f"id_{side}": t.column(id_col),
                             f"grams_{side}": packed})
        return f

    joined = hash_join(result, grams_ds.map_batches(
        _pack("a"), batch_format="pyarrow"), "id_a",
        left_cols=["id_a", "id_b"], right_cols=["id_a", "grams_a"])
    joined = hash_join(joined, grams_ds.map_batches(
        _pack("b"), batch_format="pyarrow"), "id_b",
        left_cols=["id_a", "id_b", "grams_a"],
        right_cols=["id_b", "grams_b"])

    _OUT = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                      ("j_micro", pa.int64())])

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        ia = t.column("id_a").to_numpy()
        ib = t.column("id_b").to_numpy()
        ga = t.column("grams_a").to_pylist()
        gb = t.column("grams_b").to_pylist()
        out_a, out_b, out_j = [], [], []
        for i in range(len(ia)):
            A = np.frombuffer(ga[i], dtype=np.uint64)
            B = np.frombuffer(gb[i], dtype=np.uint64)
            inter = np.intersect1d(A, B, assume_unique=True).size
            union = A.size + B.size - inter
            jm = int(np.floor(1e6 * inter / union + 0.5)) if union else 0
            if jm >= thr_micro:
                out_a.append(int(ia[i]))
                out_b.append(int(ib[i]))
                out_j.append(jm)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "j_micro": pa.array(out_j, pa.int64())})

    return joined.map_batches(_verify, batch_format="pyarrow")


def simhash(ds: ray.data.Dataset, col: str = "text",
            id_col: str = "doc_id") -> ray.data.Dataset:
    """64-bit SimHash per document over word features, vectorized:
    tokens are hashed once per unique word per batch (md5-lower — the
    DuckDB ``md5_number_lower`` oracle hash), the 64 bit-votes are one
    (occurrences × 64) matrix with a segment-sum per doc. Emits both
    the uint64 signature and its MSB-first bit string (the
    dtype-portable oracle column)."""

    def f(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        uniq, inv = np.unique(words, return_inverse=True) if len(words) else (np.array([], object), np.array([], np.int64))
        h = _md5_u64(uniq)[inv] if len(uniq) else np.array([], np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = 2 * bits - 1  # (occurrences, 64)
        n = t.num_rows
        per_doc = np.zeros((n, 64), dtype=np.int64)
        nonempty = np.diff(off) > 0
        if votes.size:
            red = np.add.reduceat(votes, off[:-1][nonempty], axis=0)
            per_doc[nonempty] = red
        sigbit = (per_doc > 0).astype(np.uint64)
        sig = (sigbit << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
        bitstr = ["".join("1" if b else "0" for b in row[::-1]) for row in sigbit]
        return pa.table({id_col: t.column(id_col),
                         "simhash": pa.array(sig, pa.uint64()),
                         "simhash_bits": pa.array(bitstr, pa.string())})

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


# ---------------------------------------------------------------------------
# winnowing fingerprints (Rabin-Karp rolling hash + MOSS window minima)

WINNOW_MOD = 2_147_483_647   # Mersenne prime 2^31 - 1: products fit uint64
WINNOW_BASE = 1_000_003      # prime base, invertible mod WINNOW_MOD


class _PowTables:
    """Per-worker grow-once tables of B^i and B^-i mod M (uint64).

    Doubling extension: T2[i] = T[i] * T[-1] * B keeps every product
    below 2^62, so the whole table is built in log2(n) vectorized ops.
    """

    def __init__(self, base: int):
        self.base = np.uint64(base)
        self.inv = np.uint64(pow(base, WINNOW_MOD - 2, WINNOW_MOD))
        self.pows = np.array([1], dtype=np.uint64)
        self.ipows = np.array([1], dtype=np.uint64)

    @staticmethod
    def _extend(tab: np.ndarray, step: np.uint64, n: int) -> np.ndarray:
        M = np.uint64(WINNOW_MOD)
        while len(tab) <= n:
            nxt = (tab * ((tab[-1] * step) % M)) % M
            tab = np.concatenate([tab, nxt])
        return tab

    def ensure(self, n: int) -> None:
        self.pows = self._extend(self.pows, self.base, n)
        self.ipows = self._extend(self.ipows, self.inv, n)


_POW_TABLES: _PowTables | None = None


def _pow_tables(n: int) -> _PowTables:
    global _POW_TABLES
    if _POW_TABLES is None:
        _POW_TABLES = _PowTables(WINNOW_BASE)
    _POW_TABLES.ensure(n)
    return _POW_TABLES


def _cumsum_mod(a: np.ndarray) -> np.ndarray:
    """Exclusive modular prefix sum of values < M, safe for any length
    (chunked so intermediate int64 cumsums never overflow)."""
    M = np.uint64(WINNOW_MOD)
    out = np.empty(len(a) + 1, dtype=np.uint64)
    out[0] = 0
    CH = 1 << 24  # chunk * (M-1) < 2^55
    carry = np.uint64(0)
    for s in range(0, len(a), CH):
        seg = np.cumsum(a[s:s + CH], dtype=np.uint64)
        out[s + 1:s + 1 + len(seg)] = (seg + carry) % M
        carry = out[s + len(seg)]
    return out


def winnow_fingerprints(ds: ray.data.Dataset, col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        w: int = 4) -> ray.data.Dataset:
    """MOSS-style winnowing fingerprint summary per document.

    Gram hash at char position i is the degree-(k-1) polynomial
    ``sum_j cp[i+j] * B^(k-1-j) mod M`` over UNICODE CODE POINTS — the
    classic Rabin-Karp rolling hash, evaluated for every position of
    the whole batch at once from ONE modular prefix sum (the vectorized
    closed form of the O(1) rolling update: H_i = B^(i+k) *
    (S[i+k] - S[i]) with S the B^-j-weighted prefix). The fingerprint
    set is the DISTINCT minima of each full window of ``w`` consecutive
    gram hashes, so any shared substring of length >= k + w - 1 yields
    a shared fingerprint (the winnowing guarantee) while storage is
    ~2/(w+1) of the gram count. Docs shorter than k + w - 1 code points
    are dropped (no full window exists).

    Map-only — one output row per doc (n_fp, fp_min, fp_sum), no
    shuffle; the whole batch is ONE utf-32 decode + flat numpy passes.
    Code points (not UTF-8 bytes) keep exact parity with the SQL
    oracle's character-addressed ``ascii(substr(text, pos, 1))``.
    Beyond-reference training-data op (SURVEY §2 'beyond').
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")

    def f(t: pa.Table) -> pa.Table:
        ids, udoc, ufp, ndoc = _winnow_sets(t, col, id_col, k, w)
        if ndoc == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_fp": pa.array([], pa.int64()),
                             "fp_min": pa.array([], pa.int64()),
                             "fp_sum": pa.array([], pa.int64())})
        n_fp = np.bincount(udoc, minlength=ndoc).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_fp)])[:-1]
        fp_min = ufp[starts]                            # sorted → first is min
        fp_sum = np.bincount(udoc, weights=ufp,
                             minlength=ndoc).astype(np.int64)  # < 2^53: exact
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_fp": pa.array(n_fp),
                         "fp_min": pa.array(fp_min),
                         "fp_sum": pa.array(fp_sum)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _winnow_sets(t: pa.Table, col: str, id_col: str, k: int, w: int):
    """Flat winnowing core for one batch: returns (kept doc ids,
    per-fingerprint doc index, distinct fingerprints sorted per doc,
    n kept docs). Every kept doc has >= 1 full window, so every doc
    index appears at least once."""
    M = np.uint64(WINNOW_MOD)
    texts = t.column(col).to_pylist()
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                       count=len(texts))
    keep_doc = lens >= k + w - 1
    if not keep_doc.any():
        return ids[:0], np.empty(0, np.int64), np.empty(0, np.int64), 0
    texts = [s for s, kp in zip(texts, keep_doc) if kp]
    ids = ids[keep_doc]
    lens = lens[keep_doc]
    ndoc = len(texts)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                       dtype=np.uint32).astype(np.uint64)
    off = np.concatenate([[0], np.cumsum(lens)])
    loc = np.arange(len(cp), dtype=np.int64) - np.repeat(off[:-1], lens)
    tabs = _pow_tables(int(lens.max()) + k + 1)
    # S-prefix: C[g] = sum_{j<g} cp[j] * B^-(loc_j+1) mod M; the
    # doc-start offset cancels in C[g+k]-C[g], so one flat prefix
    # serves every doc
    term = (cp * tabs.ipows[loc + 1]) % M
    C = _cumsum_mod(term)
    gdoc = np.repeat(np.arange(ndoc), lens)
    gram_ok = loc <= np.repeat(lens, lens) - k          # full gram fits
    gpos = np.nonzero(gram_ok)[0]
    d = (C[gpos + k] + M - C[gpos]) % M
    H = (tabs.pows[loc[gpos] + k] * d) % M              # rolling gram hash
    hdoc = gdoc[gpos]
    # full windows of w grams: contiguous in H because grams of one
    # doc are contiguous in gpos
    wins = np.lib.stride_tricks.sliding_window_view(H, w)
    win_ok = hdoc[: len(H) - w + 1] == hdoc[w - 1:]
    fp = wins.min(axis=1)[win_ok]
    fdoc = hdoc[: len(H) - w + 1][win_ok]
    # distinct per doc: one composite-key unique (fp < 2^31)
    combo = np.unique((fdoc.astype(np.uint64) << np.uint64(31)) | fp)
    udoc = (combo >> np.uint64(31)).astype(np.int64)
    ufp = (combo & np.uint64(0x7FFFFFFF)).astype(np.int64)
    return ids, udoc, ufp, ndoc


def winnow_dup_candidates(ds: ray.data.Dataset, col: str = "text",
                          id_col: str = "doc_id", k: int = 8,
                          w: int = 4) -> ray.data.Dataset:
    """Candidate near-dup pairs = docs sharing >= 1 winnowing
    fingerprint, with the shared-fingerprint count as evidence.

    The map side emits slim (fp, doc_id) rows (fingerprints only —
    text never moves); one groupby-on-fp shuffle forms the posting
    lists; pairs are emitted per fingerprint and combined by a second
    slim (id_a, id_b) count. Hot fingerprints (boilerplate shared by
    many docs) are capped at ``max_postings`` docs — a fingerprint
    shared by thousands of docs identifies boilerplate, not a dup pair
    (same reasoning as dropping giant LSH buckets)."""
    max_postings = 64

    def explode(t: pa.Table) -> pa.Table:
        ids, udoc, ufp, ndoc = _winnow_sets(t, col, id_col, k, w)
        return pa.table({"fp": pa.array(ufp, pa.int64()),
                         id_col: pa.array(ids[udoc] if ndoc else ids[:0],
                                          pa.int64())})

    exploded = ds.select_columns([id_col, col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2 or len(ids) > max_postings:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[iu], "id_b": ids[ju]})

    from ..relational import grouped_agg_hash, grouped_apply_bucketed
    pairs = grouped_apply_bucketed(exploded, ["fp"], pairs_in_group,
                                   min_group_size=2)
    return grouped_agg_hash(pairs, ["id_a", "id_b"], count=True)



def normalize_text(ds: ray.data.Dataset, col: str = "text",
                   out: str = "norm") -> ray.data.Dataset:
    """Canonical text normalization for dedup/fingerprint pipelines:
    lowercase, collapse every non-alphanumeric run to one space, trim.
    Fully vectorized in Arrow (utf8_lower + RE2 replace — the same
    regex engine DuckDB's regexp_replace uses, so
    ``trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))`` is an
    exact oracle)."""

    def f(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t[col])
        x = pc.replace_substring_regex(x, pattern="[^a-z0-9]+",
                                       replacement=" ")
        x = pc.utf8_trim_whitespace(x)
        return t.append_column(out, x)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _lev_le1(a: str, b: str) -> int:
    """Exact Levenshtein distance when known ≤ 1, else 2. O(L) single
    scan (no DP): equal lengths → count substitutions; lengths off by
    one → single-gap alignment."""
    la, lb = len(a), len(b)
    if la == lb:
        d = sum(1 for x, y in zip(a, b) if x != y)
        return d if d <= 1 else 2
    if abs(la - lb) != 1:
        return 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2


def edit1_pairs(ds: ray.data.Dataset, col: str = "s",
                num_buckets: int = 64) -> ray.data.Dataset:
    """Exact edit-distance-≤1 pairs over a DISTINCT string column via
    symmetric-delete neighborhoods (the SymSpell/FAROO candidate map):
    each string emits itself plus its |s| single-deletion variants;
    two strings within one edit ALWAYS share a variant, so candidate
    generation is a hash join on variants — never an all-pairs scan.
    Candidates sharing a variant can be up to distance 2, so each pair
    is verified with an O(L) ≤1-distance check.

    Scale shape: the exchange moves (variant-hash, s) slim rows — the
    neighborhood blowup is |s|+1 per DISTINCT value (vocabulary-sized,
    not corpus-sized; run ``relational.distinct`` first). Pairs found
    through several shared variants are deduped by one distinct
    shuffle of the (tiny) candidate set. Python per-string variant
    loop is over the distinct domain — bounded, not a hot corpus path.

    Output: (s_a, s_b, dist:int64), s_a < s_b.
    """
    from .. import relational as rel

    def variants(t: pa.Table) -> pa.Table:
        out_v, out_s = [], []
        for s in t.column(col).to_pylist():
            out_v.append(s)
            out_s.append(s)
            for i in range(len(s)):
                out_v.append(s[:i] + s[i + 1:])
                out_s.append(s)
        return pa.table({"__v": pa.array(out_v, pa.string()),
                         col: pa.array(out_s, pa.string())})

    cand = ds.select_columns([col]).map_batches(
        variants, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        strs = g[col].to_numpy()
        if len(strs) < 2:
            return pd.DataFrame({"s_a": pd.Series(dtype="object"),
                                 "s_b": pd.Series(dtype="object")})
        strs = np.unique(strs)
        iu, ju = np.triu_indices(len(strs), k=1)
        return pd.DataFrame({"s_a": strs[iu], "s_b": strs[ju]})

    cand_pairs = rel.grouped_apply_bucketed(cand, ["__v"], pairs,
                                            num_buckets=num_buckets,
                                            min_group_size=2)
    uniq = rel.distinct(cand_pairs, ["s_a", "s_b"])

    def verify(t: pa.Table) -> pa.Table:
        sa = t.column("s_a").to_pylist()
        sb = t.column("s_b").to_pylist()
        d = np.array([_lev_le1(a, b) for a, b in zip(sa, sb)], dtype=np.int64)
        keep = d <= 1
        return pa.table({"s_a": pa.array([s for s, k in zip(sa, keep) if k], pa.string()),
                         "s_b": pa.array([s for s, k in zip(sb, keep) if k], pa.string()),
                         "dist": pa.array(d[keep], pa.int64())})

    return uniq.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_topk(ds: ray.data.Dataset, k: int = 3, col: str = "text",
               scale: int = 1_000_000) -> ray.data.Dataset:
    """Top-k characteristic terms per document by an integer TF-IDF
    surrogate: score = tf · scale // df. Thin delegator to the ONE
    canonical implementation (``pipelines/mining.py:tfidf_topk`` with
    ``output="score"`` — VERDICT r4 item 6 consolidated the two
    duplicated tokenize/df passes); kept here for the q83 contract
    (doc_id, term, tf, score) and the steps-registry import path."""
    from .mining import tfidf_topk as _canonical

    return _canonical(ds, k=k, text_col=col, id_col="doc_id",
                      output="score", scale=scale)


def bigram_topk(ds: ray.data.Dataset, k: int = 20,
                col: str = "text") -> "pd.DataFrame":
    """Corpus-wide top-k bigrams by exact count: tokens explode inside
    the batch (Arrow split), adjacent-pair strings are built vectorized
    from the flat token array (a pair is valid iff both tokens share a
    parent document), per-batch partial counts ride the standard
    grouped_agg shuffle, and the final top-k is the local-top-k +
    driver-merge pattern (candidates ≤ k·|batches| rows, no global
    sort). Deterministic tie order: count desc, bigram asc."""
    import pandas as pd

    from .. import relational as rel

    def bigrams(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[col], " ")
        parents = pc.list_parent_indices(toks).to_numpy()
        flat = pc.list_flatten(toks)
        if len(parents) < 2:
            return pa.table({"bg": pa.array([], pa.string())})
        same = parents[:-1] == parents[1:]
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1),
            pa.scalar(" ", pa.string()))
        return pa.table({"bg": joined.filter(pa.array(same))})

    bg = ds.select_columns([col]).map_batches(
        bigrams, batch_format="pyarrow", zero_copy_batch=True)
    counts = rel.grouped_agg_hash(bg, ["bg"], count=True)
    return rel.topk(counts, "n", k, descending=True, tiebreak="bg")


def jaccard_join_prefix(ds: ray.data.Dataset, tau_num: int = 3,
                        tau_den: int = 5, col: str = "text",
                        id_col: str = "doc_id",
                        num_buckets: int = 64) -> ray.data.Dataset:
    """EXACT Jaccard τ-similarity self-join via AllPairs/PPJoin prefix
    filtering (Bayardo et al. "Scaling Up All Pairs", Xiao et al.
    PPJoin) over word-3-gram sets — the deterministic sibling of the
    MinHash pipeline (no LSH false-negative risk):

    - each doc's UNIQUE gram-hash set rides sorted by the global hash
      order (a fixed total order is all prefix filtering needs; hash
      order needs NO frequency pass, so the stage stays one-pass at
      any corpus size — rarest-first ordering is only a candidate-
      count heuristic);
    - only the first p = s − ⌈τ·s⌉ + 1 grams (the prefix) are emitted
      to the shuffle: any pair with J ≥ τ MUST share a prefix gram;
    - candidate pairs form inside per-gram buckets with the length
      filter τ·max(|A|,|B|) ≤ min(|A|,|B|) applied cross-multiplied;
    - verification is exact set intersection; duplicates collapse in
      the pair-keyed verify shuffle (exactly-once output).

    Gram payloads broadcast via the object store at test scale (same
    contract as minhash_lsh_pairs' broadcast mode; the carry-by-id
    re-join is the documented PB-scale path). Returns
    Dataset[(id_a, id_b, inter, uni)] with inter·τ_den ≥ τ_num·uni.
    """
    from ..relational import grouped_apply_bucketed

    def emit_sets(t: pa.Table) -> pa.Table:
        sets_ = _gram_hash_sets(t, col)
        ids = t.column(id_col).to_numpy()
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "grams": pa.array([g for g in sets_], pa.list_(pa.uint64()))})

    sets_ds = ds.map_batches(emit_sets, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    # broadcast flat payload (ids sorted, offsets, flat grams)
    tabs = [b for b in sets_ds.iter_batches(batch_format="pyarrow")]
    allt = pa.concat_tables(tabs) if tabs else pa.table(
        {id_col: pa.array([], pa.int64()),
         "grams": pa.array([], pa.list_(pa.uint64()))})
    ids_all = allt.column(id_col).to_numpy()
    gcol = allt.column("grams").combine_chunks()
    flat = np.asarray(gcol.flatten(), dtype=np.uint64)
    lens = np.asarray(pc.list_value_length(gcol), dtype=np.int64)
    order = np.argsort(ids_all)
    off = np.zeros(len(ids_all) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    pay = ray.put((ids_all[order], flat, off, order.astype(np.int64)))

    def emit_prefix(t: pa.Table) -> pa.Table:
        gcol_ = t.column("grams").combine_chunks()
        fl = np.asarray(gcol_.flatten(), dtype=np.uint64)
        ln = np.asarray(pc.list_value_length(gcol_), dtype=np.int64)
        ids = t.column(id_col).to_numpy()
        starts = np.zeros(len(ids), np.int64)
        np.cumsum(ln[:-1], out=starts[1:])
        # prefix length p = s - ceil(tau*s) + 1 (sets arrive sorted by
        # the global hash order from _gram_hash_sets)
        p = ln - (tau_num * ln + tau_den - 1) // tau_den + 1
        p = np.clip(p, 0, ln)
        pos = np.concatenate([np.arange(s, s + k) for s, k in
                              zip(starts, p)]) if len(ids) else \
            np.empty(0, np.int64)
        doc = np.repeat(ids, p)
        size = np.repeat(ln, p)
        return pa.table({"gram": pa.array(fl[pos], pa.uint64()),
                         id_col: pa.array(doc, pa.int64()),
                         "size": pa.array(size, pa.int64())})

    prefix = sets_ds.map_batches(emit_prefix, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def pairs_per_gram(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in g.groupby("gram", sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            sz = sub["size"].to_numpy()
            ii, jj = np.triu_indices(len(ids), 1)
            lo = np.minimum(sz[ii], sz[jj])
            hi = np.maximum(sz[ii], sz[jj])
            keep = tau_num * hi <= tau_den * lo
            out_a.append(ids[ii[keep]])
            out_b.append(ids[jj[keep]])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(np.int64),
            "id_b": np.concatenate(out_b).astype(np.int64)})

    cands = grouped_apply_bucketed(prefix, ["gram"], pairs_per_gram,
                                   num_buckets=num_buckets,
                                   min_group_size=2, whole_bucket=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["id_a", "id_b"])
        sids, fl, of, orig = ray.get(pay)
        ia, ib, iv, uv = [], [], [], []
        for a, b in zip(g["id_a"].to_numpy(), g["id_b"].to_numpy()):
            pa_ = int(orig[np.searchsorted(sids, a)])
            pb_ = int(orig[np.searchsorted(sids, b)])
            sa = fl[of[pa_]:of[pa_ + 1]]
            sb = fl[of[pb_]:of[pb_ + 1]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            uni = len(sa) + len(sb) - inter
            if inter * tau_den >= tau_num * uni:
                ia.append(int(a)); ib.append(int(b))
                iv.append(inter); uv.append(uni)
        return pd.DataFrame({"id_a": pd.Series(ia, dtype="int64"),
                             "id_b": pd.Series(ib, dtype="int64"),
                             "inter": pd.Series(iv, dtype="int64"),
                             "uni": pd.Series(uv, dtype="int64")})

    return grouped_apply_bucketed(cands, ["id_a", "id_b"], verify,
                                  num_buckets=num_buckets,
                                  whole_bucket=True)


def cdc_chunks(ds: ray.data.Dataset, col: str = "text",
               id_col: str = "doc_id", k: int = 8,
               div: int = 64) -> ray.data.Dataset:
    """Content-defined chunking dedup (the FastCDC/LBFS shape): split
    every document at positions where the k-gram Rabin–Karp hash ≡ 0
    (mod ``div``) — so boundaries stick to CONTENT, surviving
    insertions/deletions that would shift every fixed-size block — and
    deduplicate the chunks corpus-wide. Returns per size-class
    (len % 8) rows: chunk count, distinct-chunk count, total bytes,
    distinct bytes — the dedup-ratio ledger a content-addressed store
    reports.

    Boundary rule: a cut AFTER gram start i (i.e. at i + k) whenever
    gram_hash(i) % div == 0, plus the forced end-of-doc cut; the chunk
    id is the same polynomial hash evaluated over the whole chunk, so
    equal text spans get equal ids with zero re-hash cost — both the
    gram hashes and every chunk hash come from ONE flat modular prefix
    sum per batch (the winnowing machinery, text.py _winnow_sets).
    Map side emits slim (fp, len) rows — text never moves; dedup is
    one hash-partitioned count shuffle; the size-class ledger is a
    partial-aggregated second pass. Beyond-reference training-data op
    (SURVEY §2 'beyond'): the storage-dedup sibling of q42's
    winnowing."""
    from ..relational import grouped_agg

    if k < 1 or div < 1:
        raise ValueError("k and div must be >= 1")
    M = np.uint64(WINNOW_MOD)

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                           count=len(texts))
        keep = lens > 0
        texts = [s for s, kp in zip(texts, keep) if kp]
        lens = lens[keep]
        ndoc = len(texts)
        if ndoc == 0:
            return pa.table({"fp": pa.array([], pa.int64()),
                             "len": pa.array([], pa.int64())})
        cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                           dtype=np.uint32).astype(np.uint64)
        off = np.concatenate([[0], np.cumsum(lens)])
        loc = np.arange(len(cp), dtype=np.int64) - np.repeat(off[:-1], lens)
        tabs = _pow_tables(int(lens.max()) + k + 1)
        term = (cp * tabs.ipows[loc + 1]) % M
        C = _cumsum_mod(term)
        gdoc = np.repeat(np.arange(ndoc), lens)
        gram_ok = loc <= np.repeat(lens, lens) - k
        gpos = np.nonzero(gram_ok)[0]
        gh = (tabs.pows[loc[gpos] + k]
              * ((C[gpos + k] + M - C[gpos]) % M)) % M
        cut = gh % np.uint64(div) == 0
        bdoc = gdoc[gpos][cut]                     # doc of each cut
        bpos = loc[gpos][cut] + k                  # local cut position
        # forced end-of-doc cut, then distinct (doc, pos) ascending
        bdoc = np.concatenate([bdoc, np.arange(ndoc)])
        bpos = np.concatenate([bpos, lens])
        key = np.unique(bdoc.astype(np.uint64) << np.uint64(32) | 
                        bpos.astype(np.uint64))
        bdoc = (key >> np.uint64(32)).astype(np.int64)
        bpos = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        first = np.concatenate([[True], bdoc[1:] != bdoc[:-1]])
        a = np.where(first, 0, np.concatenate([[0], bpos[:-1]]))
        ga = off[bdoc] + a
        gb = off[bdoc] + bpos
        fp = (tabs.pows[bpos] * ((C[gb] + M - C[ga]) % M)) % M
        return pa.table({"fp": pa.array(fp.astype(np.int64), pa.int64()),
                         "len": pa.array(bpos - a, pa.int64())})

    chunks = ds.select_columns([id_col, col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)
    # one hash-partitioned shuffle: occurrence count per distinct chunk
    # (high-cardinality keys -> the bucketed agg, see grouped_agg_hash)
    from ..relational import grouped_agg_hash
    per_chunk = grouped_agg_hash(chunks, ["fp", "len"], count=True)

    def ledger(t: pa.Table) -> pa.Table:
        ln = t.column("len").to_numpy()
        n = t.column("n").to_numpy()
        sc = ln % 8
        out = pd.DataFrame({"sc": sc, "n": n, "bt": n * ln, "bd": ln}) \
            .groupby("sc", as_index=False) \
            .agg(n_chunks=("n", "sum"), n_distinct=("n", "size"),
                 bytes_total=("bt", "sum"), bytes_distinct=("bd", "sum"))
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = per_chunk.map_batches(ledger, batch_format="pyarrow")
    return grouped_agg(partial, ["sc"], count=False,
                       sum_cols=["n_chunks", "n_distinct", "bytes_total",
                                 "bytes_distinct"])


# simplified American Soundex digit per letter a..z (h/w rule omitted —
# the oracle applies the identical simplification)
_SOUNDEX_DIGITS = "01230120022455012623010202"


def soundex_codes(words: list[str]) -> np.ndarray:
    """Simplified Soundex for a batch of lowercase ascii words, fully
    vectorized: one flat code-point pass maps letters to digits,
    adjacent equal digits collapse with one shift-compare, zeros drop,
    and the code assembles as FIRST LETTER + first three surviving
    digits (zero-padded). The h/w separator rule of full American
    Soundex is intentionally omitted — documented, and mirrored
    exactly by the SQL oracle (q249)."""
    lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                       count=len(words))
    if len(words) == 0 or lens.sum() == 0:
        return np.array([w[:1].upper() + "000" for w in words])
    cp = np.frombuffer("".join(words).encode("utf-32-le"),
                       dtype=np.uint32).astype(np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    loc = np.arange(len(cp)) - np.repeat(off[:-1], lens)
    lut = np.frombuffer(_SOUNDEX_DIGITS.encode(), dtype=np.uint8) - 48
    d = lut[np.clip(cp - 97, 0, 25)]
    wid = np.repeat(np.arange(len(words)), lens)
    # collapse runs: keep where first-of-word or digit != previous
    keep = (loc == 0) | (d != np.concatenate([[255], d[:-1]])) \
        | (wid != np.concatenate([[-1], wid[:-1]]))
    # drop the first letter's own digit slot and zeros
    keep &= (loc > 0) & (d > 0)
    kw = wid[keep]
    kd = d[keep]
    # rank of each kept digit within its word
    rank = np.arange(len(kw)) - np.concatenate(
        [[0], np.cumsum(np.bincount(kw, minlength=len(words)))])[kw]
    out = np.full((len(words), 3), 0, np.int64)
    sel = rank < 3
    out[kw[sel], rank[sel]] = kd[sel]
    first = np.array([w[:1].upper() or "0" for w in words])
    return np.char.add(first, np.char.add(np.char.add(
        out[:, 0].astype("U1"), out[:, 1].astype("U1")),
        out[:, 2].astype("U1")))


def soundex_buckets(ds: ray.data.Dataset, col: str,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Phonetic blocking (the classic entity-resolution candidate
    pass): Soundex-code the LAST word of ``col``, bucket distinct
    words by code, and report each bucket's fuzzy-match candidate
    yield — distinct words, total rows, candidate pairs C(n,2).
    Map side emits slim (code, word) rows; one hash-partitioned
    dedup+count shuffle. Returns (code, n_words, n_rows, n_pairs)."""
    from ..relational import grouped_agg, grouped_apply_bucketed

    def explode(t: pa.Table) -> pa.Table:
        names = t.column(col).to_pylist()
        words = [n.rsplit(None, 1)[-1].lower() if n else "" for n in names]
        return pa.table({"code": pa.array(soundex_codes(words)),
                         "word": pa.array(words)})

    rows = ds.select_columns([col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)
    per_word = grouped_agg(rows, ["code", "word"], count=True)

    def per_code(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("code", as_index=False).agg(
            n_words=("word", "size"), n_rows=("n", "sum"))
        out["n_pairs"] = (out["n_words"] * (out["n_words"] - 1) // 2) \
            .astype("int64")
        out["n_words"] = out["n_words"].astype("int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        return out

    return grouped_apply_bucketed(per_word, ["code"], per_code,
                                  num_buckets=num_buckets,
                                  whole_bucket=True)


def _distinct_gram_rows(ds: ray.data.Dataset, col: str, id_col: str,
                        k: int) -> ray.data.Dataset:
    """Distinct (gram hash, doc) slim rows for every full character
    k-gram — ONE flat modular prefix sum per batch (the winnowing
    machinery), one np.unique for the per-doc distinct."""
    M = np.uint64(WINNOW_MOD)

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                           count=len(texts))
        keep = lens >= k
        texts = [s for s, kp in zip(texts, keep) if kp]
        ids = ids[keep]
        lens = lens[keep]
        if len(texts) == 0:
            return pa.table({"gh": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                           dtype=np.uint32).astype(np.uint64)
        off = np.concatenate([[0], np.cumsum(lens)])
        loc = np.arange(len(cp), dtype=np.int64) - np.repeat(off[:-1],
                                                             lens)
        tabs = _pow_tables(int(lens.max()) + k + 1)
        term = (cp * tabs.ipows[loc + 1]) % M
        C = _cumsum_mod(term)
        gdoc = np.repeat(np.arange(len(texts)), lens)
        gpos = np.nonzero(loc <= np.repeat(lens, lens) - k)[0]
        gh = (tabs.pows[loc[gpos] + k]
              * ((C[gpos + k] + M - C[gpos]) % M)) % M
        combo = np.unique(gdoc[gpos].astype(np.uint64) << np.uint64(31)
                          | gh)
        return pa.table({
            "gh": pa.array((combo & np.uint64(0x7FFFFFFF))
                           .astype(np.int64), pa.int64()),
            id_col: pa.array(ids[(combo >> np.uint64(31))
                                 .astype(np.int64)], pa.int64())})

    return ds.select_columns([id_col, col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)


def shared_ngram_pairs(ds: ray.data.Dataset, col: str = "text",
                       id_col: str = "doc_id", k: int = 12,
                       min_shared: int = 20,
                       max_postings: int = 256) -> ray.data.Dataset:
    """Exact shared-k-gram near-dup candidates (the ExactSubstr dedup
    candidate pass): pairs of docs sharing at least ``min_shared``
    DISTINCT character k-grams, with the shared count as evidence.
    Unlike q42's winnowing (which SAMPLES grams), every full k-gram
    counts — the guarantee is exact at gram granularity (gram identity
    is the q42 polynomial hash; the oracle computes the same
    polynomial, so parity is exact by construction).

    Map side: distinct (gram hash, doc) slim rows from ONE flat
    modular prefix sum per batch; one groupby-on-hash shuffle forms
    posting lists; pairs per gram (lists > ``max_postings`` = global
    boilerplate, dropped — mirrored by a fixture bound, asserted in
    the driver query) combine in a second slim count shuffle."""
    from ..relational import grouped_agg, grouped_apply_bucketed

    exploded = _distinct_gram_rows(ds, col, id_col, k)

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """All posting-list pairs of the whole bucket in max-posting
        vectorized gap waves — with ~10⁵ tiny gram groups a per-group
        dispatch dominates; here each wave is one shifted equality
        compare across every group at once."""
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["gh", id_col], kind="mergesort",
                          ignore_index=True)
        kk = g["gh"].to_numpy()
        ii = g[id_col].to_numpy()
        _, starts, cnt = np.unique(kk, return_index=True,
                                   return_counts=True)
        hot = np.repeat(cnt > max_postings, cnt)
        if hot.any():
            kk, ii = kk[~hot], ii[~hot]
            cnt = cnt[cnt <= max_postings]
        if len(kk) < 2 or len(cnt) == 0:
            return empty
        la, lb = [], []
        for gap in range(1, int(cnt.max())):
            m = np.nonzero(kk[:-gap] == kk[gap:])[0]
            if len(m) == 0:
                break
            la.append(ii[m])
            lb.append(ii[m + gap])
        if not la:
            return empty
        # (doc, gh) rows are distinct and sorted, so id_a < id_b holds
        return pd.DataFrame({"id_a": np.concatenate(la),
                             "id_b": np.concatenate(lb)})

    pairs = grouped_apply_bucketed(exploded, ["gh"], pairs_bucket,
                                   whole_bucket=True)
    from ..relational import grouped_agg_hash
    counted = grouped_agg_hash(pairs, ["id_a", "id_b"], count=True)

    def thresh(t: pa.Table) -> pa.Table:
        # rename inline — Dataset.rename_columns needs the schema,
        # which EXECUTES the whole plan a second time
        t = t.filter(pc.greater_equal(t["n"],
                                      pa.scalar(min_shared, pa.int64())))
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "shared": t["n"]})

    return counted.map_batches(thresh, batch_format="pyarrow")


def sequence_packing(ds: ray.data.Dataset, key: str, order: str,
                     tokens: str, capacity: int,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Greedy sequential context-window packing (the LLM training
    batcher): docs stream per key in ``order`` and fill bins of
    ``capacity`` tokens — a doc that would overflow the running bin
    opens the next one; docs longer than the capacity get a bin of
    their own. Deterministic and shuffle-light: ONE keyed shuffle,
    then the carry recurrence (fill' = fill+t if it fits else t) runs
    as one lockstep vectorized wave per sequence index across every
    key in the bucket (the integer_ema shape — never a per-key Python
    loop). Returns (key, order, n_tokens, bin_id) with bin_id dense
    from 0 per key."""
    def per(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 order: pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "bin_id": pd.Series(dtype="int64")})
        g = g.sort_values([key, order], kind="mergesort",
                          ignore_index=True)
        kv = g[key].to_numpy()
        ov = g[order].to_numpy(np.int64)
        tv = g[tokens].to_numpy(np.int64)
        n = len(g)
        starts = np.concatenate([[0],
                                 np.nonzero(kv[1:] != kv[:-1])[0] + 1])
        sizes = np.diff(np.append(starts, n))
        G, L = len(starts), int(sizes.max())
        pos = np.arange(n) - np.repeat(starts, sizes)
        gi = np.repeat(np.arange(G), sizes)
        t = np.zeros((G, L), np.int64)
        t[gi, pos] = tv
        alive = np.zeros((G, L), bool)
        alive[gi, pos] = True
        fill = t[:, 0].copy()
        bid = np.zeros((G, L), np.int64)
        cur = np.zeros(G, np.int64)
        for i in range(1, L):
            fits = fill + t[:, i] <= capacity
            nf = np.where(fits, fill + t[:, i], t[:, i])
            cur = np.where(alive[:, i] & ~fits, cur + 1, cur)
            fill = np.where(alive[:, i], nf, fill)
            bid[:, i] = cur
        return pd.DataFrame({key: kv, order: ov,
                             "n_tokens": tv,
                             "bin_id": bid[gi, pos].astype("int64")})

    from ..relational import grouped_apply_bucketed
    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def containment_pairs(ds: ray.data.Dataset, col: str = "text",
                      id_col: str = "doc_id", k: int = 12,
                      tau_num: int = 1, tau_den: int = 2,
                      max_postings: int = 256) -> ray.data.Dataset:
    """Asymmetric containment near-dup candidates (superset/quote
    detection — the dedup rule Jaccard misses when one doc embeds
    another): ordered pairs (a, b) where |grams(a) ∩ grams(b)| ≥
    (tau_num/tau_den)·|grams(a)|, compared cross-multiplied so no
    float enters. Same slim shuffles as shared_ngram_pairs plus one
    co-shuffle of (doc, gram count) partials against the pair stream
    keyed by the CONTAINED side. Emits both directions when both
    clear their own threshold. Returns (id_a, id_b, shared, n_a)
    with id_a the contained side."""
    from ..relational import grouped_agg_hash, grouped_apply_bucketed

    exploded = _distinct_gram_rows(ds, col, id_col, k)
    ngrams = grouped_agg_hash(exploded.select_columns([id_col]),
                              [id_col], count=True)

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["gh", id_col], kind="mergesort",
                          ignore_index=True)
        kk = g["gh"].to_numpy()
        ii = g[id_col].to_numpy()
        _, cnt = np.unique(kk, return_counts=True)
        hot = np.repeat(cnt > max_postings, cnt)
        if hot.any():
            kk, ii = kk[~hot], ii[~hot]
            cnt = cnt[cnt <= max_postings]
        if len(kk) < 2 or len(cnt) == 0:
            return empty
        la, lb = [], []
        for gap in range(1, int(cnt.max())):
            m = np.nonzero(kk[:-gap] == kk[gap:])[0]
            if len(m) == 0:
                break
            la.append(ii[m])
            lb.append(ii[m + gap])
        if not la:
            return empty
        a = np.concatenate(la)
        b = np.concatenate(lb)
        # ordered both ways: containment is asymmetric
        return pd.DataFrame({"id_a": np.concatenate([a, b]),
                             "id_b": np.concatenate([b, a])})

    pairs = grouped_apply_bucketed(exploded, ["gh"], pairs_bucket,
                                   whole_bucket=True)
    counted = grouped_agg_hash(pairs, ["id_a", "id_b"], count=True)

    # co-shuffle the contained side's gram count with the pair stream
    def tag_cnt(t: pa.Table) -> pa.Table:
        return pa.table({"id_a": t[id_col],
                         "id_b": pa.nulls(t.num_rows, pa.int64()),
                         "n": pa.nulls(t.num_rows, pa.int64()),
                         "n_a": t["n"]})

    def tag_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "n": t["n"],
                         "n_a": pa.nulls(t.num_rows, pa.int64())})

    both = counted.map_batches(tag_pairs, batch_format="pyarrow") \
        .union(ngrams.map_batches(tag_cnt, batch_format="pyarrow"))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        cnts = g[g["n_a"].notna()].set_index("id_a")["n_a"]
        p = g[g["n_a"].isna()]
        if len(p) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "shared": pd.Series([], dtype="int64"),
                                 "n_a": pd.Series([], dtype="int64")})
        na = p["id_a"].map(cnts).to_numpy()
        sh = p["n"].to_numpy(np.int64)
        keep = tau_den * sh >= tau_num * na
        out = pd.DataFrame({"id_a": p["id_a"].to_numpy()[keep]
                            .astype("int64"),
                            "id_b": p["id_b"].to_numpy()[keep]
                            .astype("int64"),
                            "shared": sh[keep],
                            "n_a": na[keep].astype("int64")})
        return out

    return grouped_apply_bucketed(both, ["id_a"], resolve,
                                  whole_bucket=True)


def vocab_growth(ds: ray.data.Dataset, thresholds: list[int],
                 col: str = "text", id_col: str = "doc_id",
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Heaps'-law vocabulary growth curve: for each doc-id threshold T,
    the number of distinct tokens whose FIRST occurrence (minimum doc
    id) is below T — i.e. the vocabulary size after ingesting the
    first T documents in id order. The curve is the standard corpus
    diagnostic for deciding when a crawl stops contributing new
    vocabulary.

    Scale: per-batch (token, min id) Arrow partials collapse each
    batch to its distinct tokens before the ONE keyed exchange
    (``grouped_agg_hash`` min — hash-bucketed, high-cardinality-safe);
    the curve itself is a ≤|thresholds|-row partial per batch summed
    in a tiny final groupby. Empty tokens are excluded (DuckDB
    ``string_split`` parity)."""
    from .. import relational as rel

    def partial(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, np.diff(off))
        keep = words != ""  # elementwise on the object array, no loop
        f = pd.DataFrame({"tok": words[keep], "first_doc": doc[keep]})
        g = f.groupby("tok", sort=False, as_index=False)["first_doc"].min()
        return pa.table({"tok": pa.array(g["tok"], pa.string()),
                         "first_doc": pa.array(g["first_doc"], pa.int64())})

    firsts = rel.grouped_agg_hash(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["tok"], min_cols=["first_doc"], count=False,
        num_buckets=num_buckets)
    ts = np.asarray(sorted(thresholds), dtype=np.int64)

    def curve(t: pa.Table) -> pa.Table:
        fd = t["min_first_doc"].to_numpy(zero_copy_only=False)
        vocab = (fd[None, :] < ts[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"n_docs": pa.array(ts, pa.int64()),
                         "vocab": pa.array(vocab, pa.int64())})

    return rel.grouped_agg(
        firsts.map_batches(curve, batch_format="pyarrow"),
        ["n_docs"], sum_cols=["vocab"], count=False)


def phrase_counts(ds: ray.data.Dataset, first: str, second: str,
                  col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact two-token phrase frequency per document: the number of
    positions p with token[p] == first and token[p+1] == second inside
    the same document — the positional-index phrase query (retrieval's
    "adjacent terms" operator) computed scan-side without building the
    index. Emits only matching docs (doc_id, n_phrase).

    Scale: map-only — two Arrow equality kernels over the flat token
    array, one cumsum, and an offsets gather; never a shuffle, never a
    per-row loop. The cross-document boundary (last token of doc j vs
    first of doc j+1) is excluded by evaluating the cumulative count
    on [start, end-1) per document."""
    from ..pipelines.mining import _tokens_flat

    def f(t: pa.Table) -> pa.Table:
        vals, offs = _tokens_flat(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(vals)
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_phrase": pa.array([], pa.int64())})
        m1 = pc.equal(vals, first).to_numpy(zero_copy_only=False)
        m2 = pc.equal(vals, second).to_numpy(zero_copy_only=False)
        adj = np.zeros(n, dtype=np.int64)
        adj[:-1] = (m1[:-1] & m2[1:]).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(adj)))
        o = offs - offs[0]
        end = np.maximum(o[1:] - 1, o[:-1])  # [start, end-1): empty-safe
        cnt = cs[end] - cs[o[:-1]]
        keep = cnt > 0
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_phrase": pa.array(cnt[keep], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def trigram_lm(ds: ray.data.Dataset, col: str = "text",
               min_n: int = 3, num_buckets: int = 64) -> ray.data.Dataset:
    """Trigram language-model MLE table: for every bigram context
    (w1, w2), the most frequent next token w3 (ties broken
    lexicographically) among contexts seen at least ``min_n`` times —
    the count-based next-token predictor used to QA corpora before
    training (degenerate contexts signal boilerplate).

    Scale: per-batch triple-count partials (pandas C groupby) collapse
    each batch before ONE hash-bucket shuffle keyed on the CONTEXT
    (w1, w2) — w3 rides as a payload column, so every row of a context
    co-locates and the per-context sum + argmax is a whole-bucket
    vectorized sort + drop_duplicates, never a per-group UDF."""
    from .. import relational as rel

    def triples(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        n = len(words)
        if n < 3:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "w3": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        valid = np.ones(n - 2, dtype=bool)
        ends = off - off[0]
        for d in (1, 2):  # starts whose triple crosses a doc boundary
            bad = ends[1:] - d
            bad = bad[(bad >= 0) & (bad < n - 2)]
            valid[bad] = False
        idx = np.flatnonzero(valid)
        f = pd.DataFrame({"w1": words[idx], "w2": words[idx + 1],
                          "w3": words[idx + 2]})
        g = f.groupby(["w1", "w2", "w3"], sort=False).size()
        g = g.reset_index(name="c")
        return pa.table({"w1": pa.array(g["w1"], pa.string()),
                         "w2": pa.array(g["w2"], pa.string()),
                         "w3": pa.array(g["w3"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(), pa.int64())})

    counts = ds.map_batches(triples, batch_format="pyarrow",
                            zero_copy_batch=True)

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["w1", "w2", "w3"], sort=False, as_index=False)["c"].sum()
        s = s[s["c"] >= min_n]
        s = s.sort_values(["w1", "w2", "c", "w3"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        s = s.drop_duplicates(["w1", "w2"], keep="first")
        return s.rename(columns={"c": "n"})

    # shuffle on the CONTEXT so each (w1, w2) lands whole in one bucket
    return rel.grouped_apply_bucketed(counts, ["w1", "w2"], argmax,
                                      num_buckets=num_buckets,
                                      whole_bucket=True)


def chunk_ledger(ds: ray.data.Dataset, window: int = 32, stride: int = 24,
                 col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """RAG-style context-window chunking ledger: split each document's
    token stream into windows of ``window`` tokens advancing by
    ``stride`` (overlap = window - stride), and emit per chunk its
    index, token count, and first/last token — the metadata a
    retrieval indexer stores per chunk without materializing chunk
    text. Map-only: lengths from the split offsets, one gather per
    boundary column; chunks never shuffle."""

    def f(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        nch = np.where(lens > 0, (np.maximum(lens - 1, 0)) // stride + 1, 0)
        doc_i = np.repeat(np.arange(len(ids)), nch)
        # chunk index within each doc: global arange minus each doc's base
        base = np.concatenate([[0], np.cumsum(nch)[:-1]])
        ci = np.arange(int(nch.sum()), dtype=np.int64) - np.repeat(base, nch)
        start = ci * stride
        end = np.minimum(start + window, lens[doc_i])
        o0 = (off - off[0])[doc_i]
        return pa.table({
            "doc_id": pa.array(ids[doc_i], pa.int64()),
            "chunk_idx": pa.array(ci, pa.int64()),
            "n_tokens": pa.array(end - start, pa.int64()),
            "first_tok": pa.array(words[o0 + start], pa.string()),
            "last_tok": pa.array(words[o0 + end - 1], pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ttr_scores(ds: ray.data.Dataset, col: str = "text",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Type-token ratio partials per document: distinct-token count
    (types) and total token count — the lexical-diversity screen
    (near-1 ratios flag word-salad, near-0 flag repetition). Emitted
    as exact integer numerator/denominator. Map-only (a document
    never spans batches); empty tokens excluded (string_split
    parity)."""

    def f(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, np.diff(off))
        keep = words != ""
        f2 = pd.DataFrame({"doc_id": doc[keep], "tok": words[keep]})
        g = f2.groupby("doc_id", sort=False)["tok"].agg(["nunique", "size"])
        g = g.reset_index()
        return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                         "n_types": pa.array(g["nunique"].to_numpy(), pa.int64()),
                         "n_tokens": pa.array(g["size"].to_numpy(), pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def repeated_ngram_max(ds: ray.data.Dataset, ns: tuple = (1, 2, 4, 8),
                       col: str = "text",
                       id_col: str = "doc_id") -> ray.data.Dataset:
    """Boilerplate screen: for each document, the largest tested n
    such that some token n-gram occurs at least twice (0 when even no
    single token repeats) — repeated long n-grams are the classic
    template/boilerplate signal in web corpora (the detector behind
    'remove docs whose 8-gram repeats').

    Exact and vectorized: tokens factorize to int codes once per
    batch; for each n, candidate windows sort with ONE batch-wide
    lexsort (doc id + the n shifted code columns) and adjacent equal
    rows mark their document — no hashing, so no collision caveat.
    Map-only (documents never span batches)."""

    def f(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, _u = pd.factorize(words)
        codes = codes.astype(np.int64)
        doc = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(off))
        N = len(codes)
        best = np.zeros(len(ids), np.int64)
        for n in sorted(ns):
            if N < n:
                break
            m = N - n + 1
            valid = doc[:m] == doc[n - 1:]
            w = np.flatnonzero(valid)
            if len(w) < 2:
                continue
            keys = [codes[w + j] for j in range(n - 1, -1, -1)] + [doc[w]]
            order = np.lexsort(keys)  # primary = doc, then code cols
            ws = w[order]
            eq = doc[ws[1:]] == doc[ws[:-1]]
            for j in range(n):
                eq &= codes[ws[1:] + j] == codes[ws[:-1] + j]
            hit = np.unique(doc[ws[1:][eq]])
            best[hit] = n  # ns ascending: later (larger) n overwrites
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "max_rep": pa.array(best, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _lev_le2(a: str, b: str) -> int:
    """Exact Levenshtein distance when known ≤ 2, else 3 — banded DP
    with band half-width 2 (O(5·L)); strings here are short distinct
    vocabulary entries, not corpus rows."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 2:
        return 3
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [3] * lb
        lo, hi = max(1, i - 2), min(lb, i + 2)
        for j in range(lo, hi + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb] if prev[lb] <= 2 else 3


def edit2_pairs(ds: ray.data.Dataset, col: str = "s",
                num_buckets: int = 64) -> ray.data.Dataset:
    """Exact edit-distance-≤2 pairs over a DISTINCT string column —
    ``edit1_pairs`` widened one ring: symmetric-delete neighborhoods
    of up to TWO deletions (the SymSpell d=2 candidate map). Two
    strings within two edits always share a ≤2-deletion variant, so
    candidates are still a hash join on variants; every candidate pair
    verifies with a banded ≤2 DP. Neighborhood size is 1 + |s| +
    C(|s|,2) per DISTINCT value — vocabulary-sized, the documented
    trade for never scanning all pairs.

    Output: (s_a, s_b, dist:int64), s_a < s_b, 1 ≤ dist ≤ 2."""
    from .. import relational as rel

    def variants(t: pa.Table) -> pa.Table:
        out_v, out_s = [], []
        for s in t.column(col).to_pylist():
            seen = {s}
            d1 = set()
            for i in range(len(s)):
                d1.add(s[:i] + s[i + 1:])
            seen |= d1
            for v in d1:
                for i in range(len(v)):
                    seen.add(v[:i] + v[i + 1:])
            out_v.extend(seen)
            out_s.extend([s] * len(seen))
        return pa.table({"__v": pa.array(out_v, pa.string()),
                         col: pa.array(out_s, pa.string())})

    cand = ds.select_columns([col]).map_batches(
        variants, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        strs = g[col].to_numpy()
        if len(strs) < 2:
            return pd.DataFrame({"s_a": pd.Series(dtype="object"),
                                 "s_b": pd.Series(dtype="object")})
        strs = np.unique(strs)
        iu, ju = np.triu_indices(len(strs), k=1)
        return pd.DataFrame({"s_a": strs[iu], "s_b": strs[ju]})

    cand_pairs = rel.grouped_apply_bucketed(cand, ["__v"], pairs,
                                            num_buckets=num_buckets,
                                            min_group_size=2)
    uniq = rel.distinct(cand_pairs, ["s_a", "s_b"])

    def verify(t: pa.Table) -> pa.Table:
        sa = t.column("s_a").to_pylist()
        sb = t.column("s_b").to_pylist()
        d = np.array([_lev_le2(a, b) for a, b in zip(sa, sb)],
                     dtype=np.int64)
        keep = (d >= 1) & (d <= 2)
        return pa.table({
            "s_a": pa.array([s for s, k in zip(sa, keep) if k], pa.string()),
            "s_b": pa.array([s for s, k in zip(sb, keep) if k], pa.string()),
            "dist": pa.array(d[keep], pa.int64())})

    return uniq.map_batches(verify, batch_format="pyarrow",
                            zero_copy_batch=True)


def feature_hash(ds: ray.data.Dataset, buckets: int = 64,
                 col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Hashing-trick featurization (the vocabulary-free vectorizer):
    every token occurrence lands in bucket md5_lower(tok) % buckets
    with sign ± from the next hash bit, accumulated per document —
    emits the sparse nonzero (doc_id, bucket, v) triplets a linear
    model trains on. Exactly the DuckDB-md5 hash (oracle parity).

    Map-only: unique tokens hash once per batch, occurrences reduce
    with one flat bincount over doc*buckets + bucket."""

    def f(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = words != ""
        doc = np.repeat(np.arange(len(ids)), np.diff(off))[keep]
        w = words[keep]
        uniq, inv = np.unique(w, return_inverse=True)
        h = _md5_u64(uniq)
        bk = (h % np.uint64(buckets)).astype(np.int64)[inv]
        sg = np.where(((h // np.uint64(buckets)) % np.uint64(2)) == 0,
                      1, -1).astype(np.int64)[inv]
        flat = doc * buckets + bk
        v = np.bincount(flat, weights=sg,
                        minlength=len(ids) * buckets).astype(np.int64)
        nz = np.flatnonzero(v)
        return pa.table({
            "doc_id": pa.array(ids[nz // buckets], pa.int64()),
            "bucket": pa.array(nz % buckets, pa.int64()),
            "v": pa.array(v[nz], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def topic_scores(ds: ray.data.Dataset, n_topics: int = 4,
                 col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Broadcast linear-scorer "inference" stage: each token carries a
    deterministic per-topic weight w(tok, t) = (md5_lower(tok) // 7^t)
    % 5; a document's topic is the argmax of its summed occurrence
    weights (ties → smallest topic id). The shape of batched linear
    model scoring over a corpus — map-only, weights derived per unique
    token per batch (a real model would ``ray.put`` its matrix once).

    Emits (doc_id, topic, score) — exact integers."""

    def f(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = words != ""
        doc = np.repeat(np.arange(len(ids)), np.diff(off))[keep]
        w = words[keep]
        uniq, inv = np.unique(w, return_inverse=True)
        h = _md5_u64(uniq)
        scores = np.zeros((len(ids), n_topics), np.int64)
        for tt in range(n_topics):
            wt = ((h // np.uint64(7 ** tt)) % np.uint64(5)) \
                .astype(np.int64)[inv]
            scores[:, tt] = np.bincount(doc, weights=wt,
                                        minlength=len(ids))
        topic = scores.argmax(axis=1)  # first max = smallest topic id
        best = scores[np.arange(len(ids)), topic]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "topic": pa.array(topic, pa.int64()),
                         "score": pa.array(best, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def chunk_dedup(ds: ray.data.Dataset, window: int = 10,
                col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """C4/RefinedWeb-style corpus-level chunk dedup ledger: split every
    document into non-overlapping ``window``-token chunks and keep each
    distinct chunk STRING only at its first occurrence (minimal
    (doc_id, chunk_idx)); emit per document its total chunk count and
    how many of its chunks survive — the rewrite statistic a
    line/paragraph-dedup pass reports before materializing cleaned text.

    Scale shape: the shuffle moves (chunk, packed_position) pairs once
    — chunks are ≤ window tokens, and the winner reduction is a plain
    grouped MIN (partial per batch), so no doc text is replicated. The
    final per-doc rollups are two small grouped counts joined map-side.
    """
    PACK = np.int64(1 << 20)  # chunk_idx < 2^20 (docs are << 10M tokens)

    def chunks(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        nch = np.where(lens > 0, (lens + window - 1) // window, 0)
        doc_i = np.repeat(np.arange(len(ids)), nch)
        base = np.concatenate([[0], np.cumsum(nch)[:-1]])
        ci = np.arange(int(nch.sum()), dtype=np.int64) - np.repeat(base, nch)
        start = ci * window
        end = np.minimum(start + window, lens[doc_i])
        o0 = (off - off[0])[doc_i]
        txt = [" ".join(words[s:e])
               for s, e in zip((o0 + start).tolist(), (o0 + end).tolist())]
        return pa.table({
            id_col: pa.array(ids[doc_i], pa.int64()),
            "chunk_idx": pa.array(ci, pa.int64()),
            "chunk": pa.array(txt, pa.string()),
            "packed": pa.array(ids[doc_i] * PACK + ci, pa.int64())})

    from ..relational import grouped_agg, hash_join

    # materialize ONCE: winners and totals both consume the chunk rows;
    # without this the tokenize+chunk lineage re-executes per consumer.
    # Rows are slim (id, idx, chunk≤window tokens, packed) — object-store
    # resident and spillable at corpus scale.
    ch = ds.map_batches(chunks, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    # winner per distinct chunk string = minimal packed (doc, idx)
    winners = grouped_agg(ch.select_columns(["chunk", "packed"]),
                          ["chunk"], min_cols=["packed"], count=False)

    def kept_partial(t: pa.Table) -> pa.Table:
        d = (t.column("min_packed").to_numpy() // PACK).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({id_col: pa.array(u, pa.int64()),
                         "n_kept": pa.array(c, pa.int64())})

    kept = grouped_agg(winners.map_batches(kept_partial,
                                           batch_format="pyarrow"),
                       [id_col], sum_cols=["n_kept"], count=False)
    totals = grouped_agg(ch.select_columns([id_col]), [id_col])  # n rows
    tot = totals.map_batches(
        lambda t: t.rename_columns([id_col, "n_chunks"]),
        batch_format="pyarrow")
    joined = hash_join(tot, kept, id_col, how="left",
                       left_cols=[id_col, "n_chunks"],
                       right_cols=[id_col, "n_kept"])

    def fin(t: pa.Table) -> pa.Table:
        nk = t.column("n_kept").to_numpy(zero_copy_only=False)
        nk = np.where(pd.isna(nk), 0, nk).astype(np.int64)
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "n_chunks": t.column("n_chunks").cast(pa.int64()),
                         "n_kept": pa.array(nk, pa.int64())})

    return joined.map_batches(fin, batch_format="pyarrow")


def term_commonness(ds: ray.data.Dataset, col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Unigram-LM commonness score in exact integers: phase 1 computes
    corpus term frequencies (per-batch factorize+bincount partials, one
    vocabulary-sized grouped sum); phase 2 broadcasts the frequency
    table once (``ray.put``) and scores every document map-only with
    (n_tokens, Σ freq[token]) — the integer-exact core of the
    "common-token / perplexity" quality screens (rare-token-heavy docs
    score low). At open-vocabulary scale the broadcast side becomes a
    hash_join on token — the phase split is the same.
    """
    from ..relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        words, _ = _tokenize_batch(t, col)
        if not len(words):
            return pa.table({"w": pa.array([], pa.string()),
                             "f": pa.array([], pa.int64())})
        inv, uniq = pd.factorize(words, sort=False)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({"w": pa.array(uniq.astype(object), pa.string()),
                         "f": pa.array(cnt, pa.int64())})

    freq = grouped_agg(ds.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["w"], sum_cols=["f"], count=False).to_pandas()
    _vocab = freq["w"].to_numpy(dtype=object)
    _fvals = freq["f"].to_numpy(dtype=np.int64)
    _order = np.argsort(_vocab)
    fmap_ref = ray.put((_vocab[_order], _fvals[_order]))  # sorted once

    def score(t: pa.Table) -> pa.Table:
        vocab_s, fvals_s = ray.get(fmap_ref)
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        if len(words):
            pos = np.searchsorted(vocab_s, words)
            per_tok = fvals_s[pos]
            o = off - off[0]
            csum = np.concatenate([[0], np.cumsum(per_tok)])
            sums = csum[o[1:]] - csum[o[:-1]]
        else:
            sums = np.zeros(len(ids), np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(lens, pa.int64()),
                         "common_sum": pa.array(sums.astype(np.int64),
                                                pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def contamination_screen(ds: ray.data.Dataset, every: int = 50, n: int = 3,
                         col: str = "text",
                         id_col: str = "doc_id") -> ray.data.Dataset:
    """Benchmark-contamination screen: docs whose id is divisible by
    ``every`` form the held-out "benchmark"; every OTHER doc is flagged
    if it shares ≥1 distinct word-``n``-gram with any benchmark doc —
    the pre-training hygiene check (test-set leakage) run before a
    corpus ships. Gram convention matches q24/q254: single-space
    tokens, gram i = tokens[i:i+n] joined by spaces; a doc shorter than
    n tokens contributes its whole token list as one gram.

    Scale shape: the benchmark side is a small fraction (1/every) of
    the corpus, so its distinct-gram set broadcasts ONCE via ``ray.put``
    (sorted string array; membership by searchsorted) and the screen is
    map-only over the corpus — no pair join, unlike the intra-corpus
    q254 machinery. At benchmark sizes past broadcast, the same screen
    runs as a semi-join on gram (slim (gram, doc) rows).

    Emits (doc_id, n_shared, contaminated) for non-benchmark docs.
    """
    def _doc_grams(t: pa.Table):
        """Per-row list of distinct gram STRINGS (oracle-identical)."""
        words, off = _tokenize_batch(t, col)
        out = []
        for d in range(len(off) - 1):
            toks = words[off[d] - off[0]:off[d + 1] - off[0]]
            if len(toks) < n:
                out.append({" ".join(toks)} if len(toks) else set())
            else:
                out.append({" ".join(toks[i:i + n])
                            for i in range(len(toks) - n + 1)})
        return out

    def _is_bench(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % every == 0))

    bench = ds.map_batches(_is_bench, batch_format="pyarrow",
                           zero_copy_batch=True)

    @ray.remote(num_cpus=0.5)
    def _bench_grams(block: pa.Table) -> np.ndarray:
        if block.num_rows == 0 or col not in block.schema.names:
            return np.empty(0, dtype=object)
        gs: set = set()
        for s in _doc_grams(block):
            gs |= s
        return np.array(sorted(gs), dtype=object)

    parts = [p for p in ray.get([_bench_grams.remote(r) for r in
                                 bench.materialize().to_arrow_refs()])
             if len(p)]
    bench_sorted = np.unique(np.concatenate(parts)) if parts \
        else np.empty(0, dtype=object)
    ref = ray.put(bench_sorted)

    def screen(t: pa.Table) -> pa.Table:
        bg = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % every != 0
        grams = _doc_grams(t)
        n_shared = np.zeros(len(ids), np.int64)
        if len(bg):
            for d in np.nonzero(keep)[0]:
                g = np.array(sorted(grams[d]), dtype=object)
                if len(g):
                    pos = np.searchsorted(bg, g)
                    pos = np.minimum(pos, len(bg) - 1)
                    n_shared[d] = int((bg[pos] == g).sum())
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "n_shared": pa.array(n_shared[keep], pa.int64()),
            "contaminated": pa.array(n_shared[keep] >= 1, pa.bool_())})

    return ds.map_batches(screen, batch_format="pyarrow",
                          zero_copy_batch=True)


def mixture_sample(ds: ray.data.Dataset, quota_tokens: int = 600,
                   col: str = "text", id_col: str = "doc_id",
                   source_col: str = "source") -> ray.data.Dataset:
    """Pretraining mixture sampling: fill each source's TOKEN quota by
    selecting docs in deterministic md5(doc_id) order until the running
    token total crosses the quota (the doc that crosses is included) —
    the per-source weighting step (Pile/ROOTS-style mixtures) between
    curation and packing. Deterministic: same corpus → same sample, no
    RNG state to ship.

    Scale shape: the selection needs only slim (id, source, n_tokens,
    order) rows — one tokenize-free length pass (split offsets), one
    groupby-source shuffle of 24-byte rows, an in-group sort+cumsum.
    Per-source groups at 100 TB re-partition by order-range first
    (quota prefixes are order-prefix-closed), so no single task ever
    holds a whole source.

    Emits (doc_id, source, n_tokens, cum_tokens) for selected docs.
    """
    def slim(t: pa.Table) -> pa.Table:
        _, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        h = _md5_u64(np.array([str(int(i)) for i in ids], dtype=object))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            source_col: t.column(source_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "ord": pa.array((h % np.uint64(1_000_000)).astype(np.int64),
                            pa.int64())})

    from ..relational import grouped_apply_bucketed

    s = ds.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)

    def take(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ord", id_col], kind="stable")
        cum = g["n_tokens"].cumsum()
        keep = (cum - g["n_tokens"]) < quota_tokens
        out = g.loc[keep, [id_col, source_col, "n_tokens"]].copy()
        out["cum_tokens"] = cum[keep].astype(np.int64)
        return out

    return grouped_apply_bucketed(s, [source_col], take)


def editdist_pairs(ds: ray.data.Dataset, max_dist: int = 5,
                   prefix_chars: int = 60, col: str = "text",
                   id_col: str = "doc_id",
                   max_block: "int | None" = None) -> ray.data.Dataset:
    """Blocked edit-distance (Levenshtein) near-dup pairs over a string
    prefix — the record-linkage/title-dedup screen for short strings
    where token-set methods (Jaccard, minhash) miss transposition-level
    edits. Blocking rule (documented, oracle-identical): candidates
    share their FIRST TOKEN and differ in prefix length by ≤ max_dist
    (both necessary-ish for small distances in practice; the standard
    linkage assumption — a first-token edit escapes the block, like any
    blocking scheme's residual). Within a block the exact DP runs
    row-vectorized (one numpy row per DP iteration, all pairs of the
    block batched by the bucketed group-apply).

    Hot-block bound (VERDICT r4 finding 2): the shuffle key is
    (first-token, ⌊len/max_dist⌋ length band), NOT first token alone —
    a web corpus has first-token blocks like "the" with 10⁸ members,
    and |len(a)-len(b)| ≤ max_dist (necessary for dist ≤ max_dist)
    means candidates sit in the same or adjacent band, so banding the
    KEY splits hot blocks while dropping ZERO pairs. Each row lands in
    its own band and the next (two slim rows); a pair is emitted only
    from the block whose band equals max(band_a, band_b) — present in
    exactly one such block, so emission stays exactly-once with no
    dedup shuffle. ``max_block`` is the production-scale knob: when
    set, residual hot blocks (same first token AND same length band)
    beyond that many rows are dropped whole — the boilerplate cap à la
    winnowing's ``max_postings``; ~8192 is a sensible web-scale value.
    Default ``None`` = exact (no drops), so the output matches the
    uncapped SQL oracle at ANY data distribution — the cap must be an
    explicit opt-in precisely because the oracle has no counterpart
    for it (r5 review finding).

    Scale shape: only (id, prefix, first-token, band) slim rows
    shuffle — one groupby-block exchange; per-block pair work is
    bounded by ``max_block``². Emits (id_a, id_b, dist) with
    dist ≤ max_dist.
    """
    band_w = max(int(max_dist), 1)

    def slim(t: pa.Table) -> pa.Table:
        s = pc.utf8_slice_codeunits(t[col], 0, prefix_chars)
        words, off = _tokenize_batch(t, col)
        lens = np.diff(off)
        first = np.array([words[o - off[0]] if n > 0 else ""
                          for o, n in zip(off[:-1], lens)], dtype=object)
        bd = (np.asarray(pc.utf8_length(s), dtype=np.int64)
              // band_w)
        ids = t.column(id_col).cast(pa.int64())
        ft = pa.array(first, pa.string())

        def one(blk: np.ndarray) -> pa.Table:
            return pa.table({id_col: ids, "s": s, "ft": ft,
                             "bd": pa.array(bd, pa.int64()),
                             "blk": pa.array(blk, pa.int64())})
        # own band + next band: a (w, w+1) pair meets only in block
        # w+1 (replica a, original b)
        return pa.concat_tables([one(bd), one(bd + 1)])

    from ..relational import grouped_apply_bucketed

    slimmed = ds.map_batches(slim, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _lev_le(a: str, b: str, k: int) -> int:
        """Banded Levenshtein; returns dist if ≤ k else k+1."""
        la, lb = len(a), len(b)
        if abs(la - lb) > k:
            return k + 1
        prev = np.arange(lb + 1, dtype=np.int32)
        bv = np.frombuffer(b.encode("utf-8"), dtype=np.uint8) \
            if b.isascii() else None
        for i in range(1, la + 1):
            cur = np.empty(lb + 1, dtype=np.int32)
            cur[0] = i
            if bv is not None and a.isascii():
                cost = (bv != ord(a[i - 1])).astype(np.int32)
            else:
                cost = np.array([a[i - 1] != b[j] for j in range(lb)],
                                dtype=np.int32)
            # vectorized row: deletion / substitution elementwise;
            # insertion needs the running minimum — one short scan
            best = np.minimum(prev[:-1] + cost, prev[1:] + 1)
            run = cur[0]
            for j in range(1, lb + 1):
                run = min(int(best[j - 1]), run + 1)
                cur[j] = run
            if cur.min() > k:  # banded early exit
                return k + 1
            prev = cur
        return int(prev[-1])

    _EMPTY = {"id_a": pd.Series([], dtype=np.int64),
              "id_b": pd.Series([], dtype=np.int64),
              "dist": pd.Series([], dtype=np.int64)}

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or (max_block is not None and len(g) > max_block):
            # oversize blocks (same first token AND length band) are
            # boilerplate — dropped whole when the opt-in cap is set
            return pd.DataFrame(_EMPTY)
        blk = int(g["blk"].iloc[0])
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        bds = g["bd"].to_numpy()
        ss = g["s"].to_numpy(dtype=object)
        ls = np.array([len(x) for x in ss])
        # character-multiset lower bound: one edit changes the byte
        # histogram by L1 ≤ 2, so lev ≥ L1/2 — an O(n²·256) numpy
        # prefilter that spares ~95% of candidate pairs the DP
        # (ascii-only fast path; non-ascii rows fall through to DP)
        C = np.zeros((len(ss), 256), dtype=np.int16)
        ascii_ok = np.zeros(len(ss), dtype=bool)
        for i, x in enumerate(ss):
            if x.isascii():
                ascii_ok[i] = True
                bv = np.frombuffer(x.encode(), dtype=np.uint8)
                np.add.at(C[i], bv, 1)
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            rest = slice(i + 1, None)
            # all three prefilters vectorized (r5: the j-loop used to be
            # Python per candidate — 10⁶+ interpreter iterations per hot
            # block; now only DP survivors reach Python):
            # 1. exactly-once across the two blocks a pair can share —
            #    emit only where the block band == the pair's max band;
            # 2. length window (necessary for dist ≤ max_dist);
            # 3. byte-histogram lower bound (ascii rows only).
            keep = ((np.maximum(bds[i], bds[rest]) == blk)
                    & (np.abs(ls[i] - ls[rest]) <= max_dist))
            if ascii_ok[i]:
                l1 = np.abs(C[rest] - C[i]).sum(axis=1)
                keep &= ~(ascii_ok[rest] & (l1 > 2 * max_dist))
            for j in (np.nonzero(keep)[0] + i + 1):
                d = _lev_le(ss[i], ss[j], max_dist)
                if d <= max_dist:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_d.append(d)
        if not out_a:
            return pd.DataFrame(_EMPTY)
        return pd.DataFrame({"id_a": np.array(out_a, np.int64),
                             "id_b": np.array(out_b, np.int64),
                             "dist": np.array(out_d, np.int64)})

    return grouped_apply_bucketed(slimmed, ["ft", "blk"], pairs,
                                  min_group_size=2)


def exact_substr_pairs(ds: ray.data.Dataset, k: int = 8,
                       min_tokens: int = 12, col: str = "text",
                       id_col: str = "doc_id",
                       max_gram_docs: "int | None" = None) -> ray.data.Dataset:
    """ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): for every doc pair, the length of
    the LONGEST shared token substring, reported when ≥ ``min_tokens``
    — the variable-length sibling of the fixed-k q254 screen (a 50-token
    verbatim quote scores 50 here, not "shares many 12-grams").

    Mechanism (suffix arrays re-expressed as dataflow): positional
    k-gram anchors (rolling md5+splitmix hashes — the q254-established
    w.h.p.-injective gram identity) shuffle once on gram; cross-doc
    anchor matches emit slim (id_a, id_b, pa, diag=pa−pb) rows; a
    second keyed shuffle groups per pair, where maximal runs of
    consecutive pa on one diagonal are islands — run + k − 1 = shared
    substring length. No doc text ever replicates; both shuffles move
    16–32-byte rows; singleton-gram groups (almost all) drop
    vectorized before pairing.

    Scale knob: ``max_gram_docs`` drops gram-anchor groups seen in more
    than that many docs (boilerplate grams — "all rights reserved" —
    would otherwise pair quadratically; the dropped grams cost only
    recall on matches made ENTIRELY of boilerplate, since any
    distinctive flank re-anchors the diagonal). None = exact (the
    oracle-checked mode).

    Emits (id_a, id_b, max_shared_tokens)."""
    C = [np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
         np.uint64(0x165667B19E3779F9)]

    def grams_pos(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ndoc = len(off) - 1
        lens = off[1:] - off[:-1]
        doc_of = np.repeat(np.arange(ndoc), lens)
        W = len(words)
        if W < k:
            return pa.table({"h": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        inv, uniq = pd.factorize(words, sort=False)
        th = _md5_u64(np.asarray(uniq, dtype=object))[inv]
        g = np.zeros(W - k + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                g = splitmix64(g ^ (th[j:W - k + 1 + j] * C[j % 3]))
        p = np.arange(W - k + 1)
        valid = doc_of[p] == doc_of[p + k - 1]
        g, p = g[valid], p[valid]
        d = doc_of[p]
        pos = p - off[d] + off[0]
        return pa.table({"h": pa.array(g, pa.uint64()),
                         id_col: pa.array(ids[d], pa.int64()),
                         "pos": pa.array(pos.astype(np.int64), pa.int64())})

    from ..relational import grouped_apply_bucketed

    anchors = ds.map_batches(grams_pos, batch_format="pyarrow",
                             zero_copy_batch=True)

    _EMPTY_M = {"id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "pa": pd.Series([], dtype=np.int64),
                "diag": pd.Series([], dtype=np.int64)}

    def match(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        pos = g["pos"].to_numpy()
        uniq_docs = np.unique(ids)
        if len(uniq_docs) < 2:
            return pd.DataFrame(_EMPTY_M)
        if max_gram_docs is not None and len(uniq_docs) > max_gram_docs:
            return pd.DataFrame(_EMPTY_M)  # boilerplate gram — skip
        i, j = np.meshgrid(np.arange(len(ids)), np.arange(len(ids)),
                           indexing="ij")
        i, j = i.ravel(), j.ravel()
        keep = ids[i] < ids[j]
        i, j = i[keep], j[keep]
        return pd.DataFrame({
            "id_a": ids[i].astype(np.int64),
            "id_b": ids[j].astype(np.int64),
            "pa": pos[i].astype(np.int64),
            "diag": (pos[i] - pos[j]).astype(np.int64)})

    matches = grouped_apply_bucketed(anchors, ["h"], match,
                                     min_group_size=2)

    _EMPTY_O = {"id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "max_shared_tokens": pd.Series([], dtype=np.int64)}

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates(["diag", "pa"])
        diag = sub["diag"].to_numpy()
        pa_ = sub["pa"].to_numpy()
        order = np.lexsort((pa_, diag))
        diag, pa_ = diag[order], pa_[order]
        new_run = np.concatenate([[True], (diag[1:] != diag[:-1]) |
                                  (pa_[1:] != pa_[:-1] + 1)])
        run_id = np.cumsum(new_run)
        best = int(np.bincount(run_id).max()) + k - 1
        if best < min_tokens:
            return pd.DataFrame(_EMPTY_O)
        return pd.DataFrame({
            "id_a": np.array([int(g["id_a"].iloc[0])], np.int64),
            "id_b": np.array([int(g["id_b"].iloc[0])], np.int64),
            "max_shared_tokens": np.array([best], np.int64)})

    return grouped_apply_bucketed(matches, ["id_a", "id_b"], fold)


def repetition_stats(ds: ray.data.Dataset, col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """Gopher-style per-document repetition screens (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", Table A1 — the word-repetition family), over the
    single-space token stream: the signals a web-corpus curation run
    thresholds to drop boilerplate and keyword-stuffing spam before
    training. Integer-exact counts (no fractions cross the wire) so
    the SQL oracle is plain GROUP BYs:

    - ``n_words``      total tokens (duplicate-word fraction
                       = 1 − n_distinct/n_words downstream);
    - ``n_distinct``   distinct tokens;
    - ``top_bigram_n`` occurrences of the doc's most frequent word
                       bigram (0 when the doc has < 2 words) — the
                       "top n-gram fraction" screen's numerator.

    Scale shape: map-only — one tokenize pass per batch, factorized
    token codes, grouped counts inside the batch; no shuffle (a doc
    never spans batches: Ray's dynamic splitting slices the SOURCE
    rows, the same invariant the tf-idf rank stage relies on)."""

    _OUT = pa.schema([(id_col, pa.int64()), ("n_words", pa.int64()),
                      ("n_distinct", pa.int64()),
                      ("top_bigram_n", pa.int64())])

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        words, off = _tokenize_batch(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        n = len(ids)
        codes, _ = pd.factorize(words, sort=False)
        doc_of = np.repeat(np.arange(n), lens)
        dd = pd.DataFrame({"d": doc_of, "c": codes})
        nd = dd.drop_duplicates().groupby("d", sort=False).size()
        n_distinct = np.zeros(n, dtype=np.int64)
        n_distinct[nd.index.to_numpy()] = nd.to_numpy()
        top = np.zeros(n, dtype=np.int64)
        if len(codes) >= 2:
            same = doc_of[:-1] == doc_of[1:]
            if same.any():
                bg = pd.DataFrame({"d": doc_of[:-1][same],
                                   "c1": codes[:-1][same],
                                   "c2": codes[1:][same]})
                mx = (bg.groupby(["d", "c1", "c2"], sort=False).size()
                      .groupby(level=0).max())
                top[mx.index.to_numpy()] = mx.to_numpy()
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_words": pa.array(lens, pa.int64()),
                         "n_distinct": pa.array(n_distinct, pa.int64()),
                         "top_bigram_n": pa.array(top, pa.int64())},
                        schema=_OUT)

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def source_overlap(ds: ray.data.Dataset, n: int = 3, col: str = "text",
                   id_col: str = "doc_id",
                   source_col: str = "source") -> ray.data.Dataset:
    """Cross-source contamination audit: for every pair of sources, the
    number of DISTINCT word-n-grams present in both — the corpus-level
    overlap matrix a mixture designer reads before weighting sources
    (heavy overlap between a "web" and a "books" slice means the
    mixture double-counts that content). Gram identity is the
    established w.h.p.-injective md5+splitmix hash (q254/minhash), so
    distinct-hash counts equal distinct-string counts and the SQL
    oracle over literal gram strings matches.

    Scale shape: slim distinct (gram_hash, source) rows → ONE bucketed
    shuffle on gram → per-gram sorted source-pair emission (groups are
    |sources|-bounded, tiny) → a source-pair-keyed grouped count.
    Document text never moves; the matrix is |sources|² rows."""
    from ..relational import grouped_agg, grouped_apply_bucketed

    def explode(t: pa.Table) -> pa.Table:
        sets = _gram_hash_sets(t, col, n)
        srcs = np.asarray(t[source_col].to_pylist(), dtype=object)
        if not len(sets):
            return pa.table({"gram": pa.array([], pa.uint64()),
                             "source": pa.array([], pa.string())})
        grams = np.concatenate(sets)  # non-empty: early-returned above
        rep = np.repeat(srcs, [len(s) for s in sets])
        dd = pd.DataFrame({"gram": grams, "source": rep}).drop_duplicates()
        return pa.table({"gram": pa.array(dd["gram"].to_numpy(np.uint64),
                                          pa.uint64()),
                         "source": pa.array(dd["source"].to_numpy(object),
                                            pa.string())})

    exploded = ds.select_columns([id_col, col, source_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)

    _EMPTY = {"source_a": pd.Series([], dtype=object),
              "source_b": pd.Series([], dtype=object)}

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        srcs = np.unique(g["source"].to_numpy())
        if len(srcs) < 2:
            return pd.DataFrame(_EMPTY)
        iu, ju = np.triu_indices(len(srcs), k=1)
        return pd.DataFrame({"source_a": srcs[iu], "source_b": srcs[ju]})

    pairs = grouped_apply_bucketed(exploded, ["gram"], per_gram,
                                   min_group_size=2)
    counted = grouped_agg(pairs, ["source_a", "source_b"], count=True)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"source_a": t["source_a"],
                         "source_b": t["source_b"],
                         "shared_grams": t["n"].cast(pa.int64())})

    return counted.map_batches(finish, batch_format="pyarrow")


def truncation_dups(ds: ray.data.Dataset, k: int = 6, col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Prefix-truncation duplicate pairs: doc A is a truncated copy of
    doc B iff A's ENTIRE token sequence equals B's first len(A) tokens
    (strictly shorter) — the web-scrape artifact where one article is
    captured cut at different lengths, which fixed-k gram screens grade
    as "high overlap" but never as the containment it is. Both docs
    must have ≥ k tokens (the blocking rule needs a k-token head).

    Blocking: the first-k-token string — any truncation pair NECESSARILY
    shares it, so blocking drops no pairs; boilerplate heads ("all
    rights reserved …" openers) concentrate, which is the same residual
    any head-blocking scheme carries (cap by composing with
    ``editdist_pairs``-style banding if a corpus proves pathological).
    Verification is EXACT and hash-free: token-list prefix ⟺ string
    prefix + a space at the cut (text is the single-space token join),
    so only (id, n_tokens, text, head) rows shuffle and the in-group
    test is bytes startswith.

    Emits (id_short, id_long, n_tokens_short)."""
    def slim(t: pa.Table) -> pa.Table:
        words, off = _tokenize_batch(t, col)
        lens = np.diff(off)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = lens >= k
        heads = [" ".join(words[off[i]:off[i] + k])
                 for i in np.nonzero(keep)[0]]
        tt = t.filter(pa.array(keep))
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         "n_tokens": pa.array(lens[keep], pa.int64()),
                         "head": pa.array(heads, pa.string()),
                         "text": tt[col]})

    slimmed = ds.select_columns([id_col, col]).map_batches(
        slim, batch_format="pyarrow", zero_copy_batch=True)

    _EMPTY = {"id_short": pd.Series([], dtype=np.int64),
              "id_long": pd.Series([], dtype=np.int64),
              "n_tokens_short": pd.Series([], dtype=np.int64)}

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_EMPTY)
        g = g.sort_values(["n_tokens", id_col])
        ids = g[id_col].to_numpy(np.int64)
        nt = g["n_tokens"].to_numpy(np.int64)
        tx = g["text"].to_numpy(dtype=object)
        out_s, out_l, out_n = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if nt[j] <= nt[i]:
                    continue  # strict: equal-length dups are q20's job
                if tx[j].startswith(tx[i]) and \
                        tx[j][len(tx[i])] == " ":
                    out_s.append(int(ids[i]))
                    out_l.append(int(ids[j]))
                    out_n.append(int(nt[i]))
        if not out_s:
            return pd.DataFrame(_EMPTY)
        return pd.DataFrame({"id_short": np.array(out_s, np.int64),
                             "id_long": np.array(out_l, np.int64),
                             "n_tokens_short": np.array(out_n, np.int64)})

    from ..relational import grouped_apply_bucketed

    return grouped_apply_bucketed(slimmed, ["head"], pairs,
                                  min_group_size=2)
