"""pyoracle — single-threaded expected-result oracle for the non-SQL
operators (the `pyref` pattern extended to the training-data extensions).

The MinHash/SimHash/embedding near-dup keeps, the prep pipeline, the HLL
sketch, BPE token counts and the text-analysis heuristics are not
expressible in ANSI SQL, so round 1/2 shipped them as rows-only checks.
This module makes them driver-hash-checkable the same way `crawl_visits`
is: each queries() entry writes the expected table — computed here with
ZERO Ray, straight-line single-threaded orchestration re-derived from the
operator spec — to a fixed /tmp path, and oracle_sql() reads that path by
literal name in DuckDB. What the comparison then pins is exactly the part
that can silently break: the distributed machinery (banding shuffles,
bucket groupbys, broadcast drop filters, partial/merge plumbing, actor
row alignment).

Shared vs independent code (same philosophy as pyref vs the engine):
per-row primitives whose SEMANTICS are the pinned spec (signature/hash
functions, hyperplane constants, the trained BPE merge list, the textproc
batch kernels) are imported; everything the Ray engine distributes —
banding, candidate generation, verification, union-find, merge, filter
composition — is reimplemented here independently. The heuristics
(lang-id, quality score, fingerprint, BPE encode) are reimplemented
per-row from their documented formulas.

Ordering contract: a queries() callable overwrites its expected file for
its own sf_dir BEFORE returning, and `seed_defaults()` (invoked from
build_oracle_sql) pre-seeds every file from the driver's sf0.01 tables —
so the comparison is correct whichever side the driver runs first.

Float discipline: only `quality`, the HLL estimate and the PageRank
`rank` column are floats, and all are bit-identical by construction
(identical float64 operations in identical order on both sides; rank
additionally relies on the canonical (src, dst) edge sort both sides
apply before the shared pinned power iteration).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_VERSION = 1
ORACLE_DIR = f"/tmp/raycrawl_pyoracle_v{ORACLE_VERSION}"
# The driver's correctness scale; seed_defaults falls back down the list.
_SEED_SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.001")

_MINHASH_BANDS = 16
_MINHASH_ROWS = 4
_MINHASH_BUCKET_CAP = 200  # pinned engine cap (dedup._BUCKET_CAP)


def expected_path(name: str) -> str:
    return os.path.join(ORACLE_DIR, f"{name}.parquet")


def _write(name: str, tab: pa.Table) -> None:
    os.makedirs(ORACLE_DIR, exist_ok=True)
    tmp = expected_path(name) + ".tmp"
    pq.write_table(tab, tmp)
    os.replace(tmp, expected_path(name))


# ---------------------------------------------------------------------------
# shared small helpers (independent implementations)
# ---------------------------------------------------------------------------


def _union_find_drop(pairs) -> set[int]:
    """Independent union-find: drop every non-minimum id per connected
    component of the verified-pair graph (the keep rule of every near-dup
    operator). Distinct implementation from dedup._components_drop
    (explicit component sweep instead of in-place path halving)."""
    parent: dict[int, int] = {}

    def root(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        # full path compression on a second walk
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = root(a), root(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for x in parent:
        comps.setdefault(root(x), []).append(x)
    drop: set[int] = set()
    for r, members in comps.items():
        drop.update(m for m in members if m != min(members))
    return drop


def _docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


# ---------------------------------------------------------------------------
# near-dup dedup family
# ---------------------------------------------------------------------------


def dedup_minhash(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """Expected keep set for MinHash-LSH near-dup: per-doc 64-perm
    signatures (pinned primitive), 16x4 banding into dict buckets,
    id-sorted per-bucket candidate pairs under the pinned 200-id cap,
    signature-agreement verification, union-find keep-min."""
    from raycrawl.dedup import minhash_signature

    ids, texts = _docs(sf_dir)
    sigs = {i: minhash_signature(x or "") for i, x in zip(ids, texts)}
    buckets: dict[tuple, set[int]] = {}
    for i in ids:
        s = sigs[i]
        for b in range(_MINHASH_BANDS):
            key = (b, tuple(s[b * _MINHASH_ROWS : (b + 1) * _MINHASH_ROWS].tolist()))
            buckets.setdefault(key, set()).add(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)[:_MINHASH_BUCKET_CAP]
        for ii in range(len(ms)):
            for jj in range(ii + 1, len(ms)):
                cand.add((ms[ii], ms[jj]))
    verified = [
        (a, b) for a, b in sorted(cand)
        if float((sigs[a] == sigs[b]).mean()) >= threshold
    ]
    drop = _union_find_drop(verified)
    return pa.table({"doc_id": pa.array([i for i in ids if i not in drop], pa.int64())})


def dedup_jaccard(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """Expected keep set for true-Jaccard near-dup: the same minhash
    banding candidate generation (pinned signature primitive, dict
    buckets, 200-id cap), but verification compares the docs' exact
    word-3-gram shingle SETS (pinned ngram_jaccard measure)."""
    from raycrawl.dedup import minhash_signature, ngram_jaccard

    ids, texts = _docs(sf_dir)
    text_of = dict(zip(ids, texts))
    sigs = {i: minhash_signature(x or "") for i, x in zip(ids, texts)}
    buckets: dict[tuple, set[int]] = {}
    for i in ids:
        s = sigs[i]
        for b in range(_MINHASH_BANDS):
            key = (b, tuple(s[b * _MINHASH_ROWS : (b + 1) * _MINHASH_ROWS].tolist()))
            buckets.setdefault(key, set()).add(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)[:_MINHASH_BUCKET_CAP]
        for ii in range(len(ms)):
            for jj in range(ii + 1, len(ms)):
                cand.add((ms[ii], ms[jj]))
    verified = [
        (a, b) for a, b in sorted(cand)
        if ngram_jaccard(text_of[a] or "", text_of[b] or "") >= threshold
    ]
    drop = _union_find_drop(verified)
    return pa.table({"doc_id": pa.array([i for i in ids if i not in drop], pa.int64())})


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Expected keep set for SimHash near-dup: 4x16-bit pigeonhole bands,
    in-bucket true-hamming verification, union-find keep-min."""
    from raycrawl.dedup import simhash

    ids, texts = _docs(sf_dir)
    sh = {i: simhash(x or "") for i, x in zip(ids, texts)}
    buckets: dict[tuple[int, int], set[int]] = {}
    for i in ids:
        v = sh[i]
        for b in range(4):
            buckets.setdefault((b, (v >> (16 * b)) & 0xFFFF), set()).add(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for ii in range(len(ms)):
            for jj in range(ii + 1, len(ms)):
                cand.add((ms[ii], ms[jj]))
    verified = [
        (a, b) for a, b in sorted(cand)
        if bin(sh[a] ^ sh[b]).count("1") <= max_hamming
    ]
    drop = _union_find_drop(verified)
    return pa.table({"doc_id": pa.array([i for i in ids if i not in drop], pa.int64())})


def _embeddings(sf_dir: str):
    from raycrawl.similarity import _emb_matrix, _normalize

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return t["vec_id"].to_pylist(), _normalize(_emb_matrix(t))


def dedup_embedding(sf_dir: str, threshold: float = 0.97) -> pa.Table:
    """Expected keep set for brute-force embedding near-dup: full cosine
    matrix, all pairs >= threshold, union-find keep-min."""
    ids, m = _embeddings(sf_dir)
    s = m @ m.T
    iu, ju = np.triu_indices(len(ids), k=1)
    hit = s[iu, ju] >= threshold
    pairs = sorted(
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i, j in zip(iu[hit], ju[hit])
    )
    drop = _union_find_drop(pairs)
    return pa.table({"vec_id": pa.array([i for i in ids if i not in drop], pa.int64())})


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.97) -> pa.Table:
    """Expected keep set for the banded-hyperplane LSH near-dup scale
    path: sign-band dict buckets over the pinned hyperplane tables,
    in-bucket cosine verification, union-find keep-min."""
    from raycrawl.similarity import _BAND_PLANES, _NEARDUP_BANDS, _NEARDUP_BITS

    ids, m = _embeddings(sf_dir)
    buckets: dict[tuple[int, int], set[int]] = {}
    for b in range(_NEARDUP_BANDS):
        signs = (m @ _BAND_PLANES[b].T) > 0
        keys = (signs * (1 << np.arange(_NEARDUP_BITS))).sum(axis=1)
        for row, k in enumerate(keys):
            buckets.setdefault((b, int(k)), set()).add(row)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        rows = sorted(members, key=lambda r: ids[r])
        for ii in range(len(rows)):
            for jj in range(ii + 1, len(rows)):
                if float(m[rows[ii]] @ m[rows[jj]]) >= threshold:
                    cand.add((ids[rows[ii]], ids[rows[jj]]))
    drop = _union_find_drop(sorted(cand))
    return pa.table({"vec_id": pa.array([i for i in ids if i not in drop], pa.int64())})


# ---------------------------------------------------------------------------
# text-analysis heuristics (per-row formulas reimplemented from their spec)
# ---------------------------------------------------------------------------

_CJK = re.compile(r"[一-鿿぀-ヿ]")
_LETTERS = re.compile(r"[a-zà-ÿ]+")


def _lang_of(text: str) -> str:
    from raycrawl.textproc import _LANG_PROFILES  # pinned profile data

    if not text:
        return "und"
    sample = text[:2000]
    if len(_CJK.findall(sample)) >= max(2, len(sample) // 50):
        return "zh"
    words = set(_LETTERS.findall(sample.lower()))
    if not words:
        return "und"
    best, best_n = "und", 0
    for lang, prof in _LANG_PROFILES.items():  # pinned order; strict > tie rule
        n = len(words & prof)
        if n > best_n:
            best, best_n = lang, n
    return best if best_n >= 2 else "und"


def lang_id(sf_dir: str) -> pa.Table:
    ids, texts = _docs(sf_dir)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang_pred": pa.array([_lang_of(x or "") for x in texts], pa.string()),
        }
    )


def _quality_of(x: str) -> float:
    toks = x.split()
    if not toks:
        return 0.0
    mean_len = sum(len(w) for w in toks) / len(toks)
    len_score = min(1.0, len(toks) / 50.0)
    word_score = 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
    digits = sum(c.isdigit() for c in x)
    digit_score = max(0.0, 1.0 - 5.0 * digits / max(1, len(x)))
    return round(len_score * word_score * digit_score, 6)


def quality_score(sf_dir: str) -> pa.Table:
    ids, texts = _docs(sf_dir)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "quality": pa.array([_quality_of(x or "") for x in texts], pa.float64()),
        }
    )


def _fingerprint_of(text: str, window: int = 8) -> int:
    import hashlib

    toks = text.split()
    if not toks:
        return 0
    hs = [int.from_bytes(hashlib.sha1(w.encode()).digest()[:8], "big") for w in toks]
    if len(hs) <= window:
        acc = 0
        for h in hs:
            acc = (acc * 1099511628211 + h) % (1 << 64)
        return acc
    seen_mins = set()
    for i in range(len(hs) - window + 1):
        seen_mins.add(min(hs[i : i + window]))
    acc = 0
    for mval in seen_mins:
        acc ^= mval
    return acc


def doc_fingerprint(sf_dir: str) -> pa.Table:
    ids, texts = _docs(sf_dir)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "fingerprint": pa.array(
                [_fingerprint_of(x or "") for x in texts], pa.uint64()
            ),
        }
    )


_NONSPACE = re.compile(r"\S+")
_EOW = "</w>"


def _bpe_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Independent greedy BPE application: repeatedly merge the lowest-rank
    (leftmost on equal rank) adjacent pair."""
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return len(seq)


def token_count_bpe(sf_dir: str) -> pa.Table:
    """Expected BPE subword counts: the merge list is the pinned
    deterministic training output (shared); the encoder is reimplemented
    and applied word-cache-free in one pass."""
    from raycrawl.bpe import train_from_documents

    ranks = {tuple(mg): i for i, mg in enumerate(train_from_documents(sf_dir))}
    ids, texts = _docs(sf_dir)
    word_len: dict[str, int] = {}
    ns = []
    for x in texts:
        total = 0
        for w in _NONSPACE.findall((x or "").lower()):
            n = word_len.get(w)
            if n is None:
                n = word_len[w] = _bpe_len(w, ranks)
            total += n
        ns.append(total)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "n_tokens_bpe": pa.array(ns, pa.int64())}
    )


# ---------------------------------------------------------------------------
# approximate ANN (deterministic: same pruning spec, independent single-
# threaded candidate selection + full sort instead of per-batch partial
# top-k merge — pins the distributed partial/merge machinery)
# ---------------------------------------------------------------------------


def _topk_table(per_query: dict[int, list[tuple[float, int]]], k: int) -> pa.Table:
    out_q, out_r, out_n = [], [], []
    for q in sorted(per_query):
        ranked = sorted(per_query[q], key=lambda sn: (-sn[0], sn[1]))[:k]
        for rank, (_, n) in enumerate(ranked, start=1):
            out_q.append(q)
            out_r.append(rank)
            out_n.append(n)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
        }
    )


def ann_topk_lsh(
    sf_dir: str, k: int = 5, n_queries: int = 10, probes: int = 4
) -> pa.Table:
    """Expected LSH ANN result: hamming-probe candidate set over the
    pinned 16-bit hyperplane signature, exact cosine rerank, global sort
    by (-score, neighbor_id)."""
    from raycrawl.similarity import _bucket_of

    ids, m = _embeddings(sf_dir)
    vids = np.asarray(ids, dtype=np.int64)
    vb = _bucket_of(m)
    qmask = vids < n_queries
    per_query: dict[int, list[tuple[float, int]]] = {}
    for qi in np.flatnonzero(qmask):
        qid = int(vids[qi])
        ham = np.array([bin(int(v ^ vb[qi])).count("1") for v in vb])
        cand = np.flatnonzero((ham <= probes) & (vids != qid))
        per_query[qid] = [
            (float(m[c] @ m[qi]), int(vids[c])) for c in cand
        ]
    return _topk_table(per_query, k)


def ann_topk_ivf(
    sf_dir: str, k: int = 5, n_queries: int = 10,
    n_cells: int = 32, n_probe: int = 4, train_sample: int = 4096,
) -> pa.Table:
    """Expected IVF ANN result: the pinned k-means centroids (same
    deterministic training sample + algorithm), probe-cell pruning,
    exact cosine rerank, global sort by (-score, neighbor_id)."""
    import os as _os

    from raycrawl.ioutil import read_lowest
    from raycrawl.similarity import _emb_matrix, _kmeans, _normalize

    path = _os.path.join(sf_dir, "embeddings.parquet")
    sample = read_lowest(path, "vec_id", train_sample, ["vec_id", "embedding"])
    cents = _kmeans(_normalize(_emb_matrix(sample)), n_cells)

    ids, m = _embeddings(sf_dir)
    vids = np.asarray(ids, dtype=np.int64)
    cell = np.argmax(m @ cents.T, axis=1)
    per_query: dict[int, list[tuple[float, int]]] = {}
    for qi in np.flatnonzero(vids < n_queries):
        qid = int(vids[qi])
        qcells = np.argsort(-(m[qi] @ cents.T))[:n_probe]
        cand = np.flatnonzero(np.isin(cell, qcells) & (vids != qid))
        per_query[qid] = [(float(m[c] @ m[qi]), int(vids[c])) for c in cand]
    return _topk_table(per_query, k)


# ---------------------------------------------------------------------------
# host-graph PageRank (independent edge aggregation; pinned power iteration)
# ---------------------------------------------------------------------------


def host_pagerank(sf_dir: str) -> pa.Table:
    """Expected (host, rank) table: the edge aggregation the engine runs
    as map_batches -> groupby Count is re-derived here as a single-threaded
    dict count over the same smoke corpus (per-row primitives host_of /
    extract_links shared, M10 text/html gate replicated), canonically
    sorted, then fed to the PINNED power-iteration primitive — so rank is
    bit-identical iff the distributed aggregation produced exactly the
    right integer edge weights."""
    import pandas as pd

    from raycrawl import core
    from raycrawl.graphrank import pagerank
    from raycrawl.registry import _smoke_corpus_dir

    corpus = _smoke_corpus_dir(sf_dir)
    t = pq.read_table(os.path.join(corpus, "pages.parquet"))
    ctypes = (
        t["content_type"].to_pylist()
        if "content_type" in t.column_names
        else [None] * t.num_rows
    )
    counts: dict[tuple[str, str], int] = {}
    for url, html, ct in zip(t["url"].to_pylist(), t["html"].to_pylist(), ctypes):
        if ct is not None and not ct.startswith("text/html"):
            continue
        src = core.host_of(url)
        for link in core.extract_links(html or b"", url or ""):
            key = (src, core.host_of(link))
            counts[key] = counts.get(key, 0) + 1
    keys = sorted(counts)
    edges = pd.DataFrame(
        {
            "src": [k[0] for k in keys],
            "dst": [k[1] for k in keys],
            "weight": [counts[k] for k in keys],
        }
    )
    ranks = pagerank(edges)
    items = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {
            "host": pa.array([h for h, _ in items], pa.string()),
            "rank": pa.array([r for _, r in items], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# WARC -> CDX (independent offset accounting; pinned framing primitive)
# ---------------------------------------------------------------------------


def cdx_index(sf_dir: str) -> pa.Table:
    """Expected CDX table WITHOUT ever touching a WARC file or the reader:
    offsets/lengths are re-derived by accumulating the pinned framing
    primitive's record sizes over the corpus shards in row order, and the
    sort is a plain Python sort — so a hash match pins the distributed
    writer sharding, the reader's member-extent accounting AND the
    Dataset.sort against this straight-line recomputation."""
    from raycrawl.registry import _smoke_corpus_dir
    from raycrawl.sources.warc import (
        _shard_paths, payload_digest, surt, warc_name, warc_record_bytes,
    )

    corpus = _smoke_corpus_dir(sf_dir)
    rows = []
    for shard in _shard_paths(corpus):
        t = pq.read_table(shard, columns=["url", "warc_ts", "content_type", "html"])
        fname = warc_name(os.path.basename(shard))
        offset = 0
        for url, ts, ct, h in zip(
            t["url"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
            t["content_type"].to_pylist(),
            t["html"].to_pylist(),
        ):
            n = len(warc_record_bytes(url, ts, ct, h or b""))
            rows.append(
                {
                    "url": url, "ts_us": ts, "filename": fname,
                    "offset": offset, "length": n,
                    "surt_key": surt(url), "digest": payload_digest(h or b""),
                }
            )
            offset += n
    rows.sort(key=lambda r: (r["surt_key"], r["ts_us"], r["url"]))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "ts_us": pa.array([r["ts_us"] for r in rows], pa.int64()),
            "filename": pa.array([r["filename"] for r in rows], pa.string()),
            "offset": pa.array([r["offset"] for r in rows], pa.int64()),
            "length": pa.array([r["length"] for r in rows], pa.int64()),
            "surt_key": pa.array([r["surt_key"] for r in rows], pa.string()),
            "digest": pa.array([r["digest"] for r in rows], pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# sketches + composite prep
# ---------------------------------------------------------------------------


def approx_distinct(sf_dir: str) -> pa.Table:
    """Expected HLL row: one single-threaded pass over user_id (register
    max is order/partition independent, so the distributed partial-merge
    must land on bit-identical registers and estimate)."""
    from raycrawl.sketches import HLL

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    vals = t["user_id"].to_pylist()
    h = HLL(12)
    h.add(vals)
    est = h.estimate()
    exact = len(set(vals))
    return pa.table(
        {
            "estimate": pa.array([est], pa.float64()),
            "exact": pa.array([exact], pa.int64()),
            "rel_err": pa.array([abs(est - exact) / max(1, exact)], pa.float64()),
        }
    )


def prep_corpus(
    sf_dir: str, min_tokens: int = 10, min_quality: float = 0.2
) -> pa.Table:
    """Expected curated-corpus output: exact-dup drop (63-bit content-hash
    groups, keep-min) ∪ minhash drop, then the pinned analysis kernels
    over the whole table at once, then the filter — no Ray, no batching."""
    from raycrawl import core, textproc

    ids, texts = _docs(sf_dir)
    by_hash: dict[int, list[int]] = {}
    for i, x in zip(ids, texts):
        by_hash.setdefault(core.url_hash(x) & ((1 << 63) - 1), []).append(i)
    drop: set[int] = set()
    for members in by_hash.values():
        if len(members) > 1:
            drop.update(m for m in members if m != min(members))
    keep_min = set(dedup_minhash(sf_dir)["doc_id"].to_pylist())
    drop |= {i for i in ids if i not in keep_min}

    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    t = textproc.lang_id_batch(t)
    t = textproc.token_count_batch(t)
    t = textproc.quality_score_batch(t)
    rows = t.to_pylist()
    kept = [
        r for r in rows
        if r["doc_id"] not in drop
        and r["n_tokens"] >= min_tokens
        and r["quality"] >= min_quality
    ]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in kept], pa.int64()),
            "lang_pred": pa.array([r["lang_pred"] for r in kept], pa.string()),
            "n_tokens": pa.array([r["n_tokens"] for r in kept], pa.int64()),
            "n_tokens_bpe": pa.array([r["n_tokens_bpe"] for r in kept], pa.int64()),
            "quality": pa.array([r["quality"] for r in kept], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# corpus curation (C4 line dedup / Gopher rules / decontamination / PII)
# ---------------------------------------------------------------------------


def _dedup_lines_core(
    ids: list[int], texts: list[str]
) -> tuple[list[str], list[int], list[int]]:
    """Line-dedup rewrite over an explicit (ids, texts) row set, keyed on
    the RAW LINE STRING (the engine keys on the pinned 63-bit hash — a
    mismatch would surface an engine hash collision or packing bug): drop
    every dedup-relevant line occurrence that is not the global (doc_id,
    line_idx)-minimal one."""
    first: dict[str, tuple[int, int]] = {}
    for i, x in zip(ids, texts):
        for idx, line in enumerate((x or "").split("\n")):
            if not line.strip():
                continue
            cur = first.get(line)
            if cur is None or (i, idx) < cur:
                first[line] = (i, idx)
    out_text, n_kept, n_dropped = [], [], []
    for i, x in zip(ids, texts):
        kept, dropped = [], 0
        for idx, line in enumerate((x or "").split("\n")):
            if line.strip() and first[line] != (i, idx):
                dropped += 1
                continue
            kept.append(line)
        out_text.append("\n".join(kept))
        n_kept.append(len(kept))
        n_dropped.append(dropped)
    return out_text, n_kept, n_dropped


def dedup_lines(sf_dir: str) -> pa.Table:
    """Expected whole-corpus line-dedup rewrite (see _dedup_lines_core)."""
    ids, texts = _docs(sf_dir)
    out_text, n_kept, n_dropped = _dedup_lines_core(ids, texts)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "n_dropped": pa.array(n_dropped, pa.int64()),
        }
    )


def gopher_quality(sf_dir: str) -> pa.Table:
    """Independent per-row reimplementation of the Gopher-rule integer
    signals (collections.Counter for the 2-gram mode vs the engine's
    manual running-max dict)."""
    from collections import Counter

    ids, texts = _docs(sf_dir)
    cols = {
        k: []
        for k in (
            "n_words", "n_word_chars", "n_lines", "n_nonempty_lines",
            "n_dup_lines", "n_chars_dup_lines", "top2_count", "n_2grams",
            "n_symbols", "gopher_pass",
        )
    }
    for x in texts:
        x = x or ""
        words = x.split()
        nw, nwc = len(words), sum(map(len, words))
        lines = x.split("\n")
        nonempty = [ln for ln in lines if ln.strip()]
        line_counts = Counter(nonempty)
        ndup = sum(c - 1 for c in line_counts.values())
        cdup = sum((c - 1) * len(ln) for ln, c in line_counts.items())
        grams = Counter(zip(words, words[1:]))
        top2 = max(grams.values()) if grams else 0
        n2 = max(0, nw - 1)
        nsym = x.count("#") + x.count("...")
        ok = (
            50 <= nw <= 100000
            and 10 * ndup < 3 * max(1, len(nonempty))
            and 5 * top2 <= n2
            and 3 * nw <= nwc <= 10 * nw
            and 10 * nsym <= nw
        )
        for k, v in (
            ("n_words", nw), ("n_word_chars", nwc), ("n_lines", len(lines)),
            ("n_nonempty_lines", len(nonempty)), ("n_dup_lines", ndup),
            ("n_chars_dup_lines", cdup), ("top2_count", top2),
            ("n_2grams", n2), ("n_symbols", nsym), ("gopher_pass", int(ok)),
        ):
            cols[k].append(v)
    out = {"doc_id": pa.array(ids, pa.int64())}
    out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    return pa.table(out)


def decontaminate(sf_dir: str) -> pa.Table:
    """Expected contamination scan, keyed on raw 8-word TUPLES (the engine
    keys on pinned gram hashes + a searchsorted probe): benchmark = the
    N_BENCH_DOCS lowest doc_ids, full-table scan here."""
    from raycrawl.curate import N_BENCH_DOCS, NGRAM

    ids, texts = _docs(sf_dir)
    by_id = sorted(zip(ids, texts))
    bench_grams: set[tuple] = set()
    for _, x in by_id[:N_BENCH_DOCS]:
        ws = (x or "").split()
        for i in range(len(ws) - NGRAM + 1):
            bench_grams.add(tuple(ws[i : i + NGRAM]))
    n_overlap, contaminated = [], []
    for x in texts:
        ws = (x or "").split()
        grams = {tuple(ws[i : i + NGRAM]) for i in range(len(ws) - NGRAM + 1)}
        n = len(grams & bench_grams)
        n_overlap.append(n)
        contaminated.append(int(n > 0))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_overlap": pa.array(n_overlap, pa.int64()),
            "contaminated": pa.array(contaminated, pa.int64()),
        }
    )


def _pii_core(texts: list[str]) -> tuple[list[str], list[int]]:
    """PII redaction via Python `re` (the engine runs the same pinned
    patterns through Arrow's RE2 — two unrelated regex engines must agree
    byte-for-byte on count + rewrite)."""
    from raycrawl.curate import PII_RULES

    compiled = [(re.compile(p), r) for p, r in PII_RULES]
    out_text, counts = [], []
    for x in texts:
        s = x or ""
        n = 0
        for rx, repl in compiled:
            n += len(rx.findall(s))
            s = rx.sub(repl, s)
        out_text.append(s)
        counts.append(n)
    return out_text, counts


def pii_redact(sf_dir: str) -> pa.Table:
    ids, texts = _docs(sf_dir)
    out_text, counts = _pii_core(texts)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text_redacted": pa.array(out_text, pa.string()),
            "n_redactions": pa.array(counts, pa.int64()),
        }
    )


def curate_corpus(sf_dir: str) -> pa.Table:
    """Expected output of the composite curation pipeline, re-derived
    straight-line in the engine's documented stage order: Gopher gate on
    the raw text, line dedup among SURVIVORS only, benchmark-
    decontamination drop (grams from the RAW lowest-doc_id docs, overlap
    computed on the DEDUPED text), then PII redaction. Identities stay
    independent of the engine's: raw line strings vs pinned line hashes,
    word tuples vs pinned gram hashes, Python `re` vs Arrow RE2."""
    from raycrawl.curate import N_BENCH_DOCS, NGRAM

    ids, texts = _docs(sf_dir)
    # benchmark gram set from the RAW corpus (engine: read_lowest)
    bench_grams: set[tuple] = set()
    for _, x in sorted(zip(ids, texts))[:N_BENCH_DOCS]:
        ws = (x or "").split()
        for i in range(len(ws) - NGRAM + 1):
            bench_grams.add(tuple(ws[i : i + NGRAM]))
    # 1. Gopher gate — reuse the independent per-row reimplementation
    gq = gopher_quality(sf_dir)
    passed = {
        i
        for i, p in zip(gq["doc_id"].to_pylist(), gq["gopher_pass"].to_pylist())
        if p
    }
    s_ids = [i for i in ids if i in passed]
    s_texts = [x for i, x in zip(ids, texts) if i in passed]
    # 2. global line dedup among survivors
    d_texts, _, n_dropped = _dedup_lines_core(s_ids, s_texts)
    # 3. decontamination drop on the deduped text
    k_ids, k_texts, k_dropped = [], [], []
    for i, x, nd in zip(s_ids, d_texts, n_dropped):
        ws = (x or "").split()
        grams = {tuple(ws[j : j + NGRAM]) for j in range(len(ws) - NGRAM + 1)}
        if grams & bench_grams:
            continue
        k_ids.append(i)
        k_texts.append(x)
        k_dropped.append(nd)
    # 4. PII redaction on what remains
    out_text, n_red = _pii_core(k_texts)
    return pa.table(
        {
            "doc_id": pa.array(k_ids, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "n_dropped_lines": pa.array(k_dropped, pa.int64()),
            "n_redactions": pa.array(n_red, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# registry surface
# ---------------------------------------------------------------------------

def media_features(sf_dir: str) -> pa.Table:
    """Expected table for the multimodal stage. IMAGE rows verify the
    engine's REAL stdlib PNG decode: the oracle computes width/height/
    channels from the pinned shape function and pixel_sum CLOSED-FORM from
    the pinned pattern (`synth_image_pixels` — it never runs the engine's
    PNG decode path, so a wrong unfilter or header parse mismatches at the
    driver; n_bytes comes from the shared pinned payload generator).
    AUDIO rows verify the REAL stdlib WAV decode the same way (shape +
    sample sum from the pinned pattern, never from decoded bytes), and
    VIDEO rows the REAL stdlib AVI decode (frame-sampled pixel sum from
    the pinned pattern with the engine's VIDEO_SAMPLE_EVERY stride)."""
    import hashlib as _hl

    from raycrawl import multimodal as _mm

    ids, _texts = _docs(sf_dir)
    mt, nb, dp, wd, ht, ch, ps = [], [], [], [], [], [], []
    for i in ids:
        kind = "image" if i % 3 == 0 else ("audio" if i % 3 == 1 else "video")
        mt.append(kind)
        if kind == "image":
            payload = _mm.synth_png(i)  # pinned input generator
            h, w, c = _mm.synth_image_shape(i)
            px = _mm.synth_image_pixels(i)  # pattern, not decoded bytes
            nb.append(len(payload))
            dp.append(_hl.md5(payload).digest()[:8].hex())
            wd.append(w)
            ht.append(h)
            ch.append(c)
            ps.append(int(px.astype("int64").sum()))
        elif kind == "audio":
            payload = _mm.synth_wav(i)  # pinned input generator
            frames, c, rate = _mm.synth_audio_shape(i)
            smp = _mm.synth_audio_samples(i)  # pattern, not decoded bytes
            nb.append(len(payload))
            dp.append(_hl.md5(payload).digest()[:8].hex())
            wd.append(frames)
            ht.append(rate)
            ch.append(c)
            ps.append(int(smp.astype("int64").sum()))
        else:
            payload = _mm.synth_avi(i)  # pinned input generator
            frames, h, w, _fps = _mm.synth_video_shape(i)
            px = _mm.synth_video_frames(i)  # pattern, not decoded bytes
            nb.append(len(payload))
            dp.append(_hl.md5(payload).digest()[:8].hex())
            wd.append(w)
            ht.append(h)
            ch.append(frames)
            ps.append(int(px[:: _mm.VIDEO_SAMPLE_EVERY].astype("int64").sum()))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(mt, pa.string()),
            "n_bytes": pa.array(nb, pa.int64()),
            "width": pa.array(wd, pa.int32()),
            "height": pa.array(ht, pa.int32()),
            "channels": pa.array(ch, pa.int32()),
            "pixel_sum": pa.array(ps, pa.int64()),
        }
    )


COMPUTE = {
    "dedup_minhash": dedup_minhash,
    "dedup_jaccard": dedup_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
    "token_count_bpe": token_count_bpe,
    "approx_distinct": approx_distinct,
    "host_pagerank": host_pagerank,
    "cdx_index": cdx_index,
    "prep_corpus": prep_corpus,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "dedup_lines": dedup_lines,
    "gopher_quality": gopher_quality,
    "decontaminate": decontaminate,
    "pii_redact": pii_redact,
    "curate_corpus": curate_corpus,
    "media_features": media_features,
}


def write_expected(name: str, sf_dir: str) -> str:
    """Compute + overwrite the expected table for `name` over `sf_dir`;
    called by the queries() wrapper before the Ray pipeline is returned."""
    _write(name, COMPUTE[name](sf_dir))
    return expected_path(name)


_seeded = False


def seed_defaults() -> None:
    """Pre-seed every expected file from the driver's sf0.01 tables so the
    static oracle SQL is valid even if the driver evaluates the SQL side
    before the Ray side on a cold /tmp (memoized per process)."""
    global _seeded
    if _seeded:
        return
    for d in _SEED_SF_DIRS:
        if os.path.exists(os.path.join(d, "documents.parquet")):
            for name in COMPUTE:
                write_expected(name, d)
            break
    _seeded = True
