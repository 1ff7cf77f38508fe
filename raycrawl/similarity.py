"""Similarity search over embedding columns (`list<float>`).

- Brute-force cosine top-k: the baseline — per-batch float64 numpy matmul
  against a broadcast query matrix (`ray.put` once), partial top-k per
  batch, tiny final merge on the driver. No shuffle; scales linearly with
  corpus blocks and is embarrassingly parallel across a cluster.
- LSH-bucketed (random hyperplane) variant: the scale path — candidates
  only from matching sign-buckets, then exact re-rank; trades recall for
  a corpus-sized shuffle-free bucket probe.
- Embedding-cosine near-dup for dedup pipelines.

Determinism: all scores computed in float64; ties broken by vec_id.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd



_HYPERPLANES = np.random.RandomState(1234).randn(16, 64)

# banded hyperplane tables for the near-dup LSH scale path: 4 independent
# 8-bit sign signatures; near-identical vectors (cos >= ~0.97) agree on at
# least one full band with high probability, so candidate generation is a
# bucket groupby instead of an O(N^2) broadcast matmul.
_NEARDUP_BANDS = 4
_NEARDUP_BITS = 8


def _band_planes(bands: int, bits: int) -> np.ndarray:
    """Deterministic hyperplane tables for (bands, bits): the same pinned
    seed for every shape, so the default shape reproduces the historical
    `_BAND_PLANES` exactly (pyoracle imports those constants)."""
    return np.random.RandomState(5678).randn(bands, bits, 64)


_BAND_PLANES = _band_planes(_NEARDUP_BANDS, _NEARDUP_BITS)


def _emb_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


# ANN stages run as PLAIN TASKS (closures over the ray.put ref), not actor
# pools: their only per-actor "setup" was fetching the broadcast query/
# centroid arrays, which is a zero-copy plasma read per task (~µs), while
# the autoscaling pool paid ~100 ms per actor spin-up (see the same
# conversion in dedup.py — measured 3-7x on broadcast-state stages).


def _topk_partial_fn(q_ref, k: int):
    """map_batches stage: per-batch exact cosine top-k candidates vs the
    broadcast query matrix."""

    def fn(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        qm = _normalize(qm)  # (Q, D) float64
        if t.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_emb_matrix(t))
        scores = m @ qm.T  # (B, Q)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            col = scores[:, qi]
            mask = vids != qid  # exclude self
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            take = idx[np.argsort(-col[idx], kind="stable")[: k]]
            out_q.extend([qid] * len(take))
            out_n.extend(vids[take].tolist())
            out_s.extend(col[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    return fn


def ann_topk(sf_dir: str, k: int = 5, n_queries: int = 10) -> pa.Table:
    """Exact cosine top-k for the first `n_queries` vec_ids. Output is
    integer-only (query_id, rank, neighbor_id) so oracle hash comparison
    is float-free; ties broken by (−score, neighbor_id)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as pq

    # bounded bootstrap read: the filters predicate prunes row groups on
    # vec_id statistics — only the query rows land on the driver, never
    # the corpus (VERDICT r2 finding #2)
    qt = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", n_queries)]
    )
    qids = qt["vec_id"].to_pylist()
    qm = _emb_matrix(qt)
    q_ref = ray.put((qids, qm))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    cands = ds.map_batches(
        _topk_partial_fn(q_ref, k),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # final merge: per query, global top-k from per-batch candidates (tiny)
    best: dict[int, list] = {}
    for b in cands.iter_batches(batch_format="pyarrow"):
        for q, n, s in zip(
            b["query_id"].to_pylist(), b["neighbor_id"].to_pylist(), b["score"].to_pylist()
        ):
            best.setdefault(q, []).append((-s, n))
    out_q, out_r, out_n = [], [], []
    for q in sorted(best):
        for rank, (_, n) in enumerate(heapq.nsmallest(k, best[q]), start=1):
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


def _bucket_of(m: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket ids (16-bit sign signature)."""
    signs = (m @ _HYPERPLANES.T) > 0
    return (signs * (1 << np.arange(16))).sum(axis=1).astype(np.int64)


def ann_topk_lsh(sf_dir: str, k: int = 5, n_queries: int = 10, probes: int = 4) -> pa.Table:
    """Approximate variant: only corpus vectors whose LSH bucket is within
    the query's `probes` nearest buckets (by signature hamming) are scored.
    Same output schema as ann_topk; recall measured in tests."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    # bounded bootstrap read (row-group pruning on vec_id statistics)
    qt = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", n_queries)]
    )
    qids = qt["vec_id"].to_pylist()
    qm = _normalize(_emb_matrix(qt))
    qb = _bucket_of(qm)
    q_ref = ray.put((qids, qm, qb))

    def stage(t: pa.Table, _ref=q_ref) -> pa.Table:
        # plain task: the broadcast fetch is a zero-copy plasma read
        qids_, qm_, qb_ = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        if t.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_emb_matrix(t))
        vb = _bucket_of(m)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids_):
            ham = np.array([bin(int(v ^ qb_[qi])).count("1") for v in vb])
            mask = (ham <= probes) & (vids != qid)
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            col = m[idx] @ qm_[qi]
            take = np.argsort(-col, kind="stable")[: k]
            out_q.extend([qid] * len(take))
            out_n.extend(vids[idx][take].tolist())
            out_s.extend(col[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    cands = ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True,
    )
    best: dict[int, list] = {}
    for b in cands.iter_batches(batch_format="pyarrow"):
        for q, n, s in zip(
            b["query_id"].to_pylist(), b["neighbor_id"].to_pylist(), b["score"].to_pylist()
        ):
            best.setdefault(q, []).append((-s, n))
    out_q, out_r, out_n = [], [], []
    for q in sorted(best):
        for rank, (_, n) in enumerate(heapq.nsmallest(k, best[q]), start=1):
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


def _kmeans(m: np.ndarray, k: int, n_iter: int = 10, seed: int = 99) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors (cosine ≈
    euclidean on the unit sphere). Fixed seed + iteration count."""
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(k, len(m)), replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_topk_ivf(
    sf_dir: str, k: int = 5, n_queries: int = 10,
    n_cells: int = 32, n_probe: int = 4, train_sample: int = 4096,
) -> pa.Table:
    """IVF variant (the coarse-quantizer scale path): k-means centroids
    trained ONCE on a deterministic driver-side sample and broadcast;
    each corpus batch scores only vectors whose nearest centroid is among
    the query's `n_probe` closest cells — pruning the matmul ~n_probe/
    n_cells while staying shuffle-free (candidate generation and partial
    top-k happen inside one map_batches pass, tiny driver merge).
    Same output schema as ann_topk; recall measured in tests."""
    import pyarrow.parquet as pq

    from raycrawl.ioutil import read_lowest

    path = os.path.join(sf_dir, "embeddings.parquet")
    # bounded bootstrap reads: the k-means sample pulls only enough row
    # groups (stats-ordered) to cover the train_sample smallest vec_ids,
    # and the query rows come from a statistics-pruned filters read —
    # the full embeddings table never lands on the driver.
    sample = read_lowest(path, "vec_id", train_sample, ["vec_id", "embedding"])
    cents = _kmeans(_normalize(_emb_matrix(sample)), n_cells)

    qt = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", n_queries)]
    )
    qids = qt["vec_id"].to_pylist()
    qm = _normalize(_emb_matrix(qt))
    # per query: the n_probe nearest cells
    qcells = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, qm, qcells, cents))

    def stage(t: pa.Table, _ref=ref) -> pa.Table:
        # plain task: the broadcast fetch is a zero-copy plasma read
        qids_, qm_, qcells_, cents_ = (
            ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        )
        if t.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_emb_matrix(t))
        cell = np.argmax(m @ cents_.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids_):
            mask = np.isin(cell, qcells_[qi]) & (vids != qid)
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            col = m[idx] @ qm_[qi]
            take = np.argsort(-col, kind="stable")[: k]
            out_q.extend([qid] * len(take))
            out_n.extend(vids[idx][take].tolist())
            out_s.extend(col[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    cands = ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True,
    )
    best: dict[int, list] = {}
    for b in cands.iter_batches(batch_format="pyarrow"):
        for q, n, s in zip(
            b["query_id"].to_pylist(), b["neighbor_id"].to_pylist(), b["score"].to_pylist()
        ):
            best.setdefault(q, []).append((-s, n))
    out_q, out_r, out_n = [], [], []
    for q in sorted(best):
        for rank, (_, n) in enumerate(heapq.nsmallest(k, best[q]), start=1):
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


def embedding_neardup(sf_dir: str, threshold: float = 0.97):
    """Embedding-cosine near-dup keep-list: pairs above threshold found by
    per-batch matmul against the broadcast corpus matrix (OK to broadcast:
    D=64 floats/vec; the 10^10-scale path is LSH bucketing as above).
    Returns the kept vec_ids as a DATASET — the drop set is broadcast
    below the size caps, else computed by distributed min-label
    propagation and applied as an anti-join (dedup._components_drop_ds /
    _apply_drop: the repo-wide hybrid size dispatch)."""
    import pyarrow.parquet as pq

    from raycrawl import dedup as _dd
    from raycrawl import ioutil

    path = os.path.join(sf_dir, "embeddings.parquet")
    full = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(full["vec_id"].to_pylist(), dtype=np.int64)
    m = _normalize(_emb_matrix(full))
    ref = ray.put((ids, m))

    def pairs_fn(t: pa.Table, _ref=ref) -> pa.Table:
        # plain task: the corpus-matrix fetch is a zero-copy plasma read
        ids_, m_ = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        bm = _normalize(_emb_matrix(t))
        s = bm @ m_.T
        a_out, b_out = [], []
        for i, vid in enumerate(vids):
            js = np.flatnonzero((s[i] >= threshold) & (ids_ > vid))
            a_out.extend([int(vid)] * len(js))
            b_out.extend(ids_[js].tolist())
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    pairs_ds = ioutil.nonempty_blocks(
        ds.map_batches(
            pairs_fn, batch_format="pyarrow", zero_copy_batch=True,
        ).materialize(),
        _dd._PAIR_SCHEMA,
    )
    # pairs are verified at generation (cosine >= threshold); hybrid size
    # dispatch on the component step — see dedup module docstring
    if pairs_ds.count() <= _dd.PAIR_ROWS_DRIVER_MAX:
        drop = _dd._components_drop(
            [(r["a"], r["b"]) for r in pairs_ds.take_all()]
        )
    else:
        drop = _dd._components_drop_ds(pairs_ds)
    return _dd._apply_drop(
        rd.read_parquet(path, columns=["vec_id"]), drop, "vec_id"
    )


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = 0.97,
    bands: int = _NEARDUP_BANDS, bits: int = _NEARDUP_BITS,
):
    """THE SCALE PATH for embedding near-dup: banded hyperplane LSH.

    Candidate generation is a bucket groupby — each vector emits `bands`
    (band_key, vec_id, embedding) rows; only vectors sharing a full
    `bits`-bit sign band are pairwise-verified inside the partition-wise
    `map_groups`. No corpus-sized broadcast, no O(N^2) matmul: bucket
    work is quadratic only in bucket occupancy. SIZE `bits` TO THE
    CORPUS: there are bands x 2^bits buckets, so expected occupancy is
    N/2^bits — pick bits ≈ log2(N) - 6 (e.g. 27 bits at 10^10 vectors
    for ~64-deep buckets); more bands buy back the recall that sharper
    bands give up. The defaults are pinned (pyoracle imports them) and
    right for the test corpora; the knob changes candidate recall, not
    verification (cosine >= threshold is always exact on the pinned
    planes for the chosen shape). The verified-pair DROP set applies as a
    broadcast filter below the size caps, else via distributed min-label
    propagation + anti-join (the hybrid dispatch in dedup) — same output
    contract as `embedding_neardup` (recall tested on planted dups;
    exact equality is not guaranteed, which is why the brute-force
    variant remains the small-scale default)."""
    import pandas as pd

    from raycrawl import dedup as _dd
    from raycrawl import ioutil

    path = os.path.join(sf_dir, "embeddings.parquet")
    planes = (
        _BAND_PLANES
        if (bands, bits) == (_NEARDUP_BANDS, _NEARDUP_BITS)
        else _band_planes(bands, bits)
    )

    def band_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bkey": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "emb": pa.array([], pa.list_(pa.float64()))}
            )
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_emb_matrix(t))
        keys, ids, embs = [], [], []
        for b in range(bands):
            signs = (m @ planes[b].T) > 0  # (N, bits)
            bucket = (signs * (1 << np.arange(bits, dtype=np.int64))).sum(axis=1)
            keys.extend(((b << bits) | bucket).tolist())
            ids.extend(vids.tolist())
            embs.extend(m.tolist())
        return pa.table(
            {
                "bkey": pa.array(keys, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "emb": pa.array(embs, pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(e, dtype=np.float64) for e in g["emb"]])
        s = m @ m.T
        a_out, b_out = [], []
        for i in range(len(ids)):
            js = np.flatnonzero(s[i, i + 1 :] >= threshold)
            a_out.extend([int(ids[i])] * len(js))
            b_out.extend(ids[i + 1 + js].tolist())
        return pd.DataFrame({"a": a_out, "b": b_out}, dtype="int64")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One bkey-hash partition (partition-wise, not per-bucket: LSH
        buckets are mostly singletons, so groupby(bkey).map_groups would
        pay one Python call per bucket ~= bands x corpus size). The
        singleton kill is a vectorized transform; only multi-occupancy
        buckets reach the matmul."""
        sizes = g.groupby("bkey")["vec_id"].transform("size")
        multi = g[sizes >= 2]
        if multi.empty:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        frames = [
            bucket_pairs(sub) for _, sub in multi.groupby("bkey", sort=False)
        ]
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        return pd.concat(frames, ignore_index=True)

    _P = 64
    pairs_ds = (
        rd.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.append_column(
                "part", pc.cast(
                    pc.bit_wise_and(t["bkey"], pa.scalar(_P - 1, pa.int64())),
                    pa.int32(),
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("part")
        .map_groups(
            lambda g: _dd._pairs_arrow(partition_pairs(g)), batch_format="pandas"
        )
    )
    # verified at generation; bands can emit the same pair up to `bands`
    # times, so distinct before the component-step size dispatch
    pairs_ds = ioutil.nonempty_blocks(
        _dd._distinct_pairs_ds(pairs_ds).materialize(), _dd._PAIR_SCHEMA
    )
    if pairs_ds.count() <= _dd.PAIR_ROWS_DRIVER_MAX:
        drop = _dd._components_drop(
            sorted((int(r["a"]), int(r["b"])) for r in pairs_ds.take_all())
        )
    else:
        drop = _dd._components_drop_ds(pairs_ds)
    return _dd._apply_drop(
        rd.read_parquet(path, columns=["vec_id"]), drop, "vec_id"
    )
