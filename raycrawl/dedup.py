"""Deduplication operators (D-series + training-data extensions):

- exact (content-hash groupby; see relational.q_dedup_exact)
- MinHash + LSH banding (word-shingle Jaccard near-dup)
- SimHash (hamming-distance near-dup)
- n-gram Jaccard verification
- embedding-cosine near-dup (broadcast brute force + hyperplane-LSH path)

Ray-native shape: signatures are computed in vectorized `map_batches`
stages; banding is a flat-map that emits (band_key, doc_id, signature)
rows; candidate discovery is a `groupby(band_key)` shuffle whose payload is
just doc_id + 64x-uint64 signature (NOT the text); verification happens
per-bucket inside `map_groups`.

The connected-components/drop-set step is HYBRID size-dispatched (the
repo-wide pattern — see crawl.driver_round_threshold): below
PAIR_ROWS_DRIVER_MAX verified pairs the union-find runs on the driver
(the all-to-all fixed floor dwarfs the work); above it, candidate pairs
stay a Dataset, verification is a pair-bounded hash join against the
signature table, components come from distributed min-label propagation
(`_components_drop_ds`), and the drop set applies as a broadcast filter
below DROP_BROADCAST_MAX ids or a left-anti join above — nothing
pair- or drop-shaped ever materializes on the driver on the scale path.
At web-typical 30-50% duplicate density the pair set is O(corpus), which
is exactly why the scale path exists.
"""

from __future__ import annotations

import hashlib
import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_LOG = logging.getLogger("raycrawl.dedup")

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS = _N_PERM // _BANDS

_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


# word-hash memo: vocabularies are tiny relative to token streams, so the
# per-token blake2b cost amortizes to a dict hit (worker-lifetime cache)
_WORD_HASH_CACHE: dict[str, int] = {}


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _WORD_HASH_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, w in enumerate(toks):
        h = cache.get(w)
        if h is None:
            if len(cache) > 1_000_000:  # bound worker memory
                cache.clear()
            h = cache[w] = _hash64(w)
        out[i] = h
    return out


_SH_M1 = np.uint64(0x9E3779B97F4A7C15)
_SH_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def shingles(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hashes (uint64): token hashes combined with a
    vectorized position-weighted mix — no per-shingle string building."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    if len(toks) < n:
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for i, h in enumerate(th):
                acc = acc * _SH_M1 + h
        return np.array([acc or np.uint64(1)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = th[: len(th) - n + 1].copy()
        for k in range(1, n):
            acc = acc * _SH_M1 + th[k : len(th) - n + 1 + k]
        acc = (acc ^ (acc >> np.uint64(33))) * _SH_M2
    return acc


def minhash_signature(text: str) -> np.ndarray:
    """64-perm MinHash signature of the word-3-gram shingle set."""
    s = shingles(text)
    if s.size == 0:
        return np.full(_N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod M, vectorized (m, P)
    with np.errstate(over="ignore"):
        vals = (s[:, None] * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def minhash_batch(t: pa.Table, col: str = "text") -> pa.Table:
    sigs = [minhash_signature(x or "") for x in t[col].to_pylist()]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        }
    )


def band_explode(t: pa.Table) -> pa.Table:
    """One row per (doc, band): band bucket key = blake2b(band_idx || 4 sig
    values). Carries the full signature for in-bucket verification."""
    doc_ids = t["doc_id"].to_pylist()
    sigs = t["sig"].to_pylist()
    out_doc, out_key, out_sig = [], [], []
    for d, sig in zip(doc_ids, sigs):
        for b in range(_BANDS):
            chunk = sig[b * _ROWS : (b + 1) * _ROWS]
            key = _hash64(f"{b}:" + ",".join(map(str, chunk)))
            out_doc.append(d)
            out_key.append(key)
            out_sig.append(sig)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "bkey": pa.array(out_key, pa.uint64()),
            "sig": pa.array(out_sig, pa.list_(pa.uint64())),
        }
    )


def band_explode_slim(t: pa.Table) -> pa.Table:
    """Scale variant: (bkey, doc_id) only — the shuffle carries 16 bytes
    per band row instead of a 16x-duplicated 512-byte signature.
    Verification happens later against a bounded signature pull."""
    doc_ids = t["doc_id"].to_pylist()
    sigs = t["sig"].to_pylist()
    out_doc, out_key = [], []
    for d, sig in zip(doc_ids, sigs):
        for b in range(_BANDS):
            chunk = sig[b * _ROWS : (b + 1) * _ROWS]
            out_doc.append(d)
            out_key.append(_hash64(f"{b}:" + ",".join(map(str, chunk))))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "bkey": pa.array(out_key, pa.uint64()),
        }
    )


_BUCKET_CAP = 200
_N_BUCKET_PARTS = 64  # bkey-hash partitions for candidate generation


def _bucket_candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Within one band bucket: all candidate id pairs (a < b), capped per
    bucket to bound pathological buckets. A capped bucket emits a marker
    row carried in a SEPARATE `dropped` column (count of truncated ids;
    0 on real pair rows) so the driver can count and LOG the truncation —
    no silent caps, and no in-band sentinel that a corpus with negative
    doc_ids could collide with."""
    if len(g) < 2:
        return pd.DataFrame({"a": [], "b": [], "dropped": []}, dtype="int64")
    all_ids = sorted(int(x) for x in g["doc_id"].unique())
    ids = all_ids[:_BUCKET_CAP]
    a_out, b_out, drop_out = [], [], []
    if len(all_ids) > _BUCKET_CAP:
        a_out.append(0)
        b_out.append(0)
        drop_out.append(len(all_ids) - _BUCKET_CAP)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
            drop_out.append(0)
    return pd.DataFrame({"a": a_out, "b": b_out, "dropped": drop_out}, dtype="int64")


def _partition_candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for ONE bkey-hash partition. Most band buckets are
    singletons; a per-BUCKET map_groups would pay one Python call per
    bucket (~16x corpus size). Grouping by `part = bkey % P` instead gives
    P Python calls, and the singleton kill inside is a vectorized pandas
    transform — only multi-occupancy buckets reach the pair loop."""
    sizes = g.groupby("bkey")["doc_id"].transform("size")
    multi = g[sizes >= 2]
    if multi.empty:
        return pd.DataFrame({"a": [], "b": [], "dropped": []}, dtype="int64")
    frames = [
        _bucket_candidate_pairs(sub) for _, sub in multi.groupby("bkey", sort=False)
    ]
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame({"a": [], "b": [], "dropped": []}, dtype="int64")
    return pd.concat(frames, ignore_index=True)


def _bucket_pairs(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Within one band bucket: verify candidate pairs by full-signature
    agreement (unbiased Jaccard estimate); emit pairs >= threshold."""
    if len(g) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    g = g.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sigs = np.stack(g["sig"].to_numpy())
    a_out, b_out = [], []
    for i in range(len(ids)):
        agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for j in np.flatnonzero(agree >= threshold):
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + j]))
    return pd.DataFrame({"a": a_out, "b": b_out}, dtype="int64")


def _components_drop(pairs) -> set[int]:
    """Union-find over verified pairs; DROP every non-min id per component.
    Only ids that appear in a pair enter the structure, so the result is
    bounded by true-duplicate density — never corpus size."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x for x in parent if find(x) != x}


def _components_keep(all_ids: list[int], pairs: list[tuple[int, int]]) -> list[int]:
    """Keep the min id per component (driver-side convenience for SMALL id
    sets; the scale path broadcasts `_components_drop` as a filter)."""
    drop = _components_drop(pairs)
    return sorted(i for i in all_ids if i not in drop)


# --- distributed connected components / drop application --------------------
#
# Hybrid size dispatch (same pattern as BAND_ROWS_DRIVER_MAX below): the
# verified-pair set and the resulting drop set scale with duplicate COUNT —
# O(corpus) at web-typical 30-50% dup density — so neither may
# unconditionally land on the driver. Below the thresholds the driver
# union-find + ray.put broadcast stay (the distributed path pays a ~4-6 s
# fixed all-to-all floor per exchange on this cluster); above them the
# pair Dataset never leaves the cluster.

def _env_int(name: str, default: int) -> int:
    """Env-overridable dispatch threshold (VERDICT r4 #7: lets conformance
    exercise the distributed paths against the same oracle SQL without
    monkeypatching — e.g. RAYCRAWL_PAIR_DRIVER_MAX=-1)."""
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


# verified/candidate pairs pulled to driver below this
PAIR_ROWS_DRIVER_MAX = _env_int("RAYCRAWL_PAIR_DRIVER_MAX", 2_000_000)
# drop ids applied via ray.put is_in below this
DROP_BROADCAST_MAX = _env_int("RAYCRAWL_DROP_BROADCAST_MAX", 4_000_000)

_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_CAND_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("dropped", pa.int64())]
)
_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_LABEL_SCHEMA = pa.schema([("id", pa.int64()), ("label", pa.int64())])
_PROP_SCHEMA = pa.schema(
    [("id", pa.int64()), ("cand", pa.int64()), ("old", pa.int64())]
)
_DROP_SCHEMA = pa.schema([("id", pa.int64())])


def _join_parts() -> int:
    """Hash-join partition count, scaled like curate._dedup_lines_join_path:
    too-wide joins reserve every CPU and starve upstream maps."""
    return max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)


def _pairs_arrow(df: pd.DataFrame, cols=("a", "b")) -> pa.Table:
    """Typed Arrow pair table from a (possibly empty) pandas frame — forces
    int64 so map_groups emits TYPED empties (never zero-column blocks) that
    downstream joins and unions accept (CLAUDE.md invariant)."""
    return pa.table(
        {c: pa.array(df[c].to_numpy(dtype=np.int64, copy=False), pa.int64()) for c in cols}
    )


def _distinct_pairs_ds(pairs_ds: rd.Dataset) -> rd.Dataset:
    """Partition-wise distinct over an (a, b) pair Dataset (bands emit the
    same pair up to _BANDS times): part = mixed hash(a, b) % P, vectorized
    drop_duplicates inside each partition — one slim int64 exchange, no
    per-pair Python."""

    def part_col(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            mix = (a * _SH_M1) ^ (b * _SH_M2)
        return t.append_column(
            "part",
            pa.array((mix & np.uint64(_N_BUCKET_PARTS - 1)).astype(np.int32)),
        )

    def distinct_part(g: pd.DataFrame) -> pa.Table:
        return _pairs_arrow(g.drop_duplicates(["a", "b"]))

    return (
        pairs_ds.map_batches(part_col, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(distinct_part, batch_format="pandas")
    )


def _sum_col(ds: rd.Dataset, col: str) -> int:
    """Sum an int column via per-block partial sums — only one tiny count
    row per block reaches the driver (Ray skips map UDFs on 0-row blocks,
    which then contribute no rows here)."""
    parts = ds.map_batches(
        lambda t: pa.table(
            {"n": pa.array([int(pc.sum(t[col]).as_py() or 0)], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return sum(r.get("n", 0) for r in parts.take_all())


def _components_drop_ds(pairs_ds: rd.Dataset, max_iter: int = 64) -> rd.Dataset:
    """Distributed `_components_drop`: min-label propagation with
    pointer-doubling over the verified-pair Dataset. Returns the DROP ids
    (every non-min id per connected component) as a single-column `id`
    Dataset — nothing pair-shaped lands on the driver.

    Per round: one (edges ⋈ labels) int64 hash join + one groupby-min
    (labels monotonically decrease; a round with zero decreases is a
    proven fixpoint: min over self+neighbors unchanged everywhere means
    labels are constant per component, and since label(min_node) <= min
    from round 0 that constant IS the component min), plus one
    label-of-label shortcut join while unconverged (classic
    pointer-doubling, so convergence is O(log component diameter) — near-
    dup components are near-cliques, 1-3 rounds in practice). Semantics
    identical to the driver union-find; equivalence-tested."""
    from raycrawl import ioutil
    from ray.data.aggregate import Max, Min

    n_parts = _join_parts()

    def sym(t: pa.Table) -> pa.Table:
        t = t.select(["a", "b"])
        fwd = t.rename_columns(["u", "v"])
        rev = t.select(["b", "a"]).rename_columns(["u", "v"])
        return pa.concat_tables([fwd, rev])

    edges = ioutil.nonempty_blocks(
        pairs_ds.map_batches(
            sym, batch_format="pyarrow", zero_copy_batch=True
        ).materialize(),
        _EDGE_SCHEMA,
    )
    if edges.count() == 0:
        return rd.from_arrow(_DROP_SCHEMA.empty_table())

    # round 0 for free: label(u) = min(u, min neighbor)
    lab0 = ioutil.nonempty_blocks(
        edges.groupby("u").aggregate(Min("v", alias_name="mv")).materialize(),
        pa.schema([("u", pa.int64()), ("mv", pa.int64())]),
    )
    labels = ioutil.nonempty_blocks(
        lab0.map_batches(
            lambda t: pa.table(
                {"id": t["u"], "label": pc.min_element_wise(t["u"], t["mv"])}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize(),
        _LABEL_SCHEMA,
    )

    for _ in range(max_iter):
        prop = edges.join(
            labels, "inner", num_partitions=n_parts, on=("u",), right_on=("id",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t["v"],
                    "cand": t["label"],
                    "old": pa.nulls(t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        prop = ioutil.nonempty_blocks(prop.materialize(), _PROP_SCHEMA)
        own = labels.map_batches(
            lambda t: pa.table({"id": t["id"], "cand": t["label"], "old": t["label"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        merged = ioutil.nonempty_blocks(
            prop.union(own)
            .groupby("id")
            .aggregate(Min("cand", alias_name="label"), Max("old", alias_name="old"))
            .materialize(),
            pa.schema(
                [("id", pa.int64()), ("label", pa.int64()), ("old", pa.int64())]
            ),
        )
        changed = _sum_col(
            merged.map_batches(
                lambda t: pa.table(
                    {
                        "c": pc.cast(
                            pc.less(t["label"], t["old"]), pa.int64()
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "c",
        )
        labels = ioutil.nonempty_blocks(
            merged.map_batches(
                lambda t: t.select(["id", "label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize(),
            _LABEL_SCHEMA,
        )
        if changed == 0:
            break
        # pointer-doubling: label <- label(label). Every label value is a
        # node id (mins over node ids), so the inner self-join is total.
        rlab = labels.map_batches(
            lambda t: pa.table({"rid": t["id"], "rlabel": t["label"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        jumped = labels.join(
            rlab, "inner", num_partitions=n_parts, on=("label",), right_on=("rid",)
        ).map_batches(
            lambda t: pa.table({"id": t["id"], "label": t["rlabel"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        labels = ioutil.nonempty_blocks(jumped.materialize(), _LABEL_SCHEMA)
    else:
        _LOG.warning(
            "components: label propagation hit max_iter=%d without a proven "
            "fixpoint (component diameter > 2^%d is required to get here); "
            "drop set may merge-split incorrectly",
            max_iter, max_iter,
        )

    return labels.map_batches(
        lambda t: t.filter(pc.not_equal(t["label"], t["id"])).select(["id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _apply_drop(ds: rd.Dataset, drop, col: str) -> rd.Dataset:
    """Apply a DROP id collection to `ds[col]`: sets (and Datasets below
    DROP_BROADCAST_MAX ids) broadcast once via ray.put and filter with one
    vectorized is_in per batch; larger drop Datasets apply as a left-anti
    join (left_outer + null-marker filter, the q_anti_join shape) so the
    drop set never lands on the driver."""
    if isinstance(drop, (set, frozenset, list)):
        if not drop:
            return ds
        dref = ray.put(pa.array(sorted(drop), pa.int64()))
        return ds.map_batches(
            _drop_in_fn(dref, col), batch_format="pyarrow", zero_copy_batch=True
        )
    from raycrawl import ioutil

    drop = ioutil.nonempty_blocks(drop.materialize(), _DROP_SCHEMA)
    n = drop.count()
    if n == 0:
        return ds
    if n <= DROP_BROADCAST_MAX:
        ids = sorted(r["id"] for r in drop.take_all())  # bounded by the cap
        dref = ray.put(pa.array(ids, pa.int64()))
        return ds.map_batches(
            _drop_in_fn(dref, col), batch_format="pyarrow", zero_copy_batch=True
        )
    marked = ioutil.nonempty_blocks(
        drop.map_batches(
            lambda t: pa.table(
                {
                    "__drop_id": t["id"],
                    "__dropflag": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize(),
        pa.schema([("__drop_id", pa.int64()), ("__dropflag", pa.int8())]),
    )
    joined = ds.join(
        marked, "left_outer", num_partitions=_join_parts(),
        on=(col,), right_on=("__drop_id",),
    )

    def strip(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["__dropflag"]))
        return t.drop_columns(
            [c for c in ("__drop_id", "__dropflag") if c in t.column_names]
        )

    return joined.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


# Broadcast membership filters run as PLAIN TASKS, not actor pools: the
# only "state" is a ray.put'd array whose per-task fetch is a zero-copy
# shared-memory read (~µs), while an autoscaling (1, ncpu) actor pool
# pays ~100 ms per actor spin-up — measured at sf0.1/32 CPUs: the
# candidate-signature pull dropped 3.4 s → 0.3 s and the final keep
# filter 2.9 s → 0.4 s when converted. Actor pools stay the right tool
# where per-actor setup does real work (model load, index build).


def _keep_in_fn(ref, col: str):
    """Plain-task stage: keep rows whose `col` is in the broadcast set."""

    def fn(t: pa.Table) -> pa.Table:
        wanted = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return t.filter(pc.is_in(t[col], value_set=wanted))

    return fn


def _drop_in_fn(ref, col: str):
    """Plain-task stage: drop rows whose `col` is in the broadcast DROP
    set (bounded by duplicate density); membership is one vectorized
    is_in."""

    def fn(t: pa.Table) -> pa.Table:
        drop = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if len(drop) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t[col], value_set=drop)))

    return fn


def _read_docs(sf_dir: str) -> rd.Dataset:
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # single-parquet-file inputs split into few blocks by default; size the
    # signature stage's task count to the cluster so every core works
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
        override_num_blocks=4 * ncpu,
    )


# Hybrid size dispatch for the banding bucket groupby (the
# crawl.py `driver_round_threshold` pattern): the distributed all-to-all
# costs a ~4-6 s fixed floor on this cluster regardless of data size —
# measured 5.5 s for 80k band rows at sf0.1 — while the SAME bucket
# logic over <=2M slim 16-byte rows (<=32 MB pulled) runs on the driver
# in tens of ms. Above the threshold the banding shuffle is the scale
# path. Bucket semantics (bkey function, per-bucket cap, dropped
# markers) are byte-identical on both paths (equivalence-tested).
BAND_ROWS_DRIVER_MAX = _env_int("RAYCRAWL_BAND_DRIVER_MAX", 2_000_000)


def _lsh_candidate_pairs(sigs: rd.Dataset):
    """The MinHash-LSH banding step: (bkey, doc_id)-only explode, then
    bucket candidate generation — driver-local below
    BAND_ROWS_DRIVER_MAX band rows, bkey-hash-partitioned groupby above.
    Capped-bucket truncation logged (per-block partial sums — no silent
    caps and no driver pull for the accounting).

    Returns the deduped candidate id-pair SET when the pair volume fits
    the driver (<= PAIR_ROWS_DRIVER_MAX) — the fast path for every corpus
    below web-scale dup density — else the deduped candidate pair DATASET
    (a, b), which stays distributed through verification and components."""
    banded = sigs.map_batches(band_explode_slim, batch_format="pyarrow")
    if sigs.count() * _BANDS <= BAND_ROWS_DRIVER_MAX:
        # explode stays distributed; only the slim (bkey, doc_id) rows land.
        # Guard the zero-column leak: Ray skips map UDFs on 0-row blocks,
        # which then surface here as COLUMN-LESS frames (CLAUDE.md
        # invariant) — drop them before the concat/groupby.
        parts = [
            b.to_pandas()
            for b in banded.iter_batches(batch_format="pyarrow")
            if b.num_rows and "bkey" in b.column_names
        ]
        rows = (
            _partition_candidate_pairs(
                pd.concat(parts, ignore_index=True)
            ).to_dict("records")
            if parts
            else []
        )
        pairs = set()  # dedup pair list (bands can emit the same pair many times)
        dropped_cands = 0
        for r in rows:
            if r["dropped"]:  # capped-bucket marker (_bucket_candidate_pairs)
                dropped_cands += int(r["dropped"])
            else:
                pairs.add((int(r["a"]), int(r["b"])))
        if dropped_cands:
            _LOG.warning(
                "minhash LSH: %d candidate ids exceeded the %d-id bucket cap "
                "and were not paired (recall may drop for pathological "
                "buckets)",
                dropped_cands, _BUCKET_CAP,
            )
        return pairs

    from raycrawl import ioutil

    banded = banded.map_batches(
        lambda t: t.append_column(
            "part", pc.cast(
                pc.bit_wise_and(
                    t["bkey"], pa.scalar(_N_BUCKET_PARTS - 1, pa.uint64())
                ),
                pa.int32(),
            )
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    raw = ioutil.nonempty_blocks(
        banded.groupby("part")
        .map_groups(
            lambda g: _pairs_arrow(
                _partition_candidate_pairs(g), ("a", "b", "dropped")
            ),
            batch_format="pandas",
        )
        .materialize(),
        _CAND_SCHEMA,
    )
    dropped_cands = _sum_col(raw, "dropped")
    if dropped_cands:
        _LOG.warning(
            "minhash LSH: %d candidate ids exceeded the %d-id bucket cap and "
            "were not paired (recall may drop for pathological buckets)",
            dropped_cands, _BUCKET_CAP,
        )
    pairs_ds = raw.map_batches(
        lambda t: t.filter(pc.equal(t["dropped"], 0)).select(["a", "b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs_ds = ioutil.nonempty_blocks(
        _distinct_pairs_ds(pairs_ds).materialize(), _PAIR_SCHEMA
    )
    if pairs_ds.count() <= PAIR_ROWS_DRIVER_MAX:
        return {(int(r["a"]), int(r["b"])) for r in pairs_ds.take_all()}
    return pairs_ds


_SIGB_SCHEMA = pa.schema([("doc_id", pa.int64()), ("sigb", pa.binary())])


def _sig_binary_ds(sigs: rd.Dataset) -> rd.Dataset:
    """(doc_id, sigb) with the 64x-uint64 signature packed into one 512-byte
    binary value — pyarrow hash joins reject list-typed payload columns,
    binary passes through them zero-copy."""
    from raycrawl import ioutil

    def pack(t: pa.Table) -> pa.Table:
        packed = [
            np.asarray(s, dtype=np.uint64).tobytes() for s in t["sig"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "sigb": pa.array(packed, pa.binary())})

    return ioutil.nonempty_blocks(
        sigs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
        .materialize(),
        _SIGB_SCHEMA,
    )


def _verify_minhash_pairs_ds(
    pairs_ds: rd.Dataset, sigs: rd.Dataset, threshold: float
) -> rd.Dataset:
    """Distributed verification for the scale path: candidate pairs join the
    packed-signature table on each side (pair-bounded int64-keyed hash
    joins; the signature side shuffles ~512 B/doc — the same order the
    banding pass already paid), then signature agreement >= threshold is
    checked vectorized per batch. Returns the verified (a, b) Dataset."""
    from raycrawl import ioutil

    n_parts = _join_parts()
    sigb = _sig_binary_ds(sigs)
    j1 = pairs_ds.join(
        sigb, "inner", num_partitions=n_parts, on=("a",), right_on=("doc_id",)
    ).map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "sig_a": t["sigb"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j1 = ioutil.nonempty_blocks(
        j1.materialize(),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("sig_a", pa.binary())]),
    )
    j2 = j1.join(
        sigb, "inner", num_partitions=n_parts, on=("b",), right_on=("doc_id",)
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        A = np.frombuffer(
            b"".join(t["sig_a"].to_pylist()), dtype=np.uint64
        ).reshape(t.num_rows, _N_PERM)
        B = np.frombuffer(
            b"".join(t["sigb"].to_pylist()), dtype=np.uint64
        ).reshape(t.num_rows, _N_PERM)
        keep = (A == B).mean(axis=1) >= threshold
        return t.filter(pa.array(keep)).select(["a", "b"])

    return j2.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def _minhash_drop(sf_dir: str, threshold: float = 0.7):
    """MinHash-LSH near-dup DROP ids (non-min id per duplicate component):
    a SET on the driver path, a single-column `id` DATASET on the scale
    path (see the size-dispatch contract of `_lsh_candidate_pairs`).

    Driver path: verification pulls ONLY the candidate signatures (bounded
    by the pair threshold) and checks agreement >= threshold; union-find on
    the driver. Scale path: join-verified pairs + distributed min-label
    propagation — nothing pair-shaped lands on the driver."""
    docs = _read_docs(sf_dir)
    sigs = docs.map_batches(
        minhash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    pairs = _lsh_candidate_pairs(sigs)
    if isinstance(pairs, rd.Dataset):
        return _components_drop_ds(_verify_minhash_pairs_ds(pairs, sigs, threshold))
    if not pairs:
        return set()
    cand_ids = {x for p in pairs for x in p}
    cref = ray.put(pa.array(sorted(cand_ids), pa.int64()))

    sig_by_id: dict[int, np.ndarray] = {}
    for b in sigs.map_batches(
        _keep_in_fn(cref, "doc_id"),
        batch_format="pyarrow", zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow"):
        for i, s in zip(b["doc_id"].to_pylist(), b["sig"].to_pylist()):
            sig_by_id[i] = np.asarray(s, dtype=np.uint64)
    verified = [
        (a, b)
        for a, b in sorted(pairs)
        if (sig_by_id[a] == sig_by_id[b]).mean() >= threshold
    ]
    return _components_drop(verified)


def minhash_drop_ids(sf_dir: str, threshold: float = 0.7) -> set[int]:
    """Driver-set convenience contract (kept for small-corpus callers): on
    the scale path this PULLS the drop Dataset — compose `_minhash_drop` +
    `_apply_drop` instead when the corpus may carry web-scale dup density
    (prep_corpus does)."""
    drop = _minhash_drop(sf_dir, threshold)
    if isinstance(drop, set):
        return drop
    return {int(r["id"]) for r in drop.take_all()}


def minhash_dedup(sf_dir: str, threshold: float = 0.7) -> rd.Dataset:
    """Full MinHash-LSH dedup over documents: returns the kept doc_ids as a
    DATASET — the drop set is broadcast (small) or anti-joined (scale
    path), so neither the keep list nor the scale-path drop set ever
    materializes on the driver."""
    drop = _minhash_drop(sf_dir, threshold)
    return _apply_drop(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]),
        drop,
        "doc_id",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: str) -> int:
    """64-bit SimHash over whitespace tokens."""
    toks = text.split()
    if not toks:
        return 0
    hs = _token_hashes(toks)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_batch(t: pa.Table, col: str = "text") -> pa.Table:
    vals = [simhash(x or "") for x in t[col].to_pylist()]
    return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(vals, pa.uint64())})


def _sim_bucket_pairs(g: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    if len(g) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    g = g.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sh = g["simhash"].to_numpy().astype(np.uint64)
    a_out, b_out = [], []
    for i in range(len(ids)):
        x = sh[i + 1 :] ^ sh[i]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.flatnonzero(ham <= max_hamming):
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + j]))
    return pd.DataFrame({"a": a_out, "b": b_out}, dtype="int64")


def _sim_partition_pairs(g: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    """Verified SimHash pairs for ONE bkey(-hash-partition) frame: the
    singleton kill is a vectorized transform and only multi-occupancy
    buckets reach the pairwise hamming loop — shared by the driver-local
    path (whole band-row set = one partition) and the distributed
    partition-wise map_groups, so both paths run identical bucket logic."""
    sizes = g.groupby("bkey")["doc_id"].transform("size")
    multi = g[sizes >= 2]
    if multi.empty:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    frames = [
        _sim_bucket_pairs(sub, max_hamming)
        for _, sub in multi.groupby("bkey", sort=False)
    ]
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    return pd.concat(frames, ignore_index=True)


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup: 4x16-bit band buckets (any pair within hamming<=3
    shares at least one exact 16-bit band by pigeonhole), verified by true
    hamming distance in-bucket. Returns kept doc_ids as a Dataset (drop
    set broadcast, keep applied distributed)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
        override_num_blocks=4 * ncpu,
    )
    sh = docs.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        vals = t["simhash"].to_pylist()
        od, ok, ov = [], [], []
        for d, v in zip(ids, vals):
            for b in range(4):
                band = (v >> (16 * b)) & 0xFFFF
                od.append(d)
                ok.append((b << 16) | band)
                ov.append(v)
        return pa.table(
            {
                "doc_id": pa.array(od, pa.int64()),
                "bkey": pa.array(ok, pa.int64()),
                "simhash": pa.array(ov, pa.uint64()),
            }
        )

    banded = sh.map_batches(explode, batch_format="pyarrow")
    if docs.count() * 4 <= BAND_ROWS_DRIVER_MAX:
        # same hybrid dispatch as _lsh_candidate_pairs: skip the fixed
        # all-to-all floor for slim band-row sets; identical bucket logic
        parts = [
            b.to_pandas()
            for b in banded.iter_batches(batch_format="pyarrow")
            if b.num_rows and "bkey" in b.column_names
        ]  # zero-column leak guard — see _lsh_candidate_pairs
        pairs = set()
        if parts:
            df = pd.concat(parts, ignore_index=True)
            for r in _sim_partition_pairs(df, max_hamming).itertuples():
                pairs.add((int(r.a), int(r.b)))
        drop = _components_drop(sorted(pairs))
    else:
        from raycrawl import ioutil

        # partition-wise, not per-bucket: groupby(bkey).map_groups would pay
        # one Python pandas call per band bucket (~4x corpus size, mostly
        # singletons); bkey%P gives P calls with the same bucket logic
        banded = banded.map_batches(
            lambda t: t.append_column(
                "part", pc.cast(
                    pc.bit_wise_and(
                        t["bkey"], pa.scalar(_N_BUCKET_PARTS - 1, pa.int64())
                    ),
                    pa.int32(),
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        pairs_ds = banded.groupby("part").map_groups(
            lambda g: _pairs_arrow(_sim_partition_pairs(g, max_hamming)),
            batch_format="pandas",
        )
        # hamming verification already happened in-bucket; bands can emit
        # the same pair up to 4x, so distinct before the size dispatch
        pairs_ds = ioutil.nonempty_blocks(
            _distinct_pairs_ds(pairs_ds).materialize(), _PAIR_SCHEMA
        )
        if pairs_ds.count() <= PAIR_ROWS_DRIVER_MAX:
            pairs = {(int(r["a"]), int(r["b"])) for r in pairs_ds.take_all()}
            drop = _components_drop(sorted(pairs))
        else:
            drop = _components_drop_ds(pairs_ds)
    # drop set broadcast (small) or anti-joined (scale path) as a
    # distributed filter — the full doc_id list never lands on the driver
    return _apply_drop(docs.select_columns(["doc_id"]), drop, "doc_id")


def _exact_dup_drop(sf_dir: str):
    """Exact-dedup DROP ids: for every group of identical texts (64-bit
    content hash key), every id except the min. Complements
    relational.q_dedup_exact (which returns the keep side). Hybrid
    dispatch: a SET below DROP_BROADCAST_MAX duplicate ids, else the
    single-column `id` DATASET (feed to `_apply_drop`) — the drop list
    scales with duplicate count, O(corpus) at web dup density."""
    from raycrawl import core, ioutil

    def hash_text(t: pa.Table) -> pa.Table:
        # 63-bit int64 key — see relational.q_dedup_exact (same group key)
        hs = [core.url_hash(x) & ((1 << 63) - 1) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(hs, pa.int64())})

    def non_min_part(g: pd.DataFrame) -> pa.Table:
        """Non-min ids for ONE h-hash partition (partition-wise, not
        per-hash-group: one Python call per partition instead of one per
        distinct text). Sort by (h, doc_id) then drop the first row per h
        == drop the min doc_id per content hash — identical selection.
        Typed Arrow output so empties never go zero-column."""
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        ids = g[g["h"].duplicated()]["doc_id"]
        return pa.table(
            {"id": pa.array(ids.to_numpy(dtype=np.int64, copy=False), pa.int64())}
        )

    ds = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(hash_text, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.append_column(
                "part", pc.cast(
                    pc.bit_wise_and(
                        t["h"], pa.scalar(_N_BUCKET_PARTS - 1, pa.int64())
                    ),
                    pa.int32(),
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("part")
        .map_groups(non_min_part, batch_format="pandas")
    )
    ds = ioutil.nonempty_blocks(ds.materialize(), _DROP_SCHEMA)
    if ds.count() <= DROP_BROADCAST_MAX:
        return {int(r["id"]) for r in ds.take_all()}
    return ds


def exact_dup_drop_ids(sf_dir: str) -> set[int]:
    """Driver-set convenience contract: on the scale path this PULLS the
    drop Dataset — compose `_exact_dup_drop` + `_apply_drop` instead when
    the corpus may carry web-scale dup density (prep_corpus does)."""
    drop = _exact_dup_drop(sf_dir)
    if isinstance(drop, set):
        return drop
    return {int(r["id"]) for r in drop.take_all()}


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification measure + full dedup operator)
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa = set(shingles(a, n).tolist())
    sb = set(shingles(b, n).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def jaccard_dedup(sf_dir: str, threshold: float = 0.7) -> rd.Dataset:
    """Near-dup dedup verified by TRUE word-3-gram Jaccard instead of the
    signature estimate: candidate pairs come from the same MinHash-LSH
    banding shuffle (cheap, high recall), but verification pulls the
    CANDIDATE documents' exact shingle sets (a distributed filtered pass,
    bounded by duplicate density — never the corpus) and compares real
    set overlap. Keep = min id per verified component; returned as a
    Dataset with the drop set broadcast (same contract as minhash_dedup)."""
    docs = _read_docs(sf_dir)
    sigs = docs.map_batches(
        minhash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    pairs = _lsh_candidate_pairs(sigs)
    if isinstance(pairs, rd.Dataset):
        drop = _components_drop_ds(_verify_jaccard_pairs_ds(pairs, docs, threshold))
        return _apply_drop(
            rd.read_parquet(
                os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
            ),
            drop,
            "doc_id",
        )
    drop: set[int] = set()
    if pairs:
        cand_ids = {x for p in pairs for x in p}
        cref = ray.put(pa.array(sorted(cand_ids), pa.int64()))

        def pull_shingle_sets(t: pa.Table, _r=cref) -> pa.Table:
            """Distributed candidate-only pass (plain task — the broadcast
            fetch is a zero-copy plasma read, see _keep_in_fn): emit each
            candidate doc's UNIQUE shingle hashes (uint64 list) — the
            exact-Jaccard payload, bounded by duplicate density."""
            wanted = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
            sub = t.filter(pc.is_in(t["doc_id"], value_set=wanted))
            sets = [
                np.unique(shingles(x or "")).tolist()
                for x in sub["text"].to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": sub["doc_id"],
                    "sh": pa.array(sets, pa.list_(pa.uint64())),
                }
            )

        sh_by_id: dict[int, frozenset] = {}
        for b in docs.map_batches(
            pull_shingle_sets,
            batch_format="pyarrow", zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow"):
            for i, s in zip(b["doc_id"].to_pylist(), b["sh"].to_pylist()):
                sh_by_id[i] = frozenset(s)

        def _jac(a: frozenset, b: frozenset) -> float:
            if not a and not b:
                return 1.0
            if not a or not b:
                return 0.0
            return len(a & b) / len(a | b)

        verified = [
            (a, b) for a, b in sorted(pairs)
            if _jac(sh_by_id[a], sh_by_id[b]) >= threshold
        ]
        drop = _components_drop(verified)
    return _apply_drop(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]),
        drop,
        "doc_id",
    )


def _verify_jaccard_pairs_ds(
    pairs_ds: rd.Dataset, docs: rd.Dataset, threshold: float
) -> rd.Dataset:
    """Scale-path true-Jaccard verification: each doc's UNIQUE shingle
    hashes pack into one binary value (pyarrow joins reject list payloads)
    and join onto the candidate pairs from both sides; exact set overlap is
    computed per pair inside the batch. The shingle shuffle is corpus-
    bounded (~8 B/token) and the pair side is candidate-bounded — nothing
    lands on the driver."""
    from raycrawl import ioutil

    n_parts = _join_parts()

    def pack_shingles(t: pa.Table) -> pa.Table:
        packed = [
            np.unique(shingles(x or "")).tobytes() for x in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "shb": pa.array(packed, pa.binary())}
        )

    shb = ioutil.nonempty_blocks(
        docs.map_batches(
            pack_shingles, batch_format="pyarrow", zero_copy_batch=True
        ).materialize(),
        pa.schema([("doc_id", pa.int64()), ("shb", pa.binary())]),
    )
    j1 = pairs_ds.join(
        shb, "inner", num_partitions=n_parts, on=("a",), right_on=("doc_id",)
    ).map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "sh_a": t["shb"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j1 = ioutil.nonempty_blocks(
        j1.materialize(),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("sh_a", pa.binary())]),
    )
    j2 = j1.join(
        shb, "inner", num_partitions=n_parts, on=("b",), right_on=("doc_id",)
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        keep = []
        for sa, sb in zip(t["sh_a"].to_pylist(), t["shb"].to_pylist()):
            A = np.frombuffer(sa, dtype=np.uint64)
            B = np.frombuffer(sb, dtype=np.uint64)
            if not len(A) and not len(B):
                keep.append(True)
                continue
            if not len(A) or not len(B):
                keep.append(False)
                continue
            inter = np.intersect1d(A, B, assume_unique=True).size
            keep.append(inter / (len(A) + len(B) - inter) >= threshold)
        return t.filter(pa.array(keep)).select(["a", "b"])

    return j2.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
