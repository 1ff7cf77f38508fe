"""Dup-density A/B harness (VERDICT r4 #2): prove the distributed
connected-components/drop path at realistic web dup density.

Generates a corpus with PLANTED near-dup clusters (controllable fraction
and cluster size — cluster size drives the verified-pair count, which is
what the CC size dispatch keys on: a k-cluster emits ~C(k,2) pairs), then
runs `minhash_dedup` once forced onto the driver union-find path and once
forced onto the distributed min-label-propagation + anti-join path, and
requires IDENTICAL keep sets. Prints one JSON line per size for
BENCH/BASELINE.md.

Run:
    python -m raycrawl.fixtures.dup_ab --docs 200000 1000000 \
        --dup-frac 0.4 --cluster 12 --out /tmp/dupab
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = 50_000
_DOC_LEN = 40


def generate_dup_corpus(
    out: str, n_docs: int, dup_frac: float, cluster_size: int, seed: int = 42
) -> dict:
    """documents.parquet with `n_docs` rows; ~dup_frac of them belong to
    near-dup clusters of `cluster_size` (each member mutates 2 tokens of
    the cluster base — near- but not exact dups). Deterministic."""
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    n_clusters = int(n_docs * dup_frac / cluster_size)
    n_dup_docs = n_clusters * cluster_size
    words = np.array([f"w{i:05d}" for i in range(_VOCAB)])

    doc_ids = np.arange(n_docs, dtype=np.int64)
    texts: list[str] = [""] * n_docs
    # cluster bases + members first (ids 0..n_dup_docs-1, interleaved is
    # irrelevant to the measurement), uniques after
    base_tok = rng.randint(0, _VOCAB, size=(n_clusters, _DOC_LEN))
    pos = 0
    for ci in range(n_clusters):
        toks = base_tok[ci]
        for m in range(cluster_size):
            t = toks.copy()
            # mutate 2 positions per member (member 0 = the base)
            if m:
                idx = rng.randint(0, _DOC_LEN, size=2)
                t[idx] = rng.randint(0, _VOCAB, size=2)
            texts[pos] = " ".join(words[t])
            pos += 1
    uniq = rng.randint(0, _VOCAB, size=(n_docs - n_dup_docs, _DOC_LEN))
    for i in range(n_docs - n_dup_docs):
        texts[pos] = " ".join(words[uniq[i]])
        pos += 1
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids), "text": pa.array(texts, pa.string())}),
        os.path.join(out, "documents.parquet"),
        row_group_size=65536,
    )
    return {
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "n_dup_docs": n_dup_docs,
        "expected_pairs_lower_bound": n_clusters
        * (cluster_size * (cluster_size - 1) // 2),
    }


def _run_mode(sf_dir: str, mode: str, threshold: float) -> dict:
    """One timed minhash_dedup run with the CC/drop dispatch pinned to
    `mode` ('driver' | 'distributed'). Banding dispatch stays natural
    (distributed at these sizes). Returns wall, kept count, id checksum."""
    from raycrawl import dedup

    if mode == "driver":
        dedup.PAIR_ROWS_DRIVER_MAX = 1 << 62
        dedup.DROP_BROADCAST_MAX = 1 << 62
    else:
        dedup.PAIR_ROWS_DRIVER_MAX = -1
        dedup.DROP_BROADCAST_MAX = -1
    t0 = time.perf_counter()
    kept = dedup.minhash_dedup(sf_dir, threshold=threshold)
    n = 0
    checksum = 0
    for b in kept.iter_batches(batch_format="pyarrow"):
        if b.num_rows and "doc_id" in b.column_names:
            n += b.num_rows
            checksum += int(
                np.asarray(b["doc_id"].to_numpy(zero_copy_only=False)).sum()
            )
    wall = time.perf_counter() - t0
    return {"mode": mode, "sec": round(wall, 2), "kept": n, "checksum": checksum}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[200_000])
    ap.add_argument("--dup-frac", type=float, default=0.4)
    ap.add_argument("--cluster", type=int, default=12)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--out", default="/tmp/dupab")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--keep-corpus", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    try:
        for n in args.docs:
            d = os.path.join(args.out, f"n{n}")
            gen = generate_dup_corpus(d, n, args.dup_frac, args.cluster)
            runs = [
                _run_mode(d, "driver", args.threshold),
                _run_mode(d, "distributed", args.threshold),
            ]
            assert runs[0]["kept"] == runs[1]["kept"], runs
            assert runs[0]["checksum"] == runs[1]["checksum"], runs
            print(
                json.dumps(
                    {
                        **gen,
                        "dup_frac": args.dup_frac,
                        "cluster": args.cluster,
                        "num_cpus": args.num_cpus,
                        "runs": runs,
                        "keep_sets_identical": True,
                    }
                ),
                flush=True,
            )
            if not args.keep_corpus:
                shutil.rmtree(d, ignore_errors=True)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
