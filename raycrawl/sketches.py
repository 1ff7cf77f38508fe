"""Approximate sketches (A6): HyperLogLog distinct-count.

Partial-final shape: each batch folds its hashes into a small register
array inside `map_batches` (the partial), registers merge by elementwise
max (the combine), the driver finalizes — only `2^p` bytes per batch leave
the shuffle, never the values. Flagged non-reference (the reference's seen
set is exact); used for cheap cardinality telemetry at 10^10 scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HLL:
    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values: list) -> np.ndarray:
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            out[i] = int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
            )
        return out

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(h), dtype=np.uint8)
        bits = np.uint64(0x8000000000000000)
        cur = rest.copy()
        rank = np.ones(len(h), dtype=np.uint8)
        mask = np.ones(len(h), dtype=bool)
        for _ in range(64):
            top = (cur & bits) != 0
            done = mask & top
            ranks[done] = rank[done]
            mask &= ~top
            if not mask.any():
                break
            cur = cur << np.uint64(1)
            rank += 1
        np.maximum.at(self.registers, idx, ranks)

    def add(self, values: list) -> None:
        if values:
            self.add_hashes(self._hash64(values))

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting small-range fix
        return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """HLL over one column of a Dataset: partial per batch, merge on the
    driver (each partial is 4 KiB at p=12)."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add(t[col].to_pylist())
        return pa.table({"registers": pa.array([h.registers.tobytes()], pa.binary())})

    merged = HLL(p)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["registers"].to_pylist():
            other = HLL(p)
            other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            merged.merge(other)
    return merged.estimate()


def q_approx_distinct(sf_dir: str):
    """queries() surface (rows-only — approximate by construction):
    HLL estimate of distinct user_ids in events, with the exact count
    alongside so the error is visible."""
    import os

    import ray.data as rd

    from ray.data.aggregate import Count

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    # exact companion computed cluster-side: distinct keys reduce in the
    # groupby shuffle; only the group count reaches the driver
    exact = ds.groupby("user_id").aggregate(Count(alias_name="n")).count()
    return pa.table(
        {
            "estimate": pa.array([est], pa.float64()),
            "exact": pa.array([exact], pa.int64()),
            "rel_err": pa.array([abs(est - exact) / max(1, exact)], pa.float64()),
        }
    )
