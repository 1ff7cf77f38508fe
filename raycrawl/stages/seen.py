"""ST1 — sharded URL-seen set as an actor pool (SURVEY.md §2.3).

Design point (BASELINE.json north_star): 10^10 URLs. `S` shard actors, shard
= url_hash % S. Each shard is two-tier: a cuckoo filter (fast, memory-
bounded: 16-bit fingerprints ≈ 2.4 bytes/URL at 95% load) fronting an exact
uint64 hash set; a cuckoo *negative* is definitely-new (no exact lookup),
a cuckoo positive is re-checked exactly — so the kept URL set is EXACT,
matching the reference's seenreq semantics despite filter false positives.
At the 10^10 design point the exact tier would be a spillable on-disk shard
(RocksDB-style); in this repo it is an in-memory set, which holds to ~10^8
per shard — the two-tier split is what makes the swap possible without
touching callers.

The map stage (`seen_filter`) groups each batch's hashes by shard and fans
out ONE `contains_and_add` RPC per shard per batch (not per row).

Within a round the input is already deduped (D1), so the filter is
order-insensitive — any RPC interleaving yields the same kept set, which is
what makes the stage deterministic under parallelism (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from raycrawl.state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set. Cuckoo front + exact backstop."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20) -> None:
        self.shard_id = shard_id
        self.cuckoo = CuckooFilter(capacity)
        self.exact: set[int] = set()
        self.cuckoo_full = False
        # adds of the in-flight round — rolled back if the round must be
        # re-executed after a peer shard dies (crash recovery, I4)
        self.staged: set[int] = set()

    def begin_round(self) -> int:
        """Commit the previous round's staged adds (they are now covered
        by a written seen-delta snapshot) and open a new staging scope."""
        n = len(self.staged)
        self.staged = set()
        return n

    def rollback_round(self) -> int:
        """Undo this round's adds so an idempotent round re-execution sees
        the same state the oracle would."""
        for hv in self.staged:
            self.exact.discard(hv)
            self.cuckoo.delete(hv)
        n = len(self.staged)
        self.staged = set()
        return n

    def contains_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Vector membership-test-then-insert. Returns keep mask (True =
        first sighting). Also collapses duplicates within the call."""
        h = hashes.astype(np.uint64, copy=False)
        keep = np.zeros(len(h), dtype=bool)
        maybe = self.cuckoo.contains_many(h) | self.cuckoo_full
        exact = self.exact
        staged = self.staged
        for i, (hv, m) in enumerate(zip(h.tolist(), maybe.tolist())):
            if m and hv in exact:
                continue
            exact.add(hv)
            staged.add(hv)
            if not self.cuckoo.add(hv):
                self.cuckoo_full = True
            keep[i] = True
        return keep

    def add_only(self, hashes: np.ndarray) -> int:
        """Replay path for resume: insert without reporting novelty."""
        h = hashes.astype(np.uint64, copy=False)
        before = len(self.exact)
        for hv in h.tolist():
            if hv not in self.exact:
                self.exact.add(hv)
                if not self.cuckoo.add(hv):
                    self.cuckoo_full = True
        return len(self.exact) - before

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))

    def size(self) -> int:
        return len(self.exact)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "exact": len(self.exact),
            "cuckoo_load": self.cuckoo.load_factor,
            "cuckoo_full": self.cuckoo_full,
        }


class SeenSet:
    """Driver-side handle bundle for the shard pool."""

    def __init__(self, n_shards: int, capacity_per_shard: int = 1 << 20,
                 name_prefix: str | None = None) -> None:
        self.n_shards = n_shards
        self.capacity = capacity_per_shard
        opts = {}
        self.shards = [
            SeenShard.options(
                **({"name": f"{name_prefix}-{i}", "get_if_exists": True} if name_prefix else opts)
            ).remote(i, capacity_per_shard)
            for i in range(n_shards)
        ]

    def begin_round(self) -> None:
        ray.get([s.begin_round.remote() for s in self.shards])

    def recover(self, completed_hashes_loader) -> int:
        """Crash recovery (I4): roll back the in-flight round on surviving
        shards; replace dead shards with fresh actors replayed from the
        completed-round snapshots. `completed_hashes_loader()` must return
        the full uint64 hash array of all COMMITTED rounds. Returns the
        number of shards that had to be rebuilt."""
        all_hashes = None
        rebuilt = 0
        for i, a in enumerate(self.shards):
            try:
                ray.get(a.rollback_round.remote())
                continue
            except Exception:
                rebuilt += 1
            if all_hashes is None:
                all_hashes = np.asarray(completed_hashes_loader(), dtype=np.uint64)
            fresh = SeenShard.remote(i, self.capacity)
            mine = all_hashes[all_hashes % np.uint64(self.n_shards) == i]
            ray.get(fresh.add_only.remote(mine))
            self.shards[i] = fresh
        return rebuilt

    def filter_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Fan one batch of hashes out to shards; returns keep mask aligned
        with the input order."""
        h = hashes.astype(np.uint64, copy=False)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        keep = np.zeros(len(h), dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            ix = np.flatnonzero(shard_of == s)
            if ix.size:
                refs.append(self.shards[s].contains_and_add.remote(h[ix]))
                idxs.append(ix)
        for ix, mask in zip(idxs, ray.get(refs)):
            keep[ix] = mask
        return keep

    def replay(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        ray.get([
            self.shards[s].add_only.remote(h[shard_of == s])
            for s in range(self.n_shards)
        ])

    def snapshot(self) -> np.ndarray:
        parts = ray.get([s.snapshot.remote() for s in self.shards])
        return np.concatenate(parts) if parts else np.empty(0, np.uint64)

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def kill(self) -> None:
        for s in self.shards:
            ray.kill(s, no_restart=True)


def make_seen_filter(seen: SeenSet, hash_col: str = "url_hash"):
    """Batch fn for map_batches: drops rows already seen, marks the rest."""

    def seen_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        hashes = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = seen.filter_batch(hashes)
        return t.filter(pa.array(keep))

    return seen_filter
