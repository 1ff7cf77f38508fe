"""Cuckoo filter (ST1 fast path) — numpy-backed, deterministic.

Standard (2,4)-cuckoo filter: 2 candidate buckets x 4 slots, 16-bit
fingerprints, partial-key cuckoo hashing for eviction. Batched
`contains_many` is fully vectorized; inserts are per-item (amortized O(1)).
Mandated by BASELINE.json (north_star/north_rule: "sharded cuckoo-filter
URL-seen set"); the exact-set backstop lives in the SeenShard actor, which
re-checks cuckoo positives so the overall seen set is exact.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    MAX_KICKS = 500

    def __init__(self, capacity: int) -> None:
        # 4 slots/bucket, ~95% load ceiling -> round buckets up to power of 2
        nb = 1
        while nb * 4 * 0.95 < capacity:
            nb *= 2
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, 4), dtype=np.uint16)  # 0 == empty
        self.count = 0
        self._kick_seed = 0  # deterministic eviction slot rotation

    # -- hashing ----------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & self.mask).astype(np.uint64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i ^ (fp.astype(np.uint64) * _MIX)) & self.mask

    # -- queries ----------------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        fpc = fp[:, None]
        in1 = (self.table[i1] == fpc).any(axis=1)
        in2 = (self.table[i2] == fpc).any(axis=1)
        return in1 | in2

    def contains(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.uint64))[0])

    # -- inserts ----------------------------------------------------------
    def _try_place(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empties = np.flatnonzero(row == 0)
        if empties.size:
            row[empties[0]] = fp
            return True
        return False

    def add(self, h: int) -> bool:
        """Insert one hash. Returns False only if the filter is full
        (MAX_KICKS evictions exhausted) — caller should then grow/flag."""
        ha = np.array([h], dtype=np.uint64)
        fp = int(self._fp(ha)[0])
        i1 = int(self._i1(ha)[0])
        i2 = int(self._alt(np.array([i1], dtype=np.uint64), np.array([fp], dtype=np.uint16))[0])
        if self._try_place(i1, fp) or self._try_place(i2, fp):
            self.count += 1
            return True
        i = i1 if (self._kick_seed & 1) == 0 else i2
        for _ in range(self.MAX_KICKS):
            slot = self._kick_seed % 4
            self._kick_seed += 1
            evicted = int(self.table[i][slot])
            self.table[i][slot] = fp
            fp = evicted
            i = int(self._alt(np.array([i], dtype=np.uint64), np.array([fp], dtype=np.uint16))[0])
            if self._try_place(i, fp):
                self.count += 1
                return True
        return False

    def delete(self, h: int) -> bool:
        """Remove one occurrence of h's fingerprint (standard cuckoo
        deletion — correct when each item was inserted at most once, which
        the exact-set guard in SeenShard ensures)."""
        ha = np.array([h], dtype=np.uint64)
        fp = int(self._fp(ha)[0])
        i1 = int(self._i1(ha)[0])
        i2 = int(self._alt(np.array([i1], dtype=np.uint64), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            row = self.table[i]
            hits = np.flatnonzero(row == fp)
            if hits.size:
                row[hits[0]] = 0
                self.count -= 1
                return True
        return False

    def add_many(self, hashes: np.ndarray) -> int:
        ok = 0
        for h in hashes:
            if self.add(int(h)):
                ok += 1
        return ok

    @property
    def load_factor(self) -> float:
        return self.count / (self.nbuckets * 4)
