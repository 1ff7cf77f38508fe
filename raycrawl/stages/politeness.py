"""ST3/O5 — logical-time politeness quotas with explicit skew salting.

Per round, each host may fetch `q = round_duration // max(crawl_delay,
rate_limit)` URLs (core.politeness_quota). The first q frontier rows of a
host IN CRAWL ORDER (priority, seq) are taken; the rest carry over.

Skew (BASELINE.json north_rule: "explicit skew salting for hot domains"):
a single `groupby(host)` puts a hot host's whole frontier in one task. We
shuffle on a SALTED key instead — `pkey = hash(host) ^ (url_hash % n_salts)`
for hosts whose row count exceeds `hot_threshold` (detected per round with a
cheap count aggregate), `hash(host)` otherwise. Phase 1 takes the per-salt
top-q in crawl order (a superset of the global top-q); phase 2 re-groups the
(≤ q·n_salts per host, i.e. small) phase-1 survivors by bare host and takes
the true top-q. Both phases are deterministic pure functions of the group.

No wall-clock sleeps anywhere — logical-time budgets keep the stage
deterministic and fast (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raycrawl import core
from raycrawl.core import CrawlConfig


def politeness_take_local(tbl: pa.Table, delays: dict[str, int], cfg: CrawlConfig):
    """Driver-side quota take for SMALL rounds (same pinned semantics as
    the grouped path; used below cfg.extra['driver_round_threshold'] where
    a Ray all-to-all's fixed cost would dominate a politeness-bounded
    frontier). Returns (taken, carry) pyarrow Tables in crawl order."""
    if tbl.num_rows == 0:
        return tbl, tbl
    df = tbl.to_pandas().sort_values(["host", "priority", "seq"], kind="mergesort")
    pos = df.groupby("host", sort=False).cumcount().to_numpy()
    quotas = df["host"].map(lambda h: quota_for(h, delays, cfg)).to_numpy()
    take = pos < quotas
    taken = pa.Table.from_pandas(df[take], preserve_index=False)
    carry = pa.Table.from_pandas(df[~take], preserve_index=False)
    return taken, carry


def quota_for(host: str, delays: dict[str, int], cfg: CrawlConfig) -> int:
    return core.politeness_quota(
        delays.get(host, 0), cfg.rate_limit_ms, cfg.round_duration_ms,
        cfg.max_per_host_round,
    )


def _take_group(g: pd.DataFrame, delays: dict[str, int], cfg: CrawlConfig) -> pd.DataFrame:
    """Mark the first q rows (crawl order) of one host-group `take=True`."""
    g = g.sort_values(["priority", "seq"], kind="mergesort")
    q = quota_for(g["host"].iat[0], delays, cfg)
    take = np.zeros(len(g), dtype=bool)
    take[:q] = True
    g = g.copy()
    g["take"] = take
    return g


def add_salt(t: pa.Table, hot_hosts: set[str], n_salts: int) -> pa.Table:
    """Politeness shuffle key: salted for hot hosts, 0 otherwise."""
    if t.num_rows == 0:
        return t.append_column("salt", pa.array([], pa.int32()))
    hosts = t["host"].to_pylist()
    hashes = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    salt = np.where(
        np.fromiter((h in hot_hosts for h in hosts), bool, len(hosts)),
        (hashes % np.uint64(n_salts)).astype(np.int32),
        np.int32(0),
    )
    return t.append_column("salt", pa.array(salt, pa.int32()))


def politeness_take(ds, delays: dict[str, int], cfg: CrawlConfig,
                    hot_threshold: int = 50_000, n_salts: int = 8,
                    total_rows: int | None = None):
    """Returns (taken, carry) Datasets (materialized — both are consumed
    more than once by the round driver, and re-consuming a lazy groupby
    lineage would re-run the whole shuffle).

    Hot-host detection is data-driven per round: a (host -> count)
    aggregate (cheap: two columns leave the shuffle) picks hosts above
    `hot_threshold`; only those get salted sub-groups. When the caller
    already knows the total row count is below the threshold (every round
    driver does — it counted the frontier), the detection pass is skipped
    entirely: no host can be hot.
    """
    from ray.data.aggregate import Count

    if total_rows is not None and total_rows <= hot_threshold:
        hot = set()
    else:
        counts = ds.groupby("host").aggregate(Count(alias_name="n")).to_pandas()
        hot = set(counts.loc[counts["n"] > hot_threshold, "host"]) if len(counts) else set()

    if hot:
        salted = ds.map_batches(
            lambda t: add_salt(t, hot, n_salts), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        phase1 = salted.groupby(["host", "salt"]).map_groups(
            lambda g: _take_group(g, delays, cfg), batch_format="pandas"
        )
        # survivors: taken rows re-grouped by bare host for the exact top-q
        survivors = phase1.filter(expr="take == True").drop_columns(["take", "salt"])
        carry = phase1.filter(expr="take == False").drop_columns(["take", "salt"])
        final = survivors.groupby("host").map_groups(
            lambda g: _take_group(g, delays, cfg), batch_format="pandas"
        )
        extra_carry = final.filter(expr="take == False").drop_columns(["take"])
        taken = final.filter(expr="take == True").drop_columns(["take"])
        return taken.materialize(), carry.union(extra_carry).materialize()

    marked = ds.groupby("host").map_groups(
        lambda g: _take_group(g, delays, cfg), batch_format="pandas"
    ).materialize()  # one shuffle; taken/carry below are cheap filters on it
    taken = marked.filter(expr="take == True").drop_columns(["take"])
    carry = marked.filter(expr="take == False").drop_columns(["take"])
    return taken.materialize(), carry.materialize()
