"""ST3/O5 — logical-time politeness quotas with explicit skew salting.

Per round, each host may fetch `q = round_duration // max(crawl_delay,
rate_limit)` URLs (core.politeness_quota). The first q frontier rows of a
host IN CRAWL ORDER (priority, seq) are taken; the rest carry over.

Skew (BASELINE.json north_rule: "explicit skew salting for hot domains"):
a single `groupby(host)` puts a hot host's whole frontier in one task. We
shuffle on a SALTED key instead — `salt = url_hash % n_salts` for hosts
whose row count exceeds `hot_threshold` (detected per round with a cheap
count aggregate), 0 otherwise — and group PARTITION-WISE on
`(pinned_hash(host) ^ salt) % P`, not per (host, salt): one Python pandas
call per partition instead of one per distinct host (millions at the
design point); the per-host head-q inside a partition is a vectorized
stable sort + cumcount. Phase 1 takes the per-salt top-q in crawl order
(a superset of the global top-q); phase 2 re-groups the (≤ q·n_salts per
host, i.e. small) phase-1 survivors by bare host and takes the true
top-q. Both phases are deterministic pure functions of the group.

No wall-clock sleeps anywhere — logical-time budgets keep the stage
deterministic and fast (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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


_POLITE_PARTS = 64  # host-hash partitions for the quota-take groupby


def _append_polite_part(t: pa.Table, with_salt: bool) -> pa.Table:
    """Partition key co-locating each host's (or (host, salt) sub-group's)
    rows: pinned 64-bit host hash (core.url_hash — deterministic across
    workers, unlike PYTHONHASHSEED-dependent builtin hash) % P, XOR'd
    with the salt on the salted phase. Hosts repeat heavily within a
    block, so only the dictionary-encoded UNIQUE hosts pay the Python
    hash; rows get theirs via a vectorized take. Zero-column blocks
    (skipped upstream UDFs on 0-row inputs) pass through untouched."""
    if t.num_columns == 0:
        return t
    enc = t["host"].combine_chunks().dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    uh = np.fromiter((core.url_hash(h) for h in uniq), np.uint64, len(uniq))
    hh = uh[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)] if len(uniq) else np.array([], np.uint64)
    if with_salt:
        hh = hh ^ t["salt"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return t.append_column(
        "ppart",
        pa.array((hh % np.uint64(_POLITE_PARTS)).astype(np.int32), pa.int32()),
    )


def _take_part(
    g: pd.DataFrame, delays: dict[str, int], cfg: CrawlConfig, by_salt: bool
) -> pd.DataFrame:
    """Mark the first q rows (crawl order) of every host-group (or
    (host, salt) sub-group) in ONE host-hash partition `take=True`.
    Partition-wise, not per-host: one Python call per partition instead
    of one per distinct host (millions at the design point). Stable sort
    + cumcount < quota == the per-group head(q) exactly."""
    keys = ["host", "salt"] if by_salt else ["host"]
    g = g.sort_values(keys + ["priority", "seq"], kind="mergesort")
    pos = g.groupby(keys, sort=False).cumcount().to_numpy()
    qmap = {h: quota_for(h, delays, cfg) for h in g["host"].unique()}
    quotas = g["host"].map(qmap).to_numpy()
    g = g.drop(columns=["ppart"]).copy()
    g["take"] = pos < quotas
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
        # the > hot_threshold filter runs CLUSTER-side so only the hot
        # hosts (bounded: total_rows / hot_threshold) reach the driver —
        # the full (host, n) table is #distinct-hosts rows at scale.
        # Zero-column guard: the aggregate can emit empty key-only blocks
        # whose filter UDF gets skipped (CLAUDE.md invariant).
        hot_rows = (
            ds.groupby("host").aggregate(Count(alias_name="n"))
            .map_batches(
                lambda t: t.filter(pc.greater(t["n"], hot_threshold))
                if t.num_columns else t,
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .take_all()
        )
        hot = {r["host"] for r in hot_rows}

    if hot:
        salted = ds.map_batches(
            lambda t: add_salt(t, hot, n_salts), batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            lambda t: _append_polite_part(t, with_salt=True),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        phase1 = salted.groupby("ppart").map_groups(
            lambda g: _take_part(g, delays, cfg, by_salt=True),
            batch_format="pandas",
        )
        # survivors: taken rows re-grouped by bare host for the exact top-q
        survivors = phase1.filter(expr="take == True").drop_columns(["take", "salt"])
        carry = phase1.filter(expr="take == False").drop_columns(["take", "salt"])
        final = survivors.map_batches(
            lambda t: _append_polite_part(t, with_salt=False),
            batch_format="pyarrow", zero_copy_batch=True,
        ).groupby("ppart").map_groups(
            lambda g: _take_part(g, delays, cfg, by_salt=False),
            batch_format="pandas",
        )
        extra_carry = final.filter(expr="take == False").drop_columns(["take"])
        taken = final.filter(expr="take == True").drop_columns(["take"])
        return taken.materialize(), carry.union(extra_carry).materialize()

    marked = ds.map_batches(
        lambda t: _append_polite_part(t, with_salt=False),
        batch_format="pyarrow", zero_copy_batch=True,
    ).groupby("ppart").map_groups(
        lambda g: _take_part(g, delays, cfg, by_salt=False),
        batch_format="pandas",
    ).materialize()  # one shuffle; taken/carry below are cheap filters on it
    taken = marked.filter(expr="take == True").drop_columns(["take"])
    carry = marked.filter(expr="take == False").drop_columns(["take"])
    return taken.materialize(), carry.materialize()
