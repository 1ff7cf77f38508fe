"""Bounded driver-side parquet bootstrap reads.

Several operators need a SMALL deterministic driver-resident slice of a
(potentially enormous) table to bootstrap a broadcast — ANN query vectors,
the IVF k-means training sample, the BPE vocab sample. Reading the full
table for that is a driver OOM at the 100-TB design point (VERDICT r2
finding #2), so:

- value predicates (key < v) go through `pq.read_table(filters=...)`,
  which prunes row groups on column statistics at the callsite, and
- "the n smallest keys" goes through `read_lowest(...)` below, which
  reads row groups in ascending key-min-statistic order and stops as soon
  as the n smallest rows are provably in hand.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def read_lowest(path: str, key: str, n: int, columns: list[str]) -> pa.Table:
    """The `n` rows with the smallest `key` values, without a full-table
    read: row groups are visited in ascending key-min-statistic order;
    reading stops once >= n rows are in hand AND every unread group's min
    statistic exceeds the current n-th smallest key (so the result is
    exact even for overlapping groups). Groups without statistics sort
    last and force a read only while rows are still missing."""
    f = pq.ParquetFile(path)
    kidx = f.schema_arrow.names.index(key)
    groups = []
    for i in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(i).column(kidx).statistics
        mn = st.min if st is not None and st.has_min_max else None
        groups.append((mn, i))
    groups.sort(key=lambda g: (g[0] is None, g[0]))

    tabs: list[pa.Table] = []
    rows = 0
    nth_key = None  # current n-th smallest key among rows read
    for mn, i in groups:
        if rows >= n and mn is not None and nth_key is not None and mn > nth_key:
            break
        t = f.read_row_group(i, columns=columns)
        tabs.append(t)
        rows += t.num_rows
        if rows >= n:
            merged = pa.concat_tables(tabs, promote_options="default")
            order = pa.compute.sort_indices(merged[key])
            nth_key = merged[key].take(order.slice(min(n, rows) - 1, 1))[0].as_py()
    if not tabs:
        return f.schema_arrow.empty_table().select(columns)
    merged = pa.concat_tables(tabs, promote_options="default")
    order = pa.compute.sort_indices(merged[key])
    return merged.take(order.slice(0, min(n, merged.num_rows)))


def nonempty_blocks(mat_ds, schema: pa.Schema):
    """Rebuild a MATERIALIZED Ray dataset from its non-empty blocks only.

    Ray's aggregate can emit empty key-only blocks, map_groups can emit
    zero-column ones, and any 0-row block SKIPS downstream map UDFs and
    comes out zero-column — all of which poison acero hash joins. The
    probe here is metadata-only; no block lands on the driver. `schema`
    supplies a typed empty result when every block is empty."""
    import ray
    import ray.data as rd

    refs = [
        r
        for b in mat_ds.iter_internal_ref_bundles()
        for r, m in zip(b.block_refs, b.metadata)
        if (m.num_rows or 0) > 0
    ]
    if not refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)


def cpu_pool(min_actors: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster. The pool is
    demand-driven — Ray only scales toward the max while input blocks
    queue and CPUs are free — so max=ncpu never over-reserves a shared
    pipeline, while a hardcoded small max WOULD starve a wide cluster
    (a (1, 4) pool leaves 28 of 32 cores idle on the bench box)."""
    import ray

    return (min_actors, int(ray.cluster_resources().get("CPU", 8)))
