"""Generic relational operators over the driver testdata tables
(SURVEY.md §2.2/2.4-2.7 — the DuckDB-oracle-checked layer).

Each `q_*` function takes `sf_dir` and returns a Dataset / pyarrow Table
whose COLUMN NAMES exactly match the oracle SQL aliases in
`raycrawl.registry` (the driver's compare is name-sensitive).

These are exactly the shuffle primitives the crawl needs — join (J1),
anti/semi (J2/J4), as-of (J5), grouped aggregates (A1-A5), sort/top-k/
head-n (O1-O5), dedup (D1), union (D3) — expressed over the TPC-H-ish
tables so the driver can verify them against DuckDB.

Scale discipline: every read prunes columns; small dimension sides are
broadcast via ray.put, never shuffled; aggregates ship only their key +
value columns into the shuffle.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ray.data.aggregate import Count, Max, Mean, Min, Sum


from raycrawl import core


def _pq(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Sources / simple maps / filters
# ---------------------------------------------------------------------------


def q_read_pages_count(sf_dir: str):
    n = _pq(sf_dir, "documents", ["doc_id"]).count()
    return pa.table({"n": pa.array([n], pa.int64())})


def q_lang_filter(sf_dir: str):
    return (
        _pq(sf_dir, "documents", ["doc_id", "lang"])
        .filter(expr="lang == 'en'")
    )


def q_filter_pred(sf_dir: str):
    return (
        _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater(t["l_quantity"], 30), pc.less_equal(t["l_discount"], 0.05))
            ).select(["l_orderkey", "l_quantity", "l_extendedprice"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def q_json_extract(sf_dir: str):
    """M14: parse the events.props JSON column (vectorized json.loads)."""

    def extract(t: pa.Table) -> pa.Table:
        ks = [json.loads(p).get("k") for p in t["props"].to_pylist()]
        return pa.table(
            {"event_id": t["event_id"], "k": pa.array(ks, pa.int64())}
        )

    return _pq(sf_dir, "events", ["event_id", "props"]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )


def q_field_normalize(sf_dir: str):
    """M8: vectorized pyarrow.compute string normalization."""

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "name_norm": pc.utf8_upper(pc.utf8_trim_whitespace(t["c_name"])),
                "seg_pfx": pc.utf8_slice_codeunits(t["c_mktsegment"], 0, 3),
            }
        )

    return _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )


def q_url_canonicalize(sf_dir: str):
    """M1 against a SQL-computable oracle: build a structured dirty URL per
    doc_id, canonicalize with the real engine fn; SQL computes the expected
    canonical form directly (lowercase, strip :80, strip #frag)."""

    def canon(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        dirty = [f"HTTP://H{i % 20:03d}.EXAMPLE:80/a/../p/{i:06d}#frag" for i in ids]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url_norm": pa.array([core.canonicalize_url(u) for u in dirty], pa.string()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A5)
# ---------------------------------------------------------------------------


def q_groupby_agg(sf_dir: str):
    return (
        _pq(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
        .groupby("l_returnflag")
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Count(alias_name="n"),
            Max("l_quantity", alias_name="max_qty"),
            Min("l_quantity", alias_name="min_qty"),
            Mean("l_quantity", alias_name="avg_qty"),
        )
    )


def q_groupby_multi(sf_dir: str):
    return (
        _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
    )


def q_global_agg(sf_dir: str):
    ds = _pq(sf_dir, "lineitem", ["l_quantity", "l_shipdate"])
    out = ds.aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Min("l_shipdate", alias_name="min_ship"),
        Max("l_shipdate", alias_name="max_ship"),
    )
    return pa.table({k: [v] for k, v in out.items()})


def q_distinct(sf_dir: str):
    vals = sorted(_pq(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def q_partial_final(sf_dir: str):
    """A5: canonical partial+final split — per-batch combiner inside
    map_batches (shrinks the shuffle to one row per batch per key), then a
    small groupby sum. Result == plain groupby count/sum."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("event_id", "count"), k_min=("event_id", "min")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _pq(sf_dir, "events", ["event_type", "event_id"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        ds.groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Min("k_min", alias_name="min_event_id"))
    )


def q_window_agg(sf_dir: str):
    """Hourly per-type counts — epoch-hour bucket keeps the key integral."""

    def bucket(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        hour = pc.divide(us, 3_600_000_000)
        return pa.table({"event_type": t["event_type"], "hour_id": hour})

    return (
        _pq(sf_dir, "events", ["event_type", "ts"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour_id"])
        .aggregate(Count(alias_name="n"))
    )


# ---------------------------------------------------------------------------
# Joins (J1-J5)
# ---------------------------------------------------------------------------


def q_join_fetch(sf_dir: str):
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    out = li.join(orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
    return out.map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["l_orderkey"],
                "custkey": t["o_custkey"],
                "quantity": t["l_quantity"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_anti_join(sf_dir: str):
    """J2 left-anti (the 404-miss shape): customers with no high-value
    order, via left_outer join + null filter. The price threshold keeps the
    result non-trivial at every sf level."""
    cust = _pq(sf_dir, "customer", ["c_custkey"])
    custs_with_orders = (
        _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .filter(expr="o_totalprice > 300000")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="cnt"))
    )
    out = cust.join(
        custs_with_orders, "left_outer", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    return out.map_batches(
        lambda t: t.filter(pc.is_null(t["cnt"])).select(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_semi_join(sf_dir: str):
    """J4 semi: customers having >=1 order."""
    cust = _pq(sf_dir, "customer", ["c_custkey"])
    custs_with_orders = (
        _pq(sf_dir, "orders", ["o_custkey"]).groupby("o_custkey").aggregate(Count(alias_name="cnt"))
    )
    out = cust.join(
        custs_with_orders, "inner", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    return out.select_columns(["c_custkey"])


def q_broadcast_join(sf_dir: str):
    """J3: dimension broadcast — nation is ray.put once, looked up per
    batch inside map_batches; no shuffle of the fact side."""
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"])
    ref = ray.put((nat["n_nationkey"].combine_chunks(), nat["n_name"].combine_chunks()))

    def attach(t: pa.Table, _r=ref) -> pa.Table:
        # plain task: the dimension fetch is a zero-copy plasma read per
        # task (~µs); an actor pool would pay per-actor spin-up instead
        keys, names = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
        pos = pc.index_in(t["c_nationkey"], value_set=keys)
        return pa.table(
            {"c_custkey": t["c_custkey"], "n_name": names.take(pos)}
        )

    return _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True,
    )


def q_asof_latest(sf_dir: str):
    """J5 as-of: latest event per user (grouped argmax with pinned
    tie-break (ts desc, event_id desc))."""

    _P = 64

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part",
            pc.cast(
                pc.bit_wise_and(t["user_id"], pa.scalar(_P - 1, pa.int64())),
                pa.int32(),
            ),
        )

    def latest_part(g: pd.DataFrame) -> pd.DataFrame:
        # partition-wise (one Python call per partition, not per user):
        # stable sort + first-per-user == per-user argmax with the same
        # pinned tie-break
        g = g.sort_values(
            ["user_id", "ts", "event_id"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        out = g[~g["user_id"].duplicated()]
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "last_event_id": out["event_id"].to_numpy(),
            }
        )

    return (
        _pq(sf_dir, "events", ["user_id", "event_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(latest_part, batch_format="pandas")
    )


def q_range_join_user(sf_dir: str):
    """Range join, equi-key + range residual: for each event, the
    same-user events in the PRECEDING 24 h (f.ts in [e.ts-24h, e.ts)),
    aggregated to hash-stable ints (count + min/max neighbor id; events
    with no predecessor drop, matching the SQL inner join).

    Scale shape: hash-partition on the equi key (user_id % P, the
    partition-wise rule) and compute the variable-length time window
    INSIDE each partition with a C-implemented pandas time rolling —
    never the naive per-user self-join, whose intermediate is quadratic
    in events-per-user."""
    _P = 64

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part",
            pc.cast(
                pc.bit_wise_and(t["user_id"], pa.scalar(_P - 1, pa.int64())),
                pa.int32(),
            ),
        )

    def window_part(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # closed='left' == [e.ts - 24h, e.ts): the exact SQL predicate,
        # strict upper bound so equal-ts rows (and the row itself) drop.
        # The rolling result is indexed (user_id, ts) but its ROW ORDER is
        # group-concatenation order == g's order (g is sorted by user_id
        # first), so positional alignment is exact; empty windows yield
        # NaN, not 0.
        r = g.groupby("user_id").rolling("24h", on="ts", closed="left")["event_id"]
        n = np.nan_to_num(r.count().to_numpy())
        mn = r.min().to_numpy()
        mx = r.max().to_numpy()
        keep = n > 0
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[keep],
                "n_prev": n[keep].astype("int64"),
                "min_prev_id": mn[keep].astype("int64"),
                "max_prev_id": mx[keep].astype("int64"),
            }
        )

    return (
        _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(window_part, batch_format="pandas")
    )


_RANGE_BUCKET_US = 600_000_000  # 10 min, microseconds


def q_range_join_bucket(sf_dir: str):
    """PURE range join (no equality key): for each event, ALL events in
    the preceding 10 min, any user. Ray Data has no inequality join, so
    this is the canonical bucket-replication rewrite: quantize time into
    buckets exactly one window wide, keep each probe row in its own
    bucket, replicate each build row into its bucket and the next one
    (a [ts, ts+W) window overlaps at most 2 W-wide buckets), equi-join
    on bucket inside each partition, then apply the exact residual
    predicate vectorized. Every qualifying pair lands in EXACTLY one
    bucket (the probe's), so no dedup pass is needed.

    Partitioning assumption (document per the custom-operator rule):
    bucket width >= window length bounds replication at 2x, and skew is
    events-per-window — a corpus with pathological time hot spots needs
    a narrower bucket + part salt."""
    import numpy as np

    _P = 64

    def expand(t: pa.Table) -> pa.Table:
        ids = t["event_id"].combine_chunks()
        us = pc.cast(t["ts"], pa.int64())
        b = pc.divide(us, _RANGE_BUCKET_US)
        # 0-filled (not null) placeholders: Arrow nulls turn int64 columns
        # into float64/NaN on the pandas side of map_groups
        zero = pa.array(np.zeros(len(ids), dtype=np.int64))

        def side_tbl(side, bucket, e_id, e_ts, f_id, f_ts):
            n = len(ids)
            return pa.table(
                {
                    "side": pa.array(np.full(n, side, dtype=np.int8)),
                    "bucket": bucket,
                    "e_id": e_id,
                    "e_ts": e_ts,
                    "f_id": f_id,
                    "f_ts": f_ts,
                }
            )

        probe = side_tbl(0, b, ids, us, zero, zero)
        build0 = side_tbl(1, b, zero, zero, ids, us)
        build1 = side_tbl(
            1, pc.add(b, pa.scalar(1, pa.int64())), zero, zero, ids, us
        )
        return pa.concat_tables([probe, build0, build1])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part",
            pc.cast(
                pc.bit_wise_and(t["bucket"], pa.scalar(_P - 1, pa.int64())),
                pa.int32(),
            ),
        )

    def pair_part(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g["side"] == 0][["bucket", "e_id", "e_ts"]]
        build = g[g["side"] == 1][["bucket", "f_id", "f_ts"]]
        m = probe.merge(build, on="bucket")  # C hash join on the bucket
        ets = m["e_ts"].to_numpy()
        fts = m["f_ts"].to_numpy()
        m = m[(fts < ets) & (fts >= ets - _RANGE_BUCKET_US)]
        if m.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "n_near": pd.Series([], dtype="int64"),
                    "min_near_id": pd.Series([], dtype="int64"),
                    "max_near_id": pd.Series([], dtype="int64"),
                }
            )
        agg = m.groupby("e_id")["f_id"].agg(["size", "min", "max"]).reset_index()
        return pd.DataFrame(
            {
                "event_id": agg["e_id"].to_numpy(),
                "n_near": agg["size"].to_numpy().astype("int64"),
                "min_near_id": agg["min"].to_numpy().astype("int64"),
                "max_near_id": agg["max"].to_numpy().astype("int64"),
            }
        )

    return (
        _pq(sf_dir, "events", ["event_id", "ts"])
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pair_part, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Sort / top-k / head-n / sample (O1-O5)
# ---------------------------------------------------------------------------


def q_topk(sf_dir: str):
    return (
        _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q_sort_multi(sf_dir: str):
    """O1 multi-key sort (priority-order analog). Hash compare is
    order-insensitive, so correctness of the *content* is what's checked;
    the ordering itself is asserted in pytest."""
    return (
        _pq(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_orderkey"])
        .sort(["o_orderpriority", "o_orderdate", "o_orderkey"])
        .limit(100)
    )


def q_host_topk(sf_dir: str):
    return (
        _pq(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "source"], descending=[True, False])
        .limit(5)
    )


def q_group_headn(sf_dir: str):
    """O5 per-group head-n (the politeness-quota shape): newest 3 orders
    per customer. Partition-wise (the dedup.py banding pattern): grouping
    by `custkey % P` pays P Python calls instead of one per customer
    (~10k at sf0.1), and the per-customer head-3 inside each partition is
    one stable sort + vectorized cumcount — identical selection to a
    per-customer sort_values().head(3)."""
    _P = 64

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part",
            pc.cast(
                pc.bit_wise_and(t["o_custkey"], pa.scalar(_P - 1, pa.int64())),
                pa.int32(),
            ),
        )

    def head3_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        keep = g.groupby("o_custkey", sort=False).cumcount() < 3
        return g.loc[keep, ["o_orderkey", "o_custkey"]]

    return (
        _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(head3_part, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Set ops / dedup (D1-D4)
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    """D1 exact dedup by content: min doc_id per identical text.
    Shuffle key is a 64-bit content hash, not the text itself."""

    def hash_text(t: pa.Table) -> pa.Table:
        # 63-bit mask keeps the shuffle key a NATIVE int64: Ray's aggregate
        # round-trips key values through Python ints and falls back to
        # pickled-object columns on uint64 overflow (slow, noisy)
        hs = [core.url_hash(x) & ((1 << 63) - 1) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(hs, pa.int64())})

    return (
        _pq(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(hash_text, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


def q_pipeline_topk(sf_dir: str):
    """TPC-H-Q3-shaped composite: selective broadcast semi-filter ->
    hash join -> grouped aggregate -> top-k. Exercises the full
    filter/join/agg/sort chain in one pipeline."""
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    building = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))[
        "c_custkey"
    ].combine_chunks()
    bref = ray.put(building)

    def semi_filter(t: pa.Table, _r=bref) -> pa.Table:
        """Broadcast semi-join filter (plain task — the key-set fetch is a
        zero-copy plasma read), membership via vectorized pc.is_in."""
        keys = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
        return t.filter(pc.is_in(t["o_custkey"], value_set=keys))

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        semi_filter, batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    joined = li.join(orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
    return (
        joined.groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .map_batches(
            lambda t: pa.table({"o_orderkey": t["l_orderkey"], "sum_qty": t["sum_qty"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .sort(["sum_qty", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q_pipeline_nation_rollup(sf_dir: str):
    """TPC-H-Q5-shaped composite: big-big hash join + two broadcast
    dimension hops (customer -> nation) -> grouped rollup by nation."""
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = pq_mod.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    # custkey -> nation name as two aligned arrays: index_in + take gives a
    # fully vectorized dictionary lookup inside the map stage.
    nmap = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    ckeys = cust["c_custkey"].combine_chunks()
    cnames = pa.array(
        [nmap.get(n) for n in cust["c_nationkey"].to_pylist()], pa.string()
    )
    cref = ray.put((ckeys, cnames))

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))

    def attach_nation(t: pa.Table, _r=cref) -> pa.Table:
        # plain task; see q_broadcast_join
        keys, names = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
        pos = pc.index_in(t["o_custkey"], value_set=keys)
        return pa.table(
            {"n_name": names.take(pos), "l_quantity": t["l_quantity"]}
        )

    return (
        joined.map_batches(
            attach_nation, batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("n_name")
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
    )


def q_window_sliding(sf_dir: str):
    """Sliding (rolling) windowed aggregate: per event_type, the trailing
    3-hour event count at each hour. Composition: tumbling hourly partial
    (shrinks the shuffle to one row per (type, hour)) -> groupby(type)
    map_groups computing the rolling sum over the SORTED hour sequence.
    Partitioning assumption: one event_type's hourly series fits one task
    (hours are bounded: cardinality = time-range/3600s, not data size)."""

    def bucket(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        hour = pc.divide(us, 3_600_000_000)
        return pa.table({"event_type": t["event_type"], "hour_id": hour})

    from ray.data.aggregate import Count

    hourly = (
        _pq(sf_dir, "events", ["event_type", "ts"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour_id"])
        .aggregate(Count(alias_name="n"))
    )

    def rolling(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour_id", kind="mergesort").reset_index(drop=True)
        hours = g["hour_id"].to_numpy()
        ns = g["n"].to_numpy()
        # RANGE frame [hour-2, hour]: sum counts of hours within distance 2
        # (hour gaps respected — this is a range window, not a row window)
        out = [int(ns[(hours >= h - 2) & (hours <= h)].sum()) for h in hours]
        g["n_3h"] = out
        return g[["event_type", "hour_id", "n", "n_3h"]]

    return hourly.groupby("event_type").map_groups(rolling, batch_format="pandas")


def q_union_all(sf_dir: str):
    a = _pq(sf_dir, "documents", ["doc_id", "lang"]).filter(expr="lang == 'en'")
    b = _pq(sf_dir, "documents", ["doc_id", "lang"]).filter(expr="lang == 'de'")
    return a.union(b).select_columns(["doc_id"])


def q_except_join(sf_dir: str):
    """D4: event types present in events but not in a static exclusion list
    — expressed as anti-join against an inline dimension."""
    excl = {"click", "view"}
    ds = _pq(sf_dir, "events", ["event_type"])
    vals = sorted(v for v in ds.unique("event_type") if v not in excl)
    return pa.table({"event_type": pa.array(vals, pa.string())})
