"""The Ray Data frontier-rounds crawl driver (SURVEY.md §3.4).

One round = one Ray Data pipeline; the streaming executor pipelines the
stages within a round. Stage map (shuffle inventory in parens):

1. expand      : frontier round-K parquet (carry ∪ retries baked in at K-1)
2. politeness  : salted groupby(host) quota take          (SHUFFLE 1)
3. fetch       : corpus scan + broadcast fetch-set filter (NO shuffle; the
                 per-round fetch set is politeness-bounded, ray.put once) —
                 or Dataset.join when cfg says so          (SHUFFLE alt)
4. snapshot    : partition-wise (url_hash % P) latest-warc_ts pick on the
                 MATCHED subset (small)
5. parse       : ONE fused map_batches pass -> text + exploded links
6. expansion   : canon+hash+host, depth filter, D1 dedup   (SHUFFLE 2,
                 key=url_hash), robots broadcast filter, ST1 seen actors
7. sinks       : extracted/round=K, visits/round=K, frontier/round=K+1,
                 seen-delta/round=K, lineage row, _SUCCESS marker

Determinism: every stage is a pure function of (input rows, round number);
ordering is logical ((round, priority, host, seq), SURVEY.md §4.3), so the
outputs are invariant to num_cpus / partitioning — the engine must equal
the single-threaded `raycrawl.pyref` oracle exactly (tested).

Scale notes (10^10-URL design point):
- The corpus scan reads only (url, warc_ts, html) and never materializes;
  html is dropped right after the parse stage.
- The broadcast fetch set is bounded by the politeness budget
  (hosts x quota). Past ~10^7 entries, set cfg.extra["fetch_strategy"] =
  "join" to switch to the hash-partitioned Dataset.join path.
- Frontier lives in round-partitioned parquet (resume unit), never on the
  driver; per-round counters are aggregated from bounded datasets.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raycrawl import core
from raycrawl.core import CrawlConfig
from raycrawl.stages import politeness
from raycrawl.stages.robots import crawl_delays, load_robots_rules
from raycrawl.stages.seen import SeenSet

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_norm", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("parent_url", pa.string()),
        ("seq", pa.int64()),
        ("attempt", pa.int32()),
        ("not_before_round", pa.int32()),
        ("discovered_round", pa.int32()),
    ]
)

VISIT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("round", pa.int32()),
        ("priority", pa.int32()),
        ("host", pa.string()),
        ("seq", pa.int64()),
        ("status", pa.int32()),
    ]
)


def _visit_rows_batch(t: pa.Table, rnd: int, status: int, uas: tuple) -> pa.Table:
    """Frontier-shaped rows -> visit-sink rows (M12 UA rotation included)."""
    n = t.num_rows
    return pa.table(
        {
            "url": t["url_norm"].cast(pa.string()),
            "round": pa.array([rnd] * n, pa.int32()),
            "priority": t["priority"].cast(pa.int32()),
            "host": t["host"].cast(pa.string()),
            "seq": t["seq"].cast(pa.int64()),
            "status": pa.array([status] * n, pa.int32()),
            "user_agent": pa.array(
                [uas[s % len(uas)] for s in t["seq"].to_pylist()], pa.string()
            ),
        }
    )


def _block_row_counts(mat_ds) -> list[int]:
    """Per-block row counts of a MATERIALIZED dataset (metadata only — no
    data moves); feeds the per-partition lineage rows."""
    try:
        return [
            m.num_rows or 0
            for bundle in mat_ds.iter_internal_ref_bundles()
            for m in bundle.metadata
        ]
    except Exception:
        return [t.num_rows for t in ray.get(mat_ds.to_arrow_refs())]


def _enforce_frontier_schema(t: pa.Table) -> pa.Table:
    """Normalize any frontier-shaped block to FRONTIER_SCHEMA. Empty
    blocks can arrive schema-less (zero columns) out of filter/map_groups
    stages — pyarrow joins and casts reject those, so rebuild them."""
    if t.num_rows == 0 or t.num_columns == 0:
        return FRONTIER_SCHEMA.empty_table()
    return pa.table(
        {k: t[k].cast(FRONTIER_SCHEMA.field(k).type) for k in FRONTIER_SCHEMA.names}
    )


def _frontier_table(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r[f.name] for r in rows] for f in FRONTIER_SCHEMA}
    return pa.table(
        {k: pa.array(v, FRONTIER_SCHEMA.field(k).type) for k, v in cols.items()}
    )


def seeds_to_frontier(seed_urls: list[str], cfg: CrawlConfig,
                      rules: dict[str, core.RobotsRules]) -> tuple[pa.Table, list[int]]:
    """S2 bootstrap: seed list -> round-0 frontier rows (canon, robots,
    local dedup). Returns (frontier table, accepted url_hashes)."""
    rows, hashes, local_seen = [], [], set()
    for rank, url in enumerate(seed_urls):
        norm = core.canonicalize_url(url)
        if not norm:
            continue
        h = core.url_hash(norm)
        if h in local_seen:
            continue
        host = core.host_of(norm)
        r = rules.get(host)
        if r is not None and not r.allows_url(norm):
            continue
        local_seen.add(h)
        hashes.append(h)
        rows.append(
            dict(url=url, url_norm=norm, url_hash=h, host=host, depth=0,
                 priority=cfg.host_priorities.get(host, cfg.priority_default),
                 parent_url="", seq=rank,
                 attempt=0, not_before_round=0, discovered_round=0)
        )
    return _frontier_table(rows), hashes


_FETCH_COLS = (
    "url_norm", "url_hash", "host", "depth", "priority", "seq", "attempt",
    "parent_url", "discovered_round",
)


def _fetch_table(tabs: list[pa.Table]) -> pa.Table:
    """Round fetch set as ONE typed Arrow table (url_norm-keyed). Bounded by
    the politeness budget; broadcast via ray.put, never re-shipped per batch.
    The frontier's RAW url rides along as `url_raw` (the corpus scan owns
    the `url` name) so retry rows can preserve it, matching pyref."""
    sel = list(_FETCH_COLS) + ["url"]
    renamed = list(_FETCH_COLS) + ["url_raw"]
    parts = [
        t.select(sel).rename_columns(renamed) for t in tabs if t.num_rows
    ]
    if not parts:
        return FRONTIER_SCHEMA.empty_table().select(sel).rename_columns(renamed)
    t = pa.concat_tables(parts, promote_options="default")
    cols = {c: t[c].cast(FRONTIER_SCHEMA.field(c).type) for c in _FETCH_COLS}
    cols["url_raw"] = t["url_raw"].cast(pa.string())
    return pa.table(cols)


class _AttachFrontier:
    """Corpus-scan stage: keep rows whose url is in the broadcast fetch
    set; attach the frontier columns. The fetch table ships via ray.put
    once and is fetched in __init__ once per actor — never per batch.
    Lookup is a single vectorized index_in + take (no Python row loop)."""

    def __init__(self, fetch_ref) -> None:
        ft = ray.get(fetch_ref) if isinstance(fetch_ref, ray.ObjectRef) else fetch_ref
        self.ftab = ft
        self.keys = ft["url_norm"].combine_chunks()

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["url"], value_set=self.keys)
        valid = pc.is_valid(idx)
        sub = t.filter(valid)
        if sub.num_rows == 0:
            return _empty_matched(t)
        pos = idx.filter(valid)
        for name in self.ftab.column_names:
            sub = sub.append_column(name, self.ftab[name].take(pos))
        # position of each match in the broadcast fetch table: feeds the
        # per-block matched-position bitmaps that derive 404 misses without
        # pulling matched url strings to the driver
        return sub.append_column("fetch_pos", pc.cast(pos, pa.int64()))


def _empty_matched(t: pa.Table) -> pa.Table:
    base = t.slice(0, 0)
    for name in _FETCH_COLS:
        base = base.append_column(name, pa.array([], FRONTIER_SCHEMA.field(name).type))
    base = base.append_column("url_raw", pa.array([], pa.string()))
    return base.append_column("fetch_pos", pa.array([], pa.int64()))


_SNAP_PARTS = 64  # url_hash partitions for the per-round snapshot pick


def _latest_snapshot_part(g: pd.DataFrame) -> pd.DataFrame:
    """J5 on ONE url_hash partition of the matched subset: keep the
    max-warc_ts row per url. Partition-wise (one Python call per
    partition, not per matched url). Ties on warc_ts break by the pinned
    pyref._snap_tiekey rule — smallest (html, content_type), nulls as
    '' — so the winner is order-independent across Ray block layouts
    (r5 ADVICE fix; rows equal on all four keys are downstream-
    indistinguishable, the other matched columns ride on the frontier
    url, not the snapshot)."""
    g = g.reset_index(drop=True)
    keys = ["url", "warc_ts", "html"]
    asc = [True, False, True]
    sk = g  # sort-key view: nulls -> b''/'' for the tiekey columns ONLY —
    if g["html"].isna().any():  # the winner row keeps its original nulls
        sk = sk.assign(html=sk["html"].fillna(b""))
    if "content_type" in g.columns:
        keys.append("content_type")
        asc.append(True)
        if sk["content_type"].isna().any():
            sk = sk.assign(content_type=sk["content_type"].fillna(""))
    pos = sk.sort_values(keys, ascending=asc, kind="mergesort").index.to_numpy()
    g = g.take(pos)
    return g[~g["url"].duplicated()].drop(columns=["snap_part"])


def _append_snap_part(t: pa.Table) -> pa.Table:
    """Partition key for the snapshot-pick shuffle (url_hash %
    _SNAP_PARTS). Zero-column blocks (skipped upstream UDFs on 0-row
    inputs) pass through untouched — see _append_dedup_part."""
    if t.num_columns == 0:
        return t
    return t.append_column(
        "snap_part",
        pc.cast(
            pc.bit_wise_and(t["url_hash"], pa.scalar(_SNAP_PARTS - 1, pa.uint64())),
            pa.int32(),
        ),
    )


def _latest_snapshot_ds(matched):
    """Partition-wise distributed snapshot pick over a matched Dataset
    (rows carry the frontier's uint64 url_hash — the partition key is one
    vectorized bit_wise_and, no re-hashing)."""
    return (
        matched.map_batches(
            _append_snap_part, batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("snap_part")
        .map_groups(_latest_snapshot_part, batch_format="pandas")
    )


def _parse_batch(
    t: pa.Table, page_callback=None, site_registry=None,
    allowed_content_types: tuple = ("text/html",),
    max_batch_bytes: int = 64 << 20,
) -> pa.Table:
    """Byte-capped wrapper around the fused parse: the parse slice holds
    Python copies of the decoded html strings (`to_pylist`), so a block of
    pathological multi-MB pages is processed in sub-slices of at most
    `max_batch_bytes` of html each — peak per-task Python heap is bounded
    by the knob (cfg.extra["parse_max_batch_bytes"]), not by block size."""
    if t.num_rows > 1 and max_batch_bytes:
        sizes = pc.fill_null(pc.binary_length(t["html"]), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if int(sizes.sum()) > max_batch_bytes:
            parts, start, acc = [], 0, 0
            for i, s in enumerate(sizes):
                if i > start and acc + int(s) > max_batch_bytes:
                    parts.append(t.slice(start, i - start))
                    start, acc = i, 0
                acc += int(s)
            parts.append(t.slice(start, t.num_rows - start))
            return pa.concat_tables(
                [
                    _parse_slice(p, page_callback, site_registry, allowed_content_types)
                    for p in parts
                ],
                promote_options="default",
            )
    return _parse_slice(t, page_callback, site_registry, allowed_content_types)


def _parse_slice(
    t: pa.Table, page_callback=None, site_registry=None,
    allowed_content_types: tuple = ("text/html",),
) -> pa.Table:
    """Fused M4+M5+M6 (+M7+M10): one HTML parse -> text + links (list
    column). Rows whose content_type matches no allowed prefix are NOT
    parsed (M10): text=null, links=[], is_html=False — they still flow to
    the visits sink but are filtered from extracted/expansion downstream.
    `page_callback` is the X3 user hook: fn(url, text, links) -> dict|None,
    surfaced as a `user_json` column. `site_registry` ({host: SiteConfig})
    runs the declarative per-site extractors while html is still in hand,
    emitting an `entities` list<string-json> column (M7/ST4)."""
    import json as _json

    htmls = t["html"].to_pylist()
    bases = t["url_norm"].to_pylist()
    if "content_type" in t.column_names:
        is_html = [
            any((c or "text/html").startswith(p) for p in allowed_content_types)
            for c in t["content_type"].to_pylist()
        ]
    else:  # corpora without the column are all-HTML (input_hint schema)
        is_html = [True] * t.num_rows
    texts, links, userjs, ents = [], [], [], []
    ep = core.extract_page
    if site_registry:
        from raycrawl.stages.site import extract_entities
    for html, base, ok in zip(htmls, bases, is_html):
        if not ok:
            texts.append(None)
            links.append([])
            if page_callback is not None:
                userjs.append(None)
            if site_registry:
                ents.append([])
            continue
        text, ls = ep(html or b"", base or "")
        texts.append(text)
        links.append(ls)
        if page_callback is not None:
            out = page_callback(base, text, ls)
            userjs.append(_json.dumps(out, sort_keys=True) if out is not None else None)
        if site_registry:
            scfg = site_registry.get(core.host_of(base))
            if scfg is not None and html:
                ents.append(
                    [_json.dumps(e, sort_keys=True)
                     for e in extract_entities(html, base, scfg)]
                )
            else:
                ents.append([])
    t = t.drop_columns(["html"])  # html leaves the pipeline here
    if page_callback is not None:
        t = t.append_column("user_json", pa.array(userjs, pa.string()))
    if site_registry:
        t = t.append_column("entities", pa.array(ents, pa.list_(pa.string())))
    t = t.append_column("text", pa.array(texts, pa.string()))
    t = t.append_column("links", pa.array(links, pa.list_(pa.string())))
    t = t.append_column("is_html", pa.array(is_html, pa.bool_()))
    n = pa.array([len(x) for x in links], pa.int32())
    return t.append_column("n_links", n)


def _explode_entities(t: pa.Table, rnd: int) -> pa.Table:
    """entities list column -> (url, site, entity_json, round) sink rows."""
    out_url, out_site, out_json = [], [], []
    for url, ents in zip(t["url_norm"].to_pylist(), t["entities"].to_pylist()):
        for e in ents:
            out_url.append(url)
            out_site.append(core.host_of(url))
            out_json.append(e)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "site": pa.array(out_site, pa.string()),
            "entity_json": pa.array(out_json, pa.string()),
            "round": pa.array([rnd] * len(out_url), pa.int32()),
        }
    )


def _explode_links(t: pa.Table, cfg: CrawlConfig, rnd: int) -> pa.Table:
    """links list column -> candidate frontier rows (M5 + M1-M3 + seq)."""
    out = {k: [] for k in ("url", "url_norm", "url_hash", "host", "depth",
                           "priority", "parent_url", "seq", "attempt",
                           "not_before_round", "discovered_round")}
    canon, uh, hof, cseq = (core.canonicalize_url, core.url_hash,
                            core.host_of, core.child_seq)
    hp, pdefault = cfg.host_priorities, cfg.priority_default
    for links, parent_url, pdepth, pseq in zip(
        t["links"].to_pylist(), t["url_norm"].to_pylist(),
        t["depth"].to_pylist(), t["seq"].to_pylist()
    ):
        depth = pdepth + 1
        if depth > cfg.max_depth:
            continue
        for li, link in enumerate(links):
            norm = canon(link)
            if not norm:
                continue
            host = hof(norm)
            out["url"].append(link)
            out["url_norm"].append(norm)
            out["url_hash"].append(uh(norm))
            out["host"].append(host)
            out["depth"].append(depth)
            out["priority"].append(hp.get(host, pdefault) if hp else pdefault)
            out["parent_url"].append(parent_url)
            out["seq"].append(cseq(pseq, li))
            out["attempt"].append(0)
            out["not_before_round"].append(0)
            out["discovered_round"].append(rnd + 1)
    return pa.table({k: pa.array(v, FRONTIER_SCHEMA.field(k).type) for k, v in out.items()})


_DEDUP_PARTS = 256  # url_hash-hash partitions for the distributed dedup


def _append_dedup_part(t: pa.Table) -> pa.Table:
    """Partition key for the D1 shuffle: url_hash % _DEDUP_PARTS. Grouping
    by the partition instead of the raw url_hash pays _DEDUP_PARTS Python
    calls instead of one per unique URL (the dedup.py banding pattern —
    at the 10^10-URL design point per-group calls are the bottleneck, not
    the shuffle). Zero-column blocks (skipped explode UDFs on 0-row
    inputs) pass through untouched, as they did into the old groupby."""
    if t.num_columns == 0:
        return t
    return t.append_column(
        "part",
        pc.cast(
            pc.bit_wise_and(t["url_hash"], pa.scalar(_DEDUP_PARTS - 1, pa.uint64())),
            pa.int32(),
        ),
    )


def _dedup_keep_min_n(g: pd.DataFrame) -> pd.DataFrame:
    """D1 + group size over ONE url_hash partition: per url_hash keep the
    min-(priority, seq) row (stable sort + first-per-key — identical
    selection to a per-group head(1)); the surviving row carries
    `group_n` so the `discovered` counter falls out of the deduped set
    without a separate pass over the candidates."""
    g = g.sort_values(["url_hash", "priority", "seq"], kind="mergesort")
    first = ~g["url_hash"].duplicated()
    sizes = g.groupby("url_hash", sort=False)["url_hash"].transform("size")
    out = g[first].copy()
    out["group_n"] = sizes[first].to_numpy()
    return out.drop(columns=["part"])


def make_robots_seen_flagger(rules_ref, seen):
    """Fused M11 + ST1 stage: appends `robots_ok` and `is_new` flags in one
    pass. The seen-set ADD happens only for robots-allowed rows (pyref
    order). Flag columns (not filtering) let every counter derive from the
    single materialized output — one executor launch instead of three."""

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t  # empty map_groups artifacts; dropped downstream
        rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref
        hosts = t["host"].to_pylist()
        urls = t["url_norm"].to_pylist()
        robots_ok = np.fromiter(
            (
                (lambda r: r is None or r.allows_url(u))(rules.get(h))
                for h, u in zip(hosts, urls)
            ),
            bool, len(hosts),
        )
        is_new = np.zeros(len(robots_ok), dtype=bool)
        idx = np.flatnonzero(robots_ok)
        if idx.size:
            hashes = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)[idx]
            is_new[idx] = seen.filter_batch(hashes)
        return t.append_column("robots_ok", pa.array(robots_ok)).append_column(
            "is_new", pa.array(is_new)
        )

    return flag


def _flag_block_stats(t: pa.Table) -> pa.Table:
    """One stats row per flagged block: the scale-path round counters are
    reduced cluster-side so the candidate frontier never reaches the
    driver. (Ray skips map UDFs on empty blocks, so zero-column artifacts
    simply contribute no stat row; the guard covers direct calls.)"""
    if t.num_rows == 0 or "is_new" not in t.column_names:
        return pa.table(
            {
                "rows": pa.array([], pa.int64()),
                "group_n_sum": pa.array([], pa.int64()),
                "robots_ok_n": pa.array([], pa.int64()),
                "accepted_n": pa.array([], pa.int64()),
            }
        )
    acc = pc.sum(pc.cast(pc.and_(t["robots_ok"], t["is_new"]), pa.int64())).as_py() or 0
    return pa.table(
        {
            "rows": pa.array([t.num_rows], pa.int64()),
            "group_n_sum": pa.array(
                [pc.sum(pc.cast(t["group_n"], pa.int64())).as_py() or 0], pa.int64()
            ),
            "robots_ok_n": pa.array(
                [pc.sum(pc.cast(t["robots_ok"], pa.int64())).as_py() or 0], pa.int64()
            ),
            "accepted_n": pa.array([acc], pa.int64()),
        }
    )


def _take_accepted(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "is_new" not in t.column_names:
        return FRONTIER_SCHEMA.empty_table()
    mask = pa.compute.and_(t["robots_ok"], t["is_new"])
    return _enforce_frontier_schema(
        t.filter(mask).drop_columns(["robots_ok", "is_new", "group_n"])
    )


def _fail_flag_batch(t: pa.Table, fail_permille: int) -> pa.Table:
    tf = core.transient_failure
    flags = [
        tf(h, a, fail_permille)
        for h, a in zip(t["url_hash"].to_pylist(), t["attempt"].to_pylist())
    ]
    return t.append_column("fail", pa.array(flags, pa.bool_()))



def _cleanup_round_dirs(out_dir: str, rnd: int) -> None:
    """Remove partial outputs of an uncommitted round so re-execution
    (crash recovery or mid-round resume) is idempotent — round dirs are
    only trusted once the _SUCCESS marker exists."""
    import shutil

    for p in (
        f"visits/round={rnd}", f"extracted/round={rnd}", f"seen/round={rnd}",
        f"ckpt/round={rnd}", f"frontier/round={rnd + 1}",
    ):
        d = os.path.join(out_dir, p)
        if os.path.isdir(d):
            shutil.rmtree(d)


def _load_committed_hashes(out_dir: str) -> np.ndarray:
    """All url_hashes from COMMITTED seen-delta snapshots — the replay
    source for rebuilding a dead shard. A round's delta counts only once
    its ckpt/_SUCCESS marker exists: the in-flight round writes its delta
    BEFORE the marker, and replaying those uncommitted hashes would flag
    the re-executed round's URLs as already-seen (oracle divergence).
    round=bootstrap (the seed hashes) is always committed."""
    import glob as _glob

    def _committed(d: str) -> bool:
        rnd = os.path.basename(os.path.dirname(d)).split("=", 1)[1]
        if rnd == "bootstrap":
            return True
        return os.path.exists(os.path.join(out_dir, f"ckpt/round={rnd}", "_SUCCESS"))

    tabs = [
        pq.read_table(f)
        for f in sorted(_glob.glob(os.path.join(out_dir, "seen/round=*/*.parquet")))
        if _committed(f)
    ]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return np.empty(0, np.uint64)
    t = pa.concat_tables(tabs, promote_options="default")
    return t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)


def run_crawl_ray(
    corpus_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    seed_urls: list[str] | None = None,
    resume: bool = True,
) -> dict:
    """Run the crawl; returns a summary dict. Requires an initialised Ray
    (does NOT call ray.init — driver contract)."""
    cfg = cfg or CrawlConfig()
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    robots_path = os.path.join(corpus_dir, "robots.parquet")

    rules = load_robots_rules(robots_path) if os.path.exists(robots_path) else {}
    delays = crawl_delays(rules)
    rules_ref = ray.put(rules)

    # corpus projection: only (url, warc_ts, html [, content_type]) ever
    # leave storage; content_type is optional (input_hint corpora are
    # all-HTML without it) and feeds the M10 gate.
    corpus_cols = ["url", "warc_ts", "html"]
    try:
        first = (
            os.path.join(pages_path, sorted(os.listdir(pages_path))[0])
            if os.path.isdir(pages_path) else pages_path
        )
        if "content_type" in pq.read_schema(first).names:
            corpus_cols.append("content_type")
    except (OSError, IndexError):  # unreadable or empty pages dir:
        pass                       # fall back to the no-content_type set

    if seed_urls is None:
        st = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
        order = pa.compute.sort_indices(st["rank"])
        seed_urls = st["url"].take(order).to_pylist()

    seen = SeenSet(cfg.seen_shards, capacity_per_shard=cfg.extra.get("seen_capacity", 1 << 20))
    fetch_strategy = cfg.extra.get("fetch_strategy", "broadcast")

    # ---- resume probe (I4/S5): latest round with _SUCCESS -------------
    start_round = 0
    done_rounds = []
    for r in range(cfg.max_rounds):
        if os.path.exists(os.path.join(out_dir, f"ckpt/round={r}", "_SUCCESS")):
            done_rounds.append(r)
    if resume and done_rounds:
        start_round = max(done_rounds) + 1
        for r in done_rounds:  # replay seen deltas into the shard actors
            d = os.path.join(out_dir, f"seen/round={r}")
            if os.path.isdir(d):
                t = pq.read_table(d)
                if t.num_rows:
                    seen.replay(t["url_hash"].to_numpy(zero_copy_only=False))
    else:
        for sub in ("ckpt", "seen", "frontier", "extracted", "visits"):
            p = os.path.join(out_dir, sub)
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p)

    if start_round == 0:
        ftab, seed_hashes = seeds_to_frontier(seed_urls, cfg, rules)
        fdir = os.path.join(out_dir, "frontier/round=0")
        os.makedirs(fdir, exist_ok=True)
        pq.write_table(ftab, os.path.join(fdir, "part-0.parquet"))
        sdir = os.path.join(out_dir, "seen/round=bootstrap")
        os.makedirs(sdir, exist_ok=True)
        pq.write_table(
            pa.table({"url_hash": pa.array(seed_hashes, pa.uint64())}),
            os.path.join(sdir, "part-0.parquet"),
        )
        seen.replay(np.array(seed_hashes, dtype=np.uint64))
    else:
        boot = os.path.join(out_dir, "seen/round=bootstrap")
        if os.path.isdir(boot):
            t = pq.read_table(boot)
            if t.num_rows:
                seen.replay(t["url_hash"].to_numpy(zero_copy_only=False))

    # Cache the (url, warc_ts, html) corpus columns in the object store ONCE
    # when they fit — every round scans the corpus, and re-reading +
    # re-decompressing parquet per round costs seconds. Above the threshold
    # (or at the 100 TB design point) the per-round streaming read — or the
    # "join" fetch strategy — is the right mode, so this stays off there.
    corpus_cached = None
    corpus_is_latest = False
    cache_max = cfg.extra.get("cache_corpus_max_bytes", 2 << 30)
    if fetch_strategy != "join" and cache_max:
        try:
            nbytes = sum(
                os.path.getsize(os.path.join(pages_path, f))
                for f in os.listdir(pages_path)
            ) if os.path.isdir(pages_path) else os.path.getsize(pages_path)
        except OSError:
            nbytes = None
        if nbytes is not None and nbytes < cache_max:
            # Hoist the J5 snapshot-pick to cache-build time: the latest
            # (url, warc_ts) pairs come from a tiny html-free projection on
            # the driver, then one broadcast-filter map — so no per-round
            # groupby is needed on the matched set. (Snapshot timestamps
            # are unique per url in practice; tied corpora fall back below
            # to the per-round pick, which applies the pinned tie rule.)
            # Only multi-snapshot urls (~5%) need filtering — broadcast just
            # {dup_url: max_ts}, not a corpus-sized pair set.
            kt = pq.read_table(pages_path, columns=["url", "warc_ts"])
            kdf = kt.to_pandas()
            counts = kdf.groupby("url")["url"].transform("size")
            dups = kdf[counts > 1]
            dup_max = dups.groupby("url")["warc_ts"].max()
            # ties at the max ts would make "ts == max" keep >1 row per url
            # (the hoisted filter has no tiebreak) — fall back to the
            # per-round groupby pick, which applies pyref._snap_tiekey.
            ts_ties = bool(
                len(dups)
                and dups.set_index("url")["warc_ts"].eq(dup_max).groupby(level=0).sum().gt(1).any()
            )
            # Cache block count: ~1 MB-compressed per block, capped at
            # 2x ncpu, floored at 1 (tiny test corpora must not shatter
            # into row-sized blocks). The cache is re-SCANNED every round
            # by a filter-light fused stage (only the politeness-bounded
            # matched rows parse), so per-task overhead dominates:
            # measured 0.45 s/scan at the 217-block read default vs
            # 0.19 s at 62 blocks (58 MB/124k-page corpus, 32 CPUs). The
            # 4-8x-ncpu rule (CLAUDE.md) is for compute-heavy
            # full-corpus passes.
            cache_blocks = max(
                1,
                min(
                    2 * int(ray.cluster_resources().get("CPU", 8)),
                    int(nbytes) >> 20,
                ),
            )
            if ts_ties:
                corpus_cached = rd.read_parquet(
                    pages_path, columns=corpus_cols,
                    override_num_blocks=cache_blocks,
                ).materialize()
            else:
                # broadcast just {dup_url -> max_ts} as two aligned arrays;
                # the filter is one vectorized index_in + take per batch
                keep_ref = ray.put(
                    (
                        pa.array(list(dup_max.index), pa.string()),
                        pa.array(list(dup_max.values), pa.timestamp("us")),
                    )
                )

                def _latest_filter(t: pa.Table) -> pa.Table:
                    keys, maxts = ray.get(keep_ref)
                    if len(keys) == 0:
                        return t
                    pos = pc.index_in(t["url"], value_set=keys)
                    m = maxts.take(pos)  # null where url is single-snapshot
                    keep = pc.or_kleene(
                        pc.is_null(m), pc.equal(t["warc_ts"].cast(pa.timestamp("us")), m)
                    )
                    return t.filter(keep)

                corpus_cached = (
                    rd.read_parquet(
                        pages_path, columns=corpus_cols,
                        override_num_blocks=cache_blocks,
                    )
                    .map_batches(_latest_filter, batch_format="pyarrow", zero_copy_batch=True)
                    .materialize()
                )
                corpus_is_latest = True

    summary = {"rounds_run": 0, "visits": 0, "extracted": 0, "resumed_at": start_round}
    counters_all: list[dict] = []
    # Trailing links-per-fetched-page estimate feeding the EXPANSION
    # dispatch: exploded candidates scale as taken x fanout (up to ~30x the
    # frontier), so keying the driver/distributed choice on frontier size
    # alone could pull a multi-GB candidate set to the driver. Seeded
    # conservatively; replaced by measured fanout after each round.
    link_factor = float(cfg.extra.get("links_per_page_est", 50.0))
    if start_round > 0:
        # I5 x I4: the page budget counts COMMITTED rounds too — seed the
        # visit counter from their lineage so a crashed-then-resumed crawl
        # stops at the same round an uninterrupted run (and pyref) would.
        for r in done_rounds:
            lp = os.path.join(out_dir, f"ckpt/round={r}", "lineage.parquet")
            if os.path.exists(lp):
                lt = pq.read_table(lp)
                summary["visits"] += int(lt["fetched"][0].as_py() or 0)
                if r == max(done_rounds) and "discovered" in lt.column_names:
                    s200 = int(lt["status_200"][0].as_py() or 0)
                    if s200 > 0:
                        link_factor = max(
                            1.0, int(lt["discovered"][0].as_py() or 0) / s200
                        )
        summary["rounds_run"] = start_round

    for rnd in range(start_round, cfg.max_rounds):
        fdir = os.path.join(out_dir, f"frontier/round={rnd}")
        if not os.path.isdir(fdir):
            break
        if cfg.max_pages and summary["visits"] >= cfg.max_pages:
            break  # I5 page-budget stop (same round-granular rule as pyref)
        # partitioning=None: don't infer a hive `round` column from the dir name
        frontier_ds = rd.read_parquet(fdir, partitioning=None)
        n_frontier = frontier_ds.count()
        if n_frontier == 0:
            break
        summary["rounds_run"] = rnd + 1
        chaos = cfg.extra.get("chaos_kill_shard_in_round")
        round_attempts = 0
        while True:  # crash-recovery retry scope (I4): rounds are idempotent
            try:
                seen.begin_round()
                _cleanup_round_dirs(out_dir, rnd)
                if chaos is not None and chaos[0] == rnd and round_attempts == 0:
                    # fault injection (tests): kill a seen shard mid-round
                    ray.kill(seen.shards[chaos[1]], no_restart=True)
                    # ray.kill is async: wait for actual death so the
                    # fault reliably fires inside this round
                    for _ in range(100):
                        try:
                            ray.get(seen.shards[chaos[1]].size.remote(), timeout=2)
                            time.sleep(0.1)
                        except Exception:
                            break
                c = {"round": rnd, "frontier_in": n_frontier}
                _t = time.perf_counter()

                def _lap(name):
                    nonlocal _t
                    now = time.perf_counter()
                    c[f"ms_{name}"] = int((now - _t) * 1000)
                    _t = now

                # -- politeness (SHUFFLE 1, or driver path for small rounds) ---
                # Hybrid dispatch: below `driver_round_threshold` rows the
                # frontier fits trivially on the driver and a Ray all-to-all's
                # fixed cost (~seconds) would dominate, so the SAME pinned quota
                # logic runs locally (politeness_take_local). Above it — the
                # 10^10-frontier design point — the salted groupby shuffle path
                # runs. Both paths are oracle-equivalence-tested.
                # (The EXPANSION dispatch is decided separately below on
                # estimated candidate volume — frontier size alone says
                # nothing about taken x fanout.)
                driver_threshold = cfg.extra.get("driver_round_threshold", 1_000_000)
                use_driver_polite = n_frontier <= driver_threshold
                if use_driver_polite:
                    ftab_all = pq.read_table(fdir)
                    _pc = pa.compute
                    elig_mask = _pc.less_equal(ftab_all["not_before_round"], rnd)
                    eligible_tab = ftab_all.filter(elig_mask)
                    deferred_tab = ftab_all.filter(_pc.invert(elig_mask))
                    taken_tbl, carry_tbl = politeness.politeness_take_local(
                        eligible_tab, delays, cfg
                    )
                    deferred = rd.from_arrow(_enforce_frontier_schema(deferred_tab))
                    carry_ds = rd.from_arrow(_enforce_frontier_schema(carry_tbl))
                    _all_tabs = [taken_tbl] if taken_tbl.num_rows else []
                    _all_refs = None
                else:
                    eligible = frontier_ds.filter(expr=f"not_before_round <= {rnd}")
                    deferred = frontier_ds.filter(expr=f"not_before_round > {rnd}")
                    taken_ds, carry_ds = politeness.politeness_take(
                        eligible, delays, cfg,
                        hot_threshold=cfg.extra.get("hot_threshold", 50_000),
                        n_salts=cfg.extra.get("n_salts", 8),
                        total_rows=n_frontier,  # skips hot-detection when it can't trigger
                    )
                    # One materialization of the (politeness-bounded) taken set;
                    # both fetch strategies and the counters share it. Empty
                    # zero-column blocks (artifact of map_groups partitions with
                    # no groups) are dropped: pyarrow joins reject them and Ray
                    # skips map UDFs on empty blocks, so they can't be fixed later.
                    _all_refs = taken_ds.to_arrow_refs()
                    _all_tabs = ray.get(_all_refs) if _all_refs else []
                pre_request = cfg.extra.get("pre_request")
                if pre_request is not None:
                    # X2 hook: user fn may mutate/veto request rows (options-object
                    # analog). Applied to the bounded taken blocks, re-put to plasma.
                    _all_tabs = [
                        _enforce_frontier_schema(pre_request(t)) if t.num_rows else t
                        for t in _all_tabs
                    ]
                    _all_refs = None
                if _all_refs is None:
                    _all_refs = [ray.put(t) for t in _all_tabs]
                taken_refs = [
                    r for r, t in zip(_all_refs, _all_tabs)
                    if t.num_rows > 0 and t.num_columns > 0
                ]
                c["taken"] = int(sum(t.num_rows for t in _all_tabs))
                # -- expansion dispatch (decided on CANDIDATE volume): the
                # driver expansion path pulls taken x links-per-page rows,
                # not n_frontier rows — dispatch on the estimate so a
                # high-fanout round goes distributed even when the frontier
                # itself is small. Estimate uses the trailing measured
                # fanout (seeded conservatively at links_per_page_est).
                est_candidates = int(c["taken"] * link_factor)
                use_driver_expand = (
                    est_candidates
                    <= cfg.extra.get("driver_cand_threshold", driver_threshold)
                )
                c["est_candidates"] = est_candidates
                c["expand_path"] = "driver" if use_driver_expand else "distributed"
                part_lineage: list[dict] = [
                    {"round": rnd, "stage": "politeness_taken", "partition": i,
                     "rows": t.num_rows}
                    for i, t in enumerate(_all_tabs) if t.num_rows
                ]

                _lap("politeness")
                corpus = corpus_cached if corpus_cached is not None else rd.read_parquet(
                    pages_path, columns=corpus_cols
                )
                fetch_tbl = None  # broadcast-path fetch set (politeness-bounded)
                miss_visits = None  # join-path 404 visits (stays a Dataset)
                uas = cfg.user_agents
                if fetch_strategy == "join":
                    # Distributed hash join (for fetch sets too large to broadcast):
                    # LEFT OUTER so 404 misses fall out of the same single shuffle.
                    left = (
                        rd.from_arrow_refs(taken_refs)
                        if taken_refs
                        else rd.from_arrow(FRONTIER_SCHEMA.empty_table())
                    ).map_batches(
                        _enforce_frontier_schema, batch_format="pyarrow", zero_copy_batch=True
                    )
                    # shuffle width sized to the cluster: the hash-shuffle
                    # join spawns one aggregator ACTOR pool scaled by
                    # num_partitions; on a small cluster a 16-wide join's
                    # actors reserve every CPU and starve the upstream map
                    # tasks — a deadlock observed at 4 CPUs (fine at 8+).
                    n_parts = min(
                        cfg.num_partitions,
                        max(2, int(ray.cluster_resources().get("CPU", 8)) // 2),
                    )
                    joined = left.join(
                        corpus, "left_outer", num_partitions=n_parts,
                        on=("url_norm",), right_on=("url",),
                    )
                    # after the join `url` is the frontier's RAW form; downstream
                    # keys on the corpus url == url_norm, so park the raw form
                    # in url_raw (retries preserve it, pyref parity) + rewrite.
                    joined = joined.map_batches(
                        lambda t: t.append_column("url_raw", t["url"]).set_column(
                            t.schema.get_field_index("url"), "url", t["url_norm"]
                        ),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    ).materialize()
                    matched = joined.map_batches(
                        lambda t: t.filter(pc.is_valid(t["html"])),
                        batch_format="pyarrow", zero_copy_batch=True,
                    )
                    # Misses -> 404 visit rows WITHOUT leaving the cluster: on
                    # this (scale) path the miss set stays a Dataset end-to-end
                    # and is written by the visits sink below. (Bounded
                    # materialize: misses <= the politeness-bounded taken set.)
                    miss_visits = joined.map_batches(
                        lambda t: _visit_rows_batch(
                            t.filter(pc.is_null(t["html"])), rnd, 404, uas
                        ),
                        batch_format="pyarrow", zero_copy_batch=True,
                    ).materialize()
                else:
                    # Broadcast fetch set: ship the typed (url_norm-keyed)
                    # frontier table once via ray.put; the corpus scan does a
                    # vectorized index_in lookup per batch.
                    fetch_tbl = _fetch_table(_all_tabs)
                    fetch_ref = ray.put(fetch_tbl)
                    if fetch_tbl.num_rows > cfg.extra.get("fetch_actor_threshold", 500_000):
                        # big fetch set: actor pool amortizes the dict deserialize
                        matched = corpus.map_batches(
                            _AttachFrontier, fn_constructor_args=(fetch_ref,),
                            batch_format="pyarrow", zero_copy_batch=True,
                            concurrency=cfg.extra.get("fetch_concurrency", (1, 8)),
                        )
                    else:
                        # small fetch set: plain tasks skip per-round actor spin-up
                        matched = corpus.map_batches(
                            lambda t: _AttachFrontier(fetch_ref)(t),
                            batch_format="pyarrow", zero_copy_batch=True,
                        )
                # snapshot pick on the (politeness-bounded) matched subset — not
                # needed when the cached corpus is already latest-per-url
                if not (corpus_is_latest and fetch_strategy != "join"):
                    matched = _latest_snapshot_ds(matched)
                fp = cfg.fail_permille
                page_callback = cfg.extra.get("page_callback")
                site_registry = cfg.extra.get("site_registry")
                if fp > 0:
                    matched = matched.map_batches(
                        lambda t: _fail_flag_batch(t, fp), batch_format="pyarrow"
                    ).materialize()
                    ok = matched.filter(expr="fail == False").drop_columns(["fail"])
                    failed = matched.filter(expr="fail == True").drop_columns(["fail"])
                    parsed = ok.map_batches(
                        lambda t: _parse_batch(
                            t, page_callback, site_registry, cfg.allowed_content_types,
                            cfg.extra.get("parse_max_batch_bytes", 64 << 20),
                        ),
                        batch_format="pyarrow", zero_copy_batch=True,
                        concurrency=cfg.extra.get("parse_concurrency", None),
                    ).materialize()
                else:
                    # fault model disabled: fuse scan -> attach -> snapshot -> parse
                    # into ONE materialized execution
                    failed = None
                    parsed = matched.map_batches(
                        lambda t: _parse_batch(
                            t, page_callback, site_registry, cfg.allowed_content_types,
                            cfg.extra.get("parse_max_batch_bytes", 64 << 20),
                        ),
                        batch_format="pyarrow", zero_copy_batch=True,
                        concurrency=cfg.extra.get("parse_concurrency", None),
                    ).materialize()
                    matched = parsed  # every matched row is exactly one parsed row

                c["status_200"] = parsed.count()
                # M10: non-HTML fetches got a visit row but no parse; they
                # are excluded from the extracted sink + expansion below
                n_html = parsed.filter(expr="is_html == True").count()
                c["skipped_content_type"] = c["status_200"] - n_html
                c["transient_fail"] = failed.count() if failed is not None else 0
                part_lineage += [
                    {"round": rnd, "stage": "parse", "partition": i, "rows": n}
                    for i, n in enumerate(_block_row_counts(parsed))
                ]

                if fetch_strategy != "join":
                    # -- misses -> 404 (J2, broadcast mode): each matched
                    # block reduces to an nf/8-byte BITMAP of matched fetch
                    # positions; the driver ORs #blocks bitmaps and take()s
                    # the zero bits from the (already driver-resident)
                    # broadcast fetch table. No url strings leave the
                    # cluster; driver traffic is blocks x nf/8 bytes.
                    nf = fetch_tbl.num_rows
                    if nf:
                        nb_bm = (nf + 7) // 8

                        def _pos_bitmap(t: pa.Table) -> pa.Table:
                            bm = np.zeros(nb_bm, dtype=np.uint8)
                            if t.num_rows and "fetch_pos" in t.column_names:
                                p = t["fetch_pos"].to_numpy(
                                    zero_copy_only=False
                                ).astype(np.int64)
                                np.bitwise_or.at(
                                    bm, p >> 3, (1 << (p & 7)).astype(np.uint8)
                                )
                            return pa.table(
                                {"bits": pa.array([bm.tobytes()], pa.binary())}
                            )

                        hit = np.zeros(nb_bm, dtype=np.uint8)
                        for r in matched.map_batches(
                            _pos_bitmap, batch_format="pyarrow", zero_copy_batch=True
                        ).take_all():
                            hit |= np.frombuffer(r["bits"], dtype=np.uint8)
                        miss_pos = np.flatnonzero(
                            ~np.unpackbits(hit, bitorder="little")[:nf].astype(bool)
                        )
                        miss_tbl = fetch_tbl.take(pa.array(miss_pos, pa.int64()))
                    else:
                        miss_tbl = fetch_tbl
                    c["status_404"] = miss_tbl.num_rows
                else:
                    miss_tbl = None
                    c["status_404"] = miss_visits.count()
                c["fetched"] = c["status_200"] + c["status_404"]

                _lap("fetch_parse")
                # -- visits sink ----------------------------------------------
                vdir = os.path.join(out_dir, f"visits/round={rnd}")
                os.makedirs(vdir, exist_ok=True)
                visit_ok = parsed.map_batches(
                    lambda t: _visit_rows_batch(t, rnd, 200, uas),
                    batch_format="pyarrow",
                )
                # Coalesce sink files: politeness-bounded rounds produce a
                # few thousand rows spread over 4-8x-ncpu upstream blocks;
                # without a floor each block writes its own tiny parquet (79
                # files for 197 round-0 visits measured) and the sink pays
                # per-file task/IO overhead. 64k rows/file keeps resumable
                # round-partitioned output while bounding file count.
                visit_ok.write_parquet(vdir, min_rows_per_file=65536)
                if miss_visits is not None:  # join path: distributed sink
                    miss_visits.write_parquet(vdir, min_rows_per_file=65536)
                elif miss_tbl is not None and miss_tbl.num_rows:
                    pq.write_table(
                        _visit_rows_batch(miss_tbl, rnd, 404, uas),
                        os.path.join(vdir, "misses.parquet"),
                    )

                # -- extracted sink (S4) --------------------------------------
                edir = os.path.join(out_dir, f"extracted/round={rnd}")
                os.makedirs(edir, exist_ok=True)
                extracted = parsed.map_batches(
                    lambda t: (lambda h: pa.table(
                        {
                            "url": h["url_norm"].cast(pa.string()),
                            "text": h["text"].cast(pa.string()),
                            "n_links": h["n_links"].cast(pa.int32()),
                            "round": pa.array([rnd] * h.num_rows, pa.int32()),
                        }
                    ))(t.filter(t["is_html"])),
                    batch_format="pyarrow",
                )
                extracted.write_parquet(edir, min_rows_per_file=65536)

                if site_registry:
                    # -- entities sink (M7/ST4 celitedev layer) -------
                    endir = os.path.join(out_dir, f"entities/round={rnd}")
                    os.makedirs(endir, exist_ok=True)
                    parsed.map_batches(
                        lambda t: _explode_entities(t, rnd), batch_format="pyarrow"
                    ).write_parquet(endir, min_rows_per_file=65536)

                _lap("sinks_visits_extracted")
                # -- frontier expansion ---------------------------------------
                accepted_tab = None  # set on the driver path
                if use_driver_expand:
                    # Driver path (small rounds): explode runs distributed (it
                    # reads the parsed blocks), then the bounded candidate set is
                    # pulled and deduped/filtered locally with the same pinned
                    # logic — no all-to-all shuffle, no flagger execution.
                    cand_refs = parsed.map_batches(
                        lambda t: _explode_links(t, cfg, rnd), batch_format="pyarrow"
                    ).to_arrow_refs()
                    cand_tabs = [
                        t for t in (ray.get(cand_refs) if cand_refs else [])
                        if t.num_rows > 0 and t.num_columns > 0
                    ]
                    cand = (
                        pa.concat_tables(cand_tabs, promote_options="default")
                        if cand_tabs else FRONTIER_SCHEMA.empty_table()
                    )
                    cdf = cand.to_pandas().sort_values(["priority", "seq"], kind="mergesort")
                    ded = cdf.drop_duplicates(subset="url_hash", keep="first")
                    c["discovered"] = len(cdf)
                    c["after_dedup"] = len(ded)
                    c["dup_within_round"] = c["discovered"] - c["after_dedup"]
                    robots_ok = np.fromiter(
                        (
                            (lambda r: r is None or r.allows_url(u))(rules.get(h))
                            for h, u in zip(ded["host"], ded["url_norm"])
                        ),
                        bool, len(ded),
                    ) if len(ded) else np.zeros(0, dtype=bool)
                    is_new = np.zeros(len(ded), dtype=bool)
                    idx = np.flatnonzero(robots_ok)
                    if idx.size:
                        hashes = ded["url_hash"].to_numpy().astype(np.uint64)[idx]
                        is_new[idx] = seen.filter_batch(hashes)
                    robots_ok_n = int(robots_ok.sum())
                    c["skipped_robots"] = c["after_dedup"] - robots_ok_n
                    c["accepted_new"] = int(is_new.sum())
                    c["skipped_seen"] = robots_ok_n - c["accepted_new"]
                    accepted_tab = _enforce_frontier_schema(
                        pa.Table.from_pandas(ded[robots_ok & is_new], preserve_index=False)
                    )
                    accepted = rd.from_arrow(accepted_tab)
                    part_lineage += [
                        {"round": rnd, "stage": "dedup", "partition": 0, "rows": c["after_dedup"]},
                        {"round": rnd, "stage": "accepted", "partition": 0, "rows": c["accepted_new"]},
                    ]
                else:
                    # Distributed path: ONE fused execution — explode -> dedup
                    # shuffle (url_hash) -> robots+seen flags; every counter
                    # derives from the single materialized output (per-round
                    # intermediates are politeness-bounded, so this materialize is
                    # bounded state, not a full-corpus pin).
                    flagged = (
                        parsed.map_batches(
                            lambda t: _explode_links(t, cfg, rnd), batch_format="pyarrow"
                        )
                        .map_batches(
                            _append_dedup_part,
                            batch_format="pyarrow", zero_copy_batch=True,
                        )
                        .groupby("part")
                        .map_groups(_dedup_keep_min_n, batch_format="pandas")
                        .map_batches(
                            make_robots_seen_flagger(rules_ref, seen),
                            batch_format="pyarrow", zero_copy_batch=True,
                        )
                        .materialize()
                    )
                    # Counters + per-partition lineage from a ONE-ROW-PER-BLOCK
                    # stats pass — the deduped frontier (url strings included)
                    # never lands on the driver; only #blocks tiny stat rows do.
                    stat_rows = flagged.map_batches(
                        _flag_block_stats, batch_format="pyarrow", zero_copy_batch=True
                    ).take_all()
                    c["after_dedup"] = int(sum(r["rows"] for r in stat_rows))
                    c["discovered"] = int(sum(r["group_n_sum"] for r in stat_rows))
                    c["dup_within_round"] = c["discovered"] - c["after_dedup"]
                    robots_ok_n = int(sum(r["robots_ok_n"] for r in stat_rows))
                    c["skipped_robots"] = c["after_dedup"] - robots_ok_n
                    c["accepted_new"] = int(sum(r["accepted_n"] for r in stat_rows))
                    c["skipped_seen"] = robots_ok_n - c["accepted_new"]
                    accepted = flagged.map_batches(
                        _take_accepted, batch_format="pyarrow", zero_copy_batch=True
                    )
                    part_lineage += [
                        {"round": rnd, "stage": "dedup", "partition": i, "rows": r["rows"]}
                        for i, r in enumerate(stat_rows)
                    ] + [
                        {"round": rnd, "stage": "accepted", "partition": i,
                         "rows": r["accepted_n"]}
                        for i, r in enumerate(stat_rows)
                    ]

                _lap("expand_dedup_seen")
                if c["status_200"] > 0:
                    # measured fanout feeds the NEXT round's expansion dispatch
                    link_factor = max(1.0, c["discovered"] / c["status_200"])
                # -- retries (I3): vectorized column rebuild, preserving the
                # original url / parent_url / discovered_round (pyref parity).
                # Bounded driver pull: failures are a slice of the taken set.
                retry_tabs: list[pa.Table] = []
                if c["transient_fail"]:
                    for ref in failed.to_arrow_refs():
                        ft = ray.get(ref)
                        if ft.num_rows == 0 or "attempt" not in ft.column_names:
                            continue
                        sub = ft.filter(
                            pc.less_equal(pc.add(ft["attempt"], 1), cfg.retries)
                        )
                        if sub.num_rows == 0:
                            continue
                        n = sub.num_rows
                        names = sub.column_names
                        raw = sub["url_raw"] if "url_raw" in names else sub["url_norm"]
                        parent = (
                            sub["parent_url"] if "parent_url" in names
                            else pa.array([""] * n, pa.string())
                        )
                        disc = (
                            sub["discovered_round"] if "discovered_round" in names
                            else pa.array([rnd] * n, pa.int32())
                        )
                        retry_tabs.append(pa.table({
                            "url": raw.cast(pa.string()),
                            "url_norm": sub["url_norm"].cast(pa.string()),
                            "url_hash": sub["url_hash"].cast(pa.uint64()),
                            "host": sub["host"].cast(pa.string()),
                            "depth": sub["depth"].cast(pa.int32()),
                            "priority": sub["priority"].cast(pa.int32()),
                            "parent_url": parent.cast(pa.string()),
                            "seq": sub["seq"].cast(pa.int64()),
                            "attempt": pc.cast(pc.add(sub["attempt"], 1), pa.int32()),
                            "not_before_round": pa.array([rnd + 1] * n, pa.int32()),
                            "discovered_round": disc.cast(pa.int32()),
                        }))
                n_retries = sum(t.num_rows for t in retry_tabs)
                c["retry_exhausted"] = c["transient_fail"] - n_retries

                # -- seen delta sink ------------------------------------------
                sdir = os.path.join(out_dir, f"seen/round={rnd}")
                os.makedirs(sdir, exist_ok=True)
                if accepted_tab is not None:  # driver path: write directly
                    pq.write_table(
                        accepted_tab.select(["url_hash"]),
                        os.path.join(sdir, "part-0.parquet"),
                    )
                else:
                    accepted.select_columns(["url_hash"]).write_parquet(
                        sdir, min_rows_per_file=65536
                    )

                # -- next frontier (S6) ---------------------------------------
                nfdir = os.path.join(out_dir, f"frontier/round={rnd + 1}")
                os.makedirs(nfdir, exist_ok=True)
                next_frontier = carry_ds.union(deferred).union(accepted)
                next_frontier = next_frontier.map_batches(
                    _enforce_frontier_schema, batch_format="pyarrow", zero_copy_batch=True
                )
                if retry_tabs:
                    next_frontier = next_frontier.union(
                        rd.from_arrow(
                            _enforce_frontier_schema(
                                pa.concat_tables(retry_tabs, promote_options="default")
                            )
                        )
                    )
                next_frontier.write_parquet(nfdir, min_rows_per_file=65536)
                # carry + deferred == frontier - taken (no extra pass needed)
                c["carryover"] = n_frontier - c["taken"]

                _lap("frontier_write")
                # -- lineage + success marker (S5): round-level counters plus
                # per-partition rows-out for the major stages (B:L6 "every
                # partition emits lineage ... to a checkpoint store") ----------
                cdir = os.path.join(out_dir, f"ckpt/round={rnd}")
                os.makedirs(cdir, exist_ok=True)
                pq.write_table(
                    pa.table({k: [v] for k, v in c.items()}),
                    os.path.join(cdir, "lineage.parquet"),
                )
                if part_lineage:
                    pq.write_table(
                        pa.table(
                            {
                                "round": pa.array([r["round"] for r in part_lineage], pa.int32()),
                                "stage": pa.array([r["stage"] for r in part_lineage], pa.string()),
                                "partition": pa.array([r["partition"] for r in part_lineage], pa.int32()),
                                "rows": pa.array([r["rows"] for r in part_lineage], pa.int64()),
                            }
                        ),
                        os.path.join(cdir, "partition_lineage.parquet"),
                    )
                with open(os.path.join(cdir, "_SUCCESS"), "w") as f:
                    f.write("ok\n")

                counters_all.append(c)
                summary["visits"] += c["fetched"]
                summary["extracted"] += c["status_200"] - c["skipped_content_type"]

                break
            except ray.exceptions.RayError:
                round_attempts += 1
                if round_attempts >= 3:
                    raise
                rebuilt = seen.recover(lambda: _load_committed_hashes(out_dir))
                summary["shard_recoveries"] = summary.get("shard_recoveries", 0) + rebuilt

    summary["counters"] = counters_all
    summary["seen_total"] = seen.total()
    seen.kill()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description="raycrawl rounds driver")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--fail-permille", type=int, default=0)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()
    if not ray.is_initialized():
        # RAY_ADDRESS is how `ray job submit` hands the cluster to the
        # entrypoint; standalone runs (sandbox default RAY_ADDRESS=local)
        # start a local session.
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"), num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    rd.DataContext.get_current().enable_progress_bars = False
    cfg = CrawlConfig(max_rounds=args.rounds, max_depth=args.max_depth,
                      fail_permille=args.fail_permille)
    s = run_crawl_ray(args.corpus, args.out, cfg, resume=not args.no_resume)
    print(json.dumps(s))
    ray.shutdown()


if __name__ == "__main__":
    main()
