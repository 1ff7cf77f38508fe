"""The Ray Data frontier-rounds crawl driver (SURVEY.md §3.4).

One round = one Ray Data pipeline; the streaming executor pipelines the
stages within a round. Stage map (shuffle inventory in parens):

1. expand      : frontier round-K parquet (carry ∪ retries baked in at K-1)
2. politeness  : salted groupby(host) quota take          (SHUFFLE 1)
3. fetch       : corpus scan + broadcast fetch-set filter (NO shuffle; the
                 per-round fetch set is politeness-bounded, ray.put once) —
                 or Dataset.join when cfg says so          (SHUFFLE alt)
4. snapshot    : groupby(url) latest warc_ts on the MATCHED subset (small)
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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raycrawl import core
from raycrawl.core import CrawlConfig
from raycrawl.ops.url import canon_hash_host_batch
from raycrawl.stages import politeness
from raycrawl.stages.robots import crawl_delays, load_robots_rules, make_robots_filter
from raycrawl.stages.seen import SeenSet, make_seen_filter

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
                 priority=cfg.priority_default, parent_url="", seq=rank,
                 attempt=0, not_before_round=0, discovered_round=0)
        )
    return _frontier_table(rows), hashes


class _AttachFrontier:
    """Corpus-scan stage: keep rows whose url is in the broadcast fetch
    set; attach the frontier columns. The fetch dict ships via ray.put
    once and is fetched in __init__ once per actor — never per batch."""

    def __init__(self, fetch_ref) -> None:
        self.fetch = ray.get(fetch_ref) if isinstance(fetch_ref, ray.ObjectRef) else fetch_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        keep = [u in self.fetch for u in urls]
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            return _empty_matched(t)
        info = [self.fetch[u] for u in sub["url"].to_pylist()]
        cols = dict(zip(("url_norm", "url_hash", "host", "depth", "priority", "seq", "attempt"),
                        zip(*info)))
        sub = sub.append_column("url_norm", pa.array(cols["url_norm"], pa.string()))
        sub = sub.append_column("url_hash", pa.array(cols["url_hash"], pa.uint64()))
        sub = sub.append_column("host", pa.array(cols["host"], pa.string()))
        sub = sub.append_column("depth", pa.array(cols["depth"], pa.int32()))
        sub = sub.append_column("priority", pa.array(cols["priority"], pa.int32()))
        sub = sub.append_column("seq", pa.array(cols["seq"], pa.int64()))
        sub = sub.append_column("attempt", pa.array(cols["attempt"], pa.int32()))
        return sub


def _empty_matched(t: pa.Table) -> pa.Table:
    base = t.slice(0, 0)
    for name, typ in [
        ("url_norm", pa.string()), ("url_hash", pa.uint64()), ("host", pa.string()),
        ("depth", pa.int32()), ("priority", pa.int32()), ("seq", pa.int64()),
        ("attempt", pa.int32()),
    ]:
        base = base.append_column(name, pa.array([], typ))
    return base


def _latest_snapshot(g: pd.DataFrame) -> pd.DataFrame:
    """J5 on the matched subset: keep the max-warc_ts row per url."""
    return g.loc[[g["warc_ts"].idxmax()]]


def _parse_batch(t: pa.Table, page_callback=None) -> pa.Table:
    """Fused M4+M5+M6: one HTML parse -> text + links (list column).
    `page_callback` is the X3 user hook: fn(url, text, links) -> dict|None,
    surfaced as a `user_json` column (the per-page callback of the
    reference's user API, minus `done()` — backpressure is the executor's
    job)."""
    import json as _json

    htmls = t["html"].to_pylist()
    bases = t["url_norm"].to_pylist()
    texts, links, userjs = [], [], []
    ep = core.extract_page
    for html, base in zip(htmls, bases):
        text, ls = ep(html or b"", base or "")
        texts.append(text)
        links.append(ls)
        if page_callback is not None:
            out = page_callback(base, text, ls)
            userjs.append(_json.dumps(out, sort_keys=True) if out is not None else None)
    t = t.drop_columns(["html"])  # html leaves the pipeline here
    if page_callback is not None:
        t = t.append_column("user_json", pa.array(userjs, pa.string()))
    t = t.append_column("text", pa.array(texts, pa.string()))
    t = t.append_column("links", pa.array(links, pa.list_(pa.string())))
    n = pa.array([len(x) for x in links], pa.int32())
    return t.append_column("n_links", n)


def _explode_links(t: pa.Table, cfg: CrawlConfig, rnd: int) -> pa.Table:
    """links list column -> candidate frontier rows (M5 + M1-M3 + seq)."""
    out = {k: [] for k in ("url", "url_norm", "url_hash", "host", "depth",
                           "priority", "parent_url", "seq", "attempt",
                           "not_before_round", "discovered_round")}
    canon, uh, hof, cseq = (core.canonicalize_url, core.url_hash,
                            core.host_of, core.child_seq)
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
            out["url"].append(link)
            out["url_norm"].append(norm)
            out["url_hash"].append(uh(norm))
            out["host"].append(hof(norm))
            out["depth"].append(depth)
            out["priority"].append(cfg.priority_default)
            out["parent_url"].append(parent_url)
            out["seq"].append(cseq(pseq, li))
            out["attempt"].append(0)
            out["not_before_round"].append(0)
            out["discovered_round"].append(rnd + 1)
    return pa.table({k: pa.array(v, FRONTIER_SCHEMA.field(k).type) for k, v in out.items()})


def _dedup_keep_min(g: pd.DataFrame) -> pd.DataFrame:
    """D1: keep the min (priority, seq) row per url_hash group."""
    return g.sort_values(["priority", "seq"], kind="mergesort").head(1)


def _fail_flag_batch(t: pa.Table, fail_permille: int) -> pa.Table:
    tf = core.transient_failure
    flags = [
        tf(h, a, fail_permille)
        for h, a in zip(t["url_hash"].to_pylist(), t["attempt"].to_pylist())
    ]
    return t.append_column("fail", pa.array(flags, pa.bool_()))


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

    summary = {"rounds_run": 0, "visits": 0, "extracted": 0, "resumed_at": start_round}
    counters_all: list[dict] = []

    for rnd in range(start_round, cfg.max_rounds):
        fdir = os.path.join(out_dir, f"frontier/round={rnd}")
        if not os.path.isdir(fdir):
            break
        # partitioning=None: don't infer a hive `round` column from the dir name
        frontier_ds = rd.read_parquet(fdir, partitioning=None)
        n_frontier = frontier_ds.count()
        if n_frontier == 0:
            break
        summary["rounds_run"] = rnd + 1
        c = {"round": rnd, "frontier_in": n_frontier}

        eligible = frontier_ds.filter(expr=f"not_before_round <= {rnd}")
        deferred = frontier_ds.filter(expr=f"not_before_round > {rnd}")

        # -- politeness (SHUFFLE 1) -----------------------------------
        taken_ds, carry_ds = politeness.politeness_take(
            eligible, delays, cfg,
            hot_threshold=cfg.extra.get("hot_threshold", 50_000),
            n_salts=cfg.extra.get("n_salts", 8),
            total_rows=n_frontier,  # skips hot-detection when it can't trigger
        )
        # One materialization of the (politeness-bounded) taken set; both
        # fetch strategies and the counters share it — no re-execution.
        # Empty zero-column blocks (an artifact of map_groups partitions
        # with no groups) are dropped here: pyarrow joins reject them and
        # Ray skips map UDFs on empty blocks, so they can't be fixed later.
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
            _all_refs = [ray.put(t) for t in _all_tabs]
        taken_refs = [
            r for r, t in zip(_all_refs, _all_tabs)
            if t.num_rows > 0 and t.num_columns > 0
        ]
        c["taken"] = int(sum(t.num_rows for t in _all_tabs))
        part_lineage: list[dict] = [
            {"round": rnd, "stage": "politeness_taken", "partition": i,
             "rows": t.num_rows}
            for i, t in enumerate(_all_tabs) if t.num_rows
        ]

        corpus = rd.read_parquet(pages_path, columns=["url", "warc_ts", "html"])
        miss_rows: list[dict] = []
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
            joined = left.join(
                corpus, "left_outer", num_partitions=cfg.num_partitions,
                on=("url_norm",), right_on=("url",),
            )
            # after the join `url` is the frontier's RAW form; downstream
            # keys on the corpus url == url_norm, so rewrite it.
            joined = joined.map_batches(
                lambda t: t.set_column(
                    t.schema.get_field_index("url"), "url", t["url_norm"]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
            matched = joined.map_batches(
                lambda t: t.filter(pa.compute.is_valid(t["html"])),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            missed_ds = joined.map_batches(
                lambda t: t.filter(pa.compute.is_null(t["html"])),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            for b in missed_ds.select_columns(
                ["url_norm", "priority", "host", "seq"]
            ).iter_batches(batch_format="pyarrow"):
                for u, p, ho, s in zip(
                    b["url_norm"].to_pylist(), b["priority"].to_pylist(),
                    b["host"].to_pylist(), b["seq"].to_pylist(),
                ):
                    miss_rows.append(
                        {"url": u, "round": rnd, "priority": p, "host": ho,
                         "seq": s, "status": 404}
                    )
        else:
            # Broadcast fetch set: ship {url_norm -> frontier fields} once
            # via ray.put; the corpus scan filters per batch. value tuple:
            # (url_norm, url_hash, host, depth, priority, seq, attempt)
            fetch_map = {}
            for r in taken_refs:
                tt = ray.get(r)
                for n, h, ho, d, p, s, a in zip(
                    tt["url_norm"].to_pylist(), tt["url_hash"].to_pylist(),
                    tt["host"].to_pylist(), tt["depth"].to_pylist(),
                    tt["priority"].to_pylist(), tt["seq"].to_pylist(),
                    tt["attempt"].to_pylist(),
                ):
                    fetch_map[n] = (n, h, ho, d, p, s, a)
            fetch_ref = ray.put(fetch_map)
            if len(fetch_map) > cfg.extra.get("fetch_actor_threshold", 500_000):
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
        # snapshot pick on the (politeness-bounded) matched subset
        matched = matched.groupby("url").map_groups(_latest_snapshot, batch_format="pandas")
        fp = cfg.fail_permille
        if fp > 0:
            matched = matched.map_batches(
                lambda t: _fail_flag_batch(t, fp), batch_format="pyarrow"
            ).materialize()
            ok = matched.filter(expr="fail == False").drop_columns(["fail"])
            failed = matched.filter(expr="fail == True").drop_columns(["fail"])
        else:
            # fault model disabled: skip the flag pass + retry machinery
            matched = matched.materialize()
            ok, failed = matched, None

        page_callback = cfg.extra.get("page_callback")
        parsed = ok.map_batches(
            lambda t: _parse_batch(t, page_callback),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=cfg.extra.get("parse_concurrency", None),
        ).materialize()

        c["status_200"] = parsed.count()
        c["transient_fail"] = failed.count() if failed is not None else 0
        part_lineage += [
            {"round": rnd, "stage": "parse", "partition": i, "rows": n}
            for i, n in enumerate(_block_row_counts(parsed))
        ]

        if fetch_strategy != "join":
            # -- misses -> 404 (J2, broadcast mode) -------------------
            matched_urls = set()
            for b in matched.select_columns(["url"]).iter_batches(batch_format="pyarrow"):
                matched_urls.update(b["url"].to_pylist())
            miss_rows = [
                {"url": u, "round": rnd, "priority": v[4], "host": v[2],
                 "seq": v[5], "status": 404}
                for u, v in fetch_map.items() if u not in matched_urls
            ]
        c["status_404"] = len(miss_rows)
        c["fetched"] = c["status_200"] + c["status_404"]

        # -- visits sink ----------------------------------------------
        vdir = os.path.join(out_dir, f"visits/round={rnd}")
        os.makedirs(vdir, exist_ok=True)
        uas = cfg.user_agents
        visit_ok = parsed.map_batches(
            lambda t: pa.table(
                {
                    "url": t["url_norm"].cast(pa.string()),
                    "round": pa.array([rnd] * t.num_rows, pa.int32()),
                    "priority": t["priority"].cast(pa.int32()),
                    "host": t["host"].cast(pa.string()),
                    "seq": t["seq"].cast(pa.int64()),
                    "status": pa.array([200] * t.num_rows, pa.int32()),
                    # M12 deterministic UA rotation: ua_list[seq % len]
                    "user_agent": pa.array(
                        [uas[s % len(uas)] for s in t["seq"].to_pylist()], pa.string()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        visit_ok.write_parquet(vdir)
        if miss_rows:
            mt = pa.table(
                {k: pa.array([r[k] for r in miss_rows], VISIT_SCHEMA.field(k).type)
                 for k in VISIT_SCHEMA.names}
            )
            mt = mt.append_column(
                "user_agent",
                pa.array([uas[r["seq"] % len(uas)] for r in miss_rows], pa.string()),
            )
            pq.write_table(mt, os.path.join(vdir, "misses.parquet"))

        # -- extracted sink (S4) --------------------------------------
        edir = os.path.join(out_dir, f"extracted/round={rnd}")
        os.makedirs(edir, exist_ok=True)
        extracted = parsed.map_batches(
            lambda t: pa.table(
                {
                    "url": t["url_norm"].cast(pa.string()),
                    "text": t["text"].cast(pa.string()),
                    "n_links": t["n_links"].cast(pa.int32()),
                    "round": pa.array([rnd] * t.num_rows, pa.int32()),
                }
            ),
            batch_format="pyarrow",
        )
        extracted.write_parquet(edir)

        # -- frontier expansion ---------------------------------------
        # NOTE: per-round intermediates are politeness-bounded (taken <=
        # hosts x quota; candidates <= taken x fanout), so materialize()
        # here is bounded state, not a full-corpus pin — it lets the
        # counter .count() calls and the downstream stage share one
        # execution instead of re-running the explode + dedup shuffle.
        candidates = parsed.map_batches(
            lambda t: _explode_links(t, cfg, rnd), batch_format="pyarrow"
        ).materialize()
        c["discovered"] = candidates.count()
        deduped = candidates.groupby("url_hash").map_groups(
            _dedup_keep_min, batch_format="pandas"
        ).materialize()
        c["after_dedup"] = deduped.count()
        c["dup_within_round"] = c["discovered"] - c["after_dedup"]
        # plain tasks, not an actor pool: rules ship once via plasma and
        # per-round actor spin-up would cost more than every batch combined
        allowed = deduped.map_batches(
            make_robots_filter(rules_ref),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        c["skipped_robots"] = c["after_dedup"] - allowed.count()
        accepted = allowed.map_batches(
            make_seen_filter(seen), batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        c["accepted_new"] = accepted.count()
        c["skipped_seen"] = (c["after_dedup"] - c["skipped_robots"]) - c["accepted_new"]
        part_lineage += [
            {"round": rnd, "stage": "dedup", "partition": i, "rows": n}
            for i, n in enumerate(_block_row_counts(deduped))
        ] + [
            {"round": rnd, "stage": "accepted", "partition": i, "rows": n}
            for i, n in enumerate(_block_row_counts(accepted))
        ]

        # -- retries (I3) ---------------------------------------------
        retry_tbl_rows = []
        if c["transient_fail"]:
            for ref in failed.to_arrow_refs():
                ft = ray.get(ref)
                for i in range(ft.num_rows):
                    att = ft["attempt"][i].as_py()
                    if att + 1 <= cfg.retries:
                        u = ft["url_norm"][i].as_py()
                        retry_tbl_rows.append(
                            dict(url=u, url_norm=u,
                                 url_hash=ft["url_hash"][i].as_py(),
                                 host=ft["host"][i].as_py(),
                                 depth=ft["depth"][i].as_py(),
                                 priority=ft["priority"][i].as_py(),
                                 parent_url="", seq=ft["seq"][i].as_py(),
                                 attempt=att + 1, not_before_round=rnd + 1,
                                 discovered_round=rnd)
                        )
        c["retry_exhausted"] = c["transient_fail"] - len(retry_tbl_rows)

        # -- seen delta sink ------------------------------------------
        sdir = os.path.join(out_dir, f"seen/round={rnd}")
        os.makedirs(sdir, exist_ok=True)
        accepted.select_columns(["url_hash"]).write_parquet(sdir)

        # -- next frontier (S6) ---------------------------------------
        nfdir = os.path.join(out_dir, f"frontier/round={rnd + 1}")
        os.makedirs(nfdir, exist_ok=True)
        next_frontier = carry_ds.union(deferred).union(accepted)
        next_frontier = next_frontier.map_batches(
            _enforce_frontier_schema, batch_format="pyarrow", zero_copy_batch=True
        )
        if retry_tbl_rows:
            next_frontier = next_frontier.union(
                rd.from_arrow(_frontier_table(retry_tbl_rows))
            )
        next_frontier.write_parquet(nfdir)
        # carry + deferred == frontier - taken (no extra pass needed)
        c["carryover"] = n_frontier - c["taken"]

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
        summary["extracted"] += c["status_200"]

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
        ray.init(
            address="local", num_cpus=args.num_cpus,
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
