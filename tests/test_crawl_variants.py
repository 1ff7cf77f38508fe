"""Alternate-path equivalence: hot-host salted politeness and the
Dataset.join fetch strategy must produce byte-identical crawls to the
default paths (and to the pyref oracle)."""

import pyarrow.parquet as pq
import pytest

from raycrawl import pyref
from raycrawl.core import CrawlConfig
from tests.test_crawl_ray import CMP_KEYS, _load_corpus, _ray_seen, _ray_visits


def _run_and_compare(smoke_corpus, tmp_path, cfg, tag):
    from raycrawl.pipelines.crawl import run_crawl_ray

    pages, robots, seeds = _load_corpus(smoke_corpus)
    oracle = pyref.run_crawl(pages, robots, seeds, cfg)
    out = str(tmp_path / tag)
    summary = run_crawl_ray(smoke_corpus, out, cfg, resume=False)
    got = _ray_visits(out)
    want = sorted(
        oracle.visit_order,
        key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]),
    )
    assert [(r["url"], r["round"], r["seq"], r["status"]) for r in got] == [
        (r["url"], r["round"], r["seq"], r["status"]) for r in want
    ]
    assert _ray_seen(out) == oracle.seen
    for rc, oc in zip(summary["counters"], oracle.counters):
        for k in CMP_KEYS:
            assert rc.get(k, 0) == oc.get(k, 0), (k, rc, oc)


def test_salted_politeness_equivalence(ray_session, smoke_corpus, tmp_path):
    """Force every host through the salted two-phase path
    (hot_threshold=1, driver path disabled): quota selection must be
    unchanged."""
    cfg = CrawlConfig(
        max_rounds=3, seen_shards=4,
        extra={"hot_threshold": 1, "n_salts": 4, "driver_round_threshold": 0},
    )
    _run_and_compare(smoke_corpus, tmp_path, cfg, "salted")


def test_distributed_round_path_equivalence(ray_session, smoke_corpus, tmp_path):
    """driver_round_threshold=0 forces the full distributed path
    (politeness shuffle + fused dedup/flag shuffle); results must equal
    the oracle exactly, like the default driver path does."""
    cfg = CrawlConfig(
        max_rounds=3, seen_shards=4, extra={"driver_round_threshold": 0}
    )
    _run_and_compare(smoke_corpus, tmp_path, cfg, "distributed")


def test_join_fetch_strategy_equivalence(ray_session, smoke_corpus, tmp_path):
    """The hash-partitioned Dataset.join fetch path (for fetch sets too big
    to broadcast) must equal the broadcast path."""
    cfg = CrawlConfig(
        max_rounds=2, seen_shards=4, extra={"fetch_strategy": "join"}
    )
    _run_and_compare(smoke_corpus, tmp_path, cfg, "joinfetch")


def test_max_pages_budget(ray_session, smoke_corpus, tmp_path):
    """I5 page-budget stop: both engines stop before the round that would
    exceed the budget — equivalently."""
    cfg = CrawlConfig(max_rounds=5, seen_shards=2, max_pages=20)
    _run_and_compare(smoke_corpus, tmp_path, cfg, "budget")


def test_host_priority_equivalence(ray_session, smoke_corpus, tmp_path):
    """Per-host priority overrides (the graphrank.host_pagerank feed-in):
    both engines apply them at discovery time and the (priority, host,
    seq) crawl order changes identically. Non-vacuous: hosts are pushed
    to both sides of the default priority."""
    prio = {"h000.example": 1, "h001.example": 2, "h003.example": 9}
    cfg = CrawlConfig(max_rounds=3, seen_shards=4, host_priorities=prio)
    _run_and_compare(smoke_corpus, tmp_path, cfg, "hostprio")
    # sanity: the override actually moved rows off the default priority
    pages, robots, seeds = _load_corpus(smoke_corpus)
    oracle = pyref.run_crawl(pages, robots, seeds, cfg)
    prios = {v["priority"] for v in oracle.visit_order}
    assert {1, 9} & prios, prios


def test_expansion_dispatch_on_candidate_volume(ray_session, smoke_corpus, tmp_path):
    """VERDICT r2 #1: the expansion dispatch keys on estimated CANDIDATE
    volume (taken x links-per-page), not frontier size. A tiny frontier
    with a low candidate threshold must take the distributed expansion
    path (while politeness stays on the driver path) — and still equal
    the oracle byte-for-byte."""
    from raycrawl.pipelines.crawl import run_crawl_ray

    cfg = CrawlConfig(
        max_rounds=3, seen_shards=4,
        extra={"driver_cand_threshold": 10, "links_per_page_est": 50.0},
    )
    _run_and_compare(smoke_corpus, tmp_path, cfg, "candvol")
    out = str(tmp_path / "candvol2")
    s = run_crawl_ray(smoke_corpus, out, cfg, resume=False)
    for c in s["counters"]:
        # frontier is far below driver_round_threshold, but est_candidates
        # (taken x 50 seed, then measured fanout) exceeds the 10-candidate
        # threshold -> every round must have expanded distributed
        assert c["expand_path"] == "distributed", c
        assert c["est_candidates"] > 10, c


def test_expansion_dispatch_uses_measured_fanout(ray_session, smoke_corpus, tmp_path):
    """After round 0, the dispatch estimate uses the trailing measured
    links-per-fetched-page, not the conservative seed."""
    from raycrawl.pipelines.crawl import run_crawl_ray

    cfg = CrawlConfig(max_rounds=2, seen_shards=4)
    out = str(tmp_path / "fanout")
    s = run_crawl_ray(smoke_corpus, out, cfg, resume=False)
    c0, c1 = s["counters"][0], s["counters"][1]
    want_factor = max(1.0, c0["discovered"] / c0["status_200"])
    assert c1["est_candidates"] == int(c1["taken"] * want_factor), (c0, c1)
    # defaults on the smoke corpus: everything fits on the driver
    assert c0["expand_path"] == "driver"


def test_pagerank_derived_priorities_run(ray_session, smoke_corpus, tmp_path):
    """End-to-end: rank the host graph, map ranks to priority buckets,
    crawl with them — the full 'link analysis drives scheduling' loop."""
    from raycrawl import graphrank

    t = graphrank.host_pagerank(smoke_corpus)
    hosts = t["host"].to_pylist()
    # top-5 hosts get priority 1, next 5 get 3, rest default
    prio = {h: 1 for h in hosts[:5]} | {h: 3 for h in hosts[5:10]}
    cfg = CrawlConfig(max_rounds=2, seen_shards=4, host_priorities=prio)
    _run_and_compare(smoke_corpus, tmp_path, cfg, "rankprio")


def test_snapshot_tie_break_pinned(ray_session, smoke_corpus, tmp_path):
    """r5 ADVICE fix: among equal-warc_ts snapshots of one url the winner
    is the pinned smallest-(html, content_type) row — order-independent —
    on BOTH engines. The planted loser rows sit FIRST in the parquet so
    the old first-in-input-order pyref rule (and any block-order-dependent
    engine pick) would select differently: the loser variants carry an
    extra link to a tie-only page, which would change visits, extracted
    text AND discovery counters."""
    import shutil

    import pyarrow as pa
    from raycrawl.pipelines.crawl import run_crawl_ray

    corpus = str(tmp_path / "tiecorpus")
    shutil.copytree(smoke_corpus, corpus)
    import os

    pages = pq.ParquetDataset(f"{corpus}/pages.parquet").read()
    if os.path.isdir(f"{corpus}/pages.parquet"):
        shutil.rmtree(f"{corpus}/pages.parquet")
    seeds_t = pq.read_table(f"{corpus}/seeds.parquet").to_pylist()
    seed_urls = [r["url"] for r in sorted(seeds_t, key=lambda r: r["rank"])][:3]
    by_url = {r["url"]: r for r in pages.to_pylist()}
    losers = []
    for u in seed_urls:
        row = dict(by_url[u])
        # LARGER html (b'~' sorts above every printable tag byte) with an
        # extra link: if this row ever wins, the crawl diverges loudly.
        row["html"] = b'~<html><body><a href="/tie-only-page">x</a>' + (
            row["html"] or b""
        )
        losers.append(row)
    tied = pa.concat_tables(
        [pa.Table.from_pylist(losers, schema=pages.schema), pages]
    )
    pq.write_table(tied, f"{corpus}/pages.parquet")

    cfg = CrawlConfig(max_rounds=3, seen_shards=4)
    pages_l, robots, seeds = _load_corpus(corpus)
    oracle = pyref.run_crawl(pages_l, robots, seeds, cfg)
    # the pinned pyref rule must pick the ORIGINAL (smaller) html: no
    # tie-only url may be discovered
    assert not any("tie-only" in r["url"] for r in oracle.visit_order)

    out = str(tmp_path / "tieout")
    summary = run_crawl_ray(corpus, out, cfg, resume=False)
    got = _ray_visits(out)
    want = sorted(
        oracle.visit_order,
        key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]),
    )
    assert [(r["url"], r["round"], r["seq"], r["status"]) for r in got] == [
        (r["url"], r["round"], r["seq"], r["status"]) for r in want
    ]
    assert _ray_seen(out) == oracle.seen
    # byte-identity of extracted text through the tie pick
    from tests.test_crawl_ray import _ray_extracted

    got_x = {(r["round"], r["url"]): r["text"] for r in _ray_extracted(out)}
    want_x = {(r["round"], r["url"]): r["text"] for r in oracle.extracted}
    assert got_x == want_x
    for rc, oc in zip(summary["counters"], oracle.counters):
        for k in CMP_KEYS:
            assert rc.get(k, 0) == oc.get(k, 0), (k, rc, oc)
