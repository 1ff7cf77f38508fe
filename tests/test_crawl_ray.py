"""Engine-vs-oracle equivalence (SURVEY.md §5.2.1/4/5): the Ray Data crawl
must reproduce pyref's visit order, seen set, extracted bytes, and counters
exactly, and must resume mid-frontier without re-fetching seen URLs."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from raycrawl import core, pyref
from raycrawl.core import CrawlConfig


def _load_corpus(corpus_dir):
    pages = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    robots = pq.read_table(f"{corpus_dir}/robots.parquet").to_pylist()
    seeds_t = pq.read_table(f"{corpus_dir}/seeds.parquet").to_pylist()
    seeds = [r["url"] for r in sorted(seeds_t, key=lambda r: r["rank"])]
    return pages, robots, seeds


def _read_dir(pattern):
    files = sorted(glob.glob(pattern))
    tabs = [pq.read_table(f) for f in files]
    import pyarrow as pa

    return pa.concat_tables(tabs, promote_options="default") if tabs else None


def _ray_visits(out_dir):
    t = _read_dir(os.path.join(out_dir, "visits/round=*/*.parquet"))
    rows = t.to_pylist() if t is not None else []
    rows.sort(key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]))
    return rows


def _ray_extracted(out_dir):
    t = _read_dir(os.path.join(out_dir, "extracted/round=*/*.parquet"))
    return t.to_pylist() if t is not None else []


def _ray_seen(out_dir):
    t = _read_dir(os.path.join(out_dir, "seen/round=*/*.parquet"))
    return set(t["url_hash"].to_pylist()) if t is not None else set()


CMP_KEYS = [
    "fetched", "status_200", "status_404", "discovered", "dup_within_round",
    "skipped_robots", "skipped_seen", "skipped_content_type", "carryover",
    "transient_fail", "retry_exhausted",
]


@pytest.fixture(scope="module")
def crawl_pair(ray_session, smoke_corpus, tmp_path_factory):
    from raycrawl.pipelines.crawl import run_crawl_ray

    cfg = CrawlConfig(max_rounds=3, seen_shards=4)
    pages, robots, seeds = _load_corpus(smoke_corpus)
    oracle = pyref.run_crawl(pages, robots, seeds, cfg)
    out = str(tmp_path_factory.mktemp("crawl") / "run1")
    summary = run_crawl_ray(smoke_corpus, out, cfg, resume=False)
    return oracle, summary, out


def test_visit_order_matches_oracle(crawl_pair):
    oracle, _, out = crawl_pair
    got = _ray_visits(out)
    want = sorted(
        oracle.visit_order,
        key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]),
    )
    assert [(r["url"], r["round"], r["seq"], r["status"], r["user_agent"]) for r in got] == [
        (r["url"], r["round"], r["seq"], r["status"], r["user_agent"]) for r in want
    ]


def test_extracted_bytes_match_oracle(crawl_pair):
    oracle, _, out = crawl_pair
    got = {r["url"]: (r["text"], r["n_links"], r["round"]) for r in _ray_extracted(out)}
    want = {r["url"]: (r["text"], r["n_links"], r["round"]) for r in oracle.extracted}
    assert got == want  # byte-identical text per url (BASELINE.json:15)


def test_seen_set_matches_oracle(crawl_pair):
    oracle, summary, out = crawl_pair
    assert _ray_seen(out) == oracle.seen
    assert summary["seen_total"] == len(oracle.seen)


def test_counters_match_oracle(crawl_pair):
    oracle, summary, _ = crawl_pair
    assert len(summary["counters"]) == len(oracle.counters)
    for rc, oc in zip(summary["counters"], oracle.counters):
        for k in CMP_KEYS:
            assert rc.get(k, 0) == oc.get(k, 0), (k, rc, oc)


def test_resume_after_kill(ray_session, smoke_corpus, tmp_path):
    """Run 1 round, 'crash', resume to 3 — outputs identical to an
    uninterrupted 3-round run; no url fetched twice (I4)."""
    from raycrawl.pipelines.crawl import run_crawl_ray

    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "straight")
    cfg1 = CrawlConfig(max_rounds=1, seen_shards=4)
    cfg3 = CrawlConfig(max_rounds=3, seen_shards=4)
    run_crawl_ray(smoke_corpus, out_a, cfg1, resume=False)
    s_resumed = run_crawl_ray(smoke_corpus, out_a, cfg3, resume=True)
    assert s_resumed["resumed_at"] == 1
    run_crawl_ray(smoke_corpus, out_b, cfg3, resume=False)

    va, vb = _ray_visits(out_a), _ray_visits(out_b)
    assert [(r["url"], r["round"], r["status"]) for r in va] == [
        (r["url"], r["round"], r["status"]) for r in vb
    ]
    assert _ray_seen(out_a) == _ray_seen(out_b)
    urls = [r["url"] for r in va if r["status"] == 200]
    assert len(urls) == len(set(urls))  # no refetch across the resume


def test_retry_rounds_match_oracle(ray_session, tmp_path):
    """Transient failures retry with backoff identically in both engines."""
    import pyarrow as pa

    from raycrawl.fixtures.gen_corpus import generate
    from raycrawl.pipelines.crawl import run_crawl_ray

    corpus = str(tmp_path / "c")
    generate(corpus, n_hosts=5, n_pages=60, seed=7)
    cfg = CrawlConfig(max_rounds=4, seen_shards=2, fail_permille=300, retries=2)
    pages, robots, seeds = _load_corpus(corpus)
    oracle = pyref.run_crawl(pages, robots, seeds, cfg)
    out = str(tmp_path / "o")
    summary = run_crawl_ray(corpus, out, cfg, resume=False)
    got = _ray_visits(out)
    want = sorted(
        oracle.visit_order,
        key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]),
    )
    assert [(r["url"], r["round"], r["status"]) for r in got] == [
        (r["url"], r["round"], r["status"]) for r in want
    ]
    for rc, oc in zip(summary["counters"], oracle.counters):
        for k in CMP_KEYS:
            assert rc.get(k, 0) == oc.get(k, 0), (k, rc, oc)


def test_politeness_quota_enforced(crawl_pair):
    _, _, out = crawl_pair
    # hot host h000 has crawl-delay 5000ms -> quota 12/round
    visits = _ray_visits(out)
    from collections import Counter

    per = Counter((v["round"], v["host"]) for v in visits)
    assert all(n <= 12 for (_, h), n in per.items() if h == "h000.example")


def test_content_type_gate(crawl_pair):
    """M10: non-HTML assets are fetched (status-200 visit) but never parsed
    — no extracted row, no frontier expansion — identically in both
    engines. Non-vacuous: the v3 corpus plants asset links the 3-round
    smoke crawl reaches."""
    oracle, summary, out = crawl_pair
    skipped = [c["skipped_content_type"] for c in summary["counters"]]
    assert sum(skipped) > 0, "corpus must exercise the content-type gate"
    assert skipped == [c["skipped_content_type"] for c in oracle.counters]
    visits = _ray_visits(out)
    asset_visits = [v for v in visits if "/asset/" in v["url"]]
    assert len(asset_visits) == sum(skipped)
    assert all(v["status"] == 200 for v in asset_visits)
    ext = _read_dir(os.path.join(out, "extracted/round=*/*.parquet"))
    assert not any("/asset/" in u for u in ext["url"].to_pylist())


def test_parse_batch_byte_cap():
    """Pathological multi-MB pages: the byte-capped parse slices the block
    so Python-heap copies stay bounded, with output identical to the
    uncapped parse (SURVEY §7 hard-part (e))."""
    import pyarrow as pa

    from raycrawl.pipelines.crawl import _parse_batch

    big = ("<html><body><p>" + "word " * 600_000 + "</p></body></html>").encode()
    small = b"<html><body><p>tiny page</p><a href='/x'>x</a></body></html>"
    htmls = [big, small, big, small, big]
    t = pa.table(
        {
            "url_norm": pa.array(
                [f"http://h.example/p{i}" for i in range(len(htmls))], pa.string()
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )
    capped = _parse_batch(t, max_batch_bytes=4 << 20)  # each big page ~3 MB
    uncapped = _parse_batch(t, max_batch_bytes=0)
    assert capped.equals(uncapped)
    assert capped.num_rows == len(htmls)
    assert capped["n_links"].to_pylist() == [0, 1, 0, 1, 0]
