"""Oracle-level behavioral tests (SURVEY.md §5.2.1) on a tiny hand-built web
plus the generated smoke corpus."""

import pyarrow.parquet as pq

from raycrawl import core, pyref
from raycrawl.core import CrawlConfig

TS = 1_700_000_000_000_000


def page(url, html, ts=TS, lang="en"):
    return {"url": url, "warc_ts": ts, "html": html, "text": "", "lang": lang}


def mini_web():
    pages = [
        page("http://a.com/", b'<a href="/x">x</a><a href="/y">y</a><p>root a</p>'),
        page("http://a.com/x", b'<a href="http://b.com/">b</a><p>ax</p>'),
        page("http://a.com/y", b"<p>ay</p>"),
        page("http://b.com/", b'<a href="/x">bx</a><a href="/priv/z">pz</a><p>root b</p>'),
        page("http://b.com/x", b"<p>bx</p>"),
        page("http://b.com/priv/z", b"<p>secret</p>"),
    ]
    robots = [
        {"host": "a.com", "rules": "User-agent: *\nDisallow:\n", "crawl_delay_ms": 0, "fetched_ts": TS},
        {"host": "b.com", "rules": "User-agent: *\nDisallow: /priv/\n", "crawl_delay_ms": 0, "fetched_ts": TS},
    ]
    return pages, robots


def test_mini_crawl_order_and_seen():
    pages, robots = mini_web()
    res = pyref.run_crawl(pages, robots, ["http://a.com/"], CrawlConfig(max_rounds=4))
    urls = [v["url"] for v in res.visit_order]
    # round0: seed; round1: /x,/y in doc order; round2: b.com/
    assert urls[:4] == ["http://a.com/", "http://a.com/x", "http://a.com/y", "http://b.com/"]
    # robots blocks /priv/z; b.com/x fetched in round 3
    assert "http://b.com/priv/z" not in urls
    assert "http://b.com/x" in urls
    assert res.counters[2]["skipped_robots"] == 1
    # seen set is exactly the visited urls (all were fetchable)
    assert res.seen == {core.url_hash(u) for u in urls}


def test_dedup_within_round_keeps_min_seq():
    pages = [
        page("http://a.com/", b'<a href="/t">1</a><a href="/t">2</a>'),
        page("http://a.com/t", b"<p>t</p>"),
    ]
    res = pyref.run_crawl(pages, [], ["http://a.com/"], CrawlConfig(max_rounds=2))
    t = [v for v in res.visit_order if v["url"] == "http://a.com/t"]
    assert len(t) == 1
    assert t[0]["seq"] == core.child_seq(0, 0)  # first link wins
    assert res.counters[0]["dup_within_round"] == 1


def test_cross_round_seen():
    pages = [
        page("http://a.com/", b'<a href="/x">x</a>'),
        page("http://a.com/x", b'<a href="/">back</a>'),
    ]
    res = pyref.run_crawl(pages, [], ["http://a.com/"], CrawlConfig(max_rounds=4))
    assert [v["url"] for v in res.visit_order] == ["http://a.com/", "http://a.com/x"]
    assert res.counters[1]["skipped_seen"] == 1


def test_404_miss():
    pages = [page("http://a.com/", b'<a href="/gone">g</a>')]
    res = pyref.run_crawl(pages, [], ["http://a.com/"], CrawlConfig(max_rounds=2))
    missing = [v for v in res.visit_order if v["url"] == "http://a.com/gone"]
    assert missing and missing[0]["status"] == 404
    assert res.counters[1]["status_404"] == 1


def test_politeness_carryover():
    links = "".join(f'<a href="/p{i}">l</a>' for i in range(10))
    pages = [page("http://a.com/", links.encode())] + [
        page(f"http://a.com/p{i}", b"<p>x</p>") for i in range(10)
    ]
    robots = [
        {"host": "a.com", "rules": "User-agent: *\nCrawl-delay: 20\n",
         "crawl_delay_ms": 20000, "fetched_ts": TS}
    ]
    # quota = 60000 / 20000 = 3 per round
    res = pyref.run_crawl(pages, robots, ["http://a.com/"], CrawlConfig(max_rounds=4))
    per_round = {}
    for v in res.visit_order:
        per_round[v["round"]] = per_round.get(v["round"], 0) + 1
    assert all(n <= 3 for n in per_round.values())
    assert res.counters[1]["carryover"] > 0
    # carryover preserves crawl order: p0..p2 round1, p3..p5 round2...
    r1 = [v["url"] for v in res.visit_order if v["round"] == 1]
    assert r1 == [f"http://a.com/p{i}" for i in range(3)]
    r2 = [v["url"] for v in res.visit_order if v["round"] == 2]
    assert r2 == [f"http://a.com/p{i}" for i in range(3, 6)]


def test_retry_transient_failure():
    pages = [page("http://a.com/", b"<p>root</p>")]
    # fail_permille=1000 -> every attempt fails -> retries exhausted
    res = pyref.run_crawl(
        pages, [], ["http://a.com/"], CrawlConfig(max_rounds=6, fail_permille=1000, retries=3)
    )
    assert res.visit_order == []
    total_fail = sum(c["transient_fail"] for c in res.counters)
    assert total_fail == 4  # attempts 0..3
    assert sum(c["retry_exhausted"] for c in res.counters) == 1


def test_max_depth():
    pages = [
        page("http://a.com/", b'<a href="/1">x</a>'),
        page("http://a.com/1", b'<a href="/2">x</a>'),
        page("http://a.com/2", b"<p>leaf</p>"),
    ]
    res = pyref.run_crawl(pages, [], ["http://a.com/"], CrawlConfig(max_rounds=9, max_depth=1))
    urls = [v["url"] for v in res.visit_order]
    assert urls == ["http://a.com/", "http://a.com/1"]


def test_snapshot_pick_latest():
    pages = [
        page("http://a.com/", b"<p>old</p>", ts=TS),
        page("http://a.com/", b"<p>new</p>", ts=TS + 10),
    ]
    res = pyref.run_crawl(pages, [], ["http://a.com/"], CrawlConfig(max_rounds=1))
    assert res.extracted[0]["text"] == "new"


def test_smoke_corpus_crawl(smoke_corpus):
    pages = pq.read_table(f"{smoke_corpus}/pages.parquet").to_pylist()
    robots = pq.read_table(f"{smoke_corpus}/robots.parquet").to_pylist()
    seeds_t = pq.read_table(f"{smoke_corpus}/seeds.parquet").to_pylist()
    seeds = [r["url"] for r in sorted(seeds_t, key=lambda r: r["rank"])]
    res = pyref.run_crawl(pages, robots, seeds, CrawlConfig(max_rounds=3))
    assert res.rounds_run == 3
    assert len(res.extracted) > 50
    # extracted text matches the corpus oracle column byte-for-byte
    best = pyref.snapshot_pick(pages)
    for e in res.extracted:
        assert e["text"] == best[e["url"]]["text"]
    # visit order is sorted by (round, priority, host, seq)
    keys = [(v["round"], v["priority"], v["host"], v["seq"]) for v in res.visit_order]
    assert keys == sorted(keys)
    # determinism: second run identical
    res2 = pyref.run_crawl(pages, robots, seeds, CrawlConfig(max_rounds=3))
    assert res.visit_order == res2.visit_order
    assert res.seen == res2.seen
