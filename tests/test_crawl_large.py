"""Oracle equivalence at the correctness corpus size (H=50, ~10k pages,
4 rounds) — 10x the smoke scale. This caught the seed-child seq-collision
bug that the smoke corpus was too small to surface."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raycrawl import pyref
from raycrawl.core import CrawlConfig


@pytest.fixture(scope="module")
def large_corpus(tmp_path_factory):
    from raycrawl.fixtures.gen_corpus import generate

    out = str(tmp_path_factory.mktemp("corpus") / "large")
    generate(out, n_hosts=50, n_pages=10_000, seed=42, procs=4)
    return out


@pytest.fixture(scope="module")
def large_oracle(large_corpus):
    pages = pq.read_table(f"{large_corpus}/pages.parquet").to_pylist()
    robots = pq.read_table(f"{large_corpus}/robots.parquet").to_pylist()
    seeds = [
        r["url"]
        for r in sorted(
            pq.read_table(f"{large_corpus}/seeds.parquet").to_pylist(),
            key=lambda r: r["rank"],
        )
    ]
    return pyref.run_crawl(pages, robots, seeds, CrawlConfig(max_rounds=4, seen_shards=8))


@pytest.mark.parametrize(
    "extra",
    [
        {},  # hybrid default (driver path at this size)
        {"driver_round_threshold": 0},  # full distributed expansion path
        {"driver_round_threshold": 0, "fetch_strategy": "join"},  # scale path
    ],
    ids=["default", "distributed", "distributed_join"],
)
def test_large_corpus_equivalence(ray_session, large_corpus, large_oracle, tmp_path, extra):
    from raycrawl.pipelines.crawl import run_crawl_ray

    oracle = large_oracle
    cfg = CrawlConfig(max_rounds=4, seen_shards=8, extra=dict(extra))
    out = str(tmp_path / "large")
    run_crawl_ray(large_corpus, out, cfg, resume=False)

    tabs = [pq.read_table(f) for f in sorted(glob.glob(f"{out}/visits/round=*/*.parquet"))]
    got = pa.concat_tables(tabs, promote_options="default").to_pylist()
    got.sort(key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]))
    want = sorted(
        oracle.visit_order, key=lambda r: (r["round"], r["priority"], r["host"], r["seq"])
    )
    assert len(got) > 900  # the crawl actually went wide
    assert [(r["url"], r["round"], r["seq"], r["status"]) for r in got] == [
        (r["url"], r["round"], r["seq"], r["status"]) for r in want
    ]

    stabs = [pq.read_table(f) for f in sorted(glob.glob(f"{out}/seen/round=*/*.parquet"))]
    assert set(pa.concat_tables(stabs, promote_options="default")["url_hash"].to_pylist()) \
        == oracle.seen

    etabs = [pq.read_table(f) for f in sorted(glob.glob(f"{out}/extracted/round=*/*.parquet"))]
    ex_got = {
        r["url"]: r["text"]
        for r in pa.concat_tables(etabs, promote_options="default").to_pylist()
    }
    assert ex_got == {r["url"]: r["text"] for r in oracle.extracted}
