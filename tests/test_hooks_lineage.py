"""X2 pre_request / X3 page_callback hooks, UA rotation, per-partition
lineage, and the HLL sketch."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl.core import CrawlConfig


def test_pre_request_veto_and_callback(ray_session, smoke_corpus, tmp_path):
    from raycrawl.pipelines.crawl import run_crawl_ray

    # hooks are nested so cloudpickle ships them by value (a module-level
    # test function would pickle by reference and fail on workers)
    def _veto_h001(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(pc.equal(t["host"], "h001.example")))

    def _tag_page(url, text, links):
        return {"n_words": len(text.split()), "u": url}

    cfg = CrawlConfig(
        max_rounds=2, seen_shards=2,
        user_agents=("ua-a", "ua-b", "ua-c"),
        extra={"pre_request": _veto_h001, "page_callback": _tag_page},
    )
    out = str(tmp_path / "hooks")
    run_crawl_ray(smoke_corpus, out, cfg, resume=False)
    visits = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out}/visits/round=*/*.parquet"))],
        promote_options="default",
    ).to_pylist()
    # X2: vetoed host never fetched
    assert all(v["host"] != "h001.example" for v in visits)
    # M12: deterministic UA rotation by seq
    for v in visits:
        assert v["user_agent"] == ("ua-a", "ua-b", "ua-c")[v["seq"] % 3]
    # X3: callback output landed in the extracted sink
    ex = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out}/extracted/round=*/*.parquet"))],
        promote_options="default",
    )
    assert ex.num_rows > 0


def test_partition_lineage_written(ray_session, smoke_corpus, tmp_path):
    from raycrawl.pipelines.crawl import run_crawl_ray

    out = str(tmp_path / "lin")
    s = run_crawl_ray(smoke_corpus, out, CrawlConfig(max_rounds=2, seen_shards=2), resume=False)
    for rnd in range(2):
        p = os.path.join(out, f"ckpt/round={rnd}/partition_lineage.parquet")
        assert os.path.exists(p)
        t = pq.read_table(p)
        stages = set(t["stage"].to_pylist())
        assert {"politeness_taken", "parse"} <= stages
        # per-partition rows sum to the round counters
        rows = t.to_pylist()
        parse_sum = sum(r["rows"] for r in rows if r["stage"] == "parse")
        assert parse_sum == s["counters"][rnd]["status_200"]


def test_hll_accuracy(ray_session):
    from raycrawl.sketches import HLL, q_approx_distinct

    h = HLL(p=12)
    h.add([f"item-{i}" for i in range(10_000)])
    est = h.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05
    # merge: two halves == whole
    a, b = HLL(12), HLL(12)
    a.add([f"x-{i}" for i in range(5000)])
    b.add([f"x-{i}" for i in range(2500, 7500)])
    a.merge(b)
    assert abs(a.estimate() - 7500) / 7500 < 0.05
    # dataset surface
    out = q_approx_distinct("/root/testdata/sf0.001").to_pylist()[0]
    assert out["rel_err"] < 0.1
