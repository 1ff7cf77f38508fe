"""ST1 actor-state recovery (SURVEY.md §7 hard part (d)): a seen-shard
actor killed mid-crawl must be rebuilt from the committed snapshots, the
in-flight round rolled back on survivors, and the round re-executed — with
final outputs EXACTLY equal to the oracle's."""

import numpy as np
import pytest

from raycrawl import pyref
from raycrawl.core import CrawlConfig
from raycrawl.stages.seen import SeenSet
from tests.test_crawl_ray import CMP_KEYS, _load_corpus, _ray_seen, _ray_visits


def test_shard_kill_mid_crawl_recovers(ray_session, smoke_corpus, tmp_path):
    from raycrawl.pipelines.crawl import run_crawl_ray

    cfg = CrawlConfig(
        max_rounds=3, seen_shards=4,
        extra={"chaos_kill_shard_in_round": (1, 2)},  # kill shard 2 in round 1
    )
    pages, robots, seeds = _load_corpus(smoke_corpus)
    oracle = pyref.run_crawl(pages, robots, seeds, CrawlConfig(max_rounds=3, seen_shards=4))
    out = str(tmp_path / "chaos")
    summary = run_crawl_ray(smoke_corpus, out, cfg, resume=False)
    assert summary.get("shard_recoveries", 0) >= 1

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


def test_rollback_round_semantics(ray_session):
    """Staged adds roll back exactly; committed rounds survive."""
    seen = SeenSet(2, capacity_per_shard=1 << 12)
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    assert seen.filter_batch(a).all()
    seen.begin_round()  # commit round 0
    b = np.array([5, 6, 1], dtype=np.uint64)  # 1 is dup from committed round
    keep = seen.filter_batch(b)
    assert keep.tolist() == [True, True, False]
    # roll back the in-flight round: 5,6 forgotten; 1-4 still seen
    recovered = seen.recover(lambda: a)
    assert recovered == 0  # all shards alive -> rollback only
    keep2 = seen.filter_batch(np.array([5, 6, 1, 4], dtype=np.uint64))
    assert keep2.tolist() == [True, True, False, False]
    seen.kill()


def test_dead_shard_replay(ray_session):
    """A killed shard is rebuilt from the loader and keeps exact semantics."""
    import ray

    seen = SeenSet(2, capacity_per_shard=1 << 12)
    committed = np.arange(100, dtype=np.uint64)
    seen.replay(committed)
    seen.begin_round()
    ray.kill(seen.shards[0], no_restart=True)
    # ray.kill is async — wait until the actor is actually dead, else the
    # next RPC can still succeed and recover() sees a healthy shard
    import time

    for _ in range(100):
        try:
            ray.get(seen.shards[0].size.remote(), timeout=2)
            time.sleep(0.1)
        except Exception:
            break
    rebuilt = seen.recover(lambda: committed)
    assert rebuilt == 1
    # all committed hashes still seen; new ones still novel
    keep = seen.filter_batch(np.array([5, 50, 1000, 2000], dtype=np.uint64))
    assert keep.tolist() == [False, False, True, True]
    seen.kill()


def test_cuckoo_delete():
    from raycrawl.state.cuckoo import CuckooFilter

    f = CuckooFilter(1 << 10)
    for h in range(100, 200):
        assert f.add(h)
    assert f.contains(150)
    assert f.delete(150)
    assert not f.contains(150)
    assert not f.delete(150)  # already gone
    assert f.contains(151)


def test_committed_hashes_exclude_uncommitted_round(tmp_path):
    """Crash window between the seen-delta write and the _SUCCESS marker:
    the dead-shard replay source must NOT include the in-flight round's
    delta, or the re-executed round sees its own URLs as already-seen."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl.pipelines.crawl import _load_committed_hashes

    out = str(tmp_path / "out")

    def _write(rel, hashes):
        d = os.path.join(out, rel)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"url_hash": pa.array(hashes, pa.uint64())}),
            os.path.join(d, "part-0.parquet"),
        )

    _write("seen/round=bootstrap", [1, 2])
    _write("seen/round=0", [10, 11])
    os.makedirs(os.path.join(out, "ckpt/round=0"), exist_ok=True)
    with open(os.path.join(out, "ckpt/round=0/_SUCCESS"), "w") as f:
        f.write("ok\n")
    # round 1 delta written but round 1 never committed (no _SUCCESS)
    _write("seen/round=1", [20, 21])

    got = sorted(_load_committed_hashes(out).tolist())
    assert got == [1, 2, 10, 11]


def test_max_pages_budget_survives_resume(ray_session, smoke_corpus, tmp_path):
    """I5 x I4: a crawl interrupted after a committed round and resumed must
    stop at the same round the uninterrupted run (and pyref) would — the
    budget counts committed rounds' fetches, not just post-resume ones."""
    from raycrawl.pipelines.crawl import run_crawl_ray

    pages, robots, seeds = _load_corpus(smoke_corpus)
    # budget below round-0 fetch volume: oracle runs exactly one round
    oracle = pyref.run_crawl(
        pages, robots, seeds, CrawlConfig(max_rounds=3, seen_shards=4, max_pages=5)
    )
    assert oracle.rounds_run == 1

    out = str(tmp_path / "resume_budget")
    # first execution "crashes" after committing round 0
    run_crawl_ray(
        smoke_corpus, out,
        CrawlConfig(max_rounds=1, seen_shards=4, max_pages=5), resume=False,
    )
    # resume with the full round budget: must NOT run any further rounds
    summary = run_crawl_ray(
        smoke_corpus, out,
        CrawlConfig(max_rounds=3, seen_shards=4, max_pages=5), resume=True,
    )
    assert summary["resumed_at"] == 1

    got = _ray_visits(out)
    want = sorted(
        oracle.visit_order,
        key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]),
    )
    assert [(r["url"], r["round"], r["seq"], r["status"]) for r in got] == [
        (r["url"], r["round"], r["seq"], r["status"]) for r in want
    ]
    assert _ray_seen(out) == oracle.seen


def test_resume_on_join_strategy(ray_session, smoke_corpus, tmp_path):
    """I4 on the SCALE path: a crawl using the Dataset.join fetch strategy
    interrupted after round 0 and resumed must equal the oracle, same as
    the broadcast path does."""
    from raycrawl.pipelines.crawl import run_crawl_ray

    extra = {"fetch_strategy": "join", "driver_round_threshold": 0}
    pages, robots, seeds = _load_corpus(smoke_corpus)
    oracle = pyref.run_crawl(
        pages, robots, seeds, CrawlConfig(max_rounds=3, seen_shards=4)
    )
    out = str(tmp_path / "join_resume")
    run_crawl_ray(
        smoke_corpus, out,
        CrawlConfig(max_rounds=1, seen_shards=4, extra=dict(extra)), resume=False,
    )
    summary = run_crawl_ray(
        smoke_corpus, out,
        CrawlConfig(max_rounds=3, seen_shards=4, extra=dict(extra)), resume=True,
    )
    assert summary["resumed_at"] == 1
    got = _ray_visits(out)
    want = sorted(
        oracle.visit_order,
        key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]),
    )
    assert [(r["url"], r["round"], r["seq"], r["status"]) for r in got] == [
        (r["url"], r["round"], r["seq"], r["status"]) for r in want
    ]
    assert _ray_seen(out) == oracle.seen
