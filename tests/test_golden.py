"""Golden-fixture regression guard (FIXTURES.md §4): the checked-in pyref
outputs pin the crawl semantics across sessions. If core/pyref/gen_corpus
change behavior, these fail — regenerate deliberately with
`python -m raycrawl.fixtures.make_golden` and explain why in the commit."""

import os

import pyarrow.parquet as pq

from raycrawl.fixtures.make_golden import GOLDEN_DIR, compute


def test_golden_oracle_unchanged(smoke_corpus):
    visits, seen, extracted = compute(smoke_corpus)
    g_visits = pq.read_table(os.path.join(GOLDEN_DIR, "expected_visit_order.parquet"))
    g_seen = pq.read_table(os.path.join(GOLDEN_DIR, "expected_seen.parquet"))
    g_extracted = pq.read_table(os.path.join(GOLDEN_DIR, "expected_extracted.parquet"))
    assert visits.equals(g_visits), "visit order drifted from golden"
    assert seen.equals(g_seen), "seen set drifted from golden"
    assert extracted.equals(g_extracted), "extracted text drifted from golden"


def test_golden_ray_engine_matches(ray_session, smoke_corpus, tmp_path):
    """The Ray engine reproduces the golden visit order + seen set
    (transitively covered by the oracle-equivalence tests; this pins it
    directly against the checked-in bytes)."""
    import glob

    import pyarrow as pa

    from raycrawl.fixtures.make_golden import GOLDEN_CFG
    from raycrawl.pipelines.crawl import run_crawl_ray

    out = str(tmp_path / "golden_ray")
    run_crawl_ray(smoke_corpus, out, GOLDEN_CFG, resume=False)
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out}/visits/round=*/*.parquet"))],
        promote_options="default",
    )
    rows = sorted(
        t.to_pylist(), key=lambda r: (r["round"], r["priority"], r["host"], r["seq"])
    )
    g = pq.read_table(os.path.join(GOLDEN_DIR, "expected_visit_order.parquet")).to_pylist()
    assert [(r["url"], r["round"], r["seq"], r["status"]) for r in rows] == [
        (r["url"], r["round"], r["seq"], r["status"]) for r in g
    ]
