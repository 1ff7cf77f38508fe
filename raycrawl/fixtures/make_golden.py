"""Produce the checked-in golden oracle outputs (FIXTURES.md §4).

Runs the pyref oracle over the deterministic smoke corpus (H=20, ~1k
pages, seed=42) and writes:

  tests/fixtures/golden/expected_visit_order.parquet
  tests/fixtures/golden/expected_seen.parquet
  tests/fixtures/golden/expected_extracted.parquet

These pin the crawl semantics ACROSS sessions: if core/pyref/gen_corpus
drift, tests/test_golden.py fails. Regenerate ONLY on a deliberate,
documented semantic change: `python -m raycrawl.fixtures.make_golden`.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl import pyref
from raycrawl.core import CrawlConfig
from raycrawl.fixtures.gen_corpus import generate

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "golden",
)
GOLDEN_CFG = CrawlConfig(max_rounds=3, seen_shards=4)


def compute(corpus_dir: str | None = None):
    if corpus_dir is None:
        corpus_dir = os.path.join(tempfile.mkdtemp(prefix="golden_"), "corpus")
        generate(corpus_dir, n_hosts=20, n_pages=1000, seed=42)
    pages = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    robots = pq.read_table(f"{corpus_dir}/robots.parquet").to_pylist()
    seeds_t = pq.read_table(f"{corpus_dir}/seeds.parquet").to_pylist()
    seeds = [r["url"] for r in sorted(seeds_t, key=lambda r: r["rank"])]
    res = pyref.run_crawl(pages, robots, seeds, GOLDEN_CFG)

    visits = pa.table(
        {
            "url": [v["url"] for v in res.visit_order],
            "round": pa.array([v["round"] for v in res.visit_order], pa.int32()),
            "priority": pa.array([v["priority"] for v in res.visit_order], pa.int32()),
            "host": [v["host"] for v in res.visit_order],
            "seq": pa.array([v["seq"] for v in res.visit_order], pa.int64()),
            "status": pa.array([v["status"] for v in res.visit_order], pa.int32()),
            "user_agent": [v["user_agent"] for v in res.visit_order],
        }
    )
    seen = pa.table({"url_hash": pa.array(sorted(res.seen), pa.uint64())})
    extracted = pa.table(
        {
            "url": [e["url"] for e in res.extracted],
            "text": [e["text"] for e in res.extracted],
            "n_links": pa.array([e["n_links"] for e in res.extracted], pa.int32()),
            "round": pa.array([e["round"] for e in res.extracted], pa.int32()),
        }
    )
    return visits, seen, extracted


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    visits, seen, extracted = compute()
    pq.write_table(visits, os.path.join(GOLDEN_DIR, "expected_visit_order.parquet"))
    pq.write_table(seen, os.path.join(GOLDEN_DIR, "expected_seen.parquet"))
    pq.write_table(extracted, os.path.join(GOLDEN_DIR, "expected_extracted.parquet"))
    print(f"golden fixtures written to {GOLDEN_DIR}: "
          f"{visits.num_rows} visits, {seen.num_rows} seen, {extracted.num_rows} extracted")


if __name__ == "__main__":
    main()
