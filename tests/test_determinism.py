"""SURVEY.md §5.2.5: the same crawl at different parallelism levels (fresh
Ray processes, num_cpus=2 vs 8) must produce byte-identical sorted outputs
— the logical-ordering design (§4.3) makes results invariant to scheduling."""

import glob
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SCRIPT = """
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from raycrawl.core import CrawlConfig
from raycrawl.pipelines.crawl import run_crawl_ray
# force the distributed shuffle paths so parallelism actually varies
cfg = CrawlConfig(max_rounds=3, seen_shards=4,
                  extra={{"driver_round_threshold": 0}})
s = run_crawl_ray(sys.argv[2], sys.argv[3], cfg, resume=False)
print(json.dumps({{"visits": s["visits"], "seen": s["seen_total"]}}))
ray.shutdown()
"""


def _collect(out_dir):
    vt = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out_dir}/visits/round=*/*.parquet"))],
        promote_options="default",
    ).to_pylist()
    vt.sort(key=lambda r: (r["round"], r["priority"], r["host"], r["seq"]))
    st = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out_dir}/seen/round=*/*.parquet"))],
        promote_options="default",
    )
    et = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out_dir}/extracted/round=*/*.parquet"))],
        promote_options="default",
    ).to_pylist()
    return (
        [(r["url"], r["round"], r["seq"], r["status"], r["user_agent"]) for r in vt],
        sorted(st["url_hash"].to_pylist()),
        sorted((r["url"], r["text"], r["n_links"], r["round"]) for r in et),
    )


def test_cpu_count_invariance(smoke_corpus, tmp_path):
    script = str(tmp_path / "run_crawl.py")
    with open(script, "w") as f:
        f.write(RUN_SCRIPT.format(repo=REPO))
    outs = {}
    for cpus in (2, 8):
        out = str(tmp_path / f"out{cpus}")
        p = subprocess.run(
            [sys.executable, script, str(cpus), smoke_corpus, out],
            capture_output=True, text=True, timeout=900, cwd=REPO,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        outs[cpus] = _collect(out)
    assert outs[2][0] == outs[8][0], "visit order differs across num_cpus"
    assert outs[2][1] == outs[8][1], "seen set differs across num_cpus"
    assert outs[2][2] == outs[8][2], "extracted bytes differ across num_cpus"
