"""raycrawl benchmark harness (SURVEY.md §6).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) + the bench crawl corpus, under
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32), and print ONE
JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {...pages/s...}}

--scaling: run the extract+analyze headline in FRESH subprocesses at
--cpus-low (2) and --cpus-high (8) — N and 4N, each pinned with taskset to
that many physical cores — on the same input; report both throughputs +
scaling efficiency (sandbox proxy for the N-vs-4N-node criterion). The
2/8 pair is used because this shared-tenant host cannot itself scale 8->32
processes beyond ~0.72 (pure-multiprocessing control, CPU steal) — see
BENCH/BASELINE.md for the full diagnosis; override with --cpus-low/high.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_HOSTS = 200
BENCH_PAGES = 100_000


def _bench_corpus_path() -> str:
    from raycrawl.fixtures.gen_corpus import GEN_VERSION

    return f"/tmp/raycrawl_bench_corpus_v{GEN_VERSION}"


BENCH_CORPUS = _bench_corpus_path()


def ensure_bench_corpus() -> str:
    from raycrawl.fixtures.gen_corpus import generate

    marker = os.path.join(BENCH_CORPUS, ".complete")
    if not os.path.exists(marker):
        generate(BENCH_CORPUS, n_hosts=BENCH_HOSTS, n_pages=BENCH_PAGES,
                 procs=min(16, os.cpu_count() or 4))
        with open(marker, "w") as f:
            f.write("ok\n")
    return BENCH_CORPUS


def _consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        n += b.num_rows
    return n


def bench_extract(corpus: str) -> dict:
    """Headline: full-corpus fused parse (M4+M5+M6) — the dominant compute
    of any crawl round."""
    import pyarrow as pa
    import ray.data as rd

    from raycrawl import core

    def parse(t: pa.Table) -> pa.Table:
        texts, nlinks = [], []
        for html, base in zip(t["html"].to_pylist(), t["url"].to_pylist()):
            text, links = core.extract_page(html or b"", base or "")
            texts.append(text)
            nlinks.append(len(links))
        return pa.table(
            {
                "url": t["url"],
                "text": pa.array(texts, pa.string()),
                "n_links": pa.array(nlinks, pa.int32()),
            }
        )

    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    t0 = time.perf_counter()
    # block count scales with parallelism: ~4 waves of ~1k-page tasks keeps
    # every slot busy and amortizes stragglers (27 raw files < 32 slots
    # would otherwise cap utilization below one wave)
    ds = rd.read_parquet(os.path.join(corpus, "pages.parquet"), columns=["url", "html"],
                         override_num_blocks=4 * ncpu)
    # whole-block batches: explicit re-slicing (batch_size=1024) measured
    # +25% CPU overhead per page; blocks are already ~1-2k rows
    out = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    n = _consume(out)
    dt = time.perf_counter() - t0
    return {"sec": dt, "pages": n, "pages_per_sec": n / dt}


def bench_extract_analyze(
    corpus: str, repeat: int = 4, warmup: bool = True, passes: int = 1
) -> dict:
    """Scaling workload: fused parse + quality signals + simhash per page
    (compute-dense so per-task overhead is negligible), over `repeat`
    unions of the corpus, with one full warmup pass so worker-process
    startup is excluded from the timed window (cluster spin-up is not
    throughput).

    passes > 1 runs the timed section that many times and reports the BEST
    pages/s (min-time estimator). Co-tenant CPU steal on this shared host
    is strictly additive — it can only slow a pass down — so the fastest
    of k adjacent passes is the standard low-variance estimator of the
    machine's achievable throughput in that window; all per-pass samples
    are returned for transparency."""
    import pyarrow as pa
    import ray.data as rd

    from raycrawl import core
    from raycrawl.dedup import simhash
    from raycrawl.textproc import quality_batch

    def parse_analyze(t: pa.Table) -> pa.Table:
        texts, nlinks, shs = [], [], []
        for html, base in zip(t["html"].to_pylist(), t["url"].to_pylist()):
            text, links = core.extract_page(html or b"", base or "")
            texts.append(text)
            nlinks.append(len(links))
            shs.append(simhash(text))
        out = pa.table(
            {
                "url": t["url"],
                "text": pa.array(texts, pa.string()),
                "n_links": pa.array(nlinks, pa.int32()),
                "simhash": pa.array(shs, pa.uint64()),
            }
        )
        return quality_batch(out)

    import ray

    # The 4-way union below makes this a 6-operator plan, and the streaming
    # executor's per-operator resource reservation then caps the hot
    # MapBatches at ~6/8 concurrency (measured: 0.82 pinned-core
    # utilization, 197.7 task-seconds spread over 32.5s → avg concurrency
    # 6.08 of 8). Reservation protects multi-stage pipelines under memory
    # pressure, which this read→map→count bench never approaches; without
    # it the map runs full width (0.96 utilization, +13% pages/s at 8
    # CPUs, neutral at 2). 100-TB note: wide unions + reservation
    # under-drive the hot operator — prefer one read over concatenated
    # file lists when replicating input.
    try:
        rd.DataContext.get_current().op_resource_reservation_enabled = False
    except AttributeError:
        pass

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # granularity scales with parallelism (~8 waves per union branch):
    # measured on this host, 8-CPU worker utilization goes 0.74 -> 0.84
    # versus the raw 31-file layout — stragglers in the last wave were the
    # scaling bottleneck, not per-CPU efficiency (see BENCH/BASELINE.md)
    blocks_mult = int(os.environ.get("RAYCRAWL_BLOCKS_MULT", "8"))
    base = rd.read_parquet(os.path.join(corpus, "pages.parquet"), columns=["url", "html"],
                           override_num_blocks=blocks_mult * ncpu)
    if warmup:
        base.map_batches(
            parse_analyze, batch_format="pyarrow", zero_copy_batch=True
        ).count()
    ds = base.union(*[base] * (repeat - 1)) if repeat > 1 else base
    per_pass: list[float] = []
    pass_secs: list[float] = []
    n = 0
    for _ in range(max(1, passes)):
        t0 = time.perf_counter()
        n = ds.map_batches(
            parse_analyze, batch_format="pyarrow", zero_copy_batch=True
        ).count()
        dt = time.perf_counter() - t0
        pass_secs.append(dt)
        per_pass.append(round(n / dt, 1))
    # 'sec' is the MEASURED best-pass wall time (min over passes — the
    # min-time estimator for noisy shared hosts), not a value derived
    # from rounded throughput (r5 ADVICE fix); per-pass samples ride
    # along so multi-pass variance stays visible.
    best_sec = min(pass_secs)
    return {
        "sec": best_sec,
        "pages": n,
        "pages_per_sec": round(n / best_sec, 1),
        "pass_pages_per_sec": per_pass,
        "pass_secs": [round(s, 3) for s in pass_secs],
    }


def bench_crawl(corpus: str) -> dict:
    """Headline: 3 frontier rounds end-to-end (politeness, dedup, seen
    actors, fetch join, extraction, checkpoints). Seeds every host so the
    rounds carry real volume (the 8-seed fixture list would measure only
    fixed round overhead)."""
    import shutil

    from raycrawl.core import CrawlConfig
    from raycrawl.fixtures.gen_corpus import page_url
    from raycrawl.pipelines.crawl import run_crawl_ray

    out = "/tmp/raycrawl_bench_crawlout"
    if os.path.isdir(out):
        shutil.rmtree(out)
    seeds = [page_url(42, h, 0, BENCH_HOSTS) for h in range(BENCH_HOSTS)]
    cfg = CrawlConfig(max_rounds=3, seen_shards=8)
    t0 = time.perf_counter()
    s = run_crawl_ray(corpus, out, cfg, seed_urls=seeds, resume=False)
    dt = time.perf_counter() - t0
    frontier_urls = sum(c.get("discovered", 0) for c in s["counters"])
    return {
        "sec": dt,
        "pages": s["visits"],
        "pages_per_sec": s["visits"] / dt,
        "frontier_urls": frontier_urls,
        "frontier_urls_per_sec": frontier_urls / dt,
    }


def bench_warc(corpus: str) -> dict:
    """WARC container path at bench-corpus scale: parquet->WARC convert,
    CDX build (the distributed sort), one prefix lookup. NOT in the
    default component set — totals across rounds stay comparable; run
    with --components warc and record in BENCH/BASELINE.md."""
    import shutil

    from raycrawl.sources import warc

    out = "/tmp/raycrawl_bench_warc"
    if os.path.isdir(out):
        shutil.rmtree(out)
    t0 = time.perf_counter()
    stats = warc.write_warc(corpus, out)
    t1 = time.perf_counter()
    n_cdx = _consume(warc.cdx_index(out))
    t2 = time.perf_counter()
    n_hit = _consume(warc.cdx_lookup(out, warc.cdx_index(out), "example,h003)"))
    t3 = time.perf_counter()
    return {
        "sec": t3 - t0,
        "convert_sec": t1 - t0,
        "cdx_sec": t2 - t1,
        "lookup_sec": t3 - t2,
        "shards": stats.num_rows,
        "records": n_cdx,
        "lookup_hits": n_hit,
        "convert_pages_per_sec": n_cdx / (t1 - t0),
        "cdx_records_per_sec": n_cdx / (t2 - t1),
    }


def bench_curate(sf_dir: str) -> dict:
    """Composite curation pipeline (gopher gate -> line dedup ->
    decontamination -> PII redact) over the sf documents table. NOT in
    the default component set (totals across rounds stay comparable);
    run with --components curate and record in BENCH/BASELINE.md."""
    import pyarrow.parquet as pq

    from raycrawl import curate

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    t0 = time.perf_counter()
    n_kept = _consume(curate.curate_corpus(sf_dir))
    sec = time.perf_counter() - t0
    return {
        "sec": sec,
        "docs_in": n_docs,
        "docs_kept": n_kept,
        "docs_per_sec": n_docs / sec,
    }


def bench_media(sf_dir: str) -> dict:
    """Multimodal decode path over the sf documents table: synth PNG/WAV/
    AVI payloads (1/3 each) -> actor-pool feature stage running all three
    stdlib codecs. Measures the binary-column plumbing plus real decode
    throughput (encode is part of the measured producer stage, as a real
    ingest would pay its read)."""
    import pyarrow.parquet as pq

    from raycrawl import multimodal

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    t0 = time.perf_counter()
    n = _consume(multimodal.media_pipeline(sf_dir))
    sec = time.perf_counter() - t0
    assert n == n_docs
    return {"sec": sec, "media_rows": n, "rows_per_sec": n / sec}


def bench_queries(sf_dir: str) -> dict:
    """Representative generic-operator pipelines at sf0.1."""
    from raycrawl import dedup, relational, similarity, textproc

    out = {}

    def run(name, fn):
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "iter_batches"):
            _consume(res)
        out[name] = round(time.perf_counter() - t0, 3)

    run("groupby_agg", relational.q_groupby_agg)
    run("join_fetch", relational.q_join_fetch)
    run("dedup_exact", relational.q_dedup_exact)
    run("group_headn", relational.q_group_headn)
    run("token_count", textproc.token_counts)
    run("ann_topk", similarity.ann_topk)
    run("range_join", relational.q_range_join_bucket)
    run("dedup_minhash", dedup.minhash_dedup)
    return out


def run_once(args) -> dict:
    import ray

    num_cpus = args.num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus = ensure_bench_corpus()
    # Archived bench runs must be weather-interpretable: this shared-tenant
    # host swings ±30% between identical runs (see BENCH/BASELINE.md), so
    # every JSON line carries the machine's own achievable sha1-mp
    # throughput in the same window. Normalize totals across rounds by
    # host_control before concluding regression/improvement.
    host_control = None
    host_control_polls: list[float] = []
    if not args.no_host_control:
        import shutil as _shutil
        import time as _time

        try:
            ctrl_cpus = min(num_cpus, os.cpu_count() or num_cpus)
            has_taskset = _shutil.which("taskset") is not None
            host_control = round(
                _mp_control_throughput(ctrl_cpus, has_taskset), 3
            )
            host_control_polls.append(host_control)
            # Opportunistic healthy-window wait (bounded): archived bench
            # runs from degraded co-tenant windows are hard to compare
            # across rounds, so if the window is visibly unhealthy, poll
            # for up to --healthy-wait seconds for a better one. Proceeds
            # with the best observed window either way; all polls are
            # recorded in the JSON.
            deadline = _time.monotonic() + args.healthy_wait
            while (
                host_control < args.healthy_min
                and ctrl_cpus >= 16  # the 150-reference is the 32-core one
                and _time.monotonic() < deadline
            ):
                _time.sleep(45)
                host_control = round(
                    _mp_control_throughput(ctrl_cpus, has_taskset), 3
                )
                host_control_polls.append(host_control)
        except Exception:
            pass
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    # Bench-wide executor config: per-operator resource reservation caps
    # map-dominated plans below full width (see bench_extract_analyze
    # comment; measured at 32 CPUs: extract +8.6% pages/s, crawl neutral).
    # None of the bench pipelines approach memory pressure, which is what
    # reservation exists to arbitrate.
    try:
        rd.DataContext.get_current().op_resource_reservation_enabled = False
    except AttributeError:
        pass

    queries: dict[str, float] = {}
    throughput: dict[str, float] = {}
    total = 0.0
    components = args.components.split(",")
    # Warm the worker pool once before timing ANY component: the first
    # pipeline otherwise pays worker-process spin-up plus per-worker
    # library imports (at 32 CPUs ~2-3 s) that later components in the
    # same run never see — cluster startup is not throughput (same rule
    # bench_extract_analyze already applies), and a fixed warmup makes
    # component times comparable regardless of their position in
    # --components. The 0.2 s sleep per batch forces the pool to scale to
    # one resident worker per CPU; the core import warms the module cache
    # each worker will need.
    def _warm(b):
        import time as _t

        from raycrawl import core  # noqa: F401 — import cost is the point

        _t.sleep(0.2)
        return b

    rd.range(num_cpus, override_num_blocks=num_cpus).map_batches(
        _warm, batch_format="pyarrow"
    ).count()
    if "extract" in components:
        r = bench_extract(corpus)
        queries["extract"] = round(r["sec"], 3)
        throughput["extract_pages_per_sec"] = round(r["pages_per_sec"], 1)
        total += r["sec"]
    if "extract_analyze" in components:
        r = bench_extract_analyze(corpus, repeat=args.repeat, passes=args.passes)
        queries["extract_analyze"] = round(r["sec"], 3)
        throughput["extract_analyze_pages_per_sec"] = round(r["pages_per_sec"], 1)
        if args.passes > 1:
            throughput["extract_analyze_pass_samples"] = r["pass_pages_per_sec"]
        total += r["sec"]
    if "crawl" in components:
        r = bench_crawl(corpus)
        queries["crawl"] = round(r["sec"], 3)
        throughput["crawl_pages_per_sec"] = round(r["pages_per_sec"], 1)
        throughput["frontier_urls_per_sec"] = round(r["frontier_urls_per_sec"], 1)
        total += r["sec"]
    if "warc" in components:
        r = bench_warc(corpus)
        queries["warc"] = round(r["sec"], 3)
        throughput["warc_convert_pages_per_sec"] = round(r["convert_pages_per_sec"], 1)
        throughput["warc_cdx_records_per_sec"] = round(r["cdx_records_per_sec"], 1)
        total += r["sec"]
    if "curate" in components:
        r = bench_curate(sf_dir)
        queries["curate"] = round(r["sec"], 3)
        throughput["curate_docs_per_sec"] = round(r["docs_per_sec"], 1)
        total += r["sec"]
    if "media" in components:
        r = bench_media(sf_dir)
        queries["media"] = round(r["sec"], 3)
        throughput["media_rows_per_sec"] = round(r["rows_per_sec"], 1)
        total += r["sec"]
    if "queries" in components:
        q = bench_queries(sf_dir)
        queries.update(q)
        total += sum(q.values())

    result = {
        "metric": "raycrawl_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "num_cpus": num_cpus,
        "throughput": throughput,
        # sha1-mp tasks/sec at num_cpus in this window (see comment above);
        # BENCH/BASELINE.md records the quiet-window reference value
        "host_control": host_control,
    }
    if len(host_control_polls) > 1:
        result["host_control_polls"] = host_control_polls
    ray.shutdown()
    return result


_MP_CONTROL = r"""
import hashlib, sys, time
from multiprocessing import Pool

def burn(i):
    h = b"x" * 64
    for _ in range(200_000):
        h = hashlib.sha1(h).digest()
    return 1

if __name__ == "__main__":
    k = int(sys.argv[1])
    with Pool(k) as p:
        p.map(burn, range(k))  # warmup
        t0 = time.perf_counter()
        p.map(burn, range(k * 6))
        print(k * 6 / (time.perf_counter() - t0))
"""


def _mp_control_throughput(cpus: int, has_taskset: bool) -> float:
    """Pure-multiprocessing sha1 burn at `cpus` pinned cores — measures the
    HOST's achievable scaling in the same time window as the pipeline
    trials (this shared-tenant sandbox has hypervisor-level steal that
    /proc cannot see and that varies by the hour)."""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_MP_CONTROL)
        path = f.name
    cmd = [sys.executable, path, str(cpus)]
    if has_taskset:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    os.unlink(path)
    return float(p.stdout.strip().splitlines()[-1])


def run_scaling(args) -> dict:
    """Fresh subprocess per CPU level, same input (the sandbox proxy for
    the N-vs-4N-node criterion). Median of `--trials` runs per level — the
    sandbox shows double-digit run-to-run variance. Every trial also runs
    the mp control at both levels so the pipeline's efficiency can be
    normalized by the machine's OWN achievable scaling in that window.

    Official protocol (BENCH/BASELINE.md §scaling): --quiet-window
    --passes 3 — each level reports its best of 3 adjacent timed passes
    (steal is strictly additive, so min-time estimates the window's true
    capability), and a trial counts as official only if the sha1-mp
    control was quiet at entry, immediately before each level, and at
    exit (the pre-trial gate alone cannot see steal arriving mid-trial)."""
    import statistics

    ensure_bench_corpus()  # generate once, outside the timed runs
    key = f"{args.scaling_component}_pages_per_sec"
    samples: dict[int, list[float]] = {args.cpus_low: [], args.cpus_high: []}
    import shutil as _shutil

    # Pin each level to that many PHYSICAL cores (taskset): Ray's num_cpus
    # only bounds task slots — pyarrow decode pools, the raylet, and the
    # driver free-ride on idle cores otherwise, which inflates the
    # low-CPU level and understates scaling. Affinity makes the run an
    # honest proxy for an N-core cluster node.
    has_taskset = _shutil.which("taskset") is not None
    control: dict[int, list[float]] = {args.cpus_low: [], args.cpus_high: []}
    gate_log: list[dict] = []
    # Per-level quiet references for the full-window gate: the cpus_high
    # sha1-mp quiet reference is --quiet-ref; the low level's is derived by
    # the ideal factor corrected for the host's OWN documented low->high
    # control ceiling (0.94 for the 2->8 pair, BENCH/BASELINE.md §scaling):
    # in a quiet window the 2-core control runs ~quiet_ref/(factor*0.94).
    _ctrl_ceiling = 0.94
    ref_by_level = {
        args.cpus_high: args.quiet_ref,
        args.cpus_low: args.quiet_ref
        / ((args.cpus_high / args.cpus_low) * _ctrl_ceiling),
    }
    for _ in range(args.trials):
        bar = args.quiet_ref * args.quiet_frac
        gate_entry: dict = {}
        if args.quiet_window:
            # Opportunistic quiet-window capture (VERDICT r3 #4): poll the
            # cpus_high sha1-mp control and hold the trial until the host
            # itself is within --quiet-frac of the documented quiet
            # reference. Trials that time out still run but are tagged
            # official=False so the official set stays quiet-window-only.
            import time as _time

            waited, gate_ctrl = 0.0, _mp_control_throughput(
                args.cpus_high, has_taskset
            )
            while gate_ctrl < bar and waited < args.quiet_max_wait:
                _time.sleep(args.quiet_poll)
                waited += args.quiet_poll
                gate_ctrl = _mp_control_throughput(args.cpus_high, has_taskset)
            gate_entry = {
                "gate_control": round(gate_ctrl, 2),
                "waited_s": round(waited, 1),
            }
        for cpus in (args.cpus_low, args.cpus_high):
            control[cpus].append(_mp_control_throughput(cpus, has_taskset))
            cmd = [sys.executable, os.path.abspath(__file__), "--components",
                   args.scaling_component, "--num-cpus", str(cpus),
                   "--repeat", str(args.repeat),
                   "--passes", str(args.passes), "--no-host-control"]
            if has_taskset:
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                               timeout=3600)
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            samples[cpus].append(json.loads(line)["throughput"][key])
        if args.quiet_window:
            # Full-window officialness: the pre-trial gate cannot see
            # co-tenant steal that ARRIVES mid-trial (r4 observation: gated
            # trials still swung 0.52-0.81), so a trial is official only if
            # the window was quiet THROUGHOUT — the entry gate, the control
            # sampled immediately before each level, and an exit control
            # after the high run must all clear quiet-frac of their
            # per-level references.
            exit_ctrl = _mp_control_throughput(args.cpus_high, has_taskset)
            ctrl_lo = control[args.cpus_low][-1]
            ctrl_hi = control[args.cpus_high][-1]
            gate_entry.update(
                {
                    "ctrl_low": round(ctrl_lo, 2),
                    "ctrl_high": round(ctrl_hi, 2),
                    "exit_control": round(exit_ctrl, 2),
                    "official": bool(
                        gate_entry.get("gate_control", 0.0) >= bar
                        and ctrl_hi >= bar
                        and exit_ctrl >= bar
                        and ctrl_lo
                        >= ref_by_level[args.cpus_low] * args.quiet_frac
                    ),
                }
            )
            gate_log.append(gate_entry)
    lo = statistics.median(samples[args.cpus_low])
    hi = statistics.median(samples[args.cpus_high])
    factor = args.cpus_high / args.cpus_low
    # Per-trial (time-paired) ratios: each trial's low/high runs are
    # adjacent in time, so co-tenant noise windows partially cancel —
    # more robust than ratio-of-medians on this ±30%-noise host.
    ratios = [
        h / l for l, h in zip(samples[args.cpus_low], samples[args.cpus_high])
    ]
    eff = statistics.median(ratios) / factor
    eff_min = min(ratios) / factor
    ctrl_ratios = [
        h / l for l, h in zip(control[args.cpus_low], control[args.cpus_high])
    ]
    ctrl_eff = statistics.median(ctrl_ratios) / factor
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"throughput_cpus_{args.cpus_low}": lo,
            f"throughput_cpus_{args.cpus_high}": hi,
        },
        "sf": 0.1,
        "num_cpus": args.cpus_high,
        "detail": {
            "component": args.scaling_component,
            "cpus_low": args.cpus_low,
            "cpus_high": args.cpus_high,
            "trials": args.trials,
            "samples": samples,
            "pages_per_sec_low": lo,
            "pages_per_sec_high": hi,
            "ideal_factor": factor,
            "achieved_factor": round(hi / lo, 3),
            "efficiency": round(eff, 3),
            "efficiency_min": round(eff_min, 3),
            "per_trial_ratios": [round(r / factor, 3) for r in ratios],
            "host_control_samples": control,
            "host_control_efficiency": round(ctrl_eff, 3),
            "host_control_per_trial": [round(r / factor, 3) for r in ctrl_ratios],
            "ceiling_normalized_efficiency": round(eff / ctrl_eff, 3) if ctrl_eff else None,
        },
    }
    if args.quiet_window:
        official = [
            r / factor
            for r, g in zip(ratios, gate_log)
            if g["official"]
        ]
        result["detail"]["quiet_window"] = {
            "quiet_ref": args.quiet_ref,
            "quiet_frac": args.quiet_frac,
            "per_trial": gate_log,
            "official_trials": len(official),
            "official_efficiency_median": (
                round(statistics.median(official), 3) if official else None
            ),
        }
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    # warc + curate are in the default set so the per-round archived
    # artifact (BENCH_r{N}.json) carries the WARC/curation families'
    # timings alongside extract/crawl/queries (VERDICT r4 #6) — the
    # round-over-round comparison no longer relies on prose in
    # BENCH/BASELINE.md for those components.
    ap.add_argument("--components", default="extract,crawl,warc,curate,media,queries")
    ap.add_argument("--scaling-component", default="extract_analyze")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--repeat", type=int, default=4)
    ap.add_argument("--passes", type=int, default=1,
                    help="timed passes per level; >1 reports the best "
                         "(min-time estimator for noisy shared hosts). "
                         "The official scaling protocol uses --passes 3")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--cpus-low", type=int, default=2)
    ap.add_argument("--cpus-high", type=int, default=8)
    ap.add_argument("--no-host-control", action="store_true",
                    help="skip the sha1-mp host control burn (scaling "
                         "subprocess runs pass this; the parent measures)")
    # default-run healthy-window wait (bounded; run_once)
    ap.add_argument("--healthy-min", type=float, default=150.0,
                    help="32-core host-control floor for an archival-grade "
                         "window (quiet reference 157-192)")
    ap.add_argument("--healthy-wait", type=float, default=600.0,
                    help="max seconds run_once polls for a healthy window "
                         "before proceeding anyway (0 disables)")
    # scaling quiet-window capture (run_scaling)
    ap.add_argument("--quiet-window", action="store_true",
                    help="hold each scaling trial until the cpus_high "
                         "sha1-mp control reaches quiet-frac of quiet-ref; "
                         "timed-out trials run tagged official=False")
    ap.add_argument("--quiet-ref", type=float, default=73.0,
                    help="quiet-window 8-core control reference "
                         "(BENCH/BASELINE.md: 72-75)")
    ap.add_argument("--quiet-frac", type=float, default=0.90)
    ap.add_argument("--quiet-poll", type=float, default=45.0)
    ap.add_argument("--quiet-max-wait", type=float, default=900.0)
    args = ap.parse_args()
    result = run_scaling(args) if args.scaling else run_once(args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
