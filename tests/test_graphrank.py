"""Host-graph PageRank: distributed edge aggregation vs a dense numpy
oracle, plus invariants (probability mass, determinism, M10 gating)."""

import numpy as np
import pandas as pd
import pytest

from raycrawl import graphrank


def _dense_pagerank(edges: pd.DataFrame, damping=0.85, n_iter=20):
    """Independent dense-matrix oracle."""
    hosts = sorted(set(edges["src"]) | set(edges["dst"]))
    n = len(hosts)
    idx = {h: i for i, h in enumerate(hosts)}
    M = np.zeros((n, n))
    for _, r in edges.iterrows():
        M[idx[r["dst"]], idx[r["src"]]] += r["weight"]
    colsum = M.sum(axis=0)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for j in range(n):
            if colsum[j] > 0:
                contrib += M[:, j] / colsum[j] * rank[j]
        dangling = rank[colsum == 0].sum()
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return {h: rank[idx[h]] for h in hosts}


def test_pagerank_matches_dense_oracle():
    edges = pd.DataFrame(
        {
            "src": ["a", "a", "b", "c", "c", "d"],
            "dst": ["b", "c", "c", "a", "d", "d"],
            "weight": [3, 1, 2, 1, 1, 5],
        }
    )
    got = graphrank.pagerank(edges)
    want = _dense_pagerank(edges)
    assert set(got) == set(want)
    for h in got:
        assert got[h] == pytest.approx(want[h], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_and_dangling():
    assert graphrank.pagerank(pd.DataFrame({"src": [], "dst": [], "weight": []})) == {}
    # b has no outlinks (dangling): mass must still sum to 1
    edges = pd.DataFrame({"src": ["a"], "dst": ["b"], "weight": [1]})
    r = graphrank.pagerank(edges)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert r["b"] > r["a"]  # b receives a's vote


def test_host_pagerank_corpus(ray_session, smoke_corpus):
    t = graphrank.host_pagerank(smoke_corpus)
    ranks = dict(zip(t["host"].to_pylist(), t["rank"].to_pylist()))
    assert len(ranks) >= 20  # all fixture hosts present in the link graph
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    # determinism: a second distributed run is bit-identical
    t2 = graphrank.host_pagerank(smoke_corpus)
    assert t.equals(t2)
    assert all(r > 0 for r in ranks.values())
    # the fully-robots-blocked host still RECEIVES links (rank is a link
    # signal, not a politeness one) — it must be present
    assert "h010.example" in ranks


def test_pagerank_distributed_matches_driver(ray_session):
    import ray.data as rd

    edges = pd.DataFrame(
        {
            "src": ["a", "a", "b", "c", "c", "d", "e"],
            "dst": ["b", "c", "c", "a", "d", "d", "a"],
            "weight": [3, 1, 2, 1, 1, 5, 2],
        }
    )
    want = graphrank.pagerank(edges)
    got = graphrank.pagerank_distributed(rd.from_pandas(edges))
    assert set(got) == set(want)
    for h in got:
        # distributed float-sum order is scheduling-dependent: tolerance,
        # not bit-identity (that's the driver path's contract)
        assert got[h] == pytest.approx(want[h], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_distributed_corpus(ray_session, smoke_corpus):
    import ray.data as rd
    from ray.data.aggregate import Count

    from raycrawl.graphrank import _edge_batch

    import os
    edges_ds = (
        rd.read_parquet(os.path.join(smoke_corpus, "pages.parquet"),
                        columns=["url", "html"])
        .map_batches(_edge_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="weight"))
    )
    got = graphrank.pagerank_distributed(edges_ds)
    want = graphrank.pagerank(graphrank.host_edges(smoke_corpus))
    assert set(got) == set(want)
    for h in got:
        assert got[h] == pytest.approx(want[h], rel=1e-9)


def test_host_pagerank_dispatch_forced_distributed(
    ray_session, smoke_corpus, monkeypatch
):
    """The size dispatch (EDGE_ROWS_DRIVER_MAX, VERDICT r4 #3): forcing the
    distributed path through the public host_pagerank surface must agree
    with the driver path to float tolerance (bit-identity is the driver
    path's contract only — float accumulation order differs)."""
    want = graphrank.host_pagerank(smoke_corpus)
    monkeypatch.setattr(graphrank, "EDGE_ROWS_DRIVER_MAX", -1)
    got = graphrank.host_pagerank(smoke_corpus)
    wd = dict(zip(want["host"].to_pylist(), want["rank"].to_pylist()))
    gd = dict(zip(got["host"].to_pylist(), got["rank"].to_pylist()))
    assert set(wd) == set(gd)
    for h in wd:
        assert gd[h] == pytest.approx(wd[h], rel=1e-9)
