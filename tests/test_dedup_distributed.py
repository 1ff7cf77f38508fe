"""Forced-path equivalence for the distributed connected-components /
drop-set path (VERDICT r4 next-round #1): the near-dup family's pair set
and drop set scale with duplicate COUNT — O(corpus) at web dup density —
so above PAIR_ROWS_DRIVER_MAX / DROP_BROADCAST_MAX they must stay
Datasets end-to-end. These tests force that path (thresholds patched to
-1/0, the tests/test_curate.py pattern) and require byte-identical keep
sets vs the default driver path for every operator that shares the
funnel: minhash, jaccard, simhash, embedding brute, embedding LSH, and
the prep_corpus composite."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from raycrawl import dedup, similarity


@pytest.fixture()
def planted_docs(tmp_path):
    """6 docs: near-dup cluster {0, 1, 5}, exact dup {0, 3}, distinct 2/4."""
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    rows = {
        "doc_id": list(range(6)),
        "text": [
            base,
            base + " tiny tail",
            "unrelated words entirely " * 12,
            base,
            "another distinct body of text about ray pipelines " * 8,
            base.replace("lazy", "sleepy", 1),
        ],
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


@pytest.fixture()
def planted_embeddings(tmp_path):
    """30 vectors with planted near-identical pairs (5≈0, 9≈2)."""
    rng = np.random.RandomState(7)
    m = rng.randn(30, 64)
    m[5] = m[0] + 1e-4
    m[9] = m[2] + 1e-4
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in m], pa.list_(pa.float64())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def _force_distributed(monkeypatch):
    """Route every size dispatch to its scale path: distributed banding,
    pair Datasets (never take_all), distributed min-label components,
    anti-join drop application."""
    monkeypatch.setattr(dedup, "BAND_ROWS_DRIVER_MAX", 0)
    monkeypatch.setattr(dedup, "PAIR_ROWS_DRIVER_MAX", -1)
    monkeypatch.setattr(dedup, "DROP_BROADCAST_MAX", -1)


class TestComponentsDistributed:
    def test_matches_driver_union_find(self, ray_session):
        """Min-label propagation == union-find on cliques, a 25-hop chain
        (exercises the pointer-doubling rounds), duplicate and reversed
        pairs, and the empty graph."""
        import ray.data as rd

        cases = [
            [],
            [(1, 2)],
            [(1, 2), (2, 3), (3, 1), (10, 11)],
            [(i, i + 1) for i in range(20, 45)],
            [(5, 9), (9, 5), (5, 9)],
            [(100, 2), (2, 50), (7, 100)],  # min not first seen
        ]
        for pairs in cases:
            t = pa.table(
                {
                    "a": pa.array([p[0] for p in pairs], pa.int64()),
                    "b": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
            got = sorted(
                r["id"] for r in dedup._components_drop_ds(rd.from_arrow(t)).take_all()
            )
            want = sorted(dedup._components_drop(pairs))
            assert got == want, (pairs, got, want)

    def test_apply_drop_anti_join_matches_broadcast(self, ray_session):
        import ray.data as rd

        src = rd.from_arrow(
            pa.table({"doc_id": pa.array(range(20), pa.int64())})
        )
        drop_ds = rd.from_arrow(
            pa.table({"id": pa.array([3, 7, 19], pa.int64())})
        )
        via_set = sorted(
            dedup._apply_drop(src, {3, 7, 19}, "doc_id").to_pandas()["doc_id"]
        )
        # Dataset drop below the cap -> bounded pull + broadcast
        via_small_ds = sorted(
            dedup._apply_drop(src, drop_ds, "doc_id").to_pandas()["doc_id"]
        )
        # Dataset drop above the (patched) cap -> left-anti join
        old = dedup.DROP_BROADCAST_MAX
        try:
            dedup.DROP_BROADCAST_MAX = -1
            via_join = sorted(
                dedup._apply_drop(src, drop_ds, "doc_id").to_pandas()["doc_id"]
            )
        finally:
            dedup.DROP_BROADCAST_MAX = old
        assert via_set == via_small_ds == via_join == [
            i for i in range(20) if i not in (3, 7, 19)
        ]

    def test_distinct_pairs_ds(self, ray_session):
        import ray.data as rd

        t = pa.table(
            {
                "a": pa.array([1, 1, 2, 1, 2], pa.int64()),
                "b": pa.array([2, 2, 3, 2, 3], pa.int64()),
            }
        )
        out = dedup._distinct_pairs_ds(rd.from_arrow(t)).take_all()
        assert sorted((r["a"], r["b"]) for r in out) == [(1, 2), (2, 3)]


class TestForcedDistributedPaths:
    def test_text_neardup_family(self, ray_session, planted_docs, monkeypatch):
        def kept():
            return {
                "minhash": sorted(
                    dedup.minhash_dedup(planted_docs, 0.5).to_pandas()["doc_id"]
                ),
                "jaccard": sorted(
                    dedup.jaccard_dedup(planted_docs, 0.5).to_pandas()["doc_id"]
                ),
                "simhash": sorted(
                    dedup.simhash_dedup(planted_docs).to_pandas()["doc_id"]
                ),
            }

        default = kept()
        _force_distributed(monkeypatch)
        forced = kept()
        assert default == forced
        assert forced["minhash"] == [0, 2, 4]

    def test_embedding_neardup_paths(
        self, ray_session, planted_embeddings, monkeypatch
    ):
        def kept():
            return {
                "brute": sorted(
                    similarity.embedding_neardup(planted_embeddings)
                    .to_pandas()["vec_id"]
                ),
                "lsh": sorted(
                    similarity.embedding_neardup_lsh(planted_embeddings)
                    .to_pandas()["vec_id"]
                ),
            }

        default = kept()
        _force_distributed(monkeypatch)
        forced = kept()
        assert default == forced
        # planted near-identical vectors 5 and 9 dropped, minima kept
        assert 5 not in forced["brute"] and 9 not in forced["brute"]
        assert 0 in forced["brute"] and 2 in forced["brute"]

    def test_prep_corpus_forced(self, ray_session, planted_docs, monkeypatch):
        from raycrawl.pipelines.prep import prep_corpus

        default = sorted(
            prep_corpus(planted_docs, min_tokens=1, min_quality=0.0)
            .to_pandas()["doc_id"]
        )
        _force_distributed(monkeypatch)
        forced = sorted(
            prep_corpus(planted_docs, min_tokens=1, min_quality=0.0)
            .to_pandas()["doc_id"]
        )
        assert default == forced == [0, 2, 4]

    def test_exact_dup_drop_dispatch(self, ray_session, planted_docs, monkeypatch):
        assert dedup.exact_dup_drop_ids(planted_docs) == {3}
        monkeypatch.setattr(dedup, "DROP_BROADCAST_MAX", -1)
        drop = dedup._exact_dup_drop(planted_docs)
        assert not isinstance(drop, set)
        assert sorted(r["id"] for r in drop.take_all()) == [3]
