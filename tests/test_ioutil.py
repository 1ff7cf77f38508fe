"""Bounded bootstrap reads (ioutil.read_lowest): exactness on shuffled /
overlapping row groups, and row-group pruning on sorted files."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl.ioutil import read_lowest


def _write(path, keys, row_group_size):
    t = pa.table(
        {
            "doc_id": pa.array(keys, pa.int64()),
            "text": pa.array([f"t{k}" for k in keys], pa.string()),
        }
    )
    pq.write_table(t, path, row_group_size=row_group_size)


def test_read_lowest_exact_on_shuffled_groups(tmp_path):
    rng = np.random.RandomState(7)
    keys = rng.permutation(1000).tolist()
    p = str(tmp_path / "shuffled.parquet")
    _write(p, keys, row_group_size=100)  # overlapping key ranges per group
    got = read_lowest(p, "doc_id", 50, ["doc_id", "text"])
    assert got["doc_id"].to_pylist() == list(range(50))
    assert got["text"].to_pylist() == [f"t{k}" for k in range(50)]


def test_read_lowest_prunes_sorted_groups(tmp_path, monkeypatch):
    p = str(tmp_path / "sorted.parquet")
    _write(p, list(range(1000)), row_group_size=100)
    reads = []
    orig = pq.ParquetFile.read_row_group

    def counting(self, i, columns=None):
        reads.append(i)
        return orig(self, i, columns=columns)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", counting)
    got = read_lowest(p, "doc_id", 50, ["doc_id"])
    assert got["doc_id"].to_pylist() == list(range(50))
    # sorted non-overlapping groups: the 50 smallest keys live entirely in
    # the first 100-row group — exactly one group is read, nine pruned
    assert reads == [0]


def test_read_lowest_n_larger_than_table(tmp_path):
    p = str(tmp_path / "small.parquet")
    _write(p, [5, 3, 9], row_group_size=2)
    got = read_lowest(p, "doc_id", 10, ["doc_id"])
    assert got["doc_id"].to_pylist() == [3, 5, 9]
