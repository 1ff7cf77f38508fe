"""The Ray 2.49 hash-shuffle schema-broadcast race workaround (_rayfix).

Without the fix, a join whose input's FIRST shuffled block is a typed
0-row block loses that side's schema broadcast; any partition that then
receives rows on only one side builds a zero-column table for the other
and acero raises "No match or multiple matches for key field reference".
The trigger is a scheduling race, so the end-to-end cases below stack the
deck (many empty blocks, empty-first ordering, rows confined to one hash
partition) the way the bisect that found the bug did — they failed
reliably pre-fix and must stay green."""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from raycrawl import _rayfix


def test_patch_installed():
    from ray.data._internal.execution.operators import hash_shuffle as hs

    assert _rayfix.apply() is True  # idempotent re-apply
    assert getattr(hs._shuffle_block, _rayfix._PATCH_FLAG, False)


def _blocks(*tables):
    return rd.from_arrow_refs([ray.put(t) for t in tables])


def test_join_with_empty_first_blocks(ray_session):
    real = pa.table({"k": pa.array([5], pa.int64()), "v": ["x"]})
    empty = real.schema.empty_table()
    # empty blocks lead: pre-fix, whichever ran first swallowed the
    # schema broadcast for the left input
    left = _blocks(empty, empty, empty, empty, empty, empty, real)
    right = rd.from_arrow(
        pa.table({"k": pa.array(list(range(16)), pa.int64()),
                  "w": pa.array(list(range(16)), pa.int64())})
    )
    out = left.join(right, "left_outer", num_partitions=4, on=("k",)).to_pandas()
    assert len(out) == 1 and out["v"][0] == "x" and out["w"][0] == 5


def test_join_all_empty_left_side(ray_session):
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    left = _blocks(schema.empty_table(), schema.empty_table())
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "w": ["a", "b"]})
    )
    out = left.join(right, "inner", num_partitions=2, on=("k",)).to_pandas()
    assert len(out) == 0


def test_join_rows_confined_to_one_partition(ray_session):
    # All left rows hash to few partitions; the others must still learn
    # the left schema from the broadcast empties.
    real = pa.table({"k": pa.array([7, 7, 7], pa.int64()), "v": ["a", "b", "c"]})
    empty = real.schema.empty_table()
    left = _blocks(empty, real, empty, empty)
    right = rd.from_arrow(
        pa.table({"k": pa.array(list(range(32)), pa.int64()),
                  "w": pa.array(list(range(32)), pa.int64())})
    )
    out = (
        left.join(right, "left_outer", num_partitions=8, on=("k",))
        .to_pandas()
        .sort_values("v")
    )
    assert list(out["v"]) == ["a", "b", "c"] and set(out["w"]) == {7}
