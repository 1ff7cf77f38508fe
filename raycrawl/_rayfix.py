"""Driver-side workaround for a Ray 2.49 hash-shuffle schema-broadcast race.

The bug (ray/data/_internal/execution/operators/hash_shuffle.py, v2.49.2):
`_shuffle_block` early-returns on 0-row input blocks *before* the
`send_empty_blocks` schema-broadcast fan-out, yet the operator marks
`_has_schemas_broadcasted[input_index] = True` as soon as the first
shuffle task is submitted. So if the FIRST block an input feeds into a
hash shuffle happens to be empty (an upstream filter emptied it), no
aggregator ever learns that input's schema. Aggregates degrade benignly
(empty partitions aggregate to nothing), but JOINS crash: a partition
with rows on only one side builds a zero-column table for the other and
acero raises "No match or multiple matches for key field reference ...".
Which block arrives first is a scheduling race, so pipelines whose join
inputs can contain legitimately-empty typed blocks (any filter stage
upstream of a join) fail nondeterministically — more often at test scale,
where blocks hold a handful of rows, but possible at any scale.

Fix: rebind the module-global `_shuffle_block` remote function (the
operator resolves it at call time, so a driver-side rebind is sufficient;
Ray pickles the patched function to shuffle workers automatically) with a
wrapper that, for a TYPED 0-row block under `send_empty_blocks=True`,
performs exactly the schema fan-out Ray's own `partition_shard is None`
branch would have done — an empty table with the block's schema to every
aggregator — and delegates everything else to the original function
unchanged. Zero-column 0-row blocks (the Ray "skipped map UDF on an empty
block" artifact) still early-return: they carry no usable schema, and
keeping them out of join inputs is the caller's job (see
curate.dedup_lines_ds's `gate` fusion).

Version-gated to ray 2.49.*: on any other version the patch is skipped
and a warning logged, so an upgrade degrades to stock behavior instead of
breaking on drifted internals.
"""

from __future__ import annotations

import logging

import ray

_LOG = logging.getLogger(__name__)

_PATCH_FLAG = "_raycrawl_empty_block_schema_fix"


def apply() -> bool:
    """Install the fix (idempotent). Returns True when active."""
    if not ray.__version__.startswith("2.49"):
        _LOG.warning(
            "ray %s != 2.49.*: skipping hash-shuffle empty-block schema fix "
            "(join inputs containing 0-row blocks may hit the schema race)",
            ray.__version__,
        )
        return False
    from ray.data._internal.execution.operators import hash_shuffle as hs

    if getattr(hs._shuffle_block, _PATCH_FLAG, False):
        return True

    import pyarrow as pa
    from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
    from ray.data._internal.table_block import TableBlockAccessor
    from ray.data.block import BlockAccessor, BlockExecStats, BlockType

    orig = hs._shuffle_block._function  # underlying plain function

    def _shuffle_block_fixed(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        stats = BlockExecStats.builder()
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if (
            block.num_rows == 0
            and send_empty_blocks
            and isinstance(block, pa.Table)
            and block.num_columns > 0
        ):
            # The path Ray's early return skips: fan the schema out to every
            # aggregator as typed empty shards (mirrors the original's
            # `partition_shard is None` branch, including the completion
            # barrier — aggregations must not finalize before acceptance).
            empty_shard = _create_empty_table(block.schema)
            pending = [
                pool.get_aggregator_for_partition(pid).submit.remote(
                    input_index, pid, ray.put(empty_shard)
                )
                for pid in range(pool.num_partitions)
            ]
            while pending:
                _, pending = ray.wait(
                    pending, num_returns=len(pending), timeout=1
                )
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        # Non-empty, zero-column-empty, or no-broadcast-requested: stock
        # behavior (transformer/conversion already applied — both are
        # idempotent, but skip the transformer to avoid double work).
        return orig(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    patched = ray.remote(_shuffle_block_fixed)
    setattr(patched, _PATCH_FLAG, True)
    hs._shuffle_block = patched
    return True
