"""Boundary semantics for the r5 range joins: exact window edges
(inclusive lower, strict upper), identical timestamps, and the bucket
seam (a pair whose two sides sit in adjacent time buckets). Conformance
checks the operators on organic data; this pins the edges a corpus may
never hit, against the same DuckDB predicates."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raycrawl import relational

_H24 = 24 * 3600 * 1_000_000
_W = relational._RANGE_BUCKET_US  # 10 min


def _events_table(tmp_path) -> str:
    # layout chosen so every boundary case exists (ts in microseconds):
    #   id 0 u1 t=0                      baseline
    #   id 1 u1 t=W        exactly one bucket width after id 0 — the
    #                      inclusive lower edge of the 10-min window AND
    #                      a cross-bucket pair (buckets 0 -> 1)
    #   id 2 u1 t=W+1      one us past the window: must NOT match id 0
    #   id 3 u1 t=1000e6   identical-ts pair with id 4
    #   id 4 u2 t=1000e6   equal ts: strict upper bound drops both ways
    #   id 5 u1 t=_H24     exactly 24h after id 0: inclusive lower edge
    #                      of the user window (id 0 must count)
    #   id 6 u1 t=_H24+1   one us past 24h: id 0 must NOT count
    rows = [
        (0, 1, 0),
        (1, 1, _W),
        (2, 1, _W + 1),
        (3, 1, 1_000_000_000),
        (4, 2, 1_000_000_000),
        (5, 1, _H24),
        (6, 1, _H24 + 1),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], dtype="int64"), pa.timestamp("us")
            ),
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols].astype("int64").sort_values(cols, ignore_index=True)
    )


@pytest.mark.usefixtures("ray_session")
class TestRangeJoinEdges:
    def test_user_window_edges(self, tmp_path):
        d = _events_table(tmp_path)
        got = _norm(relational.q_range_join_user(d).to_pandas())
        want = _norm(
            _oracle(
                d,
                "SELECT e.event_id AS event_id, count(*) AS n_prev, "
                "min(f.event_id) AS min_prev_id, max(f.event_id) AS max_prev_id "
                "FROM events e JOIN events f ON f.user_id = e.user_id "
                "AND f.ts < e.ts AND f.ts >= e.ts - INTERVAL 24 HOUR "
                "GROUP BY e.event_id",
            )
        )
        assert got.equals(want)
        by_id = got.set_index("event_id")
        # inclusive lower edge: id 5 (exactly 24h later) still sees id 0
        assert by_id.loc[5, "min_prev_id"] == 0
        # strict past-the-edge: id 6 must not see id 0
        assert by_id.loc[6, "min_prev_id"] == 1
        # identical ts: id 3 has same-user predecessors, none at its own ts
        assert 3 not in by_id.index or by_id.loc[3, "max_prev_id"] < 3

    def test_bucket_window_edges_and_seam(self, tmp_path):
        d = _events_table(tmp_path)
        got = _norm(relational.q_range_join_bucket(d).to_pandas())
        want = _norm(
            _oracle(
                d,
                "SELECT e.event_id AS event_id, count(*) AS n_near, "
                "min(f.event_id) AS min_near_id, max(f.event_id) AS max_near_id "
                "FROM events e JOIN events f ON f.ts < e.ts "
                "AND f.ts >= e.ts - INTERVAL 10 MINUTE "
                "GROUP BY e.event_id",
            )
        )
        assert got.equals(want)
        by_id = got.set_index("event_id")
        # cross-bucket seam + inclusive lower edge: id 1 sits in bucket 1,
        # id 0 in bucket 0 exactly one window earlier — must match via the
        # build-side replica in bucket 1
        assert by_id.loc[1, "min_near_id"] == 0
        # one us past the window: id 2 must see id 1 but not id 0
        assert by_id.loc[2, "min_near_id"] == 1
        # identical ts (ids 3, 4): neither sees the other
        for eid in (3, 4):
            if eid in by_id.index:
                assert by_id.loc[eid, "max_near_id"] < 3
