"""Driver contract for the graft builder (Ray Data target).

entry(): flagship fetch-and-extract pipeline over sf0.001 documents —
synthesizes html payloads, runs the engine's fused charset-decode +
text/link extraction stage (raycrawl.core semantics), returns a Dataset.

queries()/oracle_sql(): the full operator registry (raycrawl.registry) —
one entry per implemented SURVEY.md §2 operator plus the training-data
extensions; oracle-checkable ones carry DuckDB SQL.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in raycrawl) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.ops.html import extract_text_batch
    from raycrawl.textproc import token_count_batch

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def synth_html(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        payloads = [
            (
                f"<html><head><title>doc {i}</title>"
                f"<style>p {{margin: 0}}</style></head>"
                f"<body><p>{x}</p><a href='/doc/{i + 1}'>next</a>"
                f"<script>var hidden = 1;</script></body></html>"
            ).encode("utf-8")
            for i, x in zip(ids, texts)
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "html": pa.array(payloads, pa.binary()),
            }
        )

    ds = docs.map_batches(synth_html, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: token_count_batch(t.drop_columns(["html"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds.select_columns(["doc_id", "lang", "text", "n_tokens"])


def queries() -> dict[str, Callable[[str], Any]]:
    from raycrawl.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from raycrawl.registry import build_oracle_sql

    return build_oracle_sql()
