"""HTML stages as Arrow batch transforms (SURVEY.md §2 M4-M6).

Per-row work is the pinned extractor from `raycrawl.core` (byte-identity
contract, BASELINE.json:15); the batch shells here keep everything
Arrow-native so blocks stay zero-copy in the object store.
"""

from __future__ import annotations

import pyarrow as pa

from raycrawl import core


def decode_batch(t: pa.Table, col: str = "html", out: str = "html_utf8") -> pa.Table:
    dec = core.decode_html
    vals = [dec(h) if h is not None else "" for h in t[col].to_pylist()]
    return t.append_column(out, pa.array(vals, pa.string()))


def extract_text_batch(t: pa.Table, col: str = "html", out: str = "text") -> pa.Table:
    """M4+M6 fused: binary html -> extracted text (the flagship transform)."""
    ext = core.extract_text
    vals = [ext(h) if h is not None else "" for h in t[col].to_pylist()]
    return t.append_column(out, pa.array(vals, pa.string()))


def extract_links_exploded(
    t: pa.Table,
    html_col: str = "html",
    base_col: str = "url_norm",
    carry_cols: tuple[str, ...] = ("seq", "depth", "priority"),
) -> pa.Table:
    """M5 flat-map shape: one output row per link, carrying parent context.

    Output columns: url (the resolved href), parent_url, link_index,
    plus parent_<c> for each carry column. Emits an empty (but correctly
    typed) table for batches with no links.
    """
    htmls = t[html_col].to_pylist()
    bases = t[base_col].to_pylist()
    carries = {c: t[c].to_pylist() for c in carry_cols if c in t.column_names}
    out_url: list[str] = []
    out_parent: list[str] = []
    out_idx: list[int] = []
    out_carry: dict[str, list] = {c: [] for c in carries}
    ext = core.extract_links
    for i, (html, base) in enumerate(zip(htmls, bases)):
        if html is None:
            continue
        links = ext(html, base or "")
        for li, link in enumerate(links):
            out_url.append(link)
            out_parent.append(base or "")
            out_idx.append(li)
            for c in carries:
                out_carry[c].append(carries[c][i])
    cols = {
        "url": pa.array(out_url, pa.string()),
        "parent_url": pa.array(out_parent, pa.string()),
        "link_index": pa.array(out_idx, pa.int32()),
    }
    carry_types = {c: t.schema.field(c).type for c in carries}
    for c, vals in out_carry.items():
        cols[f"parent_{c}"] = pa.array(vals, carry_types[c])
    return pa.table(cols)


def count_links_batch(t: pa.Table, html_col: str = "html", base_col: str = "url_norm",
                      out: str = "n_links") -> pa.Table:
    ext = core.extract_links
    htmls = t[html_col].to_pylist()
    bases = t[base_col].to_pylist()
    vals = [len(ext(h, b or "")) if h is not None else 0 for h, b in zip(htmls, bases)]
    return t.append_column(out, pa.array(vals, pa.int32()))
