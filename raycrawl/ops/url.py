"""URL algebra as Arrow batch transforms (SURVEY.md §2 M1-M3, M12).

All functions are `map_batches(..., batch_format="pyarrow",
zero_copy_batch=True)`-shaped: `pa.Table -> pa.Table`. The per-row logic is
the pinned semantics from `raycrawl.core`; columns are appended without
copying existing buffers.
"""

from __future__ import annotations

import pyarrow as pa

from raycrawl import core


def canon_batch(t: pa.Table, col: str = "url", out: str = "url_norm") -> pa.Table:
    canon = core.canonicalize_url
    vals = [canon(u) if u is not None else "" for u in t[col].to_pylist()]
    return t.append_column(out, pa.array(vals, pa.string()))


def hash_batch(t: pa.Table, col: str = "url_norm", out: str = "url_hash") -> pa.Table:
    uh = core.url_hash
    vals = [uh(u) for u in t[col].to_pylist()]
    return t.append_column(out, pa.array(vals, pa.uint64()))


def host_batch(t: pa.Table, col: str = "url_norm", out: str = "host") -> pa.Table:
    hof = core.host_of
    vals = [hof(u) for u in t[col].to_pylist()]
    return t.append_column(out, pa.array(vals, pa.string()))


def canon_hash_host_batch(t: pa.Table, col: str = "url") -> pa.Table:
    """Fused M1+M2+M3 — one pass over the strings, three appended columns."""
    canon, uh, hof = core.canonicalize_url, core.url_hash, core.host_of
    norms, hashes, hosts = [], [], []
    for u in t[col].to_pylist():
        n = canon(u) if u is not None else ""
        norms.append(n)
        hashes.append(uh(n))
        hosts.append(hof(n) if n else "")
    return (
        t.append_column("url_norm", pa.array(norms, pa.string()))
        .append_column("url_hash", pa.array(hashes, pa.uint64()))
        .append_column("host", pa.array(hosts, pa.string()))
    )


def ua_batch(t: pa.Table, user_agents: tuple[str, ...], seq_col: str = "seq") -> pa.Table:
    """M12: deterministic UA rotation — ua_list[seq % len], no shared state."""
    n = len(user_agents)
    vals = [user_agents[s % n] for s in t[seq_col].to_pylist()]
    return t.append_column("user_agent", pa.array(vals, pa.string()))
