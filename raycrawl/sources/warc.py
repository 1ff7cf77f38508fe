"""WARC source/sink + CDX index — the Common-Crawl container formats.

The north-star corpus is "Common-Crawl-style web pages"; Common Crawl's
actual distribution unit is the WARC file (ISO 28500: framed records,
each compressed as an INDEPENDENT gzip member so a reader can seek to a
record without decompressing the file) plus the CDX index (a sorted
(SURT-key, timestamp) table carrying each record's file/offset/length so
range queries prune whole files and fetch single records). This module
implements both, Ray-Data-first:

- `write_warc`: Parquet corpus -> sharded .warc(.gz) files. One output
  file PER INPUT PARQUET SHARD, written by a parallel map over the shard
  list — deterministic names, atomic tmp+rename, skip-if-exists, so a
  killed conversion resumes without rewriting finished shards (the
  resumable-output contract every sink in this repo follows).
- `read_warc`: .warc(.gz) shards -> Dataset of records. File-level
  parallelism (`read_binary_files`), per-member streaming decompression
  inside `map_batches`. At 100 TB this is the standard per-WARC-file unit
  of work (CC files are ~1 GB; keep shards at or below that — the whole
  file is one object-store block here).
- `cdx_index`: read -> (surt_key, ts, digest, file/offset/length) ->
  distributed `Dataset.sort` on the SURT key. The sort is the one
  all-to-all this pipeline needs (CDX is DEFINED as a sorted index);
  everything before it is embarrassingly parallel.

Framing and SURT are PINNED per-row primitives (shared with pyoracle,
like minhash_signature): `warc_record_bytes` defines the record bytes as
a pure function of the source row, so the oracle can recompute expected
offsets/lengths single-threaded without ever touching the reader — the
driver hash-check then pins writer framing, reader parsing, offset
accounting and the distributed sort against each other.

Gzip members are bit-deterministic: fixed compresslevel, mtime=0 (the
gzip header embeds mtime otherwise), CPython writes OS byte 255.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from datetime import datetime, timezone
from urllib.parse import urlsplit

import pyarrow as pa

_GZ_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# pinned per-row primitives (shared with pyoracle)
# ---------------------------------------------------------------------------


def iso8601(ts_us: int) -> str:
    """WARC-Date with microsecond precision (exact int64-us roundtrip)."""
    dt = datetime.fromtimestamp(ts_us // 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{ts_us % 1_000_000:06d}Z"


def parse_iso8601(s: str) -> int:
    dt = datetime.strptime(s[:19], "%Y-%m-%dT%H:%M:%S").replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000 + int(s[20:26])


def warc_record_bytes(
    url: str, ts_us: int, content_type: str, payload: bytes,
    gzip_member: bool = True,
) -> bytes:
    """PINNED framing: one WARC/1.0 response record, optionally as an
    independent gzip member (mtime=0, level 6 — bit-deterministic)."""
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {iso8601(ts_us)}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    rec = header + payload + _CRLF2
    return gzip.compress(rec, compresslevel=6, mtime=0) if gzip_member else rec


def surt(url: str) -> str:
    """PINNED simplified SURT (Sort-friendly URI Reordering Transform):
    'com,example)/path?query' — scheme dropped, host lowercased and
    dot-reversed, default ports dropped. Groups a registered domain's
    subdomains contiguously so CDX range scans prune by key prefix."""
    p = urlsplit(url)
    host = (p.hostname or "").lower()
    key = ",".join(reversed(host.split("."))) if host else ""
    if p.port and p.port not in (80, 443):
        key += f":{p.port}"
    out = key + ")" + (p.path or "/")
    if p.query:
        out += "?" + p.query
    return out


def payload_digest(payload: bytes) -> str:
    """md5 over the UPPERCASE hex of the payload — chosen so DuckDB's
    `md5(to_hex(col))` computes the identical digest for the SQL oracle
    (DuckDB has no md5(BLOB) overload)."""
    return hashlib.md5(payload.hex().upper().encode()).hexdigest()


def warc_name(parquet_basename: str, gzip_members: bool = True) -> str:
    stem = parquet_basename.rsplit(".parquet", 1)[0]
    return f"{stem}.warc.gz" if gzip_members else f"{stem}.warc"


# ---------------------------------------------------------------------------
# sink: Parquet corpus -> WARC shards (parallel, resumable)
# ---------------------------------------------------------------------------


def _shard_paths(corpus_dir: str) -> list[str]:
    pages = os.path.join(corpus_dir, "pages.parquet")
    if os.path.isdir(pages):
        return [os.path.join(pages, f) for f in sorted(os.listdir(pages))
                if f.endswith(".parquet")]
    return [pages]


def _write_one_shard(in_path: str, out_path: str, gzip_members: bool) -> dict:
    """Frame one parquet shard's rows (in row order) into one WARC file.
    Atomic + skip-if-exists: the conversion resumes per shard."""
    import pyarrow.parquet as pq

    if os.path.exists(out_path):
        return {"file": os.path.basename(out_path),
                "n_records": -1, "n_bytes": os.path.getsize(out_path)}
    t = pq.read_table(in_path, columns=["url", "warc_ts", "content_type", "html"])
    ts_us = t["warc_ts"].cast(pa.int64()).to_pylist()
    chunks = [
        warc_record_bytes(u, ts, ct, h or b"", gzip_members)
        for u, ts, ct, h in zip(
            t["url"].to_pylist(), ts_us,
            t["content_type"].to_pylist(), t["html"].to_pylist(),
        )
    ]
    data = b"".join(chunks)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)
    return {"file": os.path.basename(out_path),
            "n_records": len(chunks), "n_bytes": len(data)}


def write_warc(corpus_dir: str, out_dir: str, gzip_members: bool = True) -> pa.Table:
    """Distributed corpus -> WARC conversion. Parallelism is per shard
    file (the natural WARC unit); returns the per-shard stats table —
    one tiny row per shard, safe to collect on the driver."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    shards = _shard_paths(corpus_dir)

    def convert(t: pa.Table) -> pa.Table:
        rows = [
            _write_one_shard(
                p, os.path.join(out_dir, warc_name(os.path.basename(p), gzip_members)),
                gzip_members,
            )
            for p in t["path"].to_pylist()
        ]
        return pa.Table.from_pylist(rows)

    stats = (
        rd.from_items([{"path": p} for p in shards])
        .map_batches(convert, batch_format="pyarrow")
        .take_all()
    )
    return pa.Table.from_pylist(sorted(stats, key=lambda r: r["file"]))


# ---------------------------------------------------------------------------
# source: WARC shards -> Dataset of records
# ---------------------------------------------------------------------------


def parse_warc_file(data: bytes, filename: str) -> list[dict]:
    """Sequential record walk over one WARC file, tracking each record's
    (offset, length) IN THE FILE (compressed member extent for .gz —
    that's what CDX stores so readers can range-request single records)."""
    out = []
    pos = 0
    gz = data[:2] == _GZ_MAGIC
    while pos < len(data):
        if gz:
            d = zlib.decompressobj(47)  # gzip wrapper
            rec = d.decompress(data[pos:])
            consumed = len(data) - pos - len(d.unused_data)
        else:
            hdr_end = data.index(_CRLF2, pos)
            head = data[pos:hdr_end].decode()
            clen = int(head.split("Content-Length:", 1)[1].split("\r\n", 1)[0])
            consumed = (hdr_end - pos) + 4 + clen + 4
            rec = data[pos : pos + consumed]
        rec_head, _, rest = rec.partition(_CRLF2)
        headers = dict(
            line.split(": ", 1)
            for line in rec_head.decode().split("\r\n")[1:]
            if ": " in line
        )
        payload = rest[: int(headers["Content-Length"])]
        out.append(
            {
                "url": headers["WARC-Target-URI"],
                "ts_us": parse_iso8601(headers["WARC-Date"]),
                "content_type": headers["Content-Type"],
                "payload": payload,
                "filename": filename,
                "offset": pos,
                "length": consumed,
            }
        )
        pos += consumed
    return out


def _parse_batch(t: pa.Table) -> pa.Table:
    """Open + parse inside the task (file-level parallelism). The RAW
    on-disk bytes are read with plain open(): `read_binary_files` would
    auto-decompress by the .gz extension (pyarrow stream detection),
    silently turning CDX member offsets/lengths into uncompressed-stream
    values."""
    rows = []
    for path in t["path"].to_pylist():
        with open(path, "rb") as f:
            data = f.read()
        rows.extend(parse_warc_file(data, os.path.basename(path)))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "ts_us": pa.array([r["ts_us"] for r in rows], pa.int64()),
            "content_type": pa.array([r["content_type"] for r in rows], pa.string()),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
            "filename": pa.array([r["filename"] for r in rows], pa.string()),
            "offset": pa.array([r["offset"] for r in rows], pa.int64()),
            "length": pa.array([r["length"] for r in rows], pa.int64()),
        }
    )


def read_warc(warc_dir: str):
    """Dataset of WARC records. One read task per file; records exploded
    inside map_batches (zero driver involvement)."""
    import ray.data as rd

    paths = [
        os.path.join(warc_dir, f)
        for f in sorted(os.listdir(warc_dir))
        if ".warc" in f and not f.endswith(".tmp")
    ]
    # one path-row per block so every file is its own task (and no
    # zero-column empty blocks — see CLAUDE.md invariant); bytes are
    # opened inside the task, see _parse_batch.
    return rd.from_items(
        [{"path": p} for p in paths], override_num_blocks=max(1, len(paths))
    ).map_batches(_parse_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# CDX index build (the distributed-sort operator)
# ---------------------------------------------------------------------------


def _cdx_batch(t: pa.Table) -> pa.Table:
    """surt + digest per record; the (large) payload is DROPPED here so
    only slim index rows enter the sort shuffle."""
    surts = [surt(u) for u in t["url"].to_pylist()]
    digests = [payload_digest(p or b"") for p in t["payload"].to_pylist()]
    return (
        t.drop_columns(["payload", "content_type"])
        .append_column("surt_key", pa.array(surts, pa.string()))
        .append_column("digest", pa.array(digests, pa.string()))
    )


class _FilterFetch:
    """Single-stage CDX lookup: filter index rows by SURT-key prefix and
    seek-read ONLY the matching byte extents (open per distinct file per
    batch, `seek(offset); read(length)` per record — never a full-file
    scan; that is the operational payoff of the CDX index). Filter and
    fetch are fused in one UDF so every input block is non-empty and the
    OUTPUT schema is always explicit (zero-match batches return an empty
    table WITH schema — the empty-block unification pitfall in CLAUDE.md).

    At 10^10 records, hash-partition the index by filename first (the
    salted-groupby pattern crawl.py uses) so one task owns each file's
    extents; at lookup sizes the per-batch handle cache below is enough.
    """

    def __init__(self, warc_dir: str, surt_prefix: str):
        self.warc_dir = warc_dir
        self.prefix = surt_prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.starts_with(t["surt_key"], self.prefix))
        urls, tss, nb, dg = [], [], [], []
        handles: dict[str, object] = {}
        try:
            for r in t.select(["filename", "offset", "length"]).to_pylist():
                f = handles.get(r["filename"])
                if f is None:
                    f = handles[r["filename"]] = open(
                        os.path.join(self.warc_dir, r["filename"]), "rb"
                    )
                f.seek(r["offset"])
                rec = parse_warc_file(f.read(r["length"]), r["filename"])[0]
                urls.append(rec["url"])
                tss.append(rec["ts_us"])
                nb.append(len(rec["payload"]))
                dg.append(payload_digest(rec["payload"]))
        finally:
            for f in handles.values():
                f.close()
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts_us": pa.array(tss, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
                "digest": pa.array(dg, pa.string()),
            }
        )


def cdx_lookup(warc_dir: str, cdx, surt_prefix: str):
    """Fetch the records whose SURT key starts with `surt_prefix`, using
    only the index extents (digests recomputed from the FETCHED payloads,
    so a hash match proves the bytes really came off the seek path)."""
    return cdx.map_batches(
        _FilterFetch(warc_dir, surt_prefix),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def import_warc(warc_dir: str, corpus_out: str):
    """WARC -> columnar crawl corpus (`pages.parquet` dir with the crawl
    engine's projection columns). This is the scale-correct direction for
    consuming an archive: convert ONCE, then every downstream stage gets
    parquet column/row-group pruning that the record container can never
    offer (a WARC read always parses whole records). Returns the written
    dataset's row count."""
    import ray.data as rd

    def to_pages(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["ts_us"].cast(pa.timestamp("us")),
                "html": t["payload"],
                "content_type": t["content_type"],
            }
        )

    import pyarrow.parquet as pq

    out = os.path.join(corpus_out, "pages.parquet")
    os.makedirs(out, exist_ok=True)
    read_warc(warc_dir).map_batches(
        to_pages, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out)
    # row count from footer metadata — no second pipeline execution
    return sum(
        pq.ParquetFile(os.path.join(out, f)).metadata.num_rows
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )


def ensure_warc_dir(corpus_dir: str, warc_dir: str) -> str:
    """Idempotent fixture build: convert `corpus_dir` once; a partial dir
    (interrupted build) self-heals because write_warc skips finished
    shards and atomically replaces the rest."""
    expected = {warc_name(os.path.basename(p)) for p in _shard_paths(corpus_dir)}
    have = set(os.listdir(warc_dir)) if os.path.isdir(warc_dir) else set()
    if not expected <= have:
        write_warc(corpus_dir, warc_dir)
    return warc_dir


def q_warc_read(corpus_dir: str, warc_dir: str):
    """queries() surface: WARC roundtrip — read the converted shards and
    return per-record (url, ts_us, content_type, n_bytes, digest). The
    SQL oracle computes the same columns from the ORIGINAL parquet corpus,
    so a hash match pins framing + parsing byte-exactly (payload itself is
    digested, not shipped to the driver compare)."""

    def fin(t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        return (
            t.drop_columns(["payload", "filename", "offset", "length"])
            .append_column(
                "n_bytes", pa.array([len(p or b"") for p in payloads], pa.int64())
            )
            .append_column(
                "digest",
                pa.array([payload_digest(p or b"") for p in payloads], pa.string()),
            )
        )

    ensure_warc_dir(corpus_dir, warc_dir)
    return read_warc(warc_dir).map_batches(
        fin, batch_format="pyarrow", zero_copy_batch=True
    )


def q_cdx_index(corpus_dir: str, warc_dir: str):
    """queries() surface: the full WARC->CDX build (pyoracle recomputes
    expected offsets independently from the framing primitive)."""
    ensure_warc_dir(corpus_dir, warc_dir)
    return cdx_index(warc_dir)


def q_warc_extract(corpus_dir: str, warc_dir: str):
    """queries() surface: the flagship extract pipeline fed FROM the WARC
    container — read records, gate on text/html (M10), run the pinned
    extractor on the fetched payload bytes. The SQL oracle reads the
    corpus's independent text column, so a hash match proves container
    framing/parsing preserved every html byte the extractor sees."""
    import pyarrow.compute as pc

    from raycrawl.ops.html import extract_text_batch

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.starts_with(t["content_type"], "text/html"))
        t = extract_text_batch(t, col="payload", out="text")
        return t.select(["url", "text"])

    ensure_warc_dir(corpus_dir, warc_dir)
    return read_warc(warc_dir).map_batches(
        fin, batch_format="pyarrow", zero_copy_batch=True
    )


def q_cdx_lookup(corpus_dir: str, warc_dir: str, host: str = "h003.example"):
    """queries() surface: index-driven record fetch for one host — the
    SQL oracle selects the same host's rows from the ORIGINAL corpus, so
    a hash match pins prefix filtering, extent addressing and the seeked
    payload bytes end to end."""
    ensure_warc_dir(corpus_dir, warc_dir)
    prefix = ",".join(reversed(host.split("."))) + ")"
    return cdx_lookup(warc_dir, cdx_index(warc_dir), prefix)


def cdx_index(warc_dir: str):
    """(surt_key, ts_us, url, digest, filename, offset, length) sorted by
    (surt_key, ts_us, url) — a Common-Crawl-style CDX index. The sort is
    a range-partitioned all-to-all over SLIM rows (~100 B/record; the
    payload never enters the shuffle), so at 10^10 records the exchange
    moves ~1 TB of index, not 100 TB of page bytes."""
    return (
        read_warc(warc_dir)
        .map_batches(_cdx_batch, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["surt_key", "ts_us", "url"])
    )
