"""WARC source/sink + CDX index: framing determinism, byte-identical
roundtrip, member-extent (seek-read) correctness, resumable conversion,
and the sorted index vs an independent offset recomputation."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest
import ray

from raycrawl.sources import warc


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    )


def _corpus_rows(corpus: str) -> list[tuple]:
    src = pads.dataset(os.path.join(corpus, "pages.parquet")).to_table(
        columns=["url", "warc_ts", "content_type", "html"]
    )
    return sorted(
        zip(
            src["url"].to_pylist(),
            src["warc_ts"].cast(pa.int64()).to_pylist(),
            src["content_type"].to_pylist(),
            src["html"].to_pylist(),
        )
    )


def test_iso8601_roundtrip():
    for ts in [0, 1, 999_999, 1_700_000_123_456_789, 2_000_000_000_000_001]:
        assert warc.parse_iso8601(warc.iso8601(ts)) == ts


def test_surt_forms():
    assert warc.surt("http://www.Example.com/a/b?x=1") == "com,example,www)/a/b?x=1"
    assert warc.surt("http://h000.example/p/0") == "example,h000)/p/0"
    assert warc.surt("http://example.com:8080/") == "com,example:8080)/"
    assert warc.surt("http://example.com:80/x") == "com,example)/x"
    assert warc.surt("http://example.com") == "com,example)/"


def test_record_framing_deterministic():
    a = warc.warc_record_bytes("http://x/", 1_700_000_000_000_000, "text/html", b"hi")
    b = warc.warc_record_bytes("http://x/", 1_700_000_000_000_000, "text/html", b"hi")
    assert a == b  # gzip mtime=0 + fixed level => bit-identical members
    plain = warc.warc_record_bytes(
        "http://x/", 1_700_000_000_000_000, "text/html", b"hi", gzip_member=False
    )
    assert plain.startswith(b"WARC/1.0\r\n") and plain.endswith(b"hi\r\n\r\n")


@pytest.mark.parametrize("gz", [True, False])
def test_write_read_roundtrip(ray_session, smoke_corpus, tmp_path, gz):
    out = str(tmp_path / ("gz" if gz else "plain"))
    stats = warc.write_warc(smoke_corpus, out, gzip_members=gz)
    assert stats.num_rows == len(warc._shard_paths(smoke_corpus))
    tab = _collect(warc.read_warc(out))
    got = sorted(
        (r["url"], r["ts_us"], r["content_type"], r["payload"])
        for r in tab.to_pylist()
    )
    assert got == _corpus_rows(smoke_corpus)  # byte-identical payloads


def test_seek_read_every_record(ray_session, smoke_corpus, tmp_path):
    """CDX contract: (filename, offset, length) must address exactly one
    parseable record — the whole point of per-record gzip members."""
    out = str(tmp_path / "w")
    warc.write_warc(smoke_corpus, out)
    tab = _collect(warc.read_warc(out))
    by_file: dict[str, bytes] = {}
    for r in tab.to_pylist():
        data = by_file.setdefault(
            r["filename"], open(os.path.join(out, r["filename"]), "rb").read()
        )
        single = warc.parse_warc_file(
            data[r["offset"] : r["offset"] + r["length"]], r["filename"]
        )
        assert len(single) == 1 and single[0]["url"] == r["url"]
        assert single[0]["payload"] == r["payload"]


def test_write_is_resumable(ray_session, smoke_corpus, tmp_path):
    out = str(tmp_path / "w")
    warc.write_warc(smoke_corpus, out)
    files = sorted(os.listdir(out))
    # finished shards are skipped: plant a sentinel, rerun, sentinel survives
    sentinel = os.path.join(out, files[0])
    open(sentinel, "wb").write(b"SENTINEL")
    # a missing shard is rebuilt
    removed = None
    if len(files) > 1:
        removed = os.path.join(out, files[-1])
        expected = open(removed, "rb").read()
        os.remove(removed)
    warc.write_warc(smoke_corpus, out)
    assert open(sentinel, "rb").read() == b"SENTINEL"
    if removed:
        assert open(removed, "rb").read() == expected
    # ensure_warc_dir also self-heals (sentinel file still counts as built)
    assert sorted(os.listdir(out)) == files


def test_cdx_lookup_fetches_exact_payloads(ray_session, smoke_corpus, tmp_path):
    out = str(tmp_path / "w")
    warc.write_warc(smoke_corpus, out)
    idx = warc.cdx_index(out)
    got = warc.cdx_lookup(out, idx, "example,h003)").to_pandas()
    src = {
        (u, ts): h
        for u, ts, _, h in _corpus_rows(smoke_corpus)
        if u.startswith("http://h003.example/")
    }
    assert len(got) == len(src) > 0
    for r in got.to_dict("records"):
        h = src[(r["url"], r["ts_us"])]
        assert r["n_bytes"] == len(h)
        assert r["digest"] == warc.payload_digest(h)
    # zero-match prefix: empty result whose BLOCKS keep the output schema
    # (no zero-column block leaks into downstream unification; note
    # Dataset.to_pandas drops columns on an all-empty dataset, so assert
    # at the dataset/block level)
    empty = warc.cdx_lookup(out, warc.cdx_index(out), "zz,nohost)")
    assert empty.count() == 0
    assert empty.schema().names == ["url", "ts_us", "n_bytes", "digest"]


def test_import_warc_crawl_equivalence(ray_session, smoke_corpus, tmp_path):
    """Full container cycle: corpus -> WARC -> re-imported corpus must
    produce a BYTE-IDENTICAL crawl (visits + extracted) — the engine's
    determinism makes the comparison exact regardless of parquet shard
    layout differences."""
    import shutil

    from raycrawl.core import CrawlConfig
    from raycrawl.pipelines.crawl import run_crawl_ray

    wdir = str(tmp_path / "w")
    warc.write_warc(smoke_corpus, wdir)
    imported = str(tmp_path / "imported")
    n = warc.import_warc(wdir, imported)
    assert n == pads.dataset(os.path.join(smoke_corpus, "pages.parquet")).count_rows()
    for aux in ("robots.parquet", "seeds.parquet"):
        shutil.copy(os.path.join(smoke_corpus, aux), os.path.join(imported, aux))

    outs = []
    for corpus in (smoke_corpus, imported):
        out = str(tmp_path / ("crawl_" + os.path.basename(corpus)))
        run_crawl_ray(corpus, out, CrawlConfig(max_rounds=2), resume=False)
        vis = pads.dataset(os.path.join(out, "visits")).to_table()
        ext = pads.dataset(os.path.join(out, "extracted")).to_table()
        outs.append(
            (
                sorted(map(tuple, zip(*[vis[c].to_pylist() for c in sorted(vis.column_names)]))),
                sorted(map(tuple, zip(*[ext[c].to_pylist() for c in sorted(ext.column_names)]))),
            )
        )
    assert outs[0][0] == outs[1][0]  # visits identical
    assert outs[0][1] == outs[1][1]  # extracted byte-identical


def test_cdx_matches_independent_offsets(ray_session, smoke_corpus, tmp_path):
    """Engine CDX (reader extents + distributed sort) vs offsets
    re-accumulated straight from the framing primitive — no reader."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "w")
    warc.write_warc(smoke_corpus, out)
    got = warc.cdx_index(out).to_pandas()

    rows = []
    for shard in warc._shard_paths(smoke_corpus):
        t = pq.read_table(shard, columns=["url", "warc_ts", "content_type", "html"])
        fname = warc.warc_name(os.path.basename(shard))
        off = 0
        for url, ts, ct, h in zip(
            t["url"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
            t["content_type"].to_pylist(),
            t["html"].to_pylist(),
        ):
            n = len(warc.warc_record_bytes(url, ts, ct, h or b""))
            rows.append(
                (warc.surt(url), ts, url, fname, off, n,
                 warc.payload_digest(h or b""))
            )
            off += n
    rows.sort()
    want = [
        (r["surt_key"], r["ts_us"], r["url"], r["filename"], r["offset"],
         r["length"], r["digest"])
        for r in got.to_dict("records")
    ]
    assert want == rows  # sorted order AND extents AND digests identical
