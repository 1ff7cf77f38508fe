"""Deterministic synthetic-web generator (FIXTURES.md §1-3).

Produces `pages.parquet`, `seeds.parquet`, `robots.parquet` under an output
dir. Everything derives from sha1(seed, ...) so generation is
order-independent, reproducible, and parallelizable. The `text` column is
computed with the SAME pinned extractor the engine uses
(`raycrawl.core.extract_text`) — FIXTURES.md: "engine and oracle column
share one pinned implementation".

Sizes: smoke H=20 ~1k pages; correctness H=50 ~10k; bench H=200 ~100k.
"""

from __future__ import annotations

import argparse
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl import core

WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat "
    "duis aute irure reprehenderit voluptate velit esse cillum fugiat nulla "
    "pariatur excepteur sint occaecat cupidatat proident sunt culpa officia "
    "deserunt mollit anim laborum crawl frontier fetch extract parse link"
).split()

LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr", "zh"]
CHARSETS = ["latin-1", "gbk"]
NONASCII = {"latin-1": " café naïve über résumé.", "gbk": " 中文测试文本."}

BASE_TS_US = 1_700_000_000_000_000  # fixed epoch anchor (us)

# bump whenever generated CONTENT or layout changes — cache dirs embed it
# v3: content_type + n_links oracle columns; non-HTML asset pages (M10)
GEN_VERSION = 3

ASSET_TYPES = ["application/pdf", "image/png", "application/octet-stream"]


def _h(*parts) -> int:
    """Order-independent seeded hash -> uint64."""
    s = ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def host_name(i: int) -> str:
    return f"h{i:03d}.example"


def zipf_counts(n_hosts: int, n_pages: int) -> list[int]:
    w = [1.0 / (i + 1) ** 1.2 for i in range(n_hosts)]
    tot = sum(w)
    counts = [max(2, int(n_pages * x / tot)) for x in w]
    return counts


def _disallows_private(seed: int, h: int, n_hosts: int) -> bool:
    # ~20% of hosts disallow /private/; never the fully-blocked host
    return _h(seed, "robots-dis", h) % 5 == 0 and h != blocked_host(n_hosts)


def blocked_host(n_hosts: int) -> int:
    return n_hosts // 2  # one host with Disallow: /


def page_path(seed: int, h: int, n: int, n_hosts: int) -> str:
    if _disallows_private(seed, h, n_hosts) and _h(seed, "priv", h, n) % 10 == 0:
        return f"/private/p/{n:06d}"
    return f"/p/{n:06d}"


def page_url(seed: int, h: int, n: int, n_hosts: int) -> str:
    return f"http://{host_name(h)}{page_path(seed, h, n, n_hosts)}"


def has_asset(seed: int, h: int, n: int) -> bool:
    """~1/6 of pages link to a non-HTML asset on the same host (M10)."""
    return _h(seed, "asset", h, n) % 6 == 0


def asset_path(n: int) -> str:
    return f"/asset/{n:06d}.bin"


def asset_url(h: int, n: int) -> str:
    return f"http://{host_name(h)}{asset_path(n)}"


def asset_body(seed: int, h: int, n: int) -> bytes:
    """Deterministic pseudo-binary payload (never valid HTML)."""
    return b"".join(
        hashlib.sha1(f"{seed}:assetbody:{h}:{n}:{i}".encode()).digest()
        for i in range(8)
    )


def _words(seed: int, key: str, n: int) -> str:
    return " ".join(WORDS[_h(seed, key, i) % len(WORDS)] for i in range(n))


def _dirty_href(seed: int, h: int, n: int, target_url: str, k: int) -> str:
    """~10% of hrefs carry canonicalization dirt that M1 must clean."""
    mode = _h(seed, "dirt", h, n, k) % 40
    if mode == 0:
        # uppercase host
        return target_url.replace("http://h", "http://H", 1).replace(".example", ".EXAMPLE", 1)
    if mode == 1:
        # default port
        return target_url.replace(".example/", ".example:80/", 1)
    if mode == 2:
        return target_url + "#frag"
    if mode == 3:
        # dot-segments
        return target_url.replace("/p/", "/a/../p/./", 1)
    return target_url


def build_page(seed: int, h: int, n: int, n_hosts: int, counts: list[int]) -> tuple[str, bytes, list[str]]:
    """Returns (charset, html_bytes, hrefs)."""
    host = host_name(h)
    url = page_url(seed, h, n, n_hosts)
    fanout = 3 + (_h(seed, "fanout", h, n) % 6)
    hrefs: list[str] = []
    anchors: list[str] = []
    for k in range(fanout):
        r = _h(seed, "ltype", h, n, k) % 20
        if r < 16:  # same-host relative
            tgt = _h(seed, "ltgt", h, n, k) % counts[h]
            href = page_path(seed, h, tgt, n_hosts)
            full = f"http://{host}{href}"
        elif r < 19:  # cross-host absolute
            oh = _h(seed, "xhost", h, n, k) % n_hosts
            tgt = _h(seed, "xtgt", h, n, k) % counts[oh]
            full = page_url(seed, oh, tgt, n_hosts)
            href = full
        else:  # junk that M5 must drop
            junk = ["mailto:a@b.example", "javascript:void(0)", "#top", "ht tp://bad", "ftp://x.example/f"]
            href = junk[_h(seed, "junk", h, n, k) % len(junk)]
            anchors.append(f'<a href="{href}">junk{k}</a>')
            continue
        if _h(seed, "dirtq", h, n, k) % 10 == 0:
            href = _dirty_href(seed, h, n, full, k)
        hrefs.append(href)
        anchors.append(f'<a href="{href}">link {k} &amp; more</a>')
    if has_asset(seed, h, n):
        # link to a non-HTML asset page — fetched, but M10 skips the parse
        ah = asset_path(n)
        hrefs.append(f"http://{host}{ah}")
        anchors.append(f'<a href="{ah}">asset {n}</a>')

    charset = "utf-8"
    extra = ""
    if _h(seed, "charset", h, n) % 33 == 0:
        charset = CHARSETS[_h(seed, "cpick", h, n) % len(CHARSETS)]
        extra = NONASCII[charset]
    meta = f'<meta charset="{charset}">' if charset != "utf-8" else ""
    para1 = _words(seed, f"p1:{h}:{n}", 20 + _h(seed, "pl1", h, n) % 40)
    para2 = _words(seed, f"p2:{h}:{n}", 20 + _h(seed, "pl2", h, n) % 40)
    html = (
        f"<!DOCTYPE html><html><head>{meta}<title>Page {n:06d} of {host}</title>"
        f"<style>body {{ color: #222; }} .nav {{ font-weight: bold }}</style>"
        f"</head><body>"
        f"<!-- generated fixture page {h}/{n} -->"
        f'<div class="nav"><ul>' + "".join(f"<li>{a}</li>" for a in anchors) + "</ul></div>"
        f"<div><div><p>{para1}{extra}</p></div>"
        f"<p>Q&#x27;s entities &lt;ok&gt; {para2}</p></div>"
        f"<script>var x = 1; console.log('never in text');</script>"
        f"<p>tail of {url}</p>"
        f"</body></html>"
    )
    return charset, html.encode(charset, errors="replace"), hrefs


def gen_host_rows(seed: int, h: int, n_hosts: int, counts: list[int]) -> dict:
    urls, tss, htmls, texts, langs, ctypes, nlinks = [], [], [], [], [], [], []

    def _append(url, ts, body, lang, ctype):
        urls.append(url)
        tss.append(ts)
        htmls.append(body)
        # oracle columns, computed with the pinned extractor regardless of
        # content type (the crawl gates on content_type; the extract_text /
        # extract_links_count queries run the raw per-row semantics)
        texts.append(core.extract_text(body))
        nlinks.append(len(core.extract_links(body, url)))
        langs.append(lang)
        ctypes.append(ctype)

    for n in range(counts[h]):
        url = page_url(seed, h, n, n_hosts)
        _, html, _ = build_page(seed, h, n, n_hosts, counts)
        lang = LANGS[_h(seed, "lang", h, n) % len(LANGS)]
        n_snaps = 1
        if _h(seed, "snap", h, n) % 20 == 0:
            n_snaps = 2 + _h(seed, "snapn", h, n) % 2
        for s in range(n_snaps):
            if s == n_snaps - 1:
                body = html  # latest snapshot = the canonical page
            else:
                stale = f"<html><body><p>stale snapshot {s} of {url}</p></body></html>"
                body = stale.encode("utf-8")
            ts = BASE_TS_US + (_h(seed, "ts", h, n) % 10_000_000) * 1_000_000 + s * 86_400_000_000
            _append(url, ts, body, lang, "text/html")
        if has_asset(seed, h, n):
            # the non-HTML target of this page's asset link (single snapshot)
            _append(
                asset_url(h, n),
                BASE_TS_US + (_h(seed, "ats", h, n) % 10_000_000) * 1_000_000,
                asset_body(seed, h, n),
                "und",
                ASSET_TYPES[_h(seed, "atype", h, n) % len(ASSET_TYPES)],
            )
    return {
        "url": urls, "warc_ts": tss, "html": htmls, "text": texts,
        "lang": langs, "content_type": ctypes, "n_links": nlinks,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("content_type", pa.string()),
        ("n_links", pa.int32()),
    ]
)


def _host_table(args) -> pa.Table:
    seed, h, n_hosts, counts = args
    cols = gen_host_rows(seed, h, n_hosts, counts)
    return pa.table(
        {
            "url": cols["url"],
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": cols["html"],
            "text": cols["text"],
            "lang": cols["lang"],
            "content_type": cols["content_type"],
            "n_links": pa.array(cols["n_links"], pa.int32()),
        },
        schema=PAGES_SCHEMA,
    )


def generate(
    out_dir: str,
    n_hosts: int = 20,
    n_pages: int = 1000,
    seed: int = 42,
    shard_rows: int = 4096,
    procs: int = 1,
) -> dict:
    """`pages.parquet` is a DIRECTORY of ~shard_rows-row part files so Ray
    reads get parallel blocks (a single 100k-row file would serialize the
    scan). Generation is order-independent per host -> parallelizable."""
    os.makedirs(out_dir, exist_ok=True)
    counts = zipf_counts(n_hosts, n_pages)

    jobs = [(seed, h, n_hosts, counts) for h in range(n_hosts)]
    if procs > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=procs) as ex:
            tables = list(ex.map(_host_table, jobs, chunksize=max(1, n_hosts // (procs * 4))))
    else:
        tables = [_host_table(j) for j in jobs]
    pages = pa.concat_tables(tables)

    pages_dir = os.path.join(out_dir, "pages.parquet")
    import shutil

    if os.path.isdir(pages_dir):
        shutil.rmtree(pages_dir)
    elif os.path.exists(pages_dir):
        os.remove(pages_dir)
    os.makedirs(pages_dir)
    for i, off in enumerate(range(0, pages.num_rows, shard_rows)):
        pq.write_table(
            pages.slice(off, shard_rows),
            os.path.join(pages_dir, f"part-{i:05d}.parquet"),
        )

    # seeds: first page of the 5 hottest hosts + 3 mid hosts
    seed_hosts = list(range(min(5, n_hosts))) + [
        i for i in (n_hosts // 3, n_hosts // 3 + 1, n_hosts // 3 + 2) if i < n_hosts
    ]
    seed_urls = [page_url(seed, h, 0, n_hosts) for h in dict.fromkeys(seed_hosts)]
    seeds = pa.table(
        {"url": seed_urls, "rank": pa.array(range(len(seed_urls)), pa.int32())}
    )
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))

    # robots
    hosts, bodies, delays, fts = [], [], [], []
    delay_choices = [0, 100, 1000, 5000]
    for h in range(n_hosts):
        if h == blocked_host(n_hosts):
            body = "User-agent: *\nDisallow: /\n"
        elif h == 1:
            body = ""  # empty robots file
        elif _disallows_private(seed, h, n_hosts):
            body = "User-agent: *\nDisallow: /private/\n"
        else:
            body = "User-agent: *\nDisallow:\n"
        d = delay_choices[_h(seed, "delay", h) % len(delay_choices)]
        if h < 3 and d == 0:  # hot hosts get nonzero delays so quotas bite
            d = 1000
        if d:
            body += f"Crawl-delay: {d / 1000:g}\n"
        hosts.append(host_name(h))
        bodies.append(body)
        delays.append(d)
        fts.append(BASE_TS_US)
    robots = pa.table(
        {
            "host": hosts,
            "rules": bodies,
            "crawl_delay_ms": pa.array(delays, pa.int32()),
            "fetched_ts": pa.array(fts, pa.timestamp("us")),
        }
    )
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))
    return {"pages": pages.num_rows, "hosts": n_hosts, "seeds": len(seed_urls)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--hosts", type=int, default=20)
    ap.add_argument("--pages", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--procs", type=int, default=1)
    args = ap.parse_args()
    info = generate(args.out, args.hosts, args.pages, args.seed, procs=args.procs)
    print(info)


if __name__ == "__main__":
    main()
