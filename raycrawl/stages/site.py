"""M7/ST4/X1 — declarative per-site extractors (the celitedev layer).

The reference ships one declarative config module per site: list selector,
per-field CSS selectors, mapping transforms, sunk as schemaless entities.
Rebuilt here as:

- a minimal DOM (stdlib HTMLParser -> node tree) with a cheerio-subset
  selector engine: `tag`, `.class`, `#id`, `tag.class`, descendant chains
  ("div.nav a"), and field accessors `@text` / `@attr:href` etc.
- `@register_site(host)` registering a `SiteConfig` (list_selector +
  field selectors + optional per-field python transform).
- `SiteExtractor` — callable-class `map_batches` stage (actor pool):
  registry resolved ONCE per actor in __init__; per batch it walks rows,
  picks the config by host, emits one entity row per matched list item as
  a JSON string column (heterogeneous site schemas -> string JSON, like
  the reference's schemaless entities).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Callable

import pyarrow as pa

from raycrawl import core

# ---------------------------------------------------------------------------
# Mini-DOM
# ---------------------------------------------------------------------------


class DomNode:
    __slots__ = ("tag", "attrs", "children", "parent", "_text")

    def __init__(self, tag: str, attrs: dict, parent: "DomNode | None") -> None:
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # DomNode | str
        self.parent = parent
        self._text: str | None = None

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def text(self) -> str:
        """Concatenated text in document order (cheerio .text() semantics,
        consistent with core.extract_text: script/style/template skipped)."""
        if self._text is None:
            parts: list[str] = []
            stack = [self]
            out: list[str] = []

            def walk(n: "DomNode") -> None:
                if n.tag in ("script", "style", "template"):
                    return
                for ch in n.children:
                    if isinstance(ch, str):
                        out.append(ch)
                    else:
                        walk(ch)

            walk(self)
            self._text = "".join(out)
        return self._text

    def iter(self):
        yield self
        for ch in self.children:
            if isinstance(ch, DomNode):
                yield from ch.iter()


_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = DomNode("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = DomNode(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(DomNode(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.children.append(data)


def parse_dom(html: bytes | str) -> DomNode:
    if isinstance(html, bytes):
        html = core.decode_html(html)
    b = _DomBuilder()
    core._feed_lenient(b, html)  # hard-error truncation rule, see core.py
    return b.root


# ---------------------------------------------------------------------------
# Selector engine (cheerio subset)
# ---------------------------------------------------------------------------


def _match_simple(node: DomNode, sel: str) -> bool:
    """`tag`, `.class`, `#id`, `tag.class`, `tag#id`."""
    if sel.startswith("."):
        return sel[1:] in node.classes
    if sel.startswith("#"):
        return node.attrs.get("id") == sel[1:]
    tag, _, rest = sel.partition(".")
    if rest:
        return node.tag == tag and rest in node.classes
    tag, _, idv = sel.partition("#")
    if idv:
        return node.tag == tag and node.attrs.get("id") == idv
    return node.tag == sel


def select(root: DomNode, selector: str) -> list[DomNode]:
    """Descendant-combinator chains of simple selectors, document order."""
    parts = selector.split()
    current = [root]
    for p in parts:
        nxt: list[DomNode] = []
        seen = set()
        for base in current:
            for n in base.iter():
                if n is base:
                    continue
                if _match_simple(n, p) and id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        current = nxt
    return current


def extract_field(node: DomNode, spec: str) -> str | None:
    """`<selector>` -> text of first match; `<selector> @attr:href` ->
    attribute; `@text` / `@attr:x` alone apply to the node itself."""
    spec = spec.strip()
    sel, _, acc = spec.partition("@")
    sel = sel.strip()
    acc = acc.strip()
    target = node
    if sel:
        found = select(node, sel)
        if not found:
            return None
        target = found[0]
    if not acc or acc == "text":
        return target.text()
    if acc.startswith("attr:"):
        return target.attrs.get(acc[5:])
    return None


# ---------------------------------------------------------------------------
# Site registry
# ---------------------------------------------------------------------------


@dataclass
class SiteConfig:
    host: str
    list_selector: str  # one entity per match; "" -> whole document
    fields: dict[str, str] = field(default_factory=dict)  # name -> field spec
    transforms: dict[str, Callable[[str | None], object]] = field(default_factory=dict)


_REGISTRY: dict[str, SiteConfig] = {}


def register_site(cfg: SiteConfig) -> SiteConfig:
    _REGISTRY[cfg.host] = cfg
    return cfg


def get_registry() -> dict[str, SiteConfig]:
    return dict(_REGISTRY)


def extract_entities(html: bytes, url: str, cfg: SiteConfig) -> list[dict]:
    root = parse_dom(html)
    items = select(root, cfg.list_selector) if cfg.list_selector else [root]
    out = []
    for i, item in enumerate(items):
        ent: dict = {"_sourceUrl": url, "_sourceId": f"{url}#{i}"}
        for name, spec in cfg.fields.items():
            val = extract_field(item, spec)
            tf = cfg.transforms.get(name)
            if tf is not None:
                val = tf(val)
            ent[name] = val
        out.append(ent)
    return out


class SiteExtractor:
    """Actor-pool map_batches stage: pages -> entities (url, site,
    entity_json). Configs resolve once per actor in __init__ (ST4)."""

    def __init__(self, registry: dict[str, SiteConfig] | None = None) -> None:
        self.registry = registry if registry is not None else get_registry()

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url_norm" if "url_norm" in t.column_names else "url"].to_pylist()
        htmls = t["html"].to_pylist()
        out_url, out_site, out_json = [], [], []
        for url, html in zip(urls, htmls):
            host = core.host_of(url)
            cfg = self.registry.get(host)
            if cfg is None or html is None:
                continue
            for ent in extract_entities(html, url, cfg):
                out_url.append(url)
                out_site.append(host)
                out_json.append(json.dumps(ent, sort_keys=True))
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "site": pa.array(out_site, pa.string()),
                "entity_json": pa.array(out_json, pa.string()),
            }
        )


def direct(corpus_dir: str, url: str) -> dict | None:
    """X5 `direct()`: bypass frontier/politeness — fetch+parse one URL
    against the corpus. Returns {url, status, text, links} (no dedup, no
    seen-set, no events, like the reference's Crawler.direct)."""
    import pyarrow.parquet as pq

    norm = core.canonicalize_url(url)
    if not norm:
        return None
    import pyarrow.dataset as pads

    dataset = pads.dataset(f"{corpus_dir}/pages.parquet")
    t = dataset.to_table(filter=pads.field("url") == norm)
    if t.num_rows == 0:
        return {"url": norm, "status": 404, "text": None, "links": []}
    idx = max(range(t.num_rows), key=lambda i: t["warc_ts"][i].as_py())
    html = t["html"][idx].as_py()
    text, links = core.extract_page(html, norm)
    return {"url": norm, "status": 200, "text": text, "links": links}
