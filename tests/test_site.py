"""Site-extractor layer tests: mini-DOM, selector engine, entity
extraction, the map_batches stage, and the direct() bypass."""

import json

import pyarrow as pa

from raycrawl.stages import site

HTML = b"""
<html><body>
<div class="listing">
  <div class="item" id="i1">
    <h2 class="name">Widget &amp; Co</h2>
    <span class="price"> $12.50 </span>
    <a class="more" href="/detail/1">more</a>
  </div>
  <div class="item" id="i2">
    <h2 class="name">Gadget</h2>
    <span class="price">$99</span>
    <a class="more" href="/detail/2">more</a>
  </div>
</div>
<div class="other"><div class="item"><h2 class="name">NotInListing</h2></div></div>
</body></html>
"""


class TestDomSelect:
    def test_simple_selectors(self):
        root = site.parse_dom(HTML)
        assert len(site.select(root, ".item")) == 3
        assert len(site.select(root, "div.listing .item")) == 2
        assert len(site.select(root, "#i2")) == 1
        assert len(site.select(root, "h2.name")) == 3
        assert site.select(root, "#i1 span.price")[0].text().strip() == "$12.50"

    def test_text_entities_decoded(self):
        root = site.parse_dom(HTML)
        assert site.select(root, "#i1 h2")[0].text() == "Widget & Co"

    def test_attr_accessor(self):
        root = site.parse_dom(HTML)
        item = site.select(root, "#i1")[0]
        assert site.extract_field(item, "a.more @attr:href") == "/detail/1"
        assert site.extract_field(item, ".name @text") == "Widget & Co"
        assert site.extract_field(item, ".missing") is None


class TestSiteConfig:
    def cfg(self):
        return site.SiteConfig(
            host="shop.example",
            list_selector="div.listing .item",
            fields={
                "name": ".name @text",
                "price": ".price @text",
                "detail": "a.more @attr:href",
            },
            transforms={"price": lambda v: float(v.strip().lstrip("$")) if v else None},
        )

    def test_extract_entities(self):
        ents = site.extract_entities(HTML, "http://shop.example/list", self.cfg())
        assert len(ents) == 2
        assert ents[0]["name"] == "Widget & Co"
        assert ents[0]["price"] == 12.5
        assert ents[1]["detail"] == "/detail/2"
        assert ents[0]["_sourceId"] == "http://shop.example/list#0"

    def test_site_extractor_stage(self):
        t = pa.table(
            {
                "url": ["http://shop.example/list", "http://other.example/x"],
                "html": [HTML, b"<p>no config for this host</p>"],
            }
        )
        stage = site.SiteExtractor({"shop.example": self.cfg()})
        out = stage(t)
        assert out.num_rows == 2  # only the configured host emits
        ent = json.loads(out["entity_json"][0].as_py())
        assert ent["price"] == 12.5
        assert out["site"].to_pylist() == ["shop.example", "shop.example"]


class TestDirect:
    def test_direct_hit_and_miss(self, smoke_corpus):
        import pyarrow.parquet as pq

        pages = pq.read_table(f"{smoke_corpus}/pages.parquet")
        url = pages["url"][0].as_py()
        res = site.direct(smoke_corpus, url)
        assert res["status"] == 200
        assert res["text"]  # extracted
        miss = site.direct(smoke_corpus, "http://nowhere.example/x")
        assert miss["status"] == 404
        assert site.direct(smoke_corpus, "mailto:junk") is None

    def test_direct_uses_latest_snapshot(self, smoke_corpus):
        import pyarrow.parquet as pq

        pages = pq.read_table(f"{smoke_corpus}/pages.parquet")
        from collections import Counter

        counts = Counter(pages["url"].to_pylist())
        multi = [u for u, n in counts.items() if n > 1]
        assert multi, "fixture should contain multi-snapshot urls"
        res = site.direct(smoke_corpus, multi[0])
        assert res["status"] == 200
        assert "stale snapshot" not in res["text"]
