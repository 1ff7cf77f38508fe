"""M7 in the crawl loop: a registered SiteConfig produces an entities sink
whose rows byte-match direct extract_entities application."""

import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl.core import CrawlConfig
from raycrawl.stages.site import SiteConfig, extract_entities


def test_entities_sink(ray_session, smoke_corpus, tmp_path):
    from raycrawl.pipelines.crawl import run_crawl_ray

    # fixture pages have <div class="nav"><ul><li><a ...> structure
    cfg_site = SiteConfig(
        host="h000.example",
        list_selector="div.nav li",
        fields={"label": "a @text", "href": "a @attr:href"},
    )
    cfg = CrawlConfig(
        max_rounds=2, seen_shards=2,
        extra={"site_registry": {"h000.example": cfg_site}},
    )
    out = str(tmp_path / "ents")
    run_crawl_ray(smoke_corpus, out, cfg, resume=False)

    files = sorted(glob.glob(f"{out}/entities/round=*/*.parquet"))
    assert files
    ents = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    ).to_pylist()
    assert ents, "configured host should emit entities"
    assert all(e["site"] == "h000.example" for e in ents)
    # byte-parity vs direct application on the corpus page
    pages = pq.read_table(f"{smoke_corpus}/pages.parquet").to_pylist()
    by_url = {}
    for p in pages:
        cur = by_url.get(p["url"])
        if cur is None or p["warc_ts"] > cur["warc_ts"]:
            by_url[p["url"]] = p
    sample = ents[0]
    direct = [
        json.dumps(e, sort_keys=True)
        for e in extract_entities(by_url[sample["url"]]["html"], sample["url"], cfg_site)
    ]
    got_for_url = [e["entity_json"] for e in ents if e["url"] == sample["url"]]
    assert got_for_url == direct
    parsed = json.loads(sample["entity_json"])
    assert "label" in parsed and "_sourceUrl" in parsed
