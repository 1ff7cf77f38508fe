"""pyref — the single-threaded, zero-Ray oracle crawl (SURVEY.md §5.1).

Executes the full frontier-rounds lifecycle (SURVEY.md §3.4) sequentially
over in-memory dicts, using the pinned per-record semantics from
`raycrawl.core`. The Ray Data engine (`raycrawl.pipelines.crawl`) must
reproduce this oracle's visit order, seen set, extracted text, and
per-round counters EXACTLY — that equivalence is the repo's substitute for
the (absent) reference binary, per SURVEY.md §0.

Pinned orchestration semantics (shared contract with the Ray engine):

- Visit order within a round: lexicographic (priority, host, seq);
  across rounds: round number first. (§4.3)
- seq: seeds get their seed-list position; children get
  parent_seq * SEQ_STRIDE + link_index (document order of accepted links).
- Within-round dedup keeps the minimum (priority, seq) per url_hash (D1).
- A URL is added to the seen set when it is ACCEPTED into the frontier
  (discovery time), mirroring seenreq's queue-time check (ST1).
- robots filtering happens at discovery, before the seen-add; blocked URLs
  are counted (skipped_robots) and never become seen (M11).
- Politeness: per-host logical-time quota q = round_duration // max(delay,
  rate_limit); the first q frontier rows of a host in crawl order are
  fetched this round, the rest carry over (no re-dedup/seen/robots for
  carryover rows) (ST3/O5).
- Fetch: url_norm looked up in the snapshot-picked corpus; miss -> status
  404; seeded transient failure -> retry with attempt+1 up to `retries`,
  deferred one round (not_before_round) (J1/J2/M15/I3).
- Content-type gate (M10): a fetched page whose content_type matches no
  allowed prefix gets its status-200 visit but is never parsed — no
  extracted row, no links, counted as skipped_content_type.
- Frontier expansion only from status-200 pages, depth+1 <= max_depth,
  accepted links are the canonicalized non-"" results (M5+M1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from raycrawl import core
from raycrawl.core import CrawlConfig


@dataclass
class FrontierRow:
    url: str  # original (pre-canonicalization) form as discovered
    url_norm: str
    url_hash: int
    host: str
    depth: int
    priority: int
    parent_url: str
    seq: int
    attempt: int = 0
    not_before_round: int = 0
    discovered_round: int = 0


@dataclass
class CrawlResult:
    visit_order: list[dict] = field(default_factory=list)  # url, round, priority, host, seq, status
    extracted: list[dict] = field(default_factory=list)  # url, text, n_links, round
    seen: set[int] = field(default_factory=set)
    counters: list[dict] = field(default_factory=list)  # per-round lineage
    rounds_run: int = 0


def _snap_tiekey(row: dict) -> tuple:
    """Deterministic winner among equal-warc_ts snapshots of one url
    (r5 ADVICE fix: the old first-in-input-order rule made engine==pyref
    depend on Ray block order on tied corpora). Pinned: smallest
    (html, content_type) wins, nulls as ''. Rows equal on BOTH are
    indistinguishable downstream (only url/warc_ts/html/content_type
    propagate out of the pick), so the rule is total where it matters.
    html is a BINARY column — nulls map to b'' (never '': mixed
    str/bytes comparisons raise TypeError)."""
    return (row.get("html") or b"", row.get("content_type") or "")


def snapshot_pick(pages: list[dict]) -> dict[str, dict]:
    """J5: latest warc_ts per url wins (as-of 'now'); ties on warc_ts
    break by _snap_tiekey — order-independent on both engine paths."""
    best: dict[str, dict] = {}
    for row in pages:
        cur = best.get(row["url"])
        if (
            cur is None
            or row["warc_ts"] > cur["warc_ts"]
            or (
                row["warc_ts"] == cur["warc_ts"]
                and _snap_tiekey(row) < _snap_tiekey(cur)
            )
        ):
            best[row["url"]] = row
    return best


def run_crawl(
    pages: list[dict],
    robots: list[dict],
    seeds: list[str],
    cfg: CrawlConfig | None = None,
) -> CrawlResult:
    cfg = cfg or CrawlConfig()
    corpus = snapshot_pick(pages)
    robots_by_host: dict[str, core.RobotsRules] = {
        r["host"]: core.parse_robots(r["rules"]) for r in robots
    }
    res = CrawlResult()

    # Round-0 frontier from seeds (S2): rank order -> seq.
    frontier: list[FrontierRow] = []
    for rank, url in enumerate(seeds):
        norm = core.canonicalize_url(url)
        if not norm:
            continue
        h = core.url_hash(norm)
        rules = robots_by_host.get(core.host_of(norm))
        if rules is not None and not rules.allows_url(norm):
            continue
        if h in res.seen:
            continue
        res.seen.add(h)
        frontier.append(
            FrontierRow(
                url, norm, h, core.host_of(norm), 0,
                cfg.host_priorities.get(core.host_of(norm), cfg.priority_default),
                "", rank,
            )
        )

    total_visits = 0
    for rnd in range(cfg.max_rounds):
        if not frontier:
            break
        if cfg.max_pages and total_visits >= cfg.max_pages:
            break
        res.rounds_run = rnd + 1
        counters = {
            "round": rnd,
            "frontier_in": len(frontier),
            "fetched": 0,
            "status_200": 0,
            "status_404": 0,
            "transient_fail": 0,
            "retry_exhausted": 0,
            "discovered": 0,
            "dup_within_round": 0,
            "skipped_seen": 0,
            "skipped_robots": 0,
            "skipped_content_type": 0,
            "carryover": 0,
            "links_seen": 0,
        }

        # split: eligible this round vs deferred (retry backoff)
        eligible = [r for r in frontier if r.not_before_round <= rnd]
        deferred = [r for r in frontier if r.not_before_round > rnd]

        # politeness (ST3/O5): crawl order then per-host quota
        eligible.sort(key=lambda r: core.visit_sort_key(r.priority, r.host, r.seq))
        taken: list[FrontierRow] = []
        carry: list[FrontierRow] = []
        host_used: dict[str, int] = {}
        for r in eligible:
            rules = robots_by_host.get(r.host)
            delay = rules.crawl_delay_ms if rules else 0
            q = core.politeness_quota(
                delay, cfg.rate_limit_ms, cfg.round_duration_ms, cfg.max_per_host_round
            )
            used = host_used.get(r.host, 0)
            if used < q:
                host_used[r.host] = used + 1
                taken.append(r)
            else:
                carry.append(r)
        counters["carryover"] = len(carry) + len(deferred)

        # fetch + extract (J1/J2/M4/M5/M6/M15)
        next_new: list[FrontierRow] = []
        retries_next: list[FrontierRow] = []
        for r in taken:
            page = corpus.get(r.url_norm)
            if page is None:
                status = 404
                counters["status_404"] += 1
                res.visit_order.append(
                    {"url": r.url_norm, "round": rnd, "priority": r.priority,
                     "host": r.host, "seq": r.seq, "status": status,
                     "user_agent": cfg.user_agents[r.seq % len(cfg.user_agents)]}
                )
                counters["fetched"] += 1
                continue
            if core.transient_failure(r.url_hash, r.attempt, cfg.fail_permille):
                counters["transient_fail"] += 1
                if r.attempt + 1 <= cfg.retries:
                    nr = FrontierRow(
                        r.url, r.url_norm, r.url_hash, r.host, r.depth, r.priority,
                        r.parent_url, r.seq, r.attempt + 1, rnd + 1, r.discovered_round,
                    )
                    retries_next.append(nr)
                else:
                    counters["retry_exhausted"] += 1
                continue
            status = 200
            counters["fetched"] += 1
            counters["status_200"] += 1
            res.visit_order.append(
                {"url": r.url_norm, "round": rnd, "priority": r.priority,
                 "host": r.host, "seq": r.seq, "status": status,
                 "user_agent": cfg.user_agents[r.seq % len(cfg.user_agents)]}
            )
            # M10 gate: non-HTML content is fetched (visit above) but never
            # parsed — no extracted row, no links, no frontier expansion.
            ctype = page.get("content_type") or "text/html"
            if not any(ctype.startswith(p) for p in cfg.allowed_content_types):
                counters["skipped_content_type"] += 1
                continue
            text = core.extract_text(page["html"])
            links = core.extract_links(page["html"], r.url_norm)
            counters["links_seen"] += len(links)
            res.extracted.append(
                {"url": r.url_norm, "text": text, "n_links": len(links), "round": rnd}
            )
            if r.depth + 1 <= cfg.max_depth:
                for li, link in enumerate(links):
                    norm = core.canonicalize_url(link)
                    if not norm:
                        continue
                    next_new.append(
                        FrontierRow(
                            link, norm, core.url_hash(norm), core.host_of(norm),
                            r.depth + 1,
                            cfg.host_priorities.get(core.host_of(norm), cfg.priority_default),
                            r.url_norm,
                            core.child_seq(r.seq, li), 0, 0, rnd + 1,
                        )
                    )

        # D1 within-round dedup: keep min (priority, seq) per url_hash
        counters["discovered"] = len(next_new)
        best: dict[int, FrontierRow] = {}
        for r in next_new:
            cur = best.get(r.url_hash)
            if cur is None or (r.priority, r.seq) < (cur.priority, cur.seq):
                best[r.url_hash] = r
        counters["dup_within_round"] = len(next_new) - len(best)

        accepted: list[FrontierRow] = []
        for r in sorted(best.values(), key=lambda r: (r.priority, r.host, r.seq)):
            rules = robots_by_host.get(r.host)
            if rules is not None and not rules.allows_url(r.url_norm):
                counters["skipped_robots"] += 1
                continue
            if r.url_hash in res.seen:
                counters["skipped_seen"] += 1
                continue
            res.seen.add(r.url_hash)
            accepted.append(r)

        frontier = carry + deferred + retries_next + accepted
        total_visits += counters["fetched"]
        res.counters.append(counters)

    return res
