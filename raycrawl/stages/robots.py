"""ST2/M11/J3 — robots rules as a broadcast lookup, not a shuffle join.

The robots table is one row per host (tiny relative to the frontier), so it
is the classic broadcast side: parsed ONCE into a dict, `ray.put` once on
the driver, and read via `ray.get` in each actor's `__init__` (callable
class passed to `map_batches(RobotsFilter, concurrency=N)`) — never
re-shipped per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from raycrawl import core


def load_robots_rules(robots_path: str) -> dict[str, core.RobotsRules]:
    """Parse the robots table into {host: RobotsRules} on the driver."""
    t = pq.read_table(robots_path, columns=["host", "rules"])
    return {
        h: core.parse_robots(r)
        for h, r in zip(t["host"].to_pylist(), t["rules"].to_pylist())
    }


class RobotsFilter:
    """Callable-class map_batches stage: drop rows whose url_norm is
    disallowed for its host. Hosts with no robots row are allowed
    (reference behavior: no robots.txt -> crawl)."""

    def __init__(self, rules_ref) -> None:  # rules_ref: ray.ObjectRef | dict
        self.rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        rules = self.rules
        hosts = t["host"].to_pylist()
        urls = t["url_norm"].to_pylist()
        keep = []
        for h, u in zip(hosts, urls):
            r = rules.get(h)
            keep.append(r is None or r.allows_url(u))
        return t.filter(pa.array(keep))


def crawl_delays(rules: dict[str, core.RobotsRules]) -> dict[str, int]:
    return {h: r.crawl_delay_ms for h, r in rules.items() if r.crawl_delay_ms}


def make_robots_filter(rules_ref):
    """Plain-function variant of RobotsFilter for small/medium rule sets:
    no actor-pool spin-up per round; each task does one plasma get of the
    shared rules dict (zero network re-ship — same object id)."""

    def robots_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref
        hosts = t["host"].to_pylist()
        urls = t["url_norm"].to_pylist()
        keep = []
        for h, u in zip(hosts, urls):
            r = rules.get(h)
            keep.append(r is None or r.allows_url(u))
        return t.filter(pa.array(keep))

    return robots_filter
