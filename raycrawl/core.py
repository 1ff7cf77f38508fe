"""Pinned reference semantics — the single source of truth for raycrawl.

The reference checkout at /root/reference is empty (SURVEY.md §0), so these
functions ARE the executable specification of "reference behavior":

- URL canonicalization (SURVEY.md §2 M1) — the seenreq-style request
  normalization documented for the node-crawler lineage.
- Charset sniff + decode (M4) — Content-Type param → <meta charset> →
  default utf-8, mirroring node-crawler's forceUTF8/iconv path.
- HTML text extraction (M6) — cheerio-`.text()`-equivalent, pinned as:
  script/style/template stripped, text nodes concatenated in document
  order, entities decoded, no extra whitespace collapsing.
- Link extraction (M5) — `$('a[href]')` + resolve against base, http(s) only.
- robots.txt parsing (M11/ST2) and the logical-time politeness quota (ST3).

Both the single-threaded oracle (`raycrawl.pyref`) and every Ray Data stage
import these SAME functions, which is what makes "byte-identical extracted
text per url" (BASELINE.json:15) achievable and honest: the oracle pins the
spec, the Ray engine must reproduce the oracle's *orchestration* (ordering,
seen set, politeness, rounds) — that part is genuinely re-derived and
tested, not shared.

Everything here is pure, deterministic, wall-clock-free.
"""

from __future__ import annotations

import codecs
import hashlib
import logging
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

# ---------------------------------------------------------------------------
# URL algebra (M1, M2, M3)
# ---------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _pct_normalize(s: str) -> str:
    """Decode %XX for unreserved chars; uppercase the hex of the rest."""

    def fix(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(fix, s)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1) if path.startswith("/") else path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def canonicalize_url(url: str) -> str:
    """Normalized request signature (M1).

    lowercase scheme+host, strip default port, strip fragment, resolve
    dot-segments, percent-normalize path+query (decode unreserved,
    uppercase other escapes), keep query-param order, empty path -> "/".
    Returns "" for URLs that do not parse or are not http(s).
    """
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https"):
            return ""
        host = (parts.hostname or "").lower()
        if not host:
            return ""
        # .port VALIDATES lazily — "http://h:99999/" raises here, not in
        # urlsplit; a single such href must not poison a parse block
        port = parts.port
    except ValueError:
        return ""
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _pct_normalize(remove_dot_segments(parts.path)) or "/"
    query = _pct_normalize(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_hash(url_norm: str) -> int:
    """Stable 64-bit hash of the canonical URL (M2): sha1[:8] big-endian."""
    return int.from_bytes(hashlib.sha1(url_norm.encode("utf-8")).digest()[:8], "big")


def host_of(url: str) -> str:
    """Hostname for limiter grouping (M3); "" when unparseable."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# Charset sniff + decode (M4)
# ---------------------------------------------------------------------------

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)


def sniff_charset(html: bytes, content_type: str | None = None) -> str:
    """Charset sniff order pinned to the reference path: Content-Type header
    param, then <meta charset> in the first 1024 bytes, then utf-8."""
    if content_type:
        m = re.search(r"charset=([a-zA-Z0-9_\-]+)", content_type)
        if m:
            enc = m.group(1)
            try:
                codecs.lookup(enc)
                return enc.lower()
            except LookupError:
                pass
    m = _META_CHARSET_RE.search(html[:1024])
    if m:
        enc = m.group(1).decode("ascii", "replace")
        try:
            codecs.lookup(enc)
            return enc.lower()
        except LookupError:
            pass
    return "utf-8"


def decode_html(html: bytes, content_type: str | None = None) -> str:
    """bytes -> str with the pinned sniff order; errors='replace'."""
    return html.decode(sniff_charset(html, content_type), errors="replace")


# ---------------------------------------------------------------------------
# HTML text + link extraction (M5, M6)
# ---------------------------------------------------------------------------

_SKIP_TAGS = frozenset({"script", "style", "template"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self.parts.append(data)


# Truncation observability (r5 ADVICE): the truncate-at-error rule below
# is pinned semantics, but a bug later introduced in a handle_* method
# would silently truncate extraction corpus-wide if the swallow were
# invisible. Every process counts truncations and logs a rate-limited
# WARNING (first, then each 10_000th) to its own stderr — visible in Ray
# worker logs without perturbing the pinned counters/goldens.
_truncations = 0


def truncation_count() -> int:
    """Hard-parser-error truncations seen by THIS process (per Ray
    worker; the driver sees its own local count only)."""
    return _truncations


def _feed_lenient(p: HTMLParser, doc: str) -> bool:
    """feed + close, tolerating the stdlib parser's HARD errors on
    malformed markup (real-web bytes hit them: '<![' followed by binary
    noise raises AssertionError from _markupbase's marked-section scan).
    Pinned rule: a hard parser error truncates the parse AT the
    malformation — everything extracted before it is kept. The parse is
    deterministic up to the raise, so engine and pyref (which share this
    function) agree byte-for-byte. Returns True when truncated."""
    global _truncations
    try:
        p.feed(doc)
        p.close()
        return False
    except (AssertionError, NotImplementedError, ValueError) as exc:
        _truncations += 1
        if _truncations == 1 or _truncations % 10_000 == 0:
            logging.getLogger("raycrawl.extract").warning(
                "lenient-parse truncation #%d (%s: %s)",
                _truncations, type(exc).__name__, exc,
            )
        return True


def extract_text_str(html_utf8: str) -> str:
    """Pinned M6 semantics over an already-decoded document."""
    p = _TextExtractor()
    _feed_lenient(p, html_utf8)
    return "".join(p.parts)


def extract_text(html: bytes, content_type: str | None = None) -> str:
    """M4 + M6: decode then extract. THE byte-identity function."""
    return extract_text_str(decode_html(html, content_type))


class _PageParser(HTMLParser):
    """Fused text+link extractor — ONE parse per page. Semantics are
    identical to running _TextExtractor and _LinkExtractor separately
    (asserted in tests); used by the hot fetch/extract stage."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.parts: list[str] = []
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self.parts.append(data)


def _resolve_hrefs(hrefs: list[str], base_url: str) -> list[str]:
    out: list[str] = []
    for href in hrefs:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        try:
            resolved = urljoin(base_url, href)
            parts = urlsplit(resolved)
        except ValueError:
            continue
        if parts.scheme not in ("http", "https") or not parts.netloc:
            continue
        out.append(resolved)
    return out


def extract_page(
    html: bytes, base_url: str, content_type: str | None = None
) -> tuple[str, list[str]]:
    """M4+M6+M5 in one pass: (extracted_text, resolved_links)."""
    p = _PageParser()
    _feed_lenient(p, decode_html(html, content_type))
    return "".join(p.parts), _resolve_hrefs(p.hrefs, base_url)


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break


def extract_links(html: bytes, base_url: str, content_type: str | None = None) -> list[str]:
    """M5: every a[href] resolved against base_url, http(s) only, in
    document order. Junk (mailto:, javascript:, bare fragments, malformed)
    is dropped. Returns resolved (NOT canonicalized) URLs."""
    p = _LinkExtractor()
    _feed_lenient(p, decode_html(html, content_type))
    return _resolve_hrefs(p.hrefs, base_url)


# ---------------------------------------------------------------------------
# robots.txt (M11 / ST2)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RobotsRules:
    """Parsed robots.txt for the wildcard agent. Pinned subset: `User-agent:
    *` groups, `Disallow:` path prefixes, `Crawl-delay:` seconds. An empty
    Disallow value allows everything; `Disallow: /` blocks the host."""

    disallow: tuple[str, ...] = ()
    crawl_delay_ms: int = 0

    def allows(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        return not any(path.startswith(p) for p in self.disallow)

    def allows_url(self, url: str) -> bool:
        return self.allows(urlsplit(url).path or "/")


def parse_robots(body: str) -> RobotsRules:
    """Pinned parse: groups are runs of consecutive `User-agent:` lines
    followed by rule lines; a rule applies to us iff its group names `*`.
    A `User-agent:` line after rule lines starts a fresh group."""
    disallow: list[str] = []
    crawl_delay_ms = 0
    group_has_star = False
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:  # new group starts
                group_has_star = False
                in_agent_run = True
            group_has_star = group_has_star or val == "*"
        else:
            in_agent_run = False
            if not group_has_star:
                continue
            if key == "disallow":
                if val:
                    disallow.append(val)
            elif key == "crawl-delay":
                try:
                    # Clamp BEFORE int(): 'inf'/'1e308' would raise
                    # OverflowError inside int() and be silently ignored,
                    # while finite-large values clamped — inconsistent.
                    # Pinned: any parseable float clamps to [0, 1 day]
                    # (NaN -> 0: the nan > 0.0 comparison is False, so
                    # max keeps 0.0); unparseable text stays ignored.
                    f = min(86_400.0, max(0.0, float(val)))
                    crawl_delay_ms = int(f * 1000)
                except ValueError:
                    pass
    return RobotsRules(tuple(disallow), crawl_delay_ms)


def robots_allows(rules_body: str, url: str) -> bool:
    return parse_robots(rules_body).allows(urlsplit(url).path or "/")


# ---------------------------------------------------------------------------
# Politeness (ST3) — logical-time quota, no wall clock
# ---------------------------------------------------------------------------


def politeness_quota(
    crawl_delay_ms: int, rate_limit_ms: int, round_duration_ms: int, max_per_host: int
) -> int:
    """URLs a host may serve in one logical round: how many fetches fit in
    the round budget at the effective per-request spacing. Zero spacing ->
    the configured per-host cap."""
    eff = max(crawl_delay_ms, rate_limit_ms)
    if eff <= 0:
        return max_per_host
    return min(max_per_host, max(1, round_duration_ms // eff))


# ---------------------------------------------------------------------------
# Deterministic fetch fault model (M15)
# ---------------------------------------------------------------------------


def transient_failure(h: int, attempt: int, fail_permille: int) -> bool:
    """Seeded per-(url_hash, attempt) transient fetch failure — the logical
    analog of the reference's retry-able network errors."""
    if fail_permille <= 0:
        return False
    x = hashlib.sha1(f"fail:{h}:{attempt}".encode()).digest()
    return int.from_bytes(x[:2], "big") % 1000 < fail_permille


# ---------------------------------------------------------------------------
# Crawl config + ordering
# ---------------------------------------------------------------------------

SEQ_STRIDE = 10_000  # child seq = parent_seq * SEQ_STRIDE + link_index


def child_seq(parent_seq: int, link_index: int) -> int:
    """Deterministic discovery sequence number (SURVEY.md §4.3).

    (parent_seq + 1) * STRIDE + link_index is injective over distinct
    parents and link indices < STRIDE, and never collides with seed seqs
    (seed rank < STRIDE <= any child seq). The naive parent_seq * STRIDE
    form collides for parent_seq == 0 (seed 0's children would reuse the
    seed ranks). Valid while depth * log10(STRIDE) + log10(n_seeds) < 18.9
    (int64 range)."""
    return (parent_seq + 1) * SEQ_STRIDE + link_index


@dataclass
class CrawlConfig:
    max_rounds: int = 3
    max_depth: int = 8
    max_pages: int = 0  # I5: stop before a round once visits >= budget (0 = off)
    priority_default: int = 5
    # per-host priority overrides (e.g. derived from graphrank.host_pagerank):
    # applied at DISCOVERY time (seeds + extracted links) in both engines;
    # lower sorts first in the (priority, host, seq) crawl order.
    host_priorities: dict = field(default_factory=dict)
    rate_limit_ms: int = 0
    round_duration_ms: int = 60_000
    max_per_host_round: int = 10_000
    retries: int = 3
    fail_permille: int = 0
    # M10: fetched pages whose content_type matches none of these prefixes
    # get a visit row but are never parsed (no text, no links, no frontier
    # expansion); corpora without a content_type column are all-HTML.
    allowed_content_types: tuple[str, ...] = ("text/html",)
    user_agents: tuple[str, ...] = ("raycrawl/1.0",)
    seen_shards: int = 8
    num_partitions: int = 16
    extra: dict = field(default_factory=dict)


def visit_sort_key(priority: int, host: str, seq: int) -> tuple:
    """Total crawl order within a round (O1): (priority, host, seq)."""
    return (priority, host, seq)
