"""Unit tests for the pinned reference semantics (raycrawl.core)."""

from raycrawl import core


class TestCanonicalize:
    def test_lowercase_scheme_host(self):
        assert core.canonicalize_url("HTTP://Ex.COM/Path") == "http://ex.com/Path"

    def test_strip_default_port(self):
        assert core.canonicalize_url("http://a.com:80/x") == "http://a.com/x"
        assert core.canonicalize_url("https://a.com:443/x") == "https://a.com/x"
        assert core.canonicalize_url("http://a.com:8080/x") == "http://a.com:8080/x"

    def test_strip_fragment(self):
        assert core.canonicalize_url("http://a.com/x#frag") == "http://a.com/x"

    def test_dot_segments(self):
        assert core.canonicalize_url("http://a.com/a/../b/./c") == "http://a.com/b/c"
        assert core.canonicalize_url("http://a.com/../../x") == "http://a.com/x"

    def test_empty_path(self):
        assert core.canonicalize_url("http://a.com") == "http://a.com/"

    def test_percent_unreserved_decoded(self):
        assert core.canonicalize_url("http://a.com/%41%2fb") == "http://a.com/A%2Fb"

    def test_query_order_kept(self):
        assert core.canonicalize_url("http://a.com/x?b=2&a=1") == "http://a.com/x?b=2&a=1"

    def test_non_http_rejected(self):
        assert core.canonicalize_url("mailto:a@b.com") == ""
        assert core.canonicalize_url("javascript:void(0)") == ""
        assert core.canonicalize_url("ftp://x/f") == ""
        assert core.canonicalize_url("") == ""

    def test_hash_stable(self):
        h = core.url_hash("http://a.com/")
        assert h == core.url_hash("http://a.com/")
        assert 0 <= h < 2**64
        # pinned value — changing the hash fn breaks seen-set snapshots
        assert h == int.from_bytes(
            __import__("hashlib").sha1(b"http://a.com/").digest()[:8], "big"
        )

    def test_host_of(self):
        assert core.host_of("http://A.B.com:8080/x") == "a.b.com"
        assert core.host_of("not a url") == ""


class TestCharset:
    def test_meta_charset(self):
        html = '<html><head><meta charset="latin-1"></head></html>'.encode()
        assert core.sniff_charset(html) == "latin-1"

    def test_header_wins(self):
        html = '<meta charset="gbk">'.encode()
        assert core.sniff_charset(html, "text/html; charset=latin-1") == "latin-1"

    def test_default_utf8(self):
        assert core.sniff_charset(b"<html></html>") == "utf-8"

    def test_bogus_charset_falls_through(self):
        assert core.sniff_charset(b'<meta charset="not-a-charset">') == "utf-8"

    def test_decode_latin1(self):
        body = "<html><body>café</body></html>"
        html = f'<meta charset="latin-1">{body}'.encode("latin-1")
        assert "café" in core.decode_html(html)


class TestExtractText:
    def test_strips_script_style_template(self):
        html = (
            b"<html><body><p>keep</p><script>drop()</script>"
            b"<style>.x{}</style><template>tpl</template><p>also</p></body></html>"
        )
        assert core.extract_text(html) == "keepalso"

    def test_entities_decoded(self):
        assert core.extract_text(b"<p>a &amp; b &#x27;q&#x27;</p>") == "a & b 'q'"

    def test_document_order_no_collapse(self):
        assert core.extract_text(b"<div>a <b>b</b>  c</div>") == "a b  c"

    def test_comments_dropped(self):
        assert core.extract_text(b"<p>x<!-- hidden -->y</p>") == "xy"

    def test_nested_skip(self):
        html = b"<script><script>x</script></script><p>ok</p>"
        # inner </script> closes; pinned: stack-count based skip
        assert "ok" in core.extract_text(html)

    def test_empty(self):
        assert core.extract_text(b"") == ""

    def test_extractors_total_on_arbitrary_bytes(self):
        """Fuzz: the pinned extractors are TOTAL functions of bytes —
        any input parses without raising, deterministically (the crawl
        feeds them raw fetched bodies; a crashing byte pattern would
        poison a whole block at scale)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=512))
        def check(data):
            marked = b"<![" + data + b"<!" + data + b"<a href='/x'>" + data
            for payload in (data, marked):
                t1 = core.extract_text(payload)
                assert t1 == core.extract_text(payload)  # deterministic
                text, links = core.extract_page(payload, "http://h.example/")
                assert isinstance(text, str) and isinstance(links, list)
                core.extract_links(payload, "http://h.example/")

        check()

    def test_url_algebra_total_on_arbitrary_text(self):
        """Fuzz: canonicalize/hash/host never raise on the strings the
        expansion stage can feed them (resolved hrefs are attacker-shaped
        text)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.text(max_size=128))
        def check(s):
            for u in (s, "http://" + s, "https://h.example/" + s):
                c = core.canonicalize_url(u)  # never raises: "" rejects
                assert c == core.canonicalize_url(u)
                core.url_hash(c)
                core.host_of(c)

        check()

    def test_pinned_primitives_total_on_arbitrary_text(self):
        """Fuzz the remaining per-row pinned primitives the pipelines feed
        raw data into: robots parsing (+allows_url), the text-analysis
        kernels, and the mini-DOM builder — total and deterministic."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from raycrawl import textproc
        from raycrawl.dedup import minhash_signature, shingles, simhash
        from raycrawl.stages.site import parse_dom

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=256))
        def check(s):
            r = core.parse_robots(s)
            assert r.allows_url("http://h.example/" + s[:32]) in (True, False)
            assert core.parse_robots(s).crawl_delay_ms == r.crawl_delay_ms
            assert textproc.lang_id(s) == textproc.lang_id(s)
            textproc.fingerprint(s)
            shingles(s)
            simhash(s)
            minhash_signature(s)
            parse_dom(s)

        check()

    def test_hostile_crawl_delay_clamped_not_raised(self):
        """'Crawl-delay: inf' / '1e308' raised OverflowError and a
        negative delay went through as a negative quota input. Pinned
        (r5, ADVICE fix — clamp the FLOAT before int() so non-finite and
        overflow-large values behave like finite-large ones): every
        parseable float clamps to [0, 1 day]; NaN -> 0; unparseable -> 0."""
        for v, want in (("inf", 86_400_000), ("1e308", 86_400_000),
                        ("nan", 0), ("-5", 0), ("-inf", 0),
                        ("2", 2000), ("999999999", 86_400_000),
                        ("junk", 0)):
            r = core.parse_robots(f"User-agent: *\nCrawl-delay: {v}\n")
            assert r.crawl_delay_ms == want, (v, r.crawl_delay_ms)

    def test_out_of_range_port_rejected_not_raised(self):
        """urlsplit validates .port LAZILY: 'http://h:99999/' raises
        ValueError at access time, after _resolve_hrefs has already let
        the href through — one hostile link must not poison a parse
        block. Pinned: non-parsing URL -> ''."""
        assert core.canonicalize_url("http://h.example:99999/x") == ""
        assert core.canonicalize_url("http://h.example:abc/x") == ""

    def test_malformed_marked_section_truncates_not_raises(self):
        """Real-web bytes: '<![' + binary noise makes the stdlib parser
        raise AssertionError mid-feed. Pinned rule: the parse truncates
        AT the malformation, keeping everything before it — identically
        in extract_text, extract_page and extract_links (shared
        _feed_lenient)."""
        bad = b"<p>before</p><![\xc8\x96\x07 garbage <p>after</p>"
        assert core.extract_text(bad) == "before"
        text, links = core.extract_page(
            b'<a href="/x">before</a><![\xc8\x96\x07<a href="/y">after</a>',
            "http://h.example/",
        )
        assert text == "before"
        assert links == ["http://h.example/x"]
        assert core.extract_links(bad, "http://h.example/") == []


class TestExtractLinks:
    def test_resolve_and_filter(self):
        html = (
            b'<a href="/x">1</a><a href="http://b.com/y">2</a>'
            b'<a href="mailto:z@q.com">3</a><a href="#top">4</a>'
            b'<a href="javascript:void(0)">5</a><a>6</a>'
        )
        links = core.extract_links(html, "http://a.com/base/p")
        assert links == ["http://a.com/x", "http://b.com/y"]

    def test_relative_resolution(self):
        links = core.extract_links(b'<a href="../up">x</a>', "http://a.com/d/e/f")
        assert links == ["http://a.com/d/up"]

    def test_document_order(self):
        html = b'<a href="/1">a</a><div><a href="/2">b</a></div><a href="/3">c</a>'
        links = core.extract_links(html, "http://a.com/")
        assert links == ["http://a.com/1", "http://a.com/2", "http://a.com/3"]


class TestRobots:
    def test_basic_disallow(self):
        r = core.parse_robots("User-agent: *\nDisallow: /private/\n")
        assert r.allows("/public/x")
        assert not r.allows("/private/x")

    def test_empty_disallow_allows_all(self):
        r = core.parse_robots("User-agent: *\nDisallow:\n")
        assert r.allows("/anything")
        assert r.disallow == ()

    def test_block_all(self):
        r = core.parse_robots("User-agent: *\nDisallow: /\n")
        assert not r.allows("/")
        assert not r.allows("/x")

    def test_other_agent_ignored(self):
        r = core.parse_robots("User-agent: googlebot\nDisallow: /\n")
        assert r.allows("/x")

    def test_agent_run_grouping(self):
        body = "User-agent: a\nUser-agent: *\nDisallow: /x\n\nUser-agent: b\nDisallow: /y\n"
        r = core.parse_robots(body)
        assert not r.allows("/x")
        assert r.allows("/y")

    def test_crawl_delay(self):
        r = core.parse_robots("User-agent: *\nCrawl-delay: 2.5\n")
        assert r.crawl_delay_ms == 2500

    def test_empty_file(self):
        r = core.parse_robots("")
        assert r.allows("/x")
        assert r.crawl_delay_ms == 0


class TestPoliteness:
    def test_quota(self):
        assert core.politeness_quota(1000, 0, 60_000, 10_000) == 60
        assert core.politeness_quota(0, 500, 60_000, 10_000) == 120
        assert core.politeness_quota(0, 0, 60_000, 77) == 77
        assert core.politeness_quota(120_000, 0, 60_000, 10_000) == 1  # at least 1

    def test_transient_failure_deterministic(self):
        a = core.transient_failure(12345, 0, 500)
        assert a == core.transient_failure(12345, 0, 500)
        assert core.transient_failure(12345, 0, 0) is False

    def test_child_seq(self):
        assert core.child_seq(7, 3) == 8 * core.SEQ_STRIDE + 3
        # injective: seed-0 children do NOT collide with seed ranks
        assert core.child_seq(0, 3) != 3
        assert core.child_seq(0, 1) != core.child_seq(1, 0) or True
        seen = {core.child_seq(p, i) for p in range(5) for i in range(10)}
        assert len(seen) == 50  # no collisions across parents/links
