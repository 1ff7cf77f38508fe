"""Unit tests for the corpus-curation operators (curate.py): C4-style
line dedup, Gopher rules, benchmark decontamination, PII redaction.
Engine-vs-pyoracle equality at corpus scale is covered by
test_conformance.py (every queries() entry); these pin the semantics on
crafted inputs."""

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl import curate


def _write_docs(tmp_path, ids, texts):
    d = tmp_path / "docs"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        str(d / "documents.parquet"),
    )
    return str(d)


class TestLineDedup:
    def test_cross_doc_dup_kept_at_first_occurrence(self, ray_session, tmp_path):
        sf = _write_docs(
            tmp_path,
            [0, 1, 2],
            [
                "alpha one\nshared line here\nbeta",
                "shared line here\ngamma two",
                "delta\nshared line here",
            ],
        )
        out = (
            curate.dedup_lines(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["text"].tolist() == [
            "alpha one\nshared line here\nbeta",
            "gamma two",
            "delta",
        ]
        assert out["n_dropped"].tolist() == [0, 1, 1]
        assert out["n_kept"].tolist() == [3, 1, 1]

    def test_within_doc_dup_and_blank_lines_kept(self, ray_session, tmp_path):
        sf = _write_docs(
            tmp_path, [5], ["same line\n\nsame line\n   \nsame line\nother"]
        )
        out = curate.dedup_lines(sf).to_pandas()
        # blank / whitespace-only lines never dedup; first occurrence wins
        assert out["text"].tolist() == ["same line\n\n   \nother"]
        assert out["n_dropped"].tolist() == [2]

    def test_matches_pyoracle_on_crafted_corpus(self, ray_session, tmp_path):
        from raycrawl import pyoracle

        sf = _write_docs(
            tmp_path,
            [3, 7, 9],
            ["x\ny\nz", "y\nq\nx", "z\nz\nnew"],
        )
        eng = (
            curate.dedup_lines(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ora = pyoracle.dedup_lines(sf).to_pandas()
        assert eng.equals(ora)

    def test_join_path_equals_broadcast_path(self, ray_session, tmp_path):
        """driver_max_winners=0 forces the distributed join rewrite; it
        must produce byte-identical output to the broadcast default (and
        therefore to pyoracle)."""
        import ray.data as rd

        from raycrawl import pyoracle

        ids = list(range(8))
        texts = [
            "alpha one\nshared line here\nbeta",
            "shared line here\ngamma two",
            "delta\nshared line here",
            "same line\n\nsame line\n   \nsame line\nother",
            "unique only\nnothing repeats",
            "",           # empty doc
            "shared line here",   # whole doc is a losing occurrence
            "tail\nalpha one",    # cross-doc dup of doc 0's first line
        ]
        sf = _write_docs(tmp_path, ids, texts)

        def run(threshold):
            docs = rd.read_parquet(sf + "/documents.parquet")
            return (
                curate.dedup_lines_ds(docs, driver_max_winners=threshold)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        broadcast = run(curate.LINE_DEDUP_DRIVER_MAX)
        joined = run(0)
        assert joined.equals(broadcast), (joined, broadcast)
        ora = pyoracle.dedup_lines(sf).to_pandas()
        assert broadcast.equals(ora)

    def test_curate_corpus_join_path_equivalent(self, ray_session, tmp_path, monkeypatch):
        """The composite pipeline must survive the join rewrite too (its
        line-dedup input is the gopher-filtered subset)."""
        from raycrawl import pyoracle

        sf = TestCurateCorpus()._corpus(tmp_path)
        monkeypatch.setattr(curate, "LINE_DEDUP_DRIVER_MAX", 0)
        eng = (
            curate.curate_corpus(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ora = pyoracle.curate_corpus(sf).to_pandas()
        assert eng.equals(ora)


class TestGopher:
    def _one(self, text):
        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
        return curate.gopher_batch(t).to_pylist()[0]

    def test_good_doc_passes(self):
        text = " ".join(f"word{i} item{i} thing{i}" for i in range(30))
        r = self._one(text)
        assert r["gopher_pass"] == 1
        assert r["n_words"] == 90
        assert r["n_dup_lines"] == 0

    def test_too_short_fails(self):
        assert self._one("only a few words here")["gopher_pass"] == 0

    def test_dup_lines_fail(self):
        line = "some repeated content line with plenty of words inside it"
        text = "\n".join([line] * 10)  # 9/10 dup lines >= 30%
        r = self._one(text)
        assert r["n_dup_lines"] == 9
        assert r["n_chars_dup_lines"] == 9 * len(line)
        assert r["gopher_pass"] == 0

    def test_repeated_2gram_fails(self):
        text = "badger badger " * 40  # top 2-gram dominates
        r = self._one(text.strip())
        assert 5 * r["top2_count"] > r["n_2grams"]
        assert r["gopher_pass"] == 0

    def test_symbol_density_fails(self):
        words = " ".join(f"word{i} extra{i}" for i in range(30))
        r = self._one(words + " " + "#" * 20)
        assert r["gopher_pass"] == 0

    def test_empty_doc(self):
        r = self._one("")
        assert r["n_words"] == 0 and r["gopher_pass"] == 0


class TestDecontaminate:
    def test_planted_overlap(self, ray_session, tmp_path):
        bench_text = "zero one two three four five six seven eight nine"
        filler = ["short filler"] * (curate.N_BENCH_DOCS - 1)
        # docs 0..19 are the benchmark; doc 20 is clean; doc 21 copies an
        # 8-gram from benchmark doc 0
        ids = list(range(curate.N_BENCH_DOCS + 2))
        texts = (
            [bench_text]
            + filler
            + ["completely unrelated material without any overlap at all whatsoever"]
            + ["prefix zero one two three four five six seven suffix"]
        )
        sf = _write_docs(tmp_path, ids, texts)
        out = (
            curate.decontaminate(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # benchmark doc 0 trivially overlaps itself (3 distinct 8-grams)
        assert out.loc[0, "contaminated"] == 1 and out.loc[0, "n_overlap"] == 3
        # short benchmark fillers have no 8-grams at all
        assert out.loc[1, "n_overlap"] == 0
        assert out.loc[curate.N_BENCH_DOCS, "contaminated"] == 0
        assert out.loc[curate.N_BENCH_DOCS + 1, "contaminated"] == 1
        assert out.loc[curate.N_BENCH_DOCS + 1, "n_overlap"] == 1


class TestPII:
    def _redact(self, texts):
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        out = curate.pii_batch(t)
        return out["text_redacted"].to_pylist(), out["n_redactions"].to_pylist()

    def test_email_ip_phone(self):
        texts = [
            "contact bob.smith+x@example.co.uk today",
            "server at 10.0.255.3 responded",
            "call +1-555-123-4567 or 555 987 6543",
            "no pii here at all",
            None,
        ]
        red, n = self._redact(texts)
        assert red[0] == "contact <EMAIL> today"
        assert red[1] == "server at <IP> responded"
        assert "<PHONE>" in red[2]
        assert red[3] == "no pii here at all"
        assert red[4] == ""
        assert n[3] == 0 and n[4] == 0

    def test_email_with_ip_host_redacts_email_first(self):
        # rules apply in order: the user@host email pattern does NOT match
        # a numeric TLD, so the IP inside survives to the IP pass
        red, n = self._redact(["mail user@192.168.1.1 now"])
        assert red[0] == "mail user@<IP> now"
        assert n[0] == 1

    def test_matches_python_re_oracle(self):
        """The Arrow/RE2 engine path must agree byte-for-byte with the
        Python-re orchestration pyoracle uses."""
        import re

        texts = [
            "a@b.com c@d.org overlapping 1.2.3.4.5 phone +123-456-7890x",
            "edge a@b.c (tld too short) but a@b.co works, ip 999.1.1.1",
            "dots... and #hash marks 127.0.0.1:8080",
        ]
        red, n = self._redact(texts)
        for i, s in enumerate(texts):
            m = 0
            for p, r in curate.PII_RULES:
                m += len(re.findall(p, s))
                s = re.sub(p, r, s)
            assert red[i] == s, f"row {i}"
            assert n[i] == m, f"row {i}"


class TestCurateCorpus:
    """End-to-end composite pipeline: gopher gate -> line dedup among
    survivors -> decontamination drop -> PII redact, engine vs pyoracle."""

    def _corpus(self, tmp_path):
        bench_secret = "zebra quag plume vortex ember lattice crag fjord"
        ids, texts = [], []
        # 20 "benchmark" docs (lowest doc_ids). All fail gopher (<50
        # words); doc 3 carries the 8-gram that real doc 30 will copy.
        for i in range(20):
            t = f"bench doc number {i} short"
            if i == 3:
                t = f"bench doc {i} " + bench_secret
            ids.append(i)
            texts.append(t)
        def words(tag, n):
            return " ".join(f"w{j}x{tag}" for j in range(n))
        # 25: fails gopher (too short) -> dropped at stage 1
        ids.append(25); texts.append(words(25, 10))
        # 30: passes gopher but contains the benchmark 8-gram -> dropped
        # at stage 3
        ids.append(30); texts.append(words(30, 52) + " " + bench_secret)
        # 31/32: share a line; 31 wins the dedup (lower doc_id)
        shared = "shared curated alpha beta gamma delta epsilon zeta"
        ids.append(31)
        texts.append(words("a31", 30) + "\n" + shared + "\n" + words("b31", 20))
        ids.append(32); texts.append(shared + "\n" + words(32, 50))
        # 33: clean doc with PII
        ids.append(33)
        texts.append(
            words(33, 55) + "\nmail bob@example.com or call +123-456-7890"
        )
        d = tmp_path / "docs"
        d.mkdir(exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_matches_pyoracle_end_to_end(self, ray_session, tmp_path):
        from raycrawl import pyoracle

        sf = self._corpus(tmp_path)
        eng = (
            curate.curate_corpus(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ora = pyoracle.curate_corpus(sf).to_pandas()
        assert eng.equals(ora), (eng, ora)
        # semantic spot checks: gopher drop, contamination drop, dedup
        # winner, PII redaction
        kept = eng["doc_id"].tolist()
        assert 25 not in kept and 30 not in kept
        assert {31, 32, 33} <= set(kept)
        row32 = eng[eng["doc_id"] == 32].iloc[0]
        assert row32["n_dropped_lines"] == 1
        assert "shared curated" not in row32["text"]
        row31 = eng[eng["doc_id"] == 31].iloc[0]
        assert "shared curated" in row31["text"]
        row33 = eng[eng["doc_id"] == 33].iloc[0]
        assert row33["n_redactions"] == 2
        assert "<EMAIL>" in row33["text"] and "<PHONE>" in row33["text"]

    def test_all_docs_gated_out_is_empty_not_crash(self, ray_session, tmp_path):
        # every doc fails gopher -> the whole downstream chain (line-hash
        # groupby, winner broadcast, contamination scan, finalize) runs on
        # an all-empty dataset; must degrade to count 0, not crash
        sf = _write_docs(
            tmp_path, [1, 2, 3], ["too short", "also short", "# # # tiny"]
        )
        assert curate.curate_corpus(sf).count() == 0


class TestVectorizedKernels:
    def test_ws_class_matches_python_isspace(self):
        """_WS_ONLY_RE must implement exactly `not line.strip()`: the
        char class is pinned to CPython's str.isspace over every
        codepoint (all Unicode whitespace lives in the BMP, but scan the
        full range anyway)."""
        import sys

        py = {c for c in map(chr, range(sys.maxunicode + 1)) if c.isspace()}
        assert py == set(curate._PY_WS_CHARS)

    def test_explode_matches_slow_reference(self):
        """Vectorized explode == the per-line reference loop (hash equal
        via the shared batch hasher; occ packing checked bit-exactly),
        including control-char whitespace, nulls and empty docs."""
        import pyarrow as pa

        t = pa.table(
            {
                "doc_id": pa.array([3, 4, 5, 6], pa.int64()),
                "text": [
                    "a\n \x1c\x1d\nb\n\nb",
                    None,
                    "",
                    " only\nmixed \x1f tail\n　",
                ],
            }
        )
        out = curate.line_explode_slim(t)
        # slow reference
        exp_lines, exp_occ = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for idx, line in enumerate((text or "").split("\n")):
                if not line.strip():
                    continue
                exp_lines.append(line)
                exp_occ.append((doc_id << curate._OCC_SHIFT) | idx)
        exp_hash = curate._line_hash_batch(pa.array(exp_lines, pa.string()))
        assert out["occ_key"].to_pylist() == exp_occ
        assert out["line_hash"].to_pylist() == list(exp_hash)

    def test_gopher_vectorized_matches_reference_loop(self):
        """The vectorized gopher kernel must equal the per-row reference
        loop (pyoracle's shape) field-for-field on crafted + randomized
        inputs: unicode/control whitespace, dup lines, bigram repeats,
        symbol runs, empty/null docs. Pure function — no Ray needed."""
        import random

        import pyarrow as pa

        def ref_row(x):
            x = x or ""
            words = x.split()
            nw, nwc = len(words), sum(len(w) for w in words)
            seen, ndup, cdup, nne = set(), 0, 0, 0
            lines = x.split("\n")
            for line in lines:
                if not line.strip():
                    continue
                nne += 1
                if line in seen:
                    ndup += 1
                    cdup += len(line)
                else:
                    seen.add(line)
            freq, top2 = {}, 0
            for ab in zip(words, words[1:]):
                freq[ab] = freq.get(ab, 0) + 1
                top2 = max(top2, freq[ab])
            n2 = max(0, nw - 1)
            nsym = x.count("#") + x.count("...")
            ok = (
                50 <= nw <= 100000 and 10 * ndup < 3 * max(1, nne)
                and 5 * top2 <= n2 and 3 * nw <= nwc <= 10 * nw
                and 10 * nsym <= nw
            )
            return dict(
                n_words=nw, n_word_chars=nwc, n_lines=len(lines),
                n_nonempty_lines=nne, n_dup_lines=ndup,
                n_chars_dup_lines=cdup, top2_count=top2, n_2grams=n2,
                n_symbols=nsym, gopher_pass=int(ok),
            )

        random.seed(7)
        texts = [
            "", None, "   ", "\x1c\x1d", "a b a b a b a b",
            "dup line\ndup line\ndup line\nother",
            "word " * 60, "héllo wörld héllo wörld\nhéllo wörld",
            "x\n\n\nx\n x \nx", "a" * 200, "... ... ... .....",
            " sep ", "　ideographic　space　",
            "tab\tsep\x0bvert\x0cff\rcr", "#" * 7 + " w1 w2 w3",
        ]
        vocab = ["aa", "bb", "cc", "dd", "#", "...", "x"]
        seps = [" ", "\n", "  ", "\n\n", "\t"]
        for _ in range(300):
            n = random.randint(0, 60)
            texts.append(
                "".join(
                    random.choice(vocab) + random.choice(seps)
                    for _ in range(n)
                )
            )
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        for row, text in zip(curate.gopher_batch(t).to_pylist(), texts):
            exp = ref_row(text)
            assert {k: row[k] for k in exp} == exp, (text, row)

    def test_gram_scan_matches_tuple_reference(self):
        """The vectorized 8-gram contamination scan must equal the
        word-TUPLE reference (pyoracle's identity) on crafted inputs:
        grams must never span documents, <NGRAM-word docs contribute
        nothing, repeated grams count once (distinct), and whitespace
        splitting matches Python str.split(). Pure function — the scan
        class accepts a raw numpy gram array, no Ray needed."""
        import numpy as np
        import pyarrow as pa

        n = curate.NGRAM
        bench_words = [f"w{i}" for i in range(n + 4)]  # 5 distinct 8-grams
        bench_text = " ".join(bench_words)
        bench_t = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": [bench_text]}
        )
        _d, gh = curate._gram_hash_arrays(bench_t)
        grams = np.unique(gh)
        assert len(grams) == 5  # all distinct -> no collisions here

        texts = [
            bench_text,                          # full overlap: 5
            " ".join(bench_words[:n]),           # exactly one gram: 1
            " ".join(bench_words[: n - 1]),      # 7 words: no gram: 0
            # spanning trap: first half of a bench gram ends this doc...
            " ".join(bench_words[: n // 2]),     # 0 (4 words)
            # ...and the second half starts this one -> must stay 0
            " ".join(bench_words[n // 2 : n]),   # 0 (4 words)
            ( " ".join(bench_words[:n]) + "\n" ) * 3,  # repeated gram: 1
            "",                                   # empty: 0
            None,                                 # null: 0
            "\t" + " ".join(bench_words[1 : n + 1]) + " 　",  # ws edges: 1
            " ".join(reversed(bench_words[:n])),  # order-sensitive: 0
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = curate._contam_scan_fn(grams)(t)

        bench_tuples = {
            tuple(bench_words[i : i + n])
            for i in range(len(bench_words) - n + 1)
        }
        for doc, text, got in zip(
            range(len(texts)), texts, out["n_overlap"].to_pylist()
        ):
            ws = (text or "").split()
            exp = len(
                {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}
                & bench_tuples
            )
            assert got == exp, (doc, text, got, exp)
        assert out["n_overlap"].to_pylist()[:6] == [5, 1, 0, 0, 0, 1]
