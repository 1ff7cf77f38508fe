"""Unit tests for text analysis, dedup, similarity, and multimodal ops."""

import numpy as np
import pyarrow as pa
import pytest

from raycrawl import dedup, similarity, textproc
from tests.conftest import SF_DIR


class TestTextproc:
    def test_token_count(self):
        t = pa.table({"doc_id": [1, 2, 3], "text": ["a b  c", "", "one two, three!"]})
        out = textproc.token_count_batch(t)
        assert out["n_tokens"].to_pylist() == [3, 0, 3]
        assert out["n_tokens_bpe"].to_pylist() == [3, 0, 5]  # , and ! are tokens

    def test_quality_counts(self):
        t = pa.table({"doc_id": [1], "text": ["Ab C1 2!"]})
        out = textproc.quality_batch(t)
        assert out["n_chars2"].to_pylist() == [8]
        assert out["n_upper"].to_pylist() == [2]
        assert out["n_digit"].to_pylist() == [2]
        assert out["n_space"].to_pylist() == [2]

    def test_lang_id(self):
        assert textproc.lang_id("the cat and the dog sat in a house that is big") == "en"
        assert textproc.lang_id("der hund und die katze ist nicht ein tier mit") == "de"
        assert textproc.lang_id("le chat et la maison est pour les gens dans une") == "fr"
        assert textproc.lang_id("这是一个中文测试文本，用来测试语言识别。") == "zh"
        assert textproc.lang_id("") == "und"
        assert textproc.lang_id("xyzzy qwerty") == "und"

    def test_fingerprint_stable_and_sensitive(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = "entirely different material about ray data pipelines " * 5
        assert textproc.fingerprint(a) == textproc.fingerprint(a)
        assert textproc.fingerprint(a) != textproc.fingerprint(b)
        # min-sampled fingerprint is ROBUST to a small append (by design —
        # that is what makes it a near-dup signal)
        assert textproc.fingerprint(a) == textproc.fingerprint(a + " tail")
        assert textproc.fingerprint("") == 0


class TestMinHash:
    def test_signature_similarity_tracks_jaccard(self):
        base = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
        near = base + "extra words at the end"
        far = "completely different content about spark and ray data pipelines " * 3
        s1 = dedup.minhash_signature(base)
        s2 = dedup.minhash_signature(near)
        s3 = dedup.minhash_signature(far)
        sim_near = (s1 == s2).mean()
        sim_far = (s1 == s3).mean()
        assert sim_near > 0.6
        assert sim_far < 0.2

    def test_components_keep(self):
        keep = dedup._components_keep([1, 2, 3, 4, 5], [(1, 2), (2, 3)])
        assert keep == [1, 4, 5]

    def test_minhash_dedup_finds_planted_dups(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
        rows = {
            "doc_id": [0, 1, 2, 3],
            "text": [base, base + " tiny tail", "unrelated words entirely " * 10, base],
        }
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(pa.table(rows), str(d / "documents.parquet"))
        out = dedup.minhash_dedup(str(d), threshold=0.5)
        assert sorted(out.to_pandas()["doc_id"]) == [0, 2]

    def test_ngram_jaccard(self):
        assert dedup.ngram_jaccard("a b c d e", "a b c d e") == 1.0
        assert dedup.ngram_jaccard("a b c d e", "x y z w v") == 0.0
        assert dedup.ngram_jaccard("", "") == 1.0


class TestSimHash:
    def test_simhash_near_for_near_docs(self):
        base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
        h1 = dedup.simhash(base)
        h2 = dedup.simhash(base + " tail")
        h3 = dedup.simhash("entirely different material about databases " * 6)
        ham12 = bin(h1 ^ h2).count("1")
        ham13 = bin(h1 ^ h3).count("1")
        assert ham12 < 10
        assert ham13 > 15
        assert dedup.simhash("") == 0

    def test_simhash_dedup_exact_dups(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        base = "the quick brown fox jumps over the lazy dog and runs far " * 4
        rows = {"doc_id": [0, 1, 2], "text": [base, base, "other stuff " * 20]}
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(pa.table(rows), str(d / "documents.parquet"))
        out = dedup.simhash_dedup(str(d))
        assert sorted(out.to_pandas()["doc_id"]) == [0, 2]

    def test_banding_dispatch_paths_equivalent(
        self, ray_session, tmp_path, monkeypatch
    ):
        """The driver-local and distributed banding-bucket paths (hybrid
        size dispatch, BAND_ROWS_DRIVER_MAX) must produce identical kept
        sets for minhash, jaccard, and simhash on a corpus with planted
        near-dups, exact dups, and distinct docs."""
        import pyarrow.parquet as pq

        base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
        rows = {
            "doc_id": list(range(6)),
            "text": [
                base,
                base + " tiny tail",
                "unrelated words entirely " * 12,
                base,
                "another distinct body of text about ray pipelines " * 8,
                base.replace("lazy", "sleepy", 1),
            ],
        }
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(pa.table(rows), str(d / "documents.parquet"))

        def kept_sets():
            return {
                "minhash": sorted(
                    dedup.minhash_dedup(str(d), threshold=0.5).to_pandas()["doc_id"]
                ),
                "jaccard": sorted(
                    dedup.jaccard_dedup(str(d), threshold=0.5).to_pandas()["doc_id"]
                ),
                "simhash": sorted(
                    dedup.simhash_dedup(str(d)).to_pandas()["doc_id"]
                ),
            }

        local = kept_sets()  # default threshold >> 6 docs -> driver-local
        monkeypatch.setattr(dedup, "BAND_ROWS_DRIVER_MAX", 0)
        dist = kept_sets()  # forced through the banding shuffle
        assert local == dist
        assert local["minhash"][0] == 0 and 2 in local["minhash"]


class TestSimilarity:
    def test_ann_topk_matches_numpy_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        out = similarity.ann_topk(SF_DIR, k=3, n_queries=4).to_pandas()
        full = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        ids = np.array(full["vec_id"].to_pylist())
        m = similarity._normalize(similarity._emb_matrix(full))
        for q in range(4):
            qv = m[ids == q][0]
            scores = m @ qv
            order = sorted(zip(-scores, ids), key=lambda x: (x[0], x[1]))
            want = [int(i) for s, i in order if i != q][:3]
            got = out[out.query_id == q].sort_values("rank")["neighbor_id"].tolist()
            assert got == want

    def test_lsh_recall_reasonable(self, ray_session):
        exact = similarity.ann_topk(SF_DIR, k=5, n_queries=5).to_pandas()
        approx = similarity.ann_topk_lsh(SF_DIR, k=5, n_queries=5, probes=6).to_pandas()
        hits = 0
        for q in range(5):
            e = set(exact[exact.query_id == q]["neighbor_id"])
            a = set(approx[approx.query_id == q]["neighbor_id"])
            hits += len(e & a)
        assert hits / 25 >= 0.4  # LSH trades recall for pruning

    def test_embedding_neardup_keeps_all_when_no_dups(self, ray_session):
        out = similarity.embedding_neardup(SF_DIR, threshold=0.999)
        import pyarrow.parquet as pq

        n = pq.read_table(f"{SF_DIR}/embeddings.parquet").num_rows
        assert out.count() == n  # random vectors: no near-identical pairs


class TestMultimodal:
    def test_png_roundtrip_all_filters(self):
        """encode -> decode is the identity for every filter type, both
        channel counts, and degenerate 1-pixel-wide/high shapes."""
        from raycrawl import multimodal as mm

        rng = np.random.RandomState(3)
        shapes = [(1, 1), (1, 17), (17, 1)] + [
            (rng.randint(2, 40), rng.randint(2, 40)) for _ in range(12)
        ]
        for h, w in shapes:
            for c in (1, 3):
                arr = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
                filts = rng.randint(0, 5, size=h).tolist()
                dec = mm.png_decode(mm.png_encode(arr, row_filters=filts))
                assert dec.shape == (h, w, c)
                assert np.array_equal(dec, arr)

    def test_png_decode_rejects_corruption(self):
        from raycrawl import multimodal as mm

        good = mm.synth_png(0)
        with pytest.raises(ValueError):
            mm.png_decode(b"JFIF" + good[4:])  # bad signature
        bad = bytearray(good)
        bad[40] ^= 0xFF  # flip an IDAT byte -> CRC mismatch
        with pytest.raises(ValueError):
            mm.png_decode(bytes(bad))

    def test_wav_roundtrip(self):
        """encode -> decode is the identity for mono/stereo and degenerate
        1-frame clips, including extreme sample values."""
        from raycrawl import multimodal as mm

        rng = np.random.RandomState(5)
        for frames in (1, 2, 17, 301):
            for c in (1, 2):
                arr = rng.randint(-32768, 32768, size=(frames, c)).astype(np.int16)
                arr[0, :] = -32768
                arr[-1, :] = 32767
                dec, rate = mm.wav_decode(mm.wav_encode(arr, 11025))
                assert rate == 11025
                assert dec.shape == (frames, c)
                assert np.array_equal(dec, arr)

    def test_wav_decode_rejects_corruption(self):
        from raycrawl import multimodal as mm

        good = mm.synth_wav(1)
        with pytest.raises(ValueError):
            mm.wav_decode(b"FORM" + good[4:])  # bad RIFF magic
        with pytest.raises(ValueError):
            mm.wav_decode(good[:-3])  # truncated data chunk
        bad = bytearray(good)
        bad[20] = 3  # fmt tag -> IEEE float, not PCM
        with pytest.raises(ValueError):
            mm.wav_decode(bytes(bad))

    def test_decoded_synth_audio_matches_closed_form(self):
        """Same contract as the PNG path: the oracle's pattern never
        touches WAV bytes; the engine decode must reproduce it exactly."""
        from raycrawl import multimodal as mm

        for mid in range(1, 91, 3):
            dec, rate = mm.wav_decode(mm.synth_wav(mid))
            frames, c, want_rate = mm.synth_audio_shape(mid)
            assert rate == want_rate
            assert dec.shape == (frames, c)
            assert np.array_equal(dec, mm.synth_audio_samples(mid))

    def test_avi_roundtrip(self):
        """encode -> decode is the identity across every 4-byte stride
        padding case (w % 4 in 0..3) and frame counts including 1."""
        from raycrawl import multimodal as mm

        rng = np.random.RandomState(11)
        for w in (4, 5, 6, 7, 8):
            for n in (1, 3):
                arr = rng.randint(0, 256, size=(n, 9, w, 3)).astype(np.uint8)
                dec, fps = mm.avi_decode(mm.avi_encode(arr, fps=10))
                assert fps == 10
                assert dec.shape == arr.shape
                assert np.array_equal(dec, arr)

    def test_avi_decode_rejects_corruption(self):
        from raycrawl import multimodal as mm

        good = mm.synth_avi(2)
        with pytest.raises(ValueError):
            mm.avi_decode(b"RIFX" + good[4:])  # bad RIFF magic
        with pytest.raises(ValueError):
            mm.avi_decode(good[:8] + b"WAVE" + good[12:])  # wrong form type
        with pytest.raises(ValueError):
            mm.avi_decode(good[:-5])  # truncated movi frame

    def test_decoded_synth_video_matches_closed_form(self):
        from raycrawl import multimodal as mm

        for mid in range(2, 92, 3):
            frames, fps = mm.avi_decode(mm.synth_avi(mid))
            n, h, w, want_fps = mm.synth_video_shape(mid)
            assert fps == want_fps
            assert frames.shape == (n, h, w, 3)
            assert np.array_equal(frames, mm.synth_video_frames(mid))

    def test_decoded_synth_matches_closed_form(self):
        """The oracle's pattern never touches PNG bytes; the engine decode
        must reproduce it exactly (this is what the driver row checks)."""
        from raycrawl import multimodal as mm

        for mid in range(0, 90, 3):
            assert np.array_equal(
                mm.png_decode(mm.synth_png(mid)), mm.synth_image_pixels(mid)
            )

    def test_media_features_real_decode(self, ray_session):
        from raycrawl import multimodal, pyoracle

        out = (
            multimodal.media_pipeline(SF_DIR)
            .to_pandas()
            .sort_values("media_id", ignore_index=True)
        )
        assert len(out) == 500
        assert set(out["media_type"]) == {"image", "audio", "video"}
        assert (out["n_bytes"] > 0).all()
        img = out[out.media_type == "image"]
        assert (img["pixel_sum"] >= 0).all()
        aud = out[out.media_type == "audio"]
        assert (aud["height"] >= 8000).all()  # sample_rate column for audio
        vid = out[out.media_type == "video"]
        assert (vid["pixel_sum"] > 0).all()  # frame-sampled pixel sum
        assert (vid["channels"] >= 3).all()  # frame count for video
        want = (
            pyoracle.media_features(SF_DIR)
            .to_pandas()
            .sort_values("media_id", ignore_index=True)
        )
        assert out.reset_index(drop=True).equals(want[out.columns])

    def test_codec_roundtrip_fuzz(self):
        """Hypothesis: encode -> decode is the identity for arbitrary
        shapes and sample values across all three codecs (the feature
        stage's correctness reduces to this plus the closed-form sums)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from raycrawl import multimodal as mm

        rng = np.random.RandomState(17)

        @settings(max_examples=60, deadline=None)
        @given(
            st.integers(1, 24),  # h / frames
            st.integers(1, 24),  # w
            st.integers(0, 2),   # which codec
            st.integers(0, 2**31 - 1),
        )
        def check(a, b, codec, seed):
            r = np.random.RandomState(seed % 2**31)
            if codec == 0:
                c = 1 if seed % 2 == 0 else 3
                arr = r.randint(0, 256, size=(a, b, c)).astype(np.uint8)
                filts = r.randint(0, 5, size=a).tolist()
                assert np.array_equal(
                    mm.png_decode(mm.png_encode(arr, row_filters=filts)), arr
                )
            elif codec == 1:
                c = 1 if seed % 2 == 0 else 2
                arr = r.randint(-32768, 32768, size=(a * b, c)).astype(np.int16)
                dec, rate = mm.wav_decode(mm.wav_encode(arr, 8000 + b))
                assert rate == 8000 + b and np.array_equal(dec, arr)
            else:
                arr = r.randint(0, 256, size=(max(1, a // 4), a, b, 3)).astype(
                    np.uint8
                )
                dec, fps = mm.avi_decode(mm.avi_encode(arr, fps=1 + b))
                assert fps == 1 + b and np.array_equal(dec, arr)

        check()

    def test_codec_corruption_fuzz(self):
        """Hypothesis: random byte flips in real payloads either decode
        deterministically or raise ValueError — never crash another way
        (payloads are attacker-shaped bytes at crawl scale)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from raycrawl import multimodal as mm

        payloads = [mm.synth_png(0), mm.synth_wav(1), mm.synth_avi(2)]
        decoders = [mm.png_decode, mm.wav_decode, mm.avi_decode]

        @settings(max_examples=150, deadline=None)
        @given(st.integers(0, 2), st.integers(0, 10_000), st.integers(1, 255))
        def check(which, pos, flip):
            raw = bytearray(payloads[which])
            raw[pos % len(raw)] ^= flip
            try:
                decoders[which](bytes(raw))
            except ValueError:
                pass

        check()

    def test_actor_pool_path_matches_plain(self, ray_session):
        """actor_pool=True (the heavy-codec swap shape) must produce the
        identical feature table as the default plain-task path."""
        from raycrawl import multimodal

        ds = multimodal.synth_media_dataset(SF_DIR)
        cols = ["media_id", "n_bytes", "width", "height", "channels", "pixel_sum"]
        plain = (
            multimodal.media_features(ds)
            .select_columns(cols).to_pandas()
            .sort_values("media_id", ignore_index=True)
        )
        pooled = (
            multimodal.media_features(ds, actor_pool=True, concurrency=(1, 2))
            .select_columns(cols).to_pandas()
            .sort_values("media_id", ignore_index=True)
        )
        assert plain.equals(pooled)

    def test_decode_stub_unknown_type(self):
        from raycrawl.multimodal import _decode_stub

        with pytest.raises(NotImplementedError):
            _decode_stub(b"x", "hologram")


class TestEmbeddingLSH:
    def test_lsh_neardup_finds_planted_dups(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        rng = np.random.RandomState(7)
        base = rng.randn(20, 64)
        # vecs 20..24 are near-copies of 0..4 (tiny perturbation)
        dups = base[:5] + 0.001 * rng.randn(5, 64)
        m = np.vstack([base, dups])
        t = pa.table(
            {
                "vec_id": pa.array(range(25), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in m], pa.list_(pa.float32())
                ),
            }
        )
        d = tmp_path / "emb"
        d.mkdir()
        pq.write_table(t, str(d / "embeddings.parquet"))
        out = similarity.embedding_neardup_lsh(str(d), threshold=0.97)
        kept = sorted(out.to_pandas()["vec_id"])
        # every planted dup (20..24) dropped in favour of its min-id twin
        assert kept == list(range(20))

    def test_lsh_neardup_scaled_bits_still_finds_planted_dups(
        self, ray_session, tmp_path
    ):
        """The 100-TB knob: sharper bands (more bits => 2^bits buckets,
        O(1) expected occupancy) with more bands to hold recall. Planted
        near-copies collide in some band at any reasonable shape."""
        import pyarrow.parquet as pq

        rng = np.random.RandomState(11)
        base = rng.randn(20, 64)
        dups = base[:5] + 0.001 * rng.randn(5, 64)
        m = np.vstack([base, dups])
        t = pa.table(
            {
                "vec_id": pa.array(range(25), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in m], pa.list_(pa.float32())
                ),
            }
        )
        d = tmp_path / "emb"
        d.mkdir()
        pq.write_table(t, str(d / "embeddings.parquet"))
        out = similarity.embedding_neardup_lsh(
            str(d), threshold=0.97, bands=8, bits=12
        )
        kept = sorted(out.to_pandas()["vec_id"])
        assert kept == list(range(20))

    def test_lsh_neardup_keeps_all_when_no_dups(self, ray_session):
        out = similarity.embedding_neardup_lsh(SF_DIR, threshold=0.999)
        import pyarrow.parquet as pq

        n = pq.read_table(f"{SF_DIR}/embeddings.parquet").num_rows
        assert out.count() == n


class TestIVF:
    def test_ivf_recall_reasonable(self, ray_session):
        exact = similarity.ann_topk(SF_DIR, k=5, n_queries=5).to_pandas()
        approx = similarity.ann_topk_ivf(SF_DIR, k=5, n_queries=5, n_probe=8).to_pandas()
        hits = 0
        for q in range(5):
            e = set(exact[exact.query_id == q]["neighbor_id"])
            a = set(approx[approx.query_id == q]["neighbor_id"])
            hits += len(e & a)
        assert hits / 25 >= 0.4  # IVF trades recall for an ~n_probe/n_cells matmul

    def test_ivf_deterministic(self, ray_session):
        a = similarity.ann_topk_ivf(SF_DIR, k=3, n_queries=3)
        b = similarity.ann_topk_ivf(SF_DIR, k=3, n_queries=3)
        assert a.equals(b)


def test_pyoracle_union_find_drop():
    """pyoracle's independent union-find: non-min id per component."""
    from raycrawl.pyoracle import _union_find_drop

    # components {1,2,3} (chained), {10,11}, singleton pair-free 99
    drop = _union_find_drop([(2, 3), (1, 2), (10, 11)])
    assert drop == {2, 3, 11}
    assert _union_find_drop([]) == set()
    # order independence
    assert _union_find_drop([(1, 2), (2, 3)]) == _union_find_drop([(2, 3), (1, 2)])


def test_pyoracle_minhash_agrees_with_planted_dups(tmp_path):
    """The independent single-threaded minhash keep-set drops a planted
    near-duplicate and keeps distinct docs (sanity independent of the
    conformance comparison)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl import pyoracle

    base = "the quick brown fox jumps over the lazy dog again and again " * 20
    near = base.replace("lazy", "sleepy", 1)
    other = "completely different text about ray data pipelines " * 25
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, near, other], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    keep = pyoracle.dedup_minhash(str(tmp_path))["doc_id"].to_pylist()
    assert keep == [1, 3]


def test_jaccard_dedup_planted(ray_session, tmp_path):
    """True-Jaccard dedup drops a planted near-duplicate, keeps distinct
    docs, and matches the pyoracle expected keep set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl import pyoracle
    from raycrawl.dedup import jaccard_dedup

    base = "large scale web corpora need exact near duplicate removal " * 30
    near = base.replace("exact", "precise", 2)
    other = "unrelated content about arrow record batches and actors " * 30
    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": pa.array([base, near, other], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    keep = sorted(r["doc_id"] for r in jaccard_dedup(str(tmp_path)).take_all())
    assert keep == [7, 9]
    assert keep == pyoracle.dedup_jaccard(str(tmp_path))["doc_id"].to_pylist()


# ---------------------------------------------------------------------------
# vocabulary stats / splits / chunking / packing (round-3 additions)
# ---------------------------------------------------------------------------


def _write_doc_table(tmp_path, ids, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "vocab_docs"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        str(d / "documents.parquet"),
    )
    return str(d)


class TestWordTopk:
    def test_counts_and_tie_order(self, ray_session, tmp_path):
        from raycrawl import textproc

        sf = _write_doc_table(
            tmp_path, [1, 2], ["b a a\nc b", "a c b zz"]
        )
        out = textproc.word_topk(sf, k=3).to_pandas()
        # a=3 b=3 c=2 zz=1; tie a/b broken by word asc
        assert out["word"].tolist() == ["a", "b", "c"]
        assert out["n"].tolist() == [3, 3, 2]

    def test_re2_whitespace_pinning(self, ray_session, tmp_path):
        from raycrawl import textproc

        # \v is NOT whitespace under RE2 \s: "a\vb" must stay one token
        sf = _write_doc_table(tmp_path, [1], ["a\vb a\tb"])
        out = textproc.word_topk(sf, k=10).to_pandas()
        assert set(out["word"]) == {"a\vb", "a", "b"}


class TestHashSplit:
    def test_deterministic_and_matches_md5(self, ray_session, tmp_path):
        import hashlib

        from raycrawl import textproc

        ids = list(range(200))
        sf = _write_doc_table(tmp_path, ids, ["x"] * 200)
        out = textproc.hash_split(sf).to_pandas().sort_values("doc_id")
        for i, b, s in zip(out["doc_id"], out["bucket"], out["split"]):
            eb = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
            assert b == eb
            assert s == ("train" if eb < 90 else "val" if eb < 95 else "test")
        # roughly 90/5/5: all three splits must be populated at n=200
        assert set(out["split"]) == {"train", "val", "test"}


class TestChunkTokens:
    def test_boundaries_and_hashes(self, ray_session, tmp_path):
        import hashlib

        from raycrawl import textproc

        toks = [f"t{i}" for i in range(130)]
        sf = _write_doc_table(tmp_path, [7, 8], [" ".join(toks), ""])
        out = (
            textproc.chunk_tokens(sf)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        # 130 tokens / 64 -> chunks of 64, 64, 2; empty doc emits nothing
        assert out["doc_id"].tolist() == [7, 7, 7]
        assert out["n_tokens"].tolist() == [64, 64, 2]
        assert (
            out["tok_hash"][2]
            == hashlib.md5(" ".join(toks[128:]).encode()).hexdigest()
        )


class TestPackSequences:
    def test_cross_doc_packing_and_partition_tail(self, ray_session, tmp_path):
        import hashlib

        from raycrawl import textproc

        # partition 0: docs 0,1 (40+40=80 toks -> seqs of 64,16)
        # partition 1: doc 256 (10 toks -> one tail seq)
        t0 = [f"a{i}" for i in range(40)]
        t1 = [f"b{i}" for i in range(40)]
        t2 = [f"c{i}" for i in range(10)]
        sf = _write_doc_table(
            tmp_path, [0, 1, 256], [" ".join(t0), " ".join(t1), " ".join(t2)]
        )
        out = (
            textproc.pack_sequences(sf)
            .to_pandas()
            .sort_values(["part", "seq_idx"])
            .reset_index(drop=True)
        )
        assert out["part"].tolist() == [0, 0, 1]
        assert out["n_tokens"].tolist() == [64, 16, 10]
        # first sequence spans the doc boundary: 40 a-toks then 24 b-toks
        exp = " ".join(t0 + t1[:24])
        assert out["tok_hash"][0] == hashlib.md5(exp.encode()).hexdigest()

    def test_stitch_mode_conserves_tokens_and_merges_tails(
        self, ray_session, tmp_path
    ):
        """VERDICT r4 #8: mode='stitch' re-packs per-partition tails across
        STITCH_FAN-partition groups — full windows identical, total token
        count conserved exactly, at most one partial window per stitch
        group (vs one per partition)."""
        import hashlib

        from raycrawl import textproc

        # stitch group 0: partition 0 (docs 0,1: 80 toks -> full 64 +
        # tail 16) and partition 1 (doc 256: 10 toks -> tail 10);
        # stitch group 1: partition 256 (doc 65536: 70 toks -> full + tail 6)
        t0 = [f"a{i}" for i in range(40)]
        t1 = [f"b{i}" for i in range(40)]
        t2 = [f"c{i}" for i in range(10)]
        t3 = [f"d{i}" for i in range(70)]
        sf = _write_doc_table(
            tmp_path,
            [0, 1, 256, 65536],
            [" ".join(t0), " ".join(t1), " ".join(t2), " ".join(t3)],
        )
        part_mode = textproc.pack_sequences(sf).to_pandas()
        stitch = (
            textproc.pack_sequences(sf, mode="stitch")
            .to_pandas()
            .sort_values(["part", "seq_idx"])
            .reset_index(drop=True)
        )
        # exact token conservation across modes
        assert int(stitch["n_tokens"].sum()) == int(part_mode["n_tokens"].sum()) == 160
        # full windows byte-identical to partition mode
        full_keys = lambda df: set(  # noqa: E731
            map(
                tuple,
                df[df["n_tokens"] == 64][["part", "seq_idx", "tok_hash"]].values,
            )
        )
        assert full_keys(stitch) == full_keys(part_mode) != set()
        # stitched rows: group 0 merges the 16-tok and 10-tok tails (part
        # order pinned), group 1 carries its lone 6-tok tail
        st = stitch[stitch["part"] < 0]
        assert st["part"].tolist() == [-2, -1]
        assert st["n_tokens"].tolist() == [6, 26]
        merged = " ".join((t0 + t1)[64:] + t2)
        assert (
            st[st["part"] == -1]["tok_hash"].iloc[0]
            == hashlib.md5(merged.encode()).hexdigest()
        )
        # waste bound: one partial per stitch group, vs two in partition mode
        assert (stitch["n_tokens"] < 64).sum() == 2  # one per stitch group
        assert (part_mode["n_tokens"] < 64).sum() == 3

    def test_stitch_mode_conserves_tokens_on_sf(self, ray_session):
        """Natural-data conservation at sf0.001: both modes emit exactly
        the corpus token count; stitch emits no more partials than
        stitch groups."""
        from raycrawl import textproc

        a = textproc.pack_sequences(SF_DIR).to_pandas()
        b = textproc.pack_sequences(SF_DIR, mode="stitch").to_pandas()
        assert int(a["n_tokens"].sum()) == int(b["n_tokens"].sum()) > 0
        n_groups = b[b["part"] < 0]["part"].nunique()
        assert (b["n_tokens"] < textproc.CHUNK_SEQ_LEN).sum() <= max(n_groups, 1)


class TestTfidfTopk:
    def test_rare_term_outranks_common(self, ray_session, tmp_path):
        from raycrawl import textproc

        # "common" appears in all docs (df=3); "rare" only in doc 1 (df=1).
        # With equal tf, the rare term must rank first.
        sf = _write_doc_table(
            tmp_path,
            [1, 2, 3],
            ["common rare common rare", "common filler", "common other"],
        )
        out = (
            textproc.tfidf_topk(sf, k=2)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        d1 = out[out["doc_id"] == 1]
        assert d1["term"].tolist() == ["rare", "common"]
        assert d1["tf"].tolist() == [2, 2]
        assert d1["df"].tolist() == [1, 3]
        assert d1["rank"].tolist() == [1, 2]

    def test_score_is_integer_exact(self, ray_session, tmp_path):
        from raycrawl import textproc

        # tie on score must break by term asc: x and y both tf=1 df=1
        sf = _write_doc_table(tmp_path, [1, 2], ["y x", "z"])
        out = textproc.tfidf_topk(sf, k=3).to_pandas()
        d1 = out[out["doc_id"] == 1].sort_values("rank")
        assert d1["term"].tolist() == ["x", "y"]


class TestTfidfJoinPath:
    def test_join_path_equals_broadcast_path(self, ray_session, tmp_path):
        """driver_max_vocab=0 forces the distributed join scoring; output
        must be identical to the broadcast default, including the exact
        hapax (df=1) rule and score/term tie-breaks."""
        from raycrawl import textproc

        sf = _write_doc_table(
            tmp_path,
            [1, 2, 3, 4, 5],
            [
                "common rare common rare extra",   # hapax rare/extra
                "common filler tied1 tied2",       # tie -> term asc
                "common other filler",
                "",                                # empty doc: no rows
                "solo",                            # whole doc hapax
            ],
        )

        def run(threshold):
            return (
                textproc.tfidf_topk(sf, k=3, driver_max_vocab=threshold)
                .to_pandas()
                .sort_values(["doc_id", "rank"])
                .reset_index(drop=True)
            )

        broadcast = run(textproc.TFIDF_DRIVER_MAX)
        joined = run(0)
        assert joined.equals(broadcast), (joined, broadcast)
        # sanity on the fixture itself: hapax terms really scored df=1
        assert (broadcast[broadcast["term"] == "rare"]["df"] == 1).all()
        assert 4 not in set(broadcast["doc_id"])
