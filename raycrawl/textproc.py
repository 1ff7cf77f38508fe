"""Text analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are stateless, vectorized-per-batch `map_batches` transforms over the
`documents` table (or any string column). Regexes are compiled at module
import — once per worker process, not per batch.
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_UPPER_RE = re.compile(r"[A-Z]")
_DIGIT_RE = re.compile(r"[0-9]")
_CJK_RE = re.compile(r"[一-鿿぀-ヿ]")

# Tiny built-in stopword profiles for the n-gram/stopword language heuristic.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "des", "pour", "que", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "con", "para", "que", "por"},
}


def token_count_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace tokens (== regexp_split on \\s+ of trimmed text) plus a
    BPE-ish regex token count (\\w+ runs and single punctuation marks)."""
    texts = t[col].to_pylist()
    n_ws = [len(x.split()) if x else 0 for x in texts]
    n_bpe = [len(_WORD_RE.findall(x)) if x else 0 for x in texts]
    return t.append_column("n_tokens", pa.array(n_ws, pa.int64())).append_column(
        "n_tokens_bpe", pa.array(n_bpe, pa.int64())
    )


def quality_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Quality-signal counts. Integral outputs so oracles compare exactly;
    ratio-style scores derive from these downstream."""
    texts = t[col].to_pylist()
    n_chars, n_upper, n_digit, n_space = [], [], [], []
    for x in texts:
        x = x or ""
        n_chars.append(len(x))
        n_upper.append(len(_UPPER_RE.findall(x)))
        n_digit.append(len(_DIGIT_RE.findall(x)))
        n_space.append(x.count(" "))
    return (
        t.append_column("n_chars2", pa.array(n_chars, pa.int64()))
        .append_column("n_upper", pa.array(n_upper, pa.int64()))
        .append_column("n_digit", pa.array(n_digit, pa.int64()))
        .append_column("n_space", pa.array(n_space, pa.int64()))
    )


def quality_score_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Composite heuristic quality score in [0,1]: penalizes very short
    docs, extreme mean word length, and high digit/punct density."""
    texts = t[col].to_pylist()
    scores = []
    for x in texts:
        x = x or ""
        toks = x.split()
        if not toks:
            scores.append(0.0)
            continue
        mean_len = sum(len(w) for w in toks) / len(toks)
        len_score = min(1.0, len(toks) / 50.0)
        word_score = 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
        digits = sum(c.isdigit() for c in x)
        digit_score = max(0.0, 1.0 - 5.0 * digits / max(1, len(x)))
        scores.append(round(len_score * word_score * digit_score, 6))
    return t.append_column("quality", pa.array(scores, pa.float64()))


def lang_id(text: str) -> str:
    """Deterministic heuristic language ID: CJK char ratio, then stopword
    profile overlap; 'und' (undetermined) when nothing matches."""
    if not text:
        return "und"
    sample = text[:2000]
    if len(_CJK_RE.findall(sample)) >= max(2, len(sample) // 50):
        return "zh"
    words = re.findall(r"[a-zà-ÿ]+", sample.lower())
    if not words:
        return "und"
    ws = set(words)
    best, best_n = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        n = len(ws & prof)
        if n > best_n:
            best, best_n = lang, n
    return best if best_n >= 2 else "und"


def lang_id_batch(t: pa.Table, col: str = "text") -> pa.Table:
    preds = [lang_id(x) for x in t[col].to_pylist()]
    return t.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint(text: str, window: int = 8) -> int:
    """Winnowing-style document fingerprint: min-sampled rolling hash over
    token windows, xor-folded to 64 bits. Deterministic."""
    toks = text.split()
    if not toks:
        return 0
    hs = [
        int.from_bytes(hashlib.sha1(w.encode()).digest()[:8], "big")
        for w in toks
    ]
    if len(hs) <= window:
        acc = 0
        for h in hs:
            acc = (acc * 1099511628211 + h) % (1 << 64)
        return acc
    mins = []
    for i in range(len(hs) - window + 1):
        mins.append(min(hs[i : i + window]))
    acc = 0
    for m in set(mins):
        acc ^= m
    return acc


def fingerprint_batch(t: pa.Table, col: str = "text") -> pa.Table:
    fps = [fingerprint(x or "") for x in t[col].to_pylist()]
    return t.append_column("fingerprint", pa.array(fps, pa.uint64()))


# ---------------------------------------------------------------------------
# Dataset-level entry points (queries() registry surface)
# ---------------------------------------------------------------------------


def token_counts(sf_dir: str) -> rd.Dataset:
    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_tokens"])
    )


def text_quality(sf_dir: str) -> rd.Dataset:
    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_chars2", "n_upper", "n_digit", "n_space"])
    )


def language_id(sf_dir: str) -> rd.Dataset:
    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "lang_pred"])
    )


def fingerprints(sf_dir: str) -> rd.Dataset:
    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "fingerprint"])
    )


# ---------------------------------------------------------------------------
# vocabulary stats / dataset splits / sequence chunking
# ---------------------------------------------------------------------------

# Whitespace pinned to RE2 `\s` semantics ([\t\n\f\r ] — NO \v) so the
# engine agrees byte-for-byte with DuckDB's string_split_regex(text,'\s+')
# in the oracle SQL.
_RE2_WS = re.compile(r"[ \t\n\f\r]+")


def _split_re2_ws(text: str | None) -> list[str]:
    return [w for w in _RE2_WS.split(text or "") if w]


def word_count_partial(t: pa.Table, col: str = "text") -> pa.Table:
    """Combiner: per-batch word counts. Shrinks the groupby shuffle from
    total-token volume to distinct-words-per-batch — the partial/final
    shape every 100-TB wordcount needs."""
    from collections import Counter

    c: Counter[str] = Counter()
    for x in t[col].to_pylist():
        c.update(_split_re2_ws(x))
    return pa.table(
        {
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def word_topk(sf_dir: str, k: int = 100) -> rd.Dataset:
    """Global word-frequency top-k over the documents table: in-batch
    partial counts -> slim (word, n) groupby sum -> per-block top-k
    pruning -> deterministic (n desc, word asc) sort -> limit k. After
    the groupby each word lives in exactly one block, so the global
    top-k is contained in the union of per-block top-ks — the final
    sort sees at most k rows per block, never the whole vocabulary."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _docs_ds(sf_dir).map_batches(
        word_count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = ds.groupby("word").aggregate(Sum("n")).rename_columns({"sum(n)": "n"})

    def block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("word", "ascending")]
        )[:k]
        return t.take(idx)

    pruned = agg.map_batches(
        block_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return pruned.sort(["n", "word"], descending=[True, False]).limit(k)


def hash_split_batch(t: pa.Table) -> pa.Table:
    """Deterministic train/val/test assignment by md5(doc_id): decorrelated
    from id order, stable across runs/partitionings, no shuffle at all."""
    buckets, splits = [], []
    for i in t["doc_id"].to_pylist():
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        buckets.append(b)
        splits.append("train" if b < 90 else "val" if b < 95 else "test")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(splits, pa.string()),
        }
    )


def hash_split(sf_dir: str) -> rd.Dataset:
    return _docs_ds(sf_dir).map_batches(
        hash_split_batch, batch_format="pyarrow", zero_copy_batch=True
    )


CHUNK_SEQ_LEN = 64  # query-surface default; must match the oracle SQL


def chunk_tokens_batch(t: pa.Table, seq_len: int = CHUNK_SEQ_LEN) -> pa.Table:
    """Per-document fixed-length token chunking (the map-only flavor of
    training-sequence packing: no cross-doc packing, so it stays
    embarrassingly parallel; `pack_sequences` does the cross-doc fill).
    Emits md5 of the space-joined chunk so oracles hash-check content."""
    out_id, out_idx, out_n, out_h = [], [], [], []
    for doc_id, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = _split_re2_ws(x)
        for ci in range((len(toks) + seq_len - 1) // seq_len):
            seg = toks[ci * seq_len : (ci + 1) * seq_len]
            out_id.append(doc_id)
            out_idx.append(ci)
            out_n.append(len(seg))
            out_h.append(hashlib.md5(" ".join(seg).encode()).hexdigest())
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "tok_hash": pa.array(out_h, pa.string()),
        }
    )


def chunk_tokens(sf_dir: str) -> rd.Dataset:
    return _docs_ds(sf_dir).map_batches(
        chunk_tokens_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _docs_ds(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


PACK_PART_DOCS = 256  # docs per packing partition; must match the oracle SQL


# Boundary stitch (mode="stitch"): tails of STITCH_FAN consecutive
# partitions merge into one stitch group, cutting the waste bound from
# one partial sequence per PACK_PART_DOCS docs to one per
# PACK_PART_DOCS * STITCH_FAN (65,536) docs — so packing efficiency no
# longer degrades with partition count at scale. Tail payloads are tiny
# (< seq_len tokens each) and never leave the cluster.
STITCH_FAN = 256
_STITCH_PARTS = 64  # stitch-group hash partitions (partition-wise rule)


def pack_sequences(
    sf_dir: str, seq_len: int = CHUNK_SEQ_LEN, mode: str = "partition"
) -> rd.Dataset:
    """Cross-document training-sequence packing (GPT-style concat-and-cut):
    within each deterministic doc_id-range partition (PACK_PART_DOCS docs),
    concatenate token streams in doc_id order and cut fixed seq_len
    windows. Partition-local packing is the documented 100-TB tradeoff:
    global greedy packing is inherently sequential, while per-partition
    packing wastes at most one partial tail sequence per partition and
    keeps the only all-to-all a doc_id-range groupby — which is nearly a
    no-op shuffle when the input is already doc_id-ordered parquet.

    mode="partition" (default, the oracle-checked surface): the partial
    tail of each partition is emitted as its last (shorter) sequence.
    mode="stitch" (VERDICT r4 #8): full windows are identical, but the
    per-partition tails are re-packed across STITCH_FAN-partition groups
    (rows carry part = -(stitch_group + 1), seq_idx within the stitched
    stream), leaving at most one partial sequence per stitch group.
    Total token count is conserved exactly in both modes
    (equivalence-tested in tests/test_textproc_dedup.py)."""
    if mode not in ("partition", "stitch"):
        raise ValueError(f"unknown pack mode: {mode!r}")
    import pandas as pd
    import pyarrow.compute as pc

    stitch = mode == "stitch"

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        toks: list[str] = []
        for x in df["text"]:
            toks.extend(_split_re2_ws(x))
        part = int(df["part"].iloc[0])
        n_full = len(toks) // seq_len
        n_seq = n_full if stitch else (len(toks) + seq_len - 1) // seq_len
        segs = [toks[i * seq_len : (i + 1) * seq_len] for i in range(n_seq)]
        out = {
            "part": [part] * n_seq,
            "seq_idx": list(range(n_seq)),
            "n_tokens": [len(s) for s in segs],
            "tok_hash": [
                hashlib.md5(" ".join(s).encode()).hexdigest() for s in segs
            ],
        }
        if stitch:
            # tail row (seq_idx = -1): tokens ride space-joined — tokens
            # are \s+-split so they contain no space; the join/split
            # roundtrip is exact. Empty tails are not emitted.
            tail = toks[n_full * seq_len :]
            if tail:
                out["part"].append(part)
                out["seq_idx"].append(-1)
                out["n_tokens"].append(len(tail))
                out["tok_hash"].append("")
            tails = [""] * n_seq + ([" ".join(tail)] if tail else [])
            out["tail"] = tails
        return pd.DataFrame(
            {
                "part": pd.Series(out["part"], dtype="int64"),
                "seq_idx": pd.Series(out["seq_idx"], dtype="int64"),
                "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
                "tok_hash": pd.Series(out["tok_hash"], dtype="object"),
                **(
                    {"tail": pd.Series(out["tail"], dtype="object")}
                    if stitch
                    else {}
                ),
            }
        )

    ds = _docs_ds(sf_dir).map_batches(
        lambda t: t.append_column(
            "part", pc.divide(t["doc_id"], PACK_PART_DOCS)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    packed = ds.groupby("part").map_groups(pack, batch_format="pandas")
    if not stitch:
        return packed

    _OUT_COLS = ["part", "seq_idx", "n_tokens", "tok_hash"]

    def _full_rows(t: pa.Table) -> pa.Table:
        # fused filter+project (never a bare filter upstream of a
        # schema-changing step — zero-column empty-block rule, CLAUDE.md)
        if t.num_columns == 0:
            return t
        return t.filter(pc.greater_equal(t["seq_idx"], 0)).select(_OUT_COLS)

    def _tail_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        t = t.filter(pc.less(t["seq_idx"], 0))
        sg = pc.divide(t["part"], STITCH_FAN)  # stitch group
        t = t.append_column("sg", sg)
        return t.append_column(
            "stitch_part",
            pc.cast(
                pc.bit_wise_and(sg, pa.scalar(_STITCH_PARTS - 1, pa.int64())),
                pa.int32(),
            ),
        )

    def _stitch(df: pd.DataFrame) -> pd.DataFrame:
        # ONE hash partition of stitch groups: per-group concat of tails
        # in part order, cut seq_len windows; at most one partial window
        # per stitch group survives.
        parts, idxs, ns, hs = [], [], [], []
        df = df.sort_values(["sg", "part"], kind="mergesort")
        for sg, grp in df.groupby("sg", sort=False):
            toks: list[str] = []
            for s in grp["tail"]:
                if s:
                    toks.extend(s.split(" "))
            n_seq = (len(toks) + seq_len - 1) // seq_len
            for i in range(n_seq):
                seg = toks[i * seq_len : (i + 1) * seq_len]
                parts.append(-(int(sg) + 1))
                idxs.append(i)
                ns.append(len(seg))
                hs.append(hashlib.md5(" ".join(seg).encode()).hexdigest())
        return pd.DataFrame(
            {
                "part": pd.Series(parts, dtype="int64"),
                "seq_idx": pd.Series(idxs, dtype="int64"),
                "n_tokens": pd.Series(ns, dtype="int64"),
                "tok_hash": pd.Series(hs, dtype="object"),
            }
        )

    full = packed.map_batches(
        _full_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    stitched = (
        packed.map_batches(
            _tail_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("stitch_part")
        .map_groups(_stitch, batch_format="pandas")
    )
    return full.union(stitched)


TFIDF_SCALE = 1_000_000  # integer-exact score = tf * SCALE // df


class _TfidfScore:
    """map_batches stage: per-doc top-k TF-IDF terms against the broadcast
    (word, df) vocabulary (sorted-array searchsorted probe, built once per
    actor). Scoring is INTEGER arithmetic (tf * TFIDF_SCALE // df) so the
    ranking is bit-exact on both the engine and the DuckDB oracle — no
    cross-engine float log/compare hazards."""

    def __init__(self, vocab_ref, k: int) -> None:
        import ray

        words, dfs = (
            ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        )
        self.words = words  # sorted numpy object array, df >= 2 terms only
        self.dfs = dfs
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        from collections import Counter

        nw = len(self.words)
        out_id, out_term, out_tf, out_df, out_rank = [], [], [], [], []
        for doc_id, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tf = Counter(_split_re2_ws(x))
            if not tf:
                continue
            terms = np.array(list(tf.keys()), dtype=object)
            idx = np.searchsorted(self.words, terms)
            scored = []
            for w, i in zip(terms, idx):
                # Hapax rule (exact, not approximate): the broadcast
                # vocabulary carries df >= 2 terms only, so a term absent
                # from it occurs in precisely one document — this one.
                df = int(self.dfs[i]) if i < nw and self.words[i] == w else 1
                scored.append((-(tf[w] * TFIDF_SCALE // df), w, df))
            scored.sort()
            for rank, (_neg, w, df) in enumerate(scored[: self.k], start=1):
                out_id.append(doc_id)
                out_term.append(w)
                out_tf.append(tf[w])
                out_df.append(df)
                out_rank.append(rank)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "df": pa.array(out_df, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
            }
        )


# Hybrid size dispatch (same pattern as curate.LINE_DEDUP_DRIVER_MAX): a
# df>=2 vocabulary at or below this many terms broadcasts via ray.put;
# above it the vocabulary stays a Dataset and scoring runs through the
# distributed join path. Web-scale vocabularies are hapax-heavy, so the
# exact df==1 prune below typically halves the table before this check.
from raycrawl.dedup import _env_int as _thr_env

TFIDF_DRIVER_MAX = _thr_env("RAYCRAWL_TFIDF_DRIVER_MAX", 2_000_000)

_VOCAB_SCHEMA = pa.schema([("word", pa.string()), ("df", pa.int64())])


def tfidf_topk(
    sf_dir: str, k: int = 5, driver_max_vocab: int | None = None
) -> rd.Dataset:
    """Per-document top-k TF-IDF terms, two distributed passes:

    1. document frequency — per-batch DISTINCT-word doc counts (combiner)
       -> slim (word, df) groupby sum, then an EXACT df==1 prune: a term
       absent from the pruned vocabulary occurs in exactly one document —
       the one being scored — so its df is known to be 1 without shipping
       it. The surviving df>=2 table is size-dispatched: broadcast via
       ray.put at or below TFIDF_DRIVER_MAX terms, else it stays a
       Dataset and scoring runs through `_tfidf_join_path` (no driver
       materialization that grows with vocabulary size).
    2. scoring — broadcast path: one streaming map_batches pass (per-doc
       TF is local); join path: slim (doc_id, word, tf) explode ⋈ vocab
       on word, then a per-doc top-k groupby.

    Ranking uses integer score tf * TFIDF_SCALE // df (ties -> term asc),
    exactly reproducible in SQL. Both paths are equivalence-tested."""
    import numpy as np
    import ray
    import pyarrow.compute as pc
    from collections import Counter
    from ray.data.aggregate import Sum

    from raycrawl.ioutil import nonempty_blocks

    if driver_max_vocab is None:  # resolved at call time (tests patch it)
        driver_max_vocab = TFIDF_DRIVER_MAX

    docs = _docs_ds(sf_dir)

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for x in t["text"].to_pylist():
            c.update(set(_split_re2_ws(x)))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "nd": pa.array(list(c.values()), pa.int64()),
            }
        )

    # Materialize the slim post-aggregation vocabulary so the size probe
    # and the chosen scoring path share one execution; prune 0-row blocks
    # (the df>1 filter is skipped on empty agg blocks and would leak
    # zero-column blocks into the join otherwise).
    vocab_ds = nonempty_blocks(
        docs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("nd", alias_name="df"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["df"], 1)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize(),
        _VOCAB_SCHEMA,
    )
    if vocab_ds.count() > driver_max_vocab:
        return _tfidf_join_path(docs, vocab_ds, k)
    # Dataset.to_pandas drops columns on an ALL-EMPTY dataset (all-hapax
    # corpus) — go through the typed Arrow schema instead.
    vocab = (
        pa.concat_tables(
            [_VOCAB_SCHEMA.empty_table()]
            + [b for b in vocab_ds.iter_batches(batch_format="pyarrow")]
        )
        .to_pandas()
        .sort_values("word", ignore_index=True)
    )
    vocab_ref = ray.put(
        (
            vocab["word"].to_numpy(dtype=object),
            vocab["df"].to_numpy(dtype=np.int64),
        )
    )
    return docs.map_batches(
        _TfidfScore,
        fn_constructor_args=(vocab_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, int(ray.cluster_resources().get("CPU", 8))),
    )


def _tfidf_explode(t: pa.Table) -> pa.Table:
    """(doc_id, word, tf) per distinct per-doc term — the slim join-path
    payload; text never enters the word-keyed exchange."""
    from collections import Counter

    ids, words, tfs = [], [], []
    for doc_id, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for w, n in Counter(_split_re2_ws(x)).items():
            ids.append(doc_id)
            words.append(w)
            tfs.append(n)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "word": pa.array(words, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )


def _tfidf_score_batch(t: pa.Table) -> pa.Table:
    """Integer score per (doc, term) row after the df join; null df means
    the term missed the df>=2 vocabulary — the exact hapax rule, df=1."""
    import pyarrow.compute as pc

    df = pc.fill_null(t["df"], 1)
    score = pc.divide(pc.multiply(t["tf"], TFIDF_SCALE), df)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "term": t["word"],
            "tf": t["tf"],
            "df": df,
            "score": score,
        }
    )


def _tfidf_join_path(docs: rd.Dataset, vocab: rd.Dataset, k: int) -> rd.Dataset:
    """Distributed TF-IDF for vocabularies too large to broadcast: the
    canonical two-exchange shape — a word-keyed left-outer join hands
    each (doc, term, tf) row its df (null -> hapax, df=1), then a
    doc-keyed groupby takes the per-document top-k. Every shuffled
    payload is (int64, word, int64)-slim; document text never moves."""
    import pandas as pd
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = max(2, ncpu // 2)
    terms = docs.map_batches(
        _tfidf_explode, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = terms.join(vocab, "left_outer", num_partitions=n_parts, on=("word",))
    scored = joined.map_batches(
        _tfidf_score_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    _P = 64

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        """Top-k for every doc in ONE doc_id-hash partition (partition-wise,
        not per-doc: one Python call per partition instead of one per
        document). Stable sort (doc_id, score desc, term asc) + cumcount<k
        == _TfidfScore's per-doc (score desc, term asc) tuple sort exactly
        (a doc's terms are distinct, so (score, term) is a total order)."""
        g = g.sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        pos = g.groupby("doc_id", sort=False).cumcount()
        out = g[pos < k][["doc_id", "term", "tf", "df"]].copy()
        out["rank"] = (pos[pos < k] + 1).to_numpy(dtype="int64")
        return out

    return (
        scored.map_batches(
            lambda t: t.append_column(
                "part", pc.cast(
                    pc.bit_wise_and(t["doc_id"], pa.scalar(_P - 1, pa.int64())),
                    pa.int32(),
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("part")
        .map_groups(part_topk, batch_format="pandas")
    )
