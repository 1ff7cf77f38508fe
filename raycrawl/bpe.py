"""Deterministic byte-pair-encoding subword tokenizer (public algorithm:
Sennrich et al. 2015, "Neural Machine Translation of Rare Words with
Subword Units" — greedy most-frequent-pair merges over word pieces).

Why it exists: `textproc.token_count_batch`'s `n_tokens_bpe` was a regex
proxy; a training-data pipeline needs a real subword count. This module
keeps everything offline + deterministic (no network, no model files):

- `train_bpe(word_counts, n_merges)`: greedy merge training with a PINNED
  tie-break (count desc, then lexicographic pair) so the merge list is a
  pure function of the corpus sample.
- `BPETokenizer(merges)`: applies merges by rank; per-word results are
  memoized (vocabularies are tiny relative to token streams).

Ray shape: the vocab is trained ONCE on the driver from a bounded,
deterministic corpus sample (first `sample_docs` doc_ids), shipped via
`ray.put`, and each actor builds its tokenizer in `__init__` — never per
batch. Encoding is a dict-memoized per-word loop, amortizing to a hash
lookup per repeated word.
"""

from __future__ import annotations

import re
from collections import Counter

_WORD_RE = re.compile(r"\S+")
_EOW = "</w>"


def word_pieces(word: str) -> tuple[str, ...]:
    """Initial symbol sequence for a word: chars + end-of-word marker."""
    return tuple(word) + (_EOW,)


def train_bpe(word_counts: dict[str, int], n_merges: int = 512) -> list[tuple[str, str]]:
    """Greedy BPE training. Deterministic: the next merge is the pair with
    the highest count, ties broken by lexicographic pair order."""
    pieces: dict[tuple[str, ...], int] = {
        word_pieces(w): c for w, c in word_counts.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for seq, c in pieces.items():
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for seq, c in pieces.items():
            if best[0] not in seq:
                out[seq] = out.get(seq, 0) + c
                continue
            new: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            t = tuple(new)
            out[t] = out.get(t, 0) + c
        pieces = out
    return merges


class BPETokenizer:
    """Applies a trained merge list; `encode_word` is memoized per worker."""

    def __init__(self, merges: list[tuple[str, str]]) -> None:
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._cache: dict[str, int] = {}

    def encode_word(self, word: str) -> list[str]:
        seq = list(word_pieces(word))
        ranks = self.ranks
        while len(seq) > 1:
            best_rank, best_i = None, -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
        return seq

    def count_word(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            if len(self._cache) > 1_000_000:  # bound worker memory
                self._cache.clear()
            n = self._cache[word] = len(self.encode_word(word))
        return n

    def count_text(self, text: str) -> int:
        return sum(self.count_word(w) for w in _WORD_RE.findall(text))


def train_from_documents(
    sf_dir: str, n_merges: int = 512, sample_docs: int = 2000
) -> list[tuple[str, str]]:
    """Deterministic corpus-sample training: word counts over the
    `sample_docs` lowest doc_ids (sorted — file order independence). The
    sample comes from a bounded stats-ordered row-group read, never a
    full-table driver read."""
    import os

    from raycrawl.ioutil import read_lowest

    t = read_lowest(
        os.path.join(sf_dir, "documents.parquet"), "doc_id", sample_docs,
        ["doc_id", "text"],
    )
    counts: Counter = Counter()
    for x in t["text"].to_pylist():
        counts.update(_WORD_RE.findall((x or "").lower()))
    return train_bpe(dict(counts), n_merges)


def token_count_bpe(sf_dir: str, n_merges: int = 512):
    """queries() surface: per-doc REAL subword token counts. Vocab trained
    once on the driver, broadcast via ray.put; actors tokenize with a
    memoized per-word encoder. Rows-only (BPE is not SQL-expressible)."""
    import os

    import pyarrow as pa
    import ray
    import ray.data as rd

    from raycrawl.ioutil import cpu_pool

    merges_ref = ray.put(train_from_documents(sf_dir, n_merges))

    class CountTokens:
        def __init__(self, ref):
            m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.tok = BPETokenizer(m)

        def __call__(self, t: pa.Table) -> pa.Table:
            ns = [self.tok.count_text((x or "").lower()) for x in t["text"].to_pylist()]
            return pa.table(
                {"doc_id": t["doc_id"], "n_tokens_bpe": pa.array(ns, pa.int64())}
            )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        CountTokens, fn_constructor_args=(merges_ref,),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=cpu_pool(),
    )
