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
