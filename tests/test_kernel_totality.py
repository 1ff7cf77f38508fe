"""Totality of the per-batch kernels on adversarial text (no Ray).

The pipelines feed these kernels raw web text; a crashing value poisons a
whole block at scale, so every kernel must be TOTAL over nulls, empties,
control bytes, surrogate-replaced unicode, long unbroken tokens and long
repetitive documents — and produce one output row per input row (or a
well-defined explode). The extractor/URL/robots primitives have their own
fuzz passes in test_core.py; this covers the batch layer above them.
"""

import numpy as np
import pyarrow as pa

from raycrawl import textproc
from raycrawl.curate import gopher_batch, gopher_gate, pii_batch
from raycrawl.dedup import minhash_batch, simhash_batch

ADVERSARIAL_TEXTS = [
    None,
    "",
    " ",
    "\n\n\n",
    "\x00\x01\x02",
    "��",
    "𝕌nic𝗈de 𝔱ext ¡ § 林檎 🍎",
    "a" * 5000,                      # one unbroken long token
    "word " * 3000,                  # long repetitive document
    "<![ garbage <!doctype <html>",
    "tab\tsep\x0bvtab\x0cff",        # \v is NOT RE2 \s — pinned split edge
    "email a@b.co phone 555-123-4567 ssn 000-00-0000",
    "line1\nline1\nline2\n" * 50,    # duplicated lines for the gopher rules
]


def _docs_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL_TEXTS)), pa.int64()),
            "text": pa.array(ADVERSARIAL_TEXTS, pa.string()),
        }
    )


ROW_KERNELS = [
    textproc.token_count_batch,
    textproc.quality_batch,
    textproc.quality_score_batch,
    textproc.lang_id_batch,
    textproc.fingerprint_batch,
    textproc.word_count_partial,     # explode: rows = distinct words
    textproc.hash_split_batch,
    textproc.chunk_tokens_batch,     # explode: rows = chunks
    minhash_batch,
    simhash_batch,
    gopher_batch,
    gopher_gate,                     # filter: rows <= input
    pii_batch,
]

ROW_PRESERVING = {
    textproc.token_count_batch, textproc.quality_batch,
    textproc.quality_score_batch, textproc.lang_id_batch,
    textproc.fingerprint_batch, textproc.hash_split_batch,
    minhash_batch, simhash_batch, gopher_batch, pii_batch,
}


def test_batch_kernels_total_and_deterministic():
    t = _docs_table()
    for fn in ROW_KERNELS:
        out1 = fn(t)
        out2 = fn(t)
        assert out1.equals(out2), f"{fn.__name__} not deterministic"
        if fn in ROW_PRESERVING:
            assert out1.num_rows == t.num_rows, (
                f"{fn.__name__}: {out1.num_rows} rows for {t.num_rows} inputs"
            )


def test_line_explode_total():
    from raycrawl.curate import line_explode_slim

    out = line_explode_slim(_docs_table())
    assert out.num_rows == line_explode_slim(_docs_table()).num_rows


def test_bpe_count_total():
    from raycrawl.bpe import BPETokenizer, train_bpe

    merges = train_bpe({"banana": 3, "band": 2, "ana": 5, "𝕌nic𝗈de": 1}, n_merges=32)
    tok = BPETokenizer(merges)
    for s in ADVERSARIAL_TEXTS:
        if s is None:
            continue
        assert tok.count_text(s.lower()) == tok.count_text(s.lower())
