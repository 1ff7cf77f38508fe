"""Training-data preparation pipeline — the composite showcase:

  documents -> language-ID -> quality gate -> token counting
            -> exact dedup -> MinHash near-dedup -> curated output

Each stage is the production operator from textproc/dedup; the pipeline is
a single lazy Dataset chain (one streaming pass) except the two dedup
keep-lists, which are computed once and broadcast as id sets. This is the
"what a 100 TB pretraining-corpus pipeline actually runs" surface the
brief asks for.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raycrawl import textproc
from raycrawl.dedup import minhash_dedup
from raycrawl.relational import q_dedup_exact


def prep_corpus(
    sf_dir: str,
    min_tokens: int = 10,
    min_quality: float = 0.2,
    near_dedup: bool = True,
) -> rd.Dataset:
    """Returns the curated documents Dataset with analysis columns:
    (doc_id, lang_pred, n_tokens, quality, keep_reasons...)."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    # keep-lists computed once, broadcast as id sets (no shuffle join)
    exact_keep = set(q_dedup_exact(sf_dir).to_pandas()["doc_id"])
    keep_ids = exact_keep
    if near_dedup:
        near_keep = set(minhash_dedup(sf_dir)["doc_id"].to_pylist())
        keep_ids = exact_keep & near_keep
    keep_ref = ray.put(keep_ids)

    def analyze(t: pa.Table) -> pa.Table:
        t = textproc.lang_id_batch(t)
        t = textproc.token_count_batch(t)
        t = textproc.quality_score_batch(t)
        keep = ray.get(keep_ref)
        mask = pc.and_(
            pc.and_(
                pa.array([i in keep for i in t["doc_id"].to_pylist()]),
                pc.greater_equal(t["n_tokens"], min_tokens),
            ),
            pc.greater_equal(t["quality"], min_quality),
        )
        return t.filter(mask).select(
            ["doc_id", "lang_pred", "n_tokens", "n_tokens_bpe", "quality"]
        )

    return docs.map_batches(analyze, batch_format="pyarrow", zero_copy_batch=True)
