"""Training-data preparation pipeline — the composite showcase:

  documents -> language-ID -> quality gate -> token counting
            -> exact dedup -> MinHash near-dedup -> curated output

Each stage is the production operator from textproc/dedup; the pipeline is
a single lazy Dataset chain (one streaming pass) except the two dedup
drop collections, which are computed once and — per the hybrid size
dispatch in dedup — broadcast as id sets below the caps or applied as
anti-join stages above them. This is the "what a 100 TB pretraining-
corpus pipeline actually runs" surface the brief asks for.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raycrawl import textproc
from raycrawl.dedup import _apply_drop, _exact_dup_drop, _minhash_drop


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

    # DROP collections computed once: set-shaped ones fold into one
    # broadcast is_in; Dataset-shaped ones (web-scale dup density) chain
    # as anti-join stages after the analysis pass.
    drop_ids: set[int] = set()
    drop_datasets = []
    for d in (
        _exact_dup_drop(sf_dir),
        _minhash_drop(sf_dir) if near_dedup else set(),
    ):
        if isinstance(d, set):
            drop_ids |= d
        else:
            drop_datasets.append(d)
    drop_ref = ray.put(pa.array(sorted(drop_ids), pa.int64()))

    class Analyze:
        def __init__(self, dref):
            self.drop = ray.get(dref) if isinstance(dref, ray.ObjectRef) else dref

        def __call__(self, t: pa.Table) -> pa.Table:
            t = textproc.lang_id_batch(t)
            t = textproc.token_count_batch(t)
            t = textproc.quality_score_batch(t)
            keep = (
                pc.invert(pc.is_in(t["doc_id"], value_set=self.drop))
                if len(self.drop)
                else pa.array([True] * t.num_rows)
            )
            mask = pc.and_(
                pc.and_(keep, pc.greater_equal(t["n_tokens"], min_tokens)),
                pc.greater_equal(t["quality"], min_quality),
            )
            return t.filter(mask).select(
                ["doc_id", "lang_pred", "n_tokens", "n_tokens_bpe", "quality"]
            )

    out = docs.map_batches(
        Analyze, fn_constructor_args=(drop_ref,),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, int(ray.cluster_resources().get("CPU", 8))),
    )
    for d in drop_datasets:
        out = _apply_drop(out, d, "doc_id")
    return out
