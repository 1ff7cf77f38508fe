"""Corpus-curation operators for large-scale training-data pipelines:
C4-style line-level dedup, Gopher-style repetition/quality rules,
benchmark decontamination (n-gram overlap), and PII redaction.

These complement the document-level near-dup family in `dedup.py` with the
line/n-gram-level hygiene passes a real pretraining pipeline runs (the
public C4 / Gopher / RefinedWeb recipes describe the semantics; all code
here is original). Scale shapes:

- `dedup_lines`: the only unconditional shuffle is a slim int64
  (line_hash, occ_key) groupby. The duplicated-line winner table is size-
  dispatched (`LINE_DEDUP_DRIVER_MAX`): at web-typical dup density it
  broadcasts via `ray.put` and the rewrite is a single streaming
  `map_batches` pass; past the threshold the winners STAY a Dataset and
  the rewrite runs through the distributed join path
  (`_dedup_lines_join_path`) — no driver-side materialization that grows
  with corpus size. Both paths are equivalence-tested.
- `gopher_quality`: stateless per-batch kernel, integer outputs only so
  the oracle comparison is exact.
- `decontaminate`: the benchmark n-gram set is built from a bounded
  `read_lowest` (row-group-pruned) read and broadcast once; the scan is a
  single `map_batches` pass with a sorted-array membership probe.
- `pii_redact`: pure vectorized Arrow (`replace_substring_regex` /
  `count_substring_regex` — RE2), zero Python-level row loops.

Packing assumption (documented per the brief): `dedup_lines` encodes a
line occurrence as `doc_id * 2**20 + line_idx`, i.e. doc_id < 2**43 and
< 2**20 lines per document — both hold with huge margin for a web corpus
sharded the way `gen_corpus`/TESTDATA.md shard theirs.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from raycrawl.ioutil import nonempty_blocks as _nonempty_blocks

_LOG = logging.getLogger(__name__)

_MASK63 = (1 << 63) - 1
_OCC_SHIFT = 20  # occ_key = doc_id << 20 | line_idx (see module docstring)


def _read_docs(sf_dir: str) -> rd.Dataset:
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
        override_num_blocks=4 * ncpu,
    )


# ---------------------------------------------------------------------------
# C4-style line-level dedup
# ---------------------------------------------------------------------------

# "Dedup-relevant" is pinned as Python's `not line.strip()` (the pyoracle
# rule). Vectorizing it needs the exact CPython str.isspace() character
# set, which is Unicode White_Space PLUS the \x1c-\x1f separator controls
# (RE2's \s and Arrow's utf8_trim_whitespace both miss the latter).
# test_curate.py scans every BMP codepoint against str.isspace to keep
# this class honest.
_PY_WS_CHARS = (
    "\t\n\x0b\x0c\r \x1c\x1d\x1e\x1f\x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
_WS_ONLY_RE = "^[" + _PY_WS_CHARS + "]*$"


def _doc_lines(t: pa.Table):
    """Vectorized per-doc line split: (flat line array, per-doc line
    counts, per-doc flat-start offsets, repeated doc_ids, line indices).
    Null text splits like "" (one empty line), matching pyoracle's
    `(text or "").split("\\n")`."""
    col = pc.fill_null(t.column("text"), "")
    la = pc.split_pattern(col, "\n")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten()
    counts = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts[:-1]))) if len(counts) else np.zeros(0, np.int64)
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    rep_ids = np.repeat(doc_ids, counts)
    line_idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    return flat, counts, starts, rep_ids, line_idx


def _line_hash_batch(flat: pa.Array) -> np.ndarray:
    """Vectorized 63-bit line identity (xxhash via polars, fixed seed —
    deterministic across worker processes for the pinned polars version).
    The hash is run-internal: pyoracle keys winners on raw line CONTENT,
    so any collision-free hash yields identical rewritten output, and a
    collision would surface as an oracle mismatch rather than hide."""
    import polars as pl

    if len(flat) == 0:
        return np.empty(0, np.int64)
    h = pl.from_arrow(flat).hash(seed=0).to_numpy()
    return (h & _MASK63).astype(np.int64)


def _ws_only_mask(flat: pa.Array) -> np.ndarray:
    return pc.match_substring_regex(flat, _WS_ONLY_RE).to_numpy(
        zero_copy_only=False
    )


def _join_kept_lines(kept_flat: pa.Array, kept_counts: np.ndarray) -> pa.Array:
    """Reassemble per-doc text from kept flat lines + per-doc counts."""
    offs = np.concatenate(([0], np.cumsum(kept_counts)))
    if pa.types.is_large_string(kept_flat.type):
        la = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), kept_flat)
    else:
        la = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_flat)
    return pc.cast(pc.binary_join(la, "\n"), pa.string())


def line_explode_slim(t: pa.Table) -> pa.Table:
    """(line_hash, occ_key) per dedup-relevant line — whitespace-only lines
    never dedup (they would all collapse into one). Ships ONLY int64s into
    the groupby; line text stays in the source blocks. Fully vectorized:
    Arrow split + one regex pass + one batched hash pass, no per-line
    Python."""
    flat, _counts, _starts, rep_ids, line_idx = _doc_lines(t)
    rel = ~_ws_only_mask(flat)
    occ = (rep_ids << _OCC_SHIFT) | line_idx
    return pa.table(
        {
            "line_hash": pa.array(_line_hash_batch(flat)[rel], pa.int64()),
            "occ_key": pa.array(occ[rel], pa.int64()),
        }
    )


def _sorted_winners_ref(hashes, occs):
    """ray.put the winner probe arrays PRE-SORTED by hash (once, on the
    driver) so the rewrite tasks' per-task fetch is a pure zero-copy
    plasma read with no per-task argsort."""
    hashes = np.asarray(hashes, dtype=np.int64)
    occs = np.asarray(occs, dtype=np.int64)
    order = np.argsort(hashes)
    return ray.put((hashes[order], occs[order]))


def _line_dedup_rewrite_fn(winners_ref, gate=None):
    """map_batches stage (plain task — the winner fetch is a zero-copy
    plasma read; see dedup.py on why tasks beat actor pools for
    broadcast-only state): re-split each doc, drop every duplicated-line
    occurrence that is not its global winner, reassemble in place — all
    vectorized (batched hash + searchsorted winner probe + binary_join
    reassembly). `winners_ref` must hold HASH-SORTED probe arrays (use
    `_sorted_winners_ref`). An optional `gate` filter is fused in front
    (see `dedup_lines_ds` on why fusing beats an upstream filter
    stage)."""

    def fn(t: pa.Table) -> pa.Table:
        win_hash, win_occ = (
            ray.get(winners_ref)
            if isinstance(winners_ref, ray.ObjectRef)
            else winners_ref
        )
        if gate is not None:
            t = gate(t)
        flat, counts, _starts, rep_ids, line_idx = _doc_lines(t)
        drop = np.zeros(len(flat), dtype=bool)
        if len(win_hash) and len(flat):
            rel = ~_ws_only_mask(flat)
            hashes = _line_hash_batch(flat)
            idx = np.searchsorted(win_hash, hashes)
            idx[idx == len(win_hash)] = 0
            found = win_hash[idx] == hashes
            occ = (rep_ids << _OCC_SHIFT) | line_idx
            drop = rel & found & (win_occ[idx] != occ)
        kept_flat = flat.filter(pa.array(~drop))
        ndocs = t.num_rows
        dropped_per_doc = (
            np.bincount(
                np.repeat(np.arange(ndocs, dtype=np.int64), counts),
                weights=drop,
                minlength=ndocs,
            ).astype(np.int64)
            if len(flat)
            else np.zeros(ndocs, np.int64)
        )
        kept_counts = counts - dropped_per_doc
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": _join_kept_lines(kept_flat, kept_counts),
                "n_kept": pa.array(kept_counts, pa.int64()),
                "n_dropped": pa.array(dropped_per_doc, pa.int64()),
            }
        )

    return fn


# Hybrid size dispatch (same pattern as crawl.py's expansion dispatch):
# winner tables at or below this many rows broadcast via ray.put (a ~16 B/row
# payload plus a per-actor dict — measured-fast); above it the winners stay
# a Dataset and the rewrite goes through the distributed join path, so NO
# driver-side materialization grows with corpus size.
from raycrawl.dedup import _env_int

LINE_DEDUP_DRIVER_MAX = _env_int("RAYCRAWL_LINE_DEDUP_DRIVER_MAX", 1_000_000)


def dedup_lines(sf_dir: str) -> rd.Dataset:
    """C4-style exact line dedup across the whole corpus: every line that
    occurs more than once (in any document, including within one document)
    survives only at its globally-first occurrence — minimal (doc_id,
    line_idx). Returns the rewritten documents with kept/dropped counts."""
    return dedup_lines_ds(_read_docs(sf_dir))


def dedup_lines_ds(
    docs: rd.Dataset,
    driver_max_winners: int | None = None,
    gate=None,
) -> rd.Dataset:
    """Dataset-level line dedup (shared by `dedup_lines` and the composite
    `curate_corpus`). Both rewrite paths are oracle-equivalence-tested
    (test_curate.py).

    `gate` (optional `pa.Table -> pa.Table` filter, e.g. `gopher_gate`) is
    FUSED into every stage that consumes `docs` instead of being applied
    as an upstream map stage. This is load-bearing, not a convenience: Ray
    skips map UDFs on 0-row blocks and passes them through as ZERO-COLUMN
    blocks, which acero hash joins reject ("no match for key field") —
    so an upstream filter that empties a block would poison the join
    path's occurrence stream. With the gate fused, every schema-changing
    UDF here only ever sees the (never-empty) source read blocks.
    Callers passing a pre-filtered `docs` without `gate` are fine on the
    broadcast path (groupby tolerates the leaked blocks) but must not
    force the join path with empty-block-bearing inputs."""
    if driver_max_winners is None:  # resolved at call time (tests patch it)
        driver_max_winners = LINE_DEDUP_DRIVER_MAX
    # Winner table = duplicated distinct lines only. Materialize it (it is
    # the slim post-aggregation side) so the size probe and the chosen
    # rewrite path share one execution of the explode+groupby.
    dup = line_dup_winners(docs, gate).materialize()
    if dup.count() <= driver_max_winners:
        # Broadcast path: winner map ships once via ray.put, rewrite is a
        # single streaming pass re-probing each line's pinned hash.
        rows = dup.take_all()
        winners_ref = _sorted_winners_ref(
            np.array([r["line_hash"] for r in rows], dtype=np.int64),
            np.array([r["min(occ_key)"] for r in rows], dtype=np.int64),
        )
        return docs.map_batches(
            _line_dedup_rewrite_fn(winners_ref, gate),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return _dedup_lines_join_path(docs, dup, gate)


def line_dup_winners(docs: rd.Dataset, gate=None) -> rd.Dataset:
    """The global duplicated-line winner table as a lazy Dataset:
    (line_hash, count(), min(occ_key)) for every line occurring more than
    once among (gated) documents. The only exchange is the slim int64
    groupby; line TEXT never shuffles. Shared by `dedup_lines_ds` and the
    resumable `pipelines/curate.py` run (which snapshots it so resumes
    skip the shuffle entirely)."""
    explode = (
        line_explode_slim
        if gate is None
        else (lambda t: line_explode_slim(gate(t)))
    )
    occ = docs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = occ.groupby("line_hash").aggregate(Count(), Min("occ_key"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow", zero_copy_batch=True,
    )




_DUP_SCHEMA = pa.schema(
    [("line_hash", pa.int64()), ("count()", pa.int64()), ("min(occ_key)", pa.int64())]
)
# drop_idxs is a PACKED int64-little-endian binary blob, not list<int64>:
# acero hash joins reject list-typed non-key fields
_DROPLIST_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("drop_idxs", pa.binary())]
)


_DROPLIST_PARTS = 64  # doc_id-hash partitions for the drop-list groupby


def _drop_rows(t: pa.Table) -> pa.Table:
    """(occ join winners) -> the losing occurrences as (doc_id, line_idx),
    plus the doc_id-hash partition key for the drop-list groupby (fused
    here: the rows exist only to feed that shuffle)."""
    t = t.filter(pc.not_equal(t["occ_key"], t["min(occ_key)"]))
    occv = t["occ_key"]
    doc_id = pc.shift_right(occv, _OCC_SHIFT)
    return pa.table(
        {
            "doc_id": doc_id,
            "line_idx": pc.bit_wise_and(occv, (1 << _OCC_SHIFT) - 1),
            "part": pc.cast(
                pc.bit_wise_and(doc_id, pa.scalar(_DROPLIST_PARTS - 1, pa.int64())),
                pa.int32(),
            ),
        }
    )


def _collect_drop_lists_part(t: pa.Table) -> pa.Table:
    """(doc_id, packed drop-index blob) rows for ONE doc_id-hash partition.
    Partition-wise, not per-doc: duplicate-bearing docs grow with corpus
    size (web boilerplate), so a per-doc map_groups pays one Python call
    per such document. One lexsort + unique boundary scan instead; the
    remaining per-doc work is a numpy slice + tobytes."""
    if t.num_rows == 0:  # typed empty block, not a zero-column one
        return _DROPLIST_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    idxs = t["line_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((idxs, ids))  # doc_id major, line_idx minor (sorted blobs)
    ids, idxs = ids[order], idxs[order]
    uids, starts = np.unique(ids, return_index=True)
    bounds = np.append(starts, len(ids))
    blobs = [
        idxs[s:e].astype("<i8").tobytes() for s, e in zip(bounds[:-1], bounds[1:])
    ]
    return pa.table(
        {
            "doc_id": pa.array(uids, pa.int64()),
            "drop_idxs": pa.array(blobs, pa.binary()),
        }
    )


def _rewrite_with_drop_lists(t: pa.Table) -> pa.Table:
    """Rewrite docs using the joined per-doc drop-index lists (null = keep
    all lines). Line indices refer to the original split, so no second
    hashing pass is needed on this path. Vectorized: one Arrow split, a
    flat drop mask assembled from the packed blobs (one Python step per
    DUPLICATE-BEARING doc, not per line), binary_join reassembly."""
    lflat, counts, ldoc = _flatten_list_col(
        pc.split_pattern(pc.fill_null(t.column("text"), ""), "\n")
    )
    starts = np.concatenate(([0], np.cumsum(counts[:-1]))) if len(counts) else counts
    drop = np.zeros(len(lflat), dtype=bool)
    dropped_per_doc = np.zeros(t.num_rows, dtype=np.int64)
    for i, blob in enumerate(t["drop_idxs"].to_pylist()):
        if blob:
            idxs = np.frombuffer(blob, dtype="<i8")
            drop[starts[i] + idxs] = True
            dropped_per_doc[i] = len(idxs)
    kept_flat = lflat.filter(pa.array(~drop))
    kept_counts = counts - dropped_per_doc
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": _join_kept_lines(kept_flat, kept_counts),
            "n_kept": pa.array(kept_counts, pa.int64()),
            "n_dropped": pa.array(dropped_per_doc, pa.int64()),
        }
    )


def _dedup_lines_join_path(
    docs: rd.Dataset, dup: rd.Dataset, gate=None
) -> rd.Dataset:
    """Distributed rewrite for winner tables too large to broadcast: the
    occurrence stream joins the winner Dataset on line_hash (slim int64
    shuffle), losing occurrences collapse to per-doc drop-index lists, and
    a left-outer join hands each document its own list. Re-deriving the
    occurrences costs one extra explode pass over the corpus — the price
    of never materializing the full occurrence table.

    Scale shape: 3 exchanges total (occ⋈winners hash join, drop-set
    groupby keyed by doc_id%P — partition-wise, not one Python call per
    duplicate-bearing doc — and the docs⋈drop-lists join keyed by
    doc_id); every shuffled payload except the final docs join is
    int64-slim."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # join actor pools scaled like crawl.py's fetch join: too-wide joins
    # reserve every CPU on small clusters and starve the upstream maps
    n_parts = max(2, ncpu // 2)
    explode = (
        line_explode_slim
        if gate is None
        else (lambda t: line_explode_slim(gate(t)))
    )
    occ = docs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    dup = _nonempty_blocks(dup, _DUP_SCHEMA)
    hits = occ.join(dup, "inner", num_partitions=n_parts, on=("line_hash",))
    drops = hits.map_batches(
        _drop_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    per_doc = drops.groupby("part").map_groups(
        _collect_drop_lists_part, batch_format="pyarrow"
    )
    per_doc = _nonempty_blocks(per_doc.materialize(), _DROPLIST_SCHEMA)
    if gate is not None:
        # Gate the docs side BEFORE shipping it through the join shuffle
        # (don't pay the exchange for rows the gate would drop). The gate
        # UDF runs on the never-empty source blocks, so its 0-row outputs
        # are TYPED empties — those the hash join handles fine.
        docs = docs.map_batches(
            gate, batch_format="pyarrow", zero_copy_batch=True
        )
    joined = docs.join(
        per_doc, "left_outer", num_partitions=n_parts, on=("doc_id",)
    )
    return joined.map_batches(
        _rewrite_with_drop_lists, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality rules
# ---------------------------------------------------------------------------


_WS_SPLIT_RE = "[" + _PY_WS_CHARS + "]+"  # Python str.split() separator runs


def _flatten_list_col(la):
    """(flat values array, per-row counts, per-row doc indices)."""
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten()
    counts = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return flat, counts, doc


def _per_doc_dup_stats(doc: np.ndarray, keys: np.ndarray, n: int):
    """Per-doc (count, weight-capable) run stats for repeated keys: sorts
    (doc, key), marks every occurrence beyond a run's first as dup."""
    order = np.lexsort((keys, doc))
    d_s, k_s = doc[order], keys[order]
    first = np.ones(len(k_s), dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
    return order, d_s, first


def gopher_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Integer repetition/quality signals per document plus the composite
    `gopher_pass` gate. All comparisons are integer cross-multiplications
    (no float ratios), so the result is exactly reproducible:

      pass = 50 <= n_words <= 100000
             and 10 * n_dup_lines < 3 * max(1, n_nonempty_lines)   (< 30%)
             and 5 * top2_count <= n_2grams                        (<= 20%)
             and 3 * n_words <= n_word_chars <= 10 * n_words       (mean 3-10)
             and 10 * n_symbols <= n_words                         (<= 10%)

    Fully vectorized (Arrow splits + batched hashing + numpy run stats):
    dup-line and top-bigram identities use the batched 64-bit hash —
    run-internal, collision-accepted exactly like dedup_lines (pyoracle
    keys on content, so a collision surfaces as an oracle mismatch).
    test_curate.py pins byte-equality with pyoracle's per-row loop."""
    s = pc.fill_null(t.column(col), "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n = t.num_rows

    # --- words: Python str.split() == regex split on isspace runs with
    # empty edge tokens dropped ---
    wflat, _wc, wdoc = _flatten_list_col(pc.split_pattern_regex(s, _WS_SPLIT_RE))
    wlen = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = wlen > 0
    nw = np.bincount(wdoc[keep], minlength=n).astype(np.int64)
    nwc = np.bincount(wdoc[keep], weights=wlen[keep], minlength=n).astype(np.int64)

    # --- top repeated bigram (over in-order non-empty words) ---
    top2 = np.zeros(n, dtype=np.int64)
    wh = _line_hash_batch(wflat.filter(pa.array(keep))).astype(np.uint64)
    bdoc = wdoc[keep]
    if len(wh) > 1:
        same = bdoc[:-1] == bdoc[1:]
        # order-sensitive pair combine (golden-ratio multiply then xor);
        # collision-accepted like the line hash above
        ph = (wh[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ wh[1:]
        pdoc, ph = bdoc[:-1][same], ph[same]
        if len(ph):
            _order, d_s, first = _per_doc_dup_stats(pdoc, ph, n)
            run_starts = np.flatnonzero(first)
            run_lens = np.diff(np.append(run_starts, len(ph)))
            np.maximum.at(top2, d_s[run_starts], run_lens)
    n2 = np.maximum(nw - 1, 0)

    # --- lines: duplicated-within-doc stats over dedup-relevant lines ---
    lflat, lcounts, ldoc = _flatten_list_col(pc.split_pattern(s, "\n"))
    rel = ~_ws_only_mask(lflat)
    nne = np.bincount(ldoc[rel], minlength=n).astype(np.int64)
    ndup = np.zeros(n, dtype=np.int64)
    cdup = np.zeros(n, dtype=np.int64)
    rdoc = ldoc[rel]
    if len(rdoc):
        rh = _line_hash_batch(lflat.filter(pa.array(rel)))
        rlen = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)[rel]
        order, d_s, first = _per_doc_dup_stats(rdoc, rh, n)
        dup = ~first
        ndup = np.bincount(d_s[dup], minlength=n).astype(np.int64)
        cdup = np.bincount(
            d_s[dup], weights=rlen[order][dup], minlength=n
        ).astype(np.int64)

    # --- symbols: both counts are non-overlapping left-to-right in Arrow
    # and CPython alike ---
    nsym = pc.add(
        pc.count_substring(s, "#"), pc.count_substring(s, "...")
    ).to_numpy(zero_copy_only=False).astype(np.int64)

    ok = (
        (nw >= 50) & (nw <= 100000)
        & (10 * ndup < 3 * np.maximum(1, nne))
        & (5 * top2 <= n2)
        & (3 * nw <= nwc) & (nwc <= 10 * nw)
        & (10 * nsym <= nw)
    )
    out = t.select(["doc_id"])
    for k, v in (
        ("n_words", nw), ("n_word_chars", nwc), ("n_lines", lcounts),
        ("n_nonempty_lines", nne), ("n_dup_lines", ndup),
        ("n_chars_dup_lines", cdup), ("top2_count", top2),
        ("n_2grams", n2), ("n_symbols", nsym),
        ("gopher_pass", ok.astype(np.int64)),
    ):
        out = out.append_column(k, pa.array(v, pa.int64()))
    return out


def gopher_quality(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(
        gopher_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

N_BENCH_DOCS = 20  # lowest doc_ids form the held-out "benchmark" set
NGRAM = 8


_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _gram_hash_arrays(t: pa.Table, col: str = "text"):
    """(doc_row_index, gram_hash) for every word-8-gram in the batch,
    fully vectorized: one Arrow whitespace split, one batched word-hash
    pass, then an order-sensitive rolling combine (golden-ratio multiply
    + xor, NGRAM-1 numpy steps). Grams never span documents. The identity
    is run-internal and collision-accepted exactly like the line-dedup
    hash: pyoracle keys overlap on raw 8-word TUPLES, so a collision
    surfaces as an oracle mismatch rather than hide."""
    s = pc.fill_null(t.column(col), "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    wflat, _wc, wdoc = _flatten_list_col(pc.split_pattern_regex(s, _WS_SPLIT_RE))
    keep = pc.utf8_length(wflat).to_numpy(zero_copy_only=False) > 0
    wdoc = wdoc[keep]
    wh = _line_hash_batch(wflat.filter(pa.array(keep))).astype(np.uint64)
    if len(wh) < NGRAM:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    g = wh[: len(wh) - NGRAM + 1].copy()
    for k in range(1, NGRAM):
        g = (g * _GRAM_MULT) ^ wh[k : len(wh) - NGRAM + 1 + k]
    same_doc = wdoc[: len(g)] == wdoc[NGRAM - 1 :]
    gh = (g[same_doc] & np.uint64(_MASK63)).astype(np.int64)
    return wdoc[: len(g)][same_doc], gh


def _distinct_per_doc(gdoc: np.ndarray, gh: np.ndarray):
    """Collapse (doc, gram) pairs to one row per distinct pair."""
    order = np.lexsort((gh, gdoc))
    d_s, h_s = gdoc[order], gh[order]
    first = np.ones(len(h_s), dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    return d_s[first], h_s[first]


def _contam_scan_fn(grams_ref, gate: bool = False):
    """map_batches stage (plain task — the gram-set fetch is a zero-copy
    plasma read of an already-sorted array): distinct word-8-gram overlap
    count against the broadcast benchmark gram set (sorted-array
    searchsorted probe). With `gate=True` it instead FILTERS the batch to
    overlap-free rows (all input columns preserved) for use inside
    composite pipelines. Vectorized end to end — no per-row or per-gram
    Python."""

    def fn(t: pa.Table) -> pa.Table:
        g = ray.get(grams_ref) if isinstance(grams_ref, ray.ObjectRef) else grams_ref
        grams = np.asarray(g, dtype=np.int64)  # sorted
        n_overlap = np.zeros(t.num_rows, dtype=np.int64)
        if len(grams):
            gdoc, gh = _gram_hash_arrays(t)
            if len(gh):
                gdoc, gh = _distinct_per_doc(gdoc, gh)
                idx = np.searchsorted(grams, gh)
                idx[idx == len(grams)] = 0
                hit = grams[idx] == gh
                n_overlap = np.bincount(
                    gdoc[hit], minlength=t.num_rows
                ).astype(np.int64)
        ov = pa.array(n_overlap, pa.int64())
        if gate:
            return t.filter(pc.equal(ov, 0))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_overlap": ov,
                "contaminated": pc.cast(pc.greater(ov, 0), pa.int64()),
            }
        )

    return fn


def _bench_grams_ref(sf_dir: str):
    """Broadcast handle for the benchmark 8-gram hash set, built from the
    RAW text of the N_BENCH_DOCS lowest-doc_id documents via a
    row-group-pruned read (never a full-table scan). Uses the SAME gram
    kernel as the probe side so identities agree."""
    from raycrawl.ioutil import read_lowest

    path = os.path.join(sf_dir, "documents.parquet")
    bench = read_lowest(path, "doc_id", N_BENCH_DOCS, ["doc_id", "text"])
    _gdoc, gh = _gram_hash_arrays(bench)
    return ray.put(np.unique(gh))


def decontaminate(sf_dir: str) -> rd.Dataset:
    """Benchmark-decontamination scan: the N_BENCH_DOCS lowest-doc_id
    documents stand in for a held-out eval set; every corpus document
    reports its distinct word-8-gram overlap with that set and a
    contaminated flag (>= 1 shared 8-gram, the standard n-gram rule).
    The benchmark read is row-group-pruned (`read_lowest`), never a full
    table scan, and the gram set broadcasts once."""
    grams_ref = _bench_grams_ref(sf_dir)
    return _read_docs(sf_dir).map_batches(
        _contam_scan_fn(grams_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# PII redaction (pure vectorized Arrow / RE2)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in RE2 (Arrow)
# and Python `re` (pyoracle): character classes, bounded repeats, \b —
# no backrefs, no lookaround. Applied IN ORDER, counting before each
# replace, so both sides see the same progressively-redacted string.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
)


def pii_batch(t: pa.Table, col: str = "text") -> pa.Table:
    s = pc.fill_null(t[col], "")
    total = pa.array(np.zeros(len(t), dtype=np.int64))
    for pattern, repl in PII_RULES:
        total = pc.add(
            total, pc.cast(pc.count_substring_regex(s, pattern=pattern), pa.int64())
        )
        s = pc.replace_substring_regex(s, pattern=pattern, replacement=repl)
    return pa.table(
        {"doc_id": t["doc_id"], "text_redacted": s, "n_redactions": total}
    )


def pii_redact(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(
        pii_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# composite curation pipeline
# ---------------------------------------------------------------------------


def gopher_gate(t: pa.Table) -> pa.Table:
    """Filter a (doc_id, text) batch to Gopher-passing rows."""
    return t.filter(pc.cast(gopher_batch(t)["gopher_pass"], pa.bool_()))


def _curate_finalize(t: pa.Table) -> pa.Table:
    """PII-redact the curated text and shape the composite output."""
    red = pii_batch(t)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": red["text_redacted"],
            "n_dropped_lines": t["n_dropped"],
            "n_redactions": red["n_redactions"],
        }
    )


def curate_corpus(sf_dir: str) -> rd.Dataset:
    """The full curation recipe as ONE pipeline, in the order a real
    pretraining run applies it:

      1. Gopher quality gate (on the original text),
      2. global line dedup among survivors,
      3. benchmark-decontamination drop (8-gram overlap, computed on the
         DEDUPED text, against grams from the RAW benchmark docs),
      4. PII redaction on what remains.

    Scale shape: stages 1, 3 and 4 are map-only and fuse with their
    neighbours under Ray Data's streaming executor; the only all-to-all
    is the slim int64 line-hash groupby inside step 2. The benchmark gram
    set and the duplicated-line winner table are each broadcast once.
    Output: doc_id, text (curated), n_dropped_lines, n_redactions."""
    grams_ref = _bench_grams_ref(sf_dir)
    # The gopher gate is passed INTO dedup_lines_ds (fused per-stage), not
    # applied as an upstream filter stage: an upstream filter's 0-row
    # output blocks would skip the explode UDF and leak zero-column blocks
    # into the join path (see dedup_lines_ds docstring). Cost is identical
    # — a lazy upstream stage re-executes once per consumer anyway.
    deduped = dedup_lines_ds(_read_docs(sf_dir), gate=gopher_gate)
    clean = deduped.map_batches(
        _contam_scan_fn(grams_ref, True),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return clean.map_batches(
        _curate_finalize, batch_format="pyarrow", zero_copy_batch=True
    )
