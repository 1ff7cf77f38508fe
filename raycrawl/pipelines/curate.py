"""Resumable corpus-curation run — the write-side of `curate_corpus`.

`curate.curate_corpus()` is the lazy Dataset surface the driver queries;
this module is the production RUN shape for the same recipe at the
100-TB design point, where a multi-hour job must survive preemption:

1. **Global state once.** The duplicated-line winner table (the only
   all-to-all in the recipe) and the benchmark gram set are computed in
   one pass and snapshotted under ``<out>/_state/`` with atomic renames.
   A resumed run loads the snapshots and never repeats the shuffle.
2. **Per-shard output.** Every input shard (parquet file, or a group of
   ``--files-per-part``) is curated by a purely map-only pass — Gopher
   gate -> winner-probe line rewrite -> decontamination drop -> PII
   redact — and written to its own ``<out>/part-<name>/`` directory,
   with a done-marker under ``<out>/_state/done/``. A failed run
   re-executes only unfinished parts; finished partitions are skipped
   byte-untouched.

Correctness note: per-shard execution does NOT change semantics — the
winner table and gram set are global, and every post-shuffle stage is
per-document, so curating shard-by-shard equals the one-shot
`curate_corpus` output exactly (pinned by test_curate_pipeline.py).

The winner-table rewrite dispatches exactly like `dedup_lines_ds`:
broadcast probe at or below `LINE_DEDUP_DRIVER_MAX` winners, the
distributed 3-exchange join path above it (the snapshot is read back as
a Dataset either way, so the size probe is parquet-metadata-only).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raycrawl import curate
from raycrawl.ioutil import read_lowest

_STATE = "_state"


def _doc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet under {path}")
    return files


def _bench_grams_multi(files: list[str]) -> np.ndarray:
    """Benchmark gram set over multiple shards: the globally lowest
    N_BENCH_DOCS doc_ids are the union of per-file lowest-N candidates
    (row-group-pruned reads), re-limited globally — exact, never a full
    scan."""
    cands = [
        read_lowest(f, "doc_id", curate.N_BENCH_DOCS, ["doc_id", "text"])
        for f in files
    ]
    merged = pa.concat_tables(cands, promote_options="default")
    order = pa.compute.sort_indices(merged["doc_id"])
    bench = merged.take(order.slice(0, min(curate.N_BENCH_DOCS, merged.num_rows)))
    _d, gh = curate._gram_hash_arrays(bench)
    return np.unique(gh)


def _atomic_dir_swap(tmp: str, final: str) -> None:
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def _build_state(files: list[str], state_dir: str, ncpu: int) -> None:
    """Compute + snapshot the global winner table and bench gram set."""
    win_dir = os.path.join(state_dir, "winners.parquet")
    grams_file = os.path.join(state_dir, "bench_grams.parquet")

    docs = rd.read_parquet(
        files, columns=["doc_id", "text"], override_num_blocks=4 * ncpu
    )
    tmp = win_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    curate.line_dup_winners(docs, gate=curate.gopher_gate).write_parquet(tmp)
    if not glob.glob(os.path.join(tmp, "*.parquet")):
        # no duplicated lines at all: keep the snapshot typed, not absent
        # (an all-empty write_parquet may not even create the directory)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            curate._DUP_SCHEMA.empty_table(), os.path.join(tmp, "empty.parquet")
        )
    _atomic_dir_swap(tmp, win_dir)

    grams = _bench_grams_multi(files)
    pq.write_table(
        pa.table({"gram": pa.array(grams, pa.int64())}), grams_file + ".tmp"
    )
    os.replace(grams_file + ".tmp", grams_file)


def _parts(files: list[str], files_per_part: int) -> list[tuple[str, list[str]]]:
    out = []
    for i in range(0, len(files), files_per_part):
        group = files[i : i + files_per_part]
        name = os.path.splitext(os.path.basename(group[0]))[0]
        out.append((f"{i // files_per_part:05d}-{name}", group))
    return out


def curate_to_parquet(
    docs_path: str,
    out_dir: str,
    resume: bool = True,
    files_per_part: int = 1,
) -> dict:
    """Run the full curation recipe over `docs_path` (a parquet file or a
    directory of shards) into resumable partitioned output under
    `out_dir`. Returns a summary dict (parts run/skipped, rows)."""
    files = _doc_files(docs_path)
    state_dir = os.path.join(out_dir, _STATE)
    done_dir = os.path.join(state_dir, "done")
    os.makedirs(done_dir, exist_ok=True)
    win_dir = os.path.join(state_dir, "winners.parquet")
    grams_file = os.path.join(state_dir, "bench_grams.parquet")
    ncpu = int(ray.cluster_resources().get("CPU", 8))

    state_reused = resume and os.path.isdir(win_dir) and os.path.exists(grams_file)
    if not state_reused:
        _build_state(files, state_dir, ncpu)

    grams_ref = ray.put(
        pq.read_table(grams_file)["gram"].to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    win_files = sorted(glob.glob(os.path.join(win_dir, "*.parquet")))
    n_winners = sum(pq.ParquetFile(f).metadata.num_rows for f in win_files)
    broadcast = n_winners <= curate.LINE_DEDUP_DRIVER_MAX
    if broadcast:
        wt = pq.read_table(win_dir)  # bounded by the dispatch threshold
        winners_ref = curate._sorted_winners_ref(
            wt["line_hash"].to_numpy(zero_copy_only=False).astype(np.int64),
            wt["min(occ_key)"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    parts = _parts(files, files_per_part)
    run, skipped, rows_written = 0, 0, 0
    for name, group in parts:
        marker = os.path.join(done_dir, name + ".json")
        part_dir = os.path.join(out_dir, f"part-{name}")
        if resume and os.path.exists(marker):
            skipped += 1
            with open(marker) as fh:
                rows_written += json.load(fh)["rows"]
            continue
        shutil.rmtree(part_dir, ignore_errors=True)  # crash leftovers
        docs = rd.read_parquet(
            group, columns=["doc_id", "text"], override_num_blocks=4 * ncpu
        )
        if broadcast:
            deduped = docs.map_batches(
                curate._line_dedup_rewrite_fn(winners_ref, curate.gopher_gate),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            deduped = curate._dedup_lines_join_path(
                docs, rd.read_parquet(win_files), curate.gopher_gate
            )
        clean = deduped.map_batches(
            curate._contam_scan_fn(grams_ref, True),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = clean.map_batches(
            curate._curate_finalize, batch_format="pyarrow", zero_copy_batch=True
        )
        out.write_parquet(part_dir)
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(part_dir, "*.parquet"))
        )
        tmp_marker = marker + ".tmp"
        with open(tmp_marker, "w") as fh:
            json.dump({"part": name, "files": group, "rows": n}, fh)
        os.replace(tmp_marker, marker)
        run += 1
        rows_written += n
    return {
        "parts_total": len(parts),
        "parts_run": run,
        "parts_skipped": skipped,
        "rows": rows_written,
        "winners": n_winners,
        "rewrite_path": "broadcast" if broadcast else "join",
        "state_reused": state_reused,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description="resumable curation run")
    ap.add_argument("--docs", required=True,
                    help="documents parquet file or shard directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--files-per-part", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    rd.DataContext.get_current().enable_progress_bars = False
    s = curate_to_parquet(
        args.docs, args.out,
        resume=not args.no_resume, files_per_part=args.files_per_part,
    )
    print(json.dumps(s))
    ray.shutdown()


if __name__ == "__main__":
    main()
