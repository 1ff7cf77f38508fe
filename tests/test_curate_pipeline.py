"""Resumable curation run (pipelines/curate.py): per-shard output with
done-markers must equal the one-shot `curate_corpus` exactly, resumes
must skip finished partitions byte-untouched and reuse the snapshotted
global state, and both winner-rewrite dispatch paths must agree."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raycrawl import curate
from raycrawl.pipelines.curate import curate_to_parquet


def _mk_corpus(tmp_path):
    """The crafted curation corpus written twice: one file (for the
    one-shot `curate_corpus(sf_dir)` surface) and three interleaved
    shards (for the resumable run). Includes gopher failures, a planted
    benchmark 8-gram, cross-shard duplicate lines, PII, and one shard
    whose docs are all gated out."""
    bench_secret = "zebra quag plume vortex ember lattice crag fjord"
    ids, texts = [], []
    for i in range(20):  # benchmark docs (lowest ids), all fail gopher
        t = f"bench doc number {i} short"
        if i == 3:
            t = f"bench doc {i} " + bench_secret
        ids.append(i)
        texts.append(t)

    def words(tag, n):
        return " ".join(f"w{j}x{tag}" for j in range(n))

    shared = "shared curated alpha beta gamma delta epsilon zeta"
    ids.append(30); texts.append(words(30, 52) + " " + bench_secret)
    ids.append(31)
    texts.append(words("a31", 30) + "\n" + shared + "\n" + words("b31", 20))
    ids.append(32); texts.append(shared + "\n" + words(32, 50))
    ids.append(33)
    texts.append(words(33, 55) + "\nmail bob@example.com or call +123-456-7890")
    ids.append(34); texts.append(words(34, 60))
    ids.append(35); texts.append(words(35, 10))  # gated out

    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    single = tmp_path / "single"
    single.mkdir()
    pq.write_table(t, str(single / "documents.parquet"))
    shards = tmp_path / "shards"
    shards.mkdir()
    for s in range(3):
        mask = pa.array([i % 3 == s for i in range(t.num_rows)])
        pq.write_table(t.filter(mask), str(shards / f"docs-{s}.parquet"))
    return str(single), str(shards)


def _read_parts(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    if not files:
        return None
    tab = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    return tab.sort_by([("doc_id", "ascending")])


def _one_shot(sf_dir):
    df = curate.curate_corpus(sf_dir).to_pandas()
    return (
        pa.Table.from_pandas(
            df.sort_values("doc_id").reset_index(drop=True),
            preserve_index=False,
        )
    )


class TestResumableCurate:
    def test_equals_one_shot(self, ray_session, tmp_path):
        single, shards = _mk_corpus(tmp_path)
        out = str(tmp_path / "out")
        s = curate_to_parquet(shards, out)
        assert s["parts_total"] == 3 and s["parts_run"] == 3
        assert s["rewrite_path"] == "broadcast" and not s["state_reused"]
        got = _read_parts(out)
        exp = _one_shot(single)
        assert got.num_rows == exp.num_rows == s["rows"]
        for c in exp.column_names:
            assert got[c].to_pylist() == exp[c].to_pylist(), c

    def test_resume_skips_finished_parts(self, ray_session, tmp_path):
        single, shards = _mk_corpus(tmp_path)
        out = str(tmp_path / "out")
        curate_to_parquet(shards, out)
        done = sorted(
            glob.glob(os.path.join(out, "_state", "done", "*.json"))
        )
        assert len(done) == 3
        # simulate a crash: one part unfinished (marker + output gone)
        victim = json.load(open(done[1]))["part"]
        os.remove(done[1])
        part_dir = os.path.join(out, f"part-{victim}")
        kept_files = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(out, "part-*", "*.parquet"))
            if not f.startswith(part_dir)
        }
        import shutil

        shutil.rmtree(part_dir)
        s = curate_to_parquet(shards, out)
        assert s["parts_run"] == 1 and s["parts_skipped"] == 2
        assert s["state_reused"]  # winner shuffle not repeated
        for f, mt in kept_files.items():  # finished parts byte-untouched
            assert os.path.getmtime(f) == mt, f
        got = _read_parts(out)
        exp = _one_shot(single)
        for c in exp.column_names:
            assert got[c].to_pylist() == exp[c].to_pylist(), c

    def test_join_path_dispatch_equal(self, ray_session, tmp_path, monkeypatch):
        single, shards = _mk_corpus(tmp_path)
        out = str(tmp_path / "out_join")
        monkeypatch.setattr(curate, "LINE_DEDUP_DRIVER_MAX", 0)
        s = curate_to_parquet(shards, out)
        assert s["rewrite_path"] == "join" and s["winners"] >= 1
        got = _read_parts(out)
        monkeypatch.undo()
        exp = _one_shot(single)
        for c in exp.column_names:
            assert got[c].to_pylist() == exp[c].to_pylist(), c

    def test_no_duplicates_corpus(self, ray_session, tmp_path):
        # zero duplicated lines -> typed empty winner snapshot; every
        # gopher-passing doc survives the rewrite unchanged. The 20
        # lowest ids are sub-NGRAM bench docs so the gram set is empty
        # (otherwise the corpus would self-contaminate).
        bench_ids = list(range(20))
        ids = list(range(21, 25))
        texts = [
            " ".join(f"w{j}u{i}" for j in range(55)) for i in ids
        ]
        bench_texts = [f"tiny bench {i}" for i in bench_ids]
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(bench_ids + ids, pa.int64()),
                    "text": bench_texts + texts,
                }
            ),
            str(d / "documents.parquet"),
        )
        out = str(tmp_path / "out_nodup")
        s = curate_to_parquet(str(d), out)
        assert s["winners"] == 0 and s["rows"] == len(ids)
        got = _read_parts(out)
        assert got["text"].to_pylist() == texts
        assert pc.sum(got["n_dropped_lines"]).as_py() == 0
