"""Composite training-data prep pipeline."""

from raycrawl.pipelines.prep import prep_corpus
from tests.conftest import SF_DIR


def test_prep_corpus(ray_session):
    df = prep_corpus(SF_DIR).to_pandas()
    assert 0 < len(df) <= 500
    assert set(df.columns) == {"doc_id", "lang_pred", "n_tokens", "n_tokens_bpe", "quality"}
    assert (df["n_tokens"] >= 10).all()
    assert (df["quality"] >= 0.2).all()
    assert df["doc_id"].is_unique


def test_prep_corpus_dedup_gates(ray_session, tmp_path):
    """Planted exact + near dups are removed; distinct docs survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    other = "completely different material about ray data pipelines at scale " * 3
    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [base, base, base + " tail", other],
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    df = prep_corpus(str(d), min_tokens=5, min_quality=0.0).to_pandas()
    assert sorted(df["doc_id"]) == [0, 3]  # exact dup 1 and near dup 2 dropped
