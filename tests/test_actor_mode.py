"""Topology-equivalence tests: the actor-pool mode and the whole-document
parse path must produce byte-identical results to the default paths (the
north rule's determinism-across-topologies requirement)."""

import pandas as pd
import pytest

from pdf_extraction_ray.config import PipelineConfig
from pdf_extraction_ray.sources import spec


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop(columns=["spans"]).sort_values("url").reset_index(drop=True)
    return df


def test_actor_pool_mode_matches_function_mode(ray_session, pages_corpus):
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    base_cfg = dict(max_bytes=spec.CORPUS_MAX_BYTES, n_buckets=16,
                    split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    fn_df = run_extraction(
        pages_corpus, PipelineConfig(**base_cfg, use_actors=False)).to_pandas()
    ac_df = run_extraction(
        pages_corpus,
        PipelineConfig(**base_cfg, use_actors=True,
                       extract_concurrency=(1, 2))).to_pandas()
    a, b = _norm(fn_df), _norm(ac_df)
    assert a.equals(b)


def test_hash_shuffle_finalize_matches_sort(ray_session, pages_corpus, tmp_path):
    """finalize_shuffle='hash' (hash-keyed repartition + per-block
    finisher) must be value-identical to the default sort-shuffle
    groupby path — in-memory and checkpointed alike."""
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    base_cfg = dict(max_bytes=spec.CORPUS_MAX_BYTES, n_buckets=16,
                    split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    sort_df = run_extraction(
        pages_corpus,
        PipelineConfig(**base_cfg, finalize_shuffle="sort")).to_pandas()
    hash_df = run_extraction(
        pages_corpus,
        PipelineConfig(**base_cfg, finalize_shuffle="hash",
                       finalize_num_partitions=4)).to_pandas()
    a, b = _norm(sort_df), _norm(hash_df)
    assert a.drop(columns=["elements"]).equals(b.drop(columns=["elements"]))
    assert a["elements"].astype(str).tolist() == b["elements"].astype(str).tolist()

    # checkpointed hash mode: per-bucket files + manifests still appear
    out = str(tmp_path / "hash_ckpt")
    ds = run_extraction(
        pages_corpus,
        PipelineConfig(**base_cfg, finalize_shuffle="hash",
                       finalize_num_partitions=4), out_dir=out)
    ck = _norm(ds.to_pandas())
    assert ck.drop(columns=["elements"]).equals(a.drop(columns=["elements"]))
    from pdf_extraction_ray.state.checkpoint import load_manifests
    manifests = load_manifests(out)
    assert sum(m["n_rows"] for m in manifests.values()) == len(a)
    assert set(manifests) == set(ck["bucket"].unique())


def test_whole_doc_parse_equals_sharded_path(ray_session, documents_rows):
    """ExtractorActor (whole-document, used by the retry pass) must produce
    the same text as the shard+reassemble path for oversized PDFs."""
    import pyarrow as pa
    from pdf_extraction_ray.sources import corpus
    from pdf_extraction_ray.stages.extract import (ExtractorActor,
                                                   sniff_validate_batch)
    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    big = [d for d in documents_rows if spec.kind_of(d["doc_id"]) == "pdf_big"][:3]
    assert big
    rows = [corpus.build_page_row(d["doc_id"], d["text"], d["source"], d["lang"])
            for d in big]
    batch = sniff_validate_batch(
        pa.Table.from_pylist(rows, schema=corpus.PAGES_SCHEMA), cfg)
    out = ExtractorActor(cfg)(batch)
    for i, d in enumerate(big):
        want = spec.expected_final_text(d["doc_id"], d["text"], d["source"])
        assert out["extracted_text"][i].as_py() == want
        assert out["n_pages"][i].as_py() > cfg.split_page_threshold


def test_read_num_blocks_wave_sizing(ray_session, pages_corpus, tmp_path,
                                     monkeypatch):
    """Read-task sizing: ~4 waves per CPU for mid-size corpora, never
    below ~256 KB on disk per block for tiny ones, natural 128 MB
    splitting preserved for huge ones, env override honored."""
    import os

    from pdf_extraction_ray.pipelines.extraction import _read_num_blocks

    n = _read_num_blocks(pages_corpus)
    total = sum(e.stat().st_size for e in os.scandir(pages_corpus)
                if e.name.endswith(".parquet"))
    assert n is not None
    assert n >= 4  # at least the session CPU floor
    assert n <= max(4, -(-total // (256 << 10)))  # block floor respected

    monkeypatch.setenv("GRAFT_READ_NUM_BLOCKS", "natural")
    assert _read_num_blocks(pages_corpus) is None
    monkeypatch.setenv("GRAFT_READ_NUM_BLOCKS", "17")
    assert _read_num_blocks(pages_corpus) == 17
    monkeypatch.delenv("GRAFT_READ_NUM_BLOCKS")

    # unreadable path → natural splitting, never an exception
    assert _read_num_blocks(str(tmp_path / "missing")) is None
