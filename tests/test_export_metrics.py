"""Markdown export + run-metrics tests (SURVEY.md S9/M18, F5)."""

import os

import pytest

from pdf_extraction_ray.config import PipelineConfig
from pdf_extraction_ray.sources import spec

CFG = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES, n_buckets=16,
                     extract_concurrency=(1, 2),
                     split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)


@pytest.fixture(scope="module")
def ckpt_run(ray_session, pages_corpus, tmp_path_factory):
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    out = str(tmp_path_factory.mktemp("export") / "out")
    ds = run_extraction(pages_corpus, CFG, out_dir=out)
    return ds, out


def test_markdown_files_written(ckpt_run, tmp_path_factory):
    from pdf_extraction_ray.pipelines.export import export_markdown_files
    ds, _ = ckpt_run
    md_dir = str(tmp_path_factory.mktemp("md"))
    n = export_markdown_files(ds, md_dir)
    files = [f for f in os.listdir(md_dir) if f.endswith(".md")]
    assert n == ds.count() == len(files)
    body = open(os.path.join(md_dir, sorted(files)[0])).read()
    assert body.startswith("# https://corpus.example/")
    assert "- status: " in body


def test_run_metrics_match_recount(ckpt_run):
    from pdf_extraction_ray.pipelines.export import run_metrics
    ds, out = ckpt_run
    m = run_metrics(out)
    df = ds.to_pandas()
    assert m["n_rows"] == len(df)
    assert m["n_completed"] == (df.status == "completed").sum()
    assert m["n_rejected"] == (df.status == "rejected").sum()
    assert m["n_primary"] == (df.route == "primary").sum()
    assert m["n_salvage"] == (df.route == "salvage").sum()
    assert m["n_text_bytes"] == df.n_chars.sum()
    assert m["n_buckets"] == CFG.n_buckets
