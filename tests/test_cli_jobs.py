"""Smoke tests for the job entrypoints (each owns a separate Ray
session in a subprocess, like ``ray job submit`` would)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ, RAY_ADDRESS="local",
               RAY_DATA_DISABLE_PROGRESS_BARS="1")
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_run_curation_cli(tmp_path):
    out = str(tmp_path / "curated")
    summary = _run(["jobs/run_curation.py", "--input", SF_SMOKE,
                    "--output", out])
    assert summary["n_docs"] > 0 and summary["n_tokens"] > 0
    assert summary["n_shards"] >= 1
    # hive-partitioned shard dirs landed
    assert any(d.startswith("shard=") for d in os.listdir(out))


def test_run_linkgraph_cli(pages_corpus, tmp_path):
    out = str(tmp_path / "lg")
    summary = _run(["jobs/run_linkgraph.py", "--input", pages_corpus,
                    "--output", out, "--iters", "2"])
    assert summary["n_anchors"] > 0
    assert summary["n_edges"] > 0
    assert summary["n_ranked"] > 0
    assert summary["n_pages_with_metadata"] > 0
    for sub in ("anchors", "edges", "ranks", "metadata"):
        assert os.listdir(os.path.join(out, sub))


def test_run_linkgraph_cli_robots_frontier(pages_corpus, tmp_path):
    """--frontier-from + --robots-agent: the re-crawl list is gated
    through per-section robots decisions; disallowed urls are dropped
    from frontier/ and the full audit lands in frontier_robots/."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extraction_ray.sources import spec

    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                         columns=["doc_id", "source"]).to_pylist()
    pq.write_table(pa.table({
        "url": pa.array([spec.url_of(d["doc_id"], d["source"])
                         for d in docs], pa.string()),
        "quality_pct": pa.array([(d["doc_id"] * 13) % 100 + 1
                                 for d in docs], pa.int64()),
    }), str(tmp_path / "extracted.parquet"))

    out = str(tmp_path / "lgr")
    summary = _run(["jobs/run_linkgraph.py", "--input", pages_corpus,
                    "--output", out, "--iters", "2",
                    "--frontier-from", str(tmp_path / "extracted.parquet"),
                    "--frontier-k", "50",
                    "--robots-agent", "graftbot"])
    assert summary["n_robots_blocked"] > 0
    assert summary["n_frontier"] + summary["n_robots_blocked"] == 50

    import pandas as pd
    audit = pd.concat(
        pd.read_parquet(os.path.join(out, "frontier_robots", f))
        for f in os.listdir(os.path.join(out, "frontier_robots")))
    kept = pd.concat(
        pd.read_parquet(os.path.join(out, "frontier", f))
        for f in os.listdir(os.path.join(out, "frontier")))
    assert set(kept.url) == set(audit[audit.allowed].url)
    assert "allowed" not in kept.columns


def test_run_extraction_cli_refresh_mode(ray_session, pages_corpus,
                                         tmp_path):
    """--refresh-old-pages applies only the snapshot delta via the CLI."""
    import ray.data as rd

    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines.analytics import snapshot_b_pages
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    from pdf_extraction_ray.sources import spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    out = str(tmp_path / "out")
    run_extraction(pages_corpus, cfg, out_dir=out)
    bdir = str(tmp_path / "snapB")
    snapshot_b_pages(SF_SMOKE).write_parquet(bdir)

    summary = _run(["jobs/run_extraction.py", "--input", bdir,
                    "--output", out, "--refresh-old-pages", pages_corpus,
                    "--max-bytes", str(spec.CORPUS_MAX_BYTES),
                    "--split-pages", str(spec.CORPUS_SPLIT_PAGE_THRESHOLD)])
    assert summary["n_reextracted"] > 0 and summary["n_dropped"] > 0
    # output rows = the new snapshot's distinct urls
    n_b_urls = snapshot_b_pages(SF_SMOKE).to_pandas()["url"].nunique()
    assert rd.read_parquet(out).count() == n_b_urls


def test_run_ann_cli(tmp_path):
    """IVF similarity job: build the index, answer queries; a second run
    with --append folds a new vector batch in (delta files + compaction)
    and the appended vectors immediately answer their own queries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"),
                         columns=["vec_id", "embedding"]).to_pylist()
    out = str(tmp_path / "ann")
    idx = str(tmp_path / "ivf")
    summary = _run(["jobs/run_ann.py", "--corpus", SF_SMOKE,
                    "--index-dir", idx, "--output", out, "--k", "5"])
    assert summary["n_queries"] == 5
    assert summary["n_neighbors"] == 25
    nb = pq.read_table(os.path.join(out, "neighbors")).to_pandas()
    # each query's rank-1 neighbor is itself (full-fidelity index)
    r1 = nb[nb["rank"] == 1].set_index("query_id")
    assert (r1.neighbor_id == r1.index).all()

    # append a distinct new batch, compact, query the new ids
    new = [{"vec_id": 900_000 + i,
            "embedding": [float(x) + 0.02 * (i + 1)
                          for x in reversed(base[i]["embedding"])]}
           for i in range(4)]
    newp = str(tmp_path / "new.parquet")
    pq.write_table(pa.Table.from_pylist(new), newp)
    out2 = str(tmp_path / "ann2")
    summary2 = _run(["jobs/run_ann.py", "--corpus", SF_SMOKE,
                     "--index-dir", idx, "--output", out2,
                     "--append", newp, "--compact", "--queries", newp,
                     "--k", "3", "--n-probe", "16"])
    assert summary2["index_n_rows"] == len(base) + 4
    assert summary2["index_n_appended"] == 4
    assert summary2["compacted"]["dirs_compacted"] >= 1
    nb2 = pq.read_table(os.path.join(out2, "neighbors")).to_pandas()
    r1 = nb2[nb2["rank"] == 1].set_index("query_id")
    assert sorted(r1.index) == [d["vec_id"] for d in new]
    assert (r1.neighbor_id == r1.index).all()


def test_run_search_cli(tmp_path):
    """BM25 search job: build the index, answer a query; a second run
    folds a new doc batch in (--append --compact) and a THIRD run that
    passes only the BASE corpus must reuse the appended index (ensure
    accepts the base stamp — a rebuild would wipe the appended docs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    idx = str(tmp_path / "inv")
    out = str(tmp_path / "s1")
    summary = _run(["jobs/run_search.py", "--corpus", SF_SMOKE,
                    "--index-dir", idx, "--output", out,
                    "--query", "batch table", "--k", "5"])
    assert summary["n_queries"] == 1 and summary["n_hits"] > 0
    assert os.listdir(os.path.join(out, "hits"))

    new = [{"doc_id": 800_000 + i,
            "text": f"zzzuniqword appended body {i}"} for i in range(3)]
    newp = str(tmp_path / "new.parquet")
    pq.write_table(pa.Table.from_pylist(new), newp)
    out2 = str(tmp_path / "s2")
    summary2 = _run(["jobs/run_search.py", "--corpus", SF_SMOKE,
                     "--index-dir", idx, "--output", out2,
                     "--append", newp, "--compact",
                     "--query", "zzzuniqword", "--k", "5"])
    assert summary2["index_n_docs"] is not None
    assert summary2["compacted"]["parts_compacted"] >= 1
    hits2 = pq.read_table(os.path.join(out2, "hits")).to_pandas()
    assert set(hits2.doc_id) == {d["doc_id"] for d in new}

    # base corpus again: the appended index must be accepted as fresh
    out3 = str(tmp_path / "s3")
    _run(["jobs/run_search.py", "--corpus", SF_SMOKE,
          "--index-dir", idx, "--output", out3,
          "--query", "zzzuniqword", "--k", "5"])
    hits3 = pq.read_table(os.path.join(out3, "hits")).to_pandas()
    assert set(hits3.doc_id) == {d["doc_id"] for d in new}


def test_run_snapshot_ingest_cli(ray_session, tmp_path):
    """Near-dup ingest CLI: exact + truncated re-crawls are rejected,
    novel docs are admitted; --append makes a re-run of the SAME
    snapshot reject everything (the index now contains it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pylist()
    snap_rows = []
    for d in docs[:60]:
        i, t = d["doc_id"], d["text"]
        if i % 3 == 0:
            snap_rows.append({"doc_id": i + 500_000, "text": t})        # exact
        elif i % 3 == 1:
            snap_rows.append({"doc_id": i + 500_000, "text": t[:-12]})  # near
        else:
            snap_rows.append({"doc_id": i + 500_000,
                              "text": f"fresh snapshot page {i} body"})  # novel
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(pa.Table.from_pylist(snap_rows), snap)
    idx = str(tmp_path / "mh")
    out = str(tmp_path / "ingest")

    summary = _run(["jobs/run_snapshot_ingest.py", "--corpus", SF_SMOKE,
                    "--snapshot", snap, "--index-dir", idx,
                    "--output", out, "--append"])
    n_novel = sum(1 for r in snap_rows if "fresh snapshot" in r["text"])
    assert summary["n_snapshot"] == len(snap_rows)
    assert summary["n_admitted"] == n_novel
    assert summary["n_rejected"] == len(snap_rows) - n_novel
    assert summary["index_n_docs"] == len(docs) + n_novel
    assert os.listdir(os.path.join(out, "admitted"))
    assert os.listdir(os.path.join(out, "decisions"))

    # the same snapshot again: everything now near-dups the index
    out2 = str(tmp_path / "ingest2")
    summary2 = _run(["jobs/run_snapshot_ingest.py", "--corpus", SF_SMOKE,
                     "--snapshot", snap, "--index-dir", idx,
                     "--output", out2])
    assert summary2["n_admitted"] == 0
    assert summary2["n_rejected"] == len(snap_rows)


def test_run_takedown_cli(ray_session, pages_corpus, tmp_path):
    """Takedown job: removes urls from a checkpointed run via the CLI;
    a second identical submission is an idempotent no-op."""
    import ray.data as rd

    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    from pdf_extraction_ray.sources import spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    out = str(tmp_path / "out")
    clean = run_extraction(pages_corpus, cfg, out_dir=out).to_pandas()
    victims = sorted(clean.url)[:3]
    uf = str(tmp_path / "urls.txt")
    with open(uf, "w") as f:
        f.write("\n".join(victims) + "\n")

    summary = _run(["jobs/run_takedown.py", "--output", out,
                    "--urls-file", uf, "--reason", "optout"])
    assert summary["n_dropped"] == 3
    assert not set(victims) & set(rd.read_parquet(out).to_pandas().url)
    again = _run(["jobs/run_takedown.py", "--output", out,
                  "--urls-file", uf, "--reason", "optout"])
    assert again["n_dropped"] == 0


def test_run_search_cli_phrase(tmp_path):
    """--phrase builds the POSITIONAL index variant, answers token-
    adjacency queries, and the phrase-capable index still serves BM25
    term queries from the same run."""
    import pyarrow.parquet as pq

    idx = str(tmp_path / "pos")
    out = str(tmp_path / "p1")
    summary = _run(["jobs/run_search.py", "--corpus", SF_SMOKE,
                    "--index-dir", idx, "--output", out,
                    "--phrase", "data stream",
                    "--query", "batch table", "--k", "5"])
    assert summary["n_phrases"] == 1 and summary["n_phrase_hits"] > 0
    assert summary["n_hits"] > 0
    ph = pq.read_table(os.path.join(out, "phrase_hits")).to_pandas()
    assert set(ph.columns) == {"doc_id", "n_hits", "first_tok", "phrase_id"}
    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    txt = docs.set_index("doc_id").text.to_dict()
    for _, r in ph.iterrows():
        toks = txt[r.doc_id].split(" ")
        assert toks[r.first_tok] == "data" and toks[r.first_tok + 1] == "stream"


def test_run_incremental_cli(ray_session, tmp_path):
    """MERGE INTO CLI: a delta parquet upserts into an existing store;
    the summary reports the grown store and the vacuum sweep."""
    import pyarrow.parquet as pq

    import ray.data as rd
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines import extraction as E
    from pdf_extraction_ray.sources import corpus, spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES)
    pages_path = corpus.ensure_pages_corpus(SF_SMOKE)
    pages = pq.read_table(pages_path + "/pages.parquet") \
        if os.path.isfile(pages_path + "/pages.parquet") else None
    if pages is None:
        import glob
        files = sorted(glob.glob(pages_path + "/*.parquet"))
        import pyarrow as pa
        pages = pa.concat_tables([pq.read_table(f) for f in files])
    urls = sorted(set(pages["url"].to_pylist()))
    delta_urls = set(urls[:15])
    mask = [u in delta_urls for u in pages["url"].to_pylist()]
    import pyarrow as pa
    base_t = pages.filter(pa.array([not m for m in mask], pa.bool_()))
    delta_t = pages.filter(pa.array(mask, pa.bool_()))
    base_p = str(tmp_path / "base.parquet")
    delta_p = str(tmp_path / "delta.parquet")
    pq.write_table(base_t, base_p)
    pq.write_table(delta_t, delta_p)

    store = str(tmp_path / "store")
    E.run_extraction(base_p, cfg, out_dir=store)
    n_before = rd.read_parquet(store).count()

    summary = _run(["jobs/run_incremental.py", "--delta", delta_p,
                    "--output", store, "--vacuum"])
    assert summary["n_rows"] > n_before
    assert "vacuum" in summary
    out = rd.read_parquet(store).to_pandas()
    assert delta_urls <= set(out.url)
