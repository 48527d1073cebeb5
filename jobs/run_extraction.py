"""Cluster job entrypoint: ``ray job submit -- python jobs/run_extraction.py …``

The deployment shape the north rule names: a fixed-size multi-node Ray
cluster runs this script against a Parquet corpus; the run is resumable
(re-submit after a failure and finished url-hash buckets are skipped via
their manifests), and the run report lands in
``<output>/_manifests/_run.json``.

In this sandbox it runs against the local session
(``RAY_ADDRESS=local``); on a real cluster ``ray job submit`` sets
RAY_ADDRESS to the head node and the same code path applies.

This script OWNS its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description="Run the extraction pipeline")
    p.add_argument("--input", required=True,
                   help="pages parquet directory (url, warc_ts, html, text, lang)")
    p.add_argument("--output", required=True,
                   help="checkpointed output directory (bucket=*/ + _manifests/)")
    p.add_argument("--n-buckets", type=int, default=64,
                   help="url-hash partitions; size so one bucket's output "
                        "fits a worker (corpus_bytes / ~500MB)")
    p.add_argument("--max-bytes", type=int, default=200 * 1024 * 1024,
                   help="payload size cap (reference: 200 MB)")
    p.add_argument("--split-pages", type=int, default=8,
                   help="PDFs above this page count shard into page ranges")
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--retry", action="store_true",
                   help="after the main run, retry partial rows (cap 5)")
    p.add_argument("--refresh-old-pages", default=None,
                   help="treat --input as a NEW crawl snapshot of this "
                        "older pages corpus: skip the full run and apply "
                        "only the content-hash delta to --output "
                        "(targeted drops + re-extraction)")
    p.add_argument("--notify-url", default=None,
                   help="HTTPS target for the signed run-completion "
                        "notification (SSRF-guarded; lands in "
                        "<output>/_outbox for a relay to drain)")
    p.add_argument("--notify-key", default=None,
                   help="HMAC-SHA256 key signing the notification payload")
    args = p.parse_args()

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from pdf_extraction_ray.config import PipelineConfig, tune_data_context
    from pdf_extraction_ray.pipelines.extraction import run_extraction, run_retry
    tune_data_context()

    cfg = PipelineConfig(max_bytes=args.max_bytes, n_buckets=args.n_buckets,
                         split_page_threshold=args.split_pages,
                         notify_url=args.notify_url,
                         notify_key=args.notify_key)
    if args.refresh_old_pages:
        from pdf_extraction_ray.pipelines.extraction import refresh_extraction
        summary = refresh_extraction(args.refresh_old_pages, args.input,
                                     args.output, cfg)
    else:
        run_extraction(args.input, cfg, out_dir=args.output,
                       dedup=not args.no_dedup)
        summary_path = os.path.join(args.output, "_manifests", "_run.json")
        summary = json.load(open(summary_path))
    if args.retry:
        summary["retry"] = run_retry(args.input, args.output, cfg)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
