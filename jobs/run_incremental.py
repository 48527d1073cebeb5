"""Cluster job entrypoint: ``ray job submit -- python jobs/run_incremental.py …``

Incremental re-crawl ingest (MERGE INTO) for a checkpointed extraction
store: runs the extraction chain over ONLY the delta pages parquet and
merges each result bucket into the existing store (re-crawled urls
replaced, new urls inserted, untouched buckets byte-stable), then
optionally vacuums crash leftovers. Prints a one-line JSON summary.
This script OWNS its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(
        description="Merge a delta crawl into a checkpointed store")
    p.add_argument("--delta", required=True,
                   help="pages parquet path (or dir) holding ONLY the "
                        "new/re-crawled pages")
    p.add_argument("--output", required=True,
                   help="existing checkpointed extraction dir")
    p.add_argument("--n-buckets", type=int, default=None,
                   help="override the bucket count (default: the value "
                        "stamped into _manifests/_run.json)")
    p.add_argument("--vacuum", action="store_true",
                   help="sweep crash leftovers (tmp/claims/orphans) "
                        "after the merge")
    args = p.parse_args()

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from pdf_extraction_ray.config import PipelineConfig, tune_data_context
    from pdf_extraction_ray.pipelines.extraction import (_output_n_buckets,
                                                         upsert_extraction)
    from pdf_extraction_ray.state import checkpoint as ckpt
    tune_data_context()

    # the override is validated against the store's own stamp: a
    # mismatched bucket count would route re-crawled urls to DIFFERENT
    # buckets than their existing rows — the store would silently hold
    # duplicates (review finding)
    stamped = None
    try:
        with open(os.path.join(args.output, "_manifests",
                               "_run.json")) as f:
            stamped = int(json.load(f)["n_buckets"])
    except (OSError, json.JSONDecodeError, KeyError, ValueError):
        pass
    if args.n_buckets is not None:
        if args.n_buckets <= 0:
            p.error("--n-buckets must be positive")
        if stamped is not None and args.n_buckets != stamped:
            p.error(f"--n-buckets {args.n_buckets} contradicts the "
                    f"store's stamped value {stamped}")
        n_buckets = args.n_buckets
    else:
        n_buckets = stamped if stamped is not None \
            else _output_n_buckets(args.output, None)
    cfg = PipelineConfig(n_buckets=n_buckets)
    before = len(ckpt.load_manifests(args.output))
    upsert_extraction(args.delta, cfg, args.output)
    manifests = ckpt.load_manifests(args.output)
    summary = {
        "output": args.output,
        "n_buckets_before": before,
        "n_buckets_after": len(manifests),
        "n_rows": int(sum(m["n_rows"] for m in manifests.values())),
    }
    if args.vacuum:
        summary["vacuum"] = ckpt.vacuum_store(args.output)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
