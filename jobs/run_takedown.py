"""Cluster job entrypoint: ``ray job submit -- python jobs/run_takedown.py …``

Applies a compliance removal (opt-out / right-to-be-forgotten / DMCA)
to a checkpointed extraction output: registers the request durably,
drops the rows from their buckets atomically, and prints a one-line
JSON summary. The registry makes the removal stick — later resumes,
verify-resumes and snapshot refreshes all honor it. This script OWNS
its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description="Apply a takedown request")
    p.add_argument("--output", required=True,
                   help="checkpointed extraction dir (bucket=*/ layout)")
    p.add_argument("--urls-file", default=None,
                   help="file with one url to remove per line")
    p.add_argument("--hashes-file", default=None,
                   help="file with one text_sha256 to remove per line "
                        "(resolved to urls by a column-pruned scan)")
    p.add_argument("--reason", default="takedown")
    p.add_argument("--n-buckets", type=int, default=None,
                   help="override the bucket count (default: the value "
                        "the run stamped into _manifests/_run.json)")
    args = p.parse_args()
    if not args.urls_file and not args.hashes_file:
        p.error("need --urls-file and/or --hashes-file")

    def read_lines(path):
        if not path:
            return None
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from pdf_extraction_ray.config import PipelineConfig, tune_data_context
    from pdf_extraction_ray.pipelines.extraction import takedown
    tune_data_context()

    cfg = (PipelineConfig(n_buckets=args.n_buckets)
           if args.n_buckets else None)
    summary = takedown(args.output, cfg,
                       urls=read_lines(args.urls_file),
                       text_sha256=read_lines(args.hashes_file),
                       reason=args.reason)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
