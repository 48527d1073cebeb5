"""Cluster job entrypoint: ``ray job submit -- python jobs/run_curation.py …``

Runs the composed training-data curation chain
(``analytics.curate_pipeline``: quality rules -> benchmark exclusion ->
exact dedup -> 8-gram decontamination -> deterministic shuffle + shard)
over a documents table and lands the training-ready manifest as
``shard=K/`` hive-partitioned parquet. This script OWNS its Ray session
(the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description="Run the curation pipeline")
    p.add_argument("--input", required=True,
                   help="directory containing documents.parquet")
    p.add_argument("--output", required=True,
                   help="sharded manifest output (shard=K/ parquet)")
    args = p.parse_args()

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data.aggregate import Count, Sum

    from pdf_extraction_ray.config import tune_data_context
    from pdf_extraction_ray.pipelines.analytics import curate_pipeline
    tune_data_context()

    out = curate_pipeline(args.input, out_dir=args.output)
    stats = out.groupby("shard").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens")).to_pandas()
    print(json.dumps({
        "output": args.output,
        "n_docs": int(stats["n_docs"].sum()),
        "n_tokens": int(stats["n_tokens"].sum()),
        "n_shards": int(len(stats)),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
