"""Cluster job entrypoint: ``ray job submit -- python jobs/run_snapshot_ingest.py …``

The standing-corpus NEAR-dup ingest loop (the FineWeb/CCNet
cross-snapshot shape): a persisted MinHash-LSH index over the
already-ingested corpus admits only snapshot documents with no
verified near-duplicate — re-crawls with small edits, mirror copies
and syndicated text are rejected without recomputing anything over
the old corpus. With ``--append`` the admitted docs fold into the
index as delta files, so the NEXT snapshot probes an index that
already contains this one (stages/dedup.py:append_to_minhash_index).

Inputs are documents-shaped tables (doc_id:int64, text). Outputs:
``<output>/decisions/`` — one row per snapshot doc (status dup|novel,
dup_of, agree_k) — and ``<output>/admitted/`` — the surviving rows.
This script OWNS its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description="Near-dup snapshot ingest")
    p.add_argument("--corpus", required=True,
                   help="directory containing documents.parquet "
                        "(the standing corpus the index covers)")
    p.add_argument("--snapshot", required=True,
                   help="parquet path/dir with the new snapshot's "
                        "(doc_id, text) rows")
    p.add_argument("--index-dir", required=True,
                   help="persisted MinHash-LSH index location "
                        "(built here if absent or stale)")
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Jaccard admit threshold (default 0.5)")
    p.add_argument("--append", action="store_true",
                   help="fold admitted docs into the index "
                        "(idempotent per batch)")
    args = p.parse_args()

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    import ray.data as rd

    from pdf_extraction_ray.config import tune_data_context
    from pdf_extraction_ray.stages import dedup as dd
    from pdf_extraction_ray.stages.joins import hash_join
    tune_data_context()

    corpus = rd.read_parquet(
        os.path.join(args.corpus, "documents.parquet")
        if os.path.isdir(args.corpus) else args.corpus,
        columns=["doc_id", "text"])
    snap = rd.read_parquet(args.snapshot, columns=["doc_id", "text"])

    dd.ensure_minhash_index(corpus, args.index_dir)
    decisions = dd.snapshot_neardup_statuses(
        snap, args.index_dir, jaccard_threshold=args.threshold
    ).materialize()
    decisions.write_parquet(os.path.join(args.output, "decisions"))

    import pyarrow.compute as pc
    novel_ids = decisions.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "novel"))
                   .select(["doc_id"]),
        batch_format="pyarrow")
    admitted = hash_join(snap, novel_ids, "doc_id", "doc_id",
                         ["text"], [], how="semi").materialize()
    admitted.write_parquet(os.path.join(args.output, "admitted"))

    n_total = decisions.count()
    n_admitted = admitted.count()
    meta = None
    if args.append and n_admitted:
        meta = dd.append_to_minhash_index(admitted, args.index_dir)

    print(json.dumps({
        "output": args.output,
        "n_snapshot": int(n_total),
        "n_admitted": int(n_admitted),
        "n_rejected": int(n_total - n_admitted),
        "index_n_docs": None if meta is None else int(meta["n_docs"]),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
