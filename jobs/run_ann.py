"""Cluster job entrypoint: ``ray job submit -- python jobs/run_ann.py …``

The embedding similarity-search service loop over the persisted IVF
index (stages/similarity.py): ensure the cell-partitioned index over
the standing corpus, optionally fold a NEW vector batch in as per-cell
delta files (frozen coarse quantizer — the incremental-ingest half,
``append_to_ivf_index``), optionally compact the delta files, then
answer top-k cosine queries reading ONLY the probed ``cell=K/``
directories.

Inputs are embeddings-shaped tables (vec_id:int64,
embedding:list<float>). Output: ``<output>/neighbors/`` — (query_id,
neighbor_id, rank) — plus a JSON summary line. This script OWNS its
Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emb_path(p: str) -> str:
    return os.path.join(p, "embeddings.parquet") if os.path.isdir(p) else p


def main() -> int:
    p = argparse.ArgumentParser(description="IVF similarity search job")
    p.add_argument("--corpus", required=True,
                   help="directory containing embeddings.parquet (the "
                        "standing corpus the index covers) or a parquet "
                        "path")
    p.add_argument("--index-dir", required=True,
                   help="persisted IVF index location (built here if "
                        "absent or stale)")
    p.add_argument("--output", required=True)
    p.add_argument("--append", default=None,
                   help="parquet path/dir with a NEW (vec_id, embedding) "
                        "batch to fold into the index (idempotent per "
                        "batch)")
    p.add_argument("--compact", action="store_true",
                   help="merge per-cell delta files after the append")
    p.add_argument("--queries", default=None,
                   help="parquet path with (vec_id, embedding) query "
                        "rows; default: the corpus' 5 smallest vec_ids")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--n-centroids", type=int, default=16)
    args = p.parse_args()

    import numpy as np
    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    import ray.data as rd

    from pdf_extraction_ray.config import tune_data_context
    from pdf_extraction_ray.stages import similarity as sim
    tune_data_context()

    corpus = rd.read_parquet(_emb_path(args.corpus),
                             columns=["vec_id", "embedding"]).materialize()
    sim.ensure_ivf_index(corpus, args.index_dir,
                         n_centroids=args.n_centroids)

    meta = None
    compact_stats = None
    if args.append:
        batch = rd.read_parquet(_emb_path(args.append),
                                columns=["vec_id", "embedding"])
        meta = sim.append_to_ivf_index(batch, args.index_dir)
    if args.compact:
        # also valid WITHOUT --append: merge deltas left by earlier runs
        compact_stats = sim.compact_ivf_index(args.index_dir)

    if args.queries:
        qdf = rd.read_parquet(_emb_path(args.queries),
                              columns=["vec_id", "embedding"]).to_pandas()
        qdf = qdf.sort_values("vec_id")
    else:
        qdf = corpus.sort("vec_id").limit(5).to_pandas()
    qmat = np.stack(qdf["embedding"].to_numpy())
    qids = qdf["vec_id"].tolist()

    out = sim.topk_cosine_ivf_indexed(
        args.index_dir, qmat, qids, k=args.k, n_probe=args.n_probe
    ).materialize()
    out.write_parquet(os.path.join(args.output, "neighbors"))

    print(json.dumps({
        "output": args.output,
        "n_queries": len(qids),
        "n_neighbors": int(out.count()),
        "index_n_rows": None if meta is None else int(meta["n_rows"]),
        "index_n_appended": None if meta is None
        else int(meta.get("n_appended", 0)),
        "compacted": compact_stats,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
