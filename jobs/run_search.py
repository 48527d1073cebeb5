"""Cluster job entrypoint: ``ray job submit -- python jobs/run_search.py …``

The full-text search service loop over the persisted term-partitioned
inverted index (stages/textindex.py): ensure the index over the
standing corpus, optionally fold a NEW document batch in as delta
postings (``--append``, at-least-once-safe), optionally compact the
delta files, then answer BM25 top-k queries reading ONLY the
``part=K/`` directories the query terms hash into.

Inputs are documents-shaped tables (doc_id:int64, text). Output:
``<output>/hits/`` — (query_id, doc_id, score, rank) — plus a JSON
summary line. This script OWNS its Ray session (the library never
calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs_path(p: str) -> str:
    return os.path.join(p, "documents.parquet") if os.path.isdir(p) else p


def main() -> int:
    p = argparse.ArgumentParser(description="BM25 search job")
    p.add_argument("--corpus", required=True,
                   help="directory containing documents.parquet (the "
                        "standing corpus the index covers) or a parquet "
                        "path")
    p.add_argument("--index-dir", required=True,
                   help="persisted inverted-index location (built here "
                        "if absent or stale)")
    p.add_argument("--output", required=True)
    p.add_argument("--append", default=None,
                   help="parquet path/dir with a NEW (doc_id, text) "
                        "batch to fold into the index (idempotent per "
                        "batch)")
    p.add_argument("--compact", action="store_true",
                   help="merge per-partition delta files (also valid "
                        "without --append)")
    p.add_argument("--query", action="append", default=[],
                   help="whitespace-separated query terms; repeatable — "
                        "query_id = position")
    p.add_argument("--phrase", action="append", default=[],
                   help="quoted-phrase query (token adjacency); needs a "
                        "POSITIONAL index — implies --positions")
    p.add_argument("--positions", action="store_true",
                   help="build/require the positional index variant "
                        "(phrase-capable; larger postings)")
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    import ray.data as rd

    from pdf_extraction_ray.config import tune_data_context
    from pdf_extraction_ray.stages import textindex as ti
    tune_data_context()

    corpus = rd.read_parquet(_docs_path(args.corpus),
                             columns=["doc_id", "text"])
    # stamp_ds: the warm-path freshness check must read ONLY the id
    # column (select_columns on `corpus` would not retro-prune its
    # parquet read — ensure_inverted_index's documented hazard)
    ti.ensure_inverted_index(
        corpus, args.index_dir,
        stamp_ds=rd.read_parquet(_docs_path(args.corpus),
                                 columns=["doc_id"]),
        positions=bool(args.positions or args.phrase))

    meta = None
    compact_stats = None
    if args.append:
        batch = rd.read_parquet(_docs_path(args.append),
                                columns=["doc_id", "text"])
        meta = ti.append_to_index(batch, args.index_dir)
    if args.compact:
        compact_stats = ti.compact_index(args.index_dir)

    queries = {i: tuple(q.split()) for i, q in enumerate(args.query)}
    n_hits = 0
    if queries:
        hits = ti.bm25_topk_indexed(args.index_dir, queries,
                                    k=args.k).materialize()
        hits.write_parquet(os.path.join(args.output, "hits"))
        n_hits = int(hits.count())

    n_phrase_hits = 0
    if args.phrase:
        import pyarrow as pa
        parts = []
        for pid, phrase in enumerate(args.phrase):
            t = (ti.phrase_search_indexed(args.index_dir, phrase)
                 .materialize())
            parts.append(t.map_batches(
                lambda b, pid=pid: b.append_column(
                    "phrase_id", pa.array([pid] * b.num_rows,
                                          pa.int64())),
                batch_format="pyarrow"))
        ph = parts[0]
        for extra in parts[1:]:
            ph = ph.union(extra)
        ph = ph.materialize()
        ph.write_parquet(os.path.join(args.output, "phrase_hits"))
        n_phrase_hits = int(ph.count())

    print(json.dumps({
        "output": args.output,
        "n_queries": len(queries),
        "n_hits": n_hits,
        "n_phrases": len(args.phrase),
        "n_phrase_hits": n_phrase_hits,
        "index_n_docs": None if meta is None else int(meta["n_docs"]),
        "compacted": compact_stats,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
