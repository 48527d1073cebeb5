"""Cluster job entrypoint: ``ray job submit -- python jobs/run_linkgraph.py …``

Runs the link-analytics chain over a pages corpus: WAT-style anchor
extraction + head metadata -> page->page edge table (dead-link pruned)
-> integer PageRank — each landed as parquet under ``--output``; with
``--frontier-from <extracted-dir>`` also the rank x quality re-crawl
priority list. This script OWNS its Ray session (the library never
calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description="Run link-graph analytics")
    p.add_argument("--input", required=True,
                   help="pages parquet directory (url, warc_ts, html, ...)")
    p.add_argument("--output", required=True)
    p.add_argument("--iters", type=int, default=5, help="PageRank rounds")
    p.add_argument("--frontier-from", default=None,
                   help="extraction output dir (url, quality_pct) -> also "
                        "write the top-k re-crawl priority list")
    p.add_argument("--frontier-k", type=int, default=100)
    p.add_argument("--robots-agent", default=None,
                   help="gate the frontier through robots.txt decisions "
                        "for this user-agent (drops disallowed urls; "
                        "writes the full audit to frontier_robots)")
    args = p.parse_args()

    import ray
    ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from pdf_extraction_ray.config import tune_data_context
    from pdf_extraction_ray.pipelines import linkgraph as lg
    tune_data_context()

    # each stage REUSES the one before it (anchors -> edges -> ranks ->
    # frontier): the corpus is sniffed+parsed exactly once, PageRank
    # runs exactly once
    anchors = lg.page_anchors(args.input).materialize()
    anchors.write_parquet(os.path.join(args.output, "anchors"))
    meta = lg.page_metadata(args.input).materialize()
    meta.write_parquet(os.path.join(args.output, "metadata"))
    nodes = lg.page_nodes(args.input)
    edges = lg.link_graph_from_anchors(anchors, nodes).materialize()
    edges.write_parquet(os.path.join(args.output, "edges"))
    ranks = lg.pagerank_from_edges(edges, nodes,
                                   iters=args.iters).materialize()
    ranks.write_parquet(os.path.join(args.output, "ranks"))

    summary = {
        "output": args.output,
        "n_anchors": anchors.count(),
        "n_pages_with_metadata": meta.count(),
        "n_edges": edges.count(),
        "n_ranked": ranks.count(),
    }

    if args.frontier_from:
        import ray.data as rd
        extracted = rd.read_parquet(args.frontier_from)
        frontier = lg.frontier_from_ranks(ranks, extracted,
                                          k=args.frontier_k).materialize()
        if args.robots_agent:
            # site-side access control over the re-crawl list: tag every
            # candidate with its robots verdict (audit trail), then drop
            # the disallowed ones from the actionable frontier
            from pdf_extraction_ray.pipelines.analytics import \
                robots_tag_urls
            tagged = robots_tag_urls(
                frontier, agent=args.robots_agent).materialize()
            tagged.write_parquet(os.path.join(args.output,
                                              "frontier_robots"))
            frontier = tagged.filter(lambda r: r["allowed"]).drop_columns(
                ["allowed", "rule"]).materialize()
            summary["n_robots_blocked"] = tagged.count() - frontier.count()
        frontier.write_parquet(os.path.join(args.output, "frontier"))
        summary["n_frontier"] = frontier.count()

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
