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
