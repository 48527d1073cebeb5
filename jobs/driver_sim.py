"""Driver-equivalent correctness battery: every ``queries()`` entry vs
its ``oracle_sql()`` at sf0.01, in CHUNKED FRESH Ray sessions (~8
queries per subprocess — the Ray 2.49 task_manager crash under many
sequential pipelines in one session is a known quirk), recording
DRIVER_SIM_r{N}.json at the repo root.

Usage:  python jobs/driver_sim.py r4 [--sf /root/testdata/sf0.01]
Chunk mode (internal): python jobs/driver_sim.py --chunk q1,q2,... --sf DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHUNK = 8


def run_chunk(names: list[str], sf: str) -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)
    from tests.oracle_check import compare

    import __ray_entry__ as entrymod
    q, o = entrymod.queries(), entrymod.oracle_sql()
    for name in names:
        t0 = time.time()
        try:
            problems = compare(name, q[name](sf), o[name], sf)
        except Exception as ex:  # noqa: BLE001 — recorded, not raised
            problems = [f"EXC {type(ex).__name__}: {str(ex)[:200]}"]
        print("RESULT " + json.dumps(
            {"name": name, "pass": not problems, "problems": problems,
             "sec": round(time.time() - t0, 2)}), flush=True)
    ray.shutdown()


def main() -> None:
    if "--chunk" in sys.argv:
        i = sys.argv.index("--chunk")
        names = sys.argv[i + 1].split(",")
        sf = sys.argv[sys.argv.index("--sf") + 1]
        run_chunk(names, sf)
        return

    tag = sys.argv[1] if len(sys.argv) > 1 else "rX"
    sf = (sys.argv[sys.argv.index("--sf") + 1]
          if "--sf" in sys.argv else "/root/testdata/sf0.01")
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod
    names = list(entrymod.queries())
    build = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                           cwd=REPO, capture_output=True,
                           text=True).stdout.strip()
    results: dict[str, dict] = {}
    for c0 in range(0, len(names), CHUNK):
        chunk = names[c0:c0 + CHUNK]
        env = {**os.environ, "RAY_DATA_DISABLE_PROGRESS_BARS": "1"}
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--chunk",
                 ",".join(chunk), "--sf", sf],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=3600)
            stdout = p.stdout
            # rc=0 with a missing RESULT line is NOT a crash — e.g. a
            # silently killed Ray worker mid-query (ADVICE r4): name the
            # two failure classes distinctly so triage starts right
            note = (f"chunk crashed (rc={p.returncode})" if p.returncode
                    else "no RESULT emitted (rc=0; query died silently)")
            tail = p.stderr[-400:]
        except subprocess.TimeoutExpired as ex:
            # a hung chunk must not abort the battery and lose every
            # prior chunk's results (review finding)
            def _txt(v):
                return v.decode() if isinstance(v, bytes) else (v or "")
            stdout = _txt(ex.stdout)
            note, tail = "chunk timed out (3600s)", _txt(ex.stderr)[-400:]
        for line in stdout.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r.pop("name")] = r
        for name in chunk:
            if name not in results:
                results[name] = {"pass": False, "problems": [note],
                                 "sec": None, "tail": tail}
        done = sum(1 for r in results.values() if r["pass"])
        print(f"[{c0 + len(chunk)}/{len(names)}] pass={done}", flush=True)
    n_pass = sum(1 for r in results.values() if r["pass"])
    out = {
        "build": build,
        "sf": sf,
        "method": ("tests/oracle_check.compare (driver-equivalent), "
                   f"chunked fresh sessions ({CHUNK}/chunk, "
                   "jobs/driver_sim.py)"),
        "scope": "ALL queries() entries",
        "n_pass": n_pass,
        "n_total": len(names),
        "results": results,
    }
    path = os.path.join(REPO, f"DRIVER_SIM_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{path}: {n_pass}/{len(names)}")


if __name__ == "__main__":
    main()
