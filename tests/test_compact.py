"""Small-file compaction: fewer, target-sized files; content preserved;
resumable (existing groups skipped)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extraction_ray.state.compact import compact_parquet, plan_groups


def _write_small_files(d, n=20, rows_each=100):
    os.makedirs(d, exist_ok=True)
    files = []
    for i in range(n):
        t = pa.table({"k": pa.array(range(i * rows_each, (i + 1) * rows_each),
                                    pa.int64()),
                      "v": pa.array([f"row-{i}-{j}" for j in range(rows_each)],
                                    pa.string())})
        p = os.path.join(d, f"small-{i:03d}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def test_plan_groups_deterministic_and_bounded(tmp_path):
    files = _write_small_files(str(tmp_path / "in"))
    g1 = plan_groups(files, target_mb=1)
    g2 = plan_groups(list(reversed(files)), target_mb=1)
    assert g1 == g2  # order-insensitive (sorted inside)
    assert [f for g in g1 for f in g] == sorted(files)  # nothing dropped


def test_compact_preserves_rows_and_resumes(ray_session, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    files = _write_small_files(in_dir)
    total_sz = sum(os.path.getsize(f) for f in files)
    target_mb = max(1, int(total_sz / 4 / 1e6) + 1)

    res = compact_parquet(files, out_dir, target_mb=target_mb)
    outs = sorted(glob.glob(os.path.join(out_dir, "compact-*.parquet")))
    assert res["n_out"] == len(outs) < len(files)
    assert res["skipped"] == 0

    before = pa.concat_tables([pq.read_table(f) for f in files])
    after = pa.concat_tables([pq.read_table(f) for f in outs])
    assert after.num_rows == before.num_rows
    assert sorted(after["k"].to_pylist()) == sorted(before["k"].to_pylist())

    # resume: delete one output, re-run — only that group is redone
    mtimes = {f: os.path.getmtime(f) for f in outs}
    os.remove(outs[0])
    res2 = compact_parquet(files, out_dir, target_mb=target_mb)
    assert res2["skipped"] == len(outs) - 1
    for f in outs[1:]:
        assert os.path.getmtime(f) == mtimes[f]
    assert os.path.exists(outs[0])


def test_compact_invalidates_on_changed_input(ray_session, tmp_path):
    """A changed input listing renumbers groups — resume must NOT reuse
    outputs from the old plan (stale/fresh mixing); the plan digest
    invalidates them all."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    files = _write_small_files(in_dir, n=8)
    compact_parquet(files, out_dir, target_mb=1)
    outs1 = sorted(glob.glob(os.path.join(out_dir, "compact-*.parquet")))

    files2 = files + _write_small_files(in_dir + "2", n=2)
    res = compact_parquet(files2, out_dir, target_mb=1)
    assert res["skipped"] == 0  # every prior output invalidated
    outs2 = sorted(glob.glob(os.path.join(out_dir, "compact-*.parquet")))
    before = pa.concat_tables([pq.read_table(f) for f in files2])
    after = pa.concat_tables([pq.read_table(f) for f in outs2])
    assert after.num_rows == before.num_rows  # no dup/missing rows
    assert len(outs2) >= len(outs1)
