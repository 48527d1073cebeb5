"""The flagship pipeline: pages corpus → extracted main text.

Single-pass dataflow (SURVEY.md §7, BASELINE.json north_star):

    read_parquet(pages)
      → sniff/validate (stateless map_batches, zero-copy Arrow)
      → resume filter (finished url-hash buckets skipped via manifests)
      → ExtractOrSplit: full extraction for normal documents (final
        rows); oversized PDFs structurally split into page-range
        fragment rows carrying only their own content streams
      → ParseFragments: tokenizes fragment rows (block-parallel),
        passes final rows through
      → groupby(bucket) — THE one all-to-all: url-hash repartition
      → finalize_bucket: groupby-url fragment reassembly with span
        re-basing + exact first-wins dedup, local to the bucket
        [checkpointed mode: + atomic bucket write + manifest]

Co-location invariant: ``bucket = stable_hash(url) % n_buckets``, so all
rows of a url (duplicates, page-range fragments) land in one bucket task;
reassembly and dedup never need a second shuffle. Duplicate payloads are
extracted before being deduplicated (~2% waste at the reference dup rate)
— the price of dropping the metadata pre-pass a keyed anti-join would
need; ``stages.dedup.build_keep_map`` remains available when the dup rate
is high enough to justify two passes.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages import extract as ex
from ..state import checkpoint as ckpt


@contextmanager
def _shuffle_ctx(cfg: PipelineConfig):
    """Scope Ray Data's HASH_SHUFFLE strategy to this pipeline's lineage.

    The DataContext snapshots into each dataset at creation and derived
    datasets inherit it, so flipping the global strategy around dataset
    CONSTRUCTION (not execution) pins hash shuffling to the flagship
    lineage without leaking into other queries' groupbys.
    """
    if cfg.finalize_shuffle != "hash":
        yield
        return
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    old = ctx.shuffle_strategy
    old_block = ctx.target_max_block_size
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # hash-partition blocks must hold WHOLE buckets (finalize runs per
    # block): raise the block cap so a partition is one block — the
    # documented memory trade of hash mode (each partition's buckets
    # resident at once; the checkpointed path additionally guards with
    # claim markers so a straddle is loud, not silent)
    ctx.target_max_block_size = max(old_block or 0, 1 << 31)
    try:
        yield
    finally:
        ctx.shuffle_strategy = old
        ctx.target_max_block_size = old_block


def _finalize_partitions(cfg: PipelineConfig) -> int:
    if cfg.finalize_num_partitions:
        return cfg.finalize_num_partitions
    import ray

    ncpu = 8
    if ray.is_initialized():
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001 — sizing hint only
            pass
    return max(8, min(cfg.n_buckets, ncpu))


def _read_num_blocks(pages_path: str) -> int | None:
    """Read-task count sized for wave parallelism: the fused
    sniff→extract chain inherits the read's block granularity, and a
    task count near the CPU count loses a whole wave to the slowest
    block (measured: 33 tasks on 32 CPUs ran 2 full waves — 4.9 s wall
    for 72 s of CPU; ~4 waves of smaller tasks cut the straggler tail
    to one short task). Targets ≈4 tasks per CPU, floored so a block
    stays ≥~2 MB (tiny test corpora keep few blocks), capped by the
    128 MB natural split so a 100 TB corpus is NOT coalesced into
    4×CPUs giant blocks. None (natural splitting) when sizes can't be
    listed locally. ``GRAFT_READ_NUM_BLOCKS`` overrides: an integer
    forces that count, ``natural`` disables the override (A/B lever for
    bench comparisons on this noise-prone host)."""
    import math

    import ray

    env = os.environ.get("GRAFT_READ_NUM_BLOCKS")
    if env == "natural":
        return None
    if env:
        return int(env)

    try:
        total = sum(e.stat().st_size for e in os.scandir(pages_path)
                    if e.name.endswith(".parquet"))
    except OSError:
        return None
    if not total:
        return None
    ncpu = 8
    if ray.is_initialized():
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001 — sizing hint only
            pass
    # sizes are ON-DISK parquet bytes: web text compresses ~10x, so the
    # per-block floor is 256 KB on disk (~2-4 MB decoded in memory)
    want = max(4 * ncpu, math.ceil(total / (128 << 20)))
    cap = max(ncpu, math.ceil(total / (256 << 10)))
    return min(want, cap)


def _plain_pages_read(pages_path: str) -> rd.Dataset:
    """The flagship's no-predicate corpus read: the row-group-planned
    PagesParquetDatasource (one ReadTask per wave-sized unit — ~2-3x
    less read CPU than the generic reader; sources/readers.py documents
    why it must be a real Datasource), falling back to
    ``rd.read_parquet`` whenever planning declines
    (non-local/unlistable paths, >10k files, GRAFT_READ_NUM_BLOCKS
    override in force for A/B runs)."""
    from ..sources.readers import (pages_parquet_datasource,
                                   plan_pages_read_units)

    target = _read_num_blocks(pages_path)
    units = None
    if target is not None and not os.environ.get("GRAFT_READ_NUM_BLOCKS"):
        units = plan_pages_read_units(pages_path, target)
    if units is None:
        return rd.read_parquet(pages_path, override_num_blocks=target)
    return rd.read_datasource(pages_parquet_datasource(units))


def sniffed_pages(pages_path: "str | rd.Dataset", cfg: PipelineConfig,
                  skip_buckets: set[int] | None = None,
                  url_filter: list[str] | None = None) -> rd.Dataset:
    """Read + sniff the pages corpus (a parquet path, or any pre-built
    pages-schema Dataset from the format readers — jsonl / glob / WARC).

    ``url_filter`` pushes an exact url predicate into the parquet scan
    (row-group stats prune whole groups; non-matching rows never surface)
    — the retry pass uses it so re-extracting a handful of partial rows
    does not re-sniff the whole corpus.
    """
    if isinstance(pages_path, rd.Dataset):
        # pre-built pages Dataset (a format reader: sources/readers.py
        # jsonl / directory-glob / WARC). Read sizing already happened
        # at that source; the url_filter pushdown is parquet-only, so
        # apply it as a plain filter here.
        ds = pages_path
        if url_filter is not None:
            want = pa.array(url_filter, pa.string())
            ds = ds.map_batches(
                lambda b: b.filter(pc.is_in(b["url"], value_set=want)),
                batch_format="pyarrow")
    elif url_filter is not None:
        ds = rd.read_parquet(pages_path,
                             filter=pc.field("url").isin(url_filter))
    else:
        ds = _plain_pages_read(pages_path)
    # batch_size=None: one call per BLOCK, so task bundling follows the
    # read's wave-sized blocks (a row-count batch_size here made Ray
    # coalesce blocks into ~CPU-count bundles — the 2-wave tail above)
    ds = ds.map_batches(lambda b: ex.sniff_validate_batch(b, cfg),
                        batch_format="pyarrow", batch_size=None)
    if skip_buckets:
        skip = pa.array(sorted(skip_buckets), pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(batch["bucket"], value_set=skip)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds


def _work_stream(pages_path: str, cfg: PipelineConfig,
                 skip_buckets: set[int] | None = None,
                 exclude_urls: set[str] | None = None) -> rd.Dataset:
    base = sniffed_pages(pages_path, cfg, skip_buckets)
    if exclude_urls:
        # takedown registry enforcement: a recomputed bucket must not
        # resurrect removed urls (broadcast once; one vectorized is_in)
        base = base.map_batches(ckpt.banned_url_filter(exclude_urls),
                                batch_format="pyarrow")
    if cfg.use_actors:
        kwargs = dict(concurrency=cfg.extract_concurrency, num_cpus=1)
        work = base.map_batches(ex.ExtractOrSplit, fn_constructor_args=(cfg,),
                                batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size, **kwargs)
        work = work.map_batches(ex.ParseFragments, fn_constructor_args=(cfg,),
                                batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size, **kwargs)
    else:
        work = base.map_batches(ex.ExtractOrSplit(cfg), batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size)
        work = work.map_batches(ex.ParseFragments(cfg), batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size)
    return work


def extracted_dataset(pages_path: str,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      dedup: bool = True,
                      skip_buckets: set[int] | None = None) -> rd.Dataset:
    """The lazy OUT_SCHEMA dataset (no checkpointing)."""
    with _shuffle_ctx(cfg):
        work = _work_stream(pages_path, cfg, skip_buckets)
        if cfg.finalize_shuffle == "hash":
            return (work
                    .repartition(num_blocks=_finalize_partitions(cfg),
                                 keys=["bucket"])
                    .map_batches(
                        lambda g, cfg=cfg, dd=dedup: ex.finalize_bucket(
                            g, cfg, dd),
                        batch_size=None, batch_format="pyarrow"))
        return work.groupby("bucket").map_groups(
            lambda g, cfg=cfg, dd=dedup: ex.finalize_bucket(g, cfg, dd),
            batch_format="pyarrow")


def run_retry(pages_path: str,
              out_dir: str,
              cfg: PipelineConfig = DEFAULT_CONFIG,
              max_attempts: int = 5,
              retry_batch_limit: int = 100_000) -> dict:
    """Semantic retry pass over a checkpointed run (reference semantics:
    duplicate found with status partial/failed → retry with retry_count+1,
    cap 5 → review queue; app/routers/extraction.py:155-190,330-355).

    Re-extracts rows whose status is ``partial`` with attempts <
    ``max_attempts`` (attempts+1), merges them back into their buckets
    atomically, and quarantines rows that exhausted the cap into
    ``out_dir/_quarantine/`` (the review-queue analog). Returns a summary.

    Driver state is BOUNDED: the partial rows stream through a capped
    fold (only (url, attempts) pairs are kept, at most
    ``retry_batch_limit`` of them — the targeted re-read needs the url
    list on the driver to push the predicate into the parquet scan), so
    a poison pattern marking a large corpus fraction partial cannot OOM
    the driver (the round-2 version ``to_pandas()``-ed every partial
    row). Eligible rows beyond the cap are reported as ``n_deferred``;
    re-invoke until it reaches 0.
    """
    import shutil

    import ray

    existing = rd.read_parquet(
        out_dir, columns=["url", "attempts", "error", "status"])

    def failed_rows(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["status"], "partial")
        return batch.filter(mask).select(["url", "attempts", "error"])

    # streamed capped fold — never a whole-corpus driver frame
    n_partial = 0
    n_eligible = 0
    att_map: dict[str, int] = {}
    for b in (existing.map_batches(failed_rows, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")):
        n_partial += b.num_rows
        # the reference never retries permanent errors
        # (app/utils/retry.py:21-34: 400/404/422 fail fast);
        # deterministic parse failures are the analog
        elig = b.filter(pc.and_(
            pc.less(b["attempts"], max_attempts),
            pc.invert(pc.starts_with(b["error"], "permanent:"))))
        n_eligible += elig.num_rows
        room = retry_batch_limit - len(att_map)
        if room > 0:
            for u, a in zip(elig["url"].to_pylist()[:room],
                            elig["attempts"].to_pylist()[:room]):
                att_map[u] = a + 1

    summary = {"n_partial": n_partial, "n_retried": len(att_map),
               "n_quarantined": 0, "n_recovered": 0,
               "n_deferred": n_eligible - len(att_map)}
    if n_partial == 0:
        return summary

    if att_map:
        ref = ray.put(att_map)

        def bump_attempts(batch: pa.Table) -> pa.Table:
            # membership is already enforced by the read predicate; this
            # only rewrites the attempts column
            m = ray.get(ref)
            new_att = pa.array([m.get(u, 1) for u in batch["url"].to_pylist()],
                               pa.int64())
            return batch.set_column(batch.schema.get_field_index("attempts"),
                                    "attempts", new_att)

        # targeted read: only the retried urls leave storage (predicate
        # pushed into the parquet scan), and the lineage executes ONCE —
        # both the merge and the recovered count read the materialized rows
        retried = (sniffed_pages(pages_path, cfg, url_filter=list(att_map))
                   .map_batches(bump_attempts, batch_format="pyarrow")
                   .map_batches(ex.ExtractorActor(cfg), batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size)
                   .materialize())
        merged = retried.groupby("bucket").map_groups(
            lambda g: ckpt.merge_bucket_group(g, out_dir),
            batch_format="pyarrow")
        merged.take_all()
        recovered = retried.map_batches(
            lambda b: b.filter(pc.equal(b["status"], "completed"))
                       .select(["url"]), batch_format="pyarrow").count()
        summary["n_recovered"] = recovered

    # a retry can exhaust a url THIS invocation (attempts hits the
    # cap and the row stays partial) — the quarantine pass must see
    # the post-merge state, and the summary reports what the pass
    # actually wrote, not a pre-merge estimate; deferred (capped-out)
    # rows match neither predicate and stay for the next invocation
    def exhausted_rows(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["status"], "partial"),
            pc.or_(pc.greater_equal(batch["attempts"], max_attempts),
                   pc.starts_with(batch["error"], "permanent:")))
        return batch.filter(mask)

    # streamed, distributed quarantine write (never concatenated on the
    # driver — a corpus-wide poison pattern stays bounded per task);
    # the fresh directory swaps in after the write completes
    qdir = os.path.join(out_dir, "_quarantine")
    qtmp = os.path.join(out_dir, "_quarantine.tmp")
    shutil.rmtree(qtmp, ignore_errors=True)
    (rd.read_parquet(out_dir)
       .map_batches(exhausted_rows, batch_format="pyarrow")
       .write_parquet(qtmp))
    # a zero-exhausted pass writes no files (and possibly no dir)
    os.makedirs(qtmp, exist_ok=True)
    shutil.rmtree(qdir, ignore_errors=True)
    os.replace(qtmp, qdir)
    summary["n_quarantined"] = rd.read_parquet(qdir).count()

    return summary


def load_review_queue(out_dir: str) -> rd.Dataset:
    """The review-queue surface: quarantined rows ⋈ their bucket's
    manifest context (reference: review_queue rows inner-joined with
    extractions for file context, app/db/review_queue.py:91-114).

    Quarantine rows are already denormalized extraction rows; the bucket
    manifests are a tiny dimension side, so the join is a broadcast dict
    lookup — no shuffle. Returns the quarantined rows with
    bucket_n_rows / bucket_n_partial counters attached (empty dataset
    with the right shape when nothing is quarantined).
    """
    import ray

    qdir = os.path.join(out_dir, "_quarantine")
    manifests = ckpt.load_manifests(out_dir)
    ctx = {b: (m["n_rows"], m["n_partial"]) for b, m in manifests.items()}
    ref = ray.put(ctx)

    if not os.path.isdir(qdir) or not any(
            f.endswith(".parquet") for f in os.listdir(qdir)):
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "error": pa.array([], pa.string()),
            "attempts": pa.array([], pa.int64()),
            "bucket_n_rows": pa.array([], pa.int64()),
            "bucket_n_partial": pa.array([], pa.int64()),
        }))

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        buckets = batch["bucket"].to_pylist()
        rows = [m.get(b, (0, 0)) for b in buckets]
        return (batch
                .append_column("bucket_n_rows",
                               pa.array([r[0] for r in rows], pa.int64()))
                .append_column("bucket_n_partial",
                               pa.array([r[1] for r in rows], pa.int64())))

    return rd.read_parquet(qdir).map_batches(attach, batch_format="pyarrow")


def refresh_extraction(old_pages_path: str, new_pages_path: str,
                       out_dir: str,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       delta_batch_limit: int = 100_000) -> dict:
    """Incremental SNAPSHOT REFRESH of a checkpointed run: given the
    pages the existing output was extracted from and a NEW crawl
    snapshot, re-extract ONLY the delta — the incremental-crawl story
    that makes a 100 TB re-crawl pay for its changes, not its size.

    1. ``analytics.pages_delta_tables(old, new)`` classifies every url
       (added / removed / changed / unchanged) by content hash —
       ids-only exchanges, payloads never shuffle.
    2. removed + changed urls are DROPPED from their buckets (targeted
       atomic rewrites, the backfill_lineage shape).
    3. added + changed urls are re-extracted FROM THE NEW SNAPSHOT with
       the url predicate pushed into the scan (the run_retry shape) and
       merged into their buckets atomically.
    Unchanged urls are never read, parsed, or rewritten.

    Driver state is BOUNDED like run_retry: at most
    ``delta_batch_limit`` delta urls are acted on per invocation
    (reported as ``n_deferred``; re-invoke until 0 — the pass is
    idempotent, a crash mid-refresh re-drops no-ops and re-merges
    identical rows). Returns a summary dict."""
    from .analytics import pages_delta_tables

    delta = pages_delta_tables(old_pages_path, new_pages_path)
    # takedown registry: a removed url whose content CHANGED in the new
    # snapshot must not be re-admitted by the refresh (banned hashes
    # sweep at pass end — an ADDED url carrying banned content has no
    # hash until it is extracted)
    banned, banned_hashes = ckpt.load_takedowns(out_dir)

    counts = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    stale: list[str] = []      # rows to drop from the output
    new_work: list[str] = []   # urls to (re-)extract from the snapshot
    n_deferred = 0
    for b in delta.iter_batches(batch_format="pyarrow"):
        for url, st in zip(b["url"].to_pylist(), b["status"].to_pylist()):
            counts[st] += 1
            if st == "unchanged":
                continue
            if len(stale) + len(new_work) >= 2 * delta_batch_limit:
                n_deferred += 1
                continue
            if st in ("removed", "changed"):
                stale.append(url)
            if st in ("added", "changed") and url not in banned:
                new_work.append(url)

    summary = {"n_" + k: v for k, v in counts.items()}
    summary["n_deferred"] = n_deferred

    # targeted drops: group stale urls by the engine's one partitioning
    # key; only touched buckets are rewritten
    from collections import defaultdict

    from ..functions.hashing import url_bucket
    by_bucket: dict[int, set] = defaultdict(set)
    for u in stale:
        by_bucket[url_bucket(u, cfg.n_buckets)].add(u)
    summary["n_dropped"] = sum(
        ckpt.drop_urls_from_bucket(out_dir, bkt, us)
        for bkt, us in sorted(by_bucket.items()))

    summary["n_reextracted"] = 0
    if new_work:
        fresh = (sniffed_pages(new_pages_path, cfg, url_filter=new_work)
                 .map_batches(ex.ExtractorActor(cfg), batch_format="pyarrow",
                              batch_size=cfg.extract_batch_size)
                 .materialize())
        (fresh.groupby("bucket")
              .map_groups(lambda g: ckpt.merge_bucket_group(g, out_dir),
                          batch_format="pyarrow")
              .take_all())
        summary["n_reextracted"] = fresh.count()
    if banned_hashes:
        # sweep hash-identified takedowns: an ADDED/CHANGED url whose
        # extracted text carries a banned hash must not survive the pass
        summary["n_hash_swept"] = _drop_banned_urls(
            out_dir, cfg.n_buckets,
            _resolve_banned_hashes(out_dir, banned_hashes))
    return summary


def _output_n_buckets(out_dir: str, cfg: "PipelineConfig | None") -> int:
    """The bucket count a checkpointed output was written with: explicit
    cfg wins, else the recorded value in ``_run.json`` (write_run_summary
    stamps it), else the library default. A takedown against the wrong
    count would open the wrong bucket dirs and silently drop nothing —
    which is why the run stamps it."""
    if cfg is not None:
        return cfg.n_buckets
    p = os.path.join(out_dir, ckpt.MANIFEST_DIR, "_run.json")
    try:
        with open(p) as f:
            rec = json.load(f)
        if "n_buckets" in rec:
            return int(rec["n_buckets"])
    except (OSError, json.JSONDecodeError, ValueError):
        pass
    return DEFAULT_CONFIG.n_buckets


def _drop_banned_urls(out_dir: str, n_buckets: int,
                      urls: "set[str]") -> int:
    """Targeted per-bucket drops for a banned-url set (atomic rewrites,
    the backfill_lineage shape); idempotent — absent urls no-op."""
    from collections import defaultdict

    from ..functions.hashing import url_bucket

    by_bucket: dict[int, set] = defaultdict(set)
    for u in urls:
        by_bucket[url_bucket(u, n_buckets)].add(u)
    return sum(ckpt.drop_urls_from_bucket(out_dir, bkt, us)
               for bkt, us in sorted(by_bucket.items()))


def _resolve_banned_hashes(out_dir: str,
                           hashes: "set[str]") -> "set[str]":
    """Distributed column-pruned scan: every url in the output whose
    ``text_sha256`` is on the banned list (the notice identifies
    CONTENT; location resolves here)."""
    if not hashes:
        return set()
    want_hash = pa.array(sorted(hashes), pa.string())

    def match(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["text_sha256"],
                                 value_set=want_hash)).select(["url"])

    out: set[str] = set()
    hits = (rd.read_parquet(out_dir, columns=["url", "text_sha256"])
            .map_batches(match, batch_format="pyarrow"))
    for b in hits.iter_batches(batch_format="pyarrow"):
        out.update(b["url"].to_pylist())
    return out


def takedown(out_dir: str,
             cfg: "PipelineConfig | None" = None,
             urls: list[str] | None = None,
             text_sha256: list[str] | None = None,
             reason: str = "takedown") -> dict:
    """Compliance removal (opt-out / right-to-be-forgotten / DMCA) from
    a checkpointed run: drop the requested rows AND make the removal
    stick across every later maintenance pass.

    Request by ``urls`` directly, and/or by ``text_sha256`` content
    hashes (the removal notice often identifies content, not location).
    BOTH forms persist in the registry: urls are enforced everywhere a
    row enters the output, and hashes re-resolve at the end of every
    extraction/refresh pass — so banned content cannot re-enter under a
    NEW url either.

    Order of operations is the crash-safety contract: the request is
    REGISTERED first (``_manifests/_takedowns/``, content-addressed —
    ``state/checkpoint.py:record_takedown``), then hashes resolve to
    urls (column-pruned scan) and the targeted per-bucket drops run
    (atomic rewrites). A crash between the two self-heals: the next
    resume / verify_resume / refresh / re-run reads the registry and
    re-applies the drops as no-ops. ``cfg=None`` derives the bucket
    count from the run's own ``_run.json`` stamp. Idempotent."""
    urls = sorted(set(urls or []))
    hashes = sorted(set(text_sha256 or []))
    if not urls and not hashes:
        return {"n_requested": 0, "n_dropped": 0, "registry_path": None}
    n_buckets = _output_n_buckets(out_dir, cfg)
    registry_path = ckpt.record_takedown(out_dir, urls, reason,
                                         text_sha256=hashes)
    want = set(urls) | _resolve_banned_hashes(out_dir, set(hashes))
    n_dropped = _drop_banned_urls(out_dir, n_buckets, want)
    return {"n_requested": len(want), "n_dropped": n_dropped,
            "registry_path": registry_path}


def resolve_review_queue(out_dir: str, urls: list[str],
                         resolution: str = "accept") -> dict:
    """Review-queue RESOLUTION write-back (reference: the review_queue
    UPDATE path, app/db/review_queue.py — a reviewer marks quarantined
    rows resolved instead of leaving them parked forever).

    Modes:
    - ``"accept"``: the partial output is good enough — the url's
      bucket row flips to ``status='completed'`` (error kept for audit,
      prefixed ``resolved:``);
    - ``"retry"``: the row re-enters the retry loop — ``attempts``
      resets to 0 in its bucket, so the next ``run_retry`` re-extracts
      it even if it had exhausted the cap.

    Either way the rows leave ``_quarantine/`` (streamed rewrite, atomic
    swap). Bucket rewrites run distributed inside the groupby tasks via
    the same ``merge_bucket_group`` the retry pass uses (manifest
    counters refresh atomically). Idempotent: unknown or already-
    resolved urls no-op. Returns {"n_resolved", "n_remaining"}.
    """
    import shutil

    import ray

    if resolution not in ("accept", "retry"):
        raise ValueError(f"unknown resolution {resolution!r}")
    qdir = os.path.join(out_dir, "_quarantine")
    if not os.path.isdir(qdir) or not any(
            f.endswith(".parquet") for f in os.listdir(qdir)):
        return {"n_resolved": 0, "n_remaining": 0}
    ref = ray.put(set(urls))

    def split(batch: pa.Table, keep_resolved: bool) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array([(u in wanted) == keep_resolved
                         for u in batch["url"].to_pylist()], pa.bool_())
        return batch.filter(mask)

    q = rd.read_parquet(qdir)
    resolved = q.map_batches(lambda b: split(b, True),
                             batch_format="pyarrow")

    def apply_resolution(batch: pa.Table) -> pa.Table:
        if resolution == "accept":
            batch = batch.set_column(
                batch.schema.get_field_index("status"), "status",
                pa.array(["completed"] * len(batch), pa.string()))
            batch = batch.set_column(
                batch.schema.get_field_index("error"), "error",
                pa.array([f"resolved:{e}" for e in
                          batch["error"].to_pylist()], pa.string()))
        else:  # retry: clear the cap, keep partial status
            batch = batch.set_column(
                batch.schema.get_field_index("attempts"), "attempts",
                pa.array([0] * len(batch), pa.int64()))
        return batch

    resolved = resolved.map_batches(apply_resolution,
                                    batch_format="pyarrow").materialize()
    n_resolved = resolved.count()
    if n_resolved:
        resolved.groupby("bucket").map_groups(
            lambda g: ckpt.merge_bucket_group(g, out_dir),
            batch_format="pyarrow").take_all()

    # streamed quarantine rewrite minus the resolved rows, atomic swap
    qtmp = os.path.join(out_dir, "_quarantine.tmp")
    shutil.rmtree(qtmp, ignore_errors=True)
    q.map_batches(lambda b: split(b, False),
                  batch_format="pyarrow").write_parquet(qtmp)
    # an all-resolved queue writes zero files (and possibly no dir)
    os.makedirs(qtmp, exist_ok=True)
    shutil.rmtree(qdir, ignore_errors=True)
    os.replace(qtmp, qdir)
    return {"n_resolved": n_resolved,
            "n_remaining": rd.read_parquet(qdir).count()}


def run_extraction(pages_path: "str | rd.Dataset",
                   cfg: PipelineConfig = DEFAULT_CONFIG,
                   out_dir: str | None = None,
                   dedup: bool = True,
                   verify_resume: bool = False) -> rd.Dataset:
    """Run the flagship pipeline over a parquet path or any pages-schema
    Dataset (sources/readers.py format readers: jsonl, glob, WARC).

    Without ``out_dir``: returns the lazy extracted dataset (caller
    consumes it — tests, queries, benchmarks).

    With ``out_dir``: checkpointed mode. Finished buckets (valid manifest +
    data file) are skipped *before* extraction; remaining rows are
    extracted, reassembled, deduplicated and written atomically per
    url-hash bucket with manifests; returns the dataset read back from
    ``out_dir``.

    ``verify_resume``: resume normally assumes byte-identical input; with
    this flag a cheap metadata pass recomputes each bucket's input
    fingerprint and recomputes buckets whose input changed.
    """
    if out_dir is None:
        return extracted_dataset(pages_path, cfg, dedup)

    t0 = time.monotonic()
    done = ckpt.load_manifests(out_dir)
    banned, banned_hashes = ckpt.load_takedowns(out_dir)
    if banned:
        # crash-window heal: a takedown killed between its registry
        # write and its drops leaves victim rows in completed buckets a
        # plain resume would otherwise skip forever — re-apply the
        # registry's url drops up front (targeted, idempotent no-ops
        # when already clean; bounded by registry size)
        _drop_banned_urls(out_dir, cfg.n_buckets, banned)
        done = ckpt.load_manifests(out_dir)
    if verify_resume and done:
        if isinstance(pages_path, rd.Dataset):
            raise ValueError(
                "verify_resume needs a re-readable parquet path to "
                "recompute input fingerprints; pass the path form")
        # takedown-aware expectation: a bucket that diverges from the
        # input ONLY by its taken-down rows is correct, not stale
        expected = ckpt.expected_fingerprints(pages_path, cfg.n_buckets,
                                              dedup=dedup,
                                              exclude_urls=banned)
        ckpt.invalidate_stale(out_dir, done, expected)
    with _shuffle_ctx(cfg):
        work = _work_stream(pages_path, cfg, skip_buckets=set(done),
                            exclude_urls=banned)
        if cfg.finalize_shuffle == "hash":
            # stale straddle-guard claims from a killed run must not
            # block re-extraction of their (unfinished) buckets
            import glob as _glob
            for c in _glob.glob(os.path.join(out_dir, ckpt.MANIFEST_DIR,
                                             ".claim-*")):
                if int(c.rsplit("-", 1)[1]) not in done:
                    os.remove(c)
            manifest_ds = (work
                           .repartition(num_blocks=_finalize_partitions(cfg),
                                        keys=["bucket"])
                           .map_batches(
                               lambda g, cfg=cfg, dd=dedup:
                                   ex.finalize_block_write(g, cfg, dd, out_dir),
                               batch_size=None, batch_format="pyarrow"))
        else:
            manifest_ds = work.groupby("bucket").map_groups(
                lambda g, cfg=cfg, dd=dedup: ckpt.write_bucket_group(
                    ex.finalize_bucket(g, cfg, dd), out_dir),
                batch_format="pyarrow")
    manifest_ds.take_all()  # tiny: one row per bucket
    if banned_hashes:
        # hash-identified takedowns re-resolve at pass end: content that
        # re-entered under a NEW url (same banned text_sha256) is swept
        # before the run reports complete
        _drop_banned_urls(out_dir, cfg.n_buckets,
                          _resolve_banned_hashes(out_dir, banned_hashes))
    wall = time.monotonic() - t0
    all_manifests = list(ckpt.load_manifests(out_dir).values())
    summary = ckpt.write_run_summary(out_dir, all_manifests, wall,
                                     extra={"n_buckets": cfg.n_buckets})
    if cfg.notify_url:
        # run-completion notification (SURVEY S10 analog): one signed
        # envelope per run, never per document
        from ..state.notify import notify_outbox
        notify_outbox(os.path.join(out_dir, "_outbox"), cfg.notify_url,
                      {"run": "extract", "out_dir": out_dir, **summary},
                      cfg.notify_key or "")
    return rd.read_parquet(out_dir)


def upsert_extraction(pages_path: "str | rd.Dataset",
                      cfg: PipelineConfig,
                      out_dir: str,
                      dedup: bool = True) -> rd.Dataset:
    """Incremental re-crawl ingest (MERGE INTO the checkpointed store):
    run the SAME extraction chain over ONLY the delta pages and merge
    each result bucket into the existing store — rows for re-crawled
    urls are REPLACED (the new snapshot supersedes; within the delta
    itself the store's earliest-warc_ts first-wins rule still dedups),
    new urls INSERT, and every bucket the delta does not touch keeps
    its bytes (the groupby(bucket) only produces groups for affected
    buckets, so the maintenance cost is O(delta + touched buckets),
    never a full-store rewrite — at 10^12 documents a daily re-crawl
    touches a sliver of the url-hash space). The takedown registry is
    honored exactly as in a full run: banned urls stay excluded
    map-side, the crash-window heal re-applies url drops up front, and
    hash-identified takedowns re-resolve after the merge so banned
    content re-entering under a new url is swept. Returns the dataset
    read back from ``out_dir``.

    Uses the per-bucket read-modify-write merge (``merge_bucket_group``
    — durable data file then durable manifest), so a killed upsert
    re-runs idempotently: an already-merged bucket merges again to the
    same bytes."""
    t0 = time.monotonic()
    banned, banned_hashes = ckpt.load_takedowns(out_dir)
    if banned:
        # same crash-window heal as a full run: a takedown killed
        # between registry write and drops must not leave victims in
        # buckets this upsert never touches
        _drop_banned_urls(out_dir, cfg.n_buckets, banned)
    with _shuffle_ctx(cfg):
        work = _work_stream(pages_path, cfg, skip_buckets=set(),
                            exclude_urls=banned)
        manifest_ds = work.groupby("bucket").map_groups(
            lambda g, cfg=cfg, dd=dedup: ckpt.merge_bucket_group(
                ex.finalize_bucket(g, cfg, dd), out_dir),
            batch_format="pyarrow")
    manifest_ds.take_all()  # tiny: one row per TOUCHED bucket
    if banned_hashes:
        # hash-identified takedowns re-resolve after the merge: banned
        # CONTENT re-entering under a NEW url in the delta is swept
        # before the upsert reports complete (review finding — a
        # url-only exclusion silently re-inserted it for good)
        _drop_banned_urls(out_dir, cfg.n_buckets,
                          _resolve_banned_hashes(out_dir, banned_hashes))
    wall = time.monotonic() - t0
    all_manifests = list(ckpt.load_manifests(out_dir).values())
    ckpt.write_run_summary(out_dir, all_manifests, wall,
                           extra={"n_buckets": cfg.n_buckets,
                                  "upsert": True})
    return rd.read_parquet(out_dir)


def point_lookup(out_dir: str, urls, columns: "list[str] | None" = None,
                 cfg: "PipelineConfig | None" = None) -> rd.Dataset:
    """Serve specific urls from a checkpointed output WITHOUT a corpus
    scan — the read-path payoff of the url-hash bucket layout (the
    storage-partitioned analog of ``read_pages_warc_select``'s
    cdx-planned retrieval): each wanted url maps driver-side to its
    bucket (``url_bucket``, the write's own partitioner, count resolved
    via ``_output_n_buckets`` so a stale cfg can't open wrong dirs);
    ONLY those ``bucket=K/`` directories are read, with a vectorized
    ``is_in`` residual filter and column pruning pushed into the read.
    At 64-of-64 buckets this degrades to a full scan; at the serving
    norm (a handful of urls) it reads a constant number of files
    however big the corpus is."""
    import ray.data as rd

    from ..functions.hashing import url_bucket

    want = sorted(set(urls))
    if not want:
        raise ValueError("point_lookup needs at least one url")
    n_buckets = _output_n_buckets(out_dir, cfg)
    dirs = sorted({ckpt.bucket_dir(out_dir, url_bucket(u, n_buckets))
                   for u in want})
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        raise ValueError(f"no bucket of {out_dir} holds any wanted url")
    want_arr = pa.array(want, pa.string())

    def residual(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["url"], value_set=want_arr))

    # a path LIST is treated as files (only a single path may be a
    # directory) — expand each bucket dir to its parquet files
    import glob

    files = sorted(f for d in dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    ds = rd.read_parquet(files, columns=columns)
    return ds.map_batches(residual, batch_format="pyarrow")
