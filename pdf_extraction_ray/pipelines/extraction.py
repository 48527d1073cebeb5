"""The flagship pipeline: pages corpus → extracted main text.

Dataflow (SURVEY.md §7, BASELINE.json north_star):

    read_parquet(pages)
      │  (pass 0: read_parquet(columns=[url, warc_ts]) → keep-map →
      │   broadcast first-wins dedup filter; no payload shuffles)
      ├─ sniff/validate (stateless map_batches, zero-copy Arrow)
      ├─ resume filter (finished url-hash buckets skipped via manifests)
      ├─ direct branch  (page_count <= threshold):
      │     ExtractorActor pool → OUT rows
      └─ skew branch    (oversized PDFs):
            shard_pdf (page-range rows, streams only)
            → FragmentExtractor pool
            → groupby(url) reassembly (the only payload-bearing shuffle,
              and it moves just the ~2% oversized tail)
      union → [checkpointed: groupby(bucket) atomic writer + manifests]

Branching note: Ray Data datasets are lazy DAGs without a split-by-predicate
operator, so the two branches each re-run the (cheap) read + sniff; the
heavy extraction runs exactly once per row. On a real cluster with very
large inputs, persist the sniffed skew subset (~2% of rows) to parquet
first if the double read shows up in ``ds.stats()``.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages import extract as ex
from ..stages.dedup import build_keep_map, first_wins_filter
from ..state import checkpoint as ckpt


def _is_big(batch: pa.Table, cfg: PipelineConfig) -> pa.ChunkedArray:
    return pc.and_(
        pc.and_(pc.equal(batch["content_type"], "pdf"),
                pc.equal(batch["status"], "completed")),
        pc.greater(batch["page_count"], cfg.split_page_threshold))


def sniffed_pages(pages_path: str, cfg: PipelineConfig,
                  dedup: bool, skip_buckets: set[int] | None = None) -> rd.Dataset:
    ds = rd.read_parquet(pages_path)
    if dedup:
        meta = rd.read_parquet(pages_path, columns=["url", "warc_ts"])
        keep = build_keep_map(meta)
        ds = first_wins_filter(ds, keep)
    ds = ds.map_batches(lambda b: ex.sniff_validate_batch(b, cfg),
                        batch_format="pyarrow", batch_size=cfg.sniff_batch_size)
    if skip_buckets:
        skip = pa.array(sorted(skip_buckets), pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(batch["bucket"], value_set=skip)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds


def extracted_dataset(pages_path: str,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      dedup: bool = True,
                      skip_buckets: set[int] | None = None) -> rd.Dataset:
    """The lazy OUT_SCHEMA dataset (no checkpointing)."""
    base = sniffed_pages(pages_path, cfg, dedup, skip_buckets)

    if cfg.use_actors:
        extract_kwargs = dict(fn_constructor_args=(cfg,),
                              concurrency=cfg.extract_concurrency, num_cpus=1)
        direct_fn, frag_fn = ex.ExtractorActor, ex.FragmentExtractor
    else:
        # stateless function tasks: elastic, no pool ramp-up; parser state
        # is module-level and amortized per worker process anyway
        extract_kwargs = {}
        direct_fn = ex.ExtractorActor(cfg)
        frag_fn = ex.FragmentExtractor(cfg)

    direct = base.map_batches(
        lambda b, cfg=cfg: b.filter(pc.invert(_is_big(b, cfg))),
        batch_format="pyarrow")
    direct_out = direct.map_batches(
        direct_fn, batch_format="pyarrow", batch_size=cfg.extract_batch_size,
        **extract_kwargs)

    big = base.map_batches(
        lambda b, cfg=cfg: b.filter(_is_big(b, cfg)),
        batch_format="pyarrow")
    shards = big.map_batches(lambda b, cfg=cfg: ex.shard_pdf_batch(b, cfg),
                             batch_format="pyarrow")
    frags = shards.map_batches(
        frag_fn, batch_format="pyarrow", batch_size=cfg.extract_batch_size,
        **extract_kwargs)
    reassembled = frags.groupby("url").map_groups(
        lambda g, cfg=cfg: ex.reassemble_group(g, cfg),
        batch_format="pyarrow")

    return direct_out.union(reassembled)


def run_retry(pages_path: str,
              out_dir: str,
              cfg: PipelineConfig = DEFAULT_CONFIG,
              max_attempts: int = 5) -> dict:
    """Semantic retry pass over a checkpointed run (reference semantics:
    duplicate found with status partial/failed → retry with retry_count+1,
    cap 5 → review queue; app/routers/extraction.py:155-190,330-355).

    Re-extracts rows whose status is ``partial`` with attempts <
    ``max_attempts`` (attempts+1), merges them back into their buckets
    atomically, and quarantines rows that exhausted the cap into
    ``out_dir/_quarantine/`` (the review-queue analog). Returns a summary.
    """
    import pyarrow.parquet as pq_mod
    import ray

    existing = rd.read_parquet(out_dir)

    def failed_rows(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["status"], "partial")
        return batch.filter(mask).select(["url", "attempts", "bucket"])

    failed = existing.map_batches(failed_rows, batch_format="pyarrow").to_pandas()
    if failed.empty:  # an all-clean run yields a column-less empty frame
        return {"n_partial": 0, "n_retried": 0,
                "n_quarantined": 0, "n_recovered": 0}
    retryable = failed[failed.attempts < max_attempts]
    exhausted = failed[failed.attempts >= max_attempts]

    summary = {"n_partial": len(failed), "n_retried": len(retryable),
               "n_quarantined": len(exhausted), "n_recovered": 0}

    if len(retryable):
        att_map = dict(zip(retryable.url, retryable.attempts + 1))
        ref = ray.put(att_map)

        def pick_and_bump(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            urls = batch["url"].to_pylist()
            mask = pa.array([u in m for u in urls], pa.bool_())
            sub = batch.filter(mask)
            new_att = pa.array([m[u] for u in sub["url"].to_pylist()], pa.int64())
            return sub.set_column(sub.schema.get_field_index("attempts"),
                                  "attempts", new_att)

        retried = (sniffed_pages(pages_path, cfg, dedup=True)
                   .map_batches(pick_and_bump, batch_format="pyarrow")
                   .map_batches(ex.ExtractorActor(cfg), batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size))
        merged = retried.groupby("bucket").map_groups(
            lambda g: ckpt.merge_bucket_group(g, out_dir),
            batch_format="pyarrow")
        merged.take_all()
        recovered = retried.map_batches(
            lambda b: b.filter(pc.equal(b["status"], "completed"))
                       .select(["url"]), batch_format="pyarrow").count()
        summary["n_recovered"] = recovered

    if len(exhausted):
        qdir = os.path.join(out_dir, "_quarantine")
        os.makedirs(qdir, exist_ok=True)

        def exhausted_rows(batch: pa.Table) -> pa.Table:
            mask = pc.and_(pc.equal(batch["status"], "partial"),
                           pc.greater_equal(batch["attempts"], max_attempts))
            return batch.filter(mask)

        qtab = pa.concat_tables(
            rd.read_parquet(out_dir)
              .map_batches(exhausted_rows, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow"))
        tmp = os.path.join(qdir, "quarantine.parquet.tmp")
        pq_mod.write_table(qtab, tmp)
        os.replace(tmp, os.path.join(qdir, "quarantine.parquet"))

    return summary


def run_extraction(pages_path: str,
                   cfg: PipelineConfig = DEFAULT_CONFIG,
                   out_dir: str | None = None,
                   dedup: bool = True) -> rd.Dataset:
    """Run the flagship pipeline.

    Without ``out_dir``: returns the lazy extracted dataset (caller
    consumes it — tests, queries, benchmarks).

    With ``out_dir``: checkpointed mode. Finished buckets (valid manifest +
    data file) are skipped *before* extraction; remaining rows are
    extracted, partitioned by url-hash bucket, and written atomically with
    per-bucket manifests; returns the dataset read back from ``out_dir``.
    """
    if out_dir is None:
        return extracted_dataset(pages_path, cfg, dedup)

    t0 = time.monotonic()
    done = ckpt.load_manifests(out_dir)
    ds = extracted_dataset(pages_path, cfg, dedup, skip_buckets=set(done))
    manifest_ds = ds.groupby("bucket").map_groups(
        lambda g: ckpt.write_bucket_group(g, out_dir),
        batch_format="pyarrow")
    new_manifests = manifest_ds.take_all()  # tiny: one row per bucket
    wall = time.monotonic() - t0
    all_manifests = list(ckpt.load_manifests(out_dir).values())
    ckpt.write_run_summary(out_dir, all_manifests, wall)
    return rd.read_parquet(out_dir)
