"""Pipeline configuration.

Mirrors the reference's env-driven knobs (reference: app/config.py:39-81 —
model name, hybrid flag, worker/API-limit bounds) as a plain dataclass the
engine stages read from. Every value is deterministic; nothing reads the
wall clock or the environment at import time.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- validation (reference: app/services/file_validator.py:28 — 200 MB cap) ---
    max_bytes: int = 200 * 1024 * 1024

    # --- routing (reference: app/services/pdf_extractor.py:451 — quality < 0.7
    #     → fallback). We carry quality as an integer percent to keep the
    #     threshold comparison exact across Python and SQL oracles; the
    #     reference's float weights 0.4/0.3/0.15/0.15 quantize exactly. ---
    quality_threshold_pct: int = 70

    # --- HTML heuristics ---
    link_density_max: float = 0.5  # block dropped when link chars / chars > 0.5

    # --- PDF layout ---
    line_y_tolerance: float = 2.0    # chunks within this |dy| share a line
    column_gap_min: float = 120.0    # x gap that starts a new column band

    # --- pathological-document guard (SURVEY.md §4 timeouts) ---
    # cooperative per-document parse budget in seconds; None disables.
    # Timeouts become status='partial' rows with a transient error label,
    # so `run_retry` gives them another attempt before quarantine.
    doc_timeout_s: float | None = None

    # --- skew splitting (north rule: shard oversized PDFs into page ranges) ---
    split_page_threshold: int = 8    # PDFs with more pages than this are sharded
    pages_per_shard: int = 4

    # --- partitioning / checkpointing ---
    n_buckets: int = 64              # url-hash output partitions

    # The pipeline's one all-to-all. "sort" (default): classic
    # groupby(bucket).map_groups sort shuffle. "hash": hash-keyed
    # repartition(keys=['bucket']) (Ray's HASH_SHUFFLE backend) — blocks
    # arrive holding whole buckets and the finisher runs per block with
    # no range sampling / sort of the wide extracted rows. Both paths are
    # value-identical (asserted in tests). Measured single-node at sf0.1
    # x10 (50k docs, 32 CPUs, alternating fresh sessions): sort median
    # ~8 s vs hash ~15 s — the hash backend's per-run aggregator-actor
    # pool startup plus double materialization of the wide binary rows
    # dominates at this scale, so sort stays the default; hash remains
    # the right shape when range-sampling trillions of wide rows is the
    # bottleneck on a real multi-node cluster.
    finalize_shuffle: str = "sort"
    # hash-partition count; None → max(8, min(n_buckets, cluster CPUs))
    finalize_num_partitions: int | None = None

    # --- Ray stage sizing (single 32-CPU node defaults; scale-out safe:
    #     concurrency is a pool size, num_cpus a per-actor reservation) ---
    sniff_batch_size: int = 1024
    extract_batch_size: int = 64     # heavy rows: keep blocks modest
    # min 1: two extract pools must never reserve every CPU of a small
    # session (4-CPU test fixture) or the read stages starve and the
    # pipeline deadlocks; autoscaling grows pools under load
    extract_concurrency: tuple[int, int] = (1, 16)

    # Extraction state is per-process module state (compiled regexes, tag
    # tables) that plain Ray tasks amortize across batches for free, so
    # stateless function tasks are the default — measured: two autoscaling
    # actor pools spend more wall on process ramp-up than the whole corpus
    # costs to parse. Flip on for genuinely heavy per-actor state (models,
    # indexes), where ExtractorActor.__init__ pays once per actor.
    use_actors: bool = False

    # User-extension surface (SURVEY.md §2.11): {content_type: fn(payload,
    # cfg, attempts) -> Primary} overriding the built-in extractor
    # registry. Ships with the config to every worker (module-level
    # registry mutations in the driver never reach Ray worker processes).
    extractor_overrides: dict | None = None

    # --- dedup ---
    dedup_enabled: bool = True

    # --- run-completion notification (SURVEY S10 re-expression:
    #     reference webhook_sender.py semantics — HMAC-signed envelope,
    #     SSRF guard, bounded retries — delivered to an on-disk outbox
    #     a relay would drain; None disables) ---
    notify_url: str | None = None
    notify_key: str | None = None


DEFAULT_CONFIG = PipelineConfig()


class _EmptySchemaRefBundleFilter:
    """Drops ONLY the Ray-2.49 empty-schema RefBundle warning.

    ``groupby().map_groups`` sorts first; when the sort emits more
    partitions than there are key values, the surplus partitions are
    EMPTY blocks with no schema, and the streaming executor logs
    "Operator produced a RefBundle with a different schema ... new
    schema: ." once per such block — pure noise our UDFs can never fix
    (they are not invoked on empty blocks; the bundles are born inside
    the sort). A genuine divergence between two NON-empty schemas is
    still logged: the filter matches only the empty-new-schema form."""

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        return not ("RefBundle with a different schema" in msg
                    and "new schema: ." in msg)


def _silence_empty_schema_refbundle_noise() -> None:
    import logging

    log = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptySchemaRefBundleFilter)
               for f in log.filters):
        log.addFilter(_EmptySchemaRefBundleFilter())


def tune_data_context() -> None:
    """Size Ray Data's parallelism floors to the session, not the 200-block
    default.

    Ray's ``read_op_min_num_blocks``/``min_parallelism`` default to 200;
    small inputs get split into 200 near-empty blocks and every shuffle
    inherits 200 partitions of pure fixed task overhead (measured ~5 s per
    all-to-all on a 5k-row table). These are FLOORS, so lowering them to
    ~the CPU count is safe at any scale: big inputs still split by
    ``target_max_block_size`` into however many blocks they need.

    Touches only the Ray Data context of the already-running session —
    never ray.init (driver contract).
    """
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ncpu = 8
    if ray.is_initialized():
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001 — sizing hint only
            pass
    floor = max(8, ncpu)
    ctx.min_parallelism = floor
    ctx.read_op_min_num_blocks = floor
    ctx.enable_progress_bars = False
    _silence_empty_schema_refbundle_noise()
    ctx.execution_options.preserve_order = False  # output order is never part
    # of this engine's contract (results key on url); order-free scheduling
    # keeps slow blocks from stalling the stream
    ctx.op_resource_reservation_enabled = False  # the per-operator CPU
    # reservation starves map stages that feed an all-to-all on small
    # sessions (measured 3.6x slowdown of extraction->bucket-shuffle at 8
    # CPUs); single-node with a roomy object store doesn't need it
