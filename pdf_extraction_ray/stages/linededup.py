"""Line-level exact deduplication / boilerplate removal (CCNet-style).

The canonical Common-Crawl cleaning step (CCNet, RefinedWeb): count how
many documents each exact line occurs in; lines shared by many documents
are navigation chrome / legal footers / template boilerplate and are
stripped from every document before training.

Scale shape:

* ``line_stats`` is the wordcount-with-combiner pattern — each batch
  pre-aggregates its lines to (line, c_occ, c_docs) partial rows, so the
  ONE all-to-all shuffle moves at most one row per distinct line per
  batch, never an exploded row per line occurrence. A document's lines
  all live in one input row, so per-batch distinct-document counts sum
  exactly across batches (no double counting).
* ``drop_boilerplate`` broadcasts the offending line set once
  (``ray.put``) and filters each document's lines against it inside
  ``map_batches``. The boilerplate set is small by construction (bounded
  by lines that repeat across >= min_docs documents, a tiny fraction of
  distinct lines); if a corpus ever produced an unboundedly large set,
  the fallback is a line-hash cogroup join (stages/joins.py) instead of
  the broadcast — same semantics, one more shuffle.

Reference analog: the dedup existence probes of
app/db/extractions.py:107-180 operate per-document; this operator is the
sub-document generalization a web-text corpus needs.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _nonempty_lines(text: str | None) -> list[str]:
    """A document's lines, empty lines dropped (HTML paragraphs join with
    a blank separator line; the blank is formatting, not content)."""
    return [ln for ln in (text or "").split("\n") if ln]


def line_stats(ds: rd.Dataset, text_col: str = "extracted_text",
               ) -> rd.Dataset:
    """Per-distinct-line corpus stats: (line, n_occ, n_docs)."""

    def partial(batch: pa.Table) -> pa.Table:
        occ: Counter = Counter()
        docs: Counter = Counter()
        for text in batch[text_col].to_pylist():
            lines = _nonempty_lines(text)
            occ.update(lines)
            docs.update(set(lines))
        keys = sorted(occ)
        return pa.table({
            "line": pa.array(keys, pa.string()),
            "c_occ": pa.array([occ[k] for k in keys], pa.int64()),
            "c_docs": pa.array([docs[k] for k in keys], pa.int64()),
        })

    return (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("line")
            .aggregate(Sum("c_occ", alias_name="n_occ"),
                       Sum("c_docs", alias_name="n_docs")))


def boilerplate_lines(ds: rd.Dataset, min_docs: int,
                      text_col: str = "extracted_text") -> rd.Dataset:
    """Lines occurring in >= ``min_docs`` distinct documents."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_docs"], min_docs))

    return line_stats(ds, text_col).map_batches(keep, batch_format="pyarrow")


# C4 cleaning constants (Raffel et al. 2020, §2.2) — the heuristic
# line filter, vs the corpus-frequency boilerplate filter above.
C4_LINE_BLOCKWORD = "javascript"        # drop any line mentioning it
C4_PAGE_BANS = ("lorem ipsum", "{")     # drop the whole page on sight
C4_TERMINAL_PUNCT = ('.', '!', '?', '"')
C4_MIN_WORDS = 3                        # C4: retain lines with >= 3 words
C4_MIN_LINES = 5                        # C4: drop pages with < 5 sentences


def c4_line_filter(ds: rd.Dataset,
                   min_words: int = C4_MIN_WORDS,
                   min_lines: int = C4_MIN_LINES,
                   require_terminal_punct: bool = False,
                   id_col: str = "url",
                   text_col: str = "extracted_text") -> rd.Dataset:
    """C4-style heuristic line cleaning (Raffel et al. 2020 §2.2).

    Line rules (a line survives iff ALL hold):
      1. >= ``min_words`` space-separated words (C4's 3-word rule —
         drops tab-only table rows and stub lines on this corpus);
      2. does not mention ``javascript`` (case-insensitive);
      3. if ``require_terminal_punct``: ends in ``. ! ? "`` (C4's
         sentence heuristic — OFF by default here because the corpus
         is punctuation-free synthetic text; exercised in tests).
    Page rules: ``keep`` is true iff >= ``min_lines`` lines survive and
    the page contains neither ``lorem ipsum`` nor ``{``.

    Emits ALL pages with a keep flag (tagger shape, like
    ``gopher_filter``) so rejection histograms can tune thresholds:
    (id, keep, clean_text, n_kept, n_dropped). Pure map-side — one
    pass, no shuffle, unlike ``drop_boilerplate``'s corpus-frequency
    pass; the two compose (C4 first, then boilerplate) in real runs."""

    def clean(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keeps, texts, kept_n, drop_n = [], [], [], []
        for text in batch[text_col].to_pylist():
            lines = _nonempty_lines(text)
            kept = [
                ln for ln in lines
                if len(ln.split(" ")) >= min_words
                and C4_LINE_BLOCKWORD not in ln.lower()
                and (not require_terminal_punct
                     or ln.endswith(C4_TERMINAL_PUNCT))
            ]
            low = (text or "").lower()
            keeps.append(len(kept) >= min_lines
                         and C4_PAGE_BANS[0] not in low
                         and C4_PAGE_BANS[1] not in (text or ""))
            texts.append("\n".join(kept))
            kept_n.append(len(kept))
            drop_n.append(len(lines) - len(kept))
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "keep": pa.array(keeps, pa.bool_()),
            "clean_text": pa.array(texts, pa.string()),
            "n_kept": pa.array(kept_n, pa.int64()),
            "n_dropped": pa.array(drop_n, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        clean, batch_format="pyarrow")


def drop_boilerplate(ds: rd.Dataset, min_docs: int,
                     id_col: str = "url",
                     text_col: str = "extracted_text") -> rd.Dataset:
    """Strip boilerplate lines from every document.

    Returns (id_col, clean_text, n_kept, n_dropped) where ``clean_text``
    is the newline-join of the document's surviving non-empty lines.
    """
    boiler: set[str] = set()
    for b in boilerplate_lines(ds, min_docs, text_col) \
            .select_columns(["line"]).iter_batches(batch_format="pyarrow"):
        boiler.update(b["line"].to_pylist())
    boiler_ref = ray.put(boiler)

    def clean(batch: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)
        ids = batch[id_col].to_pylist()
        texts, kept_n, drop_n = [], [], []
        for text in batch[text_col].to_pylist():
            lines = _nonempty_lines(text)
            kept = [ln for ln in lines if ln not in bset]
            texts.append("\n".join(kept))
            kept_n.append(len(kept))
            drop_n.append(len(lines) - len(kept))
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "clean_text": pa.array(texts, pa.string()),
            "n_kept": pa.array(kept_n, pa.int64()),
            "n_dropped": pa.array(drop_n, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        clean, batch_format="pyarrow")
