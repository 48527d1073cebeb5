"""Text-analytics, dedup-family, similarity, and windowed-aggregate
queries over the test tables — the training-data operator suite
(beyond the reference; SURVEY.md build-plan extensions) plus the
reference's scalar-function library as dataset ops (M3/M4/M16).

Each ``*_sql`` sibling is the DuckDB oracle for the driver's value-hash
compare. Float-valued similarity scores are never part of a compared
column — ANN queries output integer (query_id, neighbor_id, rank) with a
deterministic (-sim, id) tie-break on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.classify import MEMO_PHRASES, QP_PHRASES  # noqa: F401 (parity)
from ..functions.hashing import rolling_fingerprint, sha256_hex
from ..functions.textstats import LANG_PROFILES, TOKEN_RE, detect_lang
from ..stages import dedup as dd
from ..stages import similarity as sim
from ..stages import window as win


from ..sources.tables import read_table as _read_table  # shared reader
from ..sources.tables import strip_meta as _strip_meta  # noqa: F401


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_table(sf_dir, "documents", columns)


# ---------------------------------------------------------------------------
# scalar-function library over datasets (M3/M4/M16)
# ---------------------------------------------------------------------------


def sha256_docs(sf_dir: str) -> rd.Dataset:
    """Content identity hashing (reference: file_validator.py:79)."""
    def add(batch: pa.Table) -> pa.Table:
        hs = [sha256_hex(t) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "content_sha256": pa.array(hs, pa.string())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow")


def sha256_docs_sql() -> str:
    return "SELECT doc_id, sha256(text) AS content_sha256 FROM documents"


# canonical naming moved to __ray_entry__.q_canonical_names + oracle.
# canonical_names_sql: the fields are now PARSED from the extracted
# text's metadata header instead of synthesized from doc_id.


# languages dimension table (reference: sql/languages_table.sql:4-22 —
# an 11-row (name, iso) lookup FK-joined from extractions; here the
# corpus langs plus the reference's SA languages, broadcast-joined)
LANGUAGE_DIM: dict[str, tuple[str, str]] = {
    # corpus languages
    "en": ("English", "eng"), "fr": ("French", "fra"),
    "es": ("Spanish", "spa"), "de": ("German", "deu"),
    "zh": ("Chinese", "zho"),
    # reference dimension rows (sql/languages_table.sql)
    "af": ("Afrikaans", "afr"), "zu": ("isiZulu", "zul"),
    "xh": ("isiXhosa", "xho"), "st": ("Sesotho", "sot"),
    "tn": ("Setswana", "tsn"), "ve": ("Tshivenda", "ven"),
}


def language_dim_counts(sf_dir: str) -> rd.Dataset:
    """Dimension-table lookup join (reference: languages FK,
    sql/languages_table.sql:66-67): per-language doc counts joined with
    the broadcast (name, iso) dim — the canonical small-side broadcast
    join (the dim ships inside the closure, never a shuffle)."""
    def count_partial(batch: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter(batch["lang"].to_pylist())
        langs = sorted(c)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "n": pa.array([c[k] for k in langs], pa.int64())})

    partial = _docs(sf_dir, ["lang"]).map_batches(count_partial,
                                                  batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        lang = g["lang"].iloc[0]
        name, iso = LANGUAGE_DIM.get(lang, ("Unknown", "und"))
        return pd.DataFrame({
            "lang": [lang], "lang_name": [name], "iso_code": [iso],
            "n_docs": np.array([g["n"].sum()], dtype=np.int64),
        })

    return partial.groupby("lang").map_groups(final, batch_format="pandas")


def language_dim_counts_sql() -> str:
    rows = ", ".join(f"('{k}', '{n}', '{i}')"
                     for k, (n, i) in sorted(LANGUAGE_DIM.items()))
    return f"""
WITH dim(lang, lang_name, iso_code) AS (VALUES {rows})
SELECT d.lang, coalesce(m.lang_name, 'Unknown') AS lang_name,
       coalesce(m.iso_code, 'und') AS iso_code,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d LEFT JOIN dim m ON d.lang = m.lang
GROUP BY d.lang, m.lang_name, m.iso_code"""


SPLIT_HASH_MULT = 2654435761  # Knuth multiplicative hash constant
SPLIT_MOD = 2 ** 32


def train_split(sf_dir: str) -> rd.Dataset:
    """Deterministic stratified train/val/test assignment by
    multiplicative id hash (80/10/10) — the training-data split operator;
    exactly reproducible in SQL, so split sizes and per-split char sums
    value-hash against the oracle."""
    def assign(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.uint64)
        h = (ids * SPLIT_HASH_MULT) % SPLIT_MOD
        split = np.select([h < int(0.8 * SPLIT_MOD),
                           h < int(0.9 * SPLIT_MOD)],
                          ["train", "val"], "test")
        return pa.table({
            "split": pa.array(split, pa.string()),
            "n_chars": batch["n_chars"].cast(pa.int64()),
        })

    return (_docs(sf_dir, ["doc_id", "n_chars"])
            .map_batches(assign, batch_format="pyarrow")
            .groupby("split")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="sum_chars")))


def train_split_sql() -> str:
    h = f"(doc_id * {SPLIT_HASH_MULT}) % {SPLIT_MOD}"
    return f"""
SELECT CASE WHEN {h} < {int(0.8 * SPLIT_MOD)} THEN 'train'
            WHEN {h} < {int(0.9 * SPLIT_MOD)} THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1"""


def hll_users_per_type(sf_dir: str) -> rd.Dataset:
    """Approximate distinct users per event type via the HyperLogLog
    sketch stage. Value-hash oracled: the register update is pure
    sha256 integer arithmetic and the estimator sums its harmonic
    denominator exactly, so the whole sketch reproduces in SQL
    (``hll_users_per_type_sql``); the ±1.04/sqrt(m) error bound vs
    exact distinct is additionally asserted in tests."""
    from ..stages.sketch import approx_distinct_by_key
    ds = _read_table(sf_dir, "events", ["event_type", "user_id"])
    return approx_distinct_by_key(ds, "event_type", "user_id")


def users_per_type_exact(sf_dir: str,
                         num_partitions: int = 32) -> rd.Dataset:
    """EXACT distinct users per event type — the exactness twin of
    ``hll_users_per_type`` and the chained-combiner distinct-count
    shape (the anchor_text_index pattern as a standalone op): per-batch
    (type, user) dedup is the combiner, ONE user-hash partition
    exchange co-locates each pair exactly once, the per-partition body
    is a vectorized distinct + per-type partial count, and a tiny
    ``groupby(type)`` sums the ≤ P×|types| partials. No count-distinct
    state ever centralizes — at 10^12 events the only all-to-all
    carries batch-distinct (type, user) pairs."""
    P = num_partitions
    ds = _read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(["event_type", "user_id"])
        df["__p"] = df["user_id"].to_numpy(np.int64) % P
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        out = (d.groupby("event_type", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out[["event_type", "n"]]

    part = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__p").map_groups(count_part, batch_format="pandas"))
    return part.groupby("event_type").aggregate(
        Sum("n", alias_name="n_users"))


def users_per_type_exact_sql() -> str:
    return """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type"""


def hll_users_per_type_sql(p: int = 10) -> str:
    """SQL twin of the HLL pipeline: rebuild the 64-bit little-endian
    hash from DuckDB's sha256 hex, derive (register index, rank), fold
    per-key register maxima, and apply the SAME estimator — harmonic
    denominator as an exact HUGEINT in units of 2^-63, identical
    double-precision expression order, linear-counting branch included.
    """
    m = 1 << p
    byte = (lambda k:
            f"(strpos('0123456789abcdef', substr(hx, {2 * k + 1}, 1)) - 1)"
            f" * 16 + strpos('0123456789abcdef', substr(hx, {2 * k + 2}, 1))"
            f" - 1")
    hexpr = " + ".join(
        f"CAST({byte(k)} AS HUGEINT) * CAST('{256 ** k}' AS HUGEINT)"
        for k in range(8))
    two63 = "CAST('9223372036854775808' AS HUGEINT)"
    return f"""
WITH vals AS (SELECT DISTINCT event_type, user_id FROM events),
hx AS (SELECT event_type, sha256(CAST(user_id AS VARCHAR)) AS hx FROM vals),
hs AS (SELECT event_type, ({hexpr}) AS h FROM hx),
rr AS (SELECT event_type, CAST(h % {m} AS BIGINT) AS idx,
              CASE WHEN h // {m} = 0 THEN {64 - p + 1}
                   ELSE {64 - p} - length(bin(h // {m})) + 1 END AS rank
       FROM hs),
regs AS (SELECT event_type, idx, max(rank) AS r FROM rr
         GROUP BY event_type, idx),
agg AS (SELECT event_type, count(*) AS n_present,
               sum({two63} // (CAST(1 AS HUGEINT) << CAST(r AS HUGEINT)))
                 AS s_present
        FROM regs GROUP BY event_type),
est AS (SELECT event_type, {m} - n_present AS zeros,
               (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
                 * 9223372036854775808.0
                 / CAST(({m} - n_present) * {two63} + s_present AS DOUBLE)
                 AS raw
        FROM agg)
SELECT event_type,
       CAST(floor(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                       THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                       ELSE raw END + 0.5) AS BIGINT) AS approx_distinct
FROM est"""


# ---------------------------------------------------------------------------
# multimodal decode
# ---------------------------------------------------------------------------


def media_decode(sf_dir: str) -> rd.Dataset:
    """REAL image decoding over a deterministic planted-PNG corpus: one
    8-bit grayscale PNG per document (pixel law in sources/gen_media.py),
    plus a PALETTE (color_type 3 / PLTE) PNG for every 7th doc — the
    decoder resolves indices through the palette to RGB, closing the
    round-2 decoder gap. All decoded by the pure-stdlib PNG decoder
    inside the actor-pool media stage; dims, channels, and pixel means
    verify against a closed-form SQL oracle."""
    from ..sources.gen_media import build_png, build_png_palette
    from ..stages.multimodal import media_features

    def to_media(batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for d in batch["doc_id"].to_pylist():
            ids.append(d)
            payloads.append(build_png(d))
            if d % 7 == 3:
                ids.append(d + 2_000_000)
                payloads.append(build_png_palette(d))
        return pa.table({
            "url": pa.array([f"media://png/{d}" for d in ids], pa.string()),
            "html": pa.array(payloads, pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    feats = media_features(media, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "width": batch["width"],
            "height": batch["height"],
            "channels": batch["channels"],
            "mean_pixel": batch["mean_pixel"],
            "decoded": batch["decoded"],
        })

    return feats.map_batches(project, batch_format="pyarrow")


def media_decode_sql() -> str:
    w = "(8 + doc_id % 25)"
    h = "(8 + doc_id % 17)"
    # palette row: idx = pixel_value % 64, RGB = ((3i)%256,(5i+1)%256,
    # (7i+2)%256); mean over ALL RGB bytes (3 per pixel)
    idx = f"(((doc_id + 7 * (i % {w}) + 13 * (i // {w})) % 256) % 64)"
    rgb_sum = (f"((3 * {idx}) % 256 + (5 * {idx} + 1) % 256 "
               f"+ (7 * {idx} + 2) % 256)")
    return f"""
SELECT doc_id,
  CAST({w} AS BIGINT) AS width,
  CAST({h} AS BIGINT) AS height,
  CAST(1 AS BIGINT) AS channels,
  CAST(list_sum(list_transform(range(0, {w} * {h}),
       i -> (doc_id + 7 * (i % {w}) + 13 * (i // {w})) % 256))
       // ({w} * {h}) AS BIGINT) AS mean_pixel,
  TRUE AS decoded
FROM documents
UNION ALL
SELECT doc_id + 2000000 AS doc_id,
  CAST({w} AS BIGINT) AS width,
  CAST({h} AS BIGINT) AS height,
  CAST(3 AS BIGINT) AS channels,
  CAST(list_sum(list_transform(range(0, {w} * {h}),
       i -> {rgb_sum})) // (3 * {w} * {h}) AS BIGINT) AS mean_pixel,
  TRUE AS decoded
FROM documents WHERE doc_id % 7 = 3"""


def media_phash_dups(sf_dir: str) -> rd.Dataset:
    """Perceptual (average-hash) image dedup over a planted corpus: every
    document gets a PNG, and every 10th doc also a BRIGHTNESS-SHIFTED
    copy (different bytes and sha256, provably identical aHash). Returns
    candidate dup pairs (a, b); value-hash oracled via the closed-form
    pixel law (``media_phash_dups_sql``), with planted recall and sha
    divergence additionally asserted in tests."""
    from ..sources.gen_media import build_png_shifted
    from ..stages.multimodal import phash_dup_pairs

    def to_media(batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for d in batch["doc_id"].to_pylist():
            ids.append(d)
            payloads.append(build_png_shifted(d))
            if d % 10 == 0:
                ids.append(d + 1_000_000)
                payloads.append(build_png_shifted(d, delta=30))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(payloads, pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    return phash_dup_pairs(media)


def media_phash_dups_sql() -> str:
    """Exact SQL reproduction of the aHash pipeline over the planted
    corpus: the textured pixel law (gen_media.build_png_shifted), the
    8x8 nearest-neighbor sample grid, and the integer-mean threshold are
    all closed-form, so the 64-bit hash is computed as a bitstring and
    equal-hash pairs joined — proving end-to-end that PNG encode →
    inflate → unfilter → decode → aHash is lossless."""
    return """
WITH imgs AS (
  SELECT doc_id AS out_id, doc_id AS src, 0 AS delta FROM documents
  UNION ALL
  SELECT doc_id + 1000000, doc_id, 30 FROM documents WHERE doc_id % 10 = 0
), sampled AS (
  SELECT out_id,
    list_transform(range(0, 64), i ->
      (src * 31
       + (7 * (((i % 8) * (8 + src % 25)) // 8) + 1)
         * (5 * (((i // 8) * (8 + src % 17)) // 8) + 3)
       + ((i % 8) * (8 + src % 25)) // 8) % 200 + delta) AS s
  FROM imgs
), hashed AS (
  SELECT out_id,
    array_to_string(list_transform(s, v ->
      CASE WHEN v > list_sum(s) // 64 THEN '1' ELSE '0' END), '') AS ph
  FROM sampled
)
SELECT a.out_id AS a, b.out_id AS b
FROM hashed a JOIN hashed b ON a.ph = b.ph AND a.out_id < b.out_id"""


# ---------------------------------------------------------------------------
# text analytics
# ---------------------------------------------------------------------------


def token_stats(sf_dir: str) -> rd.Dataset:
    """Token counting + quality-ratio inputs as exact integers."""
    en_stop = LANG_PROFILES["en"]

    def add(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": batch["doc_id"].to_pylist(), "n_tokens": [],
                "n_stop": [], "n_upper": [], "sum_token_len": []}
        for t in batch["text"].to_pylist():
            toks = TOKEN_RE.findall(t)
            rows["n_tokens"].append(len(toks))
            rows["n_stop"].append(sum(1 for w in toks if w.lower() in en_stop))
            rows["n_upper"].append(sum(1 for c in t if c.isupper()))
            rows["sum_token_len"].append(sum(len(w) for w in toks))
        est = [len(t) // 4 for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
            "n_stop": pa.array(rows["n_stop"], pa.int64()),
            "n_upper": pa.array(rows["n_upper"], pa.int64()),
            "sum_token_len": pa.array(rows["sum_token_len"], pa.int64()),
            "token_estimate": pa.array(est, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow")


def token_stats_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES["en"]))
    return f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                       t -> t IN ({stop}))) AS BIGINT) AS n_stop,
  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS BIGINT) AS sum_token_len,
  CAST(length(text) // 4 AS BIGINT) AS token_estimate
FROM documents"""


def _quality_feats(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Shared per-doc quality features for the mix-policy operators
    (token_budget_select / section_quota_sample): (n_tokens, q) where
    q = per-mille stopword density ``(1000*n_stop)//max(n_tokens,1)``.
    One definition, one SQL counterpart (:func:`_quality_cte`) — the
    engine/oracle pairs cannot silently diverge."""
    en_stop = LANG_PROFILES["en"]
    n_tok, n_stop = [], []
    for t in texts:
        toks = TOKEN_RE.findall(t)
        n_tok.append(len(toks))
        n_stop.append(sum(1 for w in toks if w.lower() in en_stop))
    n_tok = np.asarray(n_tok, np.int64)
    q = (1000 * np.asarray(n_stop, np.int64)) // np.maximum(n_tok, 1)
    return n_tok, q


def _quality_cte(extra_cols: str = "") -> str:
    """SQL counterpart of :func:`_quality_feats`: CTEs ``t`` (counts)
    and ``q`` (doc_id, n_tokens, q[, extra_cols])."""
    stop = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES["en"]))
    return f"""t AS (
  SELECT doc_id,{extra_cols}
    CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)
      AS n_tokens,
    CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                         w -> w IN ({stop}))) AS BIGINT) AS n_stop
  FROM documents
), q AS (
  SELECT * EXCLUDE (n_stop),
         (1000 * n_stop) // GREATEST(n_tokens, 1) AS q
  FROM t
)"""


def token_budget_select(sf_dir: str, budget: int = 12_000) -> rd.Dataset:
    """Budgeted corpus selection — the training-mix construction step:
    admit documents in quality order (best first) until a global TOKEN
    budget is exhausted, emitting each kept doc's admission rank and the
    running token total. Real mixes are built exactly this way ("take
    the best N-billion tokens"), not by a per-doc threshold — the cut
    point depends on the whole corpus' quality distribution.

    Quality = per-mille stopword density ``(1000*n_stop)//max(n_tokens,
    1)`` (integer; ties -> doc_id ASC). The global ordered running sum
    is :func:`stages.scan.prefix_scan`: quality is bounded (0..1000),
    so ``1000 - q`` is a PERFECT monotone partition key — two keyed
    shuffles, O(1001) driver state, never a global sort. Output
    (doc_id, q, n_tokens, sel_rank, cum_tokens) for cum <= budget."""
    import pyarrow.compute as pc

    from ..stages.scan import prefix_scan

    def feats(batch: pa.Table) -> pa.Table:
        n_tok, q = _quality_feats(batch["text"].to_pylist())
        return pa.table({
            "doc_id": batch["doc_id"],
            "q": pa.array(q, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "_negq": pa.array(1000 - q, pa.int64()),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        feats, batch_format="pyarrow")
    scanned = prefix_scan(ds,
                          part_fn=lambda t: np.asarray(t["_negq"]),
                          sort_cols=["_negq", "doc_id"],
                          value_col="n_tokens",
                          rank_col="sel_rank", cum_col="cum_tokens")

    def cut(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["cum_tokens"], budget)
        return t.filter(keep).drop_columns(["_negq"])

    return scanned.map_batches(cut, batch_format="pyarrow")


def token_budget_select_sql(budget: int = 12_000) -> str:
    return f"""
WITH {_quality_cte()}, w AS (
  SELECT doc_id, q, n_tokens,
         ROW_NUMBER() OVER (ORDER BY q DESC, doc_id) - 1 AS sel_rank,
         CAST(SUM(n_tokens) OVER (ORDER BY q DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM q
)
SELECT doc_id, q, n_tokens, CAST(sel_rank AS BIGINT) AS sel_rank,
       cum_tokens
FROM w WHERE cum_tokens <= {budget}"""


def section_quota_sample(sf_dir: str, quota: int = 12) -> rd.Dataset:
    """Per-domain document cap — the anti-single-source-domination
    policy (cap how much any one site contributes to the mix): keep at
    most ``quota`` docs per section (the domain stand-in), best quality
    first, ties -> doc_id. Emits (doc_id, section, q, sect_rank) for the
    kept rows with the 1-based within-section admission rank.

    Shape: the keyed-window scan with a STRING key (the
    frontier_schedule waves pattern): tag ``_kp = hash(section)&(P-1)``,
    ONE groupby(_kp) co-locates every section's rows (the hash only
    routes — ranking is per actual section string, so hash collisions
    cannot merge quotas), per-partition vectorized sort + cumcount.
    Quality rides as an integer (the token_budget_select per-mille
    stopword density), so there is no float anywhere."""
    from ..functions.hashing import stable_hash64

    P = 32

    def feats(batch: pa.Table) -> pa.Table:
        _, q = _quality_feats(batch["text"].to_pylist())
        secs = batch["source"].to_pylist()
        kp = np.fromiter((stable_hash64(s) & (P - 1) for s in secs),
                         np.int64, len(secs))
        return pa.table({
            "doc_id": batch["doc_id"],
            "section": batch["source"],
            "q": pa.array(q, pa.int64()),
            "_kp": pa.array(kp, pa.int64()),
        })

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "section": pd.Series([], dtype="object"),
                "q": pd.Series([], dtype="int64"),
                "sect_rank": pd.Series([], dtype="int64")})
        g = g.sort_values(["section", "q", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        g["sect_rank"] = (g.groupby("section", sort=False).cumcount()
                          .to_numpy(np.int64) + 1)
        return g[g.sect_rank <= quota].drop(columns=["_kp"])

    return (_docs(sf_dir, ["doc_id", "source", "text"])
            .map_batches(feats, batch_format="pyarrow")
            .groupby("_kp").map_groups(cap, batch_format="pandas"))


def section_quota_sample_sql(quota: int = 12) -> str:
    return f"""
WITH {_quality_cte(" source AS section,")}, r AS (
  SELECT doc_id, section, q,
         CAST(ROW_NUMBER() OVER (PARTITION BY section
              ORDER BY q DESC, doc_id) AS BIGINT) AS sect_rank
  FROM q
)
SELECT doc_id, section, q, sect_rank FROM r WHERE sect_rank <= {quota}"""


def lang_temperature_sample(sf_dir: str) -> rd.Dataset:
    """Temperature-smoothed mixture sampling (T = 2, the multilingual-
    pretraining rebalance of Conneau et al. / XLM-R: sampled share per
    language \u221d count^(1/T)): keep each doc of language ``d`` with
    probability (c_min / c_d)^(1/2) \u2014 over-represented languages are
    DAMPED toward, but not flattened to, uniform (contrast
    ``lang_balance_sample``'s T = \u221e uniform target over the same
    column; this corpus's en slice is ~3x the rarest, so en really is
    cut to ~sqrt(1/3)).

    Exactness design \u2014 fractional-power sampling in PURE INTEGERS: keep
    iff h^2 * c_d < c_min * 2^40 with h = stable_hash64('temp:'+doc_id)
    % 2^20, which is exactly P(keep) = sqrt(c_min/c_d) with zero float
    anywhere. The engine precomputes the equivalent per-language cutoff
    thr_d = isqrt((c_min * 2^40 - 1) // c_d) + 1 driver-side in Python
    bigints (h < thr_d \u27fa h^2 c_d < c_min 2^40, both directions), so the
    map side is one int64 compare per row; the oracle states the
    product inequality directly in HUGEINT. Phase 1 is a tiny
    groupby(lang) count (O(langs) to the driver); phase 2 is map-side
    only \u2014 the corpus is never shuffled and passes once. Any rational
    temperature 1/T = a/b generalizes the same way: h^b c^a < c_min^a
    2^(20b)."""
    from math import isqrt

    from ..functions.hashing import stable_hash64

    ds = _docs(sf_dir, ["doc_id", "lang"])
    counts = {r["lang"]: int(r["count()"])
              for r in ds.groupby("lang").count().take_all()}
    if not counts:
        return ds
    minn = min(counts.values())
    thr = {s: isqrt(((minn << 40) - 1) // c) + 1 for s, c in counts.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        h = np.fromiter((stable_hash64(f"temp:{d}") for d in ids),
                        np.uint64, len(ids))
        t = np.fromiter((thr[s] for s in langs), np.int64, len(langs))
        mask = (h % np.uint64(1 << 20)).astype(np.int64) < t
        out = batch.filter(pa.array(mask))
        return pa.table({"doc_id": out["doc_id"],
                         "lang": out["lang"]})

    return ds.map_batches(keep, batch_format="pyarrow")


def lang_temperature_sample_sql() -> str:
    return f"""
WITH n AS (
  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
), m AS (
  SELECT min(cnt) AS minn FROM n
), hx AS (
  SELECT doc_id, lang,
         CAST({_sql_hash64("sha256('temp:' || CAST(doc_id AS VARCHAR))")}
              % 1048576 AS BIGINT) AS h20
  FROM documents
)
SELECT d.doc_id, d.lang
FROM hx d JOIN n ON n.lang = d.lang CROSS JOIN m
WHERE CAST(d.h20 AS HUGEINT) * d.h20 * n.cnt
      < CAST(m.minn AS HUGEINT) * 1099511627776"""


def phrase_match_stats(sf_dir: str, phrase: str = "data stream") -> rd.Dataset:
    """Literal phrase search over the corpus — the distributed-grep
    primitive (contamination spot checks, boilerplate hunting, "which
    docs say X" audits run this before anything indexed): (doc_id,
    n_hits, first_pos) for every doc containing ``phrase``. Counts are
    non-overlapping left-to-right and first_pos is 0-based chars —
    both semantics shared bit-exactly by the Arrow kernels and the SQL
    replace()/position() replica.

    Map-side only, fully vectorized: one ``count_substring`` + one
    ``find_substring`` Arrow kernel call per batch, zero Python per
    row; the text column is the only payload read."""
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
        n = pc.count_substring(t["text"], pattern=phrase)
        f = pc.find_substring(t["text"], pattern=phrase)
        out = pa.table({"doc_id": t["doc_id"],
                        "n_hits": pc.cast(n, pa.int64()),
                        "first_pos": pc.cast(f, pa.int64())})
        return out.filter(pc.greater(out["n_hits"], 0))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def phrase_match_stats_sql(phrase: str = "data stream") -> str:
    p = phrase.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST((length(text) - length(replace(text, '{p}', '')))
            // {len(phrase)} AS BIGINT) AS n_hits,
       CAST(position('{p}' IN text) - 1 AS BIGINT) AS first_pos
FROM documents
WHERE position('{p}' IN text) > 0"""


def phrase_search_indexed(sf_dir: str,
                          phrase: str = "data stream") -> rd.Dataset:
    """Quoted-phrase search against the persisted POSITIONAL inverted
    index — the scale path ``phrase_match_stats`` (full-corpus
    substring scan) motivates: the index is built once (one corpus
    pass, the textindex discipline: atomic publish, freshness stamp,
    delta append), and each phrase query reads ONLY the partitions its
    words hash into, resolving adjacency with two groupbys and zero
    per-doc Python (stages/textindex.phrase_search_indexed). Word-level
    semantics (token adjacency, 0-based token indices) — the SQL oracle
    derives the same from string_split, independent of the index."""
    import tempfile

    from ..sources.corpus import _input_digest
    from ..stages import textindex as ti

    index_dir = os.path.join(tempfile.gettempdir(), "pdf_extraction_ray",
                             "posindex",
                             f"{os.path.basename(sf_dir)}-{_input_digest(sf_dir)}")
    ti.ensure_inverted_index(_docs(sf_dir, ["doc_id", "text"]), index_dir,
                             stamp_ds=_docs(sf_dir, ["doc_id"]),
                             positions=True)
    return ti.phrase_search_indexed(index_dir, phrase)


def phrase_search_indexed_sql(phrase: str = "data stream") -> str:
    """Independent word-level derivation: every token start i with
    w[i+j] = phrase[j] for all j (DuckDB lists are 1-based; output
    token indices are 0-based)."""
    words = phrase.split(" ")
    K = len(words)
    conds = " AND ".join(
        f"w[i + {j}] = '{w.replace(chr(39), chr(39) * 2)}'"
        for j, w in enumerate(words))
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hits AS (
  SELECT doc_id,
         list_filter(range(1, greatest(len(w) - {K} + 2, 1)),
                     i -> {conds}) AS ss
  FROM w
)
SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_hits,
       CAST(ss[1] - 1 AS BIGINT) AS first_tok
FROM hits WHERE len(ss) > 0"""


def synth_sitemap_xml(section: str, part: int | None = None) -> str:
    """Deterministic per-section sitemap XML (the fetched-response
    stand-in, same device as ``synth_robots_txt`` — the oracle
    re-derives the DISCOVERED entries analytically from the section
    seed while the engine must really parse).

    Seed ``s = _robots_seed(section)``; entries are i = 0..(4 + s%5)-1
    with j = (s*131 + 37*i) % 800 (37 ⊥ 800 ⇒ distinct), loc =
    corpus-url(section, j), lastmod '' for i == 0 (optional-field
    tolerance) else 2026-MM-DD from j, priority '0.'+(j%9+1).
    Structure branches: s % 3 == 0 ⇒ a <sitemapindex> of two child
    urlsets splitting entries by i parity (``part`` 0/1 selects the
    child; the recursive resolve path is exercised), else one flat
    urlset. Junk planted for the parser: xmlns namespace, comments, an
    unknown <generator> element, mixed whitespace."""
    s = _robots_seed(section) if section else 0
    if not section:
        return "<urlset/>"
    if part is None and s % 3 == 0:
        children = "\n".join(
            f"  <sitemap><loc>https://corpus.example/{section}"
            f"/sitemap-{k}.xml</loc></sitemap>" for k in (0, 1))
        return ("<?xml version='1.0' encoding='UTF-8'?>\n"
                "<sitemapindex xmlns='http://www.sitemaps.org/schemas"
                "/sitemap/0.9'>\n"
                f"  <!-- synthetic index for {section} (seed {s}) -->\n"
                f"{children}\n</sitemapindex>\n")
    rows = []
    for i in range(4 + s % 5):
        if part is not None and i % 2 != part:
            continue
        j = (s * 131 + 37 * i) % 800
        lastmod = ("" if i == 0 else
                   f"2026-{j % 12 + 1:02d}-{j % 28 + 1:02d}")
        lm = f"<lastmod>{lastmod}</lastmod>" if lastmod else ""
        rows.append(
            f"  <url>\n    <loc>https://corpus.example/{section}"
            f"/d{j:07d}</loc>\n    {lm}"
            f"<priority>0.{j % 9 + 1}</priority>\n  </url>")
    body = "\n".join(rows)
    return ("<?xml version='1.0' encoding='UTF-8'?>\n"
            "<!-- synthetic urlset -->\n"
            "<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>\n"
            "  <generator>graft-synth</generator>\n"
            f"{body}\n</urlset>\n")


def sitemap_urls(sf_dir: str,
                 sitemap_xml_of=synth_sitemap_xml) -> rd.Dataset:
    """Sitemap-driven url DISCOVERY — the crawl-frontier growth side
    (``robots_gate`` is the access side; ``crawl_frontier`` ranks what
    both emit): each site section's sitemap tree is fetched and parsed
    map-side (real XML via functions/sitemap.py, <sitemapindex> docs
    resolved breadth-first with bounded depth/doc-count), then the
    discovered urls LEFT-join the crawled corpus to flag already-crawled
    vs net-new — (section, url, lastmod, priority, in_corpus).

    Scale shape: the parse stage's input is one row per DISTINCT
    section (a tiny groupby count vs the corpus — millions of hosts,
    not trillions of pages), each batch parsing its sections
    independently (actor-poolable for connection reuse); membership is
    the existing partition-wise ``hash_join`` on
    stable_hash64(section/dNNNNNNN) — no driver-side url set ever
    exists."""
    from ..functions.hashing import stable_hash64
    from ..functions.sitemap import resolve_sitemap_entries
    from ..stages.joins import hash_join

    def fetch(loc: str) -> str:
        # loc ↔ (section, part) for the synthetic tree; a real fetcher
        # would GET the loc (actor-pool stage owning an HTTP session).
        tail = loc.rsplit("/", 2)
        section = tail[-2] if len(tail) >= 2 else ""
        name = tail[-1]
        part = (int(name[len("sitemap-"):-len(".xml")])
                if name.startswith("sitemap-") else None)
        return sitemap_xml_of(section, part)

    def discover(t: pa.Table) -> pa.Table:
        secs, urls, mods, pris, keys = [], [], [], [], []
        for sec in t["source"].to_pylist():
            entries = resolve_sitemap_entries(
                fetch, f"https://corpus.example/{sec}/sitemap.xml")
            for loc, lastmod, priority in entries:
                secs.append(sec)
                urls.append(loc)
                mods.append(lastmod)
                pris.append(priority)
                keys.append(stable_hash64(loc.rsplit("/", 2)[-2] + "/"
                                          + loc.rsplit("/", 1)[-1]))
        return pa.table({
            "section": pa.array(secs, pa.string()),
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
            "priority": pa.array(pris, pa.string()),
            "k": pa.array(keys, pa.int64()),
        })

    def corpus_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        last = pc.cast(t["doc_id"], pa.int64()).to_numpy() % 10
        keep = (last != 3) & (last != 7)
        ids = t["doc_id"].to_numpy()[keep]
        srcs = np.asarray(t["source"].to_pylist(), dtype=object)[keep]
        ks = [stable_hash64(f"{s}/d{d:07d}") for s, d in zip(srcs, ids)]
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "mark": pa.array(np.ones(len(ks), np.int64))})

    sections = _docs(sf_dir, ["source"]).groupby("source").count()
    discovered = sections.map_batches(discover, batch_format="pyarrow")
    marks = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        corpus_keys, batch_format="pyarrow")
    joined = hash_join(discovered, marks, "k", "k",
                       ["section", "url", "lastmod", "priority"],
                       ["mark"], how="left")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "section": t["section"],
            "url": t["url"],
            "lastmod": t["lastmod"],
            "priority": t["priority"],
            "in_corpus": pc.fill_null(
                pc.equal(t["mark"], pa.scalar(1, pa.int64())), False),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def sitemap_urls_sql() -> str:
    """Analytic re-derivation of the synthetic sitemap trees: entries
    from the section seed (the index/urlset structural branch changes
    only HOW the engine fetches, never WHICH entries exist), membership
    via a correlated EXISTS against documents (suffixed corpus urls —
    doc_id % 10 in (3,7) — never match a sitemap loc)."""
    return """
WITH secs AS (
  SELECT DISTINCT source AS section FROM documents
), sd AS (
  SELECT section, (ascii(substr(section, 1, 1)) * 31
         + ascii(substr(section, length(section), 1)) * 7
         + 13 * length(section)) % 16 AS s
  FROM secs
), e AS (
  SELECT section, s, g.i, (s * 131 + 37 * g.i) % 800 AS j
  FROM sd CROSS JOIN generate_series(0, 8) g(i)
  WHERE g.i < 4 + s % 5
)
SELECT section,
  'https://corpus.example/' || section || '/d'
    || lpad(CAST(j AS VARCHAR), 7, '0') AS url,
  CASE WHEN i = 0 THEN '' ELSE
    '2026-' || lpad(CAST(j % 12 + 1 AS VARCHAR), 2, '0')
    || '-' || lpad(CAST(j % 28 + 1 AS VARCHAR), 2, '0') END AS lastmod,
  '0.' || CAST(j % 9 + 1 AS VARCHAR) AS priority,
  EXISTS(SELECT 1 FROM documents d
         WHERE d.doc_id = e.j AND d.source = e.section
           AND e.j % 10 NOT IN (3, 7)) AS in_corpus
FROM e"""


def doc_signals(sf_dir: str) -> rd.Dataset:
    """One-pass WIDE quality-signals table (the RedPajama-v2 pattern:
    emit every per-doc signal as a column ONCE, filter later from the
    cheap signals table instead of re-reading 100 TB of text per rule).
    Fuses the token stats, language id, bigram repetition, and the
    Gopher rule verdict into a single map over a single read — at scale
    this replaces four separate passes; downstream filters then read
    ~100 B/doc instead of the corpus.

    All signals are the byte-identical counterparts of the standalone
    operators (token_stats / lang_id / gopher_filter), so the fused SQL
    oracle is assembled from the same verified fragments."""
    from collections import Counter

    en_stop = LANG_PROFILES["en"]

    def add(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "n_chars", "n_tokens", "n_stop", "n_upper", "sum_token_len",
            "token_estimate", "lang_pred", "n_bigrams", "top_bigram_n",
            "reason")}
        for t in batch["text"].to_pylist():
            t = t or ""
            toks = TOKEN_RE.findall(t)
            n, s = len(toks), sum(len(w) for w in toks)
            words = t.split(" ")
            bc = Counter(zip(words, words[1:]))
            n_bi = sum(bc.values())
            top = max(bc.values(), default=0)
            cols["n_chars"].append(len(t))
            cols["n_tokens"].append(n)
            cols["n_stop"].append(
                sum(1 for w in toks if w.lower() in en_stop))
            cols["n_upper"].append(sum(1 for c in t if c.isupper()))
            cols["sum_token_len"].append(s)
            cols["token_estimate"].append(len(t) // 4)
            cols["lang_pred"].append(detect_lang(t))
            cols["n_bigrams"].append(n_bi)
            cols["top_bigram_n"].append(top)
            if n < 20:
                reason = "too_few_tokens"
            elif not (3 * n <= s <= 10 * n):
                reason = "bad_mean_word_len"
            elif 5 * s < 2 * len(t):
                reason = "too_much_nonword"
            elif 5 * top > n_bi:
                reason = "top_bigram_heavy"
            else:
                reason = "pass"
            cols["reason"].append(reason)
        out = {"doc_id": pa.array(ids, pa.int64())}
        for k, v in cols.items():
            out[k] = pa.array(v, pa.string() if k in ("lang_pred", "reason")
                              else pa.int64())
        return pa.table(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow")


def doc_signals_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES["en"]))

    def hits(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[lang]))
        return (f"len(list_filter(regexp_extract_all(lower(substr(text, 1, "
                f"2000)), '[a-z0-9_]+'), t -> t IN ({words})))")

    return f"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                         t -> t IN ({stop}))) AS n_stop,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
         len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS sum_token_len,
         length(regexp_replace(substr(text, 1, 2000),
                               '[^一-鿿]', '', 'g')) AS han,
         length(substr(text, 1, 2000)) AS slen,
         {hits('en')} AS h_en, {hits('fr')} AS h_fr,
         {hits('es')} AS h_es, {hits('de')} AS h_de,
         string_split(text, ' ') AS w
  FROM documents
), bi AS (
  SELECT doc_id,
         CAST(coalesce(sum(c), 0) AS BIGINT) AS n_bigrams,
         CAST(coalesce(max(c), 0) AS BIGINT) AS top_bigram_n
  FROM (
    SELECT doc_id, bg, count(*) AS c
    FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                i -> w[i] || chr(0) || w[i+1])) AS bg
          FROM t)
    GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_stop AS BIGINT) AS n_stop,
  CAST(n_upper AS BIGINT) AS n_upper,
  CAST(sum_token_len AS BIGINT) AS sum_token_len,
  CAST(n_chars // 4 AS BIGINT) AS token_estimate,
  CASE WHEN slen = 0 THEN 'und'
       WHEN han * 20 > slen THEN 'zh'
       WHEN greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
       WHEN h_en = greatest(h_en, h_fr, h_es, h_de) THEN 'en'
       WHEN h_fr = greatest(h_fr, h_es, h_de) THEN 'fr'
       WHEN h_es = greatest(h_es, h_de) THEN 'es'
       ELSE 'de' END AS lang_pred,
  coalesce(bi.n_bigrams, 0) AS n_bigrams,
  coalesce(bi.top_bigram_n, 0) AS top_bigram_n,
  CASE
    WHEN n_tokens < 20 THEN 'too_few_tokens'
    WHEN NOT (3 * n_tokens <= sum_token_len
              AND sum_token_len <= 10 * n_tokens) THEN 'bad_mean_word_len'
    WHEN 5 * sum_token_len < 2 * n_chars THEN 'too_much_nonword'
    WHEN 5 * coalesce(bi.top_bigram_n, 0) > coalesce(bi.n_bigrams, 0)
      THEN 'top_bigram_heavy'
    ELSE 'pass'
  END AS reason
FROM t LEFT JOIN bi ON bi.doc_id = t.doc_id"""


def quality_filter(sf_dir: str) -> rd.Dataset:
    """C4/Gopher-style quality filtering: keep documents passing integer
    threshold rules (pure-integer comparisons so the SQL oracle is exact):

    * at least 20 tokens
    * mean token length in [3, 10]:  3*n_tokens <= sum_len <= 10*n_tokens
    * at most 60% of chars outside tokens: 5*sum_len >= 2*n_chars
    """
    def keep(batch: pa.Table) -> pa.Table:
        ids, langs = batch["doc_id"].to_pylist(), batch["lang"].to_pylist()
        out_id, out_lang, out_tok = [], [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = TOKEN_RE.findall(t)
            n, s = len(toks), sum(len(w) for w in toks)
            if n >= 20 and 3 * n <= s <= 10 * n and 5 * s >= 2 * len(t):
                out_id.append(ids[i])
                out_lang.append(langs[i])
                out_tok.append(n)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "lang": pa.array(out_lang, pa.string()),
                         "n_tokens": pa.array(out_tok, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        keep, batch_format="pyarrow")


def quality_filter_sql() -> str:
    return """
WITH t AS (
  SELECT doc_id, lang, length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS sum_len
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM t
WHERE n_tokens >= 20 AND 3 * n_tokens <= sum_len
  AND sum_len <= 10 * n_tokens AND 5 * sum_len >= 2 * n_chars"""


GOPHER_RULES = ("too_few_tokens", "bad_mean_word_len", "too_much_nonword",
                "top_bigram_heavy")


def _gopher_reason(text: str) -> str:
    """First failing Gopher rule for one document ('pass' if none) —
    pure-integer comparisons shared by ``gopher_filter`` and
    ``curate_pipeline`` (and replicated in ``_gopher_sql_parts``)."""
    from collections import Counter

    toks = TOKEN_RE.findall(text)
    n, s = len(toks), sum(len(w) for w in toks)
    words = text.split(" ")
    bc = Counter(zip(words, words[1:]))
    n_bi = sum(bc.values())
    top = max(bc.values(), default=0)
    if n < 20:
        return "too_few_tokens"
    if not (3 * n <= s <= 10 * n):
        return "bad_mean_word_len"
    if 5 * s < 2 * len(text):
        return "too_much_nonword"
    if 5 * top > n_bi:
        return "top_bigram_heavy"
    return "pass"


def _gopher_sql_parts() -> str:
    """The t/bi/r CTE bodies computing per-doc ``reason`` — shared by
    ``gopher_filter_sql`` and ``curate_pipeline_sql``."""
    return """t AS (
  SELECT doc_id, text, length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS sum_len,
         string_split(text, ' ') AS w
  FROM documents
), bi AS (
  SELECT doc_id,
         CAST(coalesce(sum(c), 0) AS BIGINT) AS n_bigrams,
         CAST(coalesce(max(c), 0) AS BIGINT) AS top_bigram_n
  FROM (
    SELECT doc_id, bg, count(*) AS c
    FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                i -> w[i] || chr(0) || w[i+1])) AS bg
          FROM t)
    GROUP BY doc_id, bg)
  GROUP BY doc_id
), r AS (
  SELECT t.doc_id, t.text,
         CASE
           WHEN n_tokens < 20 THEN 'too_few_tokens'
           WHEN NOT (3 * n_tokens <= sum_len AND sum_len <= 10 * n_tokens)
             THEN 'bad_mean_word_len'
           WHEN 5 * sum_len < 2 * n_chars THEN 'too_much_nonword'
           WHEN 5 * coalesce(top_bigram_n, 0) > coalesce(n_bigrams, 0)
             THEN 'top_bigram_heavy'
           ELSE 'pass'
         END AS reason
  FROM t LEFT JOIN bi ON bi.doc_id = t.doc_id
)"""


def gopher_filter(sf_dir: str) -> rd.Dataset:
    """Composite Gopher-style rule bundle WITH audit reasons (Rae et al.
    2021 §A1.1 / Dolma-style taggers): every document gets (keep, reason)
    where reason is the FIRST failing rule in a fixed order — the
    operator a curation pipeline runs to tune thresholds from rejection
    histograms, vs ``quality_filter`` which silently drops.

    Rules (pure-integer comparisons, so the SQL oracle is exact):
    1. too_few_tokens:    n_tokens < 20
    2. bad_mean_word_len: not (3*n_tokens <= sum_len <= 10*n_tokens)
    3. too_much_nonword:  5*sum_len < 2*n_chars
    4. top_bigram_heavy:  5*top_bigram_n > n_bigrams (one bigram carries
       >20% of bigram mass — the within-doc repetition signal)

    Map-side only (one pass, no shuffle); reasons are a tiny dictionary
    column at scale."""
    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        reasons = [_gopher_reason(t or "") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "keep": pa.array([r == "pass" for r in reasons], pa.bool_()),
            "reason": pa.array(reasons, pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tag, batch_format="pyarrow")


def gopher_filter_sql() -> str:
    return ("\nWITH " + _gopher_sql_parts() +
            "\nSELECT doc_id, (reason = 'pass') AS keep, reason FROM r")


# RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1): a curation
# pipeline's FIRST gate, run over the crawl frontier before any payload
# is fetched or parsed. Two rules, fixed order (first-failing wins, the
# gopher_filter audit-reason shape):
#   1. blocked_section — the url's site section (first path segment;
#      the single-host corpus' stand-in for the domain) is on the
#      blocklist. The real operator carries a multi-million-domain set:
#      broadcast it once (ray.put / actor __init__), probe per batch
#      with one vectorized is_in — never re-ship per block.
#   2. badword_score — weighted soft score over url substrings
#      (RefinedWeb's word-based scoring); reject at >= reject_at.
# The planted corpus exercises every outcome: sections src3/src5 are
# blocked ('src3' ids end in 3, so those urls ALSO score 2 — proving
# rule precedence), '-memo' urls score 2 (reject), '-qp' urls score 1
# (keep) unless doc_id < 100 where the 'd00000' zero-run adds 1 (reject).
URL_BLOCK_SECTIONS = ("src3", "src5")
URL_BADWORDS = (("-memo", 2), ("-qp", 1), ("00000", 1))
URL_SCORE_REJECT = 2


def url_blocklist_filter(sf_dir: str,
                         blocked: tuple = URL_BLOCK_SECTIONS,
                         badwords: tuple = URL_BADWORDS,
                         reject_at: int = URL_SCORE_REJECT) -> rd.Dataset:
    """URL blocklist + bad-word-score frontier filter with audit reasons.

    Map-side only (one pass, no shuffle): urls derive vectorized from
    (doc_id, source) via pyarrow string kernels; the section probe is
    one ``is_in`` against the (broadcast) blocklist and the score is
    k vectorized ``match_substring`` passes for a k-word list — no
    Python loop over rows. Output (doc_id, url, section, score, keep,
    reason) feeds the same rejection-histogram tuning loop as
    ``gopher_filter``."""
    import pyarrow.compute as pc
    block_set = pa.array(sorted(set(blocked)), pa.string())

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        pad = pc.utf8_lpad(pc.cast(ids, pa.string()), 7, "0")
        last = ids.to_numpy() % 10
        suffix = pa.array(
            np.where(last == 3, "-memo",
                     np.where(last == 7, "-qp", "")).tolist(), pa.string())
        dpart = pc.binary_join_element_wise(
            pa.scalar("d"), pad, suffix, pa.scalar(""))
        urls = pc.binary_join_element_wise(
            pa.scalar("https://corpus.example"), batch["source"], dpart,
            pa.scalar("/"))
        score = np.zeros(len(batch), np.int64)
        for w, wt in badwords:
            score += wt * pc.match_substring(urls, w).to_numpy(
                zero_copy_only=False).astype(np.int64)
        blk = pc.is_in(batch["source"], value_set=block_set).to_numpy(
            zero_copy_only=False)
        reason = np.where(blk, "blocked_section",
                          np.where(score >= reject_at, "badword_score",
                                   "pass"))
        return pa.table({
            "doc_id": ids,
            "url": urls,
            "section": batch["source"],
            "score": pa.array(score, pa.int64()),
            "keep": pa.array((reason == "pass").tolist(), pa.bool_()),
            "reason": pa.array(reason.tolist(), pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        tag, batch_format="pyarrow")


def url_blocklist_filter_sql(blocked: tuple = URL_BLOCK_SECTIONS,
                             badwords: tuple = URL_BADWORDS,
                             reject_at: int = URL_SCORE_REJECT) -> str:
    blk = ", ".join(f"'{s}'" for s in sorted(set(blocked)))
    terms = " + ".join(
        f"(CASE WHEN contains(url, '{w}') THEN {wt} ELSE 0 END)"
        for w, wt in badwords)
    return f"""
WITH u AS (
  SELECT doc_id, source AS section,
         'https://corpus.example/' || source || '/d'
           || lpad(CAST(doc_id AS VARCHAR), 7, '0')
           || (CASE WHEN doc_id % 10 = 3 THEN '-memo'
                    WHEN doc_id % 10 = 7 THEN '-qp' ELSE '' END) AS url
  FROM documents
), s AS (
  SELECT doc_id, url, section, CAST({terms} AS BIGINT) AS score FROM u
)
SELECT doc_id, url, section, score,
       (section NOT IN ({blk}) AND score < {reject_at}) AS keep,
       (CASE WHEN section IN ({blk}) THEN 'blocked_section'
             WHEN score >= {reject_at} THEN 'badword_score'
             ELSE 'pass' END) AS reason
FROM s"""


# robots.txt gate — the crawl loop's access-control stage, completing
# the frontier family: url_blocklist_filter is what the OPERATOR won't
# fetch; this is what the SITE forbids (RFC 9309). A real crawler
# resolves robots per HOST; the single-host corpus' url sections stand
# in for hosts (the section_quality_stats convention), and the robots
# bodies are synthesized deterministically per section — the planted-
# derivation pattern: the ENGINE must parse real robots.txt text
# (groups, precedence, wildcards, $-anchors — functions/robots.py),
# while the oracle re-derives the expected DECISION analytically from
# the section seed. The seed uses only ascii()/length() of the section
# string so the SQL replicates it exactly.
ROBOTS_AGENT = "graftbot"


def _robots_seed(section: str) -> int:
    return (ord(section[0]) * 31 + ord(section[-1]) * 7
            + 13 * len(section)) % 16


def synth_robots_txt(section: str) -> str:
    """Deterministic per-section robots.txt (the fetched-response stand-in).

    Branches by seed: s%4==0 -> the ``*`` group disallows everything;
    s%4==2 -> the ``*`` group bans ``-memo`` urls; odd s -> a graftbot
    group overrides the ``*`` group entirely (RFC 9309 group selection)
    with a -qp ban, a LONGER allow for ``77-qp`` urls, and (s&4) a
    still-longer id-range disallow that beats the allow — so
    longest-match precedence is exercised in both directions. Junk the
    parser must tolerate is planted too: comments, an ignored otherbot
    group, empty Disallow, mixed directive case, Crawl-delay/Sitemap.
    """
    if not section:
        return ""          # no host section -> no robots -> default allow
    s = _robots_seed(section)
    lines = [
        f"# synthetic robots.txt for section {section} (seed {s})",
        "Sitemap: https://corpus.example/sitemap.xml",
        "",
        "User-agent: otherbot",
        "Disallow: /",
        "",
        "User-AGENT: *",
        "Disallow:",                       # empty = allow-all no-op
        f"Disallow: /{section}/tmp/",      # never matches corpus urls
    ]
    if s % 4 == 0:
        lines.append("Disallow: /")
    elif s % 4 == 2:
        lines.append("Disallow: /*-memo$")
    lines.append(f"Crawl-delay: {s % 7 + 1}")
    if s % 2 == 1:
        lines += ["",
                  f"User-agent: {ROBOTS_AGENT}",
                  "Allow: /*77-qp$",
                  "Disallow: /*-qp$"]
        if s & 4:
            lines.append(f"Disallow: /*/d0000{s % 10}")
    return "\n".join(lines) + "\n"


def _robots_eval(paths: np.ndarray, sections: np.ndarray, agent: str,
                 robots_txt_of) -> tuple[np.ndarray, np.ndarray]:
    """Shared per-batch robots evaluation: group rows by section, parse
    that section's robots body once, run one compiled-regex pass per
    rule over its path array. Returns (allowed, rule_text) arrays."""
    from ..functions.robots import (evaluate_paths, parse_robots_txt,
                                    rules_for_agent)
    allowed = np.ones(len(paths), dtype=bool)
    rule = np.full(len(paths), "", dtype=object)
    for sec in np.unique(sections):
        idx = np.nonzero(sections == sec)[0]
        rules = rules_for_agent(
            parse_robots_txt(robots_txt_of(str(sec))), agent)
        allowed[idx], rule[idx] = evaluate_paths(rules, paths[idx])
    return allowed, rule


def robots_tag_urls(ds: rd.Dataset, agent: str = ROBOTS_AGENT,
                    robots_txt_of=synth_robots_txt,
                    url_col: str = "url") -> rd.Dataset:
    """Generic robots verdict over ANY url-bearing Dataset (the
    composition surface — run_linkgraph's ``--robots-agent`` gates the
    re-crawl frontier through this): appends (allowed, rule) columns,
    deriving path and section (host stand-in = first path segment) from
    the url string itself. Map-side only."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        urls = t[url_col].combine_chunks()
        # RFC 3986 schemes are case-insensitive — 'HTTPS://...' must not
        # fall through to the sectionless default-allow path
        ex = pc.extract_regex(
            urls, pattern=r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(?P<p>/.*)$")
        paths_arr = pc.fill_null(pc.struct_field(ex, "p"), "/")
        sec_ex = pc.extract_regex(paths_arr, pattern=r"^/(?P<s>[^/]+)/")
        secs = pc.fill_null(pc.struct_field(sec_ex, "s"), "")
        allowed, rule = _robots_eval(
            np.asarray(paths_arr.to_pylist(), dtype=object),
            np.asarray(secs.to_pylist(), dtype=object),
            agent, robots_txt_of)
        return (t.append_column("allowed",
                                pa.array(allowed.tolist(), pa.bool_()))
                 .append_column("rule", pa.array(rule.tolist(), pa.string())))

    return ds.map_batches(tag, batch_format="pyarrow")


def robots_gate(sf_dir: str, agent: str = ROBOTS_AGENT,
                robots_txt_of=synth_robots_txt) -> rd.Dataset:
    """Per-url robots verdict over the corpus frontier: (doc_id, url,
    section, allowed, rule) where ``rule`` is the winning Allow/Disallow
    line ('' = no rule matched, default allow) — the gopher_filter
    audit-reason shape, so rejection histograms tune crawl scope.

    Map-side only (one pass, no shuffle): urls/paths derive vectorized
    from (doc_id, source); each batch groups rows by section and runs
    one compiled-regex pass per rule over that section's path array
    (functions/robots.py:evaluate_paths). Robots bodies parse once per
    distinct section per batch — O(sections-in-batch) tiny parses; at
    real scale (millions of hosts) hold the parsed-rule cache in an
    actor pool's ``__init__``-owned dict keyed by host, or hash-partition
    urls by host and attach rules per partition."""
    import pyarrow.compute as pc

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        pad = pc.utf8_lpad(pc.cast(ids, pa.string()), 7, "0")
        last = ids.to_numpy() % 10
        suffix = pa.array(
            np.where(last == 3, "-memo",
                     np.where(last == 7, "-qp", "")).tolist(), pa.string())
        dpart = pc.binary_join_element_wise(
            pa.scalar("d"), pad, suffix, pa.scalar(""))
        paths_arr = pc.binary_join_element_wise(
            pa.scalar(""), batch["source"], dpart, pa.scalar("/"))
        urls = pc.binary_join_element_wise(
            pa.scalar("https://corpus.example"), paths_arr, pa.scalar(""))
        allowed, rule = _robots_eval(
            np.asarray(paths_arr.to_pylist(), dtype=object),
            np.asarray(batch["source"].to_pylist(), dtype=object),
            agent, robots_txt_of)
        return pa.table({
            "doc_id": ids,
            "url": urls,
            "section": batch["source"],
            "allowed": pa.array(allowed.tolist(), pa.bool_()),
            "rule": pa.array(rule.tolist(), pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        tag, batch_format="pyarrow")


def robots_gate_sql() -> str:
    """Analytic re-derivation of the planted robots decisions.

    Replays synth_robots_txt's branch logic per section seed; the
    longest-match precedence (9-char id-range Disallow > 8-char 77-qp
    Allow > 6-char -qp Disallow) is encoded as CASE order."""
    return """
WITH u AS (
  SELECT doc_id, source AS section,
         'https://corpus.example/' || source || '/d'
           || lpad(CAST(doc_id AS VARCHAR), 7, '0')
           || (CASE WHEN doc_id % 10 = 3 THEN '-memo'
                    WHEN doc_id % 10 = 7 THEN '-qp' ELSE '' END) AS url,
         doc_id % 10 AS l, doc_id % 100 AS l2, doc_id // 100 AS h
  FROM documents
), sd AS (
  SELECT *, (ascii(substr(section, 1, 1)) * 31
             + ascii(substr(section, length(section), 1)) * 7
             + 13 * length(section)) % 16 AS s
  FROM u
)
SELECT doc_id, url, section,
  CASE
    WHEN s % 2 = 1 THEN CASE
      WHEN (s // 4) % 2 = 1 AND h = s % 10 THEN FALSE
      WHEN l2 = 77 THEN TRUE
      WHEN l = 7 THEN FALSE
      ELSE TRUE END
    WHEN s % 4 = 0 THEN FALSE
    ELSE (l != 3) END AS allowed,
  CASE
    WHEN s % 2 = 1 THEN CASE
      WHEN (s // 4) % 2 = 1 AND h = s % 10
        THEN 'Disallow: /*/d0000' || CAST(s % 10 AS VARCHAR)
      WHEN l2 = 77 THEN 'Allow: /*77-qp$'
      WHEN l = 7 THEN 'Disallow: /*-qp$'
      ELSE '' END
    WHEN s % 4 = 0 THEN 'Disallow: /'
    WHEN l = 3 THEN 'Disallow: /*-memo$'
    ELSE '' END AS rule
FROM sd"""


def doc_passages(sf_dir: str, k: int = 32, overlap: int = 8) -> rd.Dataset:
    """RAG-style passage chunking — the retrieval-corpus explode: each
    document splits into overlapping ``k``-word windows at stride
    ``k - overlap``, one output row per (doc_id, passage_idx) with the
    passage text. Pure flat-map (rows fan out ~n_words/stride per doc,
    no shuffle); downstream embedding/indexing stages consume these
    rows directly. Last window rule: a doc with <= k words is one
    passage; otherwise ceil((n - k)/stride) + 1 windows, final window
    possibly short."""
    if not 0 <= overlap < k:
        raise ValueError(
            f"doc_passages needs 0 <= overlap < k, got k={k} "
            f"overlap={overlap} (stride {k - overlap} must be positive)")
    stride = k - overlap

    def explode(batch: pa.Table) -> pa.Table:
        d_o, i_o, t_o, n_o = [], [], [], []
        for doc, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            words = (text or "").split(" ")
            n = len(words)
            n_pass = 1 if n <= k else -(-(n - k) // stride) + 1
            for i in range(n_pass):
                w = words[i * stride:i * stride + k]
                d_o.append(doc)
                i_o.append(i)
                t_o.append(" ".join(w))
                n_o.append(len(w))
        return pa.table({
            "doc_id": pa.array(d_o, pa.int64()),
            "passage_idx": pa.array(i_o, pa.int64()),
            "passage": pa.array(t_o, pa.string()),
            "n_words": pa.array(n_o, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")


def doc_passages_sql(k: int = 32, overlap: int = 8) -> str:
    if not 0 <= overlap < k:
        raise ValueError(
            f"doc_passages_sql needs 0 <= overlap < k, got k={k} "
            f"overlap={overlap}")
    stride = k - overlap
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
  FROM documents
), idx AS (
  SELECT doc_id, w, n,
         unnest(range(CASE WHEN n <= {k} THEN 1
                           ELSE CAST(ceil((n - {k}) / {stride}.0) AS BIGINT) + 1
                      END)) AS passage_idx
  FROM w
)
SELECT doc_id, passage_idx,
       array_to_string(w[passage_idx * {stride} + 1 :
                         passage_idx * {stride} + {k}], ' ') AS passage,
       CAST(least({k}, n - passage_idx * {stride}) AS BIGINT) AS n_words
FROM idx"""


def normalize_text(sf_dir: str) -> rd.Dataset:
    """Text normalization — the standard pre-training cleaning stage:
    NFC unicode normalization, control characters stripped, whitespace
    runs collapsed to one space, ends trimmed. Pure map (no shuffle);
    emits the cleaned text plus before/after lengths so the oracle
    pins every transform. Python's unicodedata.normalize('NFC') and
    DuckDB's nfc_normalize implement the same UAX #15 form. Oracle
    caveat (documented): Python's \\s is Unicode-aware while RE2's is
    ASCII — equivalent on this corpus (spec whitespace is ASCII); a
    corpus with U+00A0-style spaces would need an explicit class."""
    import re as _re
    import unicodedata

    ctrl = _re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
    ws = _re.compile(r"\s+")

    def clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        out = []
        for t in batch["text"].to_pylist():
            s = unicodedata.normalize("NFC", t or "")
            s = ctrl.sub("", s)
            s = ws.sub(" ", s).strip()
            out.append(s)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "clean_text": pa.array(out, pa.string()),
            "n_chars_clean": pa.array([len(s) for s in out], pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        clean, batch_format="pyarrow")


def normalize_text_sql() -> str:
    return r"""
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(
             regexp_replace(nfc_normalize(text),
                            '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
             '\s+', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text,
       CAST(length(clean_text) AS BIGINT) AS n_chars_clean
FROM c"""


def doc_shuffle(sf_dir: str, seed: int = 42,
                num_partitions: int = 32) -> rd.Dataset:
    """Deterministic global shuffle — the reshuffle a training pipeline
    runs before sequence packing / sharding, as a RANGE-PARTITIONED
    order (not ``random_shuffle``, whose output is irreproducible):
    position = global rank under stable_hash64(seed, doc_id). Hash
    values partition monotonically (hash >> k is the range partitioner),
    so the two-phase prefix scan assigns exact positions with only a
    P-row offset exchange on the driver; ties (hash collisions) break
    by doc_id so the order is total and the SQL oracle bit-matches."""
    from ..functions.hashing import stable_hash64
    from ..stages.scan import prefix_scan

    P = num_partitions
    width = ((1 << 63) + P - 1) // P

    def add_h(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h = [stable_hash64(f"shuffle:{seed}:{d}") for d in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "h": pa.array(h, pa.int64())})

    hs = _docs(sf_dir, ["doc_id"]).map_batches(add_h,
                                               batch_format="pyarrow")
    out = prefix_scan(hs,
                      lambda b: np.asarray(b["h"].to_pylist(),
                                           np.int64) // width,
                      sort_cols=["h", "doc_id"], rank_col="pos")
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "pos": t["pos"]}),
        batch_format="pyarrow")


def doc_shuffle_sql(seed: int = 42) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, sha256('shuffle:{seed}:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
), hv AS (
  SELECT doc_id, {_sql_hash64("hx")} AS h FROM d
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM hv"""


def quality_percentile_filter(sf_dir: str, q: float = 0.5) -> rd.Dataset:
    """Corpus-RELATIVE percentile filter (FineWeb-style "keep the top
    half by metric"): phase 1 computes the exact global q-quantile of
    ``n_chars`` with the histogram combiner — per-batch bincount
    partials, O(max value) driver state, NO sort and NO shuffle
    (stages/sketch.py:global_quantile_threshold); phase 2 streams a
    broadcast-compare filter over a 2-column pruned read. The absolute
    rules in ``quality_filter`` can't adapt to corpus drift; this is
    the operator that cuts at a corpus-defined bar."""
    import pyarrow.compute as pc

    from ..stages.sketch import global_quantile_threshold

    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    thr = global_quantile_threshold(ds, "n_chars", q)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_chars"], pa.scalar(thr)))

    return ds.map_batches(keep, batch_format="pyarrow")


def quality_percentile_filter_sql(q: float = 0.5) -> str:
    return f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_disc(n_chars, {q}) FROM documents)"""


def lang_id(sf_dir: str) -> rd.Dataset:
    """Language identification vs the table's labeled lang."""
    def add(batch: pa.Table) -> pa.Table:
        preds = [detect_lang(t) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "lang": batch["lang"],
                         "lang_pred": pa.array(preds, pa.string())})
    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        add, batch_format="pyarrow")


def lang_id_sql() -> str:
    def hits(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[lang]))
        return (f"len(list_filter(regexp_extract_all(lower(substr(text, 1, 2000)), "
                f"'[a-z0-9_]+'), t -> t IN ({words})))")
    return f"""
WITH h AS (
  SELECT doc_id, lang,
         length(regexp_replace(substr(text, 1, 2000), '[^一-鿿]', '', 'g')) AS han,
         length(substr(text, 1, 2000)) AS slen,
         {hits('en')} AS h_en, {hits('fr')} AS h_fr,
         {hits('es')} AS h_es, {hits('de')} AS h_de
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN slen = 0 THEN 'und'
       WHEN han * 20 > slen THEN 'zh'
       WHEN greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
       WHEN h_en = greatest(h_en, h_fr, h_es, h_de) THEN 'en'
       WHEN h_fr = greatest(h_fr, h_es, h_de) THEN 'fr'
       WHEN h_es = greatest(h_es, h_de) THEN 'es'
       ELSE 'de' END AS lang_pred
FROM h"""


def fingerprint_docs(sf_dir: str) -> rd.Dataset:
    """Winnowing-style document fingerprints. Value-hash oracled: the
    polynomial rolling hash is reproduced exactly in SQL with HUGEINT
    window sums (``fingerprint_docs_sql``)."""
    def add(batch: pa.Table) -> pa.Table:
        ns, xs = [], []
        for t in batch["text"].to_pylist():
            fp = rolling_fingerprint(t)
            ns.append(len(fp))
            x = 0
            for h in fp:
                x ^= h
            xs.append(x % (1 << 63))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_fingerprints": pa.array(ns, pa.int64()),
                         "fp_xor": pa.array(xs, pa.int64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow")


def fingerprint_docs_sql(window: int = 16, keep_mod: int = 8) -> str:
    """Exact SQL reproduction of ``hashing.rolling_fingerprint``: the
    window hash at end-position i is a 16-term polynomial sum computed
    in HUGEINT (terms < 2^71, far inside 128-bit range) then reduced mod
    2^64-59 — identical to the incremental rolling form. Assumes every
    document has >= ``window`` chars (true of this corpus, min len 44;
    the Python short-text branch would need sha256 byte surgery)."""
    base = 1099511628211
    mod = (1 << 64) - 59
    powers = [pow(base, window - 1 - j, mod) for j in range(window)]
    terms = " + ".join(
        f"CAST(ord(substr(text, i-{window - 1 - j}, 1)) AS HUGEINT)"
        f" * CAST('{powers[j]}' AS HUGEINT)" for j in range(window))
    return f"""
WITH hs AS (
  SELECT doc_id,
         list_filter(list_transform(range({window}, length(text) + 1),
             i -> ({terms}) % CAST('{mod}' AS HUGEINT)),
           h -> h % {keep_mod} = 0) AS kept
  FROM documents
), x AS (SELECT doc_id AS d2, unnest(kept) AS h FROM hs)
SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_fingerprints,
       CAST(coalesce(bit_xor(h), 0)
            % CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS fp_xor
FROM hs LEFT JOIN x ON doc_id = d2
GROUP BY doc_id, kept"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def snapshot_ingest_dedup(sf_dir: str) -> rd.Dataset:
    """Incremental crawl-snapshot ingestion (the CCNet/Common-Crawl
    cross-snapshot dedup): a NEW snapshot batch is anti-joined by
    CONTENT hash against the already-ingested corpus, so only
    genuinely-new documents enter the pipeline. Composes the
    distributed-bloom + exact-verify anti-join (stages/dedup.py:
    bloom_anti_join — per-block partial blooms, task fan-in OR, bounded
    verify broadcast), which is the right shape when the existing corpus
    is 100 TB and the snapshot is a sliver of it.

    Snapshot simulated deterministically from the documents table:
    doc_id % 3 == 0 re-crawled UNCHANGED (must be dropped), doc_id % 3
    == 1 re-crawled with edits (must survive). Returns (doc_id,
    content_sha256) of the surviving snapshot rows."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def corpus_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"sha": pa.array(
            [sha256_hex(t or "") for t in batch["text"].to_pylist()],
            pa.string())})

    def snapshot(batch: pa.Table) -> pa.Table:
        ids, out_id, out_sha = batch["doc_id"].to_pylist(), [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            if did % 3 == 0:
                out_id.append(did + 2_000_000)
                out_sha.append(sha256_hex(t or ""))
            elif did % 3 == 1:
                out_id.append(did + 2_000_000)
                out_sha.append(sha256_hex((t or "") + " snapshot-new"))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "content_sha256": pa.array(out_sha, pa.string()),
        })

    snap = base.map_batches(snapshot, batch_format="pyarrow")
    keys = base.map_batches(corpus_keys, batch_format="pyarrow")
    return dd.bloom_anti_join(snap, keys, key_col="content_sha256",
                              right_key_col="sha")


def snapshot_ingest_dedup_sql() -> str:
    return """
WITH snap AS (
  SELECT doc_id + 2000000 AS doc_id, text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' snapshot-new'
  FROM documents WHERE doc_id % 3 = 1
)
SELECT doc_id, sha256(text) AS content_sha256 FROM snap
WHERE sha256(text) NOT IN (SELECT sha256(text) FROM documents)"""


def snapshot_neardup_ingest(sf_dir: str) -> rd.Dataset:
    """Incremental NEAR-dup snapshot ingestion against a persisted
    MinHash-LSH index — the fuzzy complement of ``snapshot_ingest_dedup``
    (exact content hash): a re-crawl with small edits hashes differently
    but must still be recognized as already-ingested. The corpus'
    signatures + LSH postings persist ONCE
    (stages/dedup.py:build_minhash_index — atomic publish, freshness
    stamp); each new snapshot is signed once and probes them through
    ids-only hash joins, so nothing over the old corpus recomputes
    (stages/dedup.py:probe_minhash_index documents the shuffle shape).

    Snapshot simulated deterministically from documents (ids +4e6):
    doc_id % 5 == 0 re-crawled with a 12-char truncation (near-dup —
    the exact-hash path would MISS it), % 5 == 1 re-crawled
    byte-identical (agree_k = num_perm), % 5 == 2 brand-new text
    (novel). Returns one decision row per snapshot doc:
    (doc_id, status 'dup'|'novel', dup_of, agree_k); admit 'novel'."""
    from ..sources.corpus import _input_digest

    base = _docs(sf_dir, ["doc_id", "text"])
    index_dir = os.path.join("/tmp/pdf_extraction_ray/minhash",
                             f"{os.path.basename(sf_dir)}-{_input_digest(sf_dir)}")
    dd.ensure_minhash_index(base, index_dir,
                            stamp_ds=_docs(sf_dir, ["doc_id"]))

    def snapshot(batch: pa.Table) -> pa.Table:
        out_id, out_t = [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            r = did % 5
            if r == 0:
                out_id.append(did + 4_000_000)
                out_t.append((t or "")[:-12])
            elif r == 1:
                out_id.append(did + 4_000_000)
                out_t.append(t or "")
            elif r == 2:
                out_id.append(did + 4_000_000)
                out_t.append(f"snapshot only page {did} fresh crawl content")
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_t, pa.large_string())})

    snap = base.map_batches(snapshot, batch_format="pyarrow")
    return dd.snapshot_neardup_statuses(snap, index_dir,
                                        jaccard_threshold=0.5)


def _minhash_probe_replay_sql(new_sql: str, old_sql: str,
                              final_select: str,
                              num_perm: int = 64, bands: int = 16,
                              threshold: float = 0.5) -> str:
    """The shared signature-replay oracle builder: given CTE bodies for
    the PROBE side (``new_sql``) and the INDEXED side (``old_sql``) —
    ids must be disjoint across the union — replays both sides'
    MinHash signatures (the ``dedup_minhash_sql`` machinery), finds
    new->old band-slice candidates, verifies >= ``threshold`` signature
    agreement, and picks the best match per probe doc (max k, tie ->
    smallest indexed id) into ``pick(nid, dup_of, k_max)``.
    ``final_select`` closes the query (it can reference ``newdocs``,
    ``olddocs`` and ``pick``)."""
    from ..functions import hashing as H

    pa_, pb_ = H._minhash_params(num_perm)
    perm_vals = ", ".join(
        f"({i}, {int(pa_[i])}::HUGEINT, {int(pb_[i])}::HUGEINT)"
        for i in range(num_perm))
    r = num_perm // bands
    slice_cols = ",\n         ".join(
        f"min(CASE WHEN i % {r} = {j} THEN s END) AS s{j}" for j in range(r))
    slice_eq = " AND ".join(f"x.s{j} = y.s{j}" for j in range(r))
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    return f"""
WITH newdocs AS (
{new_sql}
), olddocs AS (
{old_sql}
), all_docs AS (
  SELECT doc_id, text, 'o' AS side FROM olddocs
  UNION ALL
  SELECT doc_id, text, 'n' AS side FROM newdocs
), shl AS (
  SELECT doc_id, side, unnest(list_distinct(CASE WHEN len({toks}) < 3
      THEN [array_to_string({toks}, ' ')]
      ELSE list_transform(range(1, len({toks}) - 1),
             i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
    END)) AS shingle
  FROM all_docs
), xs AS (
  SELECT doc_id, side, {_sql_hash64()}::HUGEINT AS x
  FROM (SELECT doc_id, side, sha256(shingle) AS h FROM shl)
), perm(i, pa, pb) AS (VALUES {perm_vals}),
sig AS (
  SELECT doc_id, side, i,
         min((((pa * x) % 18446744073709551616 + pb) % 18446744073709551616)
             % 2305843009213693951) AS s
  FROM xs CROSS JOIN perm GROUP BY doc_id, side, i
), bandsig AS (
  SELECT doc_id, side, i // {r} AS band,
         {slice_cols}
  FROM sig GROUP BY doc_id, side, i // {r}
), cand AS (
  SELECT DISTINCT x.doc_id AS nid, y.doc_id AS oid
  FROM bandsig x JOIN bandsig y ON x.band = y.band AND {slice_eq}
  WHERE x.side = 'n' AND y.side = 'o'
), agree AS (
  SELECT c.nid, c.oid, count(*) FILTER (WHERE sn.s = so.s) AS k
  FROM cand c
  JOIN sig sn ON sn.doc_id = c.nid
  JOIN sig so ON so.doc_id = c.oid AND so.i = sn.i
  GROUP BY c.nid, c.oid
), ok AS (
  SELECT * FROM agree WHERE k / {float(num_perm)} >= {threshold}
), best AS (
  SELECT nid, max(k) AS k_max FROM ok GROUP BY nid
), pick AS (
  SELECT o.nid, min(o.oid) AS dup_of, b.k_max
  FROM ok o JOIN best b ON o.nid = b.nid AND o.k = b.k_max
  GROUP BY o.nid, b.k_max
)
{final_select}"""


def snapshot_neardup_ingest_sql(num_perm: int = 64, bands: int = 16,
                                threshold: float = 0.5) -> str:
    """Value-exact DuckDB replica of ``snapshot_neardup_ingest``:
    replays signatures for BOTH sides (the shared
    ``_minhash_probe_replay_sql`` builder), snapshot->corpus band-slice
    candidates, >= threshold signature-agreement verify, then
    best-match selection (max k, tie -> smallest indexed id) and the
    novel/dup decision padding."""
    new_sql = """
  SELECT doc_id + 4000000 AS doc_id,
         substr(text, 1, length(text) - 12) AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 4000000, text FROM documents WHERE doc_id % 5 = 1
  UNION ALL
  SELECT doc_id + 4000000,
         'snapshot only page ' || doc_id || ' fresh crawl content'
  FROM documents WHERE doc_id % 5 = 2"""
    old_sql = "  SELECT doc_id, text FROM documents"
    final = """
SELECT s.doc_id,
       CASE WHEN p.dup_of IS NULL THEN 'novel' ELSE 'dup' END AS status,
       CAST(coalesce(p.dup_of, -1) AS BIGINT) AS dup_of,
       CAST(coalesce(p.k_max, 0) AS BIGINT) AS agree_k
FROM newdocs s LEFT JOIN pick p ON s.doc_id = p.nid"""
    return _minhash_probe_replay_sql(new_sql, old_sql, final,
                                     num_perm, bands, threshold)


DECONTAM_ND_PLANT_OFFSET = 5_000_000


def decontam_neardup(sf_dir: str,
                     jaccard_threshold: float = 0.5) -> rd.Dataset:
    """FUZZY eval-set decontamination — the near-duplicate complement of
    ``decontam_docs`` (exact word-8-gram overlap): a training document
    that is a lightly-edited COPY of a benchmark document shares most
    of its shingles but not necessarily a verbatim 8-gram run, and the
    published pipelines (Llama-style) therefore also run a MinHash
    screen against the eval suites. Benchmark = ``doc_id % 97 == 0``
    (the decontam_docs convention); contamination is planted
    deterministically (even benchmark docs get a 12-char-truncated copy
    into the training side at +5e6) so the oracle can mirror the plant.

    Scale shape: the roles INVERT the snapshot ingest — the persisted
    MinHash index is built over the (small) benchmark side, the corpus
    is signed once and probes it (stages/dedup.py:probe_minhash_index:
    ids-only hash joins, partition-pruned postings read) — so the
    screen costs one signature pass over the corpus however many eval
    suites accumulate. Returns one row per training doc:
    (doc_id, contaminated, bench_ref, agree_k)."""
    from ..sources.corpus import _input_digest

    base = _docs(sf_dir, ["doc_id", "text"])
    bench = base.map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t["doc_id"], dtype=np.int64) % 97 == 0)),
        batch_format="pyarrow")

    def train_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        texts = batch["text"].to_pylist()
        out_id, out_t = [], []
        for did, t in zip(ids.tolist(), texts):
            if did % 97 != 0:
                out_id.append(did)
                out_t.append(t or "")
            elif did % 2 == 0:
                # planted contamination: truncated benchmark copy
                out_id.append(did + DECONTAM_ND_PLANT_OFFSET)
                out_t.append((t or "")[:-12])
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_t, pa.large_string())})

    train = base.map_batches(train_rows, batch_format="pyarrow")
    index_dir = os.path.join(
        "/tmp/pdf_extraction_ray/minhash-bench",
        f"{os.path.basename(sf_dir)}-{_input_digest(sf_dir)}")
    dd.ensure_minhash_index(bench, index_dir)
    st = dd.snapshot_neardup_statuses(train, index_dir,
                                      jaccard_threshold=jaccard_threshold)

    def decide(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "contaminated": pc.equal(t["status"], "dup"),
            "bench_ref": t["dup_of"].combine_chunks().cast(pa.int64()),
            "agree_k": t["agree_k"].combine_chunks().cast(pa.int64()),
        })

    return st.map_batches(decide, batch_format="pyarrow")


def decontam_neardup_sql(num_perm: int = 64, bands: int = 16,
                         threshold: float = 0.5) -> str:
    """Oracle for ``decontam_neardup``: the shared signature-replay
    builder with the roles inverted — olddocs = the benchmark slice,
    newdocs = the training side incl. the planted truncated copies."""
    off = DECONTAM_ND_PLANT_OFFSET
    new_sql = f"""
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + {off}, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 97 = 0 AND doc_id % 2 = 0"""
    old_sql = "  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0"
    final = """
SELECT t.doc_id,
       (p.dup_of IS NOT NULL) AS contaminated,
       CAST(coalesce(p.dup_of, -1) AS BIGINT) AS bench_ref,
       CAST(coalesce(p.k_max, 0) AS BIGINT) AS agree_k
FROM newdocs t LEFT JOIN pick p ON t.doc_id = p.nid"""
    return _minhash_probe_replay_sql(new_sql, old_sql, final,
                                     num_perm, bands, threshold)


# text-invariant ROW kinds: a page row's content identity is payload
# bytes PLUS the pre-extracted fallback text column (the salvage route
# consumes it, so extraction output depends on both — the refresh test
# caught a scanned-PDF whose bytes were identical but whose fallback
# changed). For these kinds BOTH are text-independent (empty-body HTML
# renders no text and carries fallback ''; garbage/empty rows are
# id-only), so an edited re-crawl is correctly 'unchanged' — the
# oracle replicates the exception. Scanned PDFs are NOT here: their
# bytes are text-free but their fallback carries text[:100]
_DELTA_TEXT_INVARIANT_SUBS = (94, 95, 96, 97, 98)
_DELTA_REMOVED_MOD, _DELTA_REMOVED_REM = 5, 1
_DELTA_CHANGED_MOD, _DELTA_CHANGED_REM = 7, 2
_DELTA_ADDED_MOD, _DELTA_ADDED_REM = 11, 3
_DELTA_ADD_OFFSET = 3_000_000   # multiple of 100: kind mix preserved


def snapshot_b_pages(sf_dir: str) -> rd.Dataset:
    """The simulated SECOND crawl snapshot as a real pages-schema table
    (documents -> build_page_row variants): doc_id % 5 == 1 dropped,
    doc_id % 7 == 2 re-crawled with a PREPENDED edit (the tiny-HTML kind
    renders text[:80], so a suffix edit would be invisible to its
    bytes), doc_id % 11 == 3 also contributes a brand-new url at
    doc_id + 3e6. Shared by the pages_delta query and the
    refresh_extraction test."""
    from ..sources.corpus import PAGES_SCHEMA, build_page_row

    def b_rows(batch: pa.Table) -> pa.Table:
        rows = []
        for did, text, src, lang in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
                batch["source"].to_pylist(), batch["lang"].to_pylist()):
            if did % _DELTA_ADDED_MOD == _DELTA_ADDED_REM:
                # brand-new url in B, regardless of the source doc's fate
                rows.append(build_page_row(did + _DELTA_ADD_OFFSET, text,
                                           src, lang))
            if did % _DELTA_REMOVED_MOD == _DELTA_REMOVED_REM:
                continue
            t = ("changed-rev " + text
                 if did % _DELTA_CHANGED_MOD == _DELTA_CHANGED_REM else text)
            rows.append(build_page_row(did, t, src, lang))
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    return _docs(sf_dir, ["doc_id", "text", "source", "lang"]).map_batches(
        b_rows, batch_format="pyarrow")


def pages_delta_tables(pages_a: "str | rd.Dataset",
                       pages_b: "str | rd.Dataset") -> rd.Dataset:
    """Cross-snapshot URL LIFECYCLE diff core — the complement of
    ``snapshot_ingest_dedup`` (content-level novelty): given two crawl
    snapshots, classify every url as added / removed / changed /
    unchanged by CONTENT HASH, the table a crawl scheduler builds its
    re-visit policy from (and refresh_extraction acts on).

    Scale shape: each side folds map-side to (url-hash, url, sha64)
    ids-only rows (payload bytes never shuffle; re-crawl dup rows
    collapse via the first-wins hash-partition distinct — see the
    determinism note below), then ONE full-outer hash_join on the
    64-bit url hash + a map computes the status column. Returns
    (url, status)."""
    import hashlib as _hl

    from ..functions.hashing import stable_hash64
    from ..pipelines.linkgraph import _hash_partition_distinct
    from ..stages.joins import hash_join

    def side(pages, tag: str) -> rd.Dataset:
        ds = rd.read_parquet(pages) if isinstance(pages, str) else pages

        def fold(batch: pa.Table) -> pa.Table:
            urls = batch["url"].to_pylist()
            return pa.table({
                "h": pa.array([stable_hash64("delta:" + u) for u in urls],
                              pa.int64()),
                f"url_{tag}": batch["url"],
                "ts_us": batch["warc_ts"].combine_chunks().cast(pa.int64()),
                # row identity = payload bytes + fallback text (the
                # salvage route consumes the text column, so extraction
                # output depends on both)
                f"sha_{tag}": pa.array(
                    [int.from_bytes(
                        _hl.sha256(p + b"\x00"
                                   + (t or "").encode()).digest()[:8],
                        "big", signed=True)
                     for p, t in zip(batch["html"].to_pylist(),
                                     batch["text"].to_pylist())],
                    pa.int64()),
            })

        # order=["ts_us"]: on the synthetic corpus re-crawl dups are
        # byte-identical (any pick would do), but on a real crawl the
        # re-crawled bytes differ and the kept sha would otherwise
        # depend on partition arrival order — earliest-crawl-wins keeps
        # the diff deterministic and matches the flagship's first-wins
        # url dedup
        # the arrow-format projection ALSO converts the distinct's
        # pandas blocks back to Arrow — hash_join types its null
        # padding from schema(), and a pandas-block string column
        # reports <class 'str'> instead of a pa.DataType
        return (_hash_partition_distinct(
                    ds.map_batches(fold, batch_format="pyarrow"),
                    [f"url_{tag}"], "h", order=["ts_us"])
                .map_batches(
                    lambda t, c=(f"url_{tag}", f"sha_{tag}"):
                        t.select(["h", *c]),
                    batch_format="pyarrow")
                .materialize())

    joined = hash_join(side(pages_a, "a"), side(pages_b, "b"), "h", "h",
                       ["url_a", "sha_a"], ["url_b", "sha_b"],
                       how="full_outer")

    def status(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        a = t["sha_a"].combine_chunks()
        b = t["sha_b"].combine_chunks()
        changed = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                          pc.not_equal(pc.fill_null(a, 0),
                                       pc.fill_null(b, 0)))
        st = pc.if_else(
            pc.is_null(a), pa.scalar("added"),
            pc.if_else(pc.is_null(b), pa.scalar("removed"),
                       pc.if_else(changed, pa.scalar("changed"),
                                  pa.scalar("unchanged"))))
        url = pc.coalesce(t["url_a"].combine_chunks(),
                          t["url_b"].combine_chunks())
        return pa.table({"url": url, "status": st})

    return joined.map_batches(status, batch_format="pyarrow")


def pages_delta(sf_dir: str) -> rd.Dataset:
    """Driver query: the lifecycle diff of the corpus vs its simulated
    second snapshot, projected to (doc_id, status) for the planted
    oracle. The text-invariant payload kinds (scanned PDFs, empty-body
    HTML, garbage/empty bytes — _DELTA_TEXT_INVARIANT_SUBS) hash
    identical under an "edit" and MUST report unchanged; the oracle
    encodes the same exception."""
    from ..pipelines.linkgraph import _doc_id_of_url
    from ..sources import corpus as corpus_mod

    delta = pages_delta_tables(corpus_mod.ensure_pages_corpus(sf_dir),
                               snapshot_b_pages(sf_dir))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": _doc_id_of_url(t["url"]),
                         "status": t["status"]})

    return delta.map_batches(project, batch_format="pyarrow")


def pages_delta_sql() -> str:
    invariant = ", ".join(str(x) for x in _DELTA_TEXT_INVARIANT_SUBS)
    return f"""
SELECT doc_id,
       CASE WHEN doc_id % {_DELTA_REMOVED_MOD} = {_DELTA_REMOVED_REM}
              THEN 'removed'
            WHEN doc_id % {_DELTA_CHANGED_MOD} = {_DELTA_CHANGED_REM}
                 AND doc_id % 100 NOT IN ({invariant}) THEN 'changed'
            ELSE 'unchanged' END AS status
FROM documents
UNION ALL
SELECT doc_id + {_DELTA_ADD_OFFSET}, 'added'
FROM documents WHERE doc_id % {_DELTA_ADDED_MOD} = {_DELTA_ADDED_REM}"""


def _docs_with_planted_exact_dups(sf_dir: str) -> rd.Dataset:
    """documents ∪ exact copies (doc_id+1e6 for doc_id%7==0)."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def copies(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dup = df[df.doc_id % 7 == 0].copy()
        dup["doc_id"] += 1_000_000
        return pa.Table.from_pandas(dup, preserve_index=False)

    return base.union(base.map_batches(copies, batch_format="pyarrow"))


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup, first-wins by min doc_id, over planted duplicates
    (reference: unique hash index, migrations/006:13-16)."""
    survivors = dd.exact_dedup_by_hash(_docs_with_planted_exact_dups(sf_dir))

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "content_sha256"])

    return survivors.map_batches(project, batch_format="pyarrow")


def dedup_exact_sql() -> str:
    return """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT min(doc_id) AS doc_id, sha256(text) AS content_sha256
FROM all_docs GROUP BY sha256(text), text"""


def _docs_with_planted_near_dups(sf_dir: str) -> rd.Dataset:
    """documents ∪ near-copies (doc_id+1e6 for doc_id%5==0: last 12 chars
    dropped — high shingle overlap, not exact)."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def copies(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dup = df[df.doc_id % 5 == 0].copy()
        dup["doc_id"] += 1_000_000
        dup["text"] = dup["text"].str.slice(0, -12)
        return pa.Table.from_pandas(dup, preserve_index=False)

    return base.union(base.map_batches(copies, batch_format="pyarrow"))


# the ONE parameterization of the shared near-dup signature family:
# _neardup_sigs, dedup_minhash and jaccard_pairs must all hash
# identically or the disk-cached sig table silently diverges from its
# consumers (review finding) — so the literals live here and are
# passed explicitly to every ENGINE consumer and to dedup_minhash_sql
# (whose num_perm is parameterized). CAVEAT the second review flagged:
# the SQL builders hard-code the 3-word shingle construction (their
# gram strings are built inline), so NEARDUP_SHINGLE_K must stay 3
# unless the oracle SQL is rewritten with it — asserted below so a
# drift fails loudly at import.
NEARDUP_SHINGLE_K = 3
NEARDUP_NUM_PERM = 64
assert NEARDUP_SHINGLE_K == 3, (
    "the near-dup SQL oracles hard-code 3-word shingles; rewrite them "
    "before changing NEARDUP_SHINGLE_K")

_neardup_sigs_cache: dict[tuple[str, str], rd.Dataset] = {}


def _derived_parquet(sf_dir: str, name: str, build) -> rd.Dataset:
    """Shared digest-keyed disk cache — see sources/corpus.derived_parquet
    (moved there so pipelines/linkgraph can use it without an import
    cycle)."""
    from ..sources.corpus import derived_parquet

    return derived_parquet(sf_dir, name, build)


def _neardup_sigs(sf_dir: str) -> rd.Dataset:
    """The shared (doc_id, sig) MinHash signature table over the
    planted-near-dup corpus, derived ONCE per corpus digest (the
    ``_clusters_with_len`` convention): ``dedup_minhash``,
    ``jaccard_pairs`` and ``dedup_clusters`` all band/verify off this
    one table, so the expensive tokenize+sha256 pass is paid once —
    and, being DISK-cached (``_derived_parquet``), once per corpus
    rather than once per process: a fresh battery chunk re-reads
    parquet. The in-memory pin is signature-sized (id + 64 x 8 B per
    doc), never the corpus. Keyed on (sf_dir, input digest) so a
    regenerated corpus under the same path can never be served stale
    signatures (ADVICE r4)."""
    from ..sources.corpus import _input_digest

    key = (sf_dir, _input_digest(sf_dir))
    if key not in _neardup_sigs_cache:
        disk = _derived_parquet(
            sf_dir, "ndsigs",
            lambda: _docs_with_planted_near_dups(sf_dir).map_batches(
                dd._minhash_sig_fn("doc_id", "text", NEARDUP_SHINGLE_K,
                                   NEARDUP_NUM_PERM),
                batch_format="pyarrow"))
        _neardup_sigs_cache[key] = disk.repartition(32).materialize()
    return _neardup_sigs_cache[key]


def dedup_minhash(sf_dir: str) -> rd.Dataset:
    """MinHash-LSH near-dup clustering over planted near-copies.

    Exactly SQL-oracled: the signature family is pure sha256 + wrapping
    uint64 arithmetic, so DuckDB replicates signatures, band collisions,
    agreement verification, AND the connected-components labels
    bit-for-bit (``dedup_minhash_sql``); planted-pair recall is
    additionally asserted in tests."""
    return dd.minhash_cluster(_docs_with_planted_near_dups(sf_dir),
                              num_perm=NEARDUP_NUM_PERM,
                              shingle_k=NEARDUP_SHINGLE_K,
                              jaccard_threshold=0.5,
                              sigs=_neardup_sigs(sf_dir))


# LE-uint64 of the first 8 sha256 bytes, >> 1 — the SQL replica of
# functions.hashing.stable_hash64 over a hex column
def _sql_hash64(col: str = "h") -> str:
    return ("(('0x' || " +
            " || ".join(f"substr({col}, {15 - 2 * i}, 2)"
                        for i in range(8)) +
            ")::UBIGINT >> 1)")


_SQL_HASH64 = _sql_hash64("h")


def dedup_minhash_sql(num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5) -> str:
    """Value-exact DuckDB replica of ``dedup_minhash``.

    Replicates the whole pipeline: word-3-shingles → stable_hash64 →
    64 (a*x+b mod 2^64 mod M61) permutation minima (the uint64 multiply
    WRAPS before the Mersenne mod — modeled with explicit % 2^64) →
    LSH candidates = band-slice equality (band-hash equality in the
    engine ⟺ slice equality, sha256 collisions aside) → signature
    agreement >= threshold → connected components via recursive CTE."""
    from ..functions import hashing as H

    pa_, pb_ = H._minhash_params(num_perm)
    perm_vals = ", ".join(
        f"({i}, {int(pa_[i])}::HUGEINT, {int(pb_[i])}::HUGEINT)"
        for i in range(num_perm))
    r = num_perm // bands
    slice_cols = ",\n         ".join(
        f"min(CASE WHEN i % {r} = {j} THEN s END) AS s{j}" for j in range(r))
    slice_eq = " AND ".join(f"x.s{j} = y.s{j}" for j in range(r))
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    return f"""
WITH RECURSIVE all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), shl AS (
  SELECT doc_id, unnest(list_distinct(CASE WHEN len({toks}) < 3
      THEN [array_to_string({toks}, ' ')]
      ELSE list_transform(range(1, len({toks}) - 1),
             i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
    END)) AS shingle
  FROM all_docs
), xs AS (
  SELECT doc_id, {_SQL_HASH64}::HUGEINT AS x
  FROM (SELECT doc_id, sha256(shingle) AS h FROM shl)
), perm(i, pa, pb) AS (VALUES {perm_vals}),
sig AS (
  SELECT doc_id, i,
         min((((pa * x) % 18446744073709551616 + pb) % 18446744073709551616)
             % 2305843009213693951) AS s
  FROM xs CROSS JOIN perm GROUP BY doc_id, i
), bandsig AS (
  SELECT doc_id, i // {r} AS band,
         {slice_cols}
  FROM sig GROUP BY doc_id, i // {r}
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandsig x JOIN bandsig y ON x.band = y.band AND {slice_eq}
  WHERE x.doc_id < y.doc_id
), agree AS (
  SELECT c.a, c.b, count(*) FILTER (WHERE sa.s = sb.s) AS k
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b AND sb.i = sa.i
  GROUP BY c.a, c.b
), e0 AS (
  SELECT a, b FROM agree WHERE k / {float(num_perm)} >= {threshold}
), edges AS (
  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM all_docs
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node"""


def jaccard_pairs(sf_dir: str) -> rd.Dataset:
    """Exact n-gram Jaccard near-dup pairs (LSH candidates, exact
    verification). SQL-oracled: true 3-gram Jaccard is expressible with
    DuckDB list ops; at threshold 80 the LSH miss probability for a real
    pair is < 1e-5, so the candidate pass loses nothing the oracle finds."""
    return dd.jaccard_pairs(_docs_with_planted_near_dups(sf_dir),
                            threshold_pct=80, num_perm=NEARDUP_NUM_PERM,
                            shingle_k=NEARDUP_SHINGLE_K,
                            sigs=_neardup_sigs(sf_dir))


def jaccard_pairs_sql(threshold_pct: int = 80) -> str:
    # \pL\pN matches Python's \w for letters/digits across scripts —
    # the ASCII class silently diverged on accented/CJK corpora
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len({toks}) < 3
      THEN [array_to_string({toks}, ' ')]
      ELSE list_transform(range(1, len({toks}) - 1),
             i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
    END) AS shingles
  FROM all_docs
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.shingles, b.shingles)) AS inter,
         len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles)) AS uni
  FROM sh a, sh b WHERE a.doc_id < b.doc_id
)
SELECT a, b, CAST(floor(100.0 * inter / uni + 0.5) AS BIGINT) AS jaccard_pct
FROM pairs WHERE uni > 0 AND floor(100.0 * inter / uni + 0.5) >= {threshold_pct}"""


def dedup_clusters(sf_dir: str) -> rd.Dataset:
    """Near-dup CLUSTER assignment, exactly oracled end-to-end: verified
    n-gram-Jaccard edges (the ``jaccard_pairs`` operator) feed the fully
    distributed ``connected_components`` (min-label propagation +
    pointer jumping — the iterative Ray Data algorithm), and every
    document gets ``cluster_id`` = the minimum doc_id of its component
    (singletons label themselves). This is the keep-one-per-cluster
    primitive of web-scale near-dedup with a DuckDB *recursive-CTE*
    oracle — the minhash/simhash paths share this exact clustering
    stage, so its correctness gate covers them structurally."""
    return (_clusters_with_len(sf_dir)
            .select_columns(["doc_id", "cluster_id"]))


_clusters_cache: dict[tuple[str, str], rd.Dataset] = {}


def _clusters_with_len(sf_dir: str) -> rd.Dataset:
    """``dedup_clusters``'s assignment with ``n_chars`` carried through
    the SAME label join — the length rides the exchange the cluster
    attach already pays, so ``cluster_keep_best`` needs no second
    corpus-sized hash_join. Emits (doc_id, cluster_id, n_chars).

    Cached MATERIALIZED per sf dir (the ``_extracted`` convention): the
    driver runs dedup_clusters, cluster_keep_best and soft_dedup_sample
    in one session, and each would otherwise re-derive the whole
    jaccard + connected-components chain — and DISK-cached
    (``_derived_parquet``) so a FRESH process over the same corpus
    (a later battery chunk, a rerun) re-reads a 3-column parquet
    instead. The pin is an ids-only 3-int-column table — bounded,
    never the corpus. Keyed on (sf_dir, input digest) so a regenerated
    corpus under the same path can never be served stale assignments
    (ADVICE r4)."""
    from ..sources.corpus import _input_digest

    ckey = (sf_dir, _input_digest(sf_dir))
    if ckey in _clusters_cache:
        return _clusters_cache[ckey]

    def build() -> rd.Dataset:
        import pyarrow.compute as pc

        from ..stages.joins import hash_join

        docs = _docs_with_planted_near_dups(sf_dir)
        edges = dd.jaccard_pairs(docs, threshold_pct=80,
                                 num_perm=NEARDUP_NUM_PERM,
                                 shingle_k=NEARDUP_SHINGLE_K,
                                 sigs=_neardup_sigs(sf_dir)
                                 ).select_columns(["a", "b"])
        labels = dd.connected_components(edges, "a", "b")

        def idlen(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "n_chars": pc.utf8_length(
                    t["text"].combine_chunks()).cast(pa.int64())})

        ids = docs.map_batches(idlen, batch_format="pyarrow")
        joined = hash_join(ids, labels, "doc_id", "node", ["n_chars"],
                           ["label"], how="left")

        def finish(t: pa.Table) -> pa.Table:
            doc = t["doc_id"].combine_chunks().cast(pa.int64())
            lab = t["label"].combine_chunks().cast(pa.int64())
            return pa.table({"doc_id": doc,
                             "cluster_id": pc.coalesce(lab, doc),
                             "n_chars": t["n_chars"].combine_chunks().cast(
                                 pa.int64())})

        return joined.map_batches(finish, batch_format="pyarrow")

    _clusters_cache[ckey] = _derived_parquet(
        sf_dir, "ndclusters", build).materialize()
    return _clusters_cache[ckey]


def dedup_clusters_sql(threshold_pct: int = 80) -> str:
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    return f"""
WITH RECURSIVE all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len({toks}) < 3
      THEN [array_to_string({toks}, ' ')]
      ELSE list_transform(range(1, len({toks}) - 1),
             i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
    END) AS shingles
  FROM all_docs
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(a.shingles) + len(b.shingles)
        - len(list_intersect(a.shingles, b.shingles)) > 0
    AND floor(100.0 * len(list_intersect(a.shingles, b.shingles))
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles)))
              + 0.5) >= {threshold_pct}
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM all_docs
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node"""


# Deterministic planted link graph (the planted-near-dups pattern):
# every doc u has exactly 3 out-links — (u*31+7)%N, (u*17+3)%N, and the
# skew hub u%16 (16 hubs collect ~N/16 in-links each, the power-law-ish
# in-degree a real web graph has). Constants mirrored in the SQL oracle.
_PR_HUBS = 16


def pagerank_docs(sf_dir: str, iters: int = 5, damping_pct: int = 85,
                  scale: int = 1_000_000) -> rd.Dataset:
    """PageRank over the planted doc→doc link graph — the crawl-
    prioritization ranking (CommonCrawl ranks hosts by centrality over
    the web graph) as iterated dataflow.

    Exactness design: pure integer arithmetic — ranks start at
    ``scale``, each round is ``r' = (100-d)*scale//100 +
    d*sum(r_u // outdeg)//100`` with floor division, so every round is
    BIGINT-exact and the unrolled-CTE DuckDB oracle hash-matches.

    Scale shape: out-edges are a function of the node id, so each
    round is ONE map-side contribution emit (numpy, 4 rows per node —
    3 targets + a zero self-row guaranteeing presence) and ONE
    groupby(node) sum; no join, no driver state beyond the loop
    counter. A real edge TABLE swaps the emit for a hash_join(edges,
    scores) — same round count, one extra exchange. Per-round
    materialize keeps lineage linear across rounds (the CC-loop
    lesson, stages/dedup.py)."""
    docs = _docs(sf_dir, ["doc_id"])
    N = docs.count()
    hubs = min(_PR_HUBS, N)   # a corpus smaller than the hub count must
    base = (100 - damping_pct) * scale // 100   # not emit phantom nodes

    def init(t: pa.Table) -> pa.Table:
        node = t["doc_id"].combine_chunks().cast(pa.int64())
        return pa.table({"node": node,
                         "r": pa.array(np.full(len(t), scale, np.int64))})

    scores = docs.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):
        def contrib(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            c = t["r"].to_numpy(zero_copy_only=False) // 3
            dst = np.concatenate([(node * 31 + 7) % N,
                                  (node * 17 + 3) % N,
                                  node % hubs,
                                  node])              # presence row
            val = np.concatenate([c, c, c, np.zeros(len(node), np.int64)])
            return pa.table({"node": pa.array(dst), "c": pa.array(val)})

        def fold(t: pa.Table) -> pa.Table:
            s = t["s"].combine_chunks().cast(pa.int64())
            import pyarrow.compute as pc
            r = pc.add(pa.scalar(base, pa.int64()),
                       pc.divide(pc.multiply(
                           pa.scalar(damping_pct, pa.int64()), s),
                           pa.scalar(100, pa.int64())))
            return pa.table({
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "r": r})

        scores = (scores.map_batches(contrib, batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("c", alias_name="s"))
                  .map_batches(fold, batch_format="pyarrow")
                  .materialize())

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"].combine_chunks(),
                         "rank": t["r"].combine_chunks()})

    return scores.map_batches(finish, batch_format="pyarrow")


def pagerank_docs_sql(iters: int = 5, damping_pct: int = 85,
                      scale: int = 1_000_000) -> str:
    """Unrolled-round replica: same planted edges, same integer floor-
    division update (DuckDB // == Python // on the positive ranks)."""
    base = (100 - damping_pct) * scale // 100
    parts = [f"""nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), e AS (
  SELECT doc_id AS src,
         unnest([(doc_id * 31 + 7) % nn.n,
                 (doc_id * 17 + 3) % nn.n,
                 doc_id % least({_PR_HUBS}, nn.n)]) AS dst
  FROM documents, nn
), r0 AS (
  SELECT doc_id AS node, CAST({scale} AS BIGINT) AS r FROM documents
)"""]
    for t in range(iters):
        parts.append(f"""r{t + 1} AS (
  SELECT d.doc_id AS node,
         CAST({base} + {damping_pct} * coalesce(s.c, 0) // 100
              AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(r.r // 3) AS BIGINT) AS c
    FROM e JOIN r{t} r ON r.node = e.src GROUP BY e.dst
  ) s ON s.node = d.doc_id
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node AS doc_id, r AS rank FROM r{iters}")


def bfs_depth_docs(sf_dir: str, rounds: int = 6,
                   seed_mod: int = 499) -> rd.Dataset:
    """Bounded-radius BFS — crawl-depth analysis (how many clicks from
    the seed list reaches each page; crawlers cap this: Heritrix
    max-hops, CommonCrawl's per-seed depth budget) over the SAME
    planted expander graph as ``pagerank_docs`` (3 out-edges per node —
    two mixing permutations + a hub edge), seeds = doc_id % seed_mod
    == 0. Unreached pages (within ``rounds`` hops) report -1.

    Iterated-dataflow shape, all integer: the frontier table (node,
    depth) re-emits itself plus its 3 out-neighbors at depth+1 each
    round, then ONE groupby(node).Min folds — label-propagation with
    min, the ``connected_components`` update with depth instead of
    label (and like pagerank_docs, a function-of-node edge set makes
    the join a map-side emit; a real edge TABLE swaps in one
    hash_join — see linkgraph.bfs_depth_from_edges). Frontier rows ≤
    corpus rows, rounds are fixed, driver holds a loop counter."""
    docs = _docs(sf_dir, ["doc_id"])
    N = docs.count()
    hubs = min(_PR_HUBS, N)
    BIG = 1 << 62

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seeds = ids[ids % seed_mod == 0]
        return pa.table({"node": pa.array(seeds),
                         "d": pa.array(np.zeros(len(seeds), np.int64))})

    dist = docs.map_batches(init, batch_format="pyarrow")
    for _ in range(rounds):
        def expand(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            dst = np.concatenate([node,            # keep current depth
                                  (node * 31 + 7) % N,
                                  (node * 17 + 3) % N,
                                  node % hubs])
            dd = np.concatenate([d, d + 1, d + 1, d + 1])
            return pa.table({"node": pa.array(dst), "d": pa.array(dd)})

        dist = (dist.map_batches(expand, batch_format="pyarrow")
                .groupby("node").aggregate(Min("d", alias_name="dm"))
                .map_batches(lambda t: pa.table(
                    {"node": t["node"], "d": t["dm"]}),
                    batch_format="pyarrow")
                .materialize())

    # unreached -> -1 via the zero-presence union (never a driver join)
    def pres(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().cast(pa.int64())
        return pa.table({"node": ids,
                         "d": pa.array(np.full(len(t), BIG, np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        d = t["dm"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["node"].combine_chunks(),
                         "depth": pa.array(np.where(d >= BIG, -1, d))})

    return (dist.union(docs.map_batches(pres, batch_format="pyarrow"))
            .groupby("node").aggregate(Min("d", alias_name="dm"))
            .map_batches(finish, batch_format="pyarrow"))


def bfs_depth_docs_sql(rounds: int = 6, seed_mod: int = 499) -> str:
    """Unrolled BFS rounds over the derived edge table (the
    pagerank_docs_sql edge CTE); min-fold per round, LEFT JOIN +
    coalesce(-1) for unreached."""
    parts = [f"""nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), e AS (
  SELECT doc_id AS src,
         unnest([(doc_id * 31 + 7) % nn.n,
                 (doc_id * 17 + 3) % nn.n,
                 doc_id % least({_PR_HUBS}, nn.n)]) AS dst
  FROM documents, nn
), d0 AS (
  SELECT doc_id AS node, CAST(0 AS BIGINT) AS d FROM documents
  WHERE doc_id % {seed_mod} = 0
)"""]
    # MATERIALIZED: each round reads the prior one twice (self + join);
    # un-materialized CTEs re-inline 2^rounds times (the ann_ivf lesson)
    for t in range(rounds):
        parts.append(f"""d{t + 1} AS MATERIALIZED (
  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
    SELECT node, d FROM d{t}
    UNION ALL
    SELECT e.dst AS node, x.d + 1 AS d
    FROM d{t} x JOIN e ON e.src = x.node
  ) GROUP BY node
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT d.doc_id, CAST(coalesce(x.d, -1) AS BIGINT) AS depth
FROM documents d LEFT JOIN d{rounds} x ON x.node = d.doc_id""")


# Composed argmax key: doc_id fits in 33 bits (planted ids ~1e6 at test
# scale; 8.5e9 headroom at 100 TB needs a wider shift — documented limit),
# so key = n_chars << 33 | (MASK - doc_id) makes Max(key) pick the
# longest doc and, among equals, the SMALLEST doc_id. Pure integers —
# the SQL oracle's (n_chars DESC, doc_id ASC) row_number is bit-exact.
_SURVIVOR_SHIFT = 33
_SURVIVOR_MASK = (1 << _SURVIVOR_SHIFT) - 1


def cluster_keep_best(sf_dir: str) -> rd.Dataset:
    """Quality-aware near-dup survivor selection — the curation policy
    layered on cluster assignment (FineWeb / RefinedWeb keep one doc per
    near-dup cluster; 'longest doc wins' is the classic heuristic, vs
    ``dedup_exact``'s first-wins): every document gets its cluster, the
    cluster size (the 1/size weight soft-dedup resampling uses), the
    surviving doc_id, and an ``is_survivor`` flag.

    Composition (all distributed): the oracled cluster assignment
    with doc length riding its label join (``_clusters_with_len`` —
    no second corpus-sized hash_join) → ONE cluster-hash-partitioned
    groupby whose body computes the per-cluster argmax key, size, and
    survivor columns VECTORIZED over the whole partition (pandas
    transform — never per-key Python; the per-hash map_groups lesson).
    The previous plan paid a length hash_join, an argmax groupby AND a
    join-back re-shuffle on the same key — two full exchanges more for
    no information. Planted near-copies (12 chars shorter) never
    survive against their original — asserted in tests."""
    import pyarrow.compute as pc

    # n_chars rides the cluster attach join (_clusters_with_len), so
    # the only exchanges after CC are that join and the ONE
    # partitioned survivor groupby below.
    labeled = _clusters_with_len(sf_dir)

    P = 32

    def add_key(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].combine_chunks().cast(pa.int64())
        did = t["doc_id"].combine_chunks().cast(pa.int64())
        key = pc.add(pc.shift_left(nc, _SURVIVOR_SHIFT),
                     pc.subtract(pa.scalar(_SURVIVOR_MASK, pa.int64()), did))
        cid = t["cluster_id"].combine_chunks().cast(pa.int64())
        return (t.append_column("skey", key)
                .append_column("__p", dd._pmod(cid, P)))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("cluster_id")["skey"]
        max_skey = grp.transform("max").to_numpy(np.int64)
        size = grp.transform("size").to_numpy(np.int64)
        surv = _SURVIVOR_MASK - (max_skey & _SURVIVOR_MASK)
        did = g["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": did,
            "cluster_id": g["cluster_id"].to_numpy(np.int64),
            "cluster_size": size,
            "n_chars": g["n_chars"].to_numpy(np.int64),
            "survivor_id": surv,
            "is_survivor": did == surv,
        })

    return (labeled.map_batches(add_key, batch_format="pyarrow")
            .groupby("__p").map_groups(per_partition,
                                       batch_format="pandas"))


def soft_dedup_sample(sf_dir: str) -> rd.Dataset:
    """SOFT deduplication — keep each document with probability
    1/cluster_size instead of hard keep-one (the 1/size resampling
    ``cluster_keep_best``'s cluster_size column exists for: expected
    one surviving copy per near-dup cluster while every copy keeps a
    chance, preserving within-cluster diversity; singletons always
    survive). Pure-integer rule both engines share: keep iff
    stable_hash64('soft:'+doc_id) % 2^20 < 2^20 // cluster_size.

    Shape: the oracled ``dedup_clusters`` assignment (materialized —
    the ids-only branch-point pin), then ONE cluster-hash-partitioned
    groupby whose body computes sizes (pandas transform, vectorized
    over the partition) AND applies the hash filter in the same pass —
    the size groupby + hash_join-back it replaces paid a second full
    exchange on the same key. Returns (doc_id, cluster_id,
    cluster_size) for kept docs."""
    from ..functions.hashing import stable_hash64

    clusters = dedup_clusters(sf_dir).materialize()
    P = 32

    def addp(t: pa.Table) -> pa.Table:
        cid = t["cluster_id"].combine_chunks().cast(pa.int64())
        return t.append_column("__p", dd._pmod(cid, P))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        size = (g.groupby("cluster_id")["doc_id"].transform("size")
                .to_numpy(np.int64))
        ids = g["doc_id"].to_numpy(np.int64)
        h = np.fromiter((stable_hash64(f"soft:{d}") for d in ids),
                        np.uint64, len(ids))
        thr = (1 << 20) // size
        mask = (h % np.uint64(1 << 20)).astype(np.int64) < thr
        return pd.DataFrame({
            "doc_id": ids[mask],
            "cluster_id": g["cluster_id"].to_numpy(np.int64)[mask],
            "cluster_size": size[mask]})

    return (clusters.map_batches(addp, batch_format="pyarrow")
            .groupby("__p").map_groups(per_partition,
                                       batch_format="pandas"))


def soft_dedup_sample_sql() -> str:
    dc = dedup_clusters_sql().strip()
    return f"""
WITH dc AS ({dc}),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM dc GROUP BY cluster_id
), hx AS (
  SELECT d.doc_id, d.cluster_id, s.cluster_size,
         CAST({_sql_hash64("sha256('soft:' || CAST(d.doc_id AS VARCHAR))")}
              % 1048576 AS BIGINT) AS h20
  FROM dc d JOIN sizes s USING (cluster_id)
)
SELECT doc_id, cluster_id, cluster_size
FROM hx WHERE h20 < 1048576 // cluster_size"""


def cluster_keep_best_sql(threshold_pct: int = 80) -> str:
    """dedup_clusters_sql's recursive-CTE labels + per-cluster longest-doc
    (tie: smallest doc_id) survivor via row_number — integer-exact."""
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    return f"""
WITH RECURSIVE all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len({toks}) < 3
      THEN [array_to_string({toks}, ' ')]
      ELSE list_transform(range(1, len({toks}) - 1),
             i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
    END) AS shingles
  FROM all_docs
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(a.shingles) + len(b.shingles)
        - len(list_intersect(a.shingles, b.shingles)) > 0
    AND floor(100.0 * len(list_intersect(a.shingles, b.shingles))
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles)))
              + 0.5) >= {threshold_pct}
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM all_docs
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
), lab AS (
  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
  FROM reach GROUP BY node
), sized AS (
  SELECT l.doc_id, l.cluster_id,
         CAST(length(d.text) AS BIGINT) AS n_chars
  FROM lab l JOIN all_docs d USING (doc_id)
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rk,
         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
           AS cluster_size
  FROM sized
), best AS (
  SELECT cluster_id, doc_id AS survivor_id FROM ranked WHERE rk = 1
)
SELECT r.doc_id, r.cluster_id, r.cluster_size, r.n_chars,
       b.survivor_id, (r.doc_id = b.survivor_id) AS is_survivor
FROM ranked r JOIN best b USING (cluster_id)"""


def _embeddings_with_planted_dups(sf_dir: str) -> rd.Dataset:
    base = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def copies(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dup = df[df.vec_id % 10 == 0].copy()
        dup["vec_id"] += 100_000
        return pa.Table.from_pandas(dup, preserve_index=False)

    return base.union(base.map_batches(copies, batch_format="pyarrow"))


def embedding_dup_pairs(sf_dir: str) -> rd.Dataset:
    """Embedding-cosine near-dup pairs over planted exact copies
    (threshold 0.99; the corpus's natural max pairwise cosine is ~0.51,
    so the float threshold is far from any decision boundary)."""
    return dd.embedding_near_dup(_embeddings_with_planted_dups(sf_dir),
                                 threshold_pct=99)


def dedup_embedding_cells(sf_dir: str) -> rd.Dataset:
    """Cell-partitioned embedding near-dup (the subquadratic scale path;
    rows-only — exact-copy recall = 1 asserted in tests)."""
    return dd.embedding_near_dup_cells(_embeddings_with_planted_dups(sf_dir),
                                       threshold_pct=99)


def embedding_dup_pairs_sql() -> str:
    return """
WITH all_v AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0
)
SELECT a.vec_id AS a, b.vec_id AS b
FROM all_v a, all_v b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.99"""


def _docs_with_planted_simhash_dups(sf_dir: str) -> rd.Dataset:
    """documents ∪ one-word-swapped copies of the LONGER docs.

    SimHash is a token-frequency-profile hash: on tiny word-soup docs a
    small edit moves a large fraction of the frequency mass, so hamming<=3
    only reliably captures near-dups of documents with enough tokens —
    hence the n_chars >= 300 restriction for the planted set."""
    base = _docs(sf_dir, ["doc_id", "text", "n_chars"])

    def copies(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dup = df[(df.doc_id % 5 == 0) & (df.n_chars >= 300)].copy()
        dup["doc_id"] += 1_000_000
        dup["text"] = dup["text"].str.rsplit(" ", n=1).str[0] + " qqq"
        return pa.Table.from_pandas(dup, preserve_index=False)

    return base.union(base.map_batches(copies, batch_format="pyarrow"))


def dedup_simhash(sf_dir: str) -> rd.Dataset:
    """SimHash near-dup labeling. Exactly SQL-oracled: the fingerprint
    is integer token-frequency votes over sha256 bits, and the 4-chunk
    candidate scheme is COMPLETE for hamming <= 3 (pigeonhole), so the
    engine's pair set equals the plain all-pairs hamming predicate that
    DuckDB evaluates (``dedup_simhash_sql``); recall is additionally
    asserted in tests."""
    return dd.simhash_dedup(_docs_with_planted_simhash_dups(sf_dir))


def dedup_simhash_sql(hamming_max: int = 3) -> str:
    """Value-exact DuckDB replica of ``dedup_simhash``.

    The engine's chunk-bucket LSH emits exactly the pairs with
    hamming(simhash_a, simhash_b) <= hamming_max (candidate completeness
    by pigeonhole over hamming_max+1 chunks), so the oracle skips the
    bucketing and verifies the predicate over all id-ordered pairs;
    dup_of(x) = min(x, min neighbor a < x), matching the engine's
    groupby-Min fold."""
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    # hamming via four 16-bit BIGINT chunks: bit_count(xor) stays in
    # signed range regardless of the top simhash bit
    ham = " + ".join(
        f"bit_count(xor(CAST((x.fp >> {16 * c}) & 65535 AS BIGINT), "
        f"CAST((y.fp >> {16 * c}) & 65535 AS BIGINT)))" for c in range(4))
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         CASE WHEN strpos(text, ' ') > 0
              THEN substr(text, 1, length(text) - strpos(reverse(text), ' '))
              ELSE text END || ' qqq'
  FROM documents WHERE doc_id % 5 = 0 AND n_chars >= 300
), tok AS (
  SELECT doc_id, t, count(*) AS w
  FROM (SELECT doc_id, unnest({toks}) AS t FROM all_docs)
  GROUP BY doc_id, t
), th AS (
  SELECT doc_id, w, {_SQL_HASH64} AS hsh
  FROM (SELECT doc_id, w, sha256(t) AS h FROM tok)
), votes AS (
  SELECT doc_id, bit,
         sum(w::BIGINT * (2 * ((hsh >> bit::UBIGINT) & 1)::BIGINT - 1)) AS v
  FROM th CROSS JOIN range(64) r(bit) GROUP BY doc_id, bit
), fp0 AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit::UBIGINT)::HUGEINT
             ELSE 0 END) AS fp
  FROM votes GROUP BY doc_id
), fp AS (
  SELECT d.doc_id, CAST(COALESCE(f.fp, 0) AS UBIGINT) AS fp
  FROM all_docs d LEFT JOIN fp0 f ON d.doc_id = f.doc_id
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM fp x JOIN fp y ON x.doc_id < y.doc_id
  WHERE {ham} <= {hamming_max}
), nbr AS (
  SELECT b AS doc_id, min(a) AS mn FROM pairs GROUP BY b
)
SELECT f.doc_id, f.fp AS simhash,
       CAST(least(f.doc_id, COALESCE(n.mn, f.doc_id)) AS BIGINT) AS dup_of
FROM fp f LEFT JOIN nbr n ON f.doc_id = n.doc_id"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _query_vectors(sf_dir: str, n: int = 5) -> tuple[np.ndarray, list[int]]:
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.stack(df["embedding"].to_numpy()), df["vec_id"].tolist()


def ann_bruteforce(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Exact cosine top-k for the first 5 vectors as queries."""
    q, qids = _query_vectors(sf_dir)
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return sim.topk_cosine(ds, q, qids, k=k)


def ann_bruteforce_sql(k: int = 10, src: str = "embeddings") -> str:
    # ``src`` swaps the CORPUS side only (the query vectors stay the
    # first 5 of the full table — external inputs a takedown of the
    # corpus must not change)
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  ORDER BY vec_id LIMIT 5
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN {src} e
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


def embedding_quantize(sf_dir: str) -> rd.Dataset:
    """Scalar int8 quantization (SQ8, per-vector max-abs scale) — the
    embedding STORAGE scale path (FAISS's SQ8: 4x less object store
    and network per ANN probe; recall cost is pytest-asserted via a
    dequantized top-k). code_i = floor(x_i * 127 / scale) with scale =
    max|x| — codes in [-127, 127] (a -scale element lands exactly on
    -127), zero vectors code to zeros.

    Exactness design: both engines run the IDENTICAL float64 op chain
    — widen float32 x, multiply by 127, divide by the float64-widened
    float32 max-abs, floor — so results match bit-for-bit with no
    margin argument needed (same IEEE ops in the same order; the
    list_transform replica states the same expression). Pure map-side,
    one numpy pass per batch."""
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
        X = np.asarray(t["embedding"].to_pylist(), np.float32)
        s32 = np.abs(X).max(axis=1)            # float32 max, like SQL
        s = s32.astype(np.float64)
        X64 = X.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.floor(X64 * 127.0 / s[:, None])
        C = np.where(s[:, None] == 0.0, 0.0, C).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids),
            "scale": pa.array(s, pa.float64()),
            "codes": pa.array(C.tolist(), pa.list_(pa.int64())),
        })

    return ds.map_batches(quant, batch_format="pyarrow")


def embedding_quantize_sql() -> str:
    return """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, e -> abs(e)))
              AS DOUBLE) AS scale
  FROM embeddings
)
SELECT vec_id, scale,
       list_transform(embedding,
         e -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(CAST(e AS DOUBLE) * 127 / scale)
                        AS BIGINT) END) AS codes
FROM s"""


def ann_ivf(sf_dir: str, k: int = 10) -> rd.Dataset:
    """IVF approximate top-k against a persisted cell-partitioned index
    (built once per sf dir; probes read only matching cell directories).

    Value-oracled since the integer-quantizer rewrite: the coarse
    quantizer is BIGINT-exact (quantized unit codes, int dot products,
    floor-division means — stages/similarity.fit_centroids), so cell
    membership and the pruned probe set derive bit-for-bit in SQL and
    ``ann_ivf_sql`` replays the whole index+probe pipeline. Recall vs
    brute force stays test-asserted."""
    from pathlib import Path
    q, qids = _query_vectors(sf_dir)
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    index_dir = os.path.join("/tmp/pdf_extraction_ray/ivf",
                             Path(sf_dir).name or "sf")
    return sim.topk_cosine_ivf(ds, q, qids, k=k, index_dir=index_dir)


def ann_ivf_sql(k: int = 10, n_centroids: int = 16, iters: int = 10,
                n_probe: int = 4, sample_rows: int = 2048,
                dim: int = 64, n_queries: int = 5) -> str:
    """DuckDB replica of the FULL IVF pipeline: quantized unit codes
    (floor(unit*2^20) — cross-engine-safe, margin asserted in tests),
    integer-linspace init over the id-ordered sample, ``iters`` unrolled
    integer k-means rounds (argmax int dot with cell-id tie-break,
    floor-division mean, empty cells keep their centroid), cell
    assignment for every vector, top-``n_probe`` cells per query by int
    dot, then exact cosine top-k over the probed candidates only."""
    Q = sim.IVF_QSCALE
    # MATERIALIZED: the pipeline references the table ~6 times; without
    # it each reference re-opens the parquet (fd exhaustion inside a
    # Ray-heavy process) and re-scans
    parts = [f"""emb AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
), allv AS MATERIALIZED (
  SELECT vec_id, unnest(range({dim})) AS d,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM emb
), nrm AS (
  SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM allv GROUP BY vec_id
), qz AS MATERIALIZED (
  SELECT a.vec_id, a.d,
         CAST(floor(a.val / (CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END)
                    * {Q}) AS BIGINT) AS val
  FROM allv a JOIN nrm n ON n.vec_id = a.vec_id
), smp AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS pos
  FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT {sample_rows})
), sz AS MATERIALIZED (
  SELECT z.vec_id, z.d, z.val FROM qz z JOIN smp s ON s.vec_id = z.vec_id
), ic AS (
  SELECT j.j AS cid, s.vec_id
  FROM (SELECT unnest(range({n_centroids})) AS j) j,
       (SELECT count(*) AS n FROM smp) c
  JOIN smp s ON s.pos = (j.j * (c.n - 1)) // {n_centroids - 1}
), c0 AS MATERIALIZED (
  SELECT i.cid, z.d, z.val FROM ic i JOIN qz z ON z.vec_id = i.vec_id
)"""]

    def assign_cte(name: str, cents: str, vecs: str) -> str:
        return f"""{name} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT z.vec_id, c.cid, sum(z.val * c.val) AS dot
    FROM {vecs} z JOIN {cents} c ON c.d = z.d
    GROUP BY z.vec_id, c.cid)
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dot DESC, cid) = 1
)"""

    for i in range(iters):
        parts.append(assign_cte(f"a{i}", f"c{i}", "sz"))
        parts.append(f"""c{i + 1} AS MATERIALIZED (
  SELECT p.cid, p.d, COALESCE(m.val, p.val) AS val
  FROM c{i} p LEFT JOIN (
    SELECT a.cid, z.d,
           CAST(floor(CAST(sum(z.val) AS DOUBLE) / count(*)) AS BIGINT)
             AS val
    FROM a{i} a JOIN sz z ON z.vec_id = a.vec_id
    GROUP BY a.cid, z.d) m
  ON m.cid = p.cid AND m.d = p.d
)""")
    cf = f"c{iters}"
    parts.append(assign_cte("cellof", cf, "qz"))
    parts.append(f"""qsel AS (
  SELECT vec_id AS query_id FROM emb ORDER BY vec_id LIMIT {n_queries}
), probe AS (
  SELECT query_id, cid FROM (
    SELECT query_id, cid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot DESC, cid) AS rn
    FROM (SELECT qs.query_id, c.cid, sum(z.val * c.val) AS dot
          FROM qsel qs JOIN qz z ON z.vec_id = qs.query_id
          JOIN {cf} c ON c.d = z.d
          GROUP BY qs.query_id, c.cid))
  WHERE rn <= {n_probe}
), qvec AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM emb ORDER BY vec_id LIMIT {n_queries}
), scored AS (
  SELECT p.query_id, ce.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS sim
  FROM probe p
  JOIN cellof ce ON ce.cid = p.cid
  JOIN qvec q ON q.query_id = p.query_id
  JOIN emb e ON e.vec_id = ce.vec_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}""")


# ---------------------------------------------------------------------------
# windowed aggregates
# ---------------------------------------------------------------------------


def window_tumbling(sf_dir: str, width_s: int = 3600) -> rd.Dataset:
    ds = _read_table(sf_dir, "events", ["event_type", "ts", "value"])
    out = win.tumbling_window(ds, width_s)

    def to_int_units(batch: pa.Table) -> pa.Table:
        # scaled-integer output: two round() implementations can disagree
        # by one ulp on the same mathematical value, but the nearest
        # integer of sum*1e6 is unambiguous (summation-order noise is
        # ~1e-10, far from the .5 boundary)
        import pyarrow.compute as pc
        return batch.set_column(
            batch.schema.get_field_index("sum_value"), "sum_value_e6",
            pc.round(pc.multiply(batch["sum_value"], 1e6)).cast(pa.int64()))

    return out.map_batches(to_int_units, batch_format="pyarrow")


def window_tumbling_sql(width_s: int = 3600) -> str:
    w = width_s * 1_000_000
    return f"""
SELECT event_type,
       make_timestamp(CAST(floor(epoch_us(ts) / {w}) AS BIGINT) * {w})
         AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_e6
FROM events GROUP BY event_type, window_start"""


def sessions(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    ds = _read_table(sf_dir, "events", ["user_id", "ts"])
    return win.sessionize(ds, gap_s)


def sessions_salted(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    """Skew-safe sessionization (time-chunk salt + stub merge,
    stages/window.py:sessionize_salted) — value-identical to
    ``sessions``, so it shares the oracle: the gate proves the salted
    two-phase plan loses nothing while shrinking the hottest task from
    O(events of hottest user) to O(sessions of hottest user)."""
    ds = _read_table(sf_dir, "events", ["user_id", "ts"])
    return win.sessionize_salted(ds, gap_s)


def sessions_salted_sql(gap_s: int = 1800) -> str:
    return sessions_sql(gap_s)  # value-identical plan, same oracle


def sessions_sql(gap_s: int = 1800) -> str:
    return f"""
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {gap_s} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM d
)
SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, sid"""


def window_sliding(sf_dir: str, width_s: int = 3600,
                   step_s: int = 1800) -> rd.Dataset:
    """Sliding (hopping) windows — tumbling's overlapping sibling."""
    ds = _read_table(sf_dir, "events", ["event_type", "ts", "value"])
    out = win.sliding_window(ds, width_s, step_s)

    def to_int_units(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(
            batch.schema.get_field_index("sum_value"), "sum_value_e6",
            pc.round(pc.multiply(batch["sum_value"], 1e6)).cast(pa.int64()))

    return out.map_batches(to_int_units, batch_format="pyarrow")


def window_sliding_sql(width_s: int = 3600, step_s: int = 1800) -> str:
    step = step_s * 1_000_000
    nk = width_s // step_s
    return f"""
SELECT event_type,
       make_timestamp((CAST(floor(epoch_us(ts) / {step}) AS BIGINT) - k.k)
                      * {step}) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_e6
FROM events CROSS JOIN (SELECT unnest(range(0, {nk})) AS k) k
GROUP BY event_type, window_start"""


def rolling_user_value(sf_dir: str, width_s: int = 3600) -> rd.Dataset:
    """Per-user trailing-hour rolling aggregate (windowed aggregate the
    streaming way: RANGE width PRECEDING .. CURRENT ROW per key)."""
    ds = _read_table(sf_dir, "events",
                     ["event_id", "user_id", "ts", "value"])
    out = win.rolling_time_window(ds, width_s)

    def to_int_units(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(
            batch.schema.get_field_index("sum_window"), "sum_window_e6",
            pc.round(pc.multiply(batch["sum_window"], 1e6)).cast(pa.int64()))

    return out.map_batches(to_int_units, batch_format="pyarrow")


def rolling_user_value_sql(width_s: int = 3600) -> str:
    return f"""
SELECT event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_window,
       CAST(round(sum(value) OVER w * 1000000) AS BIGINT) AS sum_window_e6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {width_s} SECOND PRECEDING
                       AND CURRENT ROW)"""


def running_user_value(sf_dir: str) -> rd.Dataset:
    """Per-user ordered running totals — the unbounded-preceding window
    function (``ROW_NUMBER()`` / ``SUM() OVER (PARTITION BY user ORDER
    BY ts)``) via stages/scan.py:keyed_scan: ONE key-hash shuffle,
    vectorized per-partition groupby-cumsum, zero driver state. The
    float ``value`` integerizes to e6 units per row BEFORE the cumsum so
    the running sum is association-order-free (hash-safe vs the SQL
    window oracle)."""
    from ..stages.scan import keyed_scan

    ds = _read_table(sf_dir, "events",
                     ["event_id", "user_id", "ts", "value"])

    def to_units(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        units = pc.round(pc.multiply(batch["value"], 1e6)).cast(pa.int64())
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts": batch["ts"],
                         "value_e6": units})

    out = keyed_scan(ds.map_batches(to_units, batch_format="pyarrow"),
                     key_col="user_id", sort_cols=["ts", "event_id"],
                     value_col="value_e6", rank_col="row_num",
                     cum_col="run_value_e6")
    return out.select_columns(["event_id", "row_num", "run_value_e6"])


def running_user_value_sql() -> str:
    return """
SELECT event_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS row_num,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w AS BIGINT)
         AS run_value_e6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""


def user_value_lag(sf_dir: str) -> rd.Dataset:
    """LAG / LEAD window functions: each event's previous and next
    same-user event value (cents), ordered by (ts, event_id) — the
    shifted-window family (stages/scan.py:keyed_shift: one key-hash
    shuffle, vectorized per-partition groupby-shift). -1 sentinel when
    no neighbor exists (event values are positive by generation — the
    asof_prior_error convention)."""
    from ..stages.scan import keyed_shift

    ds = _read_table(sf_dir, "events",
                     ["event_id", "user_id", "ts", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cents = pc.round(pc.multiply(batch["value"], 100.0)).cast(pa.int64())
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts": batch["ts"],
                         "cents": cents})

    out = keyed_shift(ds.map_batches(to_cents, batch_format="pyarrow"),
                      key_col="user_id", sort_cols=["ts", "event_id"],
                      value_col="cents",
                      shifts={"prev_cents": 1, "next_cents": -1})
    return out.select_columns(["event_id", "prev_cents", "next_cents"])


def user_value_lag_sql() -> str:
    return """
SELECT event_id,
       CAST(COALESCE(LAG(c) OVER w, -1) AS BIGINT) AS prev_cents,
       CAST(COALESCE(LEAD(c) OVER w, -1) AS BIGINT) AS next_cents
FROM (SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS c FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


def event_value_bands(types: list[str]) -> "pa.Table":
    """The per-type value-tier DIMENSION (rate-card shape) as a pure
    function of the type list, so the SQL oracle re-derives it: per
    type, 4 quadratic-width bands over cents — step = 1000 +
    100·(len(type) % 7); band j covers [j²·step, (j+1)²·step), except
    band 0 starts at 500 (cents below 500 fall in NO band — the
    inner-join drop path carries real traffic, ~10% of events) and
    band 3 is unbounded (hi = -1 sentinel)."""
    rows = {"key": [], "band": [], "lo": [], "hi": []}
    for t in types:
        step = 1000 + 100 * (len(t) % 7)
        for j in range(4):
            rows["key"].append(t)
            rows["band"].append(j)
            rows["lo"].append(j * j * step if j else 500)
            rows["hi"].append((j + 1) * (j + 1) * step if j < 3 else -1)
    return pa.table({"key": pa.array(rows["key"], pa.string()),
                     "band": pa.array(rows["band"], pa.int64()),
                     "lo": pa.array(rows["lo"], pa.int64()),
                     "hi": pa.array(rows["hi"], pa.int64())})


def value_band_join(sf_dir: str) -> rd.Dataset:
    """Range (interval) join — events priced into per-type value tiers:
    each event matches the band of its type whose half-open cents range
    contains it (band 3 unbounded; cents < 500 match nothing and DROP —
    inner semantics). The third custom join family next to as-of and
    equality (stages/joins.broadcast_range_join): the tier table is a
    driver-built dimension (O(types·bands) rows), validated +
    searchsorted-indexed once, broadcast once via ``ray.put``; the
    event table streams map-side through one vectorized binary-search
    probe per batch and never shuffles."""
    from ..stages.joins import broadcast_range_join

    ds = _read_table(sf_dir, "events", ["event_id", "event_type", "value"])
    types = sorted(r["event_type"] for r in
                   ds.groupby("event_type").count().take_all())
    bands = event_value_bands(types)

    def to_cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cents = pc.round(pc.multiply(batch["value"], 100.0)).cast(pa.int64())
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value_cents": cents})

    return broadcast_range_join(
        ds.map_batches(to_cents, batch_format="pyarrow"), bands,
        key_col="event_type", value_col="value_cents",
        left_cols=["event_id", "event_type", "value_cents"],
        interval_cols=["band", "lo", "hi"],
    ).map_batches(
        lambda t: t.rename_columns(
            ["event_id", "event_type", "value_cents",
             "band", "band_lo", "band_hi"]),
        batch_format="pyarrow")


def value_band_join_sql() -> str:
    return """
WITH types AS (
  SELECT DISTINCT event_type FROM events
), bands AS (
  SELECT event_type, CAST(g.j AS BIGINT) AS band,
         CAST(CASE WHEN g.j = 0 THEN 500
              ELSE g.j * g.j * (1000 + 100 * (length(event_type) % 7))
              END AS BIGINT) AS lo,
         CAST(CASE WHEN g.j = 3 THEN -1
              ELSE (g.j + 1) * (g.j + 1)
                   * (1000 + 100 * (length(event_type) % 7))
              END AS BIGINT) AS hi
  FROM types CROSS JOIN generate_series(0, 3) g(j)
), ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents FROM events
)
SELECT e.event_id, e.event_type, e.value_cents,
       b.band, b.lo AS band_lo, b.hi AS band_hi
FROM ev e JOIN bands b
  ON b.event_type = e.event_type
 AND e.value_cents >= b.lo
 AND (b.hi = -1 OR e.value_cents < b.hi)"""


def asof_prior_error(sf_dir: str) -> rd.Dataset:
    """As-of join: each click event gets the newest error event of the
    same user at or before its timestamp (-1 when none) — the temporal
    point-lookup shape (stages/joins.py)."""
    import pyarrow.compute as pc

    from ..stages.joins import asof_join

    ev = _read_table(sf_dir, "events", ["event_id", "user_id",
                                        "event_type", "ts"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")),
        batch_format="pyarrow")
    errors = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "error")),
        batch_format="pyarrow")
    return asof_join(clicks, errors, key_col="user_id", ts_col="ts",
                     left_id_col="event_id", right_id_col="event_id",
                     out_left="event_id", out_right="prior_error_id")


def asof_prior_error_sql() -> str:
    # the right side pre-collapses (user, ts) ties to max(event_id) —
    # the Ray asof_join's documented tie order; DuckDB's ASOF tie pick
    # among equal b.ts rows is otherwise unspecified
    return """
SELECT a.event_id, CAST(COALESCE(b.event_id, -1) AS BIGINT) AS prior_error_id
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'error'
                GROUP BY user_id, ts) b
  ON a.user_id = b.user_id AND a.ts >= b.ts"""


FUNNEL_STEPS = ("signup", "click", "purchase")


def event_funnel(sf_dir: str, steps: tuple = FUNNEL_STEPS,
                 num_partitions: int = 32,
                 step_window_us: "int | None" = None) -> rd.Dataset:
    """Ordered-funnel analysis — the classic product-analytics
    operator: per user, the FIRST completion chain (earliest step-1
    event, then the earliest step-2 event strictly after it, then the
    earliest step-3 after that; strictness is lexicographic on
    (ts, event_id) so equal timestamps cannot double-count one event
    or reorder nondeterministically). ``step_window_us`` adds the
    TIMED-funnel constraint (each step within a window of the previous
    one). NOTE the semantics: this is the GREEDY first-touch chain
    with a per-step timeout — the product-analytics convention — NOT
    the maximal-completion chain: a user whose earliest step-2 event
    times the funnel out but whose later step-2 would have completed
    it reports the greedy (lower) depth; max-completion would need a
    search over candidates per step. Returns one row per user:
    (user_id, steps_completed, convert_us) with convert_us = step-N
    minus step-1 in microseconds (-1 unless the funnel completed) —
    every value integer, bit-exact vs the row-comparison SQL replica.

    Shape: the keyed-window scan (ONE user-hash shuffle; per-partition
    body is len(steps) vectorized sort+groupby-first passes + merges —
    funnels are per-user sequential by definition, but nothing here is
    per-user Python). Skew bound: one partition holds ~1/P of users."""
    P = num_partitions
    if P & (P - 1):
        raise ValueError("num_partitions must be a power of two")

    ds = _read_table(sf_dir, "events",
                     ["event_id", "user_id", "ts", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kp = pc.bit_wise_and(t["user_id"].combine_chunks().cast(pa.int64()),
                             P - 1)
        return t.append_column("_kp", kp)

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": g["user_id"].unique()})
        prev = None   # per-user frame with ts/id of the last step hit
        reached = None
        for si, step in enumerate(steps):
            ev = g[g["event_type"] == step][["user_id", "ts", "event_id"]]
            if prev is not None:
                ev = ev.merge(prev, on="user_id", how="inner",
                              suffixes=("", "_p"))
                after = (ev["ts"] > ev["ts_p"]) | (
                    (ev["ts"] == ev["ts_p"])
                    & (ev["event_id"] > ev["event_id_p"]))
                if step_window_us is not None:
                    gap = (ev["ts"].astype("datetime64[us]")
                           .astype("int64")
                           - ev["ts_p"].astype("datetime64[us]")
                           .astype("int64"))
                    after = after & (gap <= step_window_us)
                ev = ev[after][["user_id", "ts", "event_id", "ts0"]]
            first = (ev.sort_values(["ts", "event_id"], kind="mergesort")
                     .groupby("user_id", sort=False).head(1))
            if si == 0:
                first = first.assign(ts0=first["ts"])
            cur = first[["user_id", "ts", "event_id", "ts0"]]
            prev = cur.rename(columns={"ts": "ts_p",
                                       "event_id": "event_id_p"})
            reached = (cur.assign(steps_completed=si + 1)
                       if reached is None else
                       pd.concat([reached[~reached["user_id"]
                                          .isin(cur["user_id"])],
                                  cur.assign(steps_completed=si + 1)]))
        out = users.merge(reached, on="user_id", how="left")
        sc = out["steps_completed"].fillna(0).astype("int64")
        done = sc == len(steps)
        epoch = pd.Timestamp(0)
        dt = (out["ts"].fillna(epoch).astype("datetime64[us]")
              .astype("int64")
              - out["ts0"].fillna(epoch).astype("datetime64[us]")
              .astype("int64"))
        conv = np.where(done, dt, -1).astype(np.int64)
        return pd.DataFrame({"user_id": out["user_id"].astype("int64"),
                             "steps_completed": sc,
                             "convert_us": conv})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kp").map_groups(funnel, batch_format="pandas"))


def event_funnel_sql(steps: tuple = FUNNEL_STEPS,
                     step_window_us: "int | None" = None) -> str:
    win = ("" if step_window_us is None else
           f"\n      AND date_diff('microsecond', p.ts, e.ts)"
           f" <= {step_window_us}")
    parts = []
    for si, step in enumerate(steps):
        if si == 0:
            inner = f"""SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = '{step}'"""
        else:
            inner = f"""SELECT e.user_id, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id
                              ORDER BY e.ts, e.event_id) AS rn
    FROM events e JOIN s{si} p ON p.user_id = e.user_id
    WHERE e.event_type = '{step}'
      AND (e.ts > p.ts OR (e.ts = p.ts AND e.event_id > p.event_id)){win}"""
        parts.append(f"""s{si + 1} AS MATERIALIZED (
  SELECT user_id, ts, event_id FROM (
    {inner}
  ) WHERE rn = 1
)""")
    n = len(steps)
    case = " ".join(
        f"WHEN s{si}.user_id IS NOT NULL THEN {si}"
        for si in range(n, 0, -1))
    joins = "\n".join(
        f"LEFT JOIN s{si} ON s{si}.user_id = u.user_id"
        for si in range(1, n + 1))
    return ("WITH " + ",\n".join(parts) + f""",
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE {case} ELSE 0 END AS BIGINT) AS steps_completed,
       CAST(CASE WHEN s{n}.user_id IS NOT NULL
            THEN date_diff('microsecond', s1.ts, s{n}.ts)
            ELSE -1 END AS BIGINT) AS convert_us
FROM u
{joins}""")


WEEK_US = 7 * 86_400 * 1_000_000   # epoch-week bucket width


def retention_cohorts(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Cohort retention analysis — ``event_funnel``'s companion and the
    other classic product-analytics operator: users are grouped by the
    epoch week of their FIRST event (cohort_week = epoch_us // week),
    and each (cohort_week, age_weeks) cell counts how many of that
    cohort's users were active ``age_weeks`` weeks later (age 0 row =
    cohort size; a cohort's n_users is non-increasing only in classic
    retention curves — here cells are raw activity counts, exactly what
    the SQL replica states). All integers: week ids are floor-divided
    microseconds, counts are counts.

    Shape: ONE user-hash keyed shuffle (the keyed-window scan shape,
    ``event_funnel``): the per-partition body is pure vectorized pandas
    (distinct user-weeks, per-user min via groupby-transform), and it
    emits PARTIAL (cohort, age, n) cells — a user appears in ≤1 row per
    cell by the distinct, so the final exchange is a tiny
    groupby-sum over O(weeks²) cells, never a second pass over users."""
    P = num_partitions
    if P & (P - 1):
        raise ValueError("num_partitions must be a power of two")
    ds = _read_table(sf_dir, "events", ["user_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kp = pc.bit_wise_and(t["user_id"].combine_chunks().cast(pa.int64()),
                             P - 1)
        return t.append_column("_kp", kp)

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        w = (g["ts"].astype("datetime64[us]").astype("int64") // WEEK_US)
        uw = pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                           "w": w}).drop_duplicates()
        cw = uw.groupby("user_id")["w"].transform("min")
        cell = pd.DataFrame({"cohort_week": cw.astype("int64"),
                             "age_weeks": (uw["w"] - cw).astype("int64")})
        out = (cell.groupby(["cohort_week", "age_weeks"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kp").map_groups(cells, batch_format="pandas")
            .groupby(["cohort_week", "age_weeks"])
            .aggregate(Sum("n", alias_name="n_users")))


def retention_cohorts_sql() -> str:
    return f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // {WEEK_US} AS BIGINT) AS w
  FROM events
), coh AS (
  SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id
)
SELECT coh.cw AS cohort_week,
       CAST(uw.w - coh.cw AS BIGINT) AS age_weeks,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN coh ON coh.user_id = uw.user_id
GROUP BY 1, 2"""


def path_trigrams(sf_dir: str, k: int = 25,
                  num_partitions: int = 32) -> rd.Dataset:
    """Clickstream path mining — the top-``k`` event-type TRIGRAMS over
    per-user ordered streams (the sequence statistic funnel designers
    read before hard-coding a funnel like ``event_funnel``'s: which
    3-step paths actually happen). Order inside a user is (ts,
    event_id) — the repo's deterministic stream order; a trigram is
    three CONSECUTIVE events of one user. Returns (path, n) ordered by
    (n DESC, path), path = 'a>b>c'.

    Shape: ONE user-hash keyed shuffle; per partition the body is
    vectorized pandas (sort, two groupby-shifts, one value_counts) and
    emits PARTIAL (path, n) counts, so the final exchange is a tiny
    groupby-sum over the |types|³-bounded path domain; top-k via
    per-block partial top-k + one small sort."""
    P = num_partitions
    if P & (P - 1):
        raise ValueError("num_partitions must be a power of two")
    ds = _read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                        "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kp = pc.bit_wise_and(t["user_id"].combine_chunks().cast(pa.int64()),
                             P - 1)
        return t.append_column("_kp", kp)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        by_u = g.groupby("user_id", sort=False)["event_type"]
        e2 = by_u.shift(-1)
        e3 = by_u.shift(-2)
        ok = e3.notna()
        if not ok.any():
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        path = (g["event_type"][ok] + ">" + e2[ok] + ">" + e3[ok])
        vc = path.value_counts()
        return pd.DataFrame({"path": vc.index,
                             "n": vc.to_numpy(np.int64)})

    counts = (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("_kp").map_groups(partial, batch_format="pandas")
              .groupby("path").aggregate(Sum("n", alias_name="n")))

    def topk(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        p = np.asarray(t["path"].to_pylist(), dtype=object)
        order = np.lexsort((p, -n))[:k]
        return t.take(pa.array(order))

    return (counts.map_batches(topk, batch_format="pyarrow")
            .sort(["n", "path"], descending=[True, False])
            .limit(k))


def path_trigrams_sql(k: int = 25) -> str:
    return f"""
WITH s AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT {k}"""


def interarrival_hist(sf_dir: str,
                      num_partitions: int = 32) -> rd.Dataset:
    """Inter-arrival-time histogram — per event type, how long since
    the SAME user's previous event (any type), bucketed by decimal
    magnitude: bucket = number of digits of the gap in microseconds
    (0 µs → 1 digit). The latency-profile census event pipelines run
    before choosing session gaps (``sessions``' 30-min threshold) or
    retention windows — and the bucket rule is pure STRING/INTEGER
    (digit count), never floor(log2(float)), so both engines agree
    exactly with no libm-boundary argument. Returns (event_type,
    gap_digits, n_gaps); a user's first event has no gap and is absent.

    Shape: ONE user-hash keyed shuffle; vectorized per-partition body
    (sort, one groupby-shift, digit lengths via string cast) emitting
    PARTIAL counts; final exchange is a tiny groupby-sum over
    O(types × 14) cells."""
    P = num_partitions
    if P & (P - 1):
        raise ValueError("num_partitions must be a power of two")
    ds = _read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                        "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kp = pc.bit_wise_and(t["user_id"].combine_chunks().cast(pa.int64()),
                             P - 1)
        return t.append_column("_kp", kp)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].astype("datetime64[us]").astype("int64")
        prev = us.groupby(g["user_id"]).shift(1)
        ok = prev.notna()
        if not ok.any():
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "gap_digits": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")})
        gap = (us[ok] - prev[ok].astype("int64"))
        digits = gap.astype("int64").astype(str).str.len().astype("int64")
        out = (pd.DataFrame({"event_type": g["event_type"][ok],
                             "gap_digits": digits})
               .groupby(["event_type", "gap_digits"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kp").map_groups(partial, batch_format="pandas")
            .groupby(["event_type", "gap_digits"])
            .aggregate(Sum("n", alias_name="n_gaps")))


def interarrival_hist_sql() -> str:
    return """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(length(CAST(gap AS VARCHAR)) AS BIGINT) AS gap_digits,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM s WHERE gap IS NOT NULL
GROUP BY 1, 2"""


def vocab_df(sf_dir: str) -> rd.Dataset:
    """Corpus vocabulary with term + document frequencies — the
    wordcount-with-combiner shape: per-batch partial (word, count,
    doc-count) rows, then ONE small groupby-sum shuffle (never a
    shuffle of exploded token rows)."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        tot: Counter = Counter()
        dfc: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = (text or "").split(" ")
            tot.update(toks)
            dfc.update(set(toks))
        words = sorted(tot)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "c_total": pa.array([tot[w] for w in words], pa.int64()),
            "c_docs": pa.array([dfc[w] for w in words], pa.int64()),
        })

    return (_docs(sf_dir, ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("word")
            .aggregate(Sum("c_total", alias_name="n_total"),
                       Sum("c_docs", alias_name="n_docs")))


def vocab_df_sql() -> str:
    return """
SELECT word, CAST(sum(c) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
) GROUP BY word"""


def stopword_prune(sf_dir: str, df_pct: int = 50) -> rd.Dataset:
    """Corpus-ADAPTIVE stopword pruning — the vocabulary-driven text
    rewrite (Luhn's classic cutoff; the index-size lever search and
    retrieval stacks apply before tokenizing): a word is a stopword iff
    its document frequency reaches ``df_pct`` percent of the corpus
    (n_docs·100 ≥ df_pct·N, pure integers), and every document is
    rewritten with those words removed. Returns (doc_id, n_removed,
    text_pruned) — the rewrite half that ``vocab_df`` (the statistic)
    and ``tfidf_top_terms`` (the weighting) stop short of.

    Shape: pass 1 is the ``vocab_df`` wordcount-combiner fold; the
    stoplist it yields is SMALL BY NATURE (words in ≥ half of all
    documents — tens, not vocabulary-sized; a low ``df_pct`` that could
    grow it is the caller's contract), so it broadcasts once via
    ``ray.put`` and pass 2 is map-side only: per batch, the keep/drop
    decision is ONE flattened np.isin over all tokens +
    reduceat/split reassembly (Python only splits and re-joins
    strings, as every text op here does); the corpus never shuffles."""
    import ray as _ray

    n_corpus = _docs(sf_dir, ["doc_id"]).count()
    vocab = vocab_df(sf_dir)

    def pick(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nd * 100 >= df_pct * n_corpus
        return t.filter(pa.array(keep)).select(["word"])

    stop_words = [r["word"] for r in
                  vocab.map_batches(pick, batch_format="pyarrow")
                  .take_all()]
    ref = _ray.put(np.asarray(sorted(stop_words), dtype=object))

    def rewrite(batch: pa.Table) -> pa.Table:
        stop = _ray.get(ref)
        texts = batch["text"].to_pylist()
        toks = [(t or "").split(" ") for t in texts]
        lens = np.fromiter((len(ws) for ws in toks), np.int64, len(toks))
        flat = np.asarray([w for ws in toks for w in ws], dtype=object)
        keep = (~np.isin(flat, stop) if len(flat)
                else np.array([], bool))
        offs = np.zeros(len(toks) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), offs[:-1]) \
            if len(flat) else np.zeros(len(toks), np.int64)
        kept_per_doc[lens == 0] = 0   # reduceat repeats on empty slices
        kept_flat = flat[keep]
        bounds = np.zeros(len(toks) + 1, np.int64)
        np.cumsum(kept_per_doc, out=bounds[1:])
        pruned = [" ".join(kept_flat[bounds[i]:bounds[i + 1]])
                  for i in range(len(toks))]
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "n_removed": pa.array(lens - kept_per_doc, pa.int64()),
            "text_pruned": pa.array(pruned, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rewrite, batch_format="pyarrow")


def stopword_prune_sql(df_pct: int = 50) -> str:
    """Same DF threshold + list_filter rewrite; the single-row stoplist
    CTE cross-joins onto every document row (lambda captures ``sw``)."""
    return f"""
WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
df AS (
  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY word
), sl AS (
  SELECT coalesce(list(word), []) AS sw
  FROM df CROSS JOIN nd WHERE c * 100 >= {df_pct} * nd.n
)
SELECT w.doc_id,
       CAST(len(ws) - len(list_filter(ws, x -> NOT list_contains(sl.sw, x)))
            AS BIGINT) AS n_removed,
       coalesce(array_to_string(
           list_filter(ws, x -> NOT list_contains(sl.sw, x)), ' '),
           '') AS text_pruned
FROM w CROSS JOIN sl"""


def bpe_pair_counts(sf_dir: str, k: int = 64) -> rd.Dataset:
    """BPE tokenizer-training statistics (Sennrich et al. 2016): the
    top-``k`` adjacent character pairs inside whitespace words across
    the corpus — exactly the count a BPE trainer computes to pick its
    next merge rule. Each output row is a candidate merge:
    (pair, lhs, rhs, pair_count), ordered by count desc then pair asc
    (the deterministic tie-break the oracle replicates).

    Scale shape: the wordcount combiner pattern (``vocab_df``) on an
    even smaller key domain — per-block Counter folds every block to
    <= alphabet² partial rows, ONE tiny groupby-sum shuffle, then a
    sort+limit over the few-thousand-row distinct-pair table. A full
    BPE trainer iterates this op, re-counting over the merged symbol
    sequences; each iteration is the same combiner shape."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            for w in (text or "").split(" "):
                for i in range(len(w) - 1):
                    c[w[i:i + 2]] += 1
        pairs = sorted(c)
        return pa.table({
            "pair": pa.array(pairs, pa.string()),
            "c": pa.array([c[p] for p in pairs], pa.int64()),
        })

    agg = (_docs(sf_dir, ["text"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("pair")
           .aggregate(Sum("c", alias_name="pair_count")))

    def split(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        p = t["pair"].combine_chunks()
        return pa.table({
            "pair": p,
            "lhs": pc.utf8_slice_codeunits(p, 0, 1),
            "rhs": pc.utf8_slice_codeunits(p, 1, 2),
            "pair_count": t["pair_count"].combine_chunks().cast(pa.int64()),
        })

    return (agg.sort(["pair_count", "pair"], descending=[True, False])
            .limit(k).map_batches(split, batch_format="pyarrow"))


def bpe_pair_counts_sql(k: int = 64) -> str:
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM (SELECT w, unnest(range(1, length(w))) AS i FROM words)
), agg AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
  FROM pairs GROUP BY pair
)
SELECT pair, substr(pair, 1, 1) AS lhs, substr(pair, 2, 1) AS rhs,
       pair_count
FROM agg ORDER BY pair_count DESC, pair LIMIT {k}"""


# Merged BPE symbols are single private-use-area codepoints so a merge
# rule's pair is ALWAYS a 2-codepoint string and Python str.replace ==
# DuckDB replace() (both substitute non-overlapping occurrences
# left-to-right — exactly BPE's greedy within-word merge pass).
_BPE_SYM_BASE = 0xE000


def _bpe_count_pairs(word_n_pairs, applied):
    """Adjacent-symbol pair counts over (word, freq) rows with the merge
    list ``applied`` (pair -> single-codepoint symbol) replayed first.
    str.replace's non-overlapping left-to-right substitution IS BPE's
    greedy within-word merge pass, so this is exact, not approximate.
    Assumes input text contains no U+E000..U+F8FF private-use chars
    (they are the merge sentinels; the corpus convention is ASCII)."""
    from collections import Counter
    c: Counter = Counter()
    for w, n in word_n_pairs:
        for p, s in applied:
            w = w.replace(p, s)
        for i in range(len(w) - 1):
            c[w[i:i + 2]] += n
    return c


def _bpe_merge_rounds(vocab, n_merges: int):
    """The in-memory BPE merge loop over a (word, freq) vocab: each
    round picks argmax-count (ties: lexicographically smallest pair)
    and assigns the next private-use sentinel. Returns
    [(pair, symbol, count)]. Property-tested against an independent
    symbol-list merge reference (test_property_robustness)."""
    merges: list[tuple[str, str, int]] = []
    for step in range(n_merges):
        c = _bpe_count_pairs(vocab, tuple((p, s) for p, s, _ in merges))
        if not c:
            break
        pair = min(c, key=lambda p: (-c[p], p))
        merges.append((pair, chr(_BPE_SYM_BASE + step), c[pair]))
    return merges


def bpe_train(sf_dir: str, n_merges: int = 8,
              driver_word_cap: int = 2_000_000) -> rd.Dataset:
    """BPE tokenizer TRAINING (Sennrich et al. 2016): learn the first
    ``n_merges`` merge rules, returning the merge table
    (step, pair, lhs, rhs, pair_count) a BPE encoder applies.

    Scale shape — the published trainer's: ONE corpus pass folds to the
    distinct-word frequency table (words << tokens; the only corpus-
    sized exchange). The merge rounds then run over THAT table. When it
    fits the driver (<= ``driver_word_cap`` rows — Sennrich's reference
    trainer is exactly this in-memory loop over the word-freq dict, and
    even web-scale vocabularies prune to this range with a min-count
    floor), the rounds run locally in one shot; otherwise each round is
    a distributed map-side pair count (the growing merge list applied
    on the fly — <= n_merges cheap replaces per word, so the word table
    materializes once), an alphabet²-bounded groupby, and a 1-row
    argmax take. Ties break (count desc, pair asc) — bit-exact vs the
    unrolled-CTE DuckDB oracle either way."""
    from collections import Counter

    def word_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            for w in (text or "").split(" "):
                if len(w) >= 2:
                    c[w] += 1
        ws = sorted(c)
        return pa.table({
            "word": pa.array(ws, pa.string()),
            "c": pa.array([c[w] for w in ws], pa.int64()),
        })

    words = (_docs(sf_dir, ["text"])
             .map_batches(word_partial, batch_format="pyarrow")
             .groupby("word")
             .aggregate(Sum("c", alias_name="n"))
             .materialize())   # distinct-word table: the trainer's state

    merges: list[tuple[str, str, int]] = []   # (pair, symbol, count)
    if words.count() <= driver_word_cap:
        vocab = [(r["word"], r["n"]) for r in words.take_all()]
        merges = _bpe_merge_rounds(vocab, n_merges)
    else:
        for step in range(n_merges):
            applied = tuple((p, s) for p, s, _ in merges)

            def pair_partial(batch: pa.Table,
                             _applied=applied) -> pa.Table:
                c = _bpe_count_pairs(zip(batch["word"].to_pylist(),
                                         batch["n"].to_pylist()), _applied)
                pairs = sorted(c)
                return pa.table({
                    "pair": pa.array(pairs, pa.string()),
                    "c": pa.array([c[p] for p in pairs], pa.int64()),
                })

            top = (words.map_batches(pair_partial, batch_format="pyarrow")
                   .groupby("pair").aggregate(Sum("c", alias_name="cnt"))
                   .sort(["cnt", "pair"], descending=[True, False])
                   .limit(1).take_all())
            if not top:
                break
            merges.append((top[0]["pair"], chr(_BPE_SYM_BASE + step),
                           top[0]["cnt"]))

    rows = pa.table({
        "step": pa.array(range(len(merges)), pa.int64()),
        "pair": pa.array([p for p, _, _ in merges], pa.string()),
        "lhs": pa.array([p[0] for p, _, _ in merges], pa.string()),
        "rhs": pa.array([p[1] for p, _, _ in merges], pa.string()),
        "pair_count": pa.array([n for _, _, n in merges], pa.int64()),
    })
    return rd.from_arrow(rows)


def bpe_train_sql(n_merges: int = 8) -> str:
    """Unrolled chained-CTE replica of bpe_train (the kmeans_clusters
    pattern): w{r} = word table after r merges, p{r} = weighted pair
    counts, m{r} = that round's argmax merge rule."""
    def pair_cte(r: int) -> str:
        return f"""p{r} AS (
  SELECT substr(w, i, 2) AS pair, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT w, n, unnest(range(1, length(w))) AS i FROM w{r})
  GROUP BY pair
), m{r} AS (
  SELECT {r} AS step, pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
)"""

    parts = ["""w0 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w
)""", pair_cte(0)]
    for r in range(1, n_merges):
        parts.append(f"""w{r} AS (
  SELECT replace(w, (SELECT pair FROM m{r - 1}), chr({_BPE_SYM_BASE + r - 1}))
           AS w, n
  FROM w{r - 1}
)""")
        parts.append(pair_cte(r))
    union = "\nUNION ALL ".join(f"SELECT * FROM m{r}"
                                for r in range(n_merges))
    return ("WITH " + ",\n".join(parts) + f"""
SELECT step, pair, substr(pair, 1, 1) AS lhs, substr(pair, 2, 1) AS rhs,
       cnt AS pair_count
FROM ({union}) ORDER BY step""")


def bpe_token_counts(sf_dir: str, n_merges: int = 8) -> rd.Dataset:
    """BPE ENCODE: tokenize every document with the merge table
    ``bpe_train`` learns, emitting (doc_id, n_tokens, n_words) — the
    real token counter a training-data pipeline budgets with (vs the
    len//4 estimator, M15). Map-side: the M-rule merge table broadcasts
    in the task closure and each word is encoded with M replaces; one
    pass over the corpus, no shuffle after the train step's word fold."""
    merges = [(r["pair"], chr(_BPE_SYM_BASE + r["step"]))
              for r in bpe_train(sf_dir, n_merges).take_all()]

    def encode(batch: pa.Table) -> pa.Table:
        toks, words = [], []
        for text in batch["text"].to_pylist():
            nt = nw = 0
            for w in (text or "").split(" "):
                if not w:
                    continue
                nw += 1
                for p, s in merges:
                    w = w.replace(p, s)
                nt += len(w)
            toks.append(nt)
            words.append(nw)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "n_words": pa.array(words, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow")


def bpe_token_counts_sql(n_merges: int = 8) -> str:
    """Recomputes the merge table via bpe_train_sql's CTE chain, then
    applies the replaces nested per word and sums codepoint counts."""
    train = bpe_train_sql(n_merges)
    ctes = train[len("WITH "):train.rindex("\nSELECT step")]
    expr = "w"
    for r in range(n_merges):
        expr = (f"replace({expr}, (SELECT pair FROM m{r}), "
                f"chr({_BPE_SYM_BASE + r}))")
    return f"""WITH {ctes}
, enc AS (
  SELECT doc_id, CAST(sum(length({expr})) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_words
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(e.n_tokens, 0) AS n_tokens,
       coalesce(e.n_words, 0) AS n_words
FROM documents d LEFT JOIN enc e USING (doc_id)"""


def bigram_counts(sf_dir: str) -> rd.Dataset:
    """Corpus bigram frequencies — n-gram LM statistics with the same
    combiner shape as ``vocab_df``: per-batch partial (bigram, count,
    doc-count) rows, ONE small groupby-sum shuffle."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        tot: Counter = Counter()
        dfc: Counter = Counter()
        for text in batch["text"].to_pylist():
            words = (text or "").split(" ")
            grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
            tot.update(grams)
            dfc.update(set(grams))
        keys = sorted(tot)
        return pa.table({
            "bigram": pa.array(keys, pa.string()),
            "c_total": pa.array([tot[k] for k in keys], pa.int64()),
            "c_docs": pa.array([dfc[k] for k in keys], pa.int64()),
        })

    return (_docs(sf_dir, ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bigram")
            .aggregate(Sum("c_total", alias_name="n_total"),
                       Sum("c_docs", alias_name="n_docs")))


def bigram_counts_sql() -> str:
    return """
SELECT bigram, CAST(sum(c) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, bigram, count(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1])) AS bigram
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  ) GROUP BY doc_id, bigram
) GROUP BY bigram"""


def bigram_lift(sf_dir: str, k: int = 50, min_count: int = 5,
                scale: int = 1000) -> rd.Dataset:
    """Collocation mining — the top-``k`` bigrams by LIFT, the
    association statistic P(xy)/(P(x)·P(y)) that phrase-vocabulary
    builders (word2vec's phrase pass, index phrase dictionaries) rank
    candidate collocations with (lift is monotone with PMI at fixed
    counts, and unlike PMI it quantizes exactly): lift_q =
    (c_xy · N · scale) // (c_x · c_y), computed in PYTHON BIGINTS over
    the post-filter candidate dimension — no int64 overflow at any
    corpus size — with c_xy ≥ ``min_count`` killing the hapax flood.
    Output (bigram, n_total, lift_q) ordered by (lift_q DESC, bigram).

    Shape: the two wordcount-combiner folds this family always uses
    (``vocab_df`` / ``bigram_counts``), then unigram counts attach to
    the filtered bigram dimension via TWO distributed hash_joins on
    stable_hash64(word) with an exact string-equality verify after
    each (the bucket-then-verify discipline of ``minhash_cluster`` —
    ``hash_join`` keys are int64, and the verify makes a 64-bit
    collision impossible to silently merge; the vocabulary is
    corpus-sized, never a broadcast), N is one driver scalar
    (``Dataset.sum``), and the top-k is per-block partial top-k
    + one small global sort — never a global sort of the vocabulary."""
    from collections import Counter

    from ..functions.hashing import stable_hash64
    from ..stages.joins import hash_join

    def uni_partial(batch: pa.Table) -> pa.Table:
        tot: Counter = Counter()
        for text in batch["text"].to_pylist():
            tot.update((text or "").split(" "))
        words = sorted(tot)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "c": pa.array([tot[w] for w in words], pa.int64())})

    def key_uni(t: pa.Table) -> pa.Table:
        hs = [stable_hash64("lift:" + w) for w in t["word"].to_pylist()]
        return t.append_column("hw", pa.array(hs, pa.int64()))

    docs = _docs(sf_dir, ["text"])
    uni = (docs.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("c", alias_name="c_w"))
           .map_batches(key_uni, batch_format="pyarrow")
           .materialize())
    n_tokens = int(uni.sum("c_w") or 0)

    def big_partial(batch: pa.Table) -> pa.Table:
        tot: Counter = Counter()
        for text in batch["text"].to_pylist():
            words = (text or "").split(" ")
            tot.update(zip(words, words[1:]))
        keys = sorted(tot)
        return pa.table({
            "w1": pa.array([a for a, _ in keys], pa.string()),
            "w2": pa.array([b for _, b in keys], pa.string()),
            "c": pa.array([tot[p] for p in keys], pa.int64())})

    big = (docs.map_batches(big_partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c_xy")))

    def floor_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.greater_equal(t["c_xy"],
                                      pa.scalar(min_count, pa.int64())))
        h1 = [stable_hash64("lift:" + w) for w in t["w1"].to_pylist()]
        h2 = [stable_hash64("lift:" + w) for w in t["w2"].to_pylist()]
        return (t.append_column("h1", pa.array(h1, pa.int64()))
                .append_column("h2", pa.array(h2, pa.int64())))

    cand = big.map_batches(floor_key, batch_format="pyarrow")
    # hash_join probes schema() (executes lineage) — pin the first
    # join's output so the second probe doesn't re-run its shuffle
    j1 = hash_join(cand, uni, "h1", "hw",
                   ["w1", "w2", "c_xy", "h2"], ["word", "c_w"],
                   how="inner")

    def r1(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["w1"], t["word"]))   # collision verify
        return pa.table({"w1": t["w1"], "w2": t["w2"], "c_xy": t["c_xy"],
                         "h2": t["h2"],
                         "c1": t["c_w"].combine_chunks().cast(pa.int64())})

    j1m = j1.map_batches(r1, batch_format="pyarrow").materialize()
    j2 = hash_join(j1m, uni, "h2", "hw",
                   ["w1", "w2", "c_xy", "c1"], ["word", "c_w"],
                   how="inner")

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["w2"], t["word"]))   # collision verify
        w1 = t["w1"].to_pylist()
        w2 = t["w2"].to_pylist()
        cxy = t["c_xy"].to_pylist()
        c1 = t["c1"].to_pylist()
        c2 = t["c_w"].to_pylist()
        # Python-int exact: c_xy·N·scale overflows int64 on a
        # trillion-token corpus; the candidate dimension is small
        lift = [(int(x) * n_tokens * scale) // (int(a) * int(b))
                for x, a, b in zip(cxy, c1, c2)]
        return pa.table({
            "bigram": pa.array([f"{a} {b}" for a, b in zip(w1, w2)],
                               pa.string()),
            "n_total": pa.array([int(x) for x in cxy], pa.int64()),
            "lift_q": pa.array(lift, pa.int64())})

    scored = j2.map_batches(score, batch_format="pyarrow")

    def topk(t: pa.Table) -> pa.Table:
        lq = t["lift_q"].to_numpy(zero_copy_only=False)
        bg = np.asarray(t["bigram"].to_pylist(), dtype=object)
        order = np.lexsort((bg, -lq))[:k]
        return t.take(pa.array(order))

    return (scored.map_batches(topk, batch_format="pyarrow")
            .sort(["lift_q", "bigram"], descending=[True, False])
            .limit(k))


def bigram_lift_sql(k: int = 50, min_count: int = 5,
                    scale: int = 1000) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT unnest(ws) AS word FROM w),
uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word),
n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tok),
big AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy FROM (
    SELECT unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i+1])) AS bigram
    FROM w)
  GROUP BY bigram HAVING count(*) >= {min_count}
)
SELECT b.bigram, b.c_xy AS n_total,
       CAST(CAST(b.c_xy AS HUGEINT) * n.nt * {scale}
            // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS lift_q
FROM big b
JOIN uni u1 ON u1.word = split_part(b.bigram, ' ', 1)
JOIN uni u2 ON u2.word = split_part(b.bigram, ' ', 2)
CROSS JOIN n
ORDER BY lift_q DESC, bigram LIMIT {k}"""


NGRAM_N = 8  # word-gram width for duplicated-span detection


def dup_ngram_spans(sf_dir: str) -> rd.Dataset:
    """Duplicated-substring detection at word-8-gram granularity (the
    ExactSubstr idea of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", at n-gram resolution): count, per
    document, how many of its 8-grams also occur in ANOTHER document.

    Shape: a combiner pass builds corpus-wide 8-gram doc-counts (one
    row per distinct gram per batch), the duplicated-gram set broadcasts
    once, and a second pass scores each document against it. The
    duplicated set is bounded by cross-document repetition (tiny unless
    the corpus is pathologically templated); the 100 TB fallback is a
    gram-hash cogroup join instead of the broadcast, and shipping 64-bit
    gram hashes instead of gram strings — IMPLEMENTED for the removal
    op as ``_dup_span_strip_join`` (same pass-1 combiner, zero driver
    gram state); this detector adopts it the same way if needed."""
    from collections import Counter

    import ray

    docs = _docs_with_planted_near_dups(sf_dir)

    def doc_grams(text: str) -> list[str]:
        words = (text or "").split(" ")
        return [" ".join(words[i:i + NGRAM_N])
                for i in range(len(words) - NGRAM_N + 1)]

    def partial(batch: pa.Table) -> pa.Table:
        dfc: Counter = Counter()
        for text in batch["text"].to_pylist():
            dfc.update(set(doc_grams(text)))
        keys = sorted(dfc)
        return pa.table({
            "g": pa.array(keys, pa.string()),
            "c_docs": pa.array([dfc[k] for k in keys], pa.int64()),
        })

    dup_counts = (docs.select_columns(["text"])
                  .map_batches(partial, batch_format="pyarrow")
                  .groupby("g")
                  .aggregate(Sum("c_docs", alias_name="n_docs")))

    dup_set: set[str] = set()
    for b in dup_counts.iter_batches(batch_format="pyarrow"):
        mask = np.asarray(b["n_docs"]) >= 2
        dup_set.update(np.asarray(b["g"])[mask].tolist())
    dup_ref = ray.put(dup_set)

    def score(batch: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)
        n_grams, n_dup = [], []
        for text in batch["text"].to_pylist():
            grams = doc_grams(text)
            n_grams.append(len(grams))
            n_dup.append(sum(1 for g in grams if g in dset))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_dup_grams": pa.array(n_dup, pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def dup_ngram_spans_sql() -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(NGRAM_N))
    gram = gram.replace("w[i+0]", "w[i]")
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {NGRAM_N - 2}),
                               i -> {gram})) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs)
  WHERE len(w) >= {NGRAM_N}
), gd AS (
  SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g
), per AS (
  SELECT grams.doc_id, count(*) AS n_grams,
         sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM grams JOIN gd USING (g) GROUP BY grams.doc_id
)
SELECT a.doc_id,
       CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_grams
FROM all_docs a LEFT JOIN per ON a.doc_id = per.doc_id"""


def dup_span_strip(sf_dir: str, mode: str = "broadcast") -> rd.Dataset:
    """Duplicated-substring REMOVAL (the other half of ExactSubstr, Lee
    et al. 2022: ``dup_ngram_spans`` detects, this rewrites): corpus-wide,
    every duplicated word-8-gram keeps exactly ONE owning copy — the
    minimum doc_id containing it — and every other document drops the
    word positions covered by that gram's windows.

    Two value-identical modes sharing one oracle:

    * ``broadcast`` (default at this scale): pass 1 reuses the
      detector's combiner (per-batch distinct grams → one groupby
      folding doc-count + min-doc-id); the duplicated grams broadcast
      once as a {gram: owner} dict; pass 2 is map-side. Broadcast size
      is bounded by cross-document repetition only.
    * ``join`` (the 100 TB path when the crawl is template-heavy and
      the duplicated set outgrows a broadcast): grams travel as
      stable_hash64 keys; (doc, window) rows attach (owner) via ONE
      distributed ``hash_join``, covered window-starts fold per doc,
      and a second left join rebuilds the text — the driver never
      holds a gram. Gram equality is by 64-bit hash (the
      ``minhash_cluster`` sig-join trade: collision odds ~n²/2⁶⁵).

    Returns (doc_id, n_words, n_removed, clean_text) — integers + the
    rewritten text, exactly replicated by ``dup_span_strip_sql``."""
    from collections import Counter

    import ray
    from ray.data.aggregate import Min

    docs = _docs_with_planted_near_dups(sf_dir)
    if mode == "join":
        return _dup_span_strip_join(docs)
    if mode != "broadcast":
        raise ValueError(f"mode must be 'broadcast' or 'join', got {mode!r}")

    def partial(batch: pa.Table) -> pa.Table:
        dfc: Counter = Counter()
        owner: dict[str, int] = {}
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            words = (text or "").split(" ")
            gs = {" ".join(words[i:i + NGRAM_N])
                  for i in range(len(words) - NGRAM_N + 1)}
            dfc.update(gs)
            for g in gs:
                if g not in owner or did < owner[g]:
                    owner[g] = did
        keys = sorted(dfc)
        return pa.table({
            "g": pa.array(keys, pa.string()),
            "c_docs": pa.array([dfc[k] for k in keys], pa.int64()),
            "own": pa.array([owner[k] for k in keys], pa.int64()),
        })

    folded = (docs.select_columns(["doc_id", "text"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("g")
              .aggregate(Sum("c_docs", alias_name="n_docs"),
                         Min("own", alias_name="owner")))

    dup_owner: dict[str, int] = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        mask = np.asarray(b["n_docs"]) >= 2
        for g, o in zip(np.asarray(b["g"])[mask].tolist(),
                        np.asarray(b["owner"])[mask].tolist()):
            dup_owner[g] = int(o)
    dup_ref = ray.put(dup_owner)

    def strip(batch: pa.Table) -> pa.Table:
        own = ray.get(dup_ref)
        ids = batch["doc_id"].to_pylist()
        out_n, out_rm, out_txt = [], [], []
        for did, text in zip(ids, batch["text"].to_pylist()):
            words = (text or "").split(" ")
            covered = np.zeros(len(words), bool)
            for i in range(len(words) - NGRAM_N + 1):
                g = " ".join(words[i:i + NGRAM_N])
                o = own.get(g)
                if o is not None and o < did:
                    covered[i:i + NGRAM_N] = True
            out_n.append(len(words))
            out_rm.append(int(covered.sum()))
            out_txt.append(" ".join(w for w, c in zip(words, covered)
                                    if not c))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(out_n, pa.int64()),
            "n_removed": pa.array(out_rm, pa.int64()),
            "clean_text": pa.array(out_txt, pa.string()),
        })

    return docs.map_batches(strip, batch_format="pyarrow")


def dup_span_strip_join(sf_dir: str) -> rd.Dataset:
    """``dup_span_strip``'s distributed-join mode as its own verified
    query (shares the oracle — the same trick as ``bm25_topk_indexed``
    / ``ann_ivf_fullprobe``: the scale path must lose nothing)."""
    return dup_span_strip(sf_dir, mode="join")


def _dup_span_strip_join(docs: rd.Dataset, gh_parts: int = 64,
                         doc_parts: int = 16) -> rd.Dataset:
    """The distributed-join mode of :func:`dup_span_strip` (no driver
    gram state): see its docstring for the shape.

    TWO exchanges total (was four plus two hash_joins — the per-op
    overhead dominated at small scale and every exchange is an
    all-to-all at 100 TB):

    1. windows shuffle on gh-partition: the partition body does the
       whole per-gram fold VECTORIZED (lexsort segments; distinct-doc
       count; min owner) and emits covered (doc_id, i) starts
       DIRECTLY — the old dup_grams table and its join back into
       windows never exist. ``gh_parts``/``doc_parts`` bound one
       partition body's memory at data/parts (the hash_join
       num_partitions convention): the small-scale defaults favor
       per-op constants; a 100 TB run sizes them to cluster cores x a
       headroom factor so no body holds more than a worker's heap.
    2. union(text rows, covered rows) shuffle on doc-partition: the
       rebuild sees each doc's text and its covered starts in one
       group — the old per-doc starts_of groupby and the
       docs-side hash_join collapse into this single exchange.

    If block splitting ever lands one doc's windows in two blocks, a
    gram could in principle be seen twice for that doc — harmless
    here: the fold counts DISTINCT docs per gram within the partition
    (all rows of one gh land in one partition by construction), and
    removal only depends on "exists a SMALLER-id doc holding the
    gram"."""
    from ..functions.hashing import stable_hash64

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_i, out_gh = [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            words = (t or "").split(" ")
            for i in range(len(words) - NGRAM_N + 1):
                out_id.append(did)
                out_i.append(i)
                out_gh.append(stable_hash64(" ".join(words[i:i + NGRAM_N])))
        gh = np.asarray(out_gh, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "i": pa.array(out_i, pa.int64()),
            "gh": pa.array(gh, pa.int64()),
            "pg": pa.array(gh % gh_parts, pa.int64()),
        })

    windows = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")

    # exchange 1: gh-partitioned fold + covered-start emission, fully
    # vectorized per PARTITION (the partition_pairs discipline)
    def covered_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        gh = g["gh"].to_numpy(np.int64)
        if not len(gh):  # typed empty (review finding: the lexsort
            return pd.DataFrame({  # segment math needs >=1 row)
                "doc_id": pd.Series([], dtype="int64"),
                "i": pd.Series([], dtype="int64")})
        did = g["doc_id"].to_numpy(np.int64)
        ii = g["i"].to_numpy(np.int64)
        order = np.lexsort((did, gh))
        ghs, dids, iis = gh[order], did[order], ii[order]
        new_seg = np.concatenate([[True], ghs[1:] != ghs[:-1]])
        seg = np.cumsum(new_seg) - 1
        n_seg = int(seg[-1]) + 1
        # distinct docs per gram: did changes within a segment
        d_new = new_seg | np.concatenate([[True], dids[1:] != dids[:-1]])
        n_dist = np.zeros(n_seg, np.int64)
        np.add.at(n_dist, seg, d_new.astype(np.int64))
        owner = dids[new_seg]          # min doc id per segment (sorted)
        keep = (n_dist[seg] >= 2) & (dids > owner[seg])
        return pd.DataFrame({
            "doc_id": pd.Series(dids[keep], dtype="int64"),
            "i": pd.Series(iis[keep], dtype="int64"),
        })

    cov = (windows.groupby("pg")
           .map_groups(covered_in_partition, batch_format="pandas"))

    # exchange 2: union text rows with covered rows and rebuild per
    # doc-partition — one group sees a doc's text AND its starts
    def as_cov_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        did = t["doc_id"].combine_chunks().cast(pa.int64())
        return pa.table({
            "doc_id": did,
            "i": t["i"].combine_chunks().cast(pa.int64()),
            "text": pa.nulls(len(t), pa.large_string()),
            "pd_": dd._pmod(did, doc_parts),
        })

    def as_text_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        did = t["doc_id"].combine_chunks().cast(pa.int64())
        return pa.table({
            "doc_id": did,
            "i": pa.array([-1] * len(t), pa.int64()),
            "text": t["text"].combine_chunks().cast(pa.large_string()),
            "pd_": dd._pmod(did, doc_parts),
        })

    unioned = (docs.select_columns(["doc_id", "text"])
               .map_batches(as_text_rows, batch_format="pyarrow")
               .union(cov.map_batches(as_cov_rows,
                                      batch_format="pyarrow")))

    def rebuild_partition(g: pd.DataFrame) -> pa.Table:
        out_id, out_n, out_rm, out_txt = [], [], [], []
        is_text = g["i"].to_numpy() < 0
        texts = dict(zip(g.loc[is_text, "doc_id"].astype("int64"),
                         g.loc[is_text, "text"]))
        starts: dict[int, list[int]] = {}
        for d, i in zip(g.loc[~is_text, "doc_id"].astype("int64"),
                        g.loc[~is_text, "i"].astype("int64")):
            starts.setdefault(int(d), []).append(int(i))
        for did, t in texts.items():
            words = (t or "").split(" ")
            covered = np.zeros(len(words), bool)
            for i in starts.get(did, ()):
                covered[i:i + NGRAM_N] = True
            out_id.append(int(did))
            out_n.append(len(words))
            out_rm.append(int(covered.sum()))
            out_txt.append(" ".join(w for w, c in zip(words, covered)
                                    if not c))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_words": pa.array(out_n, pa.int64()),
            "n_removed": pa.array(out_rm, pa.int64()),
            "clean_text": pa.array(out_txt, pa.string()),
        })

    return (unioned.groupby("pd_")
            .map_groups(rebuild_partition, batch_format="pandas"))


def dup_span_strip_sql() -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(NGRAM_N))
    gram = gram.replace("w[i+0]", "w[i]")
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), dw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM all_docs
), grams AS (
  SELECT doc_id, i, {gram} AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {NGRAM_N - 2})) AS i
        FROM dw WHERE len(w) >= {NGRAM_N})
), gd AS (
  SELECT g, min(doc_id) AS own FROM grams
  GROUP BY g HAVING count(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT grams.doc_id,
         unnest(range(i, i + {NGRAM_N})) AS p
  FROM grams JOIN gd USING (g) WHERE gd.own < grams.doc_id
), pos AS (
  SELECT doc_id, unnest(range(1, len(w) + 1)) AS p,
         unnest(w) AS word
  FROM dw
), kept AS (
  SELECT pos.doc_id,
         coalesce(string_agg(word, ' ' ORDER BY pos.p)
                  FILTER (WHERE cov.p IS NULL), '') AS clean_text,
         count(*) FILTER (WHERE cov.p IS NOT NULL) AS n_removed
  FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
  GROUP BY pos.doc_id
)
SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
       CAST(k.n_removed AS BIGINT) AS n_removed, k.clean_text
FROM dw d JOIN kept k ON k.doc_id = d.doc_id"""


STRATUM_RATE_PCT = {"en": 10}  # default stratum rate below
STRATUM_DEFAULT_PCT = 50


def stratified_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic stratified sampling: keep ``rate(lang)`` percent of
    each language stratum by multiplicative id hash (downsample the
    dominant language, keep the tail) — the training-data rebalancing
    operator. Exactly reproducible in SQL."""
    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.uint64)
        h = (ids * SPLIT_HASH_MULT) % SPLIT_MOD
        langs = batch["lang"].to_pylist()
        rates = np.fromiter(
            (STRATUM_RATE_PCT.get(la, STRATUM_DEFAULT_PCT) for la in langs),
            np.int64, len(langs))
        mask = h < (rates * (SPLIT_MOD // 100)).astype(np.uint64)
        return batch.filter(pa.array(mask))

    return (_docs(sf_dir, ["doc_id", "lang"])
            .map_batches(keep, batch_format="pyarrow"))


def stratified_sample_sql() -> str:
    h = f"(doc_id * {SPLIT_HASH_MULT}) % {SPLIT_MOD}"
    cases = " ".join(f"WHEN '{la}' THEN {pct}"
                     for la, pct in STRATUM_RATE_PCT.items())
    return f"""
SELECT doc_id, lang FROM documents
WHERE {h} < (CASE lang {cases} ELSE {STRATUM_DEFAULT_PCT} END)
          * {SPLIT_MOD // 100}"""


def sample_k_per_lang(sf_dir: str, k: int = 25, seed: int = 7) -> rd.Dataset:
    """EXACT-k-per-group deterministic sample (balanced subset builder:
    "give me k docs per language, reproducibly"): rank = stable hash of
    (seed, doc_id), keep each language's k smallest. Distributed shape
    is the partial-top-k combiner — every batch reduces to <= k rows
    per language present, ONE tiny groupby(lang) merges partials — so
    the exchange carries O(langs * k) rows, never the corpus. The
    rate-based sibling (``stratified_sample``) can't hit an exact k."""
    from ..functions.hashing import stable_hash64

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch["doc_id"].to_pylist(),
            "lang": batch["lang"].to_pylist(),
        })
        df["h"] = [stable_hash64(f"sample:{seed}:{d}")
                   for d in df["doc_id"]]
        df = (df.sort_values(["lang", "h", "doc_id"])
                .groupby("lang", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["h", "doc_id"]).head(k)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "lang": pa.array(g["lang"].tolist(), pa.string()),
        })

    return (_docs(sf_dir, ["doc_id", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang").map_groups(merge, batch_format="pandas"))


def sample_k_per_lang_sql(k: int = 25, seed: int = 7) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         sha256('sample:{seed}:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
), hv AS (
  SELECT doc_id, lang, {_sql_hash64("hx")} AS h FROM d
)
SELECT doc_id, lang FROM hv
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= {k}"""


def lang_balance_sample(sf_dir: str) -> rd.Dataset:
    """Mixture-REBALANCING sampler (the data-mixing operator: resample a
    skewed crawl to uniform per-language shares, DoReMi/Pile-style
    mixture weighting with uniform targets): unlike
    ``stratified_sample``'s fixed rates, the keep rate per language is
    derived from the corpus itself — rate(lang) = min_count / count(lang)
    — so the expected sampled mix is uniform whatever the input skew.

    Scale shape: phase 1 is a tiny groupby(lang) count (combiner-sized,
    O(langs) rows to the driver); phase 2 is a pure map-side filter —
    keep iff stable_hash64('mix:'+doc_id) % 2^20 < thr(lang), with
    thr = (min_count << 20) // count computed in PURE INTEGER arithmetic
    so the SQL oracle bit-matches. The corpus itself is never shuffled
    and passes exactly once."""
    from ..functions.hashing import stable_hash64

    ds = _docs(sf_dir, ["doc_id", "lang"])
    counts = {r["lang"]: int(r["count()"])
              for r in ds.groupby("lang").count().take_all()}
    if not counts:
        return ds
    minn = min(counts.values())
    thr = {lg: (minn << 20) // c for lg, c in counts.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        h = np.fromiter((stable_hash64(f"mix:{d}") for d in ids),
                        np.uint64, len(ids))
        t = np.fromiter((thr[lg] for lg in langs), np.int64, len(langs))
        mask = (h % np.uint64(1 << 20)).astype(np.int64) < t
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def lang_balance_sample_sql() -> str:
    return f"""
WITH n AS (
  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
), m AS (
  SELECT min(cnt) AS minn FROM n
), thr AS (
  SELECT lang, (minn * 1048576) // cnt AS t FROM n CROSS JOIN m
), hx AS (
  SELECT doc_id, lang, sha256('mix:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT d.doc_id, d.lang
FROM hx d JOIN thr ON thr.lang = d.lang
WHERE CAST({_sql_hash64("d.h")} % 1048576 AS BIGINT) < thr.t"""


def _fnv1a_word(word: str) -> int:
    """FNV-1a 32-bit over codepoints (== bytes on this ASCII corpus;
    lockstep with the DuckDB list_reduce replica in dsir_select_sql)."""
    h = 2166136261
    for ch in word:
        h = ((h ^ ord(ch)) * 16777619) % 4294967296
    return h


# Per-worker word→bucket memo for the DSIR passes (task-mode module
# state, like stages/embed.py's model singleton): distinct words are a
# tiny fraction of token volume, so memoizing the Python FNV loop turns
# the hot path into one dict hit per token. Capped so a 100-TB crawl's
# long-tail vocabulary can't grow a worker's heap unboundedly — misses
# past the cap just recompute.
_DSIR_BUCKET_CACHE: dict[int, dict[str, int]] = {}
_DSIR_CACHE_CAP = 1 << 20


def _dsir_word_buckets(text: str | None, B: int) -> "np.ndarray":
    """Bucket index per word of ``text`` (empty words dropped), memoized."""
    cache = _DSIR_BUCKET_CACHE.setdefault(B, {})
    out = []
    for w in (text or "").split(" "):
        if not w:
            continue
        b = cache.get(w)
        if b is None:
            b = _fnv1a_word(w) % B
            if len(cache) < _DSIR_CACHE_CAP:
                cache[w] = b
        out.append(b)
    return np.fromiter(out, np.int64, len(out))


def dsir_select(sf_dir: str, n_buckets: int = 64,
                target_lang: str = "en", frac: float = 0.25) -> rd.Dataset:
    """DSIR — Data Selection with Importance Resampling (Xie et al.,
    NeurIPS 2023): score every raw document by how much its hashed
    word-unigram profile looks like a small TARGET domain (here: the
    ``lang = target_lang`` slice), then keep the top ``frac`` fraction.

    Exactness design: the per-bucket log-likelihood-ratio score
    ``ln((c_tgt+1)/(T+B)) - ln((c_raw+1)/(R+B))`` is quantized ONCE to
    an integer (``floor(1e6*x + 0.5)``), so every per-document weight
    is a pure BIGINT dot product and selection ties break on doc_id —
    bit-exact against the DuckDB oracle (float enters only in the one
    rounded constant per bucket, margin ~1e-9 vs the 0.5 boundary).

    Scale shape (three passes, no all-to-all over documents):
      1. combiner pass — each block folds its words into <= B+1 partial
         rows (bucket, c_tgt, c_raw); one tiny groupby(bucket) and the
         B-row table lands on the driver (B = ``n_buckets``).
      2. weight pass — broadcast the B-entry integer score vector
         (``ray.put``), map-side dot product per document.
      3. threshold pass — sparse (weight, count) histogram picks the
         K-th weight; boundary ties resolve by the m smallest doc_ids
         AT the threshold via sort+limit+max on that (small) slice
         only. Driver holds O(distinct weights) + O(1).
    """
    import math

    import ray

    B = n_buckets
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def bucket_counts(texts: list[str | None]) -> "np.ndarray":
        c = np.zeros(B, np.int64)
        for t in texts:
            bs = _dsir_word_buckets(t, B)
            if len(bs):
                c += np.bincount(bs, minlength=B)
        return c

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        raw = bucket_counts(texts)
        tgt = bucket_counts([t for t, l in zip(texts, langs)
                             if l == target_lang])
        return pa.table({
            "bucket": pa.array(list(range(B)) + [-1], pa.int64()),
            "c_tgt": pa.array(list(tgt) + [0], pa.int64()),
            "c_raw": pa.array(list(raw) + [len(texts)], pa.int64()),
        })

    folded = {r["bucket"]: (r["c_tgt"], r["c_raw"])
              for r in docs.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Sum("c_tgt", alias_name="c_tgt"),
                         Sum("c_raw", alias_name="c_raw"))
              .take_all()}
    n_docs = folded.pop(-1)[1]
    T = sum(ct for ct, _ in folded.values())
    R = sum(cr for _, cr in folded.values())
    s_int = np.zeros(B, np.int64)
    for b in range(B):
        ct, cr = folded.get(b, (0, 0))
        x = (math.log(ct + 1) - math.log(cr + 1)
             - math.log(T + B) + math.log(R + B))
        s_int[b] = math.floor(1_000_000 * x + 0.5)
    s_ref = ray.put(s_int)
    k_sel = math.ceil(frac * n_docs)

    def weigh(batch: pa.Table) -> pa.Table:
        s = ray.get(s_ref)
        ws = []
        for t in batch["text"].to_pylist():
            bs = _dsir_word_buckets(t, B)
            ws.append(int(s[bs].sum()) if len(bs) else 0)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "weight": pa.array(ws, pa.int64()),
        })

    # weights fan out to histogram + tie-slice + final flag: a 2-int
    # column table, so pinning it is the bounded branch-point cache.
    wts = docs.map_batches(weigh, batch_format="pyarrow").materialize()

    hist = sorted(
        ((r["weight"], r["n"]) for r in
         wts.groupby("weight").aggregate(Count(alias_name="n")).take_all()),
        key=lambda x: -x[0])
    cum, thresh, m_at = 0, None, 0
    for w, n in hist:
        if cum + n >= k_sel:
            thresh, m_at = w, k_sel - cum
            break
        cum += n
    if thresh is None:       # frac >= 1: everything selected
        thresh, m_at = hist[-1][0], hist[-1][1]

    import pyarrow.compute as pc
    # the m_at-th smallest doc_id AT the threshold weight: sort+limit
    # streams distributed and the Max aggregate returns ONE scalar —
    # the tie slice is never pulled to the driver (on a degenerate
    # corpus where a large fraction of docs share the threshold
    # weight, m_at can be ~frac*N rows)
    ties = wts.filter(expr=f"weight == {thresh}").sort("doc_id").limit(m_at)
    tie_cutoff = ties.max("doc_id") if m_at > 0 else -1

    def flag(batch: pa.Table) -> pa.Table:
        w = batch["weight"].combine_chunks()
        d = batch["doc_id"].combine_chunks()
        sel = pc.or_(pc.greater(w, thresh),
                     pc.and_(pc.equal(w, thresh),
                             pc.less_equal(d, tie_cutoff)))
        return pa.table({"doc_id": d, "weight": w, "selected": sel})

    return wts.map_batches(flag, batch_format="pyarrow")


def dsir_select_sql(n_buckets: int = 64, target_lang: str = "en",
                    frac: float = 0.25) -> str:
    """Value-exact DuckDB replica of dsir_select: FNV-1a 32-bit word
    hash via list_reduce, the same integer-quantized per-bucket score,
    BIGINT dot product, row_number selection with doc_id tie-break."""
    B = n_buckets
    fnv = ("list_reduce(list_prepend(2166136261::UBIGINT, "
           "list_transform(range(1, length(w) + 1), "
           "i -> unicode(substr(w, i, 1))::UBIGINT)), "
           "(h, c) -> (xor(h, c) * 16777619) % 4294967296)")
    return f"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
), wb AS (
  SELECT doc_id, lang, CAST({fnv} % {B} AS BIGINT) AS b
  FROM words WHERE w <> ''
), raw AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM wb GROUP BY b
), tgt AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM wb
  WHERE lang = '{target_lang}' GROUP BY b
), tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM tgt) AS t_total,
         (SELECT coalesce(sum(c), 0) FROM raw) AS r_total
), s AS (
  SELECT r.b,
         CAST(floor(1000000 * (ln(coalesce(t.c, 0) + 1) - ln(r.c + 1)
                               - ln(t_total + {B}) + ln(r_total + {B}))
                    + 0.5) AS BIGINT) AS s
  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tot
), dw AS (
  SELECT d.doc_id, CAST(coalesce(sum(s.s), 0) AS BIGINT) AS weight
  FROM documents d
  LEFT JOIN wb ON wb.doc_id = d.doc_id
  LEFT JOIN s ON s.b = wb.b
  GROUP BY d.doc_id
), rk AS (
  SELECT doc_id, weight,
         row_number() OVER (ORDER BY weight DESC, doc_id) AS r
  FROM dw
)
SELECT doc_id, weight,
       (r <= (SELECT CAST(ceil({frac} * count(*)) AS BIGINT)
              FROM documents)) AS selected
FROM rk"""


def nb_lang_classify(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Multinomial Naive Bayes language classifier, trained AND applied
    in one job — the trained-model counterpart of the heuristic
    ``lang_id`` (and the statistical sibling of the M8/M9 rule
    classifiers): the standard fastText-shaped "train a tiny text
    classifier on weak labels, score the corpus" curation stage.

    Train = ONE combiner pass: each block folds its words into
    <= L*(B+1) partial rows (lang, bucket, count) + per-lang doc
    counts; one tiny ``groupby((lang, bucket))`` lands the L x B count
    table on the driver (L = distinct langs, B = ``n_buckets`` — KB,
    never documents). Per-class bucket log-probs and priors are
    quantized ONCE to integers (``floor(1e6*x + 0.5)``, the
    dsir_select exactness pattern), so inference is a pure BIGINT
    matvec: ``score_l = prior_l + sum_b cnt_b * s[l,b]``, pred =
    argmax (tie -> lexicographically smallest lang) — bit-exact vs the
    DuckDB oracle, float entering only in the L*(B+1) rounded
    constants (boundary margin asserted in tests).

    Inference = ONE broadcast (``ray.put`` of the L x B int matrix) +
    map-side dot products — no shuffle over documents at all.
    Returns (doc_id, lang, pred_lang)."""
    import math

    import ray

    B = n_buckets
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        acc: dict[str, np.ndarray] = {}
        nd: dict[str, int] = {}
        for t, lg in zip(texts, langs):
            a = acc.get(lg)
            if a is None:
                a = acc[lg] = np.zeros(B, np.int64)
                nd[lg] = 0
            nd[lg] += 1
            bs = _dsir_word_buckets(t, B)
            if len(bs):
                a += np.bincount(bs, minlength=B)
        out_l: list[str] = []
        out_b: list[int] = []
        out_c: list[int] = []
        for lg, a in acc.items():
            nz = np.nonzero(a)[0]
            out_l.extend([lg] * (len(nz) + 1))
            out_b.extend(nz.tolist() + [-1])          # -1 = doc count row
            out_c.extend(a[nz].tolist() + [nd[lg]])
        return pa.table({"lang": pa.array(out_l, pa.string()),
                         "bucket": pa.array(out_b, pa.int64()),
                         "c": pa.array(out_c, pa.int64())})

    rows = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "bucket"])
            .aggregate(Sum("c", alias_name="c"))
            .take_all())
    counts: dict[str, np.ndarray] = {}
    nd: dict[str, int] = {}
    for r in rows:
        if r["bucket"] == -1:
            nd[r["lang"]] = int(r["c"])
        else:
            counts.setdefault(r["lang"],
                              np.zeros(B, np.int64))[r["bucket"]] = int(r["c"])
    langs_sorted = sorted(nd)
    n_all, n_cls = sum(nd.values()), len(langs_sorted)
    smat = np.zeros((n_cls, B), np.int64)
    prior = np.zeros(n_cls, np.int64)
    for i, lg in enumerate(langs_sorted):
        c = counts.get(lg, np.zeros(B, np.int64))
        tot = int(c.sum())
        for b in range(B):
            x = math.log(int(c[b]) + 1) - math.log(tot + B)
            smat[i, b] = math.floor(1_000_000 * x + 0.5)
        prior[i] = math.floor(
            1_000_000 * (math.log(nd[lg] + 1) - math.log(n_all + n_cls))
            + 0.5)
    ref = ray.put((smat, prior, langs_sorted))

    def classify(batch: pa.Table) -> pa.Table:
        sm, pr, ls = ray.get(ref)
        preds = []
        for t in batch["text"].to_pylist():
            bs = _dsir_word_buckets(t, B)
            if len(bs):
                cnt = np.bincount(bs, minlength=B)
                scores = pr + sm @ cnt
            else:
                scores = pr
            # first max == smallest index == lang ASC (sorted above) —
            # the oracle's ORDER BY score DESC, lang tie-break
            preds.append(ls[int(np.argmax(scores))])
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "lang": batch["lang"].combine_chunks(),
            "pred_lang": pa.array(preds, pa.string()),
        })

    return docs.map_batches(classify, batch_format="pyarrow")


def nb_lang_classify_sql(n_buckets: int = 64) -> str:
    """Value-exact DuckDB replica of nb_lang_classify: same FNV-1a word
    buckets as dsir_select_sql, the training counts re-derived in SQL,
    the SAME integer quantization of log-probs/priors, BIGINT doc
    scores, argmax via row_number (score DESC, lang ASC)."""
    B = n_buckets
    fnv = ("list_reduce(list_prepend(2166136261::UBIGINT, "
           "list_transform(range(1, length(w) + 1), "
           "i -> unicode(substr(w, i, 1))::UBIGINT)), "
           "(h, c) -> (xor(h, c) * 16777619) % 4294967296)")
    return f"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
), wb AS (
  SELECT doc_id, lang, CAST({fnv} % {B} AS BIGINT) AS b
  FROM words WHERE w <> ''
), cls AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY lang
), consts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_all,
         (SELECT CAST(count(*) AS BIGINT) FROM cls) AS n_cls
), cb AS (
  SELECT lang, b, CAST(count(*) AS BIGINT) AS c FROM wb GROUP BY lang, b
), tot AS (
  SELECT cls.lang, CAST(coalesce(sum(cb.c), 0) AS BIGINT) AS t
  FROM cls LEFT JOIN cb USING (lang) GROUP BY cls.lang
), grid AS (
  SELECT cls.lang, CAST(r.range AS BIGINT) AS b
  FROM cls CROSS JOIN range(0, {B}) r
), s AS (
  SELECT g.lang, g.b,
         CAST(floor(1000000 * (ln(coalesce(cb.c, 0) + 1) - ln(t.t + {B}))
                    + 0.5) AS BIGINT) AS s
  FROM grid g
  LEFT JOIN cb ON cb.lang = g.lang AND cb.b = g.b
  JOIN tot t ON t.lang = g.lang
), prior AS (
  SELECT cls.lang,
         CAST(floor(1000000 * (ln(nd + 1) - ln(n_all + n_cls)) + 0.5)
              AS BIGINT) AS p
  FROM cls CROSS JOIN consts
), dbc AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM wb
  GROUP BY doc_id, b
), score AS (
  SELECT d.doc_id, pr.lang,
         pr.p + CAST(coalesce(sum(dbc.c * s.s), 0) AS BIGINT) AS sc
  FROM documents d CROSS JOIN prior pr
  LEFT JOIN dbc ON dbc.doc_id = d.doc_id
  LEFT JOIN s ON s.lang = pr.lang AND s.b = dbc.b
  GROUP BY d.doc_id, pr.lang, pr.p
), pred AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sc DESC, lang) AS rn
  FROM score
)
SELECT d.doc_id, d.lang, p.lang AS pred_lang
FROM documents d JOIN pred p ON p.doc_id = d.doc_id AND p.rn = 1"""


def heavy_hitter_terms(sf_dir: str, k: int = 20) -> pa.Table:
    """Exact top-k corpus terms via the two-pass Misra–Gries heavy-
    hitters pattern (stages/sketch.py:heavy_hitters): bounded-memory
    sketch pass → candidate recount pass — the scale shape when the
    vocabulary outgrows a full wordcount groupby."""
    from ..stages.sketch import heavy_hitters

    def tokens_of(batch: pa.Table):
        for text in batch["text"].to_pylist():
            yield from (text or "").split(" ")

    return heavy_hitters(_docs(sf_dir, ["text"]), "word", k=k,
                         values_of=tokens_of)


def heavy_hitter_terms_sql(k: int = 20) -> str:
    return f"""
SELECT word, n FROM (
  SELECT word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
) ORDER BY n DESC, word LIMIT {k}"""


def tfidf_top_terms(sf_dir: str, top: int = 3,
                    num_partitions: int = 32) -> rd.Dataset:
    """Integer TF-IDF: per-doc top terms ranked by
    ``count * ((N_docs * 1000) // doc_freq)`` — all-integer scoring so
    Ray and SQL agree bit-for-bit (a float idf would hang the compare on
    libm ulps). Two keyed shuffles, both partition-wise cogroups:
    word-keyed (doc-frequency + scoring local to each word partition)
    then doc-keyed (top-k per doc)."""
    from collections import Counter

    from ..functions.hashing import stable_hash64

    P = num_partitions
    n_docs = _docs(sf_dir, ["doc_id"]).count()

    def term_rows(batch: pa.Table) -> pa.Table:
        ids_o, words_o, c_o, p_o = [], [], [], []
        for doc, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            counts = Counter((text or "").split(" "))
            for w in sorted(counts):
                ids_o.append(doc)
                words_o.append(w)
                c_o.append(counts[w])
                p_o.append(stable_hash64(w) % P)
        return pa.table({
            "doc_id": pa.array(ids_o, pa.int64()),
            "word": pa.array(words_o, pa.string()),
            "c": pa.array(c_o, pa.int64()),
            "p": pa.array(p_o, pa.int64()),
        })

    def score_partition(g: pd.DataFrame) -> pa.Table:
        # every row of a word lands in this partition, so doc_freq is a
        # local groupby; rows are (doc, word)-unique by construction
        df_map = g.groupby("word")["doc_id"].size()
        idf = (n_docs * 1000) // df_map
        score = g["c"].to_numpy(np.int64) * idf[g["word"]].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "word": pa.array(g["word"].tolist(), pa.string()),
            "score": pa.array(score, pa.int64()),
            "p2": pa.array(g["doc_id"].to_numpy(np.int64) % P, pa.int64()),
        })

    def topk_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "score", "word"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = g.groupby("doc_id").cumcount() + 1
        out = g[g["rank"] <= top]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "word": pa.array(out["word"].tolist(), pa.string()),
            "score": pa.array(out["score"].to_numpy(np.int64)),
            "rank": pa.array(out["rank"].to_numpy(np.int64)),
        })

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(term_rows, batch_format="pyarrow")
            .groupby("p").map_groups(score_partition, batch_format="pandas")
            .groupby("p2").map_groups(topk_partition, batch_format="pandas"))


def tfidf_top_terms_sql(top: int = 3) -> str:
    return f"""
WITH tc AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
), df AS (SELECT word, count(*) AS d FROM tc GROUP BY word),
n AS (SELECT count(*) AS nn FROM documents),
scored AS (
  SELECT tc.doc_id, tc.word, tc.c * ((n.nn * 1000) // df.d) AS score
  FROM tc JOIN df USING (word) CROSS JOIN n
), ranked AS (
  SELECT doc_id, word, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, word) AS rank
  FROM scored
)
SELECT doc_id, word, CAST(score AS BIGINT) AS score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top}"""


def lm_doc_scores(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Corpus-LM document scoring — the CCNet-style two-phase shape
    (Wenzek et al. 2020: train an LM on the corpus, score every doc)
    with an integer bigram model so Ray and SQL agree bit-for-bit:
    ``score(doc) = Σ k(a,b|doc) * ((1e6 * c(a,b)) // c(a·))`` where
    c(a,b) is the corpus bigram count and c(a·) the corpus prefix
    count. High score = phrasing the corpus has seen before (fluent /
    templated); low = out-of-distribution text — the perplexity-filter
    analog without float logs.

    ONE word-keyed shuffle does both model build and scoring: rows
    partition by hash(prefix word), so c(a,b) and c(a·) are LOCAL
    groupby-sums inside each partition — no broadcast LM, no second
    model join; then a doc-keyed groupby folds term scores. Scales as
    two keyed exchanges of (doc, gram, count) rows."""
    from collections import Counter

    from ..functions.hashing import stable_hash64

    P = num_partitions

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids_o, a_o, b_o, k_o, p_o = [], [], [], [], []
        for doc, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            words = (text or "").split(" ")
            counts = Counter(zip(words, words[1:]))
            for a, b in sorted(counts):
                ids_o.append(doc)
                a_o.append(a)
                b_o.append(b)
                k_o.append(counts[(a, b)])
                p_o.append(stable_hash64(a) % P)
        return pa.table({
            "doc_id": pa.array(ids_o, pa.int64()),
            "a": pa.array(a_o, pa.string()),
            "b": pa.array(b_o, pa.string()),
            "k": pa.array(k_o, pa.int64()),
            "p": pa.array(p_o, pa.int64()),
        })

    def score_partition(g: pd.DataFrame) -> pa.Table:
        # every bigram with prefix a lands here → corpus counts are
        # partition-local sums
        c_ab = g.groupby(["a", "b"])["k"].transform("sum").to_numpy(np.int64)
        c_a = g.groupby("a")["k"].transform("sum").to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        s = k * ((1_000_000 * c_ab) // c_a)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "k": pa.array(k),
            "s": pa.array(s),
        })

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(gram_rows, batch_format="pyarrow")
            .groupby("p").map_groups(score_partition, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(Sum("k", alias_name="n_bigrams"),
                       Sum("s", alias_name="lm_score")))


BM25_QUERIES = {  # fixed query workload for the search operator
    1: ("hash", "join"),
    2: ("window", "sort", "merge"),
    3: ("fast", "scan", "customer"),
}
BM25_TOPK = 10


def bm25_topk(sf_dir: str) -> rd.Dataset:
    """Full-text search: BM25 top-k documents per query, all-integer
    scoring (Robertson/Sparck-Jones BM25 with k1=1.2, b=0.75 as exact
    rationals — multiplying through by the corpus token count T turns
    the length normalization into integer arithmetic, so Ray and SQL
    agree bit-for-bit; magnitudes stay < 2^60 for corpora ≤ ~1e9 docs):

      idf(w)   = (N*1000) // df(w)
      s(w,doc) = (idf * 22*tf*T) // (T*(10*tf + 3) + 9*dl*N)

    Shape: pass A is a combiner that reduces to (N, T, df per QUERY
    term) — a handful of integers on the driver, pruned to query terms
    before the shuffle; pass B scores each doc against the broadcast
    stats and keeps a per-batch partial top-k per query, merged by one
    tiny groupby(query_id) — the ANN top-k pattern over an inverted
    scoring kernel, no per-doc shuffle of the corpus."""
    return _bm25_scan(_docs(sf_dir, ["doc_id", "text"]),
                      BM25_QUERIES, BM25_TOPK)


def _bm25_scan(docs: rd.Dataset, queries: dict[int, tuple],
               topk: int, exclude_self: bool = False) -> rd.Dataset:
    """The bm25_topk kernel over a caller-supplied query dict —
    reused by mlt_related_docs, whose queries are DERIVED (per-doc
    TF-IDF top terms) rather than fixed; ``exclude_self`` skips the
    doc whose id equals the query id (the more-like-this convention:
    the query document trivially ranks first on its own terms)."""
    from collections import Counter

    import ray

    qterms = sorted({w for q in queries.values() for w in q})

    def stats_partial(batch: pa.Table) -> pa.Table:
        n, tot = 0, 0
        df_c: Counter = Counter()
        for text in batch["text"].to_pylist():
            words = (text or "").split(" ")
            n += 1
            tot += len(words)
            ws = set(words)
            df_c.update(w for w in qterms if w in ws)
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "tot": pa.array([tot], pa.int64()),
            **{f"df_{w}": pa.array([df_c[w]], pa.int64()) for w in qterms},
        })

    N, T = 0, 0
    df_map: Counter = Counter()
    for b in (docs.map_batches(stats_partial, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
        N += int(pa.compute.sum(b["n"]).as_py())
        T += int(pa.compute.sum(b["tot"]).as_py())
        for w in qterms:
            df_map[w] += int(pa.compute.sum(b[f"df_{w}"]).as_py())
    stats_ref = ray.put((N, T, dict(df_map)))

    def score_batch(batch: pa.Table) -> pa.Table:
        n_, t_, df_ = ray.get(stats_ref)
        q_o, d_o, s_o = [], [], []
        per_q: dict[int, list[tuple[int, int]]] = {q: []
                                                   for q in queries}
        for doc, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            words = (text or "").split(" ")
            dl = len(words)
            tf = Counter(words)
            for qid, terms in queries.items():
                if exclude_self and doc == qid:
                    continue
                s = 0
                for w in terms:
                    t = tf.get(w, 0)
                    if t == 0 or df_.get(w, 0) == 0:
                        continue
                    idf = (n_ * 1000) // df_[w]
                    s += (idf * 22 * t * t_) // (t_ * (10 * t + 3)
                                                 + 9 * dl * n_)
                if s > 0:
                    per_q[qid].append((s, doc))
        for qid, cand in per_q.items():
            cand.sort(key=lambda x: (-x[0], x[1]))
            for s, doc in cand[:topk]:
                q_o.append(qid)
                d_o.append(doc)
                s_o.append(s)
        return pa.table({
            "query_id": pa.array(q_o, pa.int64()),
            "doc_id": pa.array(d_o, pa.int64()),
            "score": pa.array(s_o, pa.int64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        scores = np.asarray(group["score"].to_pylist(), dtype=np.int64)
        ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, -scores))[:topk]
        return pa.table({
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score": pa.array(scores[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return (docs.map_batches(score_batch, batch_format="pyarrow")
            .groupby("query_id").map_groups(merge, batch_format="pyarrow"))


def bm25_topk_indexed(sf_dir: str) -> rd.Dataset:
    """Index-backed BM25 — the search SCALE path: queries read ONLY the
    ``part=K/`` postings partitions their terms hash into (touch
    fraction ~|terms|/P of storage) instead of streaming the corpus as
    ``bm25_topk`` does. Value-identical to the scan path (same integer
    kernel over the same stats), so it shares the DuckDB oracle — the
    gate proves index build + pruned probe lose nothing."""
    import tempfile

    from ..sources.corpus import _input_digest
    from ..stages import textindex as ti

    index_dir = os.path.join(tempfile.gettempdir(), "pdf_extraction_ray",
                             "textindex",
                             f"{os.path.basename(sf_dir)}-{_input_digest(sf_dir)}")
    ti.ensure_inverted_index(_docs(sf_dir, ["doc_id", "text"]), index_dir,
                             stamp_ds=_docs(sf_dir, ["doc_id"]))
    return ti.bm25_topk_indexed(index_dir, BM25_QUERIES, BM25_TOPK)


def bm25_topk_sql(src: str = "documents") -> str:
    return f"""
WITH q AS ({_bm25_queries_values_sql()}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM {src}),
tc AS (
  SELECT doc_id, word, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS word FROM w)
  GROUP BY doc_id, word
), dl AS (SELECT doc_id, len(w) AS dl FROM w),
n AS (SELECT count(*) AS n, sum(len(w)) AS t FROM w),
df AS (SELECT word, count(*) AS df FROM tc
       WHERE word IN (SELECT word FROM q) GROUP BY word),
terms AS (
  SELECT q.query_id, tc.doc_id,
         (((n.n * 1000) // df.df) * 22 * tc.tf * n.t)
           // (n.t * (10 * tc.tf + 3) + 9 * dl.dl * n.n) AS s
  FROM q JOIN tc USING (word) JOIN df USING (word)
  JOIN dl ON tc.doc_id = dl.doc_id CROSS JOIN n
), scored AS (
  SELECT query_id, doc_id, sum(s) AS score
  FROM terms GROUP BY query_id, doc_id HAVING sum(s) > 0
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, CAST(score AS BIGINT) AS score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {BM25_TOPK}"""


RANK_BLEND_SCALE = 1_000_000   # pagerank's own scale: boost = 1 + rank/scale


def search_ranked(sf_dir: str) -> rd.Dataset:
    """Retrieve-then-rerank — the classic web-search ranking
    composition (text relevance × link centrality, the blend behind
    every first-generation engine): stage 1 retrieves each query's
    BM25 top-k candidates (``bm25_topk``), stage 2 re-ranks them by
    blending the document's PageRank centrality over the planted link
    graph — blended = score·(scale + rank) // scale, a ≥1× integer
    boost growing with centrality (hub ranks exceed ``scale`` as mass
    concentrates), computed in PYTHON BIGINTS (BM25 scores reach 2^60
    by their own bound, so an int64 product would overflow; the
    candidate set is k·|queries| rows). Returns (query_id, doc_id,
    score, centrality, blended, final_rank).

    Shape: the candidate table is TINY by construction (top-k per
    query), so it broadcasts through ONE ids-only hash_join against
    the per-doc rank table and one per-query re-rank groupby — the
    rerank never touches the corpus again. Composes two whole oracle
    families (the discovery_frontier pattern)."""
    from ..stages.joins import hash_join

    cand = bm25_topk(sf_dir).materialize()
    ranks = pagerank_docs(sf_dir)

    joined = hash_join(cand, ranks, "doc_id", "doc_id",
                       ["query_id", "doc_id", "score"], ["rank"],
                       how="inner")

    def rerank(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        ids = group["doc_id"].to_pylist()
        sc = group["score"].to_pylist()
        ce = group["rank"].to_pylist()
        blended = [(int(s) * (RANK_BLEND_SCALE + int(c)))
                   // RANK_BLEND_SCALE for s, c in zip(sc, ce)]
        order = sorted(range(len(ids)), key=lambda i: (-blended[i], ids[i]))
        return pa.table({
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "doc_id": pa.array([ids[i] for i in order], pa.int64()),
            "score": pa.array([int(sc[i]) for i in order], pa.int64()),
            "centrality": pa.array([int(ce[i]) for i in order], pa.int64()),
            "blended": pa.array([blended[i] for i in order], pa.int64()),
            "final_rank": pa.array(range(1, len(order) + 1), pa.int64()),
        })

    return joined.groupby("query_id").map_groups(rerank,
                                                 batch_format="pyarrow")


def search_ranked_sql() -> str:
    """Both stage oracles composed as subquery CTEs (DuckDB allows a
    WITH inside a parenthesized subquery), HUGEINT blend product."""
    return f"""
WITH bm AS (SELECT * FROM ({bm25_topk_sql()})),
pr AS (SELECT * FROM ({pagerank_docs_sql()})),
j AS (
  SELECT bm.query_id, bm.doc_id, bm.score, pr.rank AS centrality,
         CAST(CAST(bm.score AS HUGEINT) * ({RANK_BLEND_SCALE} + pr.rank)
              // {RANK_BLEND_SCALE} AS BIGINT) AS blended
  FROM bm JOIN pr ON pr.doc_id = bm.doc_id
)
SELECT query_id, doc_id, score, centrality, blended,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY blended DESC, doc_id)
            AS BIGINT) AS final_rank
FROM j"""


def lm_doc_scores_sql() -> str:
    return """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> struct_pack(a := w[i], b := w[i+1]))) AS g
  FROM w
), tc AS (
  SELECT doc_id, g.a AS a, g.b AS b, count(*) AS k
  FROM pos GROUP BY doc_id, g.a, g.b
), cab AS (SELECT a, b, sum(k) AS c_ab FROM tc GROUP BY a, b),
ca AS (SELECT a, sum(k) AS c_a FROM tc GROUP BY a),
terms AS (
  SELECT tc.doc_id, tc.k,
         tc.k * ((1000000 * cab.c_ab) // ca.c_a) AS s
  FROM tc JOIN cab USING (a, b) JOIN ca USING (a)
)
SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
       CAST(sum(s) AS BIGINT) AS lm_score
FROM terms GROUP BY doc_id"""


def ccnet_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3: per
    language, order documents by LM perplexity and cut into terciles —
    'head' trains, 'tail' is usually dropped) over this engine's
    integer corpus-LM score: norm_score = lm_score // n_bigrams (the
    per-token-perplexity analog, BIGINT floor so SQL bit-matches), and
    the bucket is threshold-based — t_q = the SMALLEST norm score whose
    per-lang cumulative count reaches ceil(q·n) — so two equal-scoring
    docs always land in the same bucket (a pure rank split would tear
    ties across buckets and be unreproducible map-side).

    Shape: ``lm_doc_scores``'s two keyed exchanges (materialized once —
    hash_join probes schema and would re-run the LM lineage otherwise),
    ONE ids-only hash_join to attach lang, a sparse (lang, score,
    count) histogram fold for thresholds — driver state O(distinct
    scores), the accepted global_quantile_threshold bound — then a
    broadcast map-side tag. Docs with no bigram (empty/1-word text)
    have no LM score and are absent, as in CCNet. Output (doc_id,
    lang, norm_score, bucket)."""
    import ray

    from ..stages.joins import hash_join

    scored = lm_doc_scores(sf_dir).materialize()
    langs = _docs(sf_dir, ["doc_id", "lang"])
    with_lang = hash_join(scored, langs, "doc_id", "doc_id",
                          ["n_bigrams", "lm_score"], ["lang"], how="inner")

    def norm(t: pa.Table) -> pa.Table:
        ls = t["lm_score"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"].combine_chunks(),
                         "lang": t["lang"].combine_chunks(),
                         "norm_score": pa.array(ls // nb)})

    ns = with_lang.map_batches(norm, batch_format="pyarrow").materialize()

    hist: dict[str, dict[int, int]] = {}
    for b in (ns.groupby(["lang", "norm_score"]).count()
              .iter_batches(batch_format="pyarrow")):
        for lang, s, c in zip(b["lang"].to_pylist(),
                              b["norm_score"].to_pylist(),
                              b["count()"].to_pylist()):
            hist.setdefault(lang, {})[int(s)] = int(c)
    thr: dict[str, tuple[int, int]] = {}
    for lang, sc in hist.items():
        n = sum(sc.values())
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        cum, t1, t2 = 0, None, None
        for s in sorted(sc):
            cum += sc[s]
            if t1 is None and cum >= k1:
                t1 = s
            if t2 is None and cum >= k2:
                t2 = s
        thr[lang] = (t1, t2)
    tref = ray.put(thr)

    def tag(t: pa.Table) -> pa.Table:
        th = ray.get(tref)
        langs_v = t["lang"].to_pylist()
        s = t["norm_score"].to_numpy(zero_copy_only=False)
        t1 = np.fromiter((th[x][0] for x in langs_v), np.int64, len(langs_v))
        t2 = np.fromiter((th[x][1] for x in langs_v), np.int64, len(langs_v))
        bucket = np.where(s <= t1, "tail",
                          np.where(s <= t2, "middle", "head"))
        return t.append_column("bucket", pa.array(bucket.tolist(),
                                                  pa.string()))

    return ns.map_batches(tag, batch_format="pyarrow")


def ccnet_buckets_sql() -> str:
    """The LM-score CTEs + per-lang cumulative-count tercile thresholds
    (smallest score reaching ceil(q·n)) + the threshold CASE."""
    lm = lm_doc_scores_sql()
    body = lm.split("WITH", 1)[1].rsplit("SELECT", 1)[0].rstrip()
    return f"""
WITH {body},
scored AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS nb,
         CAST(sum(s) AS BIGINT) AS ls
  FROM terms GROUP BY doc_id
), ns AS MATERIALIZED (
  SELECT s.doc_id, d.lang, CAST(s.ls // s.nb AS BIGINT) AS norm_score
  FROM scored s JOIN documents d USING (doc_id)
), h AS (
  SELECT lang, norm_score, count(*) AS c FROM ns GROUP BY lang, norm_score
), cc AS MATERIALIZED (
  SELECT lang, norm_score,
         sum(c) OVER (PARTITION BY lang ORDER BY norm_score) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM h
), t1 AS (
  SELECT lang, min(norm_score) AS t FROM cc
  WHERE cum >= (n + 2) // 3 GROUP BY lang
), t2 AS (
  SELECT lang, min(norm_score) AS t FROM cc
  WHERE cum >= (2 * n + 2) // 3 GROUP BY lang
)
SELECT ns.doc_id, ns.lang, ns.norm_score,
       CASE WHEN ns.norm_score <= t1.t THEN 'tail'
            WHEN ns.norm_score <= t2.t THEN 'middle'
            ELSE 'head' END AS bucket
FROM ns JOIN t1 USING (lang) JOIN t2 USING (lang)"""


def kmeans_clusters(sf_dir: str, k: int = 10, iters: int = 6) -> rd.Dataset:
    """Distributed Lloyd's k-means assignment over the embeddings table.
    Broadcast centroids, fixed-size mergeable partials — the
    iterative-ML shape on Ray Data (stages/similarity.py:kmeans).
    Exactly SQL-oracled since round 3: init is the SQL-replicable
    ``init_ids=[0..k-1]`` variant and every Lloyd round is deterministic
    order-independent float64, so ``kmeans_clusters_sql`` unrolls the
    same ``iters`` rounds in DuckDB and the integer (vec_id, cluster_id)
    output matches exactly (assignment flips would need a point
    equidistant to two centroids within ~1e-13 — measured margins are
    orders wider; monotone inertia + farthest-point init stay
    test-asserted on the default path)."""
    ds = _read_table(sf_dir, "embeddings")
    assign, _hist = sim.kmeans(ds, k=k, iters=iters,
                               init_ids=list(range(k)))
    return assign


def _kmeans_sql_parts(src: str, k: int, iters: int, dim: int,
                      pfx: str = "") -> list[str]:
    """CTE parts unrolling the deterministic ``init_ids=[0..k-1]``
    k-means over ``src`` (a table/CTE with (vec_id, embedding)): v =
    unnested vectors, c0 = init centroids, a{i}/c{i+1} = Lloyd rounds
    (argmin assignment with cluster-id tie-break, per-cluster per-dim
    mean, empty clusters keep the previous centroid), ending with the
    final assignment CTE ``afinal (vec_id, cid)``. Shared by
    ``kmeans_clusters_sql`` and ``semdedup_sql``; ``pfx`` prefixes
    every CTE name so multiple instantiations coexist in ONE query
    (embedding_pq_sql runs one chain per subspace)."""
    V = f"{pfx}v"

    def assign_cte(name: str, cents: str) -> str:
        return f"""{pfx}{name} AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           sum((v.val - c.val) * (v.val - c.val)) AS dist
    FROM {V} v JOIN {pfx}{cents} c ON v.d = c.d
    GROUP BY v.vec_id, c.cid)
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist, cid) = 1
)"""

    parts = [f"""{V} AS (
  SELECT vec_id, unnest(range({dim})) AS d,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM {src}
), {pfx}c0 AS (
  SELECT vec_id AS cid, d, val FROM {V} WHERE vec_id < {k}
)"""]
    for i in range(iters):
        parts.append(assign_cte(f"a{i}", f"c{i}"))
        parts.append(f"""{pfx}c{i + 1} AS (
  SELECT p.cid, p.d, COALESCE(m.val, p.val) AS val
  FROM {pfx}c{i} p LEFT JOIN (
    SELECT a.cid, v.d, avg(v.val) AS val
    FROM {pfx}a{i} a JOIN {V} v ON v.vec_id = a.vec_id
    GROUP BY a.cid, v.d) m
  ON m.cid = p.cid AND m.d = p.d
)""")
    parts.append(assign_cte("afinal", f"c{iters}"))
    return parts


def kmeans_clusters_sql(k: int = 10, iters: int = 6, dim: int = 64) -> str:
    """DuckDB replica of ``kmeans_clusters``: centroids start as vectors
    0..k-1, then ``iters`` unrolled Lloyd rounds (argmin assignment with
    cluster-id tie-break, per-cluster per-dim mean, empty clusters keep
    the previous centroid), then the final assignment."""
    parts = _kmeans_sql_parts("embeddings", k, iters, dim)
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM afinal")


def semdedup(sf_dir: str, k: int = 8, iters: int = 4) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then cosine near-dup detection WITHIN clusters only — the pair scan
    is quadratic in cluster population, not corpus size, which is the
    semantic-dedup scale path (stages/dedup.py:semdedup). Runs over the
    planted-exact-copy corpus (threshold 0.99; the corpus's natural max
    pairwise cosine ~0.51 keeps the float threshold far from any
    decision boundary) with the SQL-replicable ``init_ids`` k-means, so
    the integer (vec_id, cluster_id, dup_of) output is exactly oracled.
    Recall note: exact copies always share a cluster (identical vectors
    → identical argmin), so planted-copy recall is 1 by construction;
    near-pairs straddling a cluster boundary are missed — that
    approximation IS SemDeDup."""
    return dd.semdedup(_embeddings_with_planted_dups(sf_dir),
                       k=k, iters=iters, threshold_pct=99)


def semdedup_sql(k: int = 8, iters: int = 4, dim: int = 64) -> str:
    """DuckDB replica of ``semdedup``: the planted union feeds the
    unrolled k-means CTEs (shared with ``kmeans_clusters_sql``), pairs
    are same-cluster id-ordered with cosine >= 0.99, and dup_of folds as
    min(self, min smaller-id neighbor) — the simhash_dedup convention."""
    parts = [f"""all_v AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0
)"""]
    parts.extend(_kmeans_sql_parts("all_v", k, iters, dim))
    parts.append("""pairs AS (
  SELECT fa.vec_id AS a, fb.vec_id AS b
  FROM afinal fa JOIN afinal fb
    ON fa.cid = fb.cid AND fa.vec_id < fb.vec_id
  JOIN all_v va ON va.vec_id = fa.vec_id
  JOIN all_v vb ON vb.vec_id = fb.vec_id
  WHERE list_cosine_similarity(CAST(va.embedding AS DOUBLE[]),
                               CAST(vb.embedding AS DOUBLE[])) >= 0.99
), nbr AS (
  SELECT b AS vec_id, min(a) AS mn FROM pairs GROUP BY b
)""")
    return ("WITH " + ",\n".join(parts) + """
SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cluster_id,
       CAST(least(f.vec_id, COALESCE(n.mn, f.vec_id)) AS BIGINT) AS dup_of
FROM afinal f LEFT JOIN nbr n ON n.vec_id = f.vec_id""")


def ann_ivf_fullprobe(sf_dir: str, k: int = 10,
                      n_centroids: int = 16) -> rd.Dataset:
    """IVF top-k with ``n_probe = n_centroids``: every cell is probed, so
    the result is value-identical to exact brute force and SHARES
    ``ann_bruteforce``'s oracle — proving the persisted cell-partitioned
    index, the probe-pruned read plumbing, and the per-cell scoring lose
    nothing. The production pruned-probe path (``ann_ivf``) keeps its
    recall assertions in tests."""
    from pathlib import Path
    q, qids = _query_vectors(sf_dir)
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    index_dir = os.path.join("/tmp/pdf_extraction_ray/ivf",
                             Path(sf_dir).name or "sf")
    return sim.topk_cosine_ivf(ds, q, qids, k=k, n_centroids=n_centroids,
                               n_probe=n_centroids, index_dir=index_dir)


def ann_ivf_incremental(sf_dir: str, k: int = 10, n_centroids: int = 16,
                        holdout: int = 64) -> rd.Dataset:
    """The IVF ingest loop end-to-end: build the persisted index on the
    corpus MINUS its ``holdout`` largest vec_ids, append the holdout as
    an incremental batch (frozen quantizer, per-cell delta files —
    stages/similarity.append_to_ivf_index), then probe every cell.
    A full probe is value-identical to brute force over the union, so
    this SHARES ``ann_bruteforce``'s oracle — proving the delta-file
    append and the probe's base+delta glob lose nothing (the
    ``ann_ivf_fullprobe`` trick, applied to the ingest path)."""
    import pyarrow.compute as pc
    import shutil
    from pathlib import Path

    q, qids = _query_vectors(sf_dir)
    # materialize once: count, the build's id-fingerprint pass, the
    # centroid sample, the assign/write pass, and the append's stats
    # pass otherwise each re-execute the read+filter lineage (~5 scans;
    # the topk_cosine_ivf hazard)
    ds = _read_table(sf_dir, "embeddings",
                     ["vec_id", "embedding"]).materialize()
    n = ds.count()
    if not 0 < holdout < n:
        raise ValueError(f"holdout {holdout} out of range for {n} vectors")
    thr = n - holdout
    base = ds.map_batches(
        lambda t, _thr=thr: t.filter(pc.less(t["vec_id"], _thr)),
        batch_format="pyarrow")
    batch = ds.map_batches(
        lambda t, _thr=thr: t.filter(pc.greater_equal(t["vec_id"], _thr)),
        batch_format="pyarrow")
    index_dir = os.path.join("/tmp/pdf_extraction_ray/ivf-incr",
                             Path(sf_dir).name or "sf")
    # always rebuild from the base split: this query's point is the
    # append path itself, so a stale union index must not short-circuit it
    shutil.rmtree(index_dir, ignore_errors=True)
    sim.build_ivf_index(base, index_dir, n_centroids)
    sim.append_to_ivf_index(batch, index_dir)
    return sim.topk_cosine_ivf_indexed(index_dir, q, qids, k=k,
                                       n_probe=n_centroids)


def value_quantiles_hist(sf_dir: str) -> rd.Dataset:
    """Exact per-type value percentiles WITHOUT a global sort — the
    histogram-combiner scale path (stages/sketch.py:
    grouped_quantiles_hist); event_value_stats computes the same
    numbers by sorting, which this replaces at scale. Values quantize
    to cents (exact for the 2-decimal source data)."""
    from ..stages.sketch import grouped_quantiles_hist

    def cents(batch: pa.Table) -> np.ndarray:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return np.round(v * 100).astype(np.int64)

    ds = _read_table(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles_hist(ds, "event_type", cents)


def value_quantiles_hist_sql() -> str:
    def q(p: int) -> str:
        return (f"CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), "
                f"{p / 100}) AS BIGINT) AS q{p}")
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {q(50)}, {q(90)}, {q(99)}
FROM events GROUP BY event_type"""


def event_pairs_within(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """Range (band) self-join: same-user event pairs within a trailing
    hour — the non-equi temporal join family (stages/joins.py:
    band_self_join)."""
    from ..stages.joins import band_self_join

    ds = _read_table(sf_dir, "events", ["event_id", "user_id", "ts"])
    return band_self_join(ds, key_col="user_id", ts_col="ts",
                          id_col="event_id", window_s=window_s)


def event_pairs_within_salted(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """Skew-safe salted band self-join — value-identical to
    ``event_pairs_within`` and SHARING its oracle: the group key gains a
    ts//window chunk (boundary rows duplicated once, pairs emitted only
    in the left event's home chunk), so one hyperactive user no longer
    produces one giant task (stages/joins.py:band_self_join_salted)."""
    from ..stages.joins import band_self_join_salted

    ds = _read_table(sf_dir, "events", ["event_id", "user_id", "ts"])
    return band_self_join_salted(ds, key_col="user_id", ts_col="ts",
                                 id_col="event_id", window_s=window_s)


def event_pairs_within_sql(window_s: int = 3600) -> str:
    return f"""
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {window_s} SECOND"""


def text_embed_dups(sf_dir: str, threshold_pct: int = 95) -> rd.Dataset:
    """End-to-end text → embedding → cosine near-dup: the actor-pool
    hashing embedder (model state per actor, stages/embed.py) feeds the
    blocked exact cosine pair detector over the planted near-dup corpus.
    Exactly SQL-oracled since round 3: the embedder's arithmetic is
    integer FNV-1a buckets x a sha256-derived projection with closed-form
    [-1,1) doubles (stages/embed.py:projection_matrix), so DuckDB
    recomputes the embeddings and the pair set (``text_embed_dups_sql``);
    the nearest pair sits >= 1e-3 from the 0.95 threshold while cross-
    engine float noise is ~1e-7 (measured, ROUND3_NOTES)."""
    from ..stages.embed import embed_documents

    emb = embed_documents(_docs_with_planted_near_dups(sf_dir))
    return dd.embedding_near_dup(emb, threshold_pct=threshold_pct,
                                 id_col="doc_id")


def text_embed_dups_sql(threshold_pct: int = 95, dim: int = 64,
                        n_buckets: int = 4096) -> str:
    """Value-exact DuckDB replica of ``text_embed_dups``: FNV-1a 32-bit
    char-3-gram buckets (byte == codepoint on this ASCII corpus), the
    sha256-derived projection, float64 forward + normalize, float32
    rounding (CAST AS FLOAT — the engine stores list<float32>), then
    all-pairs cosine at the same threshold."""
    c = [f"unicode(substr(text, i + {j}, 1))::UBIGINT" for j in range(3)]
    h = "2166136261::UBIGINT"
    for cj in c:
        h = f"((xor({h}, {cj}) * 16777619) % 4294967296)"
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 1, length(text) - 12)
  FROM documents WHERE doc_id % 5 = 0
), grams AS (
  SELECT doc_id, unnest(range(1, length(text) - 1)) AS i, text
  FROM all_docs WHERE length(text) >= 3
), gb AS (
  SELECT doc_id, ({h}) % {n_buckets} AS bucket FROM grams
), counts AS (
  SELECT doc_id, bucket, count(*)::DOUBLE AS w FROM gb
  GROUP BY doc_id, bucket
), proj AS (
  SELECT b, d,
         (({_SQL_HASH64} >> 10)::DOUBLE - 4503599627370496)
           / 4503599627370496 AS val
  FROM (SELECT b, d, sha256('proj:' || b || ':' || d) AS h
        FROM (SELECT unnest(range({n_buckets})) AS b),
             (SELECT unnest(range({dim})) AS d))
), emb AS (
  SELECT c.doc_id, p.d, sum(c.w * p.val) AS v
  FROM counts c JOIN proj p ON c.bucket = p.b
  GROUP BY c.doc_id, p.d
), nrm AS (
  SELECT doc_id, sqrt(sum(v * v)) AS nm FROM emb GROUP BY doc_id
), unitv AS (
  SELECT e.doc_id, e.d,
         CAST(CAST(e.v / (CASE WHEN n.nm = 0 THEN 1 ELSE n.nm END)
                   AS FLOAT) AS DOUBLE) AS uv
  FROM emb e JOIN nrm n USING (doc_id)
), vecs AS (
  SELECT doc_id, list(uv ORDER BY d) AS e FROM unitv GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM vecs a JOIN vecs b ON a.doc_id < b.doc_id
WHERE list_cosine_similarity(a.e, b.e) >= {threshold_pct / 100.0}"""


def audio_decode(sf_dir: str) -> rd.Dataset:
    """REAL audio decoding over a deterministic planted-WAV corpus: one
    PCM mono WAV per document (sample law in sources/gen_media.py),
    decoded by the pure-stdlib RIFF/WAVE parser inside the actor-pool
    audio stage — rate, duration, and amplitude means all verify against
    a closed-form SQL oracle."""
    from ..sources.gen_media import build_wav
    from ..stages.multimodal import audio_features

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array([f"media://wav/{d}" for d in ids], pa.string()),
            "html": pa.array([build_wav(d) for d in ids], pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    feats = audio_features(media, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sample_rate": batch["sample_rate"],
            "n_samples": batch["n_samples"],
            "duration_ms": batch["duration_ms"],
            "mean_abs": batch["mean_abs"],
            "decoded": batch["decoded"],
        })

    return feats.map_batches(project, batch_format="pyarrow")


def audio_decode_sql() -> str:
    n = "(400 + doc_id % 800)"
    s = "((doc_id * 37 + 11 * i) % 65536 - 32768)"
    return f"""
SELECT doc_id,
  CAST(8000 AS BIGINT) AS sample_rate,
  CAST({n} AS BIGINT) AS n_samples,
  CAST({n} * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(list_sum(list_transform(range(0, {n}), i -> abs({s})))
       // {n} AS BIGINT) AS mean_abs,
  TRUE AS decoded
FROM documents"""


def order_customer_join(sf_dir: str) -> rd.Dataset:
    """Shuffle hash join (both sides large): orders ⋈ customer via the
    partition-wise cogroup join (stages/joins.py:hash_join) — the
    at-scale sibling of the broadcast dimension joins in
    pipelines/relational.py."""
    from ..stages.joins import hash_join

    orders = _read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read_table(sf_dir, "customer",
                       ["c_custkey", "c_name", "c_nationkey"])
    return hash_join(orders, cust, "o_custkey", "c_custkey",
                     ["o_orderkey"], ["c_name", "c_nationkey"])


def order_customer_join_sql() -> str:
    return """
SELECT o.o_custkey, o.o_orderkey, c.c_name, c.c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"""


def user_activity_full(sf_dir: str) -> rd.Dataset:
    """FULL OUTER shuffle join: per-user event counts ⟗ per-customer
    order counts on user_id = custkey — users with activity but no
    customer record and customers with orders but no events both
    survive with zero-filled counts (COALESCE'd so the oracle compares
    integer-exact). Exercises the outer modes of the generic
    partition-wise hash join."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_join

    ev = (_read_table(sf_dir, "events", ["user_id"])
          .groupby("user_id").count()
          .map_batches(lambda t: pa.table({
              "user_id": t["user_id"].cast(pa.int64()),
              "n_events": t["count()"].cast(pa.int64())}),
              batch_format="pyarrow"))
    orders = (_read_table(sf_dir, "orders", ["o_custkey"])
              .groupby("o_custkey").count()
              .map_batches(lambda t: pa.table({
                  "o_custkey": t["o_custkey"].cast(pa.int64()),
                  "n_orders": t["count()"].cast(pa.int64())}),
                  batch_format="pyarrow"))
    joined = hash_join(ev, orders, "user_id", "o_custkey",
                       ["n_events"], ["n_orders"], how="full_outer")

    def fill(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "n_events": pc.coalesce(t["n_events"].combine_chunks()
                                    .cast(pa.int64()), zero),
            "n_orders": pc.coalesce(t["n_orders"].combine_chunks()
                                    .cast(pa.int64()), zero),
        })

    return joined.map_batches(fill, batch_format="pyarrow")


def user_activity_full_sql() -> str:
    return """
WITH e AS (SELECT user_id, count(*) AS n_events FROM events
           GROUP BY user_id),
o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
      GROUP BY o_custkey)
SELECT COALESCE(e.user_id, o.o_custkey) AS user_id,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders
FROM e FULL OUTER JOIN o ON e.user_id = o.o_custkey"""


def customers_with_orders_semi(sf_dir: str) -> rd.Dataset:
    """SEMI shuffle join: customers having at least one order — the
    existence filter as a keyed exchange (only the right side's KEY
    moves), complementing the broadcast/bloom anti-join family."""
    from ..stages.joins import hash_join

    cust = _read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read_table(sf_dir, "orders", ["o_custkey"])
    return hash_join(cust, orders, "c_custkey", "o_custkey",
                     ["c_mktsegment"], [], how="semi")


def customers_with_orders_semi_sql() -> str:
    return """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""


def media_resize(sf_dir: str, out_w: int = 16, out_h: int = 16) -> rd.Dataset:
    """Nearest-neighbor image resize over the planted-PNG corpus
    (decode → resize → pixel stats in one actor-pool stage); the resized
    pixel law is closed-form, so means verify against SQL."""
    from ..sources.gen_media import build_png
    from ..stages.multimodal import ImageResizer

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array([f"media://png/{d}" for d in ids], pa.string()),
            "html": pa.array([build_png(d) for d in ids], pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    feats = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 8), num_cpus=1)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "width": batch["width"], "height": batch["height"],
            "mean_pixel": batch["mean_pixel"], "decoded": batch["decoded"],
        })

    return feats.map_batches(project, batch_format="pyarrow")


def media_resize_sql(out_w: int = 16, out_h: int = 16) -> str:
    w, h = "(8 + doc_id % 25)", "(8 + doc_id % 17)"
    n = out_w * out_h
    px = (f"(doc_id + 7 * (((i % {out_w}) * {w}) // {out_w})"
          f" + 13 * (((i // {out_w}) * {h}) // {out_h})) % 256")
    return f"""
SELECT doc_id,
  CAST({out_w} AS BIGINT) AS width, CAST({out_h} AS BIGINT) AS height,
  CAST(list_sum(list_transform(range(0, {n}), i -> {px})) // {n}
       AS BIGINT) AS mean_pixel,
  TRUE AS decoded
FROM documents"""


def video_frames(sf_dir: str, step: int = 2) -> rd.Dataset:
    """Video frame sampling: walk the synthetic frame container, keep
    every ``step``-th frame, decode each kept frame — per-frame dims and
    pixel means verify against the closed-form frame pixel law."""
    from ..sources.gen_media import build_video
    from ..stages.multimodal import VideoFrameSampler

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array([f"media://vid/{d}" for d in ids], pa.string()),
            "html": pa.array([build_video(d) for d in ids],
                             pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    frames = media.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"step": step},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 8), num_cpus=1)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_idx": batch["frame_idx"],
            "width": batch["width"], "height": batch["height"],
            "mean_pixel": batch["mean_pixel"],
        })

    return frames.map_batches(project, batch_format="pyarrow")


def video_frames_sql(step: int = 2) -> str:
    seed = "(doc_id * 1000 + f)"
    w, h = f"(8 + {seed} % 25)", f"(8 + {seed} % 17)"
    px = f"({seed} + 7 * (i % {w}) + 13 * (i // {w})) % 256"
    return f"""
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
  CAST({w} AS BIGINT) AS width, CAST({h} AS BIGINT) AS height,
  CAST(list_sum(list_transform(range(0, {w} * {h}), i -> {px}))
       // ({w} * {h}) AS BIGINT) AS mean_pixel
FROM (SELECT doc_id, unnest(range(0, 4 + doc_id % 9)) AS f
      FROM documents)
WHERE f % {step} = 0"""


def props_json_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured (JSON) column processing: parse each event's
    ``props`` JSON blob, pull the ``k`` field, and aggregate per event
    type — the free-form-metadata shape (reference analog: JSONB
    ``processing_metadata`` round-trips, app/db/extractions.py:76-78;
    SURVEY.md §2.8 JSON row). Combiner form: per-batch parse + partial
    sums, one tiny groupby."""
    import json

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for et, props in zip(batch["event_type"].to_pylist(),
                             batch["props"].to_pylist()):
            try:
                doc = json.loads(props or "")
                bad = 0
                # only an integer-typed k counts (exact parity with the
                # oracle's json_type + TRY_CAST: digit STRINGS, floats,
                # and booleans contribute 0); valid non-object JSON is
                # valid JSON with no k — never an error
                v = doc.get("k") if isinstance(doc, dict) else None
                k = v if isinstance(v, int) and not isinstance(v, bool) else 0
            except (ValueError, TypeError, json.JSONDecodeError):
                k, bad = 0, 1
            cur = acc.setdefault(et, [0, 0, 0])
            cur[0] += 1
            cur[1] += k
            cur[2] += bad
        ks = sorted(acc)
        return pa.table({
            "event_type": pa.array(ks, pa.string()),
            "n": pa.array([acc[k][0] for k in ks], pa.int64()),
            "sum_k": pa.array([acc[k][1] for k in ks], pa.int64()),
            "n_bad": pa.array([acc[k][2] for k in ks], pa.int64()),
        })

    return (_read_table(sf_dir, "events", ["event_type", "props"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n_events"),
                       Sum("sum_k", alias_name="sum_k"),
                       Sum("n_bad", alias_name="n_bad")))


def props_json_stats_sql() -> str:
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN json_valid(coalesce(props, ''))
                      AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                THEN coalesce(TRY_CAST(json_extract_string(props, '$.k')
                                       AS BIGINT), 0) ELSE 0 END)
            AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN json_valid(coalesce(props, '')) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_bad
FROM events GROUP BY event_type"""


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# RE2-compatible patterns (pyarrow.compute and DuckDB both run RE2, so
# the Ray path and the SQL oracle share byte-identical match semantics).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}-[0-9]{2}\b"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _docs_with_planted_pii(sf_dir: str) -> rd.Dataset:
    """documents with deterministic PII appended (pure function of
    doc_id, mirrored 1:1 by the SQL oracle): emails on doc_id%7==0,
    phone numbers on %11==0, IPv4s on %13==0."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"])
        texts = batch["text"].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            i = int(i)
            if i % 7 == 0:
                t += f" contact user{i}@example.com now"
            if i % 11 == 0:
                t += f" call 555-{i % 10000:04d}-{i % 100:02d} today"
            if i % 13 == 0:
                t += f" from 10.{i % 256}.{i % 200}.{i % 100}"
            out.append(t)
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(out, pa.large_string())})

    return base.map_batches(plant, batch_format="pyarrow")


def pii_redact(sf_dir: str) -> rd.Dataset:
    """PII scrubbing over document text — the standard pre-training
    cleanup pass (emails / phone numbers / IPv4 → placeholder tokens),
    fully vectorized with Arrow's RE2 kernels (no Python loop in the
    scrub itself). Scale shape: embarrassingly parallel map, no
    shuffle; at 100 TB this runs at read throughput."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        n_email = pc.count_substring_regex(txt, PII_EMAIL_RE)
        n_phone = pc.count_substring_regex(txt, PII_PHONE_RE)
        n_ip = pc.count_substring_regex(txt, PII_IP_RE)
        red = pc.replace_substring_regex(txt, PII_EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_PHONE_RE, "<PHONE>")
        red = pc.replace_substring_regex(red, PII_IP_RE, "<IP>")
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_emails": n_email.cast(pa.int64()),
            "n_phones": n_phone.cast(pa.int64()),
            "n_ips": n_ip.cast(pa.int64()),
            "redacted_text": red.cast(pa.large_string()),
        })

    return _docs_with_planted_pii(sf_dir).map_batches(
        scrub, batch_format="pyarrow")


def pii_redact_sql() -> str:
    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                      || ' today'
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.' || (doc_id % 256) || '.' || (doc_id % 200)
                      || '.' || (doc_id % 100)
                 ELSE '' END AS text
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g'),
           '{PII_IP_RE}', '<IP>', 'g') AS redacted_text
FROM planted"""


# ---------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------

DECONTAM_BENCH_MOD = 97   # doc_id % 97 == 0 -> benchmark (eval) doc
DECONTAM_PLANT_MOD = 29   # doc_id % 29 == 0 -> planted contamination


def decontam_docs(sf_dir: str) -> rd.Dataset:
    """Eval-set decontamination: flag training documents sharing any
    word-8-gram with a benchmark (held-out eval) set — the standard
    pre-training hygiene pass (e.g. GPT-3 appendix C / PaLM-style
    13-gram overlap, here at NGRAM_N=8). Benchmark = doc_id%97==0;
    contamination is planted deterministically (doc_id%29==0 docs get a
    benchmark doc's leading 8-gram appended) so the oracle can mirror
    the plant in SQL.

    Scale shape: the benchmark side is small by definition (an eval
    suite, not the corpus), so its gram set broadcasts once via
    ray.put; the scoring pass is shuffle-free. At 100 TB the fallback
    for a large eval suite is shipping 64-bit gram hashes instead of
    strings (8 bytes/gram) — the scoring map is unchanged."""
    import ray

    base = _docs(sf_dir, ["doc_id", "text"])
    bench_mod, plant_mod = DECONTAM_BENCH_MOD, DECONTAM_PLANT_MOD

    def grams_of(text: str) -> list[str]:
        words = (text or "").split(" ")
        return [" ".join(words[i:i + NGRAM_N])
                for i in range(len(words) - NGRAM_N + 1)]

    # benchmark gram set (small side: 1/97 of docs) -> broadcast once
    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"])
        out: set[str] = set()
        for i, t in zip(ids, batch["text"].to_pylist()):
            if int(i) % bench_mod == 0:
                out.update(grams_of(t))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    gset: set[str] = set()
    for b in (base.map_batches(bench_grams, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        gset.update(b["g"].to_pylist())
    gref = ray.put(gset)

    # leading 8-grams of the 5 plant-source benchmark docs (tiny lookup)
    snip_ids = np.array([bench_mod * r for r in range(5)], np.int64)

    def snip_rows(batch: pa.Table) -> pa.Table:
        mask = np.isin(np.asarray(batch["doc_id"]), snip_ids)
        return batch.filter(pa.array(mask))

    snips: dict[int, str] = {}
    for row in base.map_batches(snip_rows, batch_format="pyarrow").take_all():
        words = (row["text"] or "").split(" ")
        snips[int(row["doc_id"])] = " ".join(words[:NGRAM_N])

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(gref)
        ids = np.asarray(batch["doc_id"])
        doc_ids, n_grams, n_hits = [], [], []
        for i, t in zip(ids, batch["text"].to_pylist()):
            i = int(i)
            if i % bench_mod == 0:
                continue  # benchmark docs are not scored
            if i % plant_mod == 0:
                t = (t or "") + " " + snips[bench_mod * (i % 5)]
            gs = grams_of(t)
            doc_ids.append(i)
            n_grams.append(len(gs))
            n_hits.append(sum(1 for g in gs if g in bench))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_bench_grams": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array([int(h > 0) for h in n_hits],
                                     pa.int64()),
        })

    return base.map_batches(score, batch_format="pyarrow")


def decontam_docs_sql() -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(NGRAM_N))
    gram = gram.replace("w[i+0]", "w[i]")
    m, p = DECONTAM_BENCH_MOD, DECONTAM_PLANT_MOD
    return f"""
WITH snips AS (
  SELECT doc_id AS sid,
         array_to_string((string_split(text, ' '))[1:{NGRAM_N}], ' ') AS snip
  FROM documents WHERE doc_id % {m} = 0 AND doc_id / {m} < 5
), train AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {p} = 0
              THEN d.text || ' ' || s.snip ELSE d.text END AS text
  FROM documents d
  LEFT JOIN snips s ON s.sid = {m} * (d.doc_id % 5)
  WHERE d.doc_id % {m} != 0
), bench_grams AS (
  SELECT DISTINCT unnest(list_transform(range(1, len(w) - {NGRAM_N - 2}),
                                        i -> {gram})) AS g
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE doc_id % {m} = 0)
  WHERE len(w) >= {NGRAM_N}
), train_grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {NGRAM_N - 2}),
                               i -> {gram})) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM train)
  WHERE len(w) >= {NGRAM_N}
), scored AS (
  SELECT t.doc_id, count(*) AS n_grams,
         sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
  FROM train_grams t LEFT JOIN bench_grams b USING (g)
  GROUP BY t.doc_id)
SELECT train.doc_id,
       CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(s.n_hits, 0) AS BIGINT) AS n_bench_grams,
       CAST(CASE WHEN coalesce(s.n_hits, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM train LEFT JOIN scored s ON train.doc_id = s.doc_id"""


# ---------------------------------------------------------------------------
# training-output sharding + sequence packing (distributed prefix scan)
# ---------------------------------------------------------------------------

PACK_BUDGET = 512       # tokens per packed training sequence
SHARD_COUNT = 16        # output shards for the deterministic shuffle


def pack_sequences(sf_dir: str) -> rd.Dataset:
    """Greedy-by-position sequence packing for training batches: docs in
    doc_id order are laid head-to-tail and cut into PACK_BUDGET-token
    sequences (seq_id = starting token offset // budget — the standard
    concat-then-chunk packing law, so a doc spanning a boundary starts
    the sequence its first token falls in).

    Built on ``stages/scan.prefix_scan`` — the two-phase distributed
    scan (per-partition totals -> O(P) driver prefix -> per-partition
    local cumsum + offset). No full-data driver state at any scale;
    partition key is the dense ``doc_id // 256`` key range."""
    from ..functions.textstats import token_estimate
    from ..stages.scan import prefix_scan

    docs = _docs(sf_dir, ["doc_id", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        n = [token_estimate(t or "") for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(n, pa.int64())})

    toks = docs.map_batches(tokens, batch_format="pyarrow")
    scanned = prefix_scan(
        toks, part_fn=lambda b: np.asarray(b["doc_id"]) // 256,
        sort_cols=["doc_id"], value_col="n_tokens")

    def finish(batch: pa.Table) -> pa.Table:
        cum = np.asarray(batch["cum"])
        ntok = np.asarray(batch["n_tokens"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["n_tokens"],
            "seq_id": pa.array((cum - ntok) // PACK_BUDGET, pa.int64()),
        })

    return scanned.map_batches(finish, batch_format="pyarrow")


def pack_sequences_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, CAST(length(text) // 4 AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id
FROM s"""


def shard_assign(sf_dir: str) -> rd.Dataset:
    """Deterministic global shuffle + sharding of the training corpus:
    a 32-bit integer mix of doc_id defines a pseudorandom total order
    (reproducible across runs AND across engines — the SQL oracle
    computes the identical mix), docs are ranked in that order with the
    distributed scan, and shards are dealt round-robin. This replaces
    ``random_shuffle`` where reproducibility matters (training-data
    shuffles must be seedable and engine-independent).

    Scale shape: the partition key is the hash's high byte — a uniform
    range partition, so no skew; driver state is O(256)."""
    from ..stages.scan import prefix_scan

    docs = _docs(sf_dir, ["doc_id"])

    def mix(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["doc_id"]).astype(np.uint64)
        h = (x * np.uint64(2654435761)) % np.uint64(1 << 32)
        h = ((h ^ (h >> np.uint64(16))) * np.uint64(0x45D9F3B)) \
            % np.uint64(1 << 32)
        h = h ^ (h >> np.uint64(16))
        return pa.table({"doc_id": batch["doc_id"],
                         "h": pa.array(h.astype(np.int64), pa.int64())})

    hashed = docs.map_batches(mix, batch_format="pyarrow")
    ranked = prefix_scan(
        hashed, part_fn=lambda b: np.asarray(b["h"]) >> 24,
        sort_cols=["h", "doc_id"], rank_col="shuffle_pos")

    def finish(batch: pa.Table) -> pa.Table:
        pos = np.asarray(batch["shuffle_pos"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "shuffle_pos": batch["shuffle_pos"],
            "shard": pa.array(pos % SHARD_COUNT, pa.int64()),
        })

    return ranked.map_batches(finish, batch_format="pyarrow")


def shard_assign_sql() -> str:
    return f"""
WITH h1 AS (
  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS a FROM documents
), h2 AS (
  SELECT doc_id, (xor(a, a >> 16) * {0x45D9F3B}) % 4294967296 AS b FROM h1
), h3 AS (
  SELECT doc_id, xor(b, b >> 16) AS h FROM h2
), r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS shuffle_pos
  FROM h3)
SELECT doc_id, CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
       CAST(shuffle_pos % {SHARD_COUNT} AS BIGINT) AS shard
FROM r"""


def curate_pipeline(sf_dir: str, out_dir: str | None = None) -> rd.Dataset:
    """The composed end-to-end TRAINING-DATA CURATION pipeline — the
    published playbook order (Gopher/RefinedWeb/Dolma) as ONE streaming
    chain, each stage an operator this engine already verifies alone:

      quality rules (``_gopher_reason``) + benchmark exclusion   [map]
      → exact content dedup, first-wins (``exact_dedup_by_hash``)
                                               [one hash shuffle]
      → 8-gram eval-set decontamination (broadcast bench grams)  [map]
      → deterministic shuffle + shard assignment (prefix scan)
                                          [O(256) driver offsets]

    Returns (doc_id, n_tokens, shard) for the surviving documents —
    the training-ready manifest. The whole chain streams: two bounded
    exchanges (the dedup hash partition, the scan's offset fold), no
    corpus-sized driver state, no materialized intermediate.

    ``out_dir`` (optional) additionally lands the manifest as
    ``shard=K/`` hive-partitioned parquet — one directory per training
    shard, so a consumer (or a resumed loader) reads shards
    independently and a failed downstream job skips finished ones."""
    import ray

    from ..stages.scan import prefix_scan

    base = _docs(sf_dir, ["doc_id", "text"])
    m = DECONTAM_BENCH_MOD

    def bench_grams(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for i, t in zip(np.asarray(batch["doc_id"]),
                        batch["text"].to_pylist()):
            if int(i) % m == 0:
                words = (t or "").split(" ")
                out.update(" ".join(words[j:j + NGRAM_N])
                           for j in range(len(words) - NGRAM_N + 1))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    gset: set[str] = set()
    for b in (base.map_batches(bench_grams, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        gset.update(b["g"].to_pylist())
    gref = ray.put(gset)

    def rules(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"])
        keep = np.fromiter(
            ((int(i) % m != 0) and _gopher_reason(t or "") == "pass"
             for i, t in zip(ids, batch["text"].to_pylist())),
            bool, len(batch))
        return batch.filter(pa.array(keep))

    deduped = dd.exact_dedup_by_hash(
        base.map_batches(rules, batch_format="pyarrow"),
        text_col="text", id_col="doc_id")

    def decontam(batch: pa.Table) -> pa.Table:
        bench = ray.get(gref)
        ids, ntok = [], []
        for i, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            words = (t or "").split(" ")
            if any(" ".join(words[j:j + NGRAM_N]) in bench
                   for j in range(len(words) - NGRAM_N + 1)):
                continue
            ids.append(i)
            ntok.append(len(t or "") // 4)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ntok, pa.int64())})

    clean = deduped.map_batches(decontam, batch_format="pyarrow")

    def mixh(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["doc_id"]).astype(np.uint64)
        h = (x * np.uint64(2654435761)) % np.uint64(1 << 32)
        h = ((h ^ (h >> np.uint64(16))) * np.uint64(0x45D9F3B)) \
            % np.uint64(1 << 32)
        h = h ^ (h >> np.uint64(16))
        return batch.append_column("h", pa.array(h.astype(np.int64),
                                                 pa.int64()))

    ranked = prefix_scan(
        clean.map_batches(mixh, batch_format="pyarrow"),
        part_fn=lambda b: np.asarray(b["h"]) >> 24,
        sort_cols=["h", "doc_id"], rank_col="shuffle_pos")

    def finish(batch: pa.Table) -> pa.Table:
        pos = np.asarray(batch["shuffle_pos"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["n_tokens"],
            "shard": pa.array(pos % SHARD_COUNT, pa.int64()),
        })

    out = ranked.map_batches(finish, batch_format="pyarrow")
    if out_dir is not None:
        out = out.materialize()  # write AND return without re-running
        out.write_parquet(out_dir, partition_cols=["shard"])
    return out


def curate_pipeline_sql() -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(NGRAM_N))
    gram = gram.replace("w[i+0]", "w[i]")
    m = DECONTAM_BENCH_MOD
    return f"""
WITH {_gopher_sql_parts()}, passed AS (
  SELECT doc_id, text FROM r
  WHERE reason = 'pass' AND doc_id % {m} != 0
), dedup AS (
  SELECT doc_id, text FROM passed
  QUALIFY row_number() OVER (PARTITION BY sha256(text)
                             ORDER BY doc_id) = 1
), bench_grams AS (
  SELECT DISTINCT unnest(list_transform(range(1, len(w) - {NGRAM_N - 2}),
                                        i -> {gram})) AS g
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE doc_id % {m} = 0)
  WHERE len(w) >= {NGRAM_N}
), doc_grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {NGRAM_N - 2}),
                               i -> {gram})) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM dedup)
  WHERE len(w) >= {NGRAM_N}
), contaminated AS (
  SELECT DISTINCT doc_id FROM doc_grams JOIN bench_grams USING (g)
), clean AS (
  SELECT d.doc_id, CAST(length(d.text) // 4 AS BIGINT) AS n_tokens
  FROM dedup d LEFT JOIN contaminated c USING (doc_id)
  WHERE c.doc_id IS NULL
), h1 AS (
  SELECT doc_id, n_tokens,
         (doc_id * 2654435761) % 4294967296 AS a FROM clean
), h2 AS (
  SELECT doc_id, n_tokens,
         (xor(a, a >> 16) * {0x45D9F3B}) % 4294967296 AS b FROM h1
), h3 AS (
  SELECT doc_id, n_tokens, xor(b, b >> 16) AS h FROM h2
), rk AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS pos
  FROM h3)
SELECT doc_id, n_tokens, CAST(pos % {SHARD_COUNT} AS BIGINT) AS shard
FROM rk"""


# ---------------------------------------------------------------------------
# continuation session 7: event-stream parity + rate monitoring
# ---------------------------------------------------------------------------

# watermark / disorder audit constants: every 13th event's timestamp is
# planted backwards by 5..35 minutes (pure functions of event_id, so the
# SQL oracle re-derives the plant — the _docs_with_planted_pii pattern;
# the generated events table is ts-monotone in event_id, so without the
# plant the audit is vacuous), and 15 minutes is the allowed lateness.
DISORDER_MOD = 13
DISORDER_RES = 9
DISORDER_BASE_S = 300
DISORDER_STEP_S = 300
LATENESS_US = 900 * 1_000_000


def value_ntiles(sf_dir: str, n: int = 4,
                 num_partitions: int = 32) -> rd.Dataset:
    """NTILE(n) value quartiles per event type — the window-function
    bucketing SQL users reach for before histogramming (``NTILE(4)
    OVER (PARTITION BY event_type ORDER BY cents, event_id)``).

    Shape: the keyed-window scan with a STRING key (the
    section_quota_sample pattern): tag ``_kp = hash(type) & (P-1)``,
    ONE groupby(_kp) shuffle, then a vectorized per-partition sort +
    cumcount implementing the exact SQL NTILE fill rule (the first
    ``count % n`` tiles get ``ceil(count/n)`` rows). Values ride as
    integer cents, so no float ever reaches the compare."""
    from ..functions.hashing import stable_hash64

    P = num_partitions
    ds = _read_table(sf_dir, "events", ["event_id", "event_type", "value"])

    def feats(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cents = pc.round(pc.multiply(batch["value"], 100.0)).cast(pa.int64())
        types = batch["event_type"].to_pylist()
        kp = np.fromiter((stable_hash64(t) & (P - 1) for t in types),
                         np.int64, len(types))
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "cents": cents,
                         "_kp": pa.array(kp, pa.int64())})

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "event_type": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype="int64"),
                                 "tile": pd.Series([], dtype="int64")})
        g = g.sort_values(["event_type", "cents", "event_id"],
                          kind="mergesort")
        grp = g.groupby("event_type", sort=False)
        idx = grp.cumcount().to_numpy(np.int64)
        cnt = grp["event_id"].transform("size").to_numpy(np.int64)
        q, r = cnt // n, cnt % n
        # SQL NTILE: tiles 1..r hold q+1 rows, tiles r+1..n hold q rows
        big = r * (q + 1)
        g["tile"] = np.where(
            idx < big,
            idx // (q + 1) + 1,
            r + (idx - big) // np.maximum(q, 1) + 1).astype(np.int64)
        return g.drop(columns=["_kp"])

    return (ds.map_batches(feats, batch_format="pyarrow")
            .groupby("_kp").map_groups(tile, batch_format="pandas"))


def value_ntiles_sql(n: int = 4) -> str:
    return f"""
SELECT event_id, event_type, c AS cents,
       CAST(NTILE({n}) OVER (PARTITION BY event_type
                             ORDER BY c, event_id) AS BIGINT) AS tile
FROM (SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c FROM events)"""


def late_event_audit(sf_dir: str,
                     num_partitions: int = 32) -> rd.Dataset:
    """Out-of-order / watermark audit — the streaming-ingest triage
    every event pipeline runs before picking window allowed-lateness:
    per user, events arrive in ``event_id`` order; each event's
    ``disorder_us`` is how far it lags the user's watermark (the
    running max timestamp over PRIOR arrivals), and its status is
    ``ontime`` (no disorder), ``reordered`` (within the 15-minute
    allowed lateness — a window would still accept it) or ``late``
    (a streaming engine would drop or side-output it).

    Shape: ONE user-hash keyed shuffle; the per-partition body is a
    vectorized sort + per-user shifted ``cummax`` — the keyed-window
    scan with a running MAX instead of keyed_scan's running sum."""
    P = num_partitions
    ds = _read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kp = pc.bit_wise_and(t["user_id"].combine_chunks().cast(pa.int64()),
                             P - 1)
        return t.append_column("_kp", kp)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "disorder_us": pd.Series([], dtype="int64"),
                                 "status": pd.Series([], dtype=object)})
        g = g.sort_values(["user_id", "event_id"], kind="mergesort")
        eid = g["event_id"].to_numpy(np.int64)
        tus = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # the deterministic disorder plant (see module constants)
        shift = np.where(
            eid % DISORDER_MOD == DISORDER_RES,
            (DISORDER_BASE_S + (eid % 7) * DISORDER_STEP_S) * 1_000_000,
            0)
        tus = tus - shift
        # cythonized per-user running max, shifted one arrival back
        # (never a per-user Python .apply)
        users = g["user_id"].to_numpy()
        wm = (pd.Series(tus).groupby(users).cummax()
              .groupby(users).shift(1).to_numpy())
        # first event per user: watermark == own ts (disorder 0)
        disorder = np.where(np.isnan(wm), 0,
                            np.maximum(np.nan_to_num(wm) - tus, 0)
                            ).astype(np.int64)
        status = np.where(disorder == 0, "ontime",
                          np.where(disorder <= LATENESS_US,
                                   "reordered", "late"))
        return pd.DataFrame({"event_id": eid,
                             "disorder_us": disorder,
                             "status": status})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kp").map_groups(audit, batch_format="pandas"))


def late_event_audit_sql() -> str:
    return f"""
WITH p AS (
  SELECT event_id, user_id,
         epoch_us(ts) - CASE WHEN event_id % {DISORDER_MOD} = {DISORDER_RES}
           THEN ({DISORDER_BASE_S} + (event_id % 7) * {DISORDER_STEP_S})
                * 1000000
           ELSE 0 END AS tus
  FROM events
), w AS (
  SELECT event_id,
         greatest(0, COALESCE(
             MAX(tus) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING),
             tus) - tus) AS d
  FROM p
)
SELECT event_id, CAST(d AS BIGINT) AS disorder_us,
       CASE WHEN d = 0 THEN 'ontime'
            WHEN d <= {LATENESS_US} THEN 'reordered'
            ELSE 'late' END AS status
FROM w"""


DAY_US = 86_400 * 1_000_000
EWMA_SCALE = 1000


def ewma_event_rate(sf_dir: str) -> rd.Dataset:
    """Per-type daily event-rate EWMA — the smoothed rate monitor
    behind every traffic-anomaly alert: counts per (type, epoch day)
    on a zero-filled contiguous day spine, then the exponential
    moving average ``s_d = (7*s_{{d-1}} + 1000*n_d) // 8`` (alpha =
    1/8, milli-scaled so the integer recurrence keeps resolution;
    s_{{d0}} = 1000*n_{{d0}}). Pure-integer recurrence — bit-exact vs
    a WITH RECURSIVE DuckDB oracle stepping the same fold.

    Shape: one combiner groupby folds the corpus to O(types × days)
    count cells; the global day bounds are two scalar aggregates; the
    sequential EWMA fold then runs INSIDE one map_groups per type
    (the series is inherently ordered — the loop is over ~days per
    group, never over events). Returns (event_type, day, n_events,
    ewma_milli)."""
    import pyarrow.compute as pc

    ds = _read_table(sf_dir, "events", ["event_type", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "day": pc.divide(us, DAY_US)})

    days = ds.map_batches(to_day, batch_format="pyarrow")
    bounds = days.aggregate(Min("day"), Max("day"))
    d0, d1 = int(bounds["min(day)"]), int(bounds["max(day)"])

    counts = (days.groupby(["event_type", "day"])
              .aggregate(Count(alias_name="n")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "day": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "ewma_milli": pd.Series([], dtype="int64")})
        et = g["event_type"].iloc[0]
        spine = np.zeros(d1 - d0 + 1, np.int64)
        spine[g["day"].to_numpy(np.int64) - d0] = g["n"].to_numpy(np.int64)
        s = np.empty_like(spine)
        acc = EWMA_SCALE * int(spine[0])
        s[0] = acc
        for i in range(1, len(spine)):
            acc = (7 * acc + EWMA_SCALE * int(spine[i])) // 8
            s[i] = acc
        return pd.DataFrame({"event_type": et,
                             "day": np.arange(d0, d1 + 1, dtype=np.int64),
                             "n_events": spine,
                             "ewma_milli": s})

    return counts.groupby("event_type").map_groups(
        fold, batch_format="pandas")


def ewma_event_rate_sql() -> str:
    return f"""
WITH RECURSIVE ev AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day FROM events
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
cnts AS (SELECT event_type, day, count(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT t.event_type, r.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds) r
  LEFT JOIN cnts c ON c.event_type = t.event_type AND c.day = r.day
), rec AS (
  SELECT event_type, day, n, CAST({EWMA_SCALE} * n AS BIGINT) AS s
  FROM spine WHERE day = (SELECT d0 FROM bounds)
  UNION ALL
  SELECT sp.event_type, sp.day, sp.n,
         (7 * rec.s + {EWMA_SCALE} * sp.n) // 8
  FROM rec JOIN spine sp
    ON sp.event_type = rec.event_type AND sp.day = rec.day + 1
)
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(n AS BIGINT) AS n_events, CAST(s AS BIGINT) AS ewma_milli
FROM rec"""


# ---------------------------------------------------------------------------
# product quantization (session 7)
# ---------------------------------------------------------------------------


def embedding_pq(sf_dir: str, m: int = 4, k: int = 16,
                 iters: int = 4) -> rd.Dataset:
    """Product quantization (Jégou et al. 2011) — the ANN
    memory-compression path past SQ8 (``embedding_quantize``): split
    each 64-dim vector into ``m`` contiguous subspaces, k-means each
    subspace independently (the SQL-replicable ``init_ids=[0..k-1]``
    variant, stages/similarity.py:kmeans_fit), and store each vector
    as ``m`` one-byte codes — 64×4 B → 4 B per vector, the difference
    between an in-RAM and an on-disk ANN index at 100 TB. Returns the
    code table (vec_id, code_0..code_{m-1}).

    Shape: the input materializes ONCE; each subspace's fit folds
    fixed-size (k×sub sums, k counts) partials (never vectors to the
    driver); the m codebooks then broadcast via ``ray.put`` into ONE
    fused assignment map. Exactness: assignment replays kmeans_fit's
    float64 distance (argmin, first-min tie-break = lowest code) —
    the kmeans_clusters margin argument (cross-engine noise ~1e-13 vs
    measured assignment margins orders wider) applies per subspace."""
    dim = 64
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    ds = _read_table(sf_dir, "embeddings",
                     ["vec_id", "embedding"]).materialize()

    codebooks = []
    for s in range(m):
        lo = s * sub

        def slice_s(t: pa.Table, lo=lo) -> pa.Table:
            X = np.asarray(t["embedding"].to_pylist(),
                           np.float64)[:, lo:lo + sub]
            return pa.table({"vec_id": t["vec_id"],
                             "embedding": pa.array(X.tolist(),
                                                   pa.list_(pa.float64()))})

        sliced = ds.map_batches(slice_s,
                                batch_format="pyarrow").materialize()
        cents, _hist = sim.kmeans_fit(sliced, k=k, iters=iters,
                                      init_ids=list(range(k)))
        codebooks.append(cents)

    import ray as _ray
    cref = _ray.put(np.stack(codebooks))     # m × k × sub

    def assign(t: pa.Table) -> pa.Table:
        C = _ray.get(cref)
        X = np.asarray(t["embedding"].to_pylist(), np.float64)
        cols = {"vec_id": t["vec_id"]}
        for s in range(m):
            Xs = X[:, s * sub:(s + 1) * sub]
            Cs = C[s]
            d = ((Xs * Xs).sum(axis=1, keepdims=True)
                 - 2.0 * (Xs @ Cs.T)
                 + (Cs * Cs).sum(axis=1))
            cols[f"code_{s}"] = pa.array(
                np.argmin(d, axis=1).astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def embedding_pq_sql(m: int = 4, k: int = 16, iters: int = 4,
                     dim: int = 64) -> str:
    """One unrolled-Lloyd CTE chain PER SUBSPACE (the prefixed
    ``_kmeans_sql_parts``), joined back on vec_id. DuckDB list slices
    are 1-based inclusive."""
    sub = dim // m
    parts: list[str] = []
    for s in range(m):
        lo = s * sub
        src = (f"(SELECT vec_id, (CAST(embedding AS DOUBLE[]))"
               f"[{lo + 1}:{lo + sub}] AS embedding FROM embeddings)")
        parts.extend(_kmeans_sql_parts(src, k, iters, sub, pfx=f"s{s}"))
    sel = ", ".join(f"CAST(s{s}.cid AS BIGINT) AS code_{s}"
                    for s in range(m))
    joins = " ".join(f"JOIN s{s}afinal s{s} USING (vec_id)"
                     for s in range(1, m))
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT s0.vec_id, {sel} FROM s0afinal s0 {joins}")


# ---------------------------------------------------------------------------
# entity resolution: blocking + edit-distance verify (session 7)
# ---------------------------------------------------------------------------

ER_THRESHOLD = 4      # max edits for a verified match
ER_MOD_A, ER_OFF_A = 11, 300_000   # single planted copy per 11th doc
ER_MOD_B, ER_OFF_B = 33, 600_000   # second copy -> 3-member blocks


def _lev(a: bytes, b: bytes) -> int:
    """Unit-cost Levenshtein, numpy row DP — the insertion chain
    (cur[j] = cur[j-1]+1) folds via the cummin-minus-arange identity,
    so every row is fully vectorized (never a per-cell Python loop)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b, np.uint8).astype(np.int64)
    n = len(bv)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(a, 1):
        cost = (bv != ca).astype(np.int64)
        t = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        seed = np.concatenate(([i], t))
        prev = np.minimum.accumulate(seed - idx) + idx
    return int(prev[-1])


def _docs_with_planted_edits(sf_dir: str) -> rd.Dataset:
    """documents ∪ '@'-prepended copies: every 11th doc gets a copy
    with 1..8 leading '@'s (edit distance == prepend count — '@' never
    appears in the corpus), every 33rd doc a SECOND copy with 2..6,
    making 3-member blocks whose copy-vs-copy distance is the prepend
    DIFFERENCE (including an exact-dup 0 at doc 66 by CRT). Pure
    functions of doc_id, so the SQL oracle replants identically."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"].to_pylist()
        out_i, out_t = list(ids), list(txt)
        for i, x in zip(ids, txt):
            if i % ER_MOD_A == 0:
                out_i.append(int(i) + ER_OFF_A)
                out_t.append("@" * (1 + int(i) % 8) + x)
            if i % ER_MOD_B == 0:
                out_i.append(int(i) + ER_OFF_B)
                out_t.append("@" * (2 + int(i) % 5) + x)
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    return base.map_batches(plant, batch_format="pyarrow")


def er_blocked_pairs(sf_dir: str, threshold: int = ER_THRESHOLD,
                     key_chars: int = 24,
                     block_cap: int = 1000,
                     num_partitions: int = 32) -> rd.Dataset:
    """Entity resolution, the blocking + verify shape (Fellegi–Sunter
    pipelines, dedup's record-linkage sibling): blocking key = the
    document's LAST ``key_chars`` characters (edits cluster at heads —
    title churn, injected banners — so tails are the stabler block
    key; the planted copies prepend), candidate pairs form only
    WITHIN a block, and each candidate is verified by exact unit-cost
    edit distance ≤ ``threshold``. Returns (a, b, dist), a < b.

    Shape: ONE block-key-hash shuffle (the hash only routes; pairs
    form per actual key string); per-partition pair generation is
    id-ordered within block, and the O(len²) DP verify runs only on
    candidates — never all pairs. Blocks above ``block_cap`` members
    raise (a quadratic block is a blocking-key design error; capping
    silently would diverge from the oracle)."""
    from ..functions.hashing import stable_hash64

    P = num_partitions
    ds = _docs_with_planted_edits(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        keys = [x[-key_chars:] for x in txt]
        kp = np.fromiter((stable_hash64(k) & (P - 1) for k in keys),
                         np.int64, len(keys))
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "bk": pa.array(keys, pa.string()),
                         "_kp": pa.array(kp, pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list[int] = []
        out_b: list[int] = []
        out_d: list[int] = []
        for _, blk in g.groupby("bk", sort=False):
            if len(blk) < 2:
                continue
            if len(blk) > block_cap:
                raise ValueError(
                    f"block of {len(blk)} exceeds block_cap={block_cap}: "
                    "the blocking key is too coarse for this corpus")
            blk = blk.sort_values("doc_id")
            ids = blk["doc_id"].to_numpy(np.int64)
            txt = [x.encode() for x in blk["text"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    # cheap length prune: |len(a)-len(b)| lower-bounds
                    # the distance
                    if abs(len(txt[i]) - len(txt[j])) > threshold:
                        continue
                    d = _lev(txt[i], txt[j])
                    if d <= threshold:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
                        out_d.append(d)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "dist": pd.Series(out_d, dtype="int64")})

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("_kp").map_groups(pairs, batch_format="pandas"))


def er_blocked_pairs_sql(threshold: int = ER_THRESHOLD,
                         key_chars: int = 24) -> str:
    return f"""
WITH all_d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {ER_OFF_A}, repeat('@', 1 + doc_id % 8) || text
  FROM documents WHERE doc_id % {ER_MOD_A} = 0
  UNION ALL
  SELECT doc_id + {ER_OFF_B}, repeat('@', 2 + doc_id % 5) || text
  FROM documents WHERE doc_id % {ER_MOD_B} = 0
), keyed AS (
  SELECT doc_id, text,
         substr(text, greatest(1, length(text) - {key_chars - 1})) AS bk
  FROM all_d
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= {threshold}
  AND abs(length(a.text) - length(b.text)) <= {threshold}"""


# ---------------------------------------------------------------------------
# more-like-this related documents (session 7)
# ---------------------------------------------------------------------------

MLT_QUERY_MOD = 101   # every 101st doc is a "find related" query
MLT_TOP_TERMS = 3     # query = the doc's top-3 integer-TF-IDF terms
MLT_TOPK = 5


def mlt_related_docs(sf_dir: str, top_terms: int = MLT_TOP_TERMS,
                     k: int = MLT_TOPK,
                     query_mod: int = MLT_QUERY_MOD) -> rd.Dataset:
    """More-like-this related documents — the "related articles" /
    recommendation primitive (Lucene's MoreLikeThis): each query
    document is summarized to its ``top_terms`` highest integer-TF-IDF
    terms (the tfidf_top_terms kernel — corpus-wide df, so the terms
    are the doc's most DISCRIMINATIVE, not its most frequent), and
    those terms run as a BM25 query over the corpus with the query doc
    itself excluded. Returns (query_id, doc_id, score, rank) — two
    whole oracle families composed (the search_ranked pattern).

    Shape: the TF-IDF pass is the existing two-cogroup pipeline; the
    derived query table collapses to O(queries × top_terms) driver
    rows (bounded by query_mod — never the corpus); scoring reuses
    _bm25_scan's broadcast-stats + partial-top-k scan."""
    tt = tfidf_top_terms(sf_dir, top=top_terms)

    def only_queries(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % query_mod == 0))

    qt = tt.map_batches(only_queries, batch_format="pyarrow")
    rows = qt.take_all()    # O(n_docs/query_mod × top_terms) — bounded
    queries: dict[int, tuple] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rank"])):
        queries.setdefault(int(r["doc_id"]), [])
        queries[int(r["doc_id"])].append(r["word"])
    queries = {q: tuple(ws) for q, ws in queries.items()}
    return _bm25_scan(_docs(sf_dir, ["doc_id", "text"]), queries, k,
                      exclude_self=True)


def mlt_related_docs_sql(top_terms: int = MLT_TOP_TERMS,
                         k: int = MLT_TOPK,
                         query_mod: int = MLT_QUERY_MOD) -> str:
    """TF-IDF term derivation (prefixed CTEs) feeding the BM25 kernel
    as the query table; self-matches excluded."""
    return f"""
WITH ttc AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
), tdf AS (SELECT word, count(*) AS d FROM ttc GROUP BY word),
tn AS (SELECT count(*) AS nn FROM documents),
q AS (
  SELECT doc_id AS query_id, word FROM (
    SELECT ttc.doc_id, ttc.word,
           row_number() OVER (PARTITION BY ttc.doc_id
               ORDER BY ttc.c * ((tn.nn * 1000) // tdf.d) DESC,
                        ttc.word) AS rank
    FROM ttc JOIN tdf USING (word) CROSS JOIN tn
    WHERE ttc.doc_id % {query_mod} = 0
  ) WHERE rank <= {top_terms}
), w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tc AS (
  SELECT doc_id, word, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS word FROM w)
  GROUP BY doc_id, word
), dl AS (SELECT doc_id, len(w) AS dl FROM w),
n AS (SELECT count(*) AS n, sum(len(w)) AS t FROM w),
df AS (SELECT word, count(*) AS df FROM tc
       WHERE word IN (SELECT word FROM q) GROUP BY word),
terms AS (
  SELECT q.query_id, tc.doc_id,
         (((n.n * 1000) // df.df) * 22 * tc.tf * n.t)
           // (n.t * (10 * tc.tf + 3) + 9 * dl.dl * n.n) AS s
  FROM q JOIN tc USING (word) JOIN df USING (word)
  JOIN dl ON tc.doc_id = dl.doc_id CROSS JOIN n
  WHERE tc.doc_id <> q.query_id
), scored AS (
  SELECT query_id, doc_id, sum(s) AS score
  FROM terms GROUP BY query_id, doc_id HAVING sum(s) > 0
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, CAST(score AS BIGINT) AS score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# data-quality table profiler (session 7)
# ---------------------------------------------------------------------------

# null plants (pure functions of event_id so the oracle replants): the
# generated table has no nulls, and a profiler that never sees one is
# untested on its main job
PROF_NULL_CENTS_MOD, PROF_NULL_CENTS_RES = 17, 3
PROF_NULL_PROPS_MOD, PROF_NULL_PROPS_RES = 23, 7


def events_profile(sf_dir: str) -> rd.Dataset:
    """Table profiler — the data-quality census (row counts, null
    counts, exact distinct cardinality, min/max per column) every
    ingestion pipeline runs before trusting a new snapshot
    (Great-Expectations/Deequ shape). Columns canonicalize first
    (value → BIGINT cents, ts → epoch µs) — fixed-decimal
    canonicalization is part of the profiler contract, so no float
    ever reaches the compare; min/max render as VARCHAR of the TYPED
    min/max (never a lexicographic min over digit strings).

    Shape: ONE pass folds per-block fixed-size partials (6 columns ×
    counts/min/max — driver state O(blocks × columns)); the exact
    distinct counts ride the chained-combiner distinct shape
    (per-block DISTINCT (col, value) rows → one groupby distinct →
    one tiny groupby(col) count — the users_per_type_exact pattern;
    the HLL sketch is the approximate twin at wider cardinalities).
    Returns (col_name, n_rows, n_null, n_distinct, min_v, max_v)."""
    ds = _read_table(sf_dir, "events")

    NUM_COLS = ("event_id", "user_id", "cents", "ts_us")
    STR_COLS = ("event_type", "props")

    def canon(t: pa.Table) -> dict[str, np.ndarray | list]:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(t["value"].to_numpy() * 100.0).astype(np.int64)
        cents_null = eid % PROF_NULL_CENTS_MOD == PROF_NULL_CENTS_RES
        props = t["props"].to_pylist()
        props = [None if i % PROF_NULL_PROPS_MOD == PROF_NULL_PROPS_RES
                 else p for i, p in zip(eid, props)]
        ts_us = (t["ts"].combine_chunks().cast(pa.timestamp("us"))
                 .cast(pa.int64()).to_numpy().astype(np.int64))
        return {
            "event_id": (eid, None),
            "user_id": (t["user_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), None),
            "cents": (cents, cents_null),
            "ts_us": (ts_us, None),
            "event_type": (t["event_type"].to_pylist(), None),
            "props": (props, None),
        }

    def stats_partial(t: pa.Table) -> pa.Table:
        cols = canon(t)
        rows = {"col_name": [], "n": [], "n_null": [],
                "mn_i": [], "mx_i": [], "mn_s": [], "mx_s": []}
        for c in NUM_COLS + STR_COLS:
            vals, nullmask = cols[c]
            rows["col_name"].append(c)
            if c in NUM_COLS:
                v = np.asarray(vals)
                if nullmask is not None:
                    nn = int(nullmask.sum())
                    v = v[~nullmask]
                else:
                    nn = 0
                rows["n"].append(len(v) + nn)
                rows["n_null"].append(nn)
                rows["mn_i"].append(int(v.min()) if len(v) else 2**62)
                rows["mx_i"].append(int(v.max()) if len(v) else -2**62)
                rows["mn_s"].append("")
                rows["mx_s"].append("")
            else:
                nn = sum(1 for x in vals if x is None)
                nv = [x for x in vals if x is not None]
                rows["n"].append(len(vals))
                rows["n_null"].append(nn)
                rows["mn_i"].append(0)
                rows["mx_i"].append(0)
                rows["mn_s"].append(min(nv) if nv else "\U0010ffff")
                rows["mx_s"].append(max(nv) if nv else "")
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    # fixed-size per-block stat partials fold on the driver (the bm25
    # stats precedent — O(blocks × columns), never rows)
    agg: dict[str, list] = {}
    for b in (ds.map_batches(stats_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for i in range(b.num_rows):
            c = b["col_name"][i].as_py()
            cur = agg.setdefault(c, [0, 0, 2**62, -2**62,
                                     "\U0010ffff", ""])
            cur[0] += b["n"][i].as_py()
            cur[1] += b["n_null"][i].as_py()
            cur[2] = min(cur[2], b["mn_i"][i].as_py())
            cur[3] = max(cur[3], b["mx_i"][i].as_py())
            cur[4] = min(cur[4], b["mn_s"][i].as_py())
            cur[5] = max(cur[5], b["mx_s"][i].as_py())

    def distinct_rows(t: pa.Table) -> pa.Table:
        cols = canon(t)
        out_c, out_v = [], []
        for c in NUM_COLS + STR_COLS:
            vals, nullmask = cols[c]
            if c in NUM_COLS:
                v = np.asarray(vals)
                if nullmask is not None:
                    v = v[~nullmask]
                for u in np.unique(v):
                    out_c.append(c)
                    out_v.append(str(int(u)))
            else:
                for u in sorted({x for x in vals if x is not None}):
                    out_c.append(c)
                    out_v.append(u)
        return pa.table({"col_name": pa.array(out_c, pa.string()),
                         "v": pa.array(out_v, pa.string())})

    ndist = (ds.map_batches(distinct_rows, batch_format="pyarrow")
             .groupby(["col_name", "v"]).aggregate(Count(alias_name="_c"))
             .groupby("col_name").aggregate(Count(alias_name="n_distinct"))
             .to_pandas().set_index("col_name")["n_distinct"])

    rows = []
    for c in NUM_COLS + STR_COLS:
        n, nn, mni, mxi, mns, mxs = agg[c]
        if c in NUM_COLS:
            mn, mx = str(mni), str(mxi)
        else:
            mn, mx = mns, mxs
        rows.append({"col_name": c, "n_rows": n, "n_null": nn,
                     "n_distinct": int(ndist[c]), "min_v": mn, "max_v": mx})
    return rd.from_pandas(pd.DataFrame(rows))


def events_profile_sql() -> str:
    cols = []
    for c in ("event_id", "user_id", "cents", "ts_us"):
        cols.append(f"""
SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_v,
       CAST(max({c}) AS VARCHAR) AS max_v
FROM ev""")
    for c in ("event_type", "props"):
        cols.append(f"""
SELECT '{c}', CAST(count(*) AS BIGINT),
       CAST(count(*) - count({c}) AS BIGINT),
       CAST(count(DISTINCT {c}) AS BIGINT), min({c}), max({c})
FROM ev""")
    union = "\nUNION ALL".join(cols)
    return f"""
WITH ev AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % {PROF_NULL_CENTS_MOD} =
                   {PROF_NULL_CENTS_RES} THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
         CASE WHEN event_id % {PROF_NULL_PROPS_MOD} =
                   {PROF_NULL_PROPS_RES} THEN NULL
              ELSE props END AS props,
         epoch_us(ts) AS ts_us, event_type
  FROM events
){union}"""


# ---------------------------------------------------------------------------
# search snippets (KWIC) — session 7
# ---------------------------------------------------------------------------

SNIPPET_RADIUS = 2   # words each side of the first query-term hit


def search_snippets(sf_dir: str, radius: int = SNIPPET_RADIUS) -> rd.Dataset:
    """Keyword-in-context snippet generation — the serving half of
    search (what a result page actually shows): for every BM25
    candidate, the 2R+1-word window around the FIRST occurrence of
    any of its query's terms (earliest position wins; a candidate
    always contains ≥1 term — BM25 score > 0 requires tf > 0).
    Returns (query_id, doc_id, rank, hit_pos, snippet); hit_pos is
    the 1-based word position.

    Shape: candidates are top-k per query (tiny by construction);
    their ids broadcast as a set, the corpus filters map-side to
    candidate docs ONLY, and snippet assembly is per-candidate-row
    work — the corpus is never re-shuffled (the search_ranked
    stage-2 discipline)."""
    import ray

    cand = bm25_topk(sf_dir).materialize()
    rows = cand.take_all()        # k × |queries| — bounded
    want: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        want.setdefault(int(r["doc_id"]), []).append(
            (int(r["query_id"]), int(r["rank"])))
    wref = ray.put(want)

    def snip(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        out = {"query_id": [], "doc_id": [], "rank": [],
               "hit_pos": [], "snippet": []}
        for doc, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            hits = w.get(int(doc))
            if not hits:
                continue
            words = (text or "").split(" ")
            for qid, rank in hits:
                terms = BM25_QUERIES[qid]
                first = min((words.index(term) for term in terms
                             if term in words), default=None)
                if first is None:
                    continue   # unreachable for BM25 candidates
                lo = max(0, first - radius)
                out["query_id"].append(qid)
                out["doc_id"].append(int(doc))
                out["rank"].append(rank)
                out["hit_pos"].append(first + 1)
                out["snippet"].append(
                    " ".join(words[lo:first + radius + 1]))
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "hit_pos": pa.array(out["hit_pos"], pa.int64()),
            "snippet": pa.array(out["snippet"], pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        snip, batch_format="pyarrow")


def search_snippets_sql(radius: int = SNIPPET_RADIUS) -> str:
    """The bm25 oracle as a subquery CTE; first hit = min over the
    query's terms of list_position (1-based, NULL when absent);
    snippet = the inclusive 1-based list slice rendered with
    array_to_string."""
    return f"""
WITH cands AS (SELECT * FROM ({bm25_topk_sql()})),
qt AS (SELECT * FROM ({_bm25_queries_values_sql()})),
w AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS w
  FROM documents d
  WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM cands)
), firsts AS (
  SELECT c.query_id, c.doc_id, c.rank,
         min(list_position(w.w, qt.word)) AS hit_pos
  FROM cands c
  JOIN qt ON qt.query_id = c.query_id
  JOIN w ON w.doc_id = c.doc_id
  WHERE list_position(w.w, qt.word) IS NOT NULL
  GROUP BY c.query_id, c.doc_id, c.rank
)
SELECT f.query_id, f.doc_id, f.rank,
       CAST(f.hit_pos AS BIGINT) AS hit_pos,
       array_to_string(w.w[greatest(1, f.hit_pos - {radius})
                           :f.hit_pos + {radius}], ' ') AS snippet
FROM firsts f JOIN w ON w.doc_id = f.doc_id"""


def _bm25_queries_values_sql() -> str:
    qrows = ", ".join(f"({qid}, '{w}')"
                      for qid, terms in sorted(BM25_QUERIES.items())
                      for w in terms)
    return f"SELECT * FROM (VALUES {qrows}) AS q(query_id, word)"


# ---------------------------------------------------------------------------
# incremental materialized-view maintenance (session 7)
# ---------------------------------------------------------------------------

# snapshot-B plant (pure doc_id functions — the pages_delta convention):
MV_REMOVED_MOD, MV_REMOVED_RES = 37, 5
MV_CHANGED_MOD, MV_CHANGED_RES = 29, 11
MV_ADDED_MOD, MV_ADDED_RES = 41, 7
MV_ADDED_OFF = 1 << 40   # above any real doc_id — synthesized added-doc
#                          ids must never collide with corpus ids


def _mv_changed_text(doc_id: int, text: str) -> str:
    return text + " delta-marker-" + str(doc_id % 7)


def _mv_added_text(doc_id: int) -> str:
    return "added doc " + str(doc_id)


def section_stats_incremental(sf_dir: str) -> rd.Dataset:
    """Incremental materialized-view maintenance — the streaming-
    warehouse algebra (new_MV = old_MV + Δ⁺ − Δ⁻) over the per-section
    corpus stats view (n_docs, n_chars, n_tokens per source): given
    the standing stats of snapshot A and a delta (removed / changed /
    added docs), the update pass computes CORRECTION partials from the
    delta rows ONLY and folds them into the standing stats with one
    tiny groupby — unchanged rows are never re-measured. The oracle
    recomputes snapshot B from scratch; equality proves the
    maintenance algebra (the refresh_extraction equality discipline).

    The delta is planted (pure doc_id functions, so SQL replants):
    every 37th doc removed, every 29th re-written with an appended
    marker (removal wins when both hit), every 41st spawning a new
    added doc. Returns (section, n_docs, n_chars, n_tokens)."""
    def stats_partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        txt = t["text"].to_pylist()
        rows: dict[str, list] = {"section": [], "d": [], "c": [], "k": []}
        acc: dict[str, list[int]] = {}
        for s, x in zip(src, txt):
            a = acc.setdefault(s, [0, 0, 0])
            a[0] += 1
            a[1] += len(x)
            a[2] += len(x.split(" "))
        for s, (d, c, k) in sorted(acc.items()):
            rows["section"].append(s)
            rows["d"].append(d)
            rows["c"].append(c)
            rows["k"].append(k)
        return pa.table({
            "section": pa.array(rows["section"], pa.string()),
            "d": pa.array(rows["d"], pa.int64()),
            "c": pa.array(rows["c"], pa.int64()),
            "k": pa.array(rows["k"], pa.int64())})

    base = _docs(sf_dir, ["doc_id", "source", "text"])
    standing = base.map_batches(stats_partial, batch_format="pyarrow")

    def corrections(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = t["source"].to_pylist()
        txt = t["text"].to_pylist()
        acc: dict[str, list[int]] = {}
        for i, s, x in zip(ids, src, txt):
            i = int(i)
            a = acc.setdefault(s, [0, 0, 0])
            removed = i % MV_REMOVED_MOD == MV_REMOVED_RES
            if removed:
                a[0] -= 1
                a[1] -= len(x)
                a[2] -= len(x.split(" "))
            elif i % MV_CHANGED_MOD == MV_CHANGED_RES:
                nx = _mv_changed_text(i, x)
                a[1] += len(nx) - len(x)
                a[2] += len(nx.split(" ")) - len(x.split(" "))
            if i % MV_ADDED_MOD == MV_ADDED_RES:
                ax = _mv_added_text(i)
                a[0] += 1
                a[1] += len(ax)
                a[2] += len(ax.split(" "))
        rows = {"section": [], "d": [], "c": [], "k": []}
        for s, (d, c, k) in sorted(acc.items()):
            if d or c or k:
                rows["section"].append(s)
                rows["d"].append(d)
                rows["c"].append(c)
                rows["k"].append(k)
        return pa.table({
            "section": pa.array(rows["section"], pa.string()),
            "d": pa.array(rows["d"], pa.int64()),
            "c": pa.array(rows["c"], pa.int64()),
            "k": pa.array(rows["k"], pa.int64())})

    delta = base.map_batches(corrections, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"section": t["section"],
                         "n_docs": t["sum(d)"],
                         "n_chars": t["sum(c)"],
                         "n_tokens": t["sum(k)"]})

    return (standing.union(delta)
            .groupby("section")
            .aggregate(Sum("d"), Sum("c"), Sum("k"))
            .map_batches(rename, batch_format="pyarrow"))


def section_stats_incremental_sql() -> str:
    return f"""
WITH b AS (
  SELECT source,
         CASE WHEN doc_id % {MV_CHANGED_MOD} = {MV_CHANGED_RES}
              THEN text || ' delta-marker-'
                   || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS text
  FROM documents
  WHERE doc_id % {MV_REMOVED_MOD} <> {MV_REMOVED_RES}
  UNION ALL
  SELECT source, 'added doc ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % {MV_ADDED_MOD} = {MV_ADDED_RES}
)
SELECT source AS section, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM b GROUP BY source"""


# ---------------------------------------------------------------------------
# z-score anomaly detection (session 8) — exact integer 3-sigma rule
# ---------------------------------------------------------------------------

OUTLIER_MOD, OUTLIER_RES, OUTLIER_MULT = 211, 13, 50


def value_outliers(sf_dir: str) -> rd.Dataset:
    """Per-type 3-sigma anomaly detection over event values — the
    metric-monitoring op every ingestion pipeline runs, EXACT in
    integers: a row is an outlier iff (n·c − S)² > 9·(n·Q − S²)
    (⟺ |z| > 3 under population variance, without ever forming a
    float mean or stddev), where
    c = planted cents and (n, S, Q) are the type's count / Σc / Σc².

    Plant: every event with event_id % 211 == 13 has its cents ×50
    (the generated value column is too well-behaved to contain real
    3-sigma outliers — uniform maxes out at |z| ≈ √3; the plant is a
    pure event_id function so the oracle replants).

    Shape: pass 1 folds each block to ≤|types| (type, n, S, Q) partial
    rows — int64-safe per block (c ≤ ~2e6, c² ≤ 4e12, rows/block ≤
    ~1e5) — and the driver folds the tiny partials table in Python
    bigints (O(blocks × types) driver rows, the events_profile bound).
    Per-type integer CUTOFFS c_lo/c_hi derive once via math.isqrt
    (x² > t ⟺ |x| > isqrt(t) for integer x), broadcast, and pass 2 is
    a pure map-side filter — no second exchange, no per-row bigints.
    Returns flagged rows (event_id, event_type, cents)."""
    import math

    import pyarrow.compute as pc

    ds = _read_table(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        c = cents.to_numpy(zero_copy_only=False).copy()
        planted = ids % OUTLIER_MOD == OUTLIER_RES
        c[planted] *= OUTLIER_MULT
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "cents": pa.array(c, pa.int64())})

    cented = ds.map_batches(to_cents, batch_format="pyarrow")

    def stat_partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        c = t["cents"].to_numpy(zero_copy_only=False)
        acc: dict[str, list[int]] = {}
        for typ, v in zip(et, c):
            a = acc.setdefault(typ, [0, 0, 0])
            a[0] += 1
            a[1] += int(v)
            a[2] += int(v) * int(v)
        keys = sorted(acc)
        return pa.table({
            "event_type": pa.array(keys, pa.string()),
            "n": pa.array([acc[k][0] for k in keys], pa.int64()),
            "s": pa.array([acc[k][1] for k in keys], pa.int64()),
            "q": pa.array([acc[k][2] for k in keys], pa.int64())})

    # tiny: O(blocks × types) rows; the global fold runs in Python
    # bigints (a distributed int64 Sum of q would overflow at ~1e12
    # rows — the bigram_lift lesson)
    parts = cented.map_batches(stat_partial,
                               batch_format="pyarrow").take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["event_type"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["s"])
        a[2] += int(r["q"])
    cuts: dict[str, tuple[int, int]] = {}
    for typ, (n, s, q) in agg.items():
        t9 = 9 * (n * q - s * s)
        root = math.isqrt(t9)
        # outlier ⟺ n·c > s + root  or  n·c < s − root; rearranged to
        # per-row int64 cutoffs: c ≥ c_hi or c ≤ c_lo (exact floor-div
        # algebra, safe for negative numerators)
        cuts[typ] = ((s - root - 1) // n, (s + root) // n + 1)
    import ray

    cref = ray.put(cuts)

    def flag(t: pa.Table) -> pa.Table:
        cu = ray.get(cref)
        et = t["event_type"].to_pylist()
        c = t["cents"].to_numpy(zero_copy_only=False)
        lo = np.fromiter((cu[x][0] for x in et), np.int64, len(et))
        hi = np.fromiter((cu[x][1] for x in et), np.int64, len(et))
        return t.filter(pa.array((c <= lo) | (c >= hi)))

    return cented.map_batches(flag, batch_format="pyarrow")


def value_outliers_sql() -> str:
    """HUGEINT replay of the exact rule — (n·c − S)² > 9·(n·Q − S²)
    directly in int128 (the engine's isqrt cutoff form is equivalent:
    for integer x and t ≥ 0, x² > t ⟺ |x| > isqrt(t))."""
    return f"""
WITH ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) *
           CASE WHEN event_id % {OUTLIER_MOD} = {OUTLIER_RES}
                THEN {OUTLIER_MULT} ELSE 1 END AS cents
  FROM events
), st AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(cents) AS HUGEINT) AS s,
         sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS q
  FROM ev GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.cents
FROM ev e JOIN st USING (event_type)
WHERE (st.n * e.cents - st.s) * (st.n * e.cents - st.s)
      > 9 * (st.n * st.q - st.s * st.s)"""


# ---------------------------------------------------------------------------
# weighted sampling (session 8) — deterministic priority sample
# ---------------------------------------------------------------------------

WS_TOPK = 64


def weighted_sample(sf_dir: str, k: int = WS_TOPK) -> rd.Dataset:
    """Deterministic weighted sampling without replacement — the
    training-mix primitive "sample k docs with probability ∝ token
    count": priority = stable_hash64('ws:' + doc_id) // n_tokens, keep
    the k SMALLEST (tie → doc_id). For uniform h, p < T ⟺ h < T·w, so
    selection probability is ∝ weight (hash-priority sampling — the
    deterministic sibling of Efraimidis–Spirakis u^(1/w), with integer
    division replacing the float power so both engines agree exactly).

    Shape: one map-side pass computes (doc_id, n_tokens, pri); each
    block keeps its k smallest (partial top-k), then the tiny
    survivors sort+limit — never a global sort of the corpus. Returns
    (doc_id, n_tokens, pri, rank)."""
    from ..functions.hashing import stable_hash64

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = np.fromiter((len((x or "").split(" "))
                            for x in t["text"].to_pylist()),
                           np.int64, t.num_rows)
        h = np.fromiter((stable_hash64(f"ws:{int(d)}") for d in ids),
                        np.uint64, t.num_rows).astype(np.int64)
        pri = h // toks
        order = np.lexsort((ids, pri))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order].astype(np.int64), pa.int64()),
            "n_tokens": pa.array(toks[order], pa.int64()),
            "pri": pa.array(pri[order], pa.int64())})

    merged = (_docs(sf_dir, ["doc_id", "text"])
              .map_batches(score, batch_format="pyarrow")
              .sort(["pri", "doc_id"]).limit(k))

    def rank(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
            "pri": t["pri"],
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))})

    return merged.repartition(1).map_batches(rank, batch_format="pyarrow")


def weighted_sample_sql(k: int = WS_TOPK) -> str:
    h = _sql_hash64("sha256('ws:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH w AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST({h} AS BIGINT) // len(string_split(text, ' ')) AS pri
  FROM documents
)
SELECT doc_id, n_tokens, pri,
       CAST(row_number() OVER (ORDER BY pri, doc_id) AS BIGINT) AS rank
FROM w
QUALIFY rank <= {k}"""


# ---------------------------------------------------------------------------
# cross-snapshot vocabulary drift (session 8)
# ---------------------------------------------------------------------------

DRIFT_SCALE = 1 << 20   # rates in parts-per-2^20; c*S stays int64 to N<2^43
DRIFT_TOPK = 50
_DRIFT_TOTAL = "\x00total"   # sentinel word (cannot tokenize from text)


def vocab_drift(sf_dir: str, k: int = DRIFT_TOPK) -> rd.Dataset:
    """Cross-snapshot vocabulary drift report — the corpus-monitoring
    op run between crawl snapshots ("which words surged / collapsed"):
    top-k words by |rate_B − rate_A| where rate = occurrences · 2²⁰ //
    total tokens (integer parts-per-2²⁰; the quantization floor means
    sub-ppm words report 0 drift — a drift REPORT is about common
    words by design). Snapshot B is the MV plant (removed %37, changed
    %29 appending a marker word, added %41 — pure doc_id functions, so
    the oracle replants).

    Shape: ONE pass over the corpus folds each block to (word, ca, cb)
    partial counts for BOTH sides plus a sentinel totals row (the dsir
    B+1-row trick); ONE groupby(word) sum; totals extract from the one
    sentinel row; the drift map + per-block partial top-k runs over
    the vocab table (ids-only, sublinear in corpus size). int64-safe
    while total tokens < 2^43 (~8.8e12); beyond that, widen SCALE
    handling to Python bigints per vocab row. Returns (word, ca, cb,
    drift) for the top-k by (|drift| DESC, word)."""
    base = _docs(sf_dir, ["doc_id", "source", "text"])

    def fold(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        acc: dict[str, list[int]] = {}
        ta = tb = 0
        for i, x in zip(ids, t["text"].to_pylist()):
            i = int(i)
            wa = (x or "").split(" ")
            ta += len(wa)
            for w in wa:
                acc.setdefault(w, [0, 0])[0] += 1
            removed = i % MV_REMOVED_MOD == MV_REMOVED_RES
            if not removed:
                wb = (_mv_changed_text(i, x)
                      if i % MV_CHANGED_MOD == MV_CHANGED_RES else x).split(" ")
                tb += len(wb)
                for w in wb:
                    acc.setdefault(w, [0, 0])[1] += 1
            if i % MV_ADDED_MOD == MV_ADDED_RES:
                wadd = _mv_added_text(i).split(" ")
                tb += len(wadd)
                for w in wadd:
                    acc.setdefault(w, [0, 0])[1] += 1
        acc[_DRIFT_TOTAL] = [ta, tb]
        keys = sorted(acc)
        return pa.table({
            "word": pa.array(keys, pa.string()),
            "a": pa.array([acc[w][0] for w in keys], pa.int64()),
            "b": pa.array([acc[w][1] for w in keys], pa.int64())})

    vocab = (base.map_batches(fold, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("a", alias_name="ca"),
                                        Sum("b", alias_name="cb"))
             ).materialize()   # consumed twice: totals row + drift scan

    import pyarrow.compute as pc
    tot = (vocab.map_batches(
        lambda t: t.filter(pc.equal(t["word"], _DRIFT_TOTAL)),
        batch_format="pyarrow").take_all())
    na = sum(int(r["ca"]) for r in tot)
    nb = sum(int(r["cb"]) for r in tot)

    def drift_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["word"], _DRIFT_TOTAL))
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        d = cb * DRIFT_SCALE // nb - ca * DRIFT_SCALE // na
        neg_abs = -np.abs(d)
        df = pd.DataFrame({"word": t["word"].to_pylist(),
                           "neg_abs": neg_abs})
        order = (df.sort_values(["neg_abs", "word"], kind="mergesort")
                 .index.to_numpy()[:k])
        kept = t.take(pa.array(order))
        return pa.table({"word": kept["word"], "ca": kept["ca"],
                         "cb": kept["cb"],
                         "drift": pa.array(d[order], pa.int64()),
                         "neg_abs": pa.array(neg_abs[order], pa.int64())})

    merged = (vocab.map_batches(drift_topk, batch_format="pyarrow")
              .sort(["neg_abs", "word"]).limit(k))
    return merged.drop_columns(["neg_abs"])


def vocab_drift_sql(k: int = DRIFT_TOPK) -> str:
    s = DRIFT_SCALE
    return f"""
WITH a AS (
  SELECT u.w AS word, CAST(count(*) AS BIGINT) AS ca
  FROM documents, unnest(string_split(text, ' ')) AS u(w) GROUP BY u.w
), bdocs AS (
  SELECT CASE WHEN doc_id % {MV_CHANGED_MOD} = {MV_CHANGED_RES}
              THEN text || ' delta-marker-' || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id % {MV_REMOVED_MOD} <> {MV_REMOVED_RES}
  UNION ALL
  SELECT 'added doc ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % {MV_ADDED_MOD} = {MV_ADDED_RES}
), b AS (
  SELECT u.w AS word, CAST(count(*) AS BIGINT) AS cb
  FROM bdocs, unnest(string_split(text, ' ')) AS u(w) GROUP BY u.w
), tot AS (
  SELECT (SELECT sum(ca) FROM a) AS na, (SELECT sum(cb) FROM b) AS nb
), j AS (
  SELECT coalesce(a.word, b.word) AS word,
         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb,
         CAST(coalesce(cb, 0) * {s} // nb
              - coalesce(ca, 0) * {s} // na AS BIGINT) AS drift
  FROM a FULL OUTER JOIN b ON a.word = b.word, tot
)
SELECT word, ca, cb, drift FROM j
QUALIFY row_number() OVER (ORDER BY abs(drift) DESC, word) <= {k}"""


# ---------------------------------------------------------------------------
# 7-day rolling distinct active users (session 8)
# ---------------------------------------------------------------------------

WAU_WINDOW_DAYS = 7


def _day_span(ds: rd.Dataset) -> tuple[int, int]:
    """(min, max) epoch day of an events dataset: per-block (min, max)
    partials, driver folds the tiny rows. Raises on an empty table
    (a span of nothing has no spine)."""
    def block_span(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64())})
        day = (t["ts"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // DAY_US)
        return pa.table({"d": pa.array([int(day.min()), int(day.max())],
                                       pa.int64())})

    rows = ds.map_batches(block_span, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("empty events table: no day span")
    return (min(r["d"] for r in rows), max(r["d"] for r in rows))


def _pad_day_spine(counts: rd.Dataset, lo: int, hi: int,
                   value_col: str) -> rd.Dataset:
    """Clip a per-day counts dataset to [lo, hi] and zero-fill the
    missing days (window fan-outs create phantom days past the span;
    days with an empty window must still report 0). O(span) driver
    rows for the spine."""
    def clip(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False)
        m = (d >= lo) & (d <= hi)
        return pa.table({
            "day": pa.array(d[m], pa.int64()),
            value_col: pa.array(
                t[value_col].to_numpy(zero_copy_only=False)[m],
                pa.int64())})

    spine = rd.from_arrow(pa.table({
        "day": pa.array(np.arange(lo, hi + 1, dtype=np.int64), pa.int64()),
        value_col: pa.array(np.zeros(hi - lo + 1, dtype=np.int64),
                            pa.int64())}))
    return (counts.map_batches(clip, batch_format="pyarrow")
            .union(spine).groupby("day")
            .aggregate(Sum(value_col, alias_name=value_col)))


def wau_daily(sf_dir: str, window: int = WAU_WINDOW_DAYS) -> rd.Dataset:
    """Rolling 7-day distinct active users per day (the WAU curve) —
    EXACT sliding-window COUNT(DISTINCT), the product-analytics op the
    approximate sketches (hll_users_per_type) don't answer: for every
    day in the table's [min, max] span, the number of distinct users
    with ≥1 event in the preceding 7 days (day−6 … day).

    Shape: events fold map-side to distinct (user, day) pairs per
    block, ONE groupby(packed key) dedupes globally (ids-only rows);
    each pair then fans out map-side to its ≤7 target window days, a
    second packed-key groupby dedupes (user, window_day) — a user
    active twice in one window counts once — and a final tiny groupby
    counts per day. The day spine pads zero-WAU days driver-side
    (O(span) rows). Returns (day, wau)."""
    import pyarrow.compute as pc

    ds = _read_table(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        us = t["user_id"].to_numpy(zero_copy_only=False)
        day = (t["ts"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // DAY_US)
        packed = np.unique(us.astype(np.int64) * (1 << 20) + day)
        return pa.table({"k": pa.array(packed, pa.int64())})

    # global distinct (user, day): groupby on the packed key (days
    # since epoch < 2^20 until year ~4840; user ids get the high bits)
    uday = (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("k").aggregate(Count()))

    def fan(t: pa.Table) -> pa.Table:
        kk = t["k"].to_numpy(zero_copy_only=False)
        out = np.concatenate([kk + off for off in range(window)])
        return pa.table({"k": pa.array(np.unique(out), pa.int64())})

    # distinct (user, window_day), then count users per day
    wday = (uday.map_batches(fan, batch_format="pyarrow")
            .groupby("k").aggregate(Count()))

    def per_day(t: pa.Table) -> pa.Table:
        d = pc.bit_wise_and(t["k"], (1 << 20) - 1)
        return pa.table({"day": pc.cast(d, pa.int64())})

    counts = (wday.map_batches(per_day, batch_format="pyarrow")
              .groupby("day").aggregate(Count())
              .map_batches(lambda t: pa.table(
                  {"day": t["day"], "wau": t["count()"]}),
                  batch_format="pyarrow"))

    lo, hi = _day_span(ds)
    return _pad_day_spine(counts, lo, hi, "wau")


def wau_daily_sql(window: int = WAU_WINDOW_DAYS) -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
), spine AS (
  SELECT unnest(range((SELECT min(day) FROM ud),
                      (SELECT max(day) FROM ud) + 1)) AS day
)
SELECT s.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM spine s LEFT JOIN ud u
  ON u.day BETWEEN s.day - {window - 1} AND s.day
GROUP BY s.day"""


# ---------------------------------------------------------------------------
# exact discrete quantiles per group (session 8)
# ---------------------------------------------------------------------------

QDISC_PCTS = (50, 90, 99)


def value_quantiles_disc(sf_dir: str,
                         pcts: tuple[int, ...] = QDISC_PCTS) -> rd.Dataset:
    """EXACT discrete quantiles (median / p90 / p99) of event cents per
    type — the exact twin of the approximate `value_quantiles_hist`
    (the hll_users_per_type / users_per_type_exact pairing, applied to
    percentiles): quantile q returns the ACTUAL sorted element at index
    (n−1)·q // 100 (lower discrete quantile — pure integer index rule,
    no interpolation to argue about across engines).

    Shape: the string-keyed window shuffle (hash(type) routes, quota
    per actual type string) — ONE exchange of (type, cents) ids-only
    rows, per-partition vectorized sort + index gather. Returns
    (event_type, pct, value_cents)."""
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64

    P = 32
    ds = _read_table(sf_dir, "events", ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        et = t["event_type"].to_pylist()
        kp = np.fromiter((stable_hash64(s) & (P - 1) for s in et),
                         np.int64, len(et))
        return pa.table({"event_type": t["event_type"], "cents": cents,
                         "_kp": pa.array(kp, pa.int64())})

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=True):
            v = np.sort(grp.cents.to_numpy())
            n = len(v)
            for p in pcts:
                rows.append((et, p, int(v[(n - 1) * p // 100])))
        return pd.DataFrame(rows,
                            columns=["event_type", "pct", "value_cents"])

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_kp").map_groups(quantiles, batch_format="pandas"))


def value_quantiles_disc_sql(pcts: tuple[int, ...] = QDISC_PCTS) -> str:
    pv = ", ".join(f"({p})" for p in pcts)
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
)
SELECT r.event_type, CAST(p.pct AS BIGINT) AS pct, r.cents AS value_cents
FROM ranked r JOIN (VALUES {pv}) AS p(pct)
  ON r.rn = (r.n - 1) * p.pct // 100 + 1"""


# ---------------------------------------------------------------------------
# TrustRank (session 8) — seeded trust propagation over the doc graph
# ---------------------------------------------------------------------------


def trustrank_docs(sf_dir: str, iters: int = 5, damping_pct: int = 85,
                   scale: int = 1_000_000) -> rd.Dataset:
    """TrustRank (Gyöngyi et al., VLDB 2004) over the planted doc→doc
    graph — the anti-spam counterpart of `pagerank_docs`: the random
    walk RESTARTS at a trusted seed set instead of everywhere, so
    trust decays with link distance from the seeds and spam islands
    score 0. Seeds = the hub pages (doc_id < 16 — the natural trusted
    set on the planted graph). Same pure-integer update as PageRank
    with the restart mass gated by the seed indicator:

      r' = (100−d)·scale//100 · [node ∈ seeds] + d·Σ(r_u // 3) // 100

    starting from r0 = scale·[node ∈ seeds]. Floor division keeps every
    round BIGINT-exact (the unrolled-CTE oracle hash-matches), and
    naturally expresses trust attenuation — contributions below the
    floor vanish, exactly the behavior the operator exists for.
    Same shape as pagerank_docs: per round ONE map-side emit (3 targets
    + a zero presence row) + ONE groupby(node) sum; no driver state but
    the loop counter. Returns (doc_id, trust)."""
    import pyarrow.compute as pc

    docs = _docs(sf_dir, ["doc_id"])
    N = docs.count()
    hubs = min(_PR_HUBS, N)
    base = (100 - damping_pct) * scale // 100

    def init(t: pa.Table) -> pa.Table:
        node = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "r": pa.array(np.where(node < hubs, scale, 0).astype(np.int64))})

    scores = docs.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):
        def contrib(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            c = t["r"].to_numpy(zero_copy_only=False) // 3
            dst = np.concatenate([(node * 31 + 7) % N,
                                  (node * 17 + 3) % N,
                                  node % hubs,
                                  node])              # presence row
            val = np.concatenate([c, c, c, np.zeros(len(node), np.int64)])
            return pa.table({"node": pa.array(dst), "c": pa.array(val)})

        def fold(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            s = t["s"].to_numpy(zero_copy_only=False)
            seed = (node < hubs).astype(np.int64)
            r = seed * base + damping_pct * s // 100
            return pa.table({"node": pa.array(node.astype(np.int64)),
                             "r": pa.array(r.astype(np.int64))})

        scores = (scores.map_batches(contrib, batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("c", alias_name="s"))
                  .map_batches(fold, batch_format="pyarrow")
                  .materialize())

    return scores.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "trust": t["r"]}),
        batch_format="pyarrow")


def trustrank_docs_sql(iters: int = 5, damping_pct: int = 85,
                       scale: int = 1_000_000) -> str:
    """Unrolled-round replica of trustrank_docs — pagerank_docs_sql's
    pattern with the seed-gated restart term."""
    base = (100 - damping_pct) * scale // 100
    parts = [f"""nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), hb AS (
  SELECT least({_PR_HUBS}, n) AS h FROM nn
), e AS (
  SELECT doc_id AS src,
         unnest([(doc_id * 31 + 7) % nn.n,
                 (doc_id * 17 + 3) % nn.n,
                 doc_id % hb.h]) AS dst
  FROM documents, nn, hb
), r0 AS (
  SELECT doc_id AS node,
         CAST(CASE WHEN doc_id < hb.h THEN {scale} ELSE 0 END AS BIGINT)
           AS r
  FROM documents, hb
)"""]
    for t in range(iters):
        parts.append(f"""r{t + 1} AS MATERIALIZED (
  SELECT d.doc_id AS node,
         CAST(CASE WHEN d.doc_id < hb.h THEN {base} ELSE 0 END
              + {damping_pct} * coalesce(s.c, 0) // 100 AS BIGINT) AS r
  FROM documents d CROSS JOIN hb LEFT JOIN (
    SELECT e.dst AS node, sum(r{t}.r // 3) AS c
    FROM e JOIN r{t} ON r{t}.node = e.src GROUP BY e.dst
  ) s ON s.node = d.doc_id
)""")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node AS doc_id, r AS trust FROM r{iters}")


# ---------------------------------------------------------------------------
# count-min sketch term frequencies (session 8)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_PROBES = ("hash", "join", "window", "sort", "merge", "fast", "scan",
              "customer", "the", "zzz-absent-term")


def cms_term_freq(sf_dir: str,
                  probes: tuple[str, ...] = CMS_PROBES) -> rd.Dataset:
    """Count-min sketch term-frequency estimation (Cormode &
    Muthukrishnan 2005) — the bounded-memory frequency sketch for
    trillion-token streams where an exact vocab table is too wide:
    DEPTH×WIDTH int64 counters, word w adds its count to bucket
    stable_hash64('cmsJ:'+w) % WIDTH in each row J, estimate = min
    over rows. Guarantees est ≥ true and est ≤ true + εN w.h.p.

    Shape: the canonical mergeable-sketch fold — each block emits its
    own ≤D×W (cell, count) partial rows, ONE groupby(cell) sums them
    (the sketch table is 4096 rows however big the corpus), probes
    evaluate driver-side on the tiny sketch. The oracle REPLAYS the
    sketch in SQL (bucket sums over the exact word counts, min over
    rows) — the sketch is deterministic, so even an approximate
    structure gets a value-exact oracle. Returns (term, est)."""
    from ..functions.hashing import stable_hash64

    def fold(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for x in t["text"].to_pylist():
            for w in (x or "").split(" "):
                counts[w] = counts.get(w, 0) + 1
        cells = np.zeros(CMS_DEPTH * CMS_WIDTH, np.int64)
        for w, c in counts.items():
            for j in range(CMS_DEPTH):
                cells[j * CMS_WIDTH
                      + stable_hash64(f"cms{j}:{w}") % CMS_WIDTH] += c
        nz = np.nonzero(cells)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64), pa.int64()),
                         "c": pa.array(cells[nz], pa.int64())})

    sketch = (_docs(sf_dir, ["text"])
              .map_batches(fold, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("c", alias_name="n"))
              ).take_all()                      # ≤ D×W rows
    table = np.zeros(CMS_DEPTH * CMS_WIDTH, np.int64)
    for r in sketch:
        table[int(r["cell"])] = int(r["n"])
    rows = []
    for term in probes:
        est = min(int(table[j * CMS_WIDTH
                            + stable_hash64(f"cms{j}:{term}") % CMS_WIDTH])
                  for j in range(CMS_DEPTH))
        rows.append((term, est))
    return rd.from_arrow(pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "est": pa.array([r[1] for r in rows], pa.int64())}))


def cms_term_freq_sql(probes: tuple[str, ...] = CMS_PROBES) -> str:
    probe_rows = ", ".join(f"('{p}')" for p in probes)

    def bucket(col: str, j: int) -> str:
        h = _sql_hash64(f"sha256('cms{j}:' || {col})")
        return f"CAST({h} % {CMS_WIDTH} AS BIGINT)"

    row_ests = []
    for j in range(CMS_DEPTH):
        row_ests.append(f"""(
    SELECT coalesce(sum(wc.c), 0) FROM wc
    WHERE {bucket('wc.word', j)} = {bucket('p.term', j)})""")
    return f"""
WITH wc AS (
  SELECT u.w AS word, CAST(count(*) AS BIGINT) AS c
  FROM documents, unnest(string_split(text, ' ')) AS u(w)
  GROUP BY u.w
), p AS (SELECT * FROM (VALUES {probe_rows}) AS v(term))
SELECT p.term, CAST(least({", ".join(row_ests)}) AS BIGINT) AS est
FROM p"""


# ---------------------------------------------------------------------------
# referential-integrity audit (session 8)
# ---------------------------------------------------------------------------

FK_MISSING_MOD, FK_MISSING_RES = 101, 11


def fk_integrity_audit(sf_dir: str) -> rd.Dataset:
    """Referential-integrity audit (the dbt-test / Great-Expectations
    relationship check, distributed): per FK relationship, how many
    child rows point at a parent that doesn't exist. The generated
    tables are referentially CLEAN, so parents with key % 101 == 11
    are planted-dropped (a pure key function, so the oracle drops the
    same ones) — an untested orphan path is the audit's main job.

    Shape per relationship: the parent side reduces map-side to its
    (filtered) key column; big-big relationships (lineitem→orders,
    orders→customer) check via the partition-wise ANTI hash_join —
    ids-only rows ride the one exchange; the dimension relationship
    (customer→nation) broadcasts the tiny parent key set. Child totals
    are streaming counts. Returns (relationship, n_children,
    n_orphans) — a 3-row report."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_join

    def planted_keys(table: str, col: str) -> rd.Dataset:
        ds = _read_table(sf_dir, table, [col])

        def drop_planted(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = k % FK_MISSING_MOD != FK_MISSING_RES
            return pa.table({col: pa.array(k[m], pa.int64())})

        return ds.map_batches(drop_planted, batch_format="pyarrow")

    rows = []

    def child_keys(table: str, col: str) -> rd.Dataset:
        ds = _read_table(sf_dir, table, [col])
        return ds.map_batches(
            lambda t, c=col: pa.table(
                {c: t[c].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow")

    # big-big: ANTI hash_join (ids-only exchange)
    for rel, ctab, ccol, ptab, pcol in (
            ("lineitem->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey"),
            ("orders->customer", "orders", "o_custkey",
             "customer", "c_custkey")):
        child = child_keys(ctab, ccol)
        n_children = child.count()
        orphans = hash_join(child, planted_keys(ptab, pcol),
                            ccol, pcol, [], [], how="anti")
        rows.append((rel, n_children, orphans.count()))

    # dimension: broadcast the tiny parent key set
    import ray

    nk = planted_keys("nation", "n_nationkey").take_all()
    nset = ray.put({int(r["n_nationkey"]) for r in nk})

    def flag(t: pa.Table) -> pa.Table:
        ks = ray.get(nset)
        k = t["c_nationkey"].to_numpy(zero_copy_only=False)
        bad = np.fromiter((int(x) not in ks for x in k), bool, len(k))
        return pa.table({"o": pa.array([int(bad.sum())], pa.int64())})

    cust = child_keys("customer", "c_nationkey")
    n_cust = cust.count()
    n_orph = sum(r["o"] for r in
                 cust.map_batches(flag, batch_format="pyarrow").take_all())
    rows.append(("customer->nation", n_cust, n_orph))

    return rd.from_arrow(pa.table({
        "relationship": pa.array([r[0] for r in rows], pa.string()),
        "n_children": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], pa.int64())}))


def fk_integrity_audit_sql() -> str:
    def leg(rel: str, ctab: str, ccol: str, ptab: str, pcol: str) -> str:
        return f"""
SELECT '{rel}' AS relationship,
       (SELECT CAST(count(*) AS BIGINT) FROM {ctab}) AS n_children,
       (SELECT CAST(count(*) AS BIGINT) FROM {ctab} c
        WHERE NOT EXISTS (
          SELECT 1 FROM {ptab} p
          WHERE p.{pcol} = c.{ccol}
            AND p.{pcol} % {FK_MISSING_MOD} <> {FK_MISSING_RES}))
         AS n_orphans"""

    return " UNION ALL ".join([
        leg("lineitem->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
        leg("orders->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
        leg("customer->nation", "customer", "c_nationkey",
            "nation", "n_nationkey")])


# ---------------------------------------------------------------------------
# churn analysis (session 8)
# ---------------------------------------------------------------------------


CHURN_DROP_MOD, CHURN_DROP_RES = 13, 5     # drop 2nd-half events (churn)
CHURN_LATE_MOD, CHURN_LATE_RES = 17, 3     # drop 1st-half events (new)


def churned_users(sf_dir: str) -> rd.Dataset:
    """Period-over-period churn census — the product-analytics
    companion of retention_cohorts: split the event span at its middle
    day, classify every user as retained (active both halves), churned
    (first half only) or new (second half only), and count each class.

    Plant: the generated users are uniformly active across the whole
    span (everyone would be 'retained' — the classes the operator
    exists to count never occur), so users with id % 13 == 5 lose
    their second-half events and id % 17 == 3 lose their first-half
    (pure user_id functions; churn wins when both hit and the oracle
    replants the same way).

    Shape: one map-side fold to ≤2 presence rows per (user, block)
    ((user, a, b) with a/b ∈ {0,1}), ONE groupby(user) Max-fold, a
    per-block status count partial, and a ≤3-row final groupby — the
    user table never leaves ids-only form. Returns (status,
    n_users)."""
    ds = _read_table(sf_dir, "events", ["user_id", "ts"])
    lo, hi = _day_span(ds)
    mid = (lo + hi + 1) // 2     # A = [lo, mid), B = [mid, hi]

    def presence(t: pa.Table) -> pa.Table:
        us = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // DAY_US)
        first = day < mid
        # the plant: drop one half's events for the marked users
        churny = us % CHURN_DROP_MOD == CHURN_DROP_RES
        late = (us % CHURN_LATE_MOD == CHURN_LATE_RES) & ~churny
        keep = ~((churny & ~first) | (late & first))
        us, first = us[keep], first[keep]
        rows: dict[int, list[int]] = {}
        for u, f in zip(us, first):
            r = rows.setdefault(int(u), [0, 0])
            r[0 if f else 1] = 1
        keys = sorted(rows)
        return pa.table({
            "user_id": pa.array(keys, pa.int64()),
            "a": pa.array([rows[u][0] for u in keys], pa.int64()),
            "b": pa.array([rows[u][1] for u in keys], pa.int64())})

    per_user = (ds.map_batches(presence, batch_format="pyarrow")
                .groupby("user_id").aggregate(Max("a", alias_name="a"),
                                              Max("b", alias_name="b")))

    def status_counts(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        names = ("retained", "churned", "new")
        masks = (a & b, a & ~b & 1, ~a & 1 & b)
        out = [(n, int(m.sum())) for n, m in zip(names, masks)
               if int(m.sum())]
        return pa.table({
            "status": pa.array([r[0] for r in out], pa.string()),
            "n": pa.array([r[1] for r in out], pa.int64())})

    return (per_user.map_batches(status_counts, batch_format="pyarrow")
            .groupby("status").aggregate(Sum("n", alias_name="n_users")))


def churned_users_sql() -> str:
    return f"""
WITH span AS (
  SELECT min(epoch_us(ts) // {DAY_US}) AS lo,
         max(epoch_us(ts) // {DAY_US}) AS hi
  FROM events
), ev AS (
  SELECT user_id,
         epoch_us(ts) // {DAY_US} < (span.lo + span.hi + 1) // 2 AS first
  FROM events, span
), planted AS (
  SELECT * FROM ev
  WHERE NOT (user_id % {CHURN_DROP_MOD} = {CHURN_DROP_RES} AND NOT first)
    AND NOT (user_id % {CHURN_LATE_MOD} = {CHURN_LATE_RES}
             AND user_id % {CHURN_DROP_MOD} <> {CHURN_DROP_RES} AND first)
), u AS (
  SELECT user_id,
         max(CASE WHEN first THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN NOT first THEN 1 ELSE 0 END) AS b
  FROM planted GROUP BY user_id
)
SELECT CASE WHEN a = 1 AND b = 1 THEN 'retained'
            WHEN a = 1 THEN 'churned' ELSE 'new' END AS status,
       CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY status"""


# ---------------------------------------------------------------------------
# Pareto frontier / skyline (session 8)
# ---------------------------------------------------------------------------

PARETO_SCALE = 1 << 20


def pareto_docs(sf_dir: str) -> rd.Dataset:
    """2-D Pareto frontier (skyline) over anti-correlated doc features
    — "the docs where you can't get more length without losing lexical
    diversity": doc d is on the frontier iff no other doc has
    uniq_ratio ≥ AND n_chars ≥ with at least one strict, where
    uniq_ratio = distinct words · 2²⁰ // total words (pure integers).

    Shape: the classic distributed skyline — each block computes its
    LOCAL skyline (sort by (q DESC, c DESC); per q-group the max-c rows
    survive iff their c exceeds the running max of all higher-q
    groups), locally-dominated rows can never be globally optimal, so
    the survivors (a thin frontier, sub-linear on anti-correlated
    features) merge in one final task running the same filter. Returns
    (doc_id, uniq_ratio, n_chars); equal-feature docs all stay (neither
    dominates)."""
    def feats(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        q, c = [], []
        for x in t["text"].to_pylist():
            w = (x or "").split(" ")
            q.append(len(set(w)) * PARETO_SCALE // len(w))
            c.append(len(x or ""))
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "q": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        q = t["q"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-c, -q))
        keep = np.zeros(len(q), bool)
        best = -1
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and q[order[j]] == q[order[i]]:
                j += 1
            grp = order[i:j]
            mx = c[grp[0]]           # sorted c DESC within the group
            if mx > best:
                keep[grp[c[grp] == mx]] = True
                best = mx
            i = j
        return t.filter(pa.array(keep))

    local = (_docs(sf_dir, ["doc_id", "text"])
             .map_batches(feats, batch_format="pyarrow")
             .map_batches(local_skyline, batch_format="pyarrow"))
    merged = local.repartition(1).map_batches(local_skyline,
                                              batch_format="pyarrow")
    return merged.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "uniq_ratio": t["q"],
                            "n_chars": t["c"]}),
        batch_format="pyarrow")


def pareto_docs_sql() -> str:
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(len(list_distinct(string_split(text, ' '))) * {PARETO_SCALE}
              // len(string_split(text, ' ')) AS BIGINT) AS q,
         CAST(length(text) AS BIGINT) AS c
  FROM documents
), gm AS (
  SELECT q, max(c) AS mc FROM f GROUP BY q
), sky_q AS (
  SELECT q, mc FROM (
    SELECT q, mc, max(mc) OVER (ORDER BY q DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM gm)
  WHERE pm IS NULL OR mc > pm
)
SELECT f.doc_id, f.q AS uniq_ratio, f.c AS n_chars
FROM f JOIN sky_q s ON f.q = s.q AND f.c = s.mc"""


# ---------------------------------------------------------------------------
# SCD type-2 history build (session 8)
# ---------------------------------------------------------------------------


def scd2_history(sf_dir: str) -> rd.Dataset:
    """Slowly-changing-dimension type-2 history — the warehouse
    table-maintenance op that turns snapshot pairs into validity
    intervals: for every doc across snapshots T0 (the corpus) and T1
    (the MV plant: removed %37, changed %29 — removal wins, added
    %41), emit one row per VERSION with (valid_from, valid_to); the
    open end is 2^62 (the warehouse 'infinity' stamp).

      unchanged  → one row  [0, ∞)
      changed    → two rows [0, 1) and [1, ∞) with the new n_chars
      removed    → one row  [0, 1)
      added      → one row  [1, ∞)

    Shape: pure map-side — the per-row version set is a function of
    the row and the delta classification (with real tables the
    classification is pages_delta_tables' one full-outer join, already
    verified; this op is the history EMIT that follows it). No
    exchange at all. Returns (doc_id, version, valid_from, valid_to,
    n_chars)."""
    OPEN = 1 << 62

    def emit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "version": [], "valid_from": [],
               "valid_to": [], "n_chars": []}

        def row(d: int, v: int, f: int, to: int, n: int) -> None:
            out["doc_id"].append(d)
            out["version"].append(v)
            out["valid_from"].append(f)
            out["valid_to"].append(to)
            out["n_chars"].append(n)

        for i, x in zip(ids, t["text"].to_pylist()):
            i = int(i)
            n0 = len(x or "")
            if i % MV_REMOVED_MOD == MV_REMOVED_RES:
                row(i, 1, 0, 1, n0)
            elif i % MV_CHANGED_MOD == MV_CHANGED_RES:
                row(i, 1, 0, 1, n0)
                row(i, 2, 1, OPEN, len(_mv_changed_text(i, x)))
            else:
                row(i, 1, 0, OPEN, n0)
            if i % MV_ADDED_MOD == MV_ADDED_RES:
                aid = i + MV_ADDED_OFF
                row(aid, 1, 1, OPEN, len(_mv_added_text(i)))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "version": pa.array(out["version"], pa.int64()),
            "valid_from": pa.array(out["valid_from"], pa.int64()),
            "valid_to": pa.array(out["valid_to"], pa.int64()),
            "n_chars": pa.array(out["n_chars"], pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        emit, batch_format="pyarrow")


def scd2_history_sql() -> str:
    o = 1 << 62
    return f"""
SELECT doc_id, CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT) AS valid_from,
       CAST(CASE WHEN doc_id % {MV_REMOVED_MOD} = {MV_REMOVED_RES}
                   OR doc_id % {MV_CHANGED_MOD} = {MV_CHANGED_RES}
                 THEN 1 ELSE {o} END AS BIGINT) AS valid_to,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST({o} AS BIGINT),
       length(text || ' delta-marker-' || CAST(doc_id % 7 AS VARCHAR))
FROM documents
WHERE doc_id % {MV_CHANGED_MOD} = {MV_CHANGED_RES}
  AND doc_id % {MV_REMOVED_MOD} <> {MV_REMOVED_RES}
UNION ALL
SELECT doc_id + {MV_ADDED_OFF}, 1, 1, {o},
       length('added doc ' || CAST(doc_id AS VARCHAR))
FROM documents WHERE doc_id % {MV_ADDED_MOD} = {MV_ADDED_RES}"""


# ---------------------------------------------------------------------------
# windowed-HLL WAU (session 8) — sketch merge across window days
# ---------------------------------------------------------------------------


def wau_daily_hll(sf_dir: str, window: int = WAU_WINDOW_DAYS,
                  p: int = 10) -> rd.Dataset:
    """Approximate rolling 7-day active users via HyperLogLog register
    MERGE — the scale path for `wau_daily`: the exact op's fan-out
    dedupe moves O(users × 7) id rows; this one folds each day to a
    2^p-byte register row and the window union is an elementwise max
    of ≤7 such rows — per-day cost is CONSTANT however many users
    exist. Mergeability is the property that makes HLL a warehouse
    primitive (pre-aggregated day sketches answer any window after the
    fact); this op exercises it across overlapping windows.

    Same register/estimator arithmetic as hll_users_per_type (pure
    sha256 integers; exact-integer harmonic sum), so the whole windowed
    pipeline replays in SQL. Days with an empty window report 0 (the
    estimator's own linear-counting branch). Returns (day,
    wau_approx)."""
    from ..stages.sketch import _hll_update, hll_estimate

    m = 1 << p
    ds = _read_table(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["user_id"].to_pylist()
        day = (t["ts"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // DAY_US)
        acc: dict[int, np.ndarray] = {}
        for u, d in zip(us, day):
            regs = acc.get(int(d))
            if regs is None:
                regs = acc[int(d)] = np.zeros(m, dtype=np.uint8)
            _hll_update(regs, (u,), p)
        keys = sorted(acc)
        return pa.table({
            "day": pa.array(keys, pa.int64()),
            "regs": pa.array([acc[d].tobytes() for d in keys],
                             pa.large_binary())})

    def merge_regs(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for r in g["regs"]:
            np.maximum(regs, np.frombuffer(r, dtype=np.uint8), out=regs)
        return pd.DataFrame({"day": [int(g["day"].iloc[0])],
                             "regs": [regs.tobytes()]})

    day_regs = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("day").map_groups(merge_regs,
                                           batch_format="pandas"))

    def fan(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False)
        r = t["regs"].to_pylist()
        days, regs = [], []
        for off in range(window):
            days.append(d + off)
            regs.extend(r)
        return pa.table({"day": pa.array(np.concatenate(days), pa.int64()),
                         "regs": pa.array(regs, pa.large_binary())})

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for r in g["regs"]:
            np.maximum(regs, np.frombuffer(r, dtype=np.uint8), out=regs)
        return pd.DataFrame({"day": [int(g["day"].iloc[0])],
                             "wau_approx": [hll_estimate(regs)]})

    win = (day_regs.map_batches(fan, batch_format="pyarrow")
           .groupby("day").map_groups(estimate, batch_format="pandas"))

    lo, hi = _day_span(ds)
    return _pad_day_spine(win, lo, hi, "wau_approx")


def wau_daily_hll_sql(window: int = WAU_WINDOW_DAYS, p: int = 10) -> str:
    """The hll_users_per_type_sql replay with a day key and the
    window union folded into the register max (max over the window's
    days ≡ merging the day sketches)."""
    m = 1 << p
    byte = (lambda k:
            f"(strpos('0123456789abcdef', substr(hx, {2 * k + 1}, 1)) - 1)"
            f" * 16 + strpos('0123456789abcdef', substr(hx, {2 * k + 2}, 1))"
            f" - 1")
    hexpr = " + ".join(
        f"CAST({byte(k)} AS HUGEINT) * CAST('{256 ** k}' AS HUGEINT)"
        for k in range(8))
    two63 = "CAST('9223372036854775808' AS HUGEINT)"
    return f"""
WITH vals AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
), hx AS (
  SELECT day, sha256(CAST(user_id AS VARCHAR)) AS hx FROM vals
), hs AS (SELECT day, ({hexpr}) AS h FROM hx),
rr AS (SELECT day, CAST(h % {m} AS BIGINT) AS idx,
              CASE WHEN h // {m} = 0 THEN {64 - p + 1}
                   ELSE {64 - p} - length(bin(h // {m})) + 1 END AS rank
       FROM hs),
spine AS (
  SELECT unnest(range((SELECT min(day) FROM vals),
                      (SELECT max(day) FROM vals) + 1)) AS day
),
regs AS (SELECT s.day, rr.idx, max(rr.rank) AS r
         FROM spine s JOIN rr ON rr.day BETWEEN s.day - {window - 1}
                                            AND s.day
         GROUP BY s.day, rr.idx),
agg AS (SELECT s.day,
               CAST(coalesce(count(regs.idx), 0) AS BIGINT) AS n_present,
               coalesce(sum({two63} // (CAST(1 AS HUGEINT)
                                        << CAST(regs.r AS HUGEINT))),
                        CAST(0 AS HUGEINT)) AS s_present
        FROM spine s LEFT JOIN regs ON regs.day = s.day
        GROUP BY s.day),
est AS (SELECT day, {m} - n_present AS zeros,
               (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
                 * 9223372036854775808.0
                 / CAST(({m} - n_present) * {two63} + s_present AS DOUBLE)
                 AS raw
        FROM agg)
SELECT day,
       CAST(floor(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                       THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                       ELSE raw END + 0.5) AS BIGINT) AS wau_approx
FROM est"""


# ---------------------------------------------------------------------------
# markov_transitions — event-type transition matrix (session 9)
# ---------------------------------------------------------------------------


def markov_transitions(sf_dir: str) -> rd.Dataset:
    """First-order Markov transition matrix over per-user event
    streams: for every (prev_type → type) step in a user's
    (ts, event_id)-ordered chain, the count and the row-normalized
    transition probability — the statistic behind next-event
    prediction and funnel design (path_trigrams is the order-2 top-k
    sibling; this is the full normalized order-1 matrix).

    Scale shape: the type alphabet is tiny, so types map to integer
    codes via a broadcast dict (one column-pruned pre-pass builds it);
    LAG is ONE key-hash shuffle (stages/scan.keyed_shift — vectorized
    per-partition groupby-shift, never per-user Python); a per-block
    combiner folds steps to packed ``prev·K + code`` counts so the
    final exchange carries ≤ |types|² rows per block; probabilities
    normalize inside the single tiny output block (prob_ppm =
    n·2^20 // Σ_row n — exact integer floor division).
    Returns (prev_type, event_type, n, prob_ppm)."""
    import ray

    from ..stages.scan import keyed_shift

    types = sorted(
        _read_table(sf_dir, "events", ["event_type"])
        .groupby("event_type").aggregate(Count())
        .to_pandas()["event_type"])
    code = {t: i for i, t in enumerate(types)}
    K = len(types)
    cref = ray.put(code)

    def encode(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        codes = np.fromiter((cm[x] for x in t["event_type"].to_pylist()),
                            np.int64, t.num_rows)
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"],
                         "code": pa.array(codes, pa.int64())})

    shifted = keyed_shift(
        _read_table(sf_dir, "events",
                    ["event_id", "user_id", "ts", "event_type"])
        .map_batches(encode, batch_format="pyarrow"),
        key_col="user_id", sort_cols=["ts", "event_id"],
        value_col="code", shifts={"prev_code": 1})

    def fold(t: pa.Table) -> pa.Table:
        prev = t["prev_code"].to_numpy(zero_copy_only=False)
        cur = t["code"].to_numpy(zero_copy_only=False)
        mask = prev >= 0  # first event of a user's chain has no prev
        packed = prev[mask] * K + cur[mask]
        uniq, counts = np.unique(packed, return_counts=True)
        return pa.table({"k": pa.array(uniq.astype(np.int64), pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    agg = (shifted.map_batches(fold, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("n", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        prev, cur = k // K, k % K
        row_tot = np.zeros(K, np.int64)
        np.add.at(row_tot, prev, n)
        return pa.table({
            "prev_type": pa.array([types[i] for i in prev], pa.string()),
            "event_type": pa.array([types[i] for i in cur], pa.string()),
            "n": pa.array(n, pa.int64()),
            "prob_ppm": pa.array((n << 20) // row_tot[prev], pa.int64())})

    # ≤ |types|² rows — one tiny block
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def markov_transitions_sql() -> str:
    return """
WITH steps AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       (n * 1048576) // sum(n) OVER (PARTITION BY prev_type) AS prob_ppm
FROM pairs"""


# ---------------------------------------------------------------------------
# url_normalize_dedup — URL canonicalization dedup (session 9)
# ---------------------------------------------------------------------------

import re as _re

_URL_UTM_RE = _re.compile(r"[?&]utm_[a-z]+=[^&#]*")
_URL_HEAD_RE = _re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*)")


def _normalize_url(u: str) -> str:
    """RFC-3986-flavoured canonicalization: drop the fragment, strip
    utm_* tracking params (repairing a dangling '&'), lowercase ONLY
    the scheme+authority (paths are case-sensitive), and drop default
    ports. Pure function — replayed verbatim in SQL."""
    u = u.split("#", 1)[0]
    u = _URL_UTM_RE.sub("", u)
    if "&" in u and "?" not in u:
        u = u.replace("&", "?", 1)
    m = _URL_HEAD_RE.match(u)
    if m:
        head = m.group(1).lower()
        if head.startswith("https://") and head.endswith(":443"):
            head = head[:-4]
        elif head.startswith("http://") and head.endswith(":80"):
            head = head[:-3]
        u = head + u[m.end():]
    return u


def url_normalize_dedup(sf_dir: str) -> rd.Dataset:
    """URL canonicalization dedup — the crawl-frontier stage that runs
    BEFORE any content fetch (RefinedWeb §3.1 runs it ahead of content
    dedup): re-discovered links differ only by tracking params,
    fragments, host case, or default ports, and normalizing collapses
    them without reading a single body byte.

    The corpus' urls are canonical by construction, so the messy
    variants PLANT as pure doc_id functions (the pages_delta
    convention): every doc emits its base url, and id classes add a
    tracking-params copy (%5), a fragment copy (%7), an uppercased
    scheme+host copy (%11), a ``:443`` port copy (%13) — plus a
    MEANINGFUL ``?page=`` variant (%17, must NOT collapse) and a
    mixed meaningful+utm variant (%19, must collapse to the ?page=
    form). Normalization is `_normalize_url`; dedup is a per-block
    (url_norm, count) combiner then ONE groupby(url_norm) — only
    normalized-url + count rows ride the exchange. Returns
    (url_norm, doc_id, n_variants) with doc_id = min over the group
    (first-wins canonical owner)."""
    import pyarrow.compute as pc

    def variants(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        pad = pc.utf8_lpad(pc.cast(ids, pa.string()), 7, "0")
        last = ids.to_numpy() % 10
        suffix = pa.array(
            np.where(last == 3, "-memo",
                     np.where(last == 7, "-qp", "")).tolist(), pa.string())
        dpart = pc.binary_join_element_wise(
            pa.scalar("d"), pad, suffix, pa.scalar(""))
        base = pc.binary_join_element_wise(
            pa.scalar("https://corpus.example"), t["source"], dpart,
            pa.scalar("/"))
        ids_np = ids.to_numpy()
        base_py = base.to_pylist()
        out_ids, out_urls = list(ids_np), list(base_py)
        for i, (d, u) in enumerate(zip(ids_np, base_py)):
            d = int(d)
            if d % 5 == 0:
                out_ids.append(d)
                out_urls.append(f"{u}?utm_source=feed&utm_campaign=c{d % 3}")
            if d % 7 == 0:
                out_ids.append(d)
                out_urls.append(f"{u}#sec-{d % 4}")
            if d % 11 == 0:
                head, rest = u.split("/src", 1)
                out_ids.append(d)
                out_urls.append(f"{head.upper()}/src{rest}")
            if d % 13 == 0:
                out_ids.append(d)
                out_urls.append(u.replace("https://corpus.example",
                                          "https://corpus.example:443", 1))
            if d % 17 == 0:
                out_ids.append(d)
                out_urls.append(f"{u}?page={d % 6 + 2}")
            if d % 19 == 0:
                out_ids.append(d)
                out_urls.append(f"{u}?page={d % 6 + 2}&utm_medium=m")
        return pa.table({"doc_id": pa.array([int(x) for x in out_ids],
                                            pa.int64()),
                         "url": pa.array(out_urls, pa.string())})

    def norm_fold(t: pa.Table) -> pa.Table:
        norm = np.array([_normalize_url(u) for u in t["url"].to_pylist()],
                        dtype=object)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(norm, return_inverse=True)
        counts = np.bincount(inv)
        owner = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(owner, inv, ids)
        return pa.table({"url_norm": pa.array(uniq.tolist(), pa.string()),
                         "d": pa.array(owner, pa.int64()),
                         "c": pa.array(counts.astype(np.int64), pa.int64())})

    agg = (_docs(sf_dir, ["doc_id", "source"])
           .map_batches(variants, batch_format="pyarrow")
           .map_batches(norm_fold, batch_format="pyarrow")
           .groupby("url_norm")
           .aggregate(Min("d", alias_name="doc_id"),
                      Sum("c", alias_name="n_variants")))
    return agg


def url_normalize_dedup_sql() -> str:
    return """
WITH u AS (
  SELECT doc_id,
         'https://corpus.example/' || source || '/d'
           || lpad(CAST(doc_id AS VARCHAR), 7, '0')
           || (CASE WHEN doc_id % 10 = 3 THEN '-memo'
                    WHEN doc_id % 10 = 7 THEN '-qp' ELSE '' END) AS base
  FROM documents
), v AS (
  SELECT doc_id, base AS url FROM u
  UNION ALL
  SELECT doc_id, base || '?utm_source=feed&utm_campaign=c'
           || CAST(doc_id % 3 AS VARCHAR) FROM u WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, base || '#sec-' || CAST(doc_id % 4 AS VARCHAR)
  FROM u WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'HTTPS://CORPUS.EXAMPLE'
           || substr(base, length('https://corpus.example') + 1)
  FROM u WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id, 'https://corpus.example:443'
           || substr(base, length('https://corpus.example') + 1)
  FROM u WHERE doc_id % 13 = 0
  UNION ALL
  SELECT doc_id, base || '?page=' || CAST(doc_id % 6 + 2 AS VARCHAR)
  FROM u WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id, base || '?page=' || CAST(doc_id % 6 + 2 AS VARCHAR)
           || '&utm_medium=m'
  FROM u WHERE doc_id % 19 = 0
), n1 AS (
  SELECT doc_id, regexp_replace(
           regexp_replace(url, '#.*$', ''),
           '[?&]utm_[a-z]+=[^&#]*', '', 'g') AS url
  FROM v
), n2 AS (
  SELECT doc_id,
         CASE WHEN contains(url, '&') AND NOT contains(url, '?')
              THEN regexp_replace(url, '&', '?') ELSE url END AS url
  FROM n1
), n3 AS (
  SELECT doc_id,
         CASE WHEN head = '' THEN url
              ELSE
                (CASE WHEN lower(head) LIKE 'https://%'
                           AND lower(head) LIKE '%:443'
                      THEN substr(lower(head), 1, length(head) - 4)
                      WHEN lower(head) LIKE 'http://%'
                           AND lower(head) LIKE '%:80'
                      THEN substr(lower(head), 1, length(head) - 3)
                      ELSE lower(head) END)
                || substr(url, length(head) + 1)
         END AS url_norm
  FROM (SELECT doc_id, url,
               regexp_extract(url,
                 '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/]*') AS head
        FROM n2)
)
SELECT url_norm, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_variants
FROM n3 GROUP BY url_norm"""


# ---------------------------------------------------------------------------
# hll_segment_overlap — sketch set algebra (session 9)
# ---------------------------------------------------------------------------

HLL_SEG_A = "click"
HLL_SEG_B = "purchase"


def hll_segment_overlap(sf_dir: str, type_a: str = HLL_SEG_A,
                        type_b: str = HLL_SEG_B, p: int = 10) -> rd.Dataset:
    """Approximate audience overlap via HLL SET ALGEBRA: the distinct
    users active in segment A, in segment B, and in A∩B estimated by
    inclusion–exclusion over three sketches — est(A) + est(B) −
    est(A∪B), where the union sketch is the elementwise register MAX
    of A's and B's (never a re-scan). This is the other half of the
    mergeability story wau_daily_hll exercises over windows: unions
    are exact on sketches, intersections derive, and segment × segment
    overlap matrices cost one corpus pass however many segments.

    Same sha256-integer registers and exact-integer harmonic estimator
    as hll_users_per_type, so all three estimates replay in SQL (the
    union sketch over max-merged registers is IDENTICAL to a sketch
    built over the unioned user set — asserted by construction in the
    oracle, which builds it that way). est_inter is signed (inclusion–
    exclusion can go negative at small overlaps; clamping would hide
    the sketch's true output). Returns one row
    (est_a, est_b, est_union, est_inter)."""
    from ..stages.sketch import _hll_update, hll_estimate

    m = 1 << p
    ds = _read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_numpy(zero_copy_only=False)
        us = t["user_id"].to_numpy(zero_copy_only=False)
        out_seg, out_regs = [], []
        for seg, tname in (("a", type_a), ("b", type_b)):
            sel = us[types == tname]
            if len(sel):
                regs = np.zeros(m, dtype=np.uint8)
                _hll_update(regs, [int(u) for u in sel], p)
                out_seg.append(seg)
                out_regs.append(regs.tobytes())
        return pa.table({"seg": pa.array(out_seg, pa.string()),
                         "regs": pa.array(out_regs, pa.large_binary())})

    def merge_regs(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for r in g["regs"]:
            np.maximum(regs, np.frombuffer(r, dtype=np.uint8), out=regs)
        return pd.DataFrame({"seg": [str(g["seg"].iloc[0])],
                             "regs": [regs.tobytes()]})

    seg_regs = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("seg").map_groups(merge_regs,
                                           batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        by = dict(zip(t["seg"].to_pylist(), t["regs"].to_pylist()))
        missing = {"a", "b"} - set(by)
        if missing:
            # the SQL oracle's scalar subqueries would return NULL for
            # an absent segment while zero registers estimate 0 — fail
            # loudly instead of diverging (review finding)
            raise ValueError(
                f"segment(s) {sorted(missing)} have no events "
                f"({type_a!r}/{type_b!r})")
        ra = np.frombuffer(by["a"], dtype=np.uint8)
        rb = np.frombuffer(by["b"], dtype=np.uint8)
        ru = np.maximum(ra, rb)
        ea, eb, eu = hll_estimate(ra), hll_estimate(rb), hll_estimate(ru)
        return pa.table({
            "est_a": pa.array([ea], pa.int64()),
            "est_b": pa.array([eb], pa.int64()),
            "est_union": pa.array([eu], pa.int64()),
            "est_inter": pa.array([ea + eb - eu], pa.int64())})

    # 2 one-KiB rows — one tiny block
    return seg_regs.repartition(1).map_batches(finish,
                                               batch_format="pyarrow")


def hll_segment_overlap_sql(type_a: str = HLL_SEG_A,
                            type_b: str = HLL_SEG_B, p: int = 10) -> str:
    """Three-segment replay of hll_users_per_type_sql: the union
    segment's register table is built over ``type IN (a, b)``, which
    equals the max-merge of the a/b sketches by construction."""
    m = 1 << p
    byte = (lambda k:
            f"(strpos('0123456789abcdef', substr(hx, {2 * k + 1}, 1)) - 1)"
            f" * 16 + strpos('0123456789abcdef', substr(hx, {2 * k + 2}, 1))"
            f" - 1")
    hexpr = " + ".join(
        f"CAST({byte(k)} AS HUGEINT) * CAST('{256 ** k}' AS HUGEINT)"
        for k in range(8))
    two63 = "CAST('9223372036854775808' AS HUGEINT)"
    return f"""
WITH vals AS (
  SELECT DISTINCT seg, user_id FROM (
    SELECT 'a' AS seg, user_id FROM events
    WHERE event_type = '{type_a}'
    UNION ALL
    SELECT 'b' AS seg, user_id FROM events
    WHERE event_type = '{type_b}'
    UNION ALL
    SELECT 'u' AS seg, user_id FROM events
    WHERE event_type IN ('{type_a}', '{type_b}')
  )
), hx AS (SELECT seg, sha256(CAST(user_id AS VARCHAR)) AS hx FROM vals),
hs AS (SELECT seg, ({hexpr}) AS h FROM hx),
rr AS (SELECT seg, CAST(h % {m} AS BIGINT) AS idx,
              CASE WHEN h // {m} = 0 THEN {64 - p + 1}
                   ELSE {64 - p} - length(bin(h // {m})) + 1 END AS rank
       FROM hs),
regs AS (SELECT seg, idx, max(rank) AS r FROM rr GROUP BY seg, idx),
agg AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_present,
               sum({two63} // (CAST(1 AS HUGEINT)
                               << CAST(r AS HUGEINT))) AS s_present
        FROM regs GROUP BY seg),
est AS (SELECT seg, {m} - n_present AS zeros,
               (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
                 * 9223372036854775808.0
                 / CAST(({m} - n_present) * {two63} + s_present AS DOUBLE)
                 AS raw
        FROM agg),
f AS (SELECT seg,
             CAST(floor(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                             THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                             ELSE raw END + 0.5) AS BIGINT) AS e
      FROM est)
SELECT (SELECT e FROM f WHERE seg = 'a') AS est_a,
       (SELECT e FROM f WHERE seg = 'b') AS est_b,
       (SELECT e FROM f WHERE seg = 'u') AS est_union,
       (SELECT e FROM f WHERE seg = 'a') + (SELECT e FROM f WHERE seg = 'b')
         - (SELECT e FROM f WHERE seg = 'u') AS est_inter"""


# ---------------------------------------------------------------------------
# section_keyness — distinctive vocabulary per domain (session 9)
# ---------------------------------------------------------------------------


def section_keyness(sf_dir: str, k: int = 5, min_count: int = 5,
                    scale: int = 1000) -> rd.Dataset:
    """Distinctive terms per section — keyness, the corpus-linguistics
    statistic behind domain tagging and per-source filter tuning: for
    each section (the domain stand-in), the top-``k`` words whose
    in-section rate most exceeds their corpus rate, keyness_q =
    (c_sw · N · scale) // (c_w · T_s) — the per-section LIFT (the
    bigram_lift quantization applied to section × word), computed in
    PYTHON BIGINTS over the post-filter candidate rows so no corpus
    size overflows. ``c_sw ≥ min_count`` kills the hapax flood.

    Shape: ONE wordcount-combiner fold to (section, word, c) partials
    and ONE groupby — the same exchange vocab_df pays, just keyed by
    (section, word); section totals are a ≤|sections|-row rollup of
    that table (driver dict, broadcast); global word counts attach via
    a distributed hash_join on stable_hash64(word) with the exact
    string-equality collision verify (the bigram_lift discipline — the
    vocabulary is corpus-sized, never a broadcast); the per-section
    top-k is a per-block partial top-k (≤ |sections|·k rows per block)
    merged in one final task. Returns
    (section, word, c_sw, keyness_q, sect_rank)."""
    import ray

    from collections import Counter

    from ..functions.hashing import stable_hash64
    from ..stages.joins import hash_join

    def sw_partial(batch: pa.Table) -> pa.Table:
        tot: Counter = Counter()
        for sec, text in zip(batch["source"].to_pylist(),
                             batch["text"].to_pylist()):
            for w in (text or "").split(" "):
                tot[(sec, w)] += 1
        keys = sorted(tot)
        return pa.table({
            "section": pa.array([s for s, _ in keys], pa.string()),
            "word": pa.array([w for _, w in keys], pa.string()),
            "c": pa.array([tot[p] for p in keys], pa.int64())})

    sw = (_docs(sf_dir, ["source", "text"])
          .map_batches(sw_partial, batch_format="pyarrow")
          .groupby(["section", "word"])
          .aggregate(Sum("c", alias_name="c_sw"))
          .materialize())

    # ≤ |sections| rows — driver dict
    sect_tot = {str(r["section"]): int(r["c_sw"]) for r in
                sw.groupby("section").aggregate(
                    Sum("c_sw", alias_name="t")).map_batches(
                        lambda t: pa.table({"section": t["section"],
                                            "c_sw": t["t"]}),
                        batch_format="pyarrow").to_pandas()
                .to_dict("records")}
    n_tokens = sum(sect_tot.values())
    tref = ray.put(sect_tot)

    def uni_fold(t: pa.Table) -> pa.Table:
        return pa.table({"word": t["word"], "c": t["c_sw"]})

    def key_uni(t: pa.Table) -> pa.Table:
        hs = [stable_hash64("key:" + w) for w in t["word"].to_pylist()]
        return pa.table({"hw": pa.array(hs, pa.int64()),
                         "word_r": t["word"], "c_w": t["c_w"]})

    uni = (sw.map_batches(uni_fold, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("c", alias_name="c_w"))
           .map_batches(key_uni, batch_format="pyarrow")
           .materialize())

    def floor_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.greater_equal(t["c_sw"],
                                      pa.scalar(min_count, pa.int64())))
        hs = [stable_hash64("key:" + w) for w in t["word"].to_pylist()]
        return t.append_column("h", pa.array(hs, pa.int64()))

    cand = sw.map_batches(floor_key, batch_format="pyarrow").materialize()
    j = hash_join(cand, uni, "h", "hw",
                  ["section", "word", "c_sw"], ["word_r", "c_w"],
                  how="inner")

    def score_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["word"], t["word_r"]))  # collision verify
        st = ray.get(tref)
        secs = t["section"].to_pylist()
        words = t["word"].to_pylist()
        csw = t["c_sw"].to_pylist()
        cw = t["c_w"].to_pylist()
        kq = [(int(a) * n_tokens * scale) // (int(b) * st[s])
              for a, b, s in zip(csw, cw, secs)]
        df = pd.DataFrame({"section": secs, "word": words,
                           "c_sw": np.int64(csw),
                           "keyness_q": np.array(kq, np.int64)})
        df = df.sort_values(["section", "keyness_q", "word"],
                            ascending=[True, False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("section", sort=False)
                                    .head(k), preserve_index=False)

    def final_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"section": pa.array([], pa.string()),
                             "word": pa.array([], pa.string()),
                             "c_sw": pa.array([], pa.int64()),
                             "keyness_q": pa.array([], pa.int64()),
                             "sect_rank": pa.array([], pa.int64())})
        df = t.to_pandas().sort_values(
            ["section", "keyness_q", "word"],
            ascending=[True, False, True], kind="mergesort")
        df["sect_rank"] = (df.groupby("section", sort=False).cumcount()
                           .to_numpy(np.int64) + 1)
        return pa.Table.from_pandas(df[df.sect_rank <= k],
                                    preserve_index=False)

    # per-block partial top-k, then ONE tiny final block
    return (j.map_batches(score_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final_rank, batch_format="pyarrow"))


def section_keyness_sql(k: int = 5, min_count: int = 5,
                        scale: int = 1000) -> str:
    return f"""
WITH tok AS (
  SELECT source AS section, unnest(string_split(text, ' ')) AS word
  FROM documents
), sw AS (
  SELECT section, word, CAST(count(*) AS BIGINT) AS c_sw
  FROM tok GROUP BY section, word
), st AS (
  SELECT section, CAST(sum(c_sw) AS BIGINT) AS t_s FROM sw GROUP BY section
), uni AS (
  SELECT word, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY word
), n AS (SELECT CAST(sum(c_sw) AS BIGINT) AS nt FROM sw),
scored AS (
  SELECT sw.section, sw.word, sw.c_sw,
         CAST(CAST(sw.c_sw AS HUGEINT) * n.nt * {scale}
              // (CAST(uni.c_w AS HUGEINT) * st.t_s) AS BIGINT)
           AS keyness_q
  FROM sw
  JOIN uni ON uni.word = sw.word
  JOIN st ON st.section = sw.section
  CROSS JOIN n
  WHERE sw.c_sw >= {min_count}
)
SELECT section, word, c_sw, keyness_q,
       CAST(ROW_NUMBER() OVER (PARTITION BY section
            ORDER BY keyness_q DESC, word) AS BIGINT) AS sect_rank
FROM scored
QUALIFY sect_rank <= {k}"""


# ---------------------------------------------------------------------------
# zonemap_range_stats — data-skipping range scan (session 9)
# ---------------------------------------------------------------------------


def zonemap_plan_probe(sf_dir: str,
                       zone_width: int = 8) -> "tuple[str, tuple[int, int]]":
    """(store path, (qlo, qhi)) the sf-level query uses — exposed so
    tests can pin that the plan prunes (a strict zone subset)."""
    import os

    from ..sources.corpus import _input_digest

    ev = _read_table(sf_dir, "events", ["ts"])
    lo, hi = _day_span(ev)
    store = os.path.join(
        "/tmp/pdf_extraction_ray/zonemap",
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'sf'}"
        f"-{_input_digest(sf_dir)}-w{zone_width}")
    return store, (lo + (hi - lo) // 3, lo + 2 * ((hi - lo) // 3))


def zonemap_range_stats(sf_dir: str, zone_width: int = 8) -> rd.Dataset:
    """Range analytics over a ZONE-MAPPED copy of the events table —
    the storage-level pruning every 100-TB scan lives on (Parquet
    row-group stats / Iceberg manifest pruning, made explicit as
    `state/zonemap.py`): events land once as day-clustered ``zone=K/``
    directories with a min/max manifest, and the query's day range
    [lo + span//3, lo + 2·(span//3)] (the middle third) reads ONLY the
    overlapping zones — the plan is pytest-pinned to touch a strict
    subset. The aggregate itself is the per-type count/sum combiner
    over the pruned read. Returns (event_type, n, sum_cents)."""
    from ..state.zonemap import write_zonemapped, zonemap_scan

    ev = _read_table(sf_dir, "events", ["ts", "event_type", "value"])

    def project(t: pa.Table) -> pa.Table:
        day = (t["ts"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // DAY_US)
        cents = np.round(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"day": pa.array(day.astype(np.int64), pa.int64()),
                         "event_type": t["event_type"],
                         "cents": pa.array(cents, pa.int64())})

    store, (qlo, qhi) = zonemap_plan_probe(sf_dir, zone_width)
    if not os.path.exists(os.path.join(store, "_zones.json")):
        # the store is digest-keyed, so an existing manifest IS the
        # data — reuse it (the _extracted convention; every call used
        # to rewrite the store and re-scan events — review finding).
        # Build privately, publish with one atomic rename; a losing
        # concurrent builder discards its copy instead of rmtree-ing
        # files a reader may hold open.
        proj = ev.map_batches(project, batch_format="pyarrow")
        build = f"{store}.build-{os.getpid()}"
        write_zonemapped(proj, "day", build, zone_width)
        try:
            os.rename(build, store)
        except OSError:
            import shutil

            if os.path.exists(os.path.join(store, "_zones.json")):
                # a concurrent builder won the publish — use theirs
                shutil.rmtree(build, ignore_errors=True)
            else:
                # stale manifestless dir (e.g. a crashed pre-reuse-era
                # build) would wedge every future call — clear and
                # publish ours; if ANOTHER racer published between the
                # clear and our rename, theirs wins (second review)
                shutil.rmtree(store, ignore_errors=True)
                try:
                    os.rename(build, store)
                except OSError:
                    if not os.path.exists(
                            os.path.join(store, "_zones.json")):
                        raise
                    shutil.rmtree(build, ignore_errors=True)

    def fold(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "cents": t["cents"].to_numpy(
                               zero_copy_only=False)})
        g = df.groupby("event_type", as_index=False).agg(
            n=("cents", "size"), s=("cents", "sum"))
        return pa.table({"event_type": pa.array(g.event_type, pa.string()),
                         "n": pa.array(g.n.to_numpy(np.int64), pa.int64()),
                         "s": pa.array(g.s.to_numpy(np.int64), pa.int64())})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "n": t["sum(n)"], "sum_cents": t["sum(s)"]})

    return (zonemap_scan(store, qlo, qhi)
            .map_batches(fold, batch_format="pyarrow")
            .groupby("event_type").aggregate(Sum("n"), Sum("s"))
            .map_batches(rename, batch_format="pyarrow"))


def zonemap_range_stats_sql() -> str:
    return f"""
WITH d AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), b AS (
  SELECT min(day) AS lo, max(day) AS hi FROM d
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM d CROSS JOIN b
WHERE day >= lo + (hi - lo) // 3
  AND day <= lo + 2 * ((hi - lo) // 3)
GROUP BY event_type"""


def nb_confusion_matrix(sf_dir: str) -> rd.Dataset:
    """Evaluation report for the trained language classifier — the
    confusion matrix (true lang × predicted lang, with the per-true-row
    recall in exact parts-per-2^20) every model-in-the-loop curation
    stage publishes before its predictions gate data. Pure composition:
    `nb_lang_classify`'s per-doc (lang, pred_lang) rows fold through a
    per-block combiner to ≤|langs|² cells, ONE tiny groupby, and the
    recall normalizes inside the single output block (the
    markov_transitions discipline). Returns
    (lang, pred_lang, n, recall_ppm)."""
    pred = nb_lang_classify(sf_dir)

    def fold(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": t["lang"].to_pylist(),
                           "pred_lang": t["pred_lang"].to_pylist()})
        g = df.groupby(["lang", "pred_lang"], as_index=False).size()
        return pa.table({
            "lang": pa.array(g.lang, pa.string()),
            "pred_lang": pa.array(g.pred_lang, pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    agg = (pred.map_batches(fold, batch_format="pyarrow")
           .groupby(["lang", "pred_lang"])
           .aggregate(Sum("c", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        tot = df.groupby("lang")["n"].transform("sum").to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        return pa.table({
            "lang": pa.array(df.lang, pa.string()),
            "pred_lang": pa.array(df.pred_lang, pa.string()),
            "n": pa.array(n, pa.int64()),
            "recall_ppm": pa.array((n << 20) // tot, pa.int64())})

    # ≤ |langs|² rows — one tiny block
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def nb_confusion_matrix_sql() -> str:
    return f"""
WITH nb AS ({nb_lang_classify_sql()}),
cells AS (
  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM nb GROUP BY lang, pred_lang
)
SELECT lang, pred_lang, n,
       (n * 1048576) // sum(n) OVER (PARTITION BY lang) AS recall_ppm
FROM cells"""


# ---------------------------------------------------------------------------
# global_sort_docs — sample-partitioned total order (session 9)
# ---------------------------------------------------------------------------


def global_sort_docs(sf_dir: str, num_partitions: int = 16,
                     sample_mod: int = 16) -> rd.Dataset:
    """TOTAL ORDER over the corpus — the TeraSort shape, spelled out
    (every other op in this repo avoids the global sort; this is the
    one that does it right when ranks are the product): docs rank by
    (n_chars DESC, doc_id), as one packed ascending int64 key.

      phase 0  deterministic hash-mod key sample (1/``sample_mod``,
               ids-only) → P−1 cut points on the driver (the sampled
               range partitioner; driver state = the sample, bounded —
               at 100 TB raise sample_mod so ~P·64 keys survive)
      phase 1  map-side ``searchsorted`` routes each row to its range
               partition; ONE groupby(r) shuffle; per-partition
               vectorized sort + LOCAL rank
      phase 2  per-partition row counts (P tiny rows) prefix-sum on
               the driver into offsets; global_rank = offset[r] +
               local_rank — a map-side add, no second exchange.

    Returns (doc_id, n_chars, rank) with rank exactly 1..N (the
    ROW_NUMBER oracle)."""
    import ray

    from ..functions.hashing import stable_hash64

    P = num_partitions
    SHIFT = 1 << 33  # doc_id < 2^33; n_chars < 2^30 → packed is exact

    def pack(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        nc = t["n_chars"].to_numpy()
        # (2^30 - 1 - nc): nc == 0 must pack to (2^30-1)·2^33 < 2^63
        # (the off-by-one overflowed an empty doc to the most-negative
        # key and ranked it FIRST — review finding)
        k = ((1 << 30) - 1 - nc.astype(np.int64)) * SHIFT \
            + ids.astype(np.int64)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64),
                                            pa.int64()),
                         "n_chars": pa.array(nc.astype(np.int64),
                                             pa.int64()),
                         "k": pa.array(k, pa.int64())})

    keyed = (_docs(sf_dir, ["doc_id", "n_chars"])
             .map_batches(pack, batch_format="pyarrow")
             .materialize())  # consumed three times below

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (stable_hash64(f"gs:{int(i)}") % sample_mod == 0 for i in ids),
            bool, len(ids))
        return pa.table({"k": pa.array(
            t["k"].to_numpy(zero_copy_only=False)[keep], pa.int64())})

    samp = np.sort(np.concatenate(
        [b["k"].to_numpy() for b in
         keyed.map_batches(sample, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")] or [np.array([], np.int64)]))
    if len(samp):
        cuts = samp[np.linspace(0, len(samp) - 1, P + 1)
                    .astype(np.int64)][1:-1]
        cuts = np.unique(cuts)
    else:
        cuts = np.array([], np.int64)
    cref = ray.put(cuts)

    def route(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        r = np.searchsorted(cs, t["k"].to_numpy(zero_copy_only=False),
                            side="right")
        return t.append_column("r", pa.array(r.astype(np.int64),
                                             pa.int64()))

    def sort_local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("k", kind="mergesort").reset_index(drop=True)
        g["lr"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    parts = (keyed.map_batches(route, batch_format="pyarrow")
             .groupby("r").map_groups(sort_local, batch_format="pandas")
             .materialize())

    def part_counts(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(r, return_counts=True)
        return pa.table({"r": pa.array(uniq.astype(np.int64), pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    cnt = (parts.map_batches(part_counts, batch_format="pyarrow")
           .groupby("r").aggregate(Sum("n", alias_name="n")).to_pandas()
           .sort_values("r"))
    offsets = dict(zip(cnt.r.astype(int),
                       np.concatenate([[0], np.cumsum(cnt.n)[:-1]])
                       .astype(int)))
    oref = ray.put(offsets)

    def finish(t: pa.Table) -> pa.Table:
        off = ray.get(oref)
        r = t["r"].to_numpy(zero_copy_only=False)
        lr = t["lr"].to_numpy(zero_copy_only=False)
        base = np.fromiter((off[int(x)] for x in r), np.int64, len(r))
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"],
                         "rank": pa.array(base + lr, pa.int64())})

    return parts.map_batches(finish, batch_format="pyarrow")


def global_sort_docs_sql() -> str:
    return """
SELECT doc_id, n_chars,
       CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
            AS BIGINT) AS rank
FROM documents"""


# ---------------------------------------------------------------------------
# nearest_centroid_classify — Rocchio over the embedding table (session 9)
# ---------------------------------------------------------------------------


def nearest_centroid_classify(sf_dir: str, dim: int = 64,
                              scale: int = 1 << 20) -> rd.Dataset:
    """Nearest-centroid (Rocchio) classification over the labeled
    embedding table — the one-pass trained vector classifier (the
    embedding-space sibling of `nb_lang_classify`): per-label centroid,
    then every vector assigns to the centroid with the largest dot
    product. Everything is EXACT integers, so the whole model replays
    bit-for-bit in SQL with no margin argument:

      codes    floor(x_f64 · 2^20) per coordinate (the identical
               float64 op chain both engines run; raw coords < 1 so
               codes < 2^20)
      centroid per-label floor-division mean of codes — integer sums
               are association-free; the per-block combiner emits
               ≤ |labels|·dim packed rows and ONE tiny groupby folds
               them (int64-safe to ~2^43 rows; promote the fold to
               Python bigints past that, the vocab_drift note)
      assign   argmax over labels of the int64 dot (≤ 64·2^40 — no
               overflow), ties → lowest label.

    Returns (vec_id, label, pred_label)."""
    import ray

    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def codes_of(t: pa.Table) -> np.ndarray:
        emb = np.asarray(t["embedding"].to_pylist(), np.float64)
        return np.floor(emb * float(scale)).astype(np.int64)

    def cent_partial(t: pa.Table) -> pa.Table:
        codes = codes_of(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), codes.shape[1]), np.int64)
        np.add.at(sums, inv, codes)
        counts = np.bincount(inv).astype(np.int64)
        ks, ss, cs = [], [], []
        for i, lab in enumerate(uniq):
            for d in range(codes.shape[1]):
                ks.append(int(lab) * dim + d)
                ss.append(int(sums[i, d]))
                cs.append(int(counts[i]))
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "s": pa.array(ss, pa.int64()),
                         "c": pa.array(cs, pa.int64())})

    cent_rows = (ds.map_batches(cent_partial, batch_format="pyarrow")
                 .groupby("k")
                 .aggregate(Sum("s", alias_name="s"),
                            Sum("c", alias_name="c"))
                 .to_pandas())
    labels = sorted({int(k) // dim for k in cent_rows.k})
    cent = np.zeros((len(labels), dim), np.int64)
    lab_ix = {lab: i for i, lab in enumerate(labels)}
    for r in cent_rows.itertuples():
        lab, d = int(r.k) // dim, int(r.k) % dim
        cent[lab_ix[lab], d] = int(r.s) // int(r.c)  # python floor div
    cref = ray.put((np.array(labels, np.int64), cent))

    def assign(t: pa.Table) -> pa.Table:
        labs, c = ray.get(cref)
        codes = codes_of(t)
        scores = codes @ c.T  # int64-exact
        best = np.argmax(scores == scores.max(axis=1, keepdims=True),
                         axis=1)  # first (lowest-label) argmax
        return pa.table({
            "vec_id": t["vec_id"],
            "label": pa.array(t["label"].to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64()),
            "pred_label": pa.array(labs[best], pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def nearest_centroid_classify_sql(dim: int = 64,
                                  scale: int = 1 << 20) -> str:
    # exact SQL floor division for signed sums: subtract the
    # non-negative remainder, then the division is exact (DuckDB's //
    # truncates toward zero, which differs from floor on negatives)
    return f"""
WITH v AS (
  SELECT vec_id, label, unnest(range({dim})) AS d,
         unnest(list_transform(CAST(embedding AS DOUBLE[]),
                               e -> CAST(floor(e * {scale}.0) AS BIGINT)))
           AS code
  FROM embeddings
), cent AS (
  SELECT label, d, (s - (((s % c) + c) % c)) // c AS val
  FROM (SELECT label, d, sum(code) AS s, count(*) AS c
        FROM v GROUP BY label, d)
), scores AS (
  SELECT v.vec_id, cent.label AS cand, sum(v.code * cent.val) AS score
  FROM v JOIN cent ON cent.d = v.d
  GROUP BY v.vec_id, cent.label
)
SELECT v2.vec_id, CAST(v2.label AS BIGINT) AS label,
       CAST(s.cand AS BIGINT) AS pred_label
FROM (SELECT DISTINCT vec_id, label FROM v) v2
JOIN (SELECT vec_id, cand FROM scores
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY score DESC, cand) = 1) s
  ON s.vec_id = v2.vec_id"""


# ---------------------------------------------------------------------------
# vocab_topv_ids — contiguous token-id assignment (session 9)
# ---------------------------------------------------------------------------


def vocab_topv_ids(sf_dir: str, v: int = 256) -> rd.Dataset:
    """Contiguous token-id assignment for the top-``v`` vocabulary —
    the id table every fixed-vocab tokenizer ships (word → dense
    0..V−1 by frequency, the piece after `bpe_train` learns merges and
    before embedding matrices are allocated): ids order by
    (count DESC, word) so the mapping is total and reproducible.

    Shape: the wordcount combiner fold + ONE groupby (the vocab_df
    exchange), then per-block PARTIAL top-v (the global top-v is a
    subset of the union of block top-vs) and one tiny final block
    sort+rank — the vocabulary never globally sorts. Returns
    (token_id, word, n_total) with token_id exactly 0..min(V,|vocab|)−1.
    """
    from collections import Counter

    def fold(batch: pa.Table) -> pa.Table:
        tot: Counter = Counter()
        for text in batch["text"].to_pylist():
            tot.update((text or "").split(" "))
        words = sorted(tot)
        return pa.table({"word": pa.array(words, pa.string()),
                         "c": pa.array([tot[w] for w in words],
                                       pa.int64())})

    counts = (_docs(sf_dir, ["text"])
              .map_batches(fold, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("c", alias_name="n_total")))

    def partial_topv(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n_total", "word"],
                                       ascending=[False, True],
                                       kind="mergesort")
        return pa.Table.from_pandas(df.head(v), preserve_index=False)

    def rank(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n_total", "word"],
                                       ascending=[False, True],
                                       kind="mergesort").head(v)
        return pa.table({
            "token_id": pa.array(np.arange(len(df), dtype=np.int64)),
            "word": pa.array(df.word, pa.string()),
            "n_total": pa.array(df.n_total.to_numpy(np.int64),
                                pa.int64())})

    return (counts.map_batches(partial_topv, batch_format="pyarrow")
            .repartition(1).map_batches(rank, batch_format="pyarrow"))


def vocab_topv_ids_sql(v: int = 256) -> str:
    return f"""
WITH uni AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_total
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_total DESC, word) - 1
            AS BIGINT) AS token_id,
       word, n_total
FROM uni
QUALIFY token_id < {v}"""


# ---------------------------------------------------------------------------
# attribution_last_touch — marketing attribution (session 9)
# ---------------------------------------------------------------------------

ATTR_WINDOW_DAYS = 3
ATTR_TOUCH_TYPES = ("click", "view")


def attribution_last_touch(sf_dir: str,
                           window_days: int = ATTR_WINDOW_DAYS) -> rd.Dataset:
    """Last-touch attribution — the marketing-analytics op (which
    touchpoint gets credit for a conversion): every ``purchase``
    attributes its cents to the user's most recent PRIOR ``click`` /
    ``view`` within a ``window_days`` lookback ((ts, event_id)
    lexicographic strictness, the event_funnel convention); purchases
    with no in-window touch report as ``direct``.

    Shape: the as-of-join family's keyed-window scan — ONE user-hash
    shuffle, per-partition vectorized sort + per-user cummax of touch
    positions (never a per-user apply), then a ≤|types|+1-row partial
    fold and ONE tiny groupby. Returns
    (source_type, n_purchases, sum_cents)."""
    P = 32
    win_us = window_days * DAY_US
    touch = set(ATTR_TOUCH_TYPES)

    ds = _read_table(sf_dir, "events",
                     ["event_id", "user_id", "ts", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().cast(pa.int64()).to_numpy()
        cents = np.round(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": pa.array(t["ts"].combine_chunks()
                              .cast(pa.timestamp("us")).cast(pa.int64())
                              .to_numpy(), pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "cents": pa.array(cents, pa.int64()),
            "_kp": pa.array(u % P, pa.int64())})

    def body(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_type": pd.Series([], dtype="object"),
                              "n": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype="int64")})
        if not len(g):
            return empty
        g = (g.sort_values(["user_id", "ts_us", "event_id"],
                           kind="mergesort").reset_index(drop=True))
        is_touch = g.event_type.isin(touch).to_numpy()
        pos = np.where(is_touch, np.arange(len(g)), -1)
        # last touch at-or-before each row, per user (cummax restarts)
        last = (pd.Series(pos).groupby(g.user_id.to_numpy(), sort=False)
                .cummax().to_numpy(np.int64))
        buy = (g.event_type == "purchase").to_numpy()
        rows = np.flatnonzero(buy)
        lp = last[rows]
        ok = lp >= 0
        ts = g.ts_us.to_numpy(np.int64)
        in_win = np.zeros(len(rows), bool)
        in_win[ok] = (ts[rows[ok]] - ts[lp[ok]]) <= win_us
        src = np.where(ok & in_win,
                       g.event_type.to_numpy(object)[np.maximum(lp, 0)],
                       "direct")
        cents = g.cents.to_numpy(np.int64)[rows]
        out = (pd.DataFrame({"source_type": src, "cents": cents})
               .groupby("source_type", as_index=False)
               .agg(n=("cents", "size"), s=("cents", "sum")))
        out["n"] = out.n.astype("int64")
        out["s"] = out.s.astype("int64")
        return out[["source_type", "n", "s"]]

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"source_type": t["source_type"],
                         "n_purchases": t["sum(n)"],
                         "sum_cents": t["sum(s)"]})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kp").map_groups(body, batch_format="pandas")
            .groupby("source_type").aggregate(Sum("n"), Sum("s"))
            .map_batches(rename, batch_format="pyarrow"))


def attribution_last_touch_sql(
        window_days: int = ATTR_WINDOW_DAYS) -> str:
    touches = ", ".join(f"'{t}'" for t in ATTR_TOUCH_TYPES)
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
t AS (SELECT * FROM e WHERE event_type IN ({touches})),
j AS (
  SELECT p.event_id AS pid, p.cents, t.event_type AS st,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts_us DESC, t.event_id DESC) AS rn
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND (t.ts_us < p.ts_us
        OR (t.ts_us = p.ts_us AND t.event_id < p.event_id))
   AND p.ts_us - t.ts_us <= {window_days} * {DAY_US}
), best AS (SELECT pid, cents, st FROM j WHERE rn = 1),
attributed AS (
  SELECT p.event_id, p.cents,
         COALESCE(b.st, 'direct') AS source_type
  FROM p LEFT JOIN best b ON b.pid = p.event_id
)
SELECT source_type, CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM attributed GROUP BY source_type"""


def knn_graph(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Exact cosine k-NN graph over the embedding table (self
    excluded) — see stages/dedup.knn_graph_exact: blocked all-pairs
    partial top-k + ONE merge groupby, quadratic by design (the
    exactness baseline; IVF cells are the scale path). Returns
    (vec_id, neighbor_id, rank)."""
    return dd.knn_graph_exact(
        _read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), k=k)


def knn_graph_sql(k: int = 3) -> str:
    return f"""
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id, neighbor_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}"""


def doc_length_gini(sf_dir: str) -> rd.Dataset:
    """Corpus concentration report — the EXACT Gini coefficient of the
    document-length distribution (the one-number answer to "is this
    crawl a few huge documents or many small ones", the skew statistic
    capacity planning and mix design read first). gini_ppm =
    ((2·Σ rank·x − (n+1)·Σx) · 2^20) // (n·Σx) over ascending
    (n_chars, doc_id) ranks — pure integers.

    Scale shape: NO global sort — ranks fold through the VALUE
    HISTOGRAM (the global_quantile_threshold sparse-partial pattern):
    each block emits (n_chars, count) rows, ONE tiny groupby, and the
    driver walks the ≤|distinct lengths| histogram in value order
    (equal values occupy a contiguous rank run, so Σ rank·x =
    Σ_v v·(c_v·before_v + c_v(c_v+1)/2) exactly — Python bigints, no
    overflow at any corpus size). Ties need no tie-break: rank·x sums
    identically however equal values order. Returns one row
    (n_docs, sum_chars, gini_ppm)."""
    ds = _docs(sf_dir, ["n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq.astype(np.int64), pa.int64()),
                         "c": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    rows = (ds.map_batches(hist, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="c"))
            .to_pandas().sort_values("v"))
    n = int(rows.c.sum())
    total = int((rows.v.astype(object) * rows.c.astype(object)).sum())
    before = 0
    rank_dot = 0
    for r in rows.itertuples():
        v, c = int(r.v), int(r.c)
        rank_dot += v * (c * before + c * (c + 1) // 2)
        before += c
    gini_ppm = ((2 * rank_dot - (n + 1) * total) << 20) // (n * total)
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "sum_chars": pa.array([total], pa.int64()),
        "gini_ppm": pa.array([gini_ppm], pa.int64())}))


def doc_length_gini_sql() -> str:
    return """
WITH r AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rnk
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(x) AS BIGINT) AS sum_chars,
       CAST((2 * sum(CAST(rnk AS HUGEINT) * x)
             - (count(*) + 1) * CAST(sum(x) AS HUGEINT)) * 1048576
            // (count(*) * CAST(sum(x) AS HUGEINT)) AS BIGINT)
         AS gini_ppm
FROM r"""


# ---------------------------------------------------------------------------
# containment_docs — near-superset detection (session 9)
# ---------------------------------------------------------------------------

CONT_MOD = 9          # docs with doc_id % 9 == 4 get a prefix copy
CONT_OFF = 6_000_000  # planted copy id offset
CONT_KEEP_NUM, CONT_KEEP_DEN = 3, 4  # keep ceil(3/4 of the words)


def _docs_with_planted_prefix_copies(sf_dir: str) -> rd.Dataset:
    """documents ∪ word-prefix copies: every doc_id % 9 == 4 doc adds
    (doc_id + 6e6, first ⌈¾·n_words⌉ words) — containment 100 but
    Jaccard ≈ 75, the asymmetric case `containment_docs` exists for.
    Pure map-side plant (the _docs_with_planted_near_dups convention)."""
    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out_i, out_t = list(ids), list(texts)
        for i, txt in zip(ids, texts):
            if int(i) % CONT_MOD == 4:
                ws = (txt or "").split(" ")
                keep = (CONT_KEEP_NUM * len(ws) + CONT_KEEP_DEN - 1) \
                    // CONT_KEEP_DEN
                out_i.append(int(i) + CONT_OFF)
                out_t.append(" ".join(ws[:keep]))
        return pa.table({"doc_id": pa.array([int(x) for x in out_i],
                                            pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow")


def containment_docs(sf_dir: str) -> rd.Dataset:
    """Near-superset pairs by exact shingle containment (see
    stages/dedup.containment_pairs — Broder's asymmetric statistic,
    with the size-ratio ≤ 3 contract that makes r=1 LSH recall
    deterministic: P(miss) ≤ 3e-10 at c ≥ 0.9). Planted word-prefix
    copies (J≈75, BELOW jaccard_pairs's 80 bar; ratio 4/3) must
    surface with containment ≈ 100 — the case the symmetric op
    structurally misses. Returns (a, b, containment_pct)."""
    return dd.containment_pairs(_docs_with_planted_prefix_copies(sf_dir))


def containment_docs_sql(threshold_pct: int = 90) -> str:
    toks = "regexp_extract_all(lower(text), '[\\pL\\pN_]+')"
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CONT_OFF},
         array_to_string(
           string_split(text, ' ')[1:({CONT_KEEP_NUM} * len(string_split(text, ' '))
                                      + {CONT_KEEP_DEN} - 1) // {CONT_KEEP_DEN}],
           ' ')
  FROM documents WHERE doc_id % {CONT_MOD} = 4
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len({toks}) < 3
      THEN [array_to_string({toks}, ' ')]
      ELSE list_transform(range(1, len({toks}) - 1),
             i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
    END) AS shingles
  FROM all_docs
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.shingles, b.shingles)) AS inter,
         least(len(a.shingles), len(b.shingles)) AS mn,
         greatest(len(a.shingles), len(b.shingles)) AS mx
  FROM sh a, sh b WHERE a.doc_id < b.doc_id
)
SELECT a, b,
       CAST(floor(100.0 * inter / mn + 0.5) AS BIGINT) AS containment_pct
FROM pairs
WHERE mn > 0 AND mx <= 3 * mn  -- the operator's size-ratio contract
  AND floor(100.0 * inter / mn + 0.5) >= {threshold_pct}"""


def audio_resample(sf_dir: str) -> rd.Dataset:
    """2:1 integer PCM downsample over the planted-WAV corpus (the
    preprocessing step speech pipelines run before feature extraction;
    stages/multimodal.AudioResampler — actor-pool decode, exact
    shift-mean integers so the whole resample replays closed-form in
    SQL from the sample law). Returns
    (doc_id, rate_out, n_out, mean_abs_out, checksum, decoded)."""
    from ..sources.gen_media import build_wav
    from ..stages import multimodal as mm

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array([f"media://wav/{d}" for d in ids], pa.string()),
            "html": pa.array([build_wav(d) for d in ids],
                             pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    out = mm.audio_resample(media, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "rate_out": batch["rate_out"],
            "n_out": batch["n_out"],
            "mean_abs_out": batch["mean_abs_out"],
            "checksum": batch["checksum"],
            "decoded": batch["decoded"],
        })

    return out.map_batches(project, batch_format="pyarrow")


def audio_resample_sql() -> str:
    n = "(400 + doc_id % 800)"
    s = (lambda i: f"((doc_id * 37 + 11 * ({i})) % 65536 - 32768)")
    pair = (f"(({s('2*j')}) + ({s('2*j+1')}) + 131072) // 2 - 65536")
    return f"""
SELECT doc_id,
  CAST(4000 AS BIGINT) AS rate_out,
  CAST({n} // 2 AS BIGINT) AS n_out,
  CAST(list_sum(list_transform(range(0, {n} // 2),
                               j -> abs({pair})))
       // ({n} // 2) AS BIGINT) AS mean_abs_out,
  CAST(list_sum(list_transform(range(0, {n} // 2), j -> {pair}))
       AS BIGINT) AS checksum,
  TRUE AS decoded
FROM documents"""


BM25_DELETE_MOD = 61  # takedown class: docs with doc_id % 61 == 0


def bm25_after_delete(sf_dir: str) -> rd.Dataset:
    """Index takedown end-to-end: a COPY of the persisted BM25 index
    gets a tombstone delete (`stages/textindex.delete_from_index`) for
    the doc_id % 61 == 0 class, then serves the standard query set —
    deleted docs must vanish from results AND stop distorting the
    collection statistics (df/idf/avgdl shift as if the docs never
    indexed). The oracle is the scan-path BM25 SQL over the filtered
    corpus — proving tombstone serving equals a from-scratch index of
    the post-takedown corpus. Probes filter map-side against the
    broadcast tombstone set; nothing rewrites until
    `apply_tombstones` folds them physically (tested separately)."""
    import shutil
    import tempfile

    from ..sources.corpus import _input_digest
    from ..stages import textindex as ti

    import hashlib
    import json

    base = os.path.join(tempfile.gettempdir(), "pdf_extraction_ray",
                        "textindex",
                        f"{os.path.basename(sf_dir)}-{_input_digest(sf_dir)}")
    ti.ensure_inverted_index(_docs(sf_dir, ["doc_id", "text"]), base,
                             stamp_ds=_docs(sf_dir, ["doc_id"]))
    # work on a copy: the shared digest-keyed index must stay pristine
    # for bm25_topk_indexed / search jobs
    work = base + "-takedown"
    ids = _docs(sf_dir, ["doc_id"]).to_pandas()
    banned = [int(i) for i in ids.doc_id if int(i) % BM25_DELETE_MOD == 0]
    with open(os.path.join(base, "_meta.json")) as f:
        base_fp = json.load(f)["id_fp"]
    marker = os.path.join(work, ".takedown-" + hashlib.sha256(
        f"{base_fp}:{','.join(map(str, banned))}".encode())
        .hexdigest()[:16])
    if not os.path.exists(marker):
        # rebuild the copy only when the base or the ban set changed
        # (a repeat query run reuses the standing takedown copy —
        # review finding: the full index copy was repaid every call)
        if os.path.exists(work):
            shutil.rmtree(work)
        shutil.copytree(base, work)
        ti.delete_from_index(work, banned)
        with open(marker, "w") as f:
            f.write("")
    return ti.bm25_topk_indexed(work, BM25_QUERIES, BM25_TOPK)


def bm25_after_delete_sql() -> str:
    return bm25_topk_sql(
        src=f"(SELECT doc_id, text FROM documents "
            f"WHERE doc_id % {BM25_DELETE_MOD} != 0)")


def image_histogram(sf_dir: str, bins: int = 16) -> rd.Dataset:
    """Per-image luminance histogram over the planted-PNG corpus (the
    exposure/contrast screen CV curation runs; real pixel decode in the
    actor pool — stages/multimodal.ImageHistogram). Grayscale pixel law
    (doc_id + 7x + 13y) % 256 replays the bins closed-form in SQL.
    Returns (doc_id, bin, n_px), non-empty bins only."""
    from ..sources.gen_media import build_png
    from ..stages import multimodal as mm

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array([f"media://img/{d}" for d in ids], pa.string()),
            "html": pa.array([build_png(d) for d in ids],
                             pa.large_binary()),
        })

    media = _docs(sf_dir, ["doc_id"]).map_batches(to_media,
                                                  batch_format="pyarrow")
    out = mm.image_histogram(media, bins=bins)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bin": batch["bin"],
            "n_px": batch["n_px"],
        })

    return out.map_batches(project, batch_format="pyarrow")


def image_histogram_sql(bins: int = 16) -> str:
    w, h = "(8 + doc_id % 25)", "(8 + doc_id % 17)"
    width = 256 // bins
    px = f"((doc_id + 7 * (i % {w}) + 13 * (i // {w})) % 256)"
    return f"""
SELECT doc_id, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_px
FROM (
  SELECT doc_id,
         unnest(list_transform(range(0, {w} * {h}),
                               i -> {px} // {width})) AS bin
  FROM documents
)
GROUP BY doc_id, bin"""


FUNNEL_WINDOW_US = 3 * 86_400 * 1_000_000  # 3-day per-step conversion cap


def event_funnel_timed(sf_dir: str) -> rd.Dataset:
    """TIMED ordered funnel — "converted within 3 days per step", the
    windowed variant every funnel dashboard actually reports (untimed
    funnels over long-lived users converge to 100%): same
    first-completion chain as `event_funnel`, each step additionally
    within FUNNEL_WINDOW_US of the previous one (greedy stays optimal —
    the window anchors on the previous step). Same keyed-window scan;
    shares the generalized kernel and oracle builder."""
    return event_funnel(sf_dir, step_window_us=FUNNEL_WINDOW_US)


def event_funnel_timed_sql() -> str:
    return event_funnel_sql(step_window_us=FUNNEL_WINDOW_US)


ANN_DELETE_MOD = 53  # takedown class: vectors with vec_id % 53 == 1


def ann_after_delete(sf_dir: str, k: int = 10,
                     n_centroids: int = 16) -> rd.Dataset:
    """Vector-index takedown end-to-end (the IVF symmetry of
    `bm25_after_delete`): a copy of the persisted IVF index gets a
    tombstone delete for the vec_id % 53 == 1 class
    (stages/similarity.delete_from_ivf_index), then answers the
    standard query set with a FULL probe — value-identical to brute
    force over the corpus minus the deleted class, so it shares
    ann_bruteforce's oracle with the corpus side filtered (query
    vectors stay the full table's first 5: external inputs a corpus
    takedown must not change). Repeat runs reuse the standing
    takedown copy via a content-addressed marker."""
    import hashlib
    import json
    import shutil
    from pathlib import Path

    q, qids = _query_vectors(sf_dir)
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    base = os.path.join("/tmp/pdf_extraction_ray/ivf",
                        Path(sf_dir).name or "sf")
    sim.ensure_ivf_index(ds, base, n_centroids=n_centroids)
    ids = _read_table(sf_dir, "embeddings", ["vec_id"]).to_pandas()
    banned = [int(i) for i in ids.vec_id if int(i) % ANN_DELETE_MOD == 1]
    work = base + "-takedown"
    with open(os.path.join(base, "_meta.json")) as f:
        base_fp = json.load(f)["id_fp"]
    marker = os.path.join(work, ".takedown-" + hashlib.sha256(
        f"{base_fp}:{','.join(map(str, banned))}".encode())
        .hexdigest()[:16])
    if not os.path.exists(marker):
        if os.path.exists(work):
            shutil.rmtree(work)
        shutil.copytree(base, work)
        sim.delete_from_ivf_index(work, banned)
        with open(marker, "w") as f:
            f.write("")
    return sim.topk_cosine_ivf_indexed(work, q, qids, k=k,
                                       n_probe=n_centroids)


def ann_after_delete_sql(k: int = 10) -> str:
    return ann_bruteforce_sql(
        k, src=f"(SELECT vec_id, embedding FROM embeddings "
               f"WHERE vec_id % {ANN_DELETE_MOD} != 1)")


def value_percentile_feature(sf_dir: str) -> rd.Dataset:
    """Percentile-rank feature encoding — map every event's value to
    its type's EXACT empirical percentile (rank_ppm = #strictly-smaller
    · 2^20 // n_type): the rank-transform feature ML pipelines apply to
    heavy-tailed inputs (the first half of rank-gauss), as a corpus
    statistic rather than a per-batch approximation.

    Shape: the sparse VALUE-HISTOGRAM broadcast (global_quantile /
    doc_length_gini pattern): per-block (type, cents, count) partials,
    ONE tiny groupby (bounded by the value DOMAIN, not the row count —
    cents here span ~10^4 distinct values; a truly unbounded domain
    would switch to the keyed-window rank shuffle), driver folds
    per-type (sorted values, exclusive-cumulative counts), broadcast
    once, and the encode pass is a vectorized searchsorted per batch —
    the corpus never shuffles. Returns
    (event_id, event_type, cents, rank_ppm)."""
    import ray

    ds = _read_table(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "cents": pa.array(cents, pa.int64())})

    cents_ds = ds.map_batches(to_cents, batch_format="pyarrow") \
        .materialize()  # consumed twice (histogram + encode)

    def hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "cents": t["cents"].to_numpy(
                               zero_copy_only=False)})
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        return pa.table({
            "event_type": pa.array(g.event_type, pa.string()),
            "cents": pa.array(g.cents.to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    rows = (cents_ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    tables = {}
    for t, g in rows.groupby("event_type"):
        g = g.sort_values("cents")
        vals = g.cents.to_numpy(np.int64)
        counts = g.c.to_numpy(np.int64)
        c_lt = np.concatenate([[0], np.cumsum(counts)[:-1]])
        tables[str(t)] = (vals, c_lt, int(counts.sum()))
    tref = ray.put(tables)

    def encode(t: pa.Table) -> pa.Table:
        tbls = ray.get(tref)
        types = t["event_type"].to_pylist()
        cents = t["cents"].to_numpy(zero_copy_only=False)
        out = np.empty(len(cents), np.int64)
        tarr = np.asarray(types, dtype=object)
        for ty, (vals, c_lt, n) in tbls.items():
            mask = tarr == ty
            if not mask.any():
                continue
            ix = np.searchsorted(vals, cents[mask])
            out[mask] = (c_lt[ix] << 20) // n
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "cents": t["cents"],
                         "rank_ppm": pa.array(out, pa.int64())})

    return cents_ds.map_batches(encode, batch_format="pyarrow")


def value_percentile_feature_sql() -> str:
    return """
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, event_type, cents,
       (CAST(RANK() OVER (PARTITION BY event_type ORDER BY cents)
             AS BIGINT) - 1) * 1048576
         // COUNT(*) OVER (PARTITION BY event_type) AS rank_ppm
FROM e"""


RW_LENGTH = 4   # hops per walk (positions 0..RW_LENGTH)


def _walk_chains(ids: np.ndarray, N: int, hubs: int,
                 length: int) -> np.ndarray:
    """The one definition of the walk law (shared by random_walks and
    walk_cooccurrence — the SQL oracles replay the same expressions):
    chains[i, step] for seeded-hash hops over the ordered expander
    edges [(c·31+7)%N, (c·17+3)%N, c%hubs]."""
    from ..functions.hashing import stable_hash64

    chains = np.empty((len(ids), length + 1), np.int64)
    chains[:, 0] = ids
    cur = ids.copy()
    for step in range(1, length + 1):
        h = np.fromiter(
            (stable_hash64(f"rw:{int(w)}:{step}") % 3 for w in ids),
            np.int64, len(ids))
        e0 = (cur * 31 + 7) % N
        e1 = (cur * 17 + 3) % N
        e2 = cur % hubs
        cur = np.where(h == 0, e0, np.where(h == 1, e1, e2))
        chains[:, step] = cur
    return chains


def random_walks(sf_dir: str, length: int = RW_LENGTH) -> rd.Dataset:
    """DeepWalk-style random-walk corpus over the planted link graph
    (Perozzi et al. 2014 — the walk table graph-embedding training
    consumes): one walk per node, each hop chosen by a SEEDED hash
    (h = stable_hash64("rw:walk:step") % 3 over the node's ORDERED
    out-edges), so the "random" walks are deterministic, reproducible
    across runs, and bit-exact replayable in SQL — the property that
    lets a 100-TB walk corpus be regenerated instead of stored.

    Scale shape: the out-edges are a function of the node id
    (pagerank_docs' expander), so every hop is a pure MAP — the whole
    operator runs with ZERO exchanges and no driver state beyond the
    loop counter (a real edge TABLE swaps each hop for ONE
    hash_join(cur, edges-with-rank) — the pagerank_links precedent).
    Returns (walk_id, step, node), steps 0..length."""
    docs = _docs(sf_dir, ["doc_id"])
    N = docs.count()
    hubs = min(_PR_HUBS, N)

    def walk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chains = _walk_chains(ids, N, hubs, length)
        steps = np.arange(length + 1, dtype=np.int64)
        return pa.table({
            "walk_id": pa.array(np.repeat(ids, length + 1), pa.int64()),
            "step": pa.array(np.tile(steps, len(ids)), pa.int64()),
            "node": pa.array(chains.ravel(), pa.int64())})

    return docs.map_batches(walk, batch_format="pyarrow")


def random_walks_sql(length: int = RW_LENGTH) -> str:
    parts = ["""s0 AS (
  SELECT doc_id AS walk_id, CAST(0 AS BIGINT) AS step,
         doc_id AS node
  FROM documents
), nn AS (SELECT count(*) AS n FROM documents),
hh AS (SELECT least({hubs}, n) AS h FROM nn)""".format(hubs=_PR_HUBS)]
    for step in range(1, length + 1):
        hexpr = _sql_hash64(
            f"sha256('rw:' || CAST(walk_id AS VARCHAR) || ':{step}')")
        parts.append(f"""s{step} AS (
  SELECT walk_id, CAST({step} AS BIGINT) AS step,
         CASE CAST(({hexpr}) % 3 AS BIGINT)
           WHEN 0 THEN (node * 31 + 7) % nn.n
           WHEN 1 THEN (node * 17 + 3) % nn.n
           ELSE node % hh.h
         END AS node
  FROM s{step - 1} CROSS JOIN nn CROSS JOIN hh
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, CAST(node AS BIGINT) AS node FROM s{i}"
        for i in range(length + 1))
    return "WITH " + ",\n".join(parts) + "\n" + union


RW_WINDOW = 2   # skip-gram context radius over walk positions


def walk_cooccurrence(sf_dir: str, length: int = RW_LENGTH,
                      window: int = RW_WINDOW) -> rd.Dataset:
    """Skip-gram co-occurrence counts over the walk corpus — the stage
    between `random_walks` and training node embeddings (DeepWalk
    feeds exactly these (center, context) pairs to word2vec): for
    every walk, all ordered pairs of positions within ``window`` hops.

    Scale shape: the walk is regenerated inside the SAME map that
    counts pairs (deterministic walks make the corpus free — nothing
    is stored or shuffled per step), each block folds its pairs to
    (a·2^32 + b, n) partials, and ONE groupby over the packed key
    bounded by the co-occurrence support finishes. Returns
    (a, b, n) with a = center node, b = context node, a ≠ b pairs
    ordered by walk direction (both directions emitted, as word2vec
    does)."""
    from collections import Counter

    docs = _docs(sf_dir, ["doc_id"])
    N = docs.count()
    if N >= 1 << 31:
        # packed pair key a·2^32 + b needs a < 2^31 for int64 (at that
        # node count switch the pair key to two columns)
        raise ValueError("walk_cooccurrence packed key needs N < 2^31")
    hubs = min(_PR_HUBS, N)

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chains = _walk_chains(ids, N, hubs, length)
        tot: Counter = Counter()
        for i in range(length + 1):
            for j in range(length + 1):
                if i == j or abs(i - j) > window:
                    continue
                a = chains[:, i]
                b = chains[:, j]
                keep = a != b  # self-pairs drop (a node revisited
                # within the window is not its own context)
                packed = a[keep] * (1 << 32) + b[keep]
                tot.update(packed.tolist())
        ks = sorted(tot)
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "n": pa.array([tot[x] for x in ks], pa.int64())})

    agg = (docs.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("n", alias_name="n")))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(k >> 32, pa.int64()),
                         "b": pa.array(k & 0xFFFFFFFF, pa.int64()),
                         "n": t["n"]})

    return agg.map_batches(unpack, batch_format="pyarrow")


def walk_cooccurrence_sql(length: int = RW_LENGTH,
                          window: int = RW_WINDOW) -> str:
    return f"""
WITH walks AS ({random_walks_sql(length)})
SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS n
FROM walks x JOIN walks y
  ON x.walk_id = y.walk_id
 AND x.step != y.step
 AND abs(x.step - y.step) <= {window}
 AND x.node != y.node
GROUP BY x.node, y.node"""


# ---------------------------------------------------------------------------
# content-defined chunking dedup census (session 10)
# ---------------------------------------------------------------------------

CDC_WINDOW = 16
CDC_BOUNDARY_MOD = 64


def cdc_chunk_stats(sf_dir: str) -> rd.Dataset:
    """Content-defined-chunking dedup census — the storage-dedup /
    incremental-sync primitive (rsync, FastCDC, restic) applied to the
    corpus: each document splits at rolling-hash-defined boundaries
    (``functions/hashing.cdc_boundaries`` — edit-local, unlike fixed
    blocks), chunks are identified by a 64-bit content hash, and each
    document reports how much of it is chunk-level duplicated anywhere
    in the corpus (shared boilerplate, quoted passages, re-crawl
    overlap — at sub-document granularity exact dedup can't see and
    cheaper than MinHash's pairwise view).

    Shape: one flat-map emits (doc_id, chunk_hash, chunk_len) rows —
    the text never rides an exchange; ONE chunk-hash-partitioned
    groupby computes global instance counts AND folds per-doc partials
    vectorized inside the partition (same-hash rows co-locate by
    construction); a final tiny groupby(doc_id) merges partials. A
    chunk instance is "duplicated" when its hash occurs ≥ 2 times
    corpus-wide (multiplicity counted, same-doc repeats included).
    Returns (doc_id, n_chunks, n_dup_chunks, dup_chars)."""
    from ..functions.hashing import cdc_boundaries, stable_hash64

    P = 64

    def chunks(t: pa.Table) -> pa.Table:
        ids, cks, lens = [], [], []
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            prev = 0
            for b in cdc_boundaries(txt, CDC_WINDOW, CDC_BOUNDARY_MOD):
                c = txt[prev:b]
                ids.append(d)
                cks.append(stable_hash64("cdc:" + c))
                lens.append(len(c))
                prev = b
        ck = np.asarray(cks, np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "ck": pa.array(ck, pa.int64()),
                         "clen": pa.array(lens, pa.int64()),
                         "__p": pa.array(ck % P, pa.int64())})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("ck")["doc_id"].transform("size").to_numpy(np.int64)
        dup = cnt >= 2
        df = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "nc": np.ones(len(g), np.int64),
            "nd": dup.astype(np.int64),
            "dc": np.where(dup, g["clen"].to_numpy(np.int64), 0)})
        return df.groupby("doc_id", as_index=False).sum()

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(chunks, batch_format="pyarrow")
            .groupby("__p").map_groups(per_partition, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(Sum("nc", alias_name="n_chunks"),
                       Sum("nd", alias_name="n_dup_chunks"),
                       Sum("dc", alias_name="dup_chars")))


def cdc_chunk_stats_sql(window: int = CDC_WINDOW,
                        boundary_mod: int = CDC_BOUNDARY_MOD) -> str:
    """Exact SQL replay: the same 16-term polynomial window hash as
    ``fingerprint_docs_sql`` (HUGEINT sums mod 2^64-59) marks the
    boundaries, chunks are carved with list arithmetic, and the chunk
    identity hash is the sha256-derived ``stable_hash64`` law. Assumes
    every document has ≥ ``window`` chars (corpus min length 44)."""
    base = 1099511628211
    mod = (1 << 64) - 59
    powers = [pow(base, window - 1 - j, mod) for j in range(window)]
    terms = " + ".join(
        f"CAST(ord(substr(text, i-{window - 1 - j}, 1)) AS HUGEINT)"
        f" * CAST('{powers[j]}' AS HUGEINT)" for j in range(window))
    return f"""
WITH b AS (
  SELECT doc_id, text,
    list_append(list_filter(
      list_transform(range({window}, length(text) + 1),
        i -> CASE WHEN ({terms}) % CAST('{mod}' AS HUGEINT)
                       % {boundary_mod} = 0
                   AND i < length(text) THEN i END),
      x -> x IS NOT NULL), length(text)) AS fb
  FROM documents
), ch AS (
  SELECT doc_id, unnest(list_transform(range(1, len(fb) + 1),
    j -> substr(text, coalesce(fb[j - 1], 0) + 1,
                fb[j] - coalesce(fb[j - 1], 0)))) AS chunk
  FROM b
), hx AS (
  SELECT doc_id, length(chunk) AS clen,
         sha256('cdc:' || chunk) AS h
  FROM ch
), keyed AS (
  SELECT doc_id, clen, {_sql_hash64("h")} AS ck FROM hx
), cnt AS (
  SELECT ck, count(*) AS c FROM keyed GROUP BY ck
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE cnt.c >= 2) AS BIGINT)
         AS n_dup_chunks,
       CAST(coalesce(sum(k.clen) FILTER (WHERE cnt.c >= 2), 0)
            AS BIGINT) AS dup_chars
FROM keyed k JOIN cnt ON cnt.ck = k.ck
GROUP BY k.doc_id"""
