"""Tests for the rows-only training-data operators: near-dedup recall on
planted near-copies, IVF recall vs brute force, fingerprints, windows,
multimodal stub plumbing."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def near_dup_ds(ray_session):
    from pdf_extraction_ray.pipelines.analytics import _docs_with_planted_near_dups
    return _docs_with_planted_near_dups(SF_SMOKE)


def test_minhash_clusters_planted_near_dups(ray_session, near_dup_ds):
    from pdf_extraction_ray.stages.dedup import minhash_cluster
    out = minhash_cluster(near_dup_ds, jaccard_threshold=0.5).to_pandas()
    clusters = dict(zip(out.doc_id, out.cluster_id))
    planted = [d for d in clusters if d >= 1_000_000]
    assert planted
    hits = sum(1 for d in planted if clusters[d] == clusters.get(d - 1_000_000))
    assert hits / len(planted) >= 0.9, f"{hits}/{len(planted)}"


def test_minhash_does_not_merge_unrelated(ray_session, near_dup_ds):
    from pdf_extraction_ray.stages.dedup import minhash_cluster
    out = minhash_cluster(near_dup_ds, jaccard_threshold=0.5).to_pandas()
    originals = out[out.doc_id < 1_000_000]
    # originals are distinct word-soup docs: the overwhelming majority
    # must keep their own cluster
    own = (originals.cluster_id == originals.doc_id).mean()
    assert own > 0.95


def test_simhash_labels_planted_near_dups(ray_session):
    from pdf_extraction_ray.pipelines.analytics import dedup_simhash
    out = dedup_simhash(SF_SMOKE).to_pandas()
    label = dict(zip(out.doc_id, out.dup_of))
    planted = [d for d in label if d >= 1_000_000]
    assert planted
    hits = sum(1 for d in planted if label[d] == d - 1_000_000)
    assert hits / len(planted) >= 0.85, f"{hits}/{len(planted)}"


def test_exact_dedup_first_wins(ray_session):
    from pdf_extraction_ray.pipelines.analytics import dedup_exact
    out = dedup_exact(SF_SMOKE).to_pandas()
    assert (out.doc_id < 1_000_000).all()  # planted copies never win


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    from pdf_extraction_ray.pipelines.analytics import ann_bruteforce, ann_ivf
    bf = ann_bruteforce(SF_SMOKE).to_pandas()
    ivf = ann_ivf(SF_SMOKE).to_pandas()
    recalls = []
    for qid in bf.query_id.unique():
        truth = set(bf[bf.query_id == qid].neighbor_id)
        approx = set(ivf[ivf.query_id == qid].neighbor_id)
        recalls.append(len(truth & approx) / len(truth))
    assert np.mean(recalls) >= 0.5, recalls


def test_ann_ivf_matches_oracle(ray_session):
    """The pruned-probe IVF is value-oracled since the integer-quantizer
    rewrite: the SQL replays sample -> integer k-means -> cell assign ->
    probe -> candidate top-k bit-for-bit."""
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import ann_ivf, ann_ivf_sql
    assert compare("ann_ivf", ann_ivf(SF_SMOKE), ann_ivf_sql(),
                   SF_SMOKE) == []


def test_ivf_quantization_margin():
    """Cross-engine safety of the quantized codes: a component only
    mis-floors if unit*Q sits within float summation noise (~1e-10) of
    an integer boundary — assert the corpus keeps a wide margin."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.stages.similarity import IVF_QSCALE, _unit_rows

    t = pq.read_table(SF_SMOKE + "/embeddings.parquet")
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    scaled = _unit_rows(mat) * IVF_QSCALE
    dist = np.abs(scaled - np.round(scaled))
    assert dist.min() > 1e-7, dist.min()


def test_ann_bruteforce_self_hit(ray_session):
    from pdf_extraction_ray.pipelines.analytics import ann_bruteforce
    bf = ann_bruteforce(SF_SMOKE).to_pandas()
    for qid in bf.query_id.unique():
        top1 = bf[(bf.query_id == qid) & (bf["rank"] == 1)].neighbor_id.iloc[0]
        assert top1 == qid  # a vector's nearest neighbor is itself


def test_fingerprints_deterministic(ray_session):
    from pdf_extraction_ray.pipelines.analytics import fingerprint_docs
    a = fingerprint_docs(SF_SMOKE).to_pandas().sort_values("doc_id")
    b = fingerprint_docs(SF_SMOKE).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (a.n_fingerprints > 0).all()


def test_fingerprints_oracle(ray_session):
    """The winnowing rolling hash replays value-exact in SQL (HUGEINT
    polynomial window sums) — the op is fully value-oracled, not
    rows-only."""
    from pdf_extraction_ray.pipelines.analytics import (fingerprint_docs,
                                                        fingerprint_docs_sql)
    from tests.oracle_check import compare

    assert compare("fingerprint_docs", fingerprint_docs(SF_SMOKE),
                   fingerprint_docs_sql(), SF_SMOKE) == []


def test_phash_dups_oracle(ray_session):
    """PNG encode → inflate → unfilter → aHash → equal-hash pairs
    replays value-exact from the closed-form pixel law in SQL — the op
    is fully value-oracled, not rows-only."""
    from pdf_extraction_ray.pipelines.analytics import (media_phash_dups,
                                                        media_phash_dups_sql)
    from tests.oracle_check import compare

    assert compare("media_phash_dups", media_phash_dups(SF_SMOKE),
                   media_phash_dups_sql(), SF_SMOKE) == []


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd
    from pdf_extraction_ray.stages.window import sessionize
    ts = pd.to_datetime([
        "2020-01-01 00:00", "2020-01-01 00:10",   # session 0
        "2020-01-01 01:00",                        # session 1 (gap 50m)
        "2020-01-01 01:20", "2020-01-01 01:49",    # still session 1
    ])
    df = pd.DataFrame({"user_id": [7] * 5, "ts": ts})
    out = sessionize(rd.from_pandas(df), gap_s=1800).to_pandas() \
        .sort_values("session_idx").reset_index(drop=True)
    assert out.n_events.tolist() == [2, 3]
    assert out.session_idx.tolist() == [0, 1]


def test_media_stub_plumbing(ray_session, pages_corpus):
    import ray.data as rd
    from pdf_extraction_ray.stages.multimodal import media_features
    pages = rd.read_parquet(pages_corpus).limit(40)
    out = media_features(pages).to_pandas()
    assert len(out) == 40
    assert (out.n_bytes == 0).sum() >= 0
    assert out.media_sha256.str.len().eq(64).all()
    assert out.width.between(64, 255).all()
    # html/pdf payloads are not images: fallback dims with decoded=False
    assert (~out.decoded).all()
    assert (out.mean_pixel == -1).all()
    # deterministic across runs
    out2 = media_features(rd.read_parquet(pages_corpus).limit(40)).to_pandas()
    assert out.sort_values("url").reset_index(drop=True).equals(
        out2.sort_values("url").reset_index(drop=True))


def test_png_decoder_roundtrip_and_filters():
    """Real decode of generated PNGs (filter 0) and of hand-filtered
    scanlines for filters 1-4."""
    import struct
    import zlib

    from pdf_extraction_ray.sources.gen_media import (build_bmp, build_png,
                                                      media_dims,
                                                      pixel_value)
    from pdf_extraction_ray.stages.multimodal import (decode_bmp_header,
                                                      decode_png)

    for doc_id in (0, 7, 123, 4242):
        png = decode_png(build_png(doc_id))
        w, h = media_dims(doc_id)
        assert (png["width"], png["height"], png["channels"]) == (w, h, 1)
        expect = bytes(pixel_value(doc_id, x, y)
                       for y in range(h) for x in range(w))
        assert png["pixels"] == expect

        bmp = decode_bmp_header(build_bmp(doc_id))
        assert (bmp["width"], bmp["height"], bmp["channels"]) == (w, h, 3)


def test_png_palette_decode():
    """color_type 3: indices resolve through PLTE to RGB (the round-2
    decoder returned None for palette payloads); corrupt palettes are
    rejected rather than emitting index-as-pixel garbage."""
    from pdf_extraction_ray.sources.gen_media import (PALETTE_SIZE,
                                                      build_png_palette,
                                                      media_dims,
                                                      palette_rgb,
                                                      pixel_value)
    from pdf_extraction_ray.stages.multimodal import decode_png

    for doc_id in (3, 10, 59, 1234):
        png = decode_png(build_png_palette(doc_id))
        w, h = media_dims(doc_id)
        assert (png["width"], png["height"], png["channels"]) == (w, h, 3)
        expect = b"".join(
            bytes(palette_rgb(pixel_value(doc_id, x, y) % PALETTE_SIZE))
            for y in range(h) for x in range(w))
        assert png["pixels"] == expect

    # a palette payload whose PLTE is missing must not decode
    payload = build_png_palette(3)
    plte_at = payload.index(b"PLTE") - 4
    ln = int.from_bytes(payload[plte_at:plte_at + 4], "big")
    stripped = payload[:plte_at] + payload[plte_at + 12 + ln:]
    assert decode_png(stripped) is None


def test_png_filter_undo():
    import struct
    import zlib

    from pdf_extraction_ray.stages.multimodal import decode_png

    # filters 1-4: encode known pixels with each filter, expect exact undo
    pixels = [[(x * 17 + y * 31) % 256 for x in range(6)] for y in range(5)]

    def encode(filter_type: int) -> bytes:
        raw = bytearray()
        prev = [0] * 6
        for y, line in enumerate(pixels):
            raw.append(filter_type)
            for x, v in enumerate(line):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                if filter_type == 1:
                    raw.append((v - a) & 0xFF)
                elif filter_type == 2:
                    raw.append((v - b) & 0xFF)
                elif filter_type == 3:
                    raw.append((v - ((a + b) >> 1)) & 0xFF)
                else:  # Paeth
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb and pa_ <= pc_ else (
                        b if pb <= pc_ else c)
                    raw.append((v - pred) & 0xFF)
            prev = line

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    flat = bytes(v for line in pixels for v in line)
    for f in (1, 2, 3, 4):
        assert decode_png(encode(f))["pixels"] == flat, f"filter {f}"


def test_ivf_index_is_persisted_and_pruned(ray_session, tmp_path):
    """The IVF index lives as cell-partitioned parquet and a probe reads
    only its queries' cells (the round-1 version re-streamed the corpus)."""
    import os

    import ray.data as rd

    from pdf_extraction_ray.stages import similarity as sim
    ds = rd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    cents = sim.build_ivf_index(ds, idx, n_centroids=8)
    cell_dirs = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert 1 < len(cell_dirs) <= 8
    assert os.path.exists(os.path.join(idx, "_centroids.npy"))
    assert np.allclose(sim.load_ivf_centroids(idx), cents)

    # index row count equals corpus row count (each vector in ONE cell)
    assert rd.read_parquet(idx).count() == ds.count()

    df = ds.limit(3).to_pandas()
    q = np.stack(df["embedding"].to_numpy())
    out = sim.topk_cosine_ivf_indexed(idx, q, df["vec_id"].tolist(),
                                      k=5, n_probe=2).to_pandas()
    for qid in df["vec_id"]:
        sub = out[out.query_id == qid]
        assert sub[sub["rank"] == 1].neighbor_id.iloc[0] == qid


def test_ivf_index_append_compact_and_reprobe(ray_session, tmp_path):
    """The admit half of an embedding ingest loop: append new vectors
    into the persisted IVF index (per-cell delta files, frozen
    quantizer, no rebuild) and the next probe finds them; ensure
    accepts both the base and the grown corpus (no rebuild wipe);
    duplicate submissions no-op; a same-pre-state retry reuses the
    delta tag; full-probe results == a fresh rebuild over the union ==
    brute force; compaction preserves probes."""
    import glob
    import json
    import os
    from functools import reduce

    import pandas as pd
    import ray.data as rd

    from pdf_extraction_ray.stages import similarity as sim

    base_df = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
    base = [{"vec_id": int(r.vec_id),
             "embedding": [float(x) for x in r.embedding]}
            for r in base_df.itertuples()]
    # new vectors: reversed components + id-dependent shift — distinct
    # from every corpus vector, so each one's own nearest neighbor is
    # itself
    new = [{"vec_id": 1_000_000 + i,
            "embedding": [float(x) + 0.01 * (i + 1)
                          for x in reversed(base[i]["embedding"])]}
           for i in range(5)]
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(rd.from_items(base), idx, n_centroids=8)

    meta1 = sim.append_to_ivf_index(rd.from_items(new), idx)
    assert meta1["n_rows"] == len(base) + 5
    assert meta1["n_appended"] == 5

    q = np.stack([np.asarray(d["embedding"]) for d in new])
    qids = [d["vec_id"] for d in new]
    got = sim.topk_cosine_ivf_indexed(idx, q, qids, k=4,
                                      n_probe=8).to_pandas()
    for qid in qids:
        sub = got[got.query_id == qid]
        assert sub[sub["rank"] == 1].neighbor_id.iloc[0] == qid

    # ensure no-ops for BOTH the grown corpus and the base corpus (the
    # ingest-loop caller keeps passing the base); meta is untouched
    files = sorted(glob.glob(idx + "/**/*.parquet", recursive=True))
    sim.ensure_ivf_index(rd.from_items(base + new), idx, n_centroids=8)
    sim.ensure_ivf_index(rd.from_items(base), idx, n_centroids=8)
    with open(os.path.join(idx, "_meta.json")) as f:
        assert json.load(f) == meta1
    assert sorted(glob.glob(idx + "/**/*.parquet", recursive=True)) == files

    # duplicate submission after the meta publish no-ops entirely
    assert sim.append_to_ivf_index(rd.from_items(new), idx) == meta1
    assert sorted(glob.glob(idx + "/**/*.parquet", recursive=True)) == files

    # a RETRY on the same pre-state reuses the delta tag — files
    # overwrite in place, never duplicate (simulate a crash before the
    # meta publish by restoring the pre-append meta)
    mp = os.path.join(idx, "_meta.json")
    with open(mp) as f:
        m = json.load(f)
    m["applied"] = []
    m["n_rows"] -= len(new)
    m["n_appended"] -= len(new)
    m["id_fp"] ^= reduce(lambda a, b: a ^ b, (d["vec_id"] for d in new))
    with open(mp, "w") as f:
        json.dump(m, f)
    assert sim.append_to_ivf_index(rd.from_items(new), idx)["n_rows"] \
        == len(base) + 5
    assert sorted(glob.glob(idx + "/**/*.parquet", recursive=True)) == files

    # full probe over the incremental index == fresh rebuild over the
    # union == brute force (full probe is brute force whatever the
    # centroids, so the frozen quantizer costs nothing here)
    idx2 = str(tmp_path / "ivf2")
    sim.build_ivf_index(rd.from_items(base + new), idx2, n_centroids=8)
    key = lambda df: (df.sort_values(["query_id", "rank"])  # noqa: E731
                        .reset_index(drop=True))
    fresh = sim.topk_cosine_ivf_indexed(idx2, q, qids, k=4,
                                        n_probe=8).to_pandas()
    brute = sim.topk_cosine(rd.from_items(base + new), q, qids,
                            k=4).to_pandas()
    pd.testing.assert_frame_equal(key(got), key(fresh))
    pd.testing.assert_frame_equal(key(got), key(brute))

    # compaction merges each multi-file cell dir, probe unchanged;
    # a second compact is a no-op
    stats = sim.compact_ivf_index(idx)
    assert stats["dirs_compacted"] > 0 and stats["files_removed"] > 0
    for d in glob.glob(idx + "/cell=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1
    after = sim.topk_cosine_ivf_indexed(idx, q, qids, k=4,
                                        n_probe=8).to_pandas()
    pd.testing.assert_frame_equal(key(got), key(after))
    assert sim.compact_ivf_index(idx) == {"dirs_compacted": 0,
                                          "files_removed": 0}


def test_ann_ivf_incremental_matches_bruteforce_oracle(ray_session):
    """Build on corpus-minus-holdout + incremental append + full probe
    must equal brute force over the whole table (the query shares
    ann_bruteforce's oracle — the driver's exact check)."""
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        ann_bruteforce_sql, ann_ivf_incremental)
    assert compare("ann_ivf_incremental", ann_ivf_incremental(SF_SMOKE),
                   ann_bruteforce_sql(), SF_SMOKE) == []


def test_embedding_cells_matches_exact_pairs(ray_session):
    """The cell-partitioned near-dup path finds exactly the pairs the
    blocked exact baseline finds on planted copies."""
    from pdf_extraction_ray.pipelines.analytics import (
        dedup_embedding_cells, embedding_dup_pairs)
    exact = embedding_dup_pairs(SF_SMOKE).to_pandas()
    cells = dedup_embedding_cells(SF_SMOKE).to_pandas()
    key = lambda df: sorted(zip(df.a, df.b))  # noqa: E731
    assert key(cells) == key(exact)
    assert len(exact) > 0


def test_embedding_exact_blocked_across_block_sizes(ray_session):
    """Block size must not change the exact pair set (cross-block pairs)."""
    from pdf_extraction_ray.pipelines.analytics import _embeddings_with_planted_dups
    from pdf_extraction_ray.stages.dedup import embedding_near_dup
    ds = _embeddings_with_planted_dups(SF_SMOKE)
    small = embedding_near_dup(ds, threshold_pct=99, block_rows=64).to_pandas()
    big = embedding_near_dup(ds, threshold_pct=99, block_rows=100000).to_pandas()
    key = lambda df: sorted(zip(df.a, df.b))  # noqa: E731
    assert key(small) == key(big)
    assert len(small) > 0


def test_connected_components_chain_and_clique(ray_session):
    """Min-label propagation with pointer jumping: a long chain (worst
    case for plain neighbor propagation) and a clique both collapse to
    their minimum node id."""
    import ray.data as rd

    from pdf_extraction_ray.stages.dedup import connected_components
    chain = [{"a": i, "b": i + 1} for i in range(10, 25)]        # 10..25
    clique = [{"a": x, "b": y} for x in (100, 101, 102, 103)
              for y in (100, 101, 102, 103) if x < y]
    iso_pair = [{"a": 7, "b": 8}]
    # both execution paths must agree: the single-task fast path
    # (default — this graph is far under task_cc_limit) and the
    # distributed iterative rounds (forced with task_cc_limit=0)
    for limit in (5_000_000, 0):
        labels = connected_components(
            rd.from_items(chain + clique + iso_pair),
            task_cc_limit=limit).to_pandas()
        got = dict(zip(labels.node, labels.label))
        assert all(got[n] == 10 for n in range(10, 26))
        assert all(got[n] == 100 for n in (100, 101, 102, 103))
        assert got[7] == 7 and got[8] == 7


def test_hll_approx_distinct_error_bound(ray_session):
    """HLL estimates stay within a few standard errors of exact distinct
    counts, globally and per key; merging partials across block sizes
    changes nothing (deterministic sha256 register updates)."""
    import os

    import ray.data as rd

    from pdf_extraction_ray.stages.sketch import (approx_distinct,
                                                  approx_distinct_by_key)
    path = os.path.join(SF_SMOKE, "events.parquet")
    ds = rd.read_parquet(path, columns=["event_type", "user_id"])
    df = ds.to_pandas()

    exact = df.user_id.nunique()
    est = approx_distinct(ds, "user_id", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    per_key = approx_distinct_by_key(ds, "event_type", "user_id",
                                     p=10).to_pandas()
    truth = df.groupby("event_type").user_id.nunique()
    for _, row in per_key.iterrows():
        t = truth[row.event_type]
        assert abs(row.approx_distinct - t) / t < 0.12, (row.event_type,
                                                         row.approx_distinct,
                                                         t)

    # topology-invariant: different block sizes, identical estimate
    est2 = approx_distinct(ds.repartition(13), "user_id", p=12)
    assert est2 == est


def test_phash_brightness_invariant_dedup(ray_session):
    """aHash is invariant to uniform brightness shifts (sha256 is not);
    the phash dedup pipeline recovers every planted shifted copy."""
    import hashlib

    from pdf_extraction_ray.pipelines.analytics import media_phash_dups
    from pdf_extraction_ray.sources.gen_media import build_png_shifted
    from pdf_extraction_ray.stages.multimodal import ahash64

    a = build_png_shifted(42)
    b = build_png_shifted(42, delta=30)
    assert a != b
    assert hashlib.sha256(a).digest() != hashlib.sha256(b).digest()
    assert ahash64(a) == ahash64(b)  # provable shift invariance
    assert ahash64(build_png_shifted(43)) != ahash64(a)

    pairs = media_phash_dups(SF_SMOKE).to_pandas()
    got = set(zip(pairs.a, pairs.b))
    # recall: every planted (original, shifted-copy) pair is recovered
    planted = [(d, d + 1_000_000) for d in range(0, 500, 10)]
    assert all(p in got for p in planted)
    # precision: accidental aHash collisions stay rare on textured images
    assert len(got) <= len(planted) + 25


def test_line_dedup_strips_planted_boilerplate(ray_session):
    """Planted template chrome (shared across docs) is removed; unique
    content lines survive; counts are exact."""
    import ray.data as rd
    from pdf_extraction_ray.stages.linededup import (boilerplate_lines,
                                                     drop_boilerplate)
    chrome = "SITE NAV | home | about | contact"
    docs = [{"url": f"u{i}",
             "extracted_text": f"{chrome}\n\nunique content {i}\n\nfooter"}
            for i in range(10)]
    docs.append({"url": "solo", "extracted_text": "one of a kind"})
    docs.append({"url": "empty", "extracted_text": ""})
    ds = rd.from_items(docs)

    boiler = boilerplate_lines(ds, min_docs=3).to_pandas()
    assert set(boiler.line) == {chrome, "footer"}
    assert boiler.set_index("line").loc[chrome, "n_docs"] == 10

    out = drop_boilerplate(ds, min_docs=3).to_pandas().set_index("url")
    assert out.loc["u4", "clean_text"] == "unique content 4"
    assert out.loc["u4", "n_kept"] == 1 and out.loc["u4", "n_dropped"] == 2
    assert out.loc["solo", "clean_text"] == "one of a kind"
    assert out.loc["empty", "clean_text"] == "" and out.loc["empty", "n_kept"] == 0


def test_dup_ngram_spans_flags_planted_copies(ray_session):
    """Docs with a planted partial copy have (nearly) all their 8-grams
    marked duplicated; docs without one have none."""
    from pdf_extraction_ray.pipelines.analytics import dup_ngram_spans
    out = dup_ngram_spans(SF_SMOKE).to_pandas().set_index("doc_id")
    planted_src = out[(out.index % 5 == 0) & (out.index < 1_000_000)]
    # the copy shares every gram except those crossing the trimmed tail
    assert (planted_src.n_dup_grams >= planted_src.n_grams - 8).all()
    # most docs without a planted copy are clean; the base table itself
    # contains organic near-dups (e.g. sf0.001 doc 498 is a prefix of
    # doc 474) which the operator CORRECTLY flags — exactness vs the
    # all-pairs SQL oracle is covered by the driver's hash gate
    clean = out[(out.index % 5 != 0) & (out.index < 1_000_000)]
    assert (clean.n_dup_grams == 0).mean() >= 0.85


def test_minhash_cluster_no_candidates(ray_session):
    """All-unique corpus: no LSH collisions → empty candidate set must
    flow through the join-based verify and label propagation, leaving
    every doc a singleton cluster (empty-block robustness)."""
    import ray.data as rd

    from pdf_extraction_ray.stages.dedup import minhash_cluster

    docs = rd.from_items([
        {"doc_id": i,
         "text": " ".join(f"u{i}w{j}" for j in range(30))}
        for i in range(40)
    ])
    out = minhash_cluster(docs, jaccard_threshold=0.5).to_pandas()
    assert len(out) == 40
    assert (out["cluster_id"] == out["doc_id"]).all()


def test_neardup_never_materializes_corpus(ray_session, near_dup_ds,
                                           monkeypatch):
    """The round-4 verdict's one scale flag: the in-memory near-dup
    family must never pin a text-bearing dataset (at 100 TB that is
    whole-corpus object-store spill). Spy on Dataset.materialize and
    assert every materialized dataset in minhash_cluster AND
    jaccard_pairs carries only ids/signatures/shingle-hashes/pairs —
    never the text column — while the planted-recall contract still
    holds (the ray.put-spy convention from relational.py's
    broadcast-guard test)."""
    import ray.data as rd

    from pdf_extraction_ray.stages.dedup import jaccard_pairs, minhash_cluster

    mat_cols: list[list[str]] = []
    real = rd.Dataset.materialize

    def spy(self, **kw):
        out = real(self, **kw)
        try:
            schema = out.schema(fetch_if_missing=False)
            names = list(schema.names) if schema is not None else []
        except Exception:
            names = []
        mat_cols.append(names)
        return out

    monkeypatch.setattr(rd.Dataset, "materialize", spy)

    out = minhash_cluster(near_dup_ds, jaccard_threshold=0.5).to_pandas()
    pairs = jaccard_pairs(near_dup_ds, threshold_pct=50).to_pandas()

    assert mat_cols, "spy saw no materialize() calls"
    offenders = [c for c in mat_cols if "text" in c]
    assert not offenders, offenders

    # the scale fix must not cost recall: planted near-dups still land
    # in their original's cluster, and still surface as verified pairs
    clusters = dict(zip(out.doc_id, out.cluster_id))
    planted = [d for d in clusters if d >= 1_000_000]
    assert planted
    hits = sum(1 for d in planted
               if clusters[d] == clusters.get(d - 1_000_000))
    assert hits / len(planted) >= 0.9
    found = set(zip(pairs.a, pairs.b))
    pair_hits = sum(1 for d in planted if (d - 1_000_000, d) in found)
    assert pair_hits / len(planted) >= 0.9


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-prune embedding dedup) + mixture rebalancing
# ---------------------------------------------------------------------------


def test_semdedup_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import semdedup, semdedup_sql
    assert compare("semdedup", semdedup(SF_SMOKE), semdedup_sql(),
                   SF_SMOKE) == []


def test_semdedup_planted_copies_pruned(ray_session):
    """Exact copies share their original's cluster (identical vectors →
    identical argmin) and must all be flagged; originals are mutually
    distant (natural max cosine ~0.51) so every original survives."""
    from pdf_extraction_ray.pipelines.analytics import semdedup
    out = semdedup(SF_SMOKE).to_pandas()
    planted = out[out.vec_id >= 100_000]
    originals = out[out.vec_id < 100_000]
    assert len(planted) > 0
    assert (planted.dup_of < planted.vec_id).all()
    assert (originals.dup_of == originals.vec_id).all()
    # copy and original co-clustered
    cl = dict(zip(out.vec_id, out.cluster_id))
    assert all(cl[v] == cl[v - 100_000] for v in planted.vec_id)
    # row-complete: every input vector appears exactly once
    assert len(out) == len(out.vec_id.unique())


def test_lang_balance_sample_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        lang_balance_sample, lang_balance_sample_sql)
    assert compare("lang_balance_sample", lang_balance_sample(SF_SMOKE),
                   lang_balance_sample_sql(), SF_SMOKE) == []


def test_lang_balance_sample_balances(ray_session):
    """The smallest language is kept whole (rate 1), and every kept
    per-lang count lands within hash noise of that minimum, whatever
    the input skew."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import lang_balance_sample
    src = pq.read_table(SF_SMOKE + "/documents.parquet",
                        columns=["lang"]).to_pandas()
    n_in = src.lang.value_counts()
    out = lang_balance_sample(SF_SMOKE).to_pandas()
    n_out = out.lang.value_counts()
    minn = int(n_in.min())
    assert int(n_out[n_in.idxmin()]) == minn
    for lang, kept in n_out.items():
        # binomial noise: expected minn, sd ~ sqrt(minn); allow 4 sd + 2
        assert abs(int(kept) - minn) <= 4 * minn ** 0.5 + 2, (lang, kept)


def test_dup_span_strip_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (dup_span_strip,
                                                        dup_span_strip_sql)
    assert compare("dup_span_strip", dup_span_strip(SF_SMOKE),
                   dup_span_strip_sql(), SF_SMOKE) == []


def test_dup_span_strip_keeps_one_owner_copy(ray_session):
    """Planted copies (doc_id + 1e6, suffix-truncated) lose nearly all
    their words — their grams are owned by the original — while the
    originals, which own every shared gram, keep their text intact
    unless another doc happens to share an 8-gram naturally."""
    from pdf_extraction_ray.pipelines.analytics import dup_span_strip
    out = dup_span_strip(SF_SMOKE).to_pandas().set_index("doc_id")
    planted = out[out.index >= 1_000_000]
    assert len(planted) > 0
    # a suffix-truncated copy of a >=8-word doc is fully covered
    big = planted[planted.n_words >= 16]
    assert (big.n_removed >= big.n_words - 8).all()
    # originals of the planted pairs keep everything (they own the grams)
    originals = out.loc[[i - 1_000_000 for i in planted.index]]
    assert (originals.n_removed == 0).mean() >= 0.95
    # conservation: clean_text word count == n_words - n_removed
    # ("" is ambiguous: 0 kept words, or kept words that are all empty
    # strings — split/join can't tell them apart; both engines agree)
    recount = out.clean_text.map(lambda t: len(t.split(" ")) if t else 0)
    kept = out.n_words - out.n_removed
    assert ((recount == kept) | (out.clean_text == "")).all()


def test_gopher_filter_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (gopher_filter,
                                                        gopher_filter_sql)
    assert compare("gopher_filter", gopher_filter(SF_SMOKE),
                   gopher_filter_sql(), SF_SMOKE) == []


def test_gopher_filter_reason_is_first_failing_rule(ray_session):
    """keep == (reason == 'pass'), reasons come from the fixed rule
    vocabulary, and the keep set equals quality_filter's doc set plus
    the repetition rule (rules 1-3 are quality_filter's)."""
    from pdf_extraction_ray.pipelines.analytics import (GOPHER_RULES,
                                                        gopher_filter,
                                                        quality_filter)
    out = gopher_filter(SF_SMOKE).to_pandas()
    assert set(out.reason) <= set(GOPHER_RULES) | {"pass"}
    assert (out.keep == (out.reason == "pass")).all()
    qf = set(quality_filter(SF_SMOKE).to_pandas().doc_id)
    kept = set(out[out.keep].doc_id)
    # gopher adds one more rule on top of quality_filter: kept ⊆ qf and
    # the difference is exactly the top_bigram_heavy rejections
    assert kept <= qf
    extra = out[out.doc_id.isin(qf - kept)]
    assert (extra.reason == "top_bigram_heavy").all()


def test_snapshot_ingest_dedup_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        snapshot_ingest_dedup, snapshot_ingest_dedup_sql)
    assert compare("snapshot_ingest_dedup", snapshot_ingest_dedup(SF_SMOKE),
                   snapshot_ingest_dedup_sql(), SF_SMOKE) == []


def test_snapshot_ingest_dedup_drops_only_recrawls(ray_session):
    """Unchanged re-crawls (doc_id % 3 == 0) are all dropped; edited
    re-crawls (doc_id % 3 == 1) all survive."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import snapshot_ingest_dedup
    out = snapshot_ingest_dedup(SF_SMOKE).to_pandas()
    ids = pq.read_table(SF_SMOKE + "/documents.parquet",
                        columns=["doc_id"]).to_pandas().doc_id
    expect = {int(i) + 2_000_000 for i in ids if i % 3 == 1}
    assert set(out.doc_id) == expect


def test_snapshot_neardup_ingest_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        snapshot_neardup_ingest, snapshot_neardup_ingest_sql)
    assert compare("snapshot_neardup_ingest",
                   snapshot_neardup_ingest(SF_SMOKE),
                   snapshot_neardup_ingest_sql(), SF_SMOKE) == []


def test_snapshot_neardup_ingest_planted_decisions(ray_session):
    """Exact re-crawls (% 5 == 1) match their original with full
    signature agreement; truncated re-crawls (% 5 == 0) — which the
    exact-hash path would ADMIT as novel — are caught as near-dups with
    high recall; brand-new docs (% 5 == 2) are all novel."""
    from pdf_extraction_ray.pipelines.analytics import snapshot_neardup_ingest
    out = snapshot_neardup_ingest(SF_SMOKE).to_pandas()
    out["orig"] = out.doc_id - 4_000_000

    exact = out[out.orig % 5 == 1]
    assert (exact.status == "dup").all()
    assert (exact.agree_k == 64).all()
    # tie-break = smallest indexed id at max agreement: the corpus
    # plants exact-duplicate texts, so dup_of can be an EARLIER
    # identical doc rather than the original — never a later one
    assert (exact.dup_of <= exact.orig).all()
    assert (exact.dup_of == exact.orig).mean() >= 0.8

    near = out[out.orig % 5 == 0]
    hit = near[near.status == "dup"]
    assert len(hit) >= 0.9 * len(near)
    assert (hit.dup_of == hit.orig).mean() >= 0.9

    novel = out[out.orig % 5 == 2]
    assert (novel.status == "novel").all()
    assert (novel.dup_of == -1).all()
    assert (novel.agree_k == 0).all()


def test_minhash_index_freshness_and_rebuild(ray_session, tmp_path):
    """ensure_minhash_index is a no-op on a fresh index (same ids, same
    signature family) and rebuilds when the corpus or the family
    changes; a probe against the persisted index finds exact and near
    dups and ignores novel text."""
    import os

    import ray.data as rd
    from pdf_extraction_ray.stages import dedup as dd

    docs = [{"doc_id": i,
             "text": " ".join(f"w{i}t{j}" for j in range(40))}
            for i in range(30)]
    ds = rd.from_items(docs)
    idx = str(tmp_path / "mh")
    meta1 = dd.ensure_minhash_index(ds, idx)
    stamp = os.stat(os.path.join(idx, "_meta.json")).st_mtime_ns
    meta2 = dd.ensure_minhash_index(ds, idx)
    assert meta1 == meta2
    assert os.stat(os.path.join(idx, "_meta.json")).st_mtime_ns == stamp

    # different signature family -> rebuild
    dd.ensure_minhash_index(ds, idx, num_perm=32, bands=8)
    assert os.stat(os.path.join(idx, "_meta.json")).st_mtime_ns != stamp

    # different corpus (one extra id) -> rebuild back to the default family
    ds2 = rd.from_items(docs + [{"doc_id": 99, "text": "zz yy xx " * 20}])
    meta3 = dd.ensure_minhash_index(ds2, idx)
    assert meta3["n_docs"] == 31 and meta3["num_perm"] == 64

    probe = rd.from_items([
        {"doc_id": 1000, "text": docs[3]["text"]},                # exact
        {"doc_id": 1001,
         "text": " ".join(f"w7t{j}" for j in range(38))},         # near of 7
        {"doc_id": 1002, "text": "totally different page body"},  # novel
    ])
    st = (dd.snapshot_neardup_statuses(probe, idx)
          .to_pandas().set_index("doc_id"))
    assert st.loc[1000, "status"] == "dup"
    assert st.loc[1000, "dup_of"] == 3
    assert st.loc[1000, "agree_k"] == 64
    assert st.loc[1001, "status"] == "dup"
    assert st.loc[1001, "dup_of"] == 7
    assert st.loc[1002, "status"] == "novel"


def test_minhash_index_append_and_reprobe(ray_session, tmp_path):
    """The admit half of the snapshot loop: append novel docs into the
    persisted index (delta files, no rebuild) and the next probe finds
    them; duplicate submissions no-op; a same-pre-state retry reuses
    the delta tag (idempotent overwrite); incremental == rebuilt."""
    import glob
    import json
    import os
    from functools import reduce

    import pandas as pd
    import ray.data as rd
    from pdf_extraction_ray.stages import dedup as dd

    docs = [{"doc_id": i, "text": " ".join(f"a{i}b{j}" for j in range(30))}
            for i in range(20)]
    novel = [{"doc_id": 100 + i,
              "text": " ".join(f"n{i}m{j}" for j in range(30))}
             for i in range(5)]
    idx = str(tmp_path / "mh")
    dd.build_minhash_index(rd.from_items(docs), idx)

    st = dd.snapshot_neardup_statuses(rd.from_items(novel), idx).to_pandas()
    assert (st.status == "novel").all()

    meta1 = dd.append_to_minhash_index(rd.from_items(novel), idx)
    assert meta1["n_docs"] == 25
    st2 = (dd.snapshot_neardup_statuses(rd.from_items(novel), idx)
           .to_pandas().set_index("doc_id"))
    assert (st2.status == "dup").all()
    assert (st2.agree_k == 64).all()
    assert (st2.dup_of == st2.index).all()

    # the appended index is FRESH for the grown corpus AND for its
    # base corpus (the ingest-loop caller keeps passing the base):
    # ensure no-ops on both
    assert dd.ensure_minhash_index(rd.from_items(docs + novel),
                                   idx) == meta1
    assert dd.ensure_minhash_index(rd.from_items(docs), idx) == meta1

    # duplicate submission after the meta publish no-ops entirely
    files = sorted(glob.glob(idx + "/**/*.parquet", recursive=True))
    assert dd.append_to_minhash_index(rd.from_items(novel), idx) == meta1
    assert sorted(glob.glob(idx + "/**/*.parquet", recursive=True)) == files

    # a RETRY on the same pre-state reuses the delta tag — files
    # overwrite in place, never duplicate (simulate a crash before the
    # meta publish by restoring the pre-append meta)
    mp = os.path.join(idx, "_meta.json")
    with open(mp) as f:
        m = json.load(f)
    m["applied"] = []
    m["n_docs"] -= len(novel)
    m["id_fp"] ^= reduce(lambda a, b: a ^ b, (d["doc_id"] for d in novel))
    with open(mp, "w") as f:
        json.dump(m, f)
    meta3 = dd.append_to_minhash_index(rd.from_items(novel), idx)
    assert meta3["n_docs"] == 25
    assert sorted(glob.glob(idx + "/**/*.parquet", recursive=True)) == files

    # incremental index == fresh rebuild over the grown corpus
    idx2 = str(tmp_path / "mh2")
    dd.build_minhash_index(rd.from_items(docs + novel), idx2)
    mixed = rd.from_items([
        {"doc_id": 900, "text": docs[3]["text"]},
        {"doc_id": 901, "text": novel[2]["text"]},
        {"doc_id": 902, "text": "completely other thing"}])
    a = (dd.snapshot_neardup_statuses(mixed, idx).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dd.snapshot_neardup_statuses(mixed, idx2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a.status.tolist() == ["dup", "dup", "novel"]

    # compaction merges base + deltas per directory, probe unchanged;
    # a second compact is a no-op
    stats = dd.compact_minhash_index(idx)
    assert stats["dirs_compacted"] > 0 and stats["files_removed"] > 0
    for d in glob.glob(idx + "/bands/p=*") + [idx + "/sigs"]:
        assert len(glob.glob(d + "/*.parquet")) == 1
    c = (dd.snapshot_neardup_statuses(mixed, idx).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, c)
    assert dd.compact_minhash_index(idx) == {"dirs_compacted": 0,
                                             "files_removed": 0}


def test_minhash_probe_prunes_posting_partitions(ray_session, monkeypatch):
    """A one-doc probe against a num_parts=64 index reads ONLY the
    bands/p=K/ files its own <=16 band keys hash into — O(snapshot)
    IO, not O(corpus) — and still finds the right match."""
    import ray.data as rd
    from pdf_extraction_ray.stages import dedup as dd

    docs = [{"doc_id": i, "text": " ".join(f"c{i}d{j}" for j in range(30))}
            for i in range(25)]
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        idx = td + "/mh"
        dd.build_minhash_index(rd.from_items(docs), idx, num_parts=64)

        read_paths = []
        real_read = dd.rd.read_parquet

        def spy(paths, **kw):
            if isinstance(paths, list):
                read_paths.append(list(paths))
            return real_read(paths, **kw)

        monkeypatch.setattr(dd.rd, "read_parquet", spy)
        probe = rd.from_items([{"doc_id": 700, "text": docs[9]["text"]}])
        out = dd.snapshot_neardup_statuses(probe, idx).to_pandas()
        assert out.status.tolist() == ["dup"]
        assert out.dup_of.tolist() == [9]

        band_lists = [ps for ps in read_paths
                      if any("/bands/" in p for p in ps)]
        assert band_lists, "probe no longer list-reads the postings"
        touched = {p.split("/p=")[1].split("/")[0]
                   for ps in band_lists for p in ps}
        assert len(touched) <= 16  # one doc -> at most 16 band keys


def test_minhash_probe_no_driver_broadcast(ray_session, monkeypatch):
    """The probe attaches both signature sides via distributed hash
    joins — the driver never ray.put()s a signature map or shingle
    payload."""
    import ray
    import ray.data as rd
    from pdf_extraction_ray.stages import dedup as dd

    puts: list = []
    real_put = ray.put
    monkeypatch.setattr(ray, "put",
                        lambda obj, **kw: (puts.append(obj),
                                           real_put(obj, **kw))[1])
    docs = [{"doc_id": i, "text": " ".join(f"q{i}x{j}" for j in range(30))}
            for i in range(20)]
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        idx = td + "/mh"
        dd.build_minhash_index(rd.from_items(docs), idx)
        probe = rd.from_items([{"doc_id": 500, "text": docs[5]["text"]}])
        out = dd.snapshot_neardup_statuses(probe, idx).to_pandas()
    assert out.status.tolist() == ["dup"]
    assert not any(isinstance(p, (dict, set, frozenset)) for p in puts)


def test_curate_pipeline_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (curate_pipeline,
                                                        curate_pipeline_sql)
    assert compare("curate_pipeline", curate_pipeline(SF_SMOKE),
                   curate_pipeline_sql(), SF_SMOKE) == []


def test_curate_pipeline_stage_invariants(ray_session):
    """Chain invariants: survivors pass the gopher rules, exclude the
    benchmark docs, carry no benchmark 8-gram, shards are balanced to
    within 1 (round-robin over a rank), and the doc set is a subset of
    the standalone gopher_filter keeps."""
    from pdf_extraction_ray.pipelines.analytics import (DECONTAM_BENCH_MOD,
                                                        curate_pipeline,
                                                        gopher_filter)
    out = curate_pipeline(SF_SMOKE).to_pandas()
    assert len(out) > 0
    assert (out.doc_id % DECONTAM_BENCH_MOD != 0).all()
    kept = set(gopher_filter(SF_SMOKE).to_pandas()
               .query("keep").doc_id)
    assert set(out.doc_id) <= kept
    sizes = out.shard.value_counts()
    assert sizes.max() - sizes.min() <= 1


def test_dup_span_strip_join_mode_identical(ray_session):
    """The distributed-join mode (no driver gram state) must be
    value-identical to the broadcast mode — and both share the SQL
    oracle via the driver contract."""
    from pdf_extraction_ray.pipelines.analytics import dup_span_strip
    a = (dup_span_strip(SF_SMOKE).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_span_strip(SF_SMOKE, mode="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True)[a.columns])
    assert a.equals(b)


def test_curate_pipeline_partitioned_output(ray_session, tmp_path):
    """out_dir lands the manifest as shard=K/ hive partitions whose
    union round-trips to the in-memory result."""
    import os

    import ray.data as rd

    from pdf_extraction_ray.pipelines.analytics import curate_pipeline
    out_dir = str(tmp_path / "curated")
    mem = (curate_pipeline(SF_SMOKE, out_dir=out_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("shard="))
    assert len(dirs) == mem.shard.nunique()
    disk = (rd.read_parquet(out_dir).to_pandas()
            .astype({"shard": "int64"})[mem.columns]
            .sort_values("doc_id").reset_index(drop=True))
    assert disk.equals(mem)


def test_doc_signals_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (doc_signals,
                                                        doc_signals_sql)
    assert compare("doc_signals", doc_signals(SF_SMOKE),
                   doc_signals_sql(), SF_SMOKE) == []


def test_doc_signals_consistent_with_standalone_ops(ray_session):
    """The fused signal columns must byte-match the standalone
    operators they fuse (one-pass == N-pass)."""
    from pdf_extraction_ray.pipelines.analytics import (doc_signals,
                                                        gopher_filter,
                                                        lang_id,
                                                        token_stats)
    sig = doc_signals(SF_SMOKE).to_pandas().set_index("doc_id").sort_index()
    tok = token_stats(SF_SMOKE).to_pandas().set_index("doc_id").sort_index()
    for c in ("n_tokens", "n_stop", "n_upper", "sum_token_len",
              "token_estimate"):
        assert (sig[c] == tok[c]).all(), c
    lid = lang_id(SF_SMOKE).to_pandas().set_index("doc_id").sort_index()
    assert (sig.lang_pred == lid.lang_pred).all()
    gf = gopher_filter(SF_SMOKE).to_pandas().set_index("doc_id").sort_index()
    assert (sig.reason == gf.reason).all()


def test_c4_line_filter_matches_duckdb(ray_session):
    import __ray_entry__ as entrymod
    from tests.oracle_check import compare

    from pdf_extraction_ray import oracle
    assert compare("c4_line_filter", entrymod.q_c4_line_filter(SF_SMOKE),
                   oracle.c4_line_filter_sql(), SF_SMOKE) == []


def test_c4_line_filter_rules(ray_session):
    """Kept lines all satisfy the line rules; terminal-punct mode keeps
    only sentence-like lines; page bans reject regardless of lines."""
    import ray.data as rd

    from pdf_extraction_ray.stages.linededup import c4_line_filter

    rows = [
        {"url": "u1", "extracted_text":
            "A good line here.\nshort\nAnother fine line!\n"
            "enable javascript to view\nNo punctuation line here\n"
            "One more full sentence.\nAnd again more words.\n"
            "Fifth proper sentence here."},
        {"url": "u2", "extracted_text": "lorem ipsum dolor sit amet\n"
            + "\n".join(f"perfectly fine line number {i}." for i in range(8))},
        {"url": "u3", "extracted_text":
            "var x = {a: 1}\n"
            + "\n".join(f"acceptable line number {i}." for i in range(8))},
    ]
    ds = rd.from_items(rows)
    out = (c4_line_filter(ds, require_terminal_punct=True)
           .to_pandas().set_index("url"))
    u1 = out.loc["u1"]
    # dropped: 'short' (<3 words), javascript line, no-punct line
    assert u1.n_kept == 5 and u1.n_dropped == 3 and u1.keep
    assert "javascript" not in u1.clean_text
    assert "short" not in u1.clean_text.split("\n")
    assert not out.loc["u2"].keep      # lorem ipsum page ban
    assert not out.loc["u3"].keep      # '{' page ban
    # default mode: punctuation not required
    lax = (c4_line_filter(ds).to_pandas().set_index("url"))
    assert lax.loc["u1"].n_kept == 6   # no-punct line survives


def test_nb_lang_classify_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        nb_lang_classify, nb_lang_classify_sql)
    assert compare("nb_lang_classify", nb_lang_classify(SF_SMOKE),
                   nb_lang_classify_sql(), SF_SMOKE) == []


def test_nb_lang_classify_sane_and_margin_safe(ray_session):
    """The trained classifier covers every doc, predicts only real
    classes, does at least as well as the majority baseline on its own
    training corpus (the synthetic corpus' lang-text signal is weak, so
    this is an empirical floor, not a model claim), and every quantized
    log-prob constant keeps a wide margin to its rounding boundary —
    the cross-engine exactness precondition (the dsir pattern)."""
    import math

    import duckdb

    from pdf_extraction_ray.pipelines.analytics import nb_lang_classify
    out = nb_lang_classify(SF_SMOKE).to_pandas()
    docs = duckdb.sql(
        f"SELECT lang, count(*) n FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') GROUP BY lang"
    ).df()
    assert len(out) == int(docs.n.sum())
    classes = set(docs.lang)
    assert set(out.pred_lang) <= classes
    acc = (out.lang == out.pred_lang).mean()
    maj = docs.n.max() / docs.n.sum()
    assert acc >= maj

    # quantization boundary margin over every (class, bucket) constant
    B = 64
    con = duckdb.connect()
    cb = con.sql(f"""
        WITH words AS (SELECT lang, unnest(string_split(text, ' ')) w
                       FROM read_parquet('{SF_SMOKE}/documents.parquet')),
        wb AS (SELECT lang,
                      list_reduce(list_prepend(2166136261::UBIGINT,
                        list_transform(range(1, length(w) + 1),
                          i -> unicode(substr(w, i, 1))::UBIGINT)),
                        (h, c) -> (xor(h, c) * 16777619) % 4294967296)
                      % {B} AS b
               FROM words WHERE w <> '')
        SELECT lang, b, count(*) c FROM wb GROUP BY lang, b""").fetchall()
    con.close()
    tot: dict[str, int] = {}
    for lang, _, c in cb:
        tot[lang] = tot.get(lang, 0) + c
    worst = 1.0
    for lang, _, c in cb:
        x = 1_000_000 * (math.log(c + 1) - math.log(tot[lang] + B)) + 0.5
        worst = min(worst, abs(x - round(x)))
    # the per-class PRIOR constants must keep the same margin
    n_all, n_cls = int(docs.n.sum()), len(docs)
    for nd in docs.n:
        x = 1_000_000 * (math.log(int(nd) + 1)
                         - math.log(n_all + n_cls)) + 0.5
        worst = min(worst, abs(x - round(x)))
    assert worst > 1e-6, worst


def test_decontam_neardup_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        decontam_neardup, decontam_neardup_sql)
    assert compare("decontam_neardup", decontam_neardup(SF_SMOKE),
                   decontam_neardup_sql(), SF_SMOKE) == []


def test_decontam_neardup_flags_planted_copies(ray_session):
    """Every planted truncated benchmark copy is flagged contaminated
    with its source benchmark doc as bench_ref — the fuzzy case the
    exact 8-gram decontam pass can miss on edited copies."""
    from pdf_extraction_ray.pipelines.analytics import (
        DECONTAM_ND_PLANT_OFFSET, decontam_neardup)
    out = decontam_neardup(SF_SMOKE).to_pandas()
    plants = out[out.doc_id >= DECONTAM_ND_PLANT_OFFSET]
    assert len(plants) > 0
    assert plants.contaminated.all()
    assert (plants.bench_ref
            == plants.doc_id - DECONTAM_ND_PLANT_OFFSET).all()
    # the training side is padded complete: every non-benchmark doc has
    # a decision row
    n_train = (out.doc_id < DECONTAM_ND_PLANT_OFFSET).sum()
    import pyarrow.parquet as pq
    ids = pq.read_table(SF_SMOKE + "/documents.parquet",
                        columns=["doc_id"]).to_pandas().doc_id
    assert n_train == int((ids % 97 != 0).sum())


def test_dsir_select_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (dsir_select,
                                                        dsir_select_sql)
    assert compare("dsir_select", dsir_select(SF_SMOKE),
                   dsir_select_sql(), SF_SMOKE) == []


def test_dsir_select_targets_the_target_domain(ray_session):
    """Selection size is exactly ceil(frac*N); target-language docs are
    over-represented among the selected vs their corpus share (the
    whole point of importance resampling); weights are integers with a
    comfortable margin at the selection boundary (no float-tie risk)."""
    import math

    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import dsir_select
    out = dsir_select(SF_SMOKE).to_pandas()
    docs = pq.read_table(SF_SMOKE + "/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    n = len(docs)
    assert out.selected.sum() == math.ceil(0.25 * n)
    merged = out.merge(docs, on="doc_id")
    en_share_all = (merged.lang == "en").mean()
    en_share_sel = (merged[merged.selected].lang == "en").mean()
    assert en_share_sel > en_share_all
    # weights are pure BIGINTs (the quantized-score design): no float
    # ever reaches the selection comparison, so ties are exact and
    # break on doc_id deterministically
    assert out.weight.dtype == "int64"
    w = merged.sort_values(["weight", "doc_id"],
                           ascending=[False, True])
    k = math.ceil(0.25 * n)
    sel_ids = set(merged[merged.selected].doc_id)
    assert sel_ids == set(w.head(k).doc_id)   # exactly the top-k rows


def test_cluster_keep_best_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        cluster_keep_best, cluster_keep_best_sql)
    assert compare("cluster_keep_best", cluster_keep_best(SF_SMOKE),
                   cluster_keep_best_sql(), SF_SMOKE) == []


def test_cluster_keep_best_survivor_policy(ray_session):
    """Exactly one survivor per cluster; the survivor is a longest doc
    (ties -> smallest doc_id); planted near-copies (12 chars shorter)
    never survive against their original."""
    from pdf_extraction_ray.pipelines.analytics import cluster_keep_best
    out = cluster_keep_best(SF_SMOKE).to_pandas()
    per = out.groupby("cluster_id")
    assert (per.is_survivor.sum() == 1).all()
    assert (per.size() == per.cluster_size.first()).all()
    for cid, grp in per:
        best = grp.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True]).iloc[0]
        assert best.is_survivor
        assert (grp.survivor_id == best.doc_id).all()
    planted = out[out.doc_id >= 1_000_000]
    multi = planted[planted.cluster_size > 1]
    assert len(multi) > 0 and not multi.is_survivor.any()


def test_bpe_pair_counts_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (bpe_pair_counts,
                                                        bpe_pair_counts_sql)
    assert compare("bpe_pair_counts", bpe_pair_counts(SF_SMOKE),
                   bpe_pair_counts_sql(), SF_SMOKE) == []


def test_bpe_pair_counts_is_the_merge_statistic(ray_session):
    """Counts equal a serial recount over the raw corpus; ordering is
    count desc then pair asc; lhs/rhs split the 2-char pair."""
    from collections import Counter

    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import bpe_pair_counts
    out = bpe_pair_counts(SF_SMOKE, k=16).to_pandas()
    texts = pq.read_table(SF_SMOKE + "/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    c: Counter = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    assert list(zip(out.pair, out.pair_count)) == expect
    assert (out.lhs + out.rhs == out.pair).all()


def test_bpe_train_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (bpe_train,
                                                        bpe_train_sql)
    assert compare("bpe_train", bpe_train(SF_SMOKE),
                   bpe_train_sql(), SF_SMOKE) == []


def test_bpe_train_distributed_path_agrees(ray_session):
    """driver_word_cap=0 forces the distributed per-round loop; it must
    learn the identical merge table, and merge counts are
    non-increasing across steps (each later merge's occurrences are
    bounded by an earlier round's argmax)."""
    from pdf_extraction_ray.pipelines.analytics import bpe_train
    local = bpe_train(SF_SMOKE).to_pandas()
    dist = bpe_train(SF_SMOKE, driver_word_cap=0).to_pandas()
    assert local.equals(dist)
    assert len(local) == 8
    assert (local.pair_count.diff().dropna() <= 0).all()
    assert (local.lhs + local.rhs == local.pair).all()


def test_bpe_token_counts_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        bpe_token_counts, bpe_token_counts_sql)
    assert compare("bpe_token_counts", bpe_token_counts(SF_SMOKE),
                   bpe_token_counts_sql(), SF_SMOKE) == []


def test_bpe_token_counts_compress(ray_session):
    """Encoding with merges never yields more tokens than characters
    and strictly compresses somewhere; n_words lower-bounds n_tokens
    (each word is >= 1 symbol)."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import bpe_token_counts
    out = bpe_token_counts(SF_SMOKE).to_pandas().set_index("doc_id")
    docs = pq.read_table(SF_SMOKE + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    chars = {r.doc_id: sum(len(w) for w in r.text.split(" ") if w)
             for r in docs.itertuples()}
    assert (out.n_tokens <= out.index.map(chars)).all()
    assert (out.n_tokens < out.index.map(chars)).any()
    assert (out.n_tokens >= out.n_words).all()


def test_pagerank_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (pagerank_docs,
                                                        pagerank_docs_sql)
    assert compare("pagerank_docs", pagerank_docs(SF_SMOKE),
                   pagerank_docs_sql(), SF_SMOKE) == []


def test_pagerank_hub_dominance(ray_session):
    """The 16 planted hubs (doc_id % 16 targets) collect ~N/16 in-links
    each and must outrank every non-hub; total rank mass stays within
    the floor-division leak bound of N*scale."""
    from pdf_extraction_ray.pipelines.analytics import (_PR_HUBS,
                                                        pagerank_docs)
    out = pagerank_docs(SF_SMOKE).to_pandas().set_index("doc_id")
    hubs = out[out.index < _PR_HUBS]["rank"]
    rest = out[out.index >= _PR_HUBS]["rank"]
    assert hubs.min() > rest.max()
    n, scale = len(out), 1_000_000
    assert out["rank"].sum() <= n * scale
    assert out["rank"].sum() > 0.9 * n * scale


def test_pages_delta_matches_oracle(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (pages_delta,
                                                        pages_delta_sql)
    assert compare("pages_delta", pages_delta(SF_SMOKE), pages_delta_sql(),
                   SF_SMOKE) == []


def test_pages_delta_statuses_cover_all_classes(ray_session):
    """Every lifecycle class is populated, text-invariant kinds report
    unchanged even when 'edited', and counts reconcile with the planted
    predicates."""
    from pdf_extraction_ray.pipelines.analytics import (
        _DELTA_ADD_OFFSET, _DELTA_TEXT_INVARIANT_SUBS, pages_delta)
    out = pages_delta(SF_SMOKE).to_pandas()
    by = out.groupby("status").size()
    assert set(by.index) == {"added", "removed", "changed", "unchanged"}
    added = out[out.status == "added"]
    assert (added.doc_id >= _DELTA_ADD_OFFSET).all()
    # an 'edited' empty-body/garbage/empty doc has text-independent
    # payload AND fallback -> hashes identical -> unchanged
    # (exclude added rows: an added id can satisfy the same residues)
    inv = out[(out.doc_id < _DELTA_ADD_OFFSET)
              & (out.doc_id % 7 == 2) & (out.doc_id % 5 != 1)
              & (out.doc_id % 100).isin(_DELTA_TEXT_INVARIANT_SUBS)]
    assert len(inv) > 0 and (inv.status == "unchanged").all()


def test_url_blocklist_filter_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        url_blocklist_filter, url_blocklist_filter_sql)
    assert compare("url_blocklist_filter", url_blocklist_filter(SF_SMOKE),
                   url_blocklist_filter_sql(), SF_SMOKE) == []


def test_url_blocklist_filter_rules_and_reasons(ray_session):
    """First-failing-rule semantics: blocked sections win over score,
    keep == (reason == 'pass'), every planted outcome is populated, and
    the score decomposes as the documented badword sum."""
    from pdf_extraction_ray.pipelines.analytics import (URL_BLOCK_SECTIONS,
                                                        url_blocklist_filter)
    out = url_blocklist_filter(SF_SMOKE).to_pandas()
    assert set(out.reason) == {"pass", "blocked_section", "badword_score"}
    assert (out.keep == (out.reason == "pass")).all()
    blocked = out[out.section.isin(URL_BLOCK_SECTIONS)]
    assert len(blocked) > 0 and (blocked.reason == "blocked_section").all()
    # blocked_section wins even when the score alone would also reject
    hot = blocked[blocked.score >= 2]
    assert len(hot) > 0 and (hot.reason == "blocked_section").all()
    free = out[~out.section.isin(URL_BLOCK_SECTIONS)]
    assert (free.reason == np.where(free.score >= 2, "badword_score",
                                    "pass")).all()
    # score decomposition: -memo=2, -qp=1, zero-run '00000' (ids<100)=1
    expect = (2 * free.url.str.contains("-memo")
              + free.url.str.contains("-qp")
              + free.url.str.contains("00000"))
    assert (free.score == expect).all()
    # both keep outcomes exist among '-qp' urls (the summation case)
    qp = free[free.url.str.endswith("-qp")]
    assert set(qp.keep) == {True, False}


# ---------------------------------------------------------------------------
# robots.txt gate (RFC 9309 subset)


def test_robots_parser_semantics():
    """Handwritten-fixture coverage of the RFC 9309 subset: group
    selection, longest-match precedence, allow-wins-tie, wildcards,
    $-anchors, empty Disallow, case-insensitive directives/agents,
    unknown directives, comments, default allow."""
    import numpy as np

    from pdf_extraction_ray.functions.robots import (evaluate_paths,
                                                     parse_robots_txt,
                                                     rules_for_agent)

    text = "\n".join([
        "# comment only line",
        "Sitemap: https://x/sitemap.xml",
        "User-agent: otherbot",
        "Disallow: /",
        "",
        "USER-AGENT: *",
        "disallow:",                 # empty value: no-op
        "Disallow: /private/",
        "Crawl-delay: 3",            # unknown directive: skipped
        "",
        "User-agent: GraftBot  # agent tokens are case-insensitive",
        "User-agent: elsebot",       # multi-agent group header
        "Allow: /private/ok",
        "Disallow: /private/",
        "Disallow: /*.zip$",
        "Allow: /a",
        "Disallow: /a$",
    ])
    parsed = parse_robots_txt(text)

    # exact-agent group overrides * entirely; otherbot's Disallow: /
    # never applies to graftbot
    rules = rules_for_agent(parsed, "graftbot")
    pats = [r.text for r in rules]
    assert "Disallow: /" not in pats
    paths = np.array(["/private/ok/file", "/private/no", "/pkg/x.zip",
                      "/a", "/ab", "/other"], dtype=object)
    allowed, rule = evaluate_paths(rules, paths)
    # longest match: Allow /private/ok (11) beats Disallow /private/ (9)
    assert allowed[0] and rule[0] == "Allow: /private/ok"
    assert not allowed[1] and rule[1] == "Disallow: /private/"
    # wildcard + $ anchor
    assert not allowed[2] and rule[2] == "Disallow: /*.zip$"
    # tie (len 2): Allow /a vs Disallow /a$ both match '/a' at len 2..3;
    # '/a$' (3) is longer for the exact path -> disallowed; '/ab' only
    # matches Allow /a -> allowed
    assert not allowed[3] and rule[3] == "Disallow: /a$"
    assert allowed[4] and rule[4] == "Allow: /a"
    # no matching rule: default allow with empty rule text
    assert allowed[5] and rule[5] == ""

    # elsebot shares the group (multi-agent header)
    assert [r.text for r in rules_for_agent(parsed, "ELSEBOT")] == pats
    # unknown agent falls back to the * group (empty Disallow dropped)
    star = rules_for_agent(parsed, "strangerbot")
    assert [r.text for r in star] == ["Disallow: /private/"]
    # allow-wins-tie at EQUAL length
    tie = rules_for_agent(parse_robots_txt(
        "User-agent: *\nAllow: /x\nDisallow: /y"), "any")
    a, r = evaluate_paths(tie, np.array(["/x", "/y"], dtype=object))
    assert a[0] and not a[1]
    tie2 = rules_for_agent(parse_robots_txt(
        "User-agent: *\nDisallow: /ab\nAllow: /ab"), "any")
    a2, r2 = evaluate_paths(tie2, np.array(["/abc"], dtype=object))
    assert a2[0] and r2[0] == "Allow: /ab"


def test_robots_gate_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (robots_gate,
                                                        robots_gate_sql)
    assert compare("robots_gate", robots_gate(SF_SMOKE),
                   robots_gate_sql(), SF_SMOKE) == []


def test_robots_gate_planted_branches(ray_session):
    """Every planted rule branch fires at sf0.001: whole-host block,
    -memo ban, -qp ban, the longer 77-qp allow override, the id-range
    disallow, and default allow — and group selection means a section
    WITH a graftbot group never applies the * group's rules."""
    from pdf_extraction_ray.pipelines.analytics import (_robots_seed,
                                                        robots_gate)
    out = robots_gate(SF_SMOKE).to_pandas()
    assert set(out.rule) == {"", "Disallow: /", "Disallow: /*-memo$",
                             "Disallow: /*-qp$", "Allow: /*77-qp$",
                             "Disallow: /*/d00003"}
    assert (out.allowed == out.rule.str.startswith(("Allow", ""))
            & ~out.rule.str.startswith("Disallow")).all()
    seeds = out.section.map(_robots_seed)
    # whole-host sections: every url blocked by 'Disallow: /'
    whole = out[seeds % 4 == 0]
    assert len(whole) and (whole.rule == "Disallow: /").all()
    # odd-seed sections carry a graftbot group: the * group's rules
    # (including 'Disallow: /') never appear there
    odd = out[seeds % 2 == 1]
    assert len(odd) and not odd.rule.isin(
        ["Disallow: /", "Disallow: /*-memo$"]).any()
    # precedence: allow-override fires only for ids ending 77
    over = out[out.rule == "Allow: /*77-qp$"]
    assert len(over) and (over.doc_id % 100 == 77).all() and over.allowed.all()
    # id-range rule: exactly ids with doc_id//100 == 3 in s&4 odd sections
    rng = out[out.rule == "Disallow: /*/d00003"]
    assert len(rng) and (rng.doc_id // 100 == 3).all() and (~rng.allowed).all()


def test_robots_tag_urls_consistent_with_gate(ray_session):
    """The generic url-table tagger (section parsed from the url string)
    agrees with robots_gate's (doc_id, source)-derived decisions row for
    row, and a sectionless/foreign url default-allows."""
    import ray.data as rd

    from pdf_extraction_ray.pipelines.analytics import (robots_gate,
                                                        robots_tag_urls)
    gate = robots_gate(SF_SMOKE).to_pandas()
    urls = rd.from_pandas(gate[["url"]])
    tagged = (robots_tag_urls(urls).to_pandas()
              .sort_values("url").reset_index(drop=True))
    gate = gate.sort_values("url").reset_index(drop=True)
    assert (tagged.url == gate.url).all()
    assert (tagged.allowed == gate.allowed).all()
    assert (tagged.rule == gate.rule).all()
    foreign = robots_tag_urls(rd.from_items(
        [{"url": "https://other.example/nosection"},
         {"url": "not a url at all"}])).to_pandas()
    assert foreign.allowed.all() and (foreign.rule == "").all()


# ---------------------------------------------------------------------------
# budgeted training-mix selection


def test_token_budget_select_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        token_budget_select, token_budget_select_sql)
    assert compare("token_budget_select", token_budget_select(SF_SMOKE),
                   token_budget_select_sql(), SF_SMOKE) == []


def test_token_budget_select_invariants(ray_session):
    """The selection is the MAXIMAL quality-ordered prefix under the
    budget: ranks are contiguous from 0, quality is non-increasing along
    the admission order, the running sum is exact and <= budget, and
    admitting the next-best excluded doc would bust the budget."""
    from pdf_extraction_ray.pipelines.analytics import token_budget_select
    budget = 5_000
    out = (token_budget_select(SF_SMOKE, budget=budget).to_pandas()
           .sort_values("sel_rank").reset_index(drop=True))
    assert 0 < len(out) < 500
    assert list(out.sel_rank) == list(range(len(out)))
    assert (out.q.diff().dropna() <= 0).all()
    assert (out.n_tokens.cumsum() == out.cum_tokens).all()
    assert out.cum_tokens.iloc[-1] <= budget
    # maximality: re-derive the full order in pandas; the first doc NOT
    # selected would exceed the budget
    full = (token_budget_select(SF_SMOKE, budget=1 << 60).to_pandas()
            .sort_values("sel_rank").reset_index(drop=True))
    nxt = full.iloc[len(out)]
    assert out.cum_tokens.iloc[-1] + nxt.n_tokens > budget


def test_section_quota_sample_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        section_quota_sample, section_quota_sample_sql)
    assert compare("section_quota_sample", section_quota_sample(SF_SMOKE),
                   section_quota_sample_sql(), SF_SMOKE) == []


def test_section_quota_sample_invariants(ray_session):
    """At most `quota` docs per section, quality-ordered admission with
    contiguous 1-based ranks, and the kept set per section is exactly
    the top-q (ties -> lowest doc_id) of that section."""
    from pdf_extraction_ray.pipelines.analytics import (
        section_quota_sample, token_budget_select)
    quota = 5
    out = section_quota_sample(SF_SMOKE, quota=quota).to_pandas()
    per = out.groupby("section")
    assert (per.size() <= quota).all() and (per.size() == quota).any()
    for _, g in per:
        g = g.sort_values("sect_rank")
        assert list(g.sect_rank) == list(range(1, len(g) + 1))
        assert (g.q.diff().dropna() <= 0).all()
    # cross-check admission against the full quality table (unbudgeted
    # token_budget_select emits every doc's q with the same definition;
    # sections come from the documents table itself, so the non-kept
    # side is fully populated — every section has 25 docs vs quota 5)
    import os

    import pyarrow.parquet as pq
    src = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                        columns=["doc_id", "source"]).to_pandas()
    full = (token_budget_select(SF_SMOKE, budget=1 << 60).to_pandas()
            .merge(src.rename(columns={"source": "section"}), on="doc_id"))
    docs = full.set_index("doc_id")
    kept = set(out.doc_id)
    for sec, g in out.groupby("section"):
        worst_kept = docs.loc[list(g.doc_id)].q.min()
        others = [d for d in full[full.section == sec].doc_id
                  if d not in kept]
        assert len(others) > 0
        # every doc of this section NOT kept has q <= worst kept q
        assert all(docs.loc[d].q <= worst_kept for d in others)


def test_robots_tag_urls_uppercase_scheme(ray_session):
    """RFC 3986 schemes are case-insensitive: an uppercase-scheme url
    must resolve its section and be gated, not default-allow through."""
    import ray.data as rd

    from pdf_extraction_ray.pipelines.analytics import robots_tag_urls
    # src3 seed -> the * group bans -memo urls
    out = robots_tag_urls(rd.from_items([
        {"url": "HTTPS://corpus.example/src3/d0000003-memo"},
        {"url": "https://corpus.example/src3/d0000003-memo"},
    ])).to_pandas()
    assert (~out.allowed).all()
    assert (out.rule == "Disallow: /*-memo$").all()


def test_lang_temperature_sample_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        lang_temperature_sample, lang_temperature_sample_sql)
    assert compare("lang_temperature_sample", lang_temperature_sample(SF_SMOKE),
                   lang_temperature_sample_sql(), SF_SMOKE) == []


def test_lang_temperature_sample_invariants(ray_session):
    """T=2 semantics: the rarest language keeps EVERY doc (p = 1), each
    kept mask is exactly the integer inequality h^2*c < c_min*2^40 (the
    thr precompute must be equivalence-preserving, both directions),
    and over-represented languages land near c*sqrt(c_min/c) kept."""
    import os

    import pyarrow.parquet as pq

    from pdf_extraction_ray.functions.hashing import stable_hash64
    from pdf_extraction_ray.pipelines.analytics import lang_temperature_sample

    src = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                        columns=["doc_id", "lang"]).to_pandas()
    counts = src.lang.value_counts().to_dict()
    cmin = min(counts.values())
    out = lang_temperature_sample(SF_SMOKE).to_pandas()
    kept = set(out.doc_id)
    # direct-inequality recompute per doc — no isqrt/thr shortcut
    for _, r in src.iterrows():
        h = stable_hash64(f"temp:{r.doc_id}") % (1 << 20)
        expect = h * h * counts[r.lang] < cmin * (1 << 40)
        assert (r.doc_id in kept) == expect, r.doc_id
    per = out.lang.value_counts().to_dict()
    rare = min(counts, key=counts.get)
    assert per[rare] == counts[rare]
    for lg, c in counts.items():
        exp = c * (cmin / c) ** 0.5
        sd = (c * (cmin / c) ** 0.5 * (1 - (cmin / c) ** 0.5)) ** 0.5
        assert abs(per.get(lg, 0) - exp) <= max(4 * sd, 4), (lg, per.get(lg), exp)


def test_phrase_match_stats_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        phrase_match_stats, phrase_match_stats_sql)
    assert compare("phrase_match_stats", phrase_match_stats(SF_SMOKE),
                   phrase_match_stats_sql(), SF_SMOKE) == []


def test_phrase_match_stats_invariants(ray_session):
    """Every emitted row really matches: n_hits == Python str.count
    (same non-overlapping semantics), first_pos == str.find, and docs
    without the phrase are absent."""
    import os

    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import phrase_match_stats

    phrase = "batch batch"
    out = phrase_match_stats(SF_SMOKE, phrase=phrase).to_pandas()
    assert len(out) > 0
    src = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                        columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(src.doc_id, src.text))
    got = dict(zip(out.doc_id, zip(out.n_hits, out.first_pos)))
    for d, t in texts.items():
        n = t.count(phrase)
        if n == 0:
            assert d not in got
        else:
            assert got[d] == (n, t.find(phrase)), d


def test_sitemap_parser_semantics():
    """Pure-parser behavior: namespaced urlset with junk elements and a
    missing lastmod; sitemapindex child extraction; malformed XML and
    unknown roots yield empty; entries missing <loc> are skipped; a
    looping index tree terminates under the doc/depth bounds."""
    from pdf_extraction_ray.functions.sitemap import (
        parse_sitemap, resolve_sitemap_entries)

    kind, entries = parse_sitemap(
        "<?xml version='1.0'?><!-- c -->"
        "<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
        "<generator>x</generator>"
        "<url><loc> https://a/1 </loc><priority>0.5</priority></url>"
        "<url><priority>0.9</priority></url>"
        "<url><loc>https://a/2</loc><lastmod>2026-01-02</lastmod></url>"
        "</urlset>")
    assert kind == "urlset"
    assert entries == [("https://a/1", "", "0.5"),
                       ("https://a/2", "2026-01-02", "")]

    kind, locs = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap>"
        "<other/><sitemap><loc>https://a/s2.xml</loc></sitemap>"
        "</sitemapindex>")
    assert (kind, locs) == ("index", ["https://a/s1.xml", "https://a/s2.xml"])

    assert parse_sitemap("<urlset><url><loc>x</loc>") == ("urlset", [])
    assert parse_sitemap("<rss><item/></rss>") == ("urlset", [])

    # self-referential index: bounded, returns nothing, terminates
    loop = ("<sitemapindex><sitemap><loc>https://a/s.xml</loc></sitemap>"
            "<sitemap><loc>https://a/t.xml</loc></sitemap></sitemapindex>")
    out = resolve_sitemap_entries(lambda loc: loop, "https://a/s.xml",
                                  max_depth=2, max_docs=10)
    assert out == []


def test_sitemap_urls_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        sitemap_urls, sitemap_urls_sql)
    assert compare("sitemap_urls", sitemap_urls(SF_SMOKE),
                   sitemap_urls_sql(), SF_SMOKE) == []


def test_sitemap_urls_structure_and_membership(ray_session):
    """The index/urlset structural branch is transparent (an indexed
    section resolves to the same entries as its flat form), at least
    one section exercises EACH branch, and in_corpus flags are exactly
    'this url was crawled': doc exists, same section, unsuffixed id."""
    import os

    import pyarrow.parquet as pq

    from pdf_extraction_ray.functions.sitemap import resolve_sitemap_entries
    from pdf_extraction_ray.pipelines.analytics import (
        _robots_seed, sitemap_urls, synth_sitemap_xml)

    src = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                        columns=["doc_id", "source"]).to_pandas()
    sections = sorted(src.source.unique())
    seeds = {s: _robots_seed(s) for s in sections}
    assert any(v % 3 == 0 for v in seeds.values())
    assert any(v % 3 != 0 for v in seeds.values())

    def fetch(loc):
        tail = loc.rsplit("/", 2)
        name = tail[-1]
        part = (int(name[len("sitemap-"):-len(".xml")])
                if name.startswith("sitemap-") else None)
        return synth_sitemap_xml(tail[-2], part)

    for sec in sections:
        via_tree = sorted(resolve_sitemap_entries(
            fetch, f"https://corpus.example/{sec}/sitemap.xml"))
        # flat form: force the urlset branch by asking for both parts
        # when indexed, else part=None
        if seeds[sec] % 3 == 0:
            flat = sorted({e for p in (0, 1) for e in
                           __import__("pdf_extraction_ray.functions.sitemap",
                                      fromlist=["parse_sitemap"])
                           .parse_sitemap(synth_sitemap_xml(sec, p))[1]})
        else:
            flat = via_tree
        assert via_tree == flat, sec

    out = sitemap_urls(SF_SMOKE).to_pandas()
    by_id_src = dict(zip(src.doc_id, src.source))
    n_true = 0
    for _, r in out.iterrows():
        j = int(r.url.rsplit("/d", 1)[1])
        expect = (by_id_src.get(j) == r.section) and j % 10 not in (3, 7)
        assert bool(r.in_corpus) == expect, (r.section, r.url)
        n_true += expect
    assert n_true > 0 and n_true < len(out)
