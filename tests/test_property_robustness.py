"""Property-based robustness tests (hypothesis): the extractors must never
crash on arbitrary bytes, and generator→extractor round-trips must hold
for arbitrary content — the impossible-to-enumerate edge cases behind the
byte-identity gate."""

from hypothesis import given, settings, strategies as st

from pdf_extraction_ray.functions import pdf_extract, sniff
from pdf_extraction_ray.functions.html_extract import extract_html
from pdf_extraction_ray.sources.gen_pdf import build_pdf

SAFE_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_sniff_never_crashes(payload):
    ct = sniff.sniff_content_type(payload)
    assert ct in ("pdf", "html", "text", "empty", "unknown")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_html_extract_never_crashes_on_garbage(payload):
    r = extract_html(payload)
    assert isinstance(r.text, str)
    for s in r.spans:
        assert 0 <= s.start <= s.end <= len(r.text)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_pdf_extract_never_crashes_on_garbage(payload):
    r = pdf_extract.extract_pdf(b"%PDF-1.4\n" + payload)
    assert isinstance(r.text, str)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(
    blacklist_categories=("Cs",), blacklist_characters="\n\r\f"),
    max_size=80), min_size=1, max_size=30))
def test_pdf_roundtrip_arbitrary_lines(lines):
    """Any newline-free line set round-trips through build_pdf/extract."""
    pdf = build_pdf(lines, lines_per_page=7)
    r = pdf_extract.extract_pdf(pdf)
    assert r.text == "\n".join(lines)


@settings(max_examples=100, deadline=None)
@given(SAFE_TEXT)
def test_html_paragraph_roundtrip(content):
    """Escaped content inside an article paragraph extracts verbatim
    (whitespace-only content is dropped as formatting noise by design)."""
    import html as html_mod
    page = f"<html><body><article><p>{html_mod.escape(content)}</p></article></body></html>"
    r = extract_html(page.encode())
    if content and not content.strip():
        assert r.text == ""
    else:
        assert r.text == content


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**9), SAFE_TEXT)
def test_spec_expected_functions_total(doc_id, text):
    """The corpus spec's ground-truth functions are total over any input."""
    from pdf_extraction_ray.sources import spec
    k = spec.kind_of(doc_id)
    assert isinstance(k, str)
    t = spec.expected_final_text(doc_id, text, "srcX")
    assert isinstance(t, str)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_media_decoders_never_crash(payload):
    from pdf_extraction_ray.stages.multimodal import (ahash64,
                                                      decode_bmp_header,
                                                      decode_png)
    png = decode_png(payload)
    assert png is None or png["width"] >= 0
    bmp = decode_bmp_header(payload)
    assert bmp is None or "width" in bmp
    h = ahash64(payload)
    assert h is None or 0 <= h < 2 ** 64


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_png_decoder_survives_corrupt_png_frames(payload):
    """PNG-magic payloads with arbitrary chunk bytes must decode or
    return None, never raise."""
    from pdf_extraction_ray.stages.multimodal import decode_png
    assert decode_png(b"\x89PNG\r\n\x1a\n" + payload) is None or True


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_compressed_pdf_paths_never_crash(payload):
    """The ObjStm/Flate machinery on arbitrary bytes: lenient, no raise."""
    framed = (b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /N 3 /First 9 "
              b"/Filter /FlateDecode /Length " + str(len(payload)).encode()
              + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n")
    r = pdf_extract.extract_pdf(framed)
    assert isinstance(r.text, str)
    assert pdf_extract.page_count(framed) >= 1


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5_000_000),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=8))
def test_plan_groups_properties(sizes, target_mb):
    """Compaction planning: permutation-invariant, lossless, and every
    multi-file group stays under target once it has >= 2 members (the
    greedy invariant: a file only joins a group it fits into)."""
    from unittest.mock import patch

    from pdf_extraction_ray.state.compact import plan_groups

    paths = [f"/fake/f{i:03d}.parquet" for i in range(len(sizes))]
    size_of = dict(zip(paths, sizes))
    with patch("pdf_extraction_ray.state.compact.os.path.getsize",
               side_effect=lambda p: size_of[p]):
        g1 = plan_groups(list(paths), target_mb)
        g2 = plan_groups(list(reversed(paths)), target_mb)
    assert g1 == g2
    assert [f for g in g1 for f in g] == sorted(paths)
    target = target_mb * 1_000_000
    for g in g1:
        if len(g) > 1:
            assert sum(size_of[f] for f in g) <= target


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=1, max_value=3),
                          st.integers(min_value=0, max_value=500_000)),
                min_size=1, max_size=60),
       st.integers(min_value=40, max_value=600))
def test_sessionize_salted_equivalence(events, chunk_s):
    """Property: the salted two-phase plan equals the one-group plan for
    arbitrary event sets and chunk widths (including chunks smaller than
    the gap)."""
    import pandas as pd
    import ray.data as rd

    from pdf_extraction_ray.stages.window import (sessionize,
                                                  sessionize_salted)

    base = pd.Timestamp("2024-01-01")
    rows = [{"user_id": u, "ts": base + pd.Timedelta(seconds=s)}
            for u, s in events]
    ds = rd.from_items(rows)
    kw = dict(gap_s=120, key_col="user_id", ts_col="ts")
    plain = (sessionize(ds, **kw).to_pandas()
             .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
    salted = (sessionize_salted(ds, chunk_s=chunk_s, **kw).to_pandas()
              .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=200))
def test_embedder_bucket_law_matches_duckdb(text):
    """The FNV-1a 3-gram bucket law the text_embed_dups oracle unrolls in
    SQL must match the engine byte-for-byte on arbitrary ASCII text (the
    planted-corpus oracle only exercises the corpus's character set)."""
    import duckdb
    import numpy as np

    from pdf_extraction_ray.stages.embed import HashingEmbedder

    e = HashingEmbedder(dim=8, n_buckets=64)
    counts = e._bucket_counts(text)
    h = "2166136261::UBIGINT"
    for j in range(3):
        h = (f"((xor({h}, unicode(substr(t.s, i + {j}, 1))::UBIGINT)"
             f" * 16777619) % 4294967296)")
    got = duckdb.sql(f"""
        WITH t AS (SELECT ? AS s),
        g AS (SELECT unnest(range(1, length(s) - 1)) AS i, s
              FROM t WHERE length(s) >= 3)
        SELECT ({h}) % 64 AS b, count(*) AS c
        FROM g t GROUP BY b""", params=[text]).fetchall()
    sql_counts = np.zeros(64)
    for b, c in got:
        sql_counts[int(b)] = c
    assert (counts == sql_counts).all()


def test_embedder_projection_matches_duckdb():
    """projection_matrix values must be the exact doubles the SQL oracle
    derives from sha256 (spot grid over (bucket, dim))."""
    import duckdb

    from pdf_extraction_ray.stages.embed import projection_matrix

    proj = projection_matrix(16, 4)
    rows = duckdb.sql("""
        SELECT b, d,
               ((('0x' || substr(h, 15, 2) || substr(h, 13, 2)
                       || substr(h, 11, 2) || substr(h, 9, 2)
                       || substr(h, 7, 2) || substr(h, 5, 2)
                       || substr(h, 3, 2) || substr(h, 1, 2))::UBIGINT
                 >> 11)::DOUBLE - 4503599627370496) / 4503599627370496 AS v
        FROM (SELECT b, d, sha256('proj:' || b || ':' || d) AS h
              FROM (SELECT unnest(range(16)) AS b),
                   (SELECT unnest(range(4)) AS d))""").fetchall()
    for b, d, v in rows:
        assert proj[int(b), int(d)] == v


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-8, max_value=8,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=1, max_size=24),
       st.floats(min_value=0.5, max_value=0.999))
def test_semdedup_prune_matches_bruteforce(vecs, thr):
    """The vectorized triu/argmax min-id-neighbor scan must equal the
    O(n^2) reference on arbitrary unit vectors: dup_of(j) = min id i<j
    with cosine >= thr, else j."""
    import numpy as np
    import pandas as pd

    from pdf_extraction_ray.stages.dedup import semdedup_prune_cluster

    mat = np.asarray(vecs, np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    # non-contiguous, shuffled ids to exercise the sort
    ids = np.arange(len(unit))[::-1] * 3 + 1
    g = pd.DataFrame({"vec_id": ids,
                      "cluster_id": [5] * len(unit),
                      "unit": list(unit)})
    out = (semdedup_prune_cluster(g, thr)
           .set_index("vec_id").dup_of.to_dict())
    order = np.argsort(ids)
    sids, smat = ids[order], unit[order]
    sims = smat @ smat.T
    for j in range(len(sids)):
        expect = int(sids[j])
        for i in range(j):
            if sims[i, j] >= thr:
                expect = int(sids[i])
                break
        assert out[int(sids[j])] == expect, (j, thr)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=600))
def test_gopher_reason_total_and_in_vocab(text):
    """_gopher_reason is total over arbitrary text and only ever emits
    the fixed rule vocabulary; keep implies every rule actually holds."""
    from pdf_extraction_ray.pipelines.analytics import (GOPHER_RULES,
                                                        TOKEN_RE,
                                                        _gopher_reason)
    r = _gopher_reason(text)
    assert r in set(GOPHER_RULES) | {"pass"}
    if r == "pass":
        toks = TOKEN_RE.findall(text)
        n, s = len(toks), sum(len(w) for w in toks)
        assert n >= 20 and 3 * n <= s <= 10 * n and 5 * s >= 2 * len(text)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet="abcde", min_size=2, max_size=12),
    st.integers(min_value=1, max_value=9)), min_size=1, max_size=25),
    st.integers(min_value=1, max_value=6))
def test_bpe_merge_rounds_match_symbol_list_reference(vocab, n_merges):
    """The str.replace-based merge loop must agree with an independent
    symbol-LIST implementation of BPE's greedy left-to-right
    non-overlapping merge on arbitrary vocabularies — including
    overlap-heavy runs like 'aaaa' where replace semantics are subtle."""
    from collections import Counter

    from pdf_extraction_ray.pipelines.analytics import (_BPE_SYM_BASE,
                                                        _bpe_merge_rounds)

    def ref(vocab, n_merges):
        words = [([*w], n) for w, n in vocab]
        merges = []
        for step in range(n_merges):
            c = Counter()
            for syms, n in words:
                for i in range(len(syms) - 1):
                    c[syms[i] + syms[i + 1]] += n
            if not c:
                break
            pair = min(c, key=lambda p: (-c[p], p))
            sym = chr(_BPE_SYM_BASE + step)
            merges.append((pair, sym, c[pair]))
            for syms, _ in words:
                i = 0
                while i < len(syms) - 1:
                    if syms[i] + syms[i + 1] == pair:
                        syms[i:i + 2] = [sym]   # greedy, non-overlapping
                    else:
                        i += 1
        return merges

    assert _bpe_merge_rounds(vocab, n_merges) == ref(vocab, n_merges)


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            min_size=1, max_size=60),
    st.binary(max_size=512),
    st.text(alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            max_size=200),
    st.text(alphabet="abcdefgh-", max_size=8),
)
def test_warc_record_roundtrip_fuzz(url, payload, text, lang):
    """Arbitrary (control-char-free) urls, binary payloads, and unicode
    text survive a response+conversion pair through the frame parser —
    Content-Length framing must never depend on payload bytes."""
    from datetime import datetime

    from pdf_extraction_ray.sources.readers import (_parse_warc_date,
                                                    _warc_record)
    ts = datetime(2021, 6, 7, 8, 9, 10, 123456)
    blob = (_warc_record("response", url, ts, payload, lang)
            + _warc_record("conversion", url, ts, text.encode(), lang))
    # walk with the same framing rules as read_pages_warc
    pos, rows = 0, []
    while pos < len(blob):
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in blob[pos:hdr_end].decode().split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        n = int(headers["Content-Length"])
        rows.append((headers["WARC-Type"], headers["WARC-Target-URI"],
                     _parse_warc_date(headers["WARC-Date"]),
                     blob[hdr_end + 4:hdr_end + 4 + n]))
        pos = hdr_end + 4 + n + 4
    assert [r[0] for r in rows] == ["response", "conversion"]
    assert rows[0][1] == url and rows[0][2] == ts
    assert rows[0][3] == payload
    assert rows[1][3].decode() == text
