"""Golden diff suite: the distributed pipeline vs the serial oracle —
byte-identical per url (the north-rule gate; FIXTURES.md F2).

Run via ``python -m pytest -x -q``.
"""

import pytest

from pdf_extraction_ray.config import PipelineConfig
from pdf_extraction_ray.sources import spec

CFG = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES, n_buckets=16,
                     extract_concurrency=(1, 2),
                     split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)


@pytest.fixture(scope="module")
def extracted(ray_session, pages_corpus):
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    return run_extraction(pages_corpus, CFG).to_pandas().set_index("url", drop=False)


@pytest.fixture(scope="module")
def expected(documents_rows):
    out = {}
    for d in documents_rows:
        u = spec.url_of(d["doc_id"], d["source"])
        out[u] = d
    return out


def test_row_count_after_dedup(extracted, expected):
    # duplicates (same url, +1h ts) must collapse to one row per url
    assert len(extracted) == len(expected)


def test_byte_identical_text_per_url(extracted, expected):
    mismatches = []
    for url, d in expected.items():
        want = spec.expected_final_text(d["doc_id"], d["text"], d["source"])
        got = extracted.loc[url, "extracted_text"]
        if got != want:
            mismatches.append(url)
    assert mismatches == []


def test_status_and_content_type(extracted, expected):
    for url, d in expected.items():
        status, error = spec.expected_status(d["doc_id"])
        assert extracted.loc[url, "status"] == status, url
        assert extracted.loc[url, "error"] == error, url
        assert extracted.loc[url, "content_type"] == \
            spec.expected_content_type(d["doc_id"]), url


def test_first_wins_timestamp(extracted, expected):
    # the surviving duplicate row carries the ORIGINAL timestamp
    for url, d in expected.items():
        if spec.is_dup(d["doc_id"]):
            assert extracted.loc[url, "warc_ts"].to_pydatetime() == \
                spec.warc_ts_of(d["doc_id"])


def test_spans_cover_text_exactly(extracted):
    for _, r in extracted.iterrows():
        text = r.extracted_text
        for s in r.spans:
            assert 0 <= s["start"] <= s["end"] <= len(text), r.url
        if r.route == "primary" and len(r.spans) > 0:
            # spans tile the text with the documented separators
            joiner = "\n\n" if r.content_type == "html" else "\n"
            parts = [text[s["start"]:s["end"]] for s in r.spans]
            assert joiner.join(parts) == text, r.url


def test_oversized_pdfs_took_shard_path(extracted, expected):
    big = [u for u, d in expected.items() if spec.kind_of(d["doc_id"]) == "pdf_big"]
    assert big, "corpus must contain oversized PDFs"
    for url in big:
        assert extracted.loc[url, "n_pages"] > CFG.split_page_threshold
        assert extracted.loc[url, "status"] == "completed"
        # reassembled spans must be page-ordered and contiguous
        pages = [s["page"] for s in extracted.loc[url, "spans"]]
        assert pages == sorted(pages)


def test_routes_match_quality(extracted):
    done = extracted[extracted.status == "completed"]
    assert ((done.quality_pct < 70) == (done.route == "salvage")).all()
    assert set(extracted.route.unique()) <= {"primary", "salvage", "none"}
