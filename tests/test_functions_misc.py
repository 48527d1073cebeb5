"""Unit tests: quality scoring, routing, classification, slug/sanitize,
hashing, text analytics (reference analogs: tests for
opendataloader_extractor quality cases, document_classifier, file
validator sanitize)."""

import pytest

from pdf_extraction_ray.functions.classify import classify
from pdf_extraction_ray.functions.hashing import (
    hamming64, jaccard, minhash_bands, minhash_signature, rolling_fingerprint,
    sha256_hex, shingles, simhash64, stable_hash64, url_bucket)
from pdf_extraction_ray.functions.quality import quality_score_pct, route_for
from pdf_extraction_ray.functions.slug import canonical_name, sanitize_filename, slugify
from pdf_extraction_ray.functions.textstats import detect_lang, text_quality, token_count


# --- quality (reference: opendataloader_extractor.py:18-80) -----------------

@pytest.mark.parametrize("tl,ec,hc,tables,want", [
    (0, 0, 0, [], 0),
    (101, 0, 0, [], 20),
    (501, 0, 0, [], 30),
    (1001, 0, 0, [], 40),
    (0, 6, 0, [], 10),
    (0, 21, 0, [], 20),
    (0, 51, 0, [], 30),
    (0, 0, 1, [], 5),
    (0, 0, 3, [], 10),
    (0, 0, 5, [], 15),
    (0, 0, 0, [2], 10),     # some tables, none valid
    (0, 0, 0, [4], 15),     # a valid table (>3 rows)
    (1001, 51, 5, [4], 100),
])
def test_quality_cases(tl, ec, hc, tables, want):
    assert quality_score_pct(tl, ec, hc, tables) == want


def test_route_threshold():
    assert route_for(69) == "salvage"
    assert route_for(70) == "primary"


# --- classifier (reference: document_classifier.py) -------------------------

def test_classify_filename_memo():
    assert classify("https://x/papers/math-memo.pdf", "") == ("memo", 90, "filename")


def test_classify_filename_qp():
    assert classify("https://x/2017-QP-final", "") == ("question_paper", 90, "filename")


def test_classify_filename_ambiguous_falls_through():
    kind, conf, method = classify("https://x/memo-and-qp", "")
    assert method != "filename"


def test_classify_content_phrases():
    text = "MARKING GUIDELINE\nnotes to markers: award marks"
    assert classify("https://x/doc", text) == ("memo", 80, "content_keywords")


def test_classify_content_confidence_cap():
    text = " ".join(["marking guideline memorandum notes to markers model answer "
                     "mark allocation marks will be awarded"])
    assert classify("https://x/doc", text)[1] == 95


def test_classify_default():
    assert classify("https://x/doc", "nothing informative") == (
        "question_paper", 50, "default")


def test_classify_scan_window_3000():
    text = "x" * 3001 + "marking guideline"
    assert classify("https://x/doc", text)[2] == "default"


# --- slug / sanitize (reference: extraction.py:146-151, file_validator) -----

def test_slugify():
    assert slugify("Business Studies P1") == "business-studies-p1"
    assert slugify("May/June") == "may-june"
    assert slugify("--x--") == "x"


def test_canonical_name():
    assert canonical_name("abc123", "Math P1", "12", "May/June", 2017) == \
        "abc123-math-p1-gr12-may-june-2017-qp"


def test_sanitize_traversal():
    # basename first (as the reference does), then traversal chars removed
    assert sanitize_filename("../../etc/passwd") == "passwd.pdf"
    assert sanitize_filename("..\\..\\x.pdf") == "x.pdf"


def test_sanitize_reserved():
    assert sanitize_filename("CON.pdf") == "upload.pdf"


def test_sanitize_empty():
    assert sanitize_filename("") == "upload.pdf"


def test_sanitize_length():
    assert len(sanitize_filename("a" * 400 + ".pdf")) <= 255


# --- hashing ----------------------------------------------------------------

def test_sha256_matches_reference_identity():
    import hashlib
    assert sha256_hex(b"abc") == hashlib.sha256(b"abc").hexdigest()


def test_stable_hash_deterministic():
    assert stable_hash64("x") == stable_hash64("x")
    assert stable_hash64("x") != stable_hash64("y")


def test_url_bucket_range():
    assert all(0 <= url_bucket(f"u{i}", 64) < 64 for i in range(100))


def test_minhash_similarity_estimate():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5
    sa, sb = shingles(a), shingles(b)
    true_j = jaccard(sa, sb)
    est = float((minhash_signature(sa, 128) == minhash_signature(sb, 128)).mean())
    assert abs(est - true_j) < 0.2


def test_minhash_bands_collide_for_identical():
    s = shingles("identical document text here")
    assert minhash_bands(minhash_signature(s)) == minhash_bands(minhash_signature(s))


def test_simhash_near_dup():
    a = "word " * 50 + "alpha beta gamma delta"
    b = "word " * 50 + "alpha beta gamma epsilon"
    assert hamming64(simhash64(a), simhash64(b)) <= 12
    c = "completely different vocabulary everywhere now"
    assert hamming64(simhash64(a), simhash64(c)) > 12


def test_rolling_fingerprint_shift_invariant_content():
    fp1 = set(rolling_fingerprint("PREFIX " + "shared body of text " * 10))
    fp2 = set(rolling_fingerprint("OTHER " + "shared body of text " * 10))
    assert len(fp1 & fp2) > 0


# --- textstats --------------------------------------------------------------

def test_token_count():
    assert token_count("hello world_9, twice") == 3


def test_text_quality_ratios():
    q = text_quality("Hello, world!")
    assert q["n_tokens"] == 2
    assert q["punct_ratio"] > 0
    assert q["n_chars"] == 13


def test_detect_lang():
    assert detect_lang("the cat is on the mat and it is happy") == "en"
    assert detect_lang("le chat est dans la maison et il est content") == "fr"
    assert detect_lang("el gato es bonito y la casa es grande") == "es"
    assert detect_lang("der hund und die katze sind im haus") == "de"
    assert detect_lang("这是一个中文句子，没有任何英文单词。") == "zh"
    assert detect_lang("") == "und"


def test_classify_ip_ssrf_blocklist():
    from pdf_extraction_ray.functions.netsec import (classify_ip,
                                                     is_public_destination)
    assert classify_ip("127.0.0.1") == "loopback"
    assert classify_ip("::1") == "loopback"
    assert classify_ip("10.1.2.3") == "private"
    assert classify_ip("192.168.0.9") == "private"
    assert classify_ip("172.16.5.5") == "private"
    assert classify_ip("169.254.169.254") == "link_local"  # metadata svc
    assert classify_ip("224.0.0.1") == "multicast"
    assert classify_ip("0.0.0.0") == "reserved"
    assert classify_ip("not-an-ip") == "invalid"
    assert classify_ip("8.8.8.8") == "public"
    assert is_public_destination("8.8.8.8")
    assert not is_public_destination("169.254.169.254")


def test_client_ip_from_xff_trust_walk():
    from pdf_extraction_ray.functions.netsec import client_ip_from_xff
    proxies = {"10.0.0.1", "10.0.0.2"}
    # untrusted peer: header ignored entirely
    assert client_ip_from_xff("1.2.3.4", "9.9.9.9", proxies) == "9.9.9.9"
    # trusted chain resolves to the rightmost untrusted hop
    assert client_ip_from_xff("1.2.3.4, 10.0.0.2", "10.0.0.1",
                              proxies) == "1.2.3.4"
    # spoofed extra hops to the left of the real client are not reached
    assert client_ip_from_xff("6.6.6.6, 1.2.3.4, 10.0.0.2", "10.0.0.1",
                              proxies) == "1.2.3.4"
    # malformed hop stops the walk at the last good address
    assert client_ip_from_xff("garbage, 10.0.0.2", "10.0.0.1",
                              proxies) == "10.0.0.2"
    # no header at all
    assert client_ip_from_xff(None, "10.0.0.1", proxies) == "10.0.0.1"


def test_hmac_sha256_signature():
    import hashlib
    import hmac as _hmac

    from pdf_extraction_ray.functions.netsec import hmac_sha256_hex
    want = _hmac.new(b"k", b"payload", hashlib.sha256).hexdigest()
    assert hmac_sha256_hex("k", "payload") == want
    assert hmac_sha256_hex(b"k", b"payload") == want
    assert hmac_sha256_hex("k2", "payload") != want


# ---------------------------------------------------------------------------
# notification outbox (SURVEY S10 re-expression)
# ---------------------------------------------------------------------------


def test_notify_outbox_delivers_signed_envelope(tmp_path):
    import hashlib
    import hmac as hmac_mod
    import json
    import os

    from pdf_extraction_ray.state.notify import notify_outbox

    payload = {"run_id": "r1", "n_docs": 500, "status": "completed"}
    env = notify_outbox(str(tmp_path), "https://example.com/hook",
                        payload, signature_key="s3cret")
    assert env["status"] == "delivered"
    assert env["attempts"] == 1
    files = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert len(files) == 1
    disk = json.loads((tmp_path / files[0]).read_text())
    canon = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    want = hmac_mod.new(b"s3cret", canon.encode(),
                        hashlib.sha256).hexdigest()
    assert disk["signature"] == want
    # idempotent redelivery: same envelope -> same content-addressed file
    notify_outbox(str(tmp_path), "https://example.com/hook",
                  payload, signature_key="s3cret")
    assert len([f for f in os.listdir(tmp_path)
                if f.endswith(".json")]) == 1


def test_notify_outbox_ssrf_guard(tmp_path):
    from pdf_extraction_ray.state.notify import notify_outbox, validate_target

    assert validate_target("https://example.com/x") is None
    bad = {
        "http://example.com/x": "scheme_not_https",
        "https://127.0.0.1/x": "non_public_ip:loopback",
        "https://10.0.0.8/x": "non_public_ip:private",
        "https://169.254.1.1/x": "non_public_ip:link_local",
        "https://localhost/x": "blocked_host",
        "ftp://example.com/x": "scheme_not_https",
    }
    for url, reason in bad.items():
        env = notify_outbox(str(tmp_path), url, {"a": 1}, "k")
        assert env["status"] == "rejected", url
        assert env["error"] == reason, url


def test_notify_outbox_retries_then_dead_letter(tmp_path):
    import os

    from pdf_extraction_ray.state.notify import notify_outbox

    calls = {"n": 0}

    def flaky(env):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")

    env = notify_outbox(str(tmp_path), "https://example.com/x",
                        {"a": 1}, "k", max_retries=3, deliver=flaky)
    assert env["status"] == "delivered" and env["attempts"] == 3

    def always_down(env):
        raise ConnectionError("refused")

    env = notify_outbox(str(tmp_path), "https://example.com/x",
                        {"a": 2}, "k", max_retries=3, deliver=always_down)
    assert env["status"] == "dead_letter" and env["attempts"] == 3
    assert "refused" in env["error"]
    dl = os.listdir(tmp_path / "_dead_letter")
    assert len(dl) == 1
