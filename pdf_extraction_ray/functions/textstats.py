"""Text analytics scalar functions: language ID, quality ratios, token
counts.

Beyond-the-reference operators for a training-data pipeline (the reference's
only text statistic is the markdown length feeding its quality score,
app/services/opendataloader_extractor.py:45-53). All deterministic; the
token counter's regex is chosen so the DuckDB oracle can reproduce it with
``regexp_extract_all`` exactly.
"""

from __future__ import annotations

import re

# [A-Za-z0-9_]+ over ASCII: identical semantics in Python re and RE2/DuckDB
TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_PUNCT = set(".,;:!?\"'()[]{}<>-—…")

# tiny per-language stopword profiles (top function words; public knowledge)
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as are was".split()),
    "fr": frozenset("le la les de des et un une du en est que pour dans au".split()),
    "es": frozenset("el la los las de y un una del en es que por con para".split()),
    "de": frozenset("der die das und von zu den ein eine im mit ist des auf".split()),
    "zh": frozenset(),  # han-script detection below, not stopwords
}


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def token_estimate(text: str) -> int:
    """Cheap LLM-token estimate: chars // 4 (reference:
    _estimate_token_count, app/services/pdf_extractor.py:146-159)."""
    return len(text) // 4


def text_quality(text: str) -> dict[str, float]:
    """Length / punctuation / stopword / uppercase ratios — the standard
    web-text quality heuristics (C4/Gopher-style filters)."""
    n = len(text)
    if n == 0:
        return {"n_chars": 0, "n_tokens": 0, "punct_ratio": 0.0,
                "stopword_ratio": 0.0, "upper_ratio": 0.0, "mean_word_len": 0.0}
    toks = TOKEN_RE.findall(text)
    lower = [t.lower() for t in toks]
    en_stop = LANG_PROFILES["en"]
    n_stop = sum(1 for t in lower if t in en_stop)
    n_punct = sum(1 for c in text if c in _PUNCT)
    n_upper = sum(1 for c in text if c.isupper())
    return {
        "n_chars": n,
        "n_tokens": len(toks),
        "punct_ratio": n_punct / n,
        "stopword_ratio": n_stop / len(toks) if toks else 0.0,
        "upper_ratio": n_upper / n,
        "mean_word_len": sum(len(t) for t in toks) / len(toks) if toks else 0.0,
    }


def detect_lang(text: str) -> str:
    """Heuristic language ID: han-script share, then stopword-profile vote.

    Returns one of {en, fr, es, de, zh, und}.
    """
    if not text:
        return "und"
    sample = text[:2000]
    han = sum(1 for c in sample if "一" <= c <= "鿿")
    if han * 20 > len(sample):
        return "zh"
    toks = [t.lower() for t in TOKEN_RE.findall(sample)]
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in ("en", "fr", "es", "de"):  # fixed order = deterministic ties
        prof = LANG_PROFILES[lang]
        hits = sum(1 for t in toks if t in prof)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"
