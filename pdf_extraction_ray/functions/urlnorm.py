"""Crawl-frontier URL canonicalization (training-data pipeline op).

A web-scale crawl sees the same page under many spellings: host case,
tracking query params (``utm_*``), fragments, trailing slashes, and
permuted query strings. Canonicalizing BEFORE url-keyed dedup collapses
those onto one key. The rules here are deliberately simple and
closed-form so the DuckDB oracle (`__ray_entry__`/oracle.py) replicates
them string-for-string:

1. drop the ``#fragment``;
2. lowercase the scheme and host;
3. drop ``utm_*`` query params; sort the survivors lexicographically;
4. strip trailing ``/`` from the path.

Reference analog: the sanitizer/identity family (SURVEY.md M3/M4) —
the reference normalizes filenames before keying; a crawl engine
normalizes urls.
"""

from __future__ import annotations


def canonical_url(u: str) -> str:
    """Canonical form of ``u`` (scheme://host/path?sorted-params)."""
    base = u.split("#", 1)[0]
    if "?" in base:
        base, q = base.split("?", 1)
    else:
        q = ""
    parts = base.split("/")
    # parts = ['https:', '', 'HOST', 'seg', ...] for a well-formed url;
    # anything shorter passes through with only case/param cleanup
    if len(parts) >= 3:
        scheme = parts[0].lower()
        host = parts[2].lower()
        path = "/".join(parts[3:])
        path = "/" + path if parts[3:] else ""
        path = path.rstrip("/")
        base = f"{scheme}//{host}{path}"
    else:
        base = base.rstrip("/")
    params = sorted(p for p in q.split("&")
                    if p and not p.startswith("utm_"))
    return base + ("?" + "&".join(params) if params else "")
