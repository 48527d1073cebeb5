"""Run-completion notification sink (reference parity for SURVEY.md S10,
``app/services/webhook_sender.py:38-163``), re-expressed without a
network per SURVEY §7.6: the DATA semantics — HMAC-SHA256-signed
payload, SSRF target guard, bounded retries with a dead-letter path —
are kept; the HTTPS POST transport becomes a pluggable ``deliver``
callable whose default writes the signed envelope to an atomic on-disk
outbox (what a relay process would drain).

Scale note: notifications are per-RUN (one envelope per pipeline run /
batch, reference ``routers/extraction.py:363-400``), so this is driver-
side by design — O(1) per run, never per document.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Callable
from urllib.parse import urlparse

from ..functions.hashing import sha256_hex
from ..functions.netsec import classify_ip, hmac_sha256_hex

_BLOCKED_HOSTS = {"localhost", "localhost.localdomain", "0.0.0.0"}


def validate_target(url: str) -> str | None:
    """SSRF guard (reference webhook_sender.py:23-90): HTTPS only, no
    userinfo tricks, and IP-literal hosts must classify as public.
    Returns None when the target is acceptable, else the reason."""
    try:
        parts = urlparse(url)
    except ValueError:
        return "unparseable_url"
    if parts.scheme != "https":
        return "scheme_not_https"
    host = (parts.hostname or "").lower()
    if not host:
        return "missing_host"
    if host in _BLOCKED_HOSTS or host.endswith(".local"):
        return "blocked_host"
    cls = classify_ip(host)
    # non-IP hostnames classify as 'invalid' — acceptable here (no DNS
    # in this environment); IP literals must be public
    if cls not in ("public", "invalid"):
        return f"non_public_ip:{cls}"
    return None


def sign_payload(payload: dict[str, Any], signature_key: str) -> str:
    """Canonical-JSON HMAC-SHA256 signature (reference
    webhook_sender.py:102-106; canonicalized so both sides serialize
    identically)."""
    canon = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    return hmac_sha256_hex(signature_key, canon)


def notify_outbox(outbox_dir: str, target_url: str,
                  payload: dict[str, Any], signature_key: str,
                  max_retries: int = 3,
                  deliver: Callable[[dict[str, Any]], None] | None = None,
                  ) -> dict[str, Any]:
    """Deliver one signed run-completion notification.

    The envelope carries (target, payload, signature, attempts).
    ``deliver`` is the transport hook — called up to ``max_retries``
    times (reference retry cap, webhook_sender.py:38); when omitted,
    delivery = an atomic write into ``outbox_dir``. A target failing
    the SSRF guard is rejected WITHOUT any delivery attempt (status
    'rejected'); exhausted retries land the envelope in
    ``outbox_dir/_dead_letter/`` (status 'dead_letter') so no
    notification is ever silently lost. Returns the final envelope.
    """
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1")
    os.makedirs(outbox_dir, exist_ok=True)
    envelope: dict[str, Any] = {
        "target_url": target_url,
        "payload": payload,
        "signature": sign_payload(payload, signature_key),
        "attempts": 0,
        "status": "pending",
    }
    reason = validate_target(target_url)
    if reason is not None:
        envelope["status"] = "rejected"
        envelope["error"] = reason
        _atomic_write(os.path.join(outbox_dir, "_rejected"), envelope)
        return envelope

    if deliver is None:
        deliver = lambda env: _atomic_write(outbox_dir, env)  # noqa: E731

    last_err = ""
    for attempt in range(1, max_retries + 1):
        # the transport receives the final success-state record, so the
        # default outbox write lands 'delivered' on disk; a raise means
        # the record never left, and we retry
        candidate = {**envelope, "attempts": attempt, "status": "delivered"}
        try:
            deliver(candidate)
            return candidate
        except Exception as e:  # transport errors are data, not crashes
            last_err = f"{type(e).__name__}: {e}"
    envelope["attempts"] = max_retries
    envelope["status"] = "dead_letter"
    envelope["error"] = last_err
    _atomic_write(os.path.join(outbox_dir, "_dead_letter"), envelope)
    return envelope


def _atomic_write(dir_path: str, envelope: dict[str, Any]) -> None:
    """Write-temp-then-rename (the checkpoint manifests' durability
    rule); filename is content-addressed so redelivery is idempotent."""
    os.makedirs(dir_path, exist_ok=True)
    body = json.dumps(envelope, sort_keys=True, indent=1)
    name = sha256_hex(envelope["signature"] +
                      envelope["target_url"])[:16] + ".json"
    fd, tmp = tempfile.mkstemp(dir=dir_path, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(body)
        os.replace(tmp, os.path.join(dir_path, name))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
