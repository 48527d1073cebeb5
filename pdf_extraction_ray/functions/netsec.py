"""Network-ish scalar functions from the reference's library (SURVEY.md
§2.8): SSRF IP classification, trusted-proxy X-Forwarded-For parsing,
and the HMAC-SHA256 payload signature.

Reference behavior re-expressed (not ported): webhook_sender.py:23-90
blocks webhook destinations that resolve to non-public addresses;
rate_limit.py:19-53 takes the client IP from the rightmost
X-Forwarded-For hop that is not a trusted proxy; webhook_sender.py:
102-106 signs payloads with HMAC-SHA256. Here they are plain scalar
functions usable inside any ``map_batches`` stage (a sink-side filter
would apply ``is_public_destination`` before emitting rows to a push
transport — the transport itself is out of scope per SURVEY §7.6).
"""

from __future__ import annotations

import hashlib
import hmac
import ipaddress


def classify_ip(ip: str) -> str:
    """'public' | 'private' | 'loopback' | 'link_local' | 'reserved'
    | 'multicast' | 'invalid' — the SSRF block-list classification."""
    try:
        addr = ipaddress.ip_address(ip.strip())
    except ValueError:
        return "invalid"
    if addr.is_loopback:
        return "loopback"
    if addr.is_link_local:
        return "link_local"
    if addr.is_multicast:
        return "multicast"
    # before is_private: 0.0.0.0 answers is_private=True in stdlib
    if addr.is_reserved or addr.is_unspecified:
        return "reserved"
    if addr.is_private:
        return "private"
    return "public"


def is_public_destination(ip: str) -> bool:
    """True only for globally routable destinations (webhook-safe)."""
    return classify_ip(ip) == "public"


def client_ip_from_xff(xff: str | None, peer_ip: str,
                       trusted_proxies: frozenset[str] | set[str]
                       ) -> str:
    """Resolve the client IP from an X-Forwarded-For chain.

    Walk right-to-left: the first hop that is NOT a trusted proxy is the
    client. If the peer itself is untrusted the header cannot be
    believed at all and the peer IP wins; a malformed hop also stops the
    walk (never trust an unparsable spoof)."""
    if not xff or peer_ip not in trusted_proxies:
        return peer_ip
    client = peer_ip
    for hop in reversed([h.strip() for h in xff.split(",")]):
        if classify_ip(hop) == "invalid":
            break
        client = hop
        if hop not in trusted_proxies:
            break
    return client


def hmac_sha256_hex(secret: str | bytes, payload: str | bytes) -> str:
    """Webhook payload signature: hex HMAC-SHA256 of payload bytes."""
    key = secret.encode() if isinstance(secret, str) else secret
    msg = payload.encode() if isinstance(payload, str) else payload
    return hmac.new(key, msg, hashlib.sha256).hexdigest()
