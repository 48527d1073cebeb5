"""Error classification for semantic retries.

Re-expresses the reference's status-code-aware retry policy
(reference: app/utils/retry.py:21-39 — retry 429/500/503/network errors,
never 400/401/403/404/422 or quota errors) for a local engine: transient
environment failures are worth re-running; deterministic parse failures
are not (the same bytes will fail the same way) and go straight to
quarantine review.
"""

from __future__ import annotations

# deterministic failures: same input -> same failure; retrying wastes work
_PERMANENT = (ValueError, TypeError, KeyError, IndexError,
              UnicodeError, ZeroDivisionError, AssertionError,
              RecursionError, AttributeError)

# transient environment failures: worth another attempt
_TRANSIENT = (OSError, MemoryError, TimeoutError, InterruptedError)


class DocumentTimeout(Exception):
    """Raised by extractors when a cooperative parse deadline expires.
    Classified transient: a retry may land on a less loaded worker."""


def is_retryable(exc: BaseException) -> bool:
    if isinstance(exc, DocumentTimeout):
        return True
    if isinstance(exc, _TRANSIENT):
        return True
    if isinstance(exc, _PERMANENT):
        return False
    return True  # unknown errors default to retryable (reference: network
    # strings are retried; the attempts cap bounds the waste)


def error_label(exc: BaseException) -> str:
    """Stable error string for output rows: class name + message, prefixed
    with the retry class so `run_retry` can filter without a lookup."""
    kind = "transient" if is_retryable(exc) else "permanent"
    return f"{kind}:{type(exc).__name__}: {exc}"
