"""robots.txt parsing + path-rule evaluation (RFC 9309 subset).

The crawl loop's access-control gate: ``url_blocklist_filter`` decides
what the OPERATOR refuses to fetch, this decides what the SITE refuses
to serve (reference analog: the upstream fetcher that produced the
corpus honored robots; re-expressed here as a first-class frontier
stage so the engine can re-verify crawlability before scheduling a
re-crawl — see ``analytics.robots_gate``).

Implemented semantics (the subset every major crawler agrees on):

* groups: one or more consecutive ``User-agent:`` lines name the
  agents a following run of ``Allow:``/``Disallow:`` rules applies to;
  a ``User-agent:`` line after rules starts a NEW group.
* group selection (RFC 9309 §2.2.1): if any group names the product
  token exactly (case-insensitive), the crawler obeys the UNION of
  those groups and IGNORES the ``*`` groups; otherwise the union of
  the ``*`` groups; otherwise everything is allowed.
* rule match (§2.2.2): a pattern is a path prefix, ``*`` matches any
  character run, a trailing ``$`` anchors the end. The applied rule is
  the MOST SPECIFIC match = longest pattern in octets; on a tie an
  Allow wins. No matching rule -> allowed.
* an empty ``Disallow:`` value is a no-op (historical allow-all).
* unknown directives (Crawl-delay, Sitemap, ...) and comments
  (``#`` to end of line) are ignored; directive names and agent
  tokens are case-insensitive; values keep their case.

Everything here is driver-free pure functions; the batch evaluator is
vectorized per RULE (one compiled-regex pass over the whole path
array per rule — rules per host are ~a dozen, paths per batch are
thousands).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class RobotsRule:
    allow: bool
    pattern: str          # raw pattern text as written in the file
    regex: "re.Pattern"   # compiled matcher (anchored at path start)

    @property
    def spec(self) -> int:
        """RFC 9309 specificity: pattern length in octets."""
        return len(self.pattern.encode("utf-8"))

    @property
    def text(self) -> str:
        return f"{'Allow' if self.allow else 'Disallow'}: {self.pattern}"


def _compile_pattern(pattern: str) -> "re.Pattern":
    """robots path pattern -> anchored regex (``*`` run, ``$`` end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(seg) for seg in body.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))


def parse_robots_txt(text: str) -> list[tuple[str, RobotsRule]]:
    """Parse a robots.txt body into ``(agent_lower, rule)`` pairs.

    A rule under a multi-agent group header appears once per agent.
    Malformed lines (no colon, unknown directives) are skipped, per
    the de-facto standard's error tolerance.
    """
    out: list[tuple[str, RobotsRule]] = []
    agents: list[str] = []
    in_header = False          # collecting consecutive User-agent lines
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_header:
                agents = []
                in_header = True
            if value:
                agents.append(value.lower())
            continue
        in_header = False
        if key not in ("allow", "disallow"):
            continue            # Crawl-delay / Sitemap / unknown
        if not value:
            continue            # empty Disallow: = allow-all no-op
        rule = RobotsRule(allow=(key == "allow"), pattern=value,
                          regex=_compile_pattern(value))
        out.extend((a, rule) for a in agents)
    return out


def rules_for_agent(parsed: list[tuple[str, RobotsRule]],
                    agent: str) -> list[RobotsRule]:
    """RFC 9309 group selection: exact-token groups if any, else ``*``."""
    agent = agent.lower()
    exact = [r for a, r in parsed if a == agent]
    if exact:
        return exact
    return [r for a, r in parsed if a == "*"]


def evaluate_paths(rules: list[RobotsRule],
                   paths: "np.ndarray") -> tuple[np.ndarray, np.ndarray]:
    """Vectorized longest-match decision over an array of paths.

    Returns ``(allowed: bool[n], rule_text: object[n])`` where
    ``rule_text`` is the winning rule's ``"Allow: <pat>"`` /
    ``"Disallow: <pat>"`` line (``''`` when no rule matched). One
    compiled-regex pass per rule; ties break allow-wins via the
    (2*spec + allow) composite key.
    """
    n = len(paths)
    allowed = np.ones(n, dtype=bool)
    rule_text = np.full(n, "", dtype=object)
    best = np.full(n, -1, dtype=np.int64)
    for rule in rules:
        match = rule.regex.match
        hit = np.fromiter((match(p) is not None for p in paths),
                          dtype=bool, count=n)
        key = 2 * rule.spec + (1 if rule.allow else 0)
        upd = hit & (key > best)
        if upd.any():
            best[upd] = key
            allowed[upd] = rule.allow
            rule_text[upd] = rule.text
    return allowed, rule_text
