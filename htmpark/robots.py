"""robots.txt politeness gate (RFC 9309 subset) for crawl pipelines.

A training-data crawl must honor robots.txt before a page ever reaches
extraction; this module is the engine-side implementation: a stdlib
parser for the rules grammar plus the longest-match allow/disallow
decision, exposed to Spark as a tiny parsed-rules dimension broadcast
against the url stream (see queries.q_web_robots_gate).

Not derived from the reference (zadean/htmerl parses HTML only); the
grammar and precedence rules follow public RFC 9309:
* groups = one or more ``User-agent`` lines followed by rules; a group
  applies if any of its agent tokens is a case-insensitive substring of
  the product token, with ``*`` as the fallback group (§2.2.1);
* ``Allow``/``Disallow`` match by path prefix; the LONGEST matching
  prefix wins and a tie goes to ``Allow`` (§2.2.2);
* an empty ``Disallow:`` value is a no-op (allow everything);
* comments (``#``), unknown directives, and ``Crawl-delay`` are
  tolerated and ignored for the allow decision.
"""
from __future__ import annotations


def parse_robots(text: str, agent: str = "htmpark") -> list:
    """Parse robots.txt and return the ``(rule_type, path_prefix)`` list
    of the group that applies to ``agent`` (named-group match first,
    else the ``*`` group, else no rules)."""
    groups = []  # [(agent_tokens, rules)]
    cur_agents: list = []
    cur_rules: list = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_rules:  # a rule block ended: the next group starts
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if cur_agents:  # rules before any User-agent are invalid
                cur_rules.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    for agents, rules in groups:
        if any(a != "*" and a in agent_l for a in agents):
            return rules
    for agents, rules in groups:
        if "*" in agents:
            return rules
    return []


def robots_allowed(path: str, rules: list) -> bool:
    """RFC 9309 §2.2.2 decision: longest matching prefix wins, a tie
    goes to Allow; no matching rule (or an empty-value Disallow, the
    allow-all idiom) means allowed."""
    best_len = -1
    allowed = True
    for rule_type, prefix in rules:
        if prefix == "":
            continue  # "Disallow:" with no value = no restriction
        if path.startswith(prefix):
            n = len(prefix)
            if n > best_len or (n == best_len and rule_type == "allow"):
                best_len = n
                allowed = rule_type == "allow"
    return allowed
