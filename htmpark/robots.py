"""robots.txt politeness gate (RFC 9309) for crawl pipelines.

A training-data crawl must honor robots.txt before a page ever reaches
extraction; this module is the engine-side implementation: a stdlib
parser for the rules grammar plus the longest-match allow/disallow
decision, exposed to Spark as a tiny parsed-rules dimension broadcast
against the url stream (see queries.q_web_robots_gate).

Not derived from the reference (zadean/htmerl parses HTML only); the
grammar and precedence rules follow public RFC 9309:
* groups = one or more ``User-agent`` lines followed by rules; by
  DEFAULT a group applies if any of its agent tokens is a
  case-insensitive PREFIX of the product token (token == agent or
  agent.startswith(token)).  NOTE: this prefix rule is a DELIBERATE
  leniency, not RFC semantics — RFC 9309 §2.2.1 specifies
  case-insensitive EXACT product-token equality; the prefix form is
  the common crawler behavior (e.g. Google's published parser matches
  ``googlebot`` groups for ``Googlebot-Image``) and lets site owners
  address a bot family with one token.  Trade-off: a short named
  token in untrusted robots.txt (``User-agent: htm``) captures the
  agent and suppresses the ``*`` fallback, possibly selecting a MORE
  permissive group than RFC-exact matching would — acceptable as a
  default because the gate still honors whatever group it selects,
  and pinned by test_product_token_prefix_not_substring.  The
  leniency is SWITCHABLE (r9 verdict sharp-edge #3): pass
  ``exact_tokens=True`` to ``parse_robots``/``crawl_delay`` for RFC
  9309 §2.2.1 exact-equality matching.  Rules of ALL matching named
  groups are COMBINED (§2.2.1), with the union of ``*`` groups as
  the fallback;
* ``Allow``/``Disallow`` patterns support the §2.2.3 special
  characters: ``*`` matches any run of octets and a trailing ``$``
  anchors the end; otherwise the pattern matches as a path prefix;
* the LONGEST matching pattern (octet length) wins and a tie goes to
  ``Allow`` (§2.2.2); an empty ``Disallow:`` value is a no-op;
* comments (``#``), unknown directives, ``Crawl-delay``, and
  ``Sitemap`` are tolerated and ignored for the allow decision
  (``crawl_delay`` and ``sitemaps`` read the latter two out
  separately).
"""
from __future__ import annotations

import re


def _token_matches(token: str, agent_l: str, exact: bool) -> bool:
    """Does a lowercased named agent ``token`` select ``agent_l``?
    Default: case-insensitive PREFIX (the documented leniency); with
    ``exact=True``: RFC 9309 §2.2.1 case-insensitive exact equality.
    ONE predicate shared by parse_robots and crawl_delay so the two
    group selections can never diverge."""
    if token == "*":
        return False
    return agent_l == token if exact else agent_l.startswith(token)


def parse_robots(text: str, agent: str = "htmpark",
                 exact_tokens: bool = False) -> list:
    """Parse robots.txt and return the ``(rule_type, pattern)`` list
    applying to ``agent``: the COMBINED rules of every group with a
    matching named agent token, else the combined ``*`` groups, else
    no rules.  ``exact_tokens=True`` switches the named-token match
    from the default prefix leniency to RFC 9309 §2.2.1 exact
    equality (see module docstring)."""
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
    named = [r for agents, rules in groups
             if any(_token_matches(a, agent_l, exact_tokens)
                    for a in agents)
             for r in rules]
    if named:
        return named
    return [r for agents, rules in groups if "*" in agents for r in rules]


def crawl_delay(text: str, agent: str = "htmpark",
                exact_tokens: bool = False):
    """``Crawl-delay`` (a de-facto extension, not RFC 9309) in seconds
    for ``agent``: the first delay declared in any matching named
    group, else in any ``*`` group, else None.  A politeness scheduler
    turns this into a per-host token bucket; it never affects the
    allow/disallow verdict.  ``exact_tokens`` as in parse_robots."""
    groups = []
    cur_agents: list = []
    cur_delay = None
    saw_rule = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule:
                groups.append((cur_agents, cur_delay))
                cur_agents, cur_delay, saw_rule = [], None, False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            saw_rule = True
            if key == "crawl-delay" and cur_delay is None:
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
    if cur_agents:
        groups.append((cur_agents, cur_delay))
    agent_l = agent.lower()
    for agents, delay in groups:
        if delay is not None and any(
                _token_matches(a, agent_l, exact_tokens) for a in agents):
            return delay
    for agents, delay in groups:
        if delay is not None and "*" in agents:
            return delay
    return None


def sitemaps(text: str) -> list:
    """``Sitemap:`` directive values in file order (sitemaps.org
    robots.txt discovery; RFC 9309 §2.3 files these under tolerated
    "other records").  The directive is group-INDEPENDENT — it applies
    regardless of any surrounding ``User-agent`` grouping — so the
    parse collects every declaration in the file, duplicates preserved
    (a consumer dedups by fetch URL).  Values are absolute sitemap
    URLs per the protocol and are returned verbatim: the location-scope
    check on the URLs INSIDE each sitemap is the consumer's job
    (htmpark.sitemap.loc_in_scope); a sitemap may itself live on
    another host (cross-host submission is allowed at this level)."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def pattern_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3 rule pattern -> anchored regex source: ``*``
    matches any octet run, a trailing ``$`` anchors the end, everything
    else is literal; the match is anchored at the path start (prefix
    semantics).  The same translation runs in the Spark gate's rules
    dimension, so the per-url match is a plain ``rlike``."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return "^" + body + ("$" if anchored else "")


def robots_allowed(path: str, rules: list) -> bool:
    """RFC 9309 §2.2.2 decision: longest matching pattern wins, a tie
    goes to Allow; no matching rule (or an empty-value Disallow, the
    allow-all idiom) means allowed.

    PINNED tie semantics: "length" is ``len(pattern)`` of the RULE
    PATTERN INCLUDING the §2.2.3 metacharacters ``*`` and ``$`` (so
    ``/a$`` ties ``/a/``, both length 3, and the tie goes to whichever
    is the Allow).  RFC 9309 ranks by "most octets" without saying
    whether metacharacters count; this engine counts them, and the SAME
    formula is used in the Spark rules dimension
    (queries._robots_rules_df ``plen``), the gate score
    ``2*plen + is_allow``, and the analytic oracles — change all four
    together or not at all (tests/test_robots.py pins the tie cases).

    Matching scope: patterns match the RAW path+query string as given
    (fragments are stripped upstream by the frontier; RFC 9309's
    percent-encoding normalization of pattern and path before
    comparison is NOT applied — callers feeding percent-mixed paths
    against percent-bearing patterns should normalize both sides
    first, e.g. with the canon %XX hex-uppercase rule)."""
    best_len = -1
    allowed = True
    for rule_type, pattern in rules:
        if pattern == "":
            continue  # "Disallow:" with no value = no restriction
        if re.search(pattern_regex(pattern), path):
            n = len(pattern)
            if n > best_len or (n == best_len and rule_type == "allow"):
                best_len = n
                allowed = rule_type == "allow"
    return allowed
