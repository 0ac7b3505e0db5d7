"""robots.txt parser + decision rules (htmpark/robots.py, RFC 9309
subset) and the Spark politeness-gate query."""
from htmpark.robots import parse_robots, robots_allowed


def test_group_selection_named_beats_star():
    txt = ("User-agent: specialbot\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /private/\n")
    assert parse_robots(txt, agent="specialbot") == [("disallow", "/")]
    assert parse_robots(txt, agent="htmpark") == \
        [("disallow", "/private/")]
    # prefix match on the product token, case-insensitive
    assert parse_robots(txt, agent="SpecialBot/2.1") == [("disallow", "/")]


def test_product_token_prefix_not_substring():
    """RFC 9309 §2.2.1 product-token matching is a PREFIX match of the
    crawler's agent, not a substring scan: a short token buried inside
    the agent name ('a' in 'htmpark', 'park') must NOT capture the
    group and suppress the '*' fallback — untrusted robots.txt could
    otherwise hand the crawler a MORE permissive named group."""
    txt = ("User-agent: a\nDisallow: /lenient\n\n"
           "User-agent: park\nDisallow: /inner\n\n"
           "User-agent: *\nDisallow: /\n")
    # neither 'a' nor 'park' is a prefix of 'htmpark': * fallback applies
    assert parse_robots(txt, agent="htmpark") == [("disallow", "/")]
    # 'htm' IS a prefix of 'htmpark' (the pinned hmod-2 merge semantics)
    txt2 = ("User-agent: htm\nDisallow: /x\n\nUser-agent: *\nDisallow: /\n")
    assert parse_robots(txt2, agent="htmpark") == [("disallow", "/x")]
    # exact token match, and version-suffixed agents, still match
    assert parse_robots(txt, agent="a") == [("disallow", "/lenient")]
    assert parse_robots(txt, agent="A/1.0") == [("disallow", "/lenient")]


def test_tie_scoring_counts_metacharacters():
    """PINNED tie semantics (robots_allowed docstring): rule length is
    len(pattern) INCLUDING '*' and '$'.  The same formula feeds the
    Spark gate's plen and the analytic oracles; these cases fail if
    anyone switches any copy to octets-of-literal-pattern."""
    # '/a*' (len 3, 2 literal octets) ties '/ab' (len 3): allow wins.
    # Octet counting would score 2 < 3 and let the disallow win.
    assert robots_allowed("/ab", [("allow", "/a*"), ("disallow", "/ab")])
    # '/ab$' (len 4 counting '$') ties '/ab*' (len 4): allow wins
    assert robots_allowed("/ab", [("allow", "/ab$"), ("disallow", "/ab*")])
    # sanity: longer literal still beats a shorter wildcard
    assert not robots_allowed(
        "/ab/x", [("allow", "/a*"), ("disallow", "/ab/")])


def test_matching_named_groups_merge():
    """RFC 9309 §2.2.1: rules of ALL matching groups combine."""
    txt = ("User-agent: htm\nDisallow: /a\n\n"
           "User-agent: htmpark\nDisallow: /b\n\n"
           "User-agent: other\nDisallow: /c\n")
    assert parse_robots(txt, agent="htmpark") == \
        [("disallow", "/a"), ("disallow", "/b")]
    # the * fallback also unions every * group
    txt2 = ("User-agent: *\nDisallow: /x\n\n"
            "User-agent: *\nDisallow: /y\n")
    assert parse_robots(txt2, agent="nobody") == \
        [("disallow", "/x"), ("disallow", "/y")]


def test_wildcard_and_anchor_patterns():
    """RFC 9309 §2.2.3: '*' matches any octet run, trailing '$' anchors
    the end; longest PATTERN (octet length) still wins."""
    rules = [("disallow", "/*.php")]
    assert not robots_allowed("/index.php", rules)
    assert not robots_allowed("/a/b.php?x=1", rules)
    assert robots_allowed("/index.html", rules)
    anchored = [("disallow", "/*.tmp$")]
    assert not robots_allowed("/files/1.tmp", anchored)
    assert robots_allowed("/files/1.tmp.bak", anchored)
    # wildcard disallow vs longer literal allow
    both = [("disallow", "/p/*"), ("allow", "/p/keep/")]
    assert robots_allowed("/p/keep/x", both)
    assert not robots_allowed("/p/drop/x", both)


def test_shared_group_and_comments():
    txt = ("# politeness\n"
           "User-agent: alpha\n"
           "User-agent: beta\n"
           "Disallow: /x  # trailing comment\n"
           "Crawl-delay: 2\n"
           "Unknown-directive: y\n")
    assert parse_robots(txt, agent="beta") == [("disallow", "/x")]
    assert parse_robots(txt, agent="alpha") == [("disallow", "/x")]
    # no * group: an unmatched agent gets no rules
    assert parse_robots(txt, agent="other") == []


def test_longest_match_and_allow_tiebreak():
    rules = [("disallow", "/private/"), ("allow", "/private/stats"),
             ("disallow", "/tmp")]
    assert not robots_allowed("/private/x", rules)
    assert robots_allowed("/private/stats/2024", rules)
    assert not robots_allowed("/tmpfile", rules)
    assert robots_allowed("/public", rules)
    # tie on length: allow wins
    assert robots_allowed("/a/b", [("disallow", "/a/b"), ("allow", "/a/b")])


def test_empty_disallow_and_empty_text():
    assert parse_robots("", agent="x") == []
    assert robots_allowed("/anything", [("disallow", "")])
    txt = "User-agent: *\nDisallow:\n"
    assert robots_allowed("/a", parse_robots(txt))


def test_allow_override_block_all():
    rules = parse_robots("User-agent: *\nAllow: /p/\nDisallow: /\n")
    assert robots_allowed("/p/42", rules)
    assert not robots_allowed("/private/42", rules)
    assert not robots_allowed("/", rules)


def test_crawl_delay():
    from htmpark.robots import crawl_delay

    txt = ("User-agent: specialbot\nCrawl-delay: 10\n\n"
           "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert crawl_delay(txt, agent="specialbot") == 10.0
    assert crawl_delay(txt, agent="htmpark") == 2.5
    assert crawl_delay("", agent="htmpark") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: nonsense\n") is None
    # a group's first declared delay wins within the group
    txt2 = "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 9\n"
    assert crawl_delay(txt2) == 3.0
    # the budget dim's whole-second mapping: fractional delays round UP
    # with a floor of 1 — int() truncation of a real-world
    # 'Crawl-delay: 0.5' would put a zero divisor in the token bucket
    from htmpark.queries import _delay_whole_seconds

    assert _delay_whole_seconds(None) is None
    assert _delay_whole_seconds(0.5) == 1
    assert _delay_whole_seconds(2.5) == 3
    assert _delay_whole_seconds(10.0) == 10
    assert _delay_whole_seconds(0.0) == 1


def test_robots_parser_total_on_arbitrary_text():
    """Property: parse_robots/robots_allowed are TOTAL — arbitrary text
    (binary noise, pathological colons, huge lines) never raises, the
    group-selection result is deterministic, and a text with no
    applicable rules always allows."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=400), st.text(min_size=1, max_size=30))
    def check(txt, path):
        rules = parse_robots(txt)
        assert rules == parse_robots(txt)
        assert isinstance(robots_allowed(path, rules), bool)
        assert robots_allowed(path, [])

    check()


def test_robots_gate_query(spark):
    """The gate query's verdicts match a direct parse+decide re-derivation
    for every (host rules, path shape) pairing."""
    from htmpark.queries import REGISTRY, _ROBOTS_TEXTS

    fn, _ = REGISTRY["web_robots_gate"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    for r in rows:
        hmod = (r.doc_id % 7) % 4
        rules = parse_robots(_ROBOTS_TEXTS[hmod])
        assert r.allowed == int(robots_allowed(r.path, rules)), \
            (r.doc_id, hmod, r.path)
    # the merged-groups hosts (hmod 2) must block /pub/ via the SECOND
    # matching named group — a first-match-only parser passes /pub/
    merged = [r for r in rows
              if (r.doc_id % 7) % 4 == 2 and r.path.startswith("/pub/")]
    assert merged and all(r.allowed == 0 for r in merged)
    # the wildcard hosts (hmod 0) must block the .tmp paths
    wild = [r for r in rows
            if (r.doc_id % 7) % 4 == 0 and r.path.endswith(".tmp")]
    assert wild and all(r.allowed == 0 for r in wild)
    # both verdicts occur (the gate actually gates)
    verdicts = {r.allowed for r in rows}
    assert verdicts == {0, 1}


def test_politeness_budget(spark):
    """The Crawl-delay consumer: every host's budget columns re-derive
    from the REAL crawl_delay() over its robots text plus the integer
    token-bucket formulas, the named htmpark group's 10 s (not
    specialbot's 99 s) applies on hmod-2 hosts, and delay-less hosts
    fall back to 1 s."""
    from htmpark.robots import crawl_delay
    from htmpark.queries import (_ROBOTS_TEXTS, _delay_whole_seconds,
                                 REGISTRY)

    fn, _ = REGISTRY["web_politeness_budget"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    W = 3600
    seen_delays = set()
    for r in rows:
        d = crawl_delay(_ROBOTS_TEXTS[r.host_num % 4])
        # mirror the engine's documented round-up (ceil, floor 1), not
        # int() truncation — keeps the expectation honest if a
        # fractional Crawl-delay ever lands in _ROBOTS_TEXTS (r7 ADVICE)
        eff = _delay_whole_seconds(d) or 1
        assert r.delay_s == eff, (r.host_num, d)
        seen_delays.add(r.delay_s)
        assert r.n_fetch_now == min(r.n_allowed_targets, W // eff)
        assert r.n_deferred == r.n_allowed_targets - r.n_fetch_now
        assert r.n_waves == (r.n_allowed_targets * eff + W - 1) // W
    assert seen_delays == {5, 2, 10, 1}  # incl. the named-group 10


def test_crawl_frontier_rollup(spark):
    """Frontier capstone: SURT dedup collapses the per-page dirty-href
    targets to one per host, off-site (CDN) targets are scoped out, and
    hmod-1 hosts lose their non-/p/ targets to robots."""
    from htmpark.queries import _DIRTY_HREFS, REGISTRY

    fn, _ = REGISTRY["web_crawl_frontier"]
    rows = {r.host_num: r for r in
            fn(spark, "/root/testdata/sf0.001").collect()}
    # every page carries the 12 on-site dirty anchors (/up /p/self
    # /p/a2 /root /p/rel?u /p/go/https://... /p/Pct%2f%zq
    # /p/%7edir/%41%2f%gg /p/qn?Z=1&%61=2 + the 3 same-doc
    # self-links); the 4 cdn.example.org anchors must NOT appear
    # (host-scope guard) and the 2 opaque-scheme anchors are dropped:
    # 50 frag-1 pages x 3 + 50 frag-9 x 1 + 500 pages x 12 on-site
    assert sum(r.n_edges for r in rows.values()) == 200 + 500 * 12
    assert len(_DIRTY_HREFS) == 20  # 12 on-site + 6 off-site + 2 opaque
    # host 2 carries frag-1 pages (i=1 -> host 2): hmod 2 allows all
    h2 = rows[2]
    assert h2.n_targets == h2.n_allowed_targets
    # SURT dedup: the shared dirty targets collapse to 9 per host no
    # matter how many pages the host carries (the r8 query anchor adds
    # /p/qn — surt strips its ?query), while the same-doc self-links
    # contribute one target PER PAGE (host 0 carries 100 pages, frags
    # 0/5 only -> no frag-link targets)
    assert rows[0].n_targets == 9 + 100
    # every hmod-1 host loses /up and /root; those also carrying frag-1
    # pages additionally lose /a /b /c (but keep /p/self /p/a2 /p/x)
    gated = [r for r in rows.values() if r.host_num % 4 == 1]
    assert gated
    for r in gated:
        assert r.n_targets - r.n_allowed_targets in (2, 5)
    assert any(r.n_targets - r.n_allowed_targets == 5 for r in gated)
