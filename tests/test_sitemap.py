"""Sitemap protocol (sitemaps.org) + the robots ``Sitemap:`` directive
and the Spark coverage query's declared-URL dimension."""
from htmpark.robots import sitemaps
from htmpark.sitemap import loc_in_scope, sitemap_locs

SF = "/root/testdata/sf0.001"


def test_sitemaps_group_independent():
    # the directive applies regardless of User-agent grouping: one
    # before any group, one inside a group a different agent owns
    text = ("Sitemap: https://a.example/s1.xml\n"
            "User-agent: otherbot\nDisallow: /\n"
            "Sitemap: https://a.example/s2.xml\n")
    assert sitemaps(text) == ["https://a.example/s1.xml",
                              "https://a.example/s2.xml"]


def test_sitemaps_order_duplicates_and_empties():
    text = ("Sitemap: https://a.example/s.xml\n"
            "Sitemap:\n"            # empty value: skipped
            "sitemap: https://b.example/s.xml  # trailing comment\n"
            "Sitemap: https://a.example/s.xml\n")  # dup preserved
    assert sitemaps(text) == ["https://a.example/s.xml",
                              "https://b.example/s.xml",
                              "https://a.example/s.xml"]
    assert sitemaps("") == []
    assert sitemaps("User-agent: *\nDisallow: /\n") == []


def test_sitemap_locs_real_parser():
    xml = (b'<?xml version="1.0" encoding="UTF-8"?>\n'
           b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
           b'  <url><loc>https://h.example/p/0</loc>'
           b'<lastmod>2026-01-01</lastmod></url>\n'
           b'  <url><loc>\n    https://h.example/a\n  </loc></url>\n'
           b'</urlset>\n')
    assert sitemap_locs(xml) == ["https://h.example/p/0",
                                 "https://h.example/a"]


def test_sitemap_locs_index_shape_and_unclosed():
    # index files nest <sitemap><loc> — extraction is element-driven;
    # a truncated trailing loc still emits via the tree builder's EOF
    # recovery (implied end tags, HTML5 semantics)
    xml = (b"<sitemapindex>"
           b"<sitemap><loc>https://h.example/s1.xml</loc></sitemap>"
           b"<sitemap><loc>https://h.example/s2.xml")
    assert sitemap_locs(xml) == ["https://h.example/s1.xml",
                                 "https://h.example/s2.xml"]


def test_loc_in_scope_same_host_rule():
    sm = "https://H.Example.COM/sitemap.xml"  # host case-insensitive
    assert loc_in_scope("https://h.example.com/p/0", sm)
    assert not loc_in_scope("https://cdn.example.com/a", sm)   # host
    assert not loc_in_scope("http://h.example.com/p/0", sm)    # scheme
    assert not loc_in_scope("https://h.example.com:8443/p", sm)  # port
    assert not loc_in_scope("p/0", sm)                      # relative


def test_loc_in_scope_directory_rule():
    sm = "https://h.example/sub/sitemap.xml"
    assert loc_in_scope("https://h.example/sub/p/0", sm)
    assert not loc_in_scope("https://h.example/other/p", sm)
    assert not loc_in_scope("https://h.example/p", sm)
    # a root-level sitemap covers the whole host
    assert loc_in_scope("https://h.example/anything",
                        "https://h.example/sitemap.xml")


def test_sitemap_loc_dim_per_hmod(spark):
    """The declared-URL dimension end-to-end (robots parse -> synth
    fetch -> real-parser loc extraction -> scope verdict): hmod 0
    declares one sitemap (nine on-host locs + one dropped cdn loc),
    hmod 1 two (the cdn one contributes three off-crawl locs plus one
    dropped host000 loc), hmod 2/3 none."""
    from htmpark.queries import _sitemap_loc_df

    rows = _sitemap_loc_df(spark, 8).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host_num, []).append((r.loc, r.in_scope))
    assert sorted(by_host) == [0, 1, 4, 5]  # hmod 2/3 declare nothing
    for h in (0, 4):  # hmod 0: 10 locs, exactly the cdn one dropped
        locs = by_host[h]
        assert len(locs) == 10
        assert [l for l, s in locs if not s] == [
            "https://cdn.example.com/asset/0"]
        assert f"https://host{h:03d}.example.com/p/0" in [
            l for l, s in locs if s]
    for h in (1, 5):  # hmod 1: + cdn sitemap (3 valid, 1 dropped)
        locs = by_host[h]
        assert len(locs) == 14
        dropped = sorted(l for l, s in locs if not s)
        assert dropped == ["https://cdn.example.com/asset/0",
                           "https://host000.example.com/p/0"]


def test_sitemap_coverage_invariants(spark):
    """Row-level invariants the oracle hash also pins, stated
    explicitly: coverage splits declared into discovered + seeds +
    robots-blocked; a disallowed declared path (/private/x on hmod-0
    hosts) never becomes a seed."""
    from htmpark.queries import REGISTRY

    fn, _ = REGISTRY["web_sitemap_coverage"]
    rows = {r.host_num: r for r in fn(spark, SF).collect()}
    assert len(rows) == 98
    for h, r in rows.items():
        if h % 4 in (0, 1):
            assert r.n_declared == 9
            assert r.n_loc_dropped == (1 if h % 4 == 0 else 2)
        else:
            assert (r.n_declared, r.n_both, r.n_new_seeds,
                    r.n_loc_dropped) == (0, 0, 0, 0)
        assert r.n_both + r.n_new_seeds <= r.n_declared
    # hmod 0: /private/x is robots-disallowed, /a is link-discovered
    # on some hosts; seeds can never cover all nine declared paths
    assert all(r.n_new_seeds <= 8 for h, r in rows.items() if h % 4 == 0)
    # hmod 1: only the six /p/ paths can seed (Disallow: / gates the rest)
    assert all(r.n_new_seeds <= 6 for h, r in rows.items() if h % 4 == 1)
