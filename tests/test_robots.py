"""robots.txt parser + precedence gate (crawler_spark/robots.py).

Oracle: hand-derived RFC 9309 outcomes for each fixture body, plus a
cross-check of the simple-prefix gate against python's stdlib parser
where their semantics coincide.
"""

from __future__ import annotations

import pytest

from crawler_spark.robots import parse_robots_txt, robots_allowed_precedence

BODIES = {
    # plain single group, comments, blank lines, crawl-delay
    "a.test": """
# friendly bot notes
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2.5

Sitemap: https://a.test/sitemap.xml
""",
    # specific agent beats *; consecutive UA lines share one group
    "b.test": """
User-agent: crawler-spark
User-agent: otherbot
Disallow: /only-for-us/
Crawl-delay: 1

User-agent: *
Disallow: /
""",
    # allow override + longest-match precedence
    "c.test": """
User-agent: *
Disallow: /shop/
Allow: /shop/public/
""",
    # multiple groups for the same agent merge (RFC 9309 2.2.1)
    "d.test": """
User-agent: *
Disallow: /x/

User-agent: *
Disallow: /y/
Crawl-delay: 7
""",
    # empty Disallow = allow all; rules before any UA line ignored
    "e.test": """
Disallow: /orphan-rule-ignored/
User-agent: *
Disallow:
""",
    # no applicable group for us
    "f.test": """
User-agent: nosuchbot
Disallow: /
""",
    # key case-insensitivity, value case preserved, \r\n endings
    "g.test": "USER-AGENT: *\r\nDISALLOW: /CaseSensitive/\r\nCRAWL-DELAY: 0.1\r\n",
}


@pytest.fixture(scope="module")
def parsed(spark):
    raw = spark.createDataFrame(
        list(BODIES.items()), schema="host string, robots_txt string"
    )
    rows = parse_robots_txt(
        raw, agent="crawler-spark", default_crawl_delay_ms=3000
    ).collect()
    return {r["host"]: r for r in rows}


def test_single_group_with_comments_and_delay(parsed):
    r = parsed["a.test"]
    assert sorted(r["disallow_prefixes"]) == ["/private/", "/tmp/"]
    assert r["allow_prefixes"] == []
    assert r["crawl_delay_ms"] == 2500


def test_specific_agent_beats_wildcard(parsed):
    r = parsed["b.test"]
    assert r["disallow_prefixes"] == ["/only-for-us/"]
    assert r["crawl_delay_ms"] == 1000


def test_allow_prefixes_surfaced(parsed):
    r = parsed["c.test"]
    assert r["disallow_prefixes"] == ["/shop/"]
    assert r["allow_prefixes"] == ["/shop/public/"]


def test_same_agent_groups_merge(parsed):
    r = parsed["d.test"]
    assert sorted(r["disallow_prefixes"]) == ["/x/", "/y/"]
    assert r["crawl_delay_ms"] == 7000


def test_empty_disallow_and_orphan_rules(parsed):
    r = parsed["e.test"]
    assert r["disallow_prefixes"] == []
    assert r["crawl_delay_ms"] == 3000  # default: group had no delay


def test_no_applicable_group_allows_all(parsed):
    r = parsed["f.test"]
    assert r["disallow_prefixes"] == []
    assert r["allow_prefixes"] == []
    assert r["crawl_delay_ms"] == 3000


def test_case_and_crlf(parsed):
    r = parsed["g.test"]
    assert r["disallow_prefixes"] == ["/CaseSensitive/"]
    assert r["crawl_delay_ms"] == 100


def test_stdlib_cross_check(spark):
    """Where semantics coincide (no Allow rules), our gate must agree
    with urllib.robotparser on every (host, path) probe."""
    import urllib.robotparser

    probes = ["/", "/private/x", "/tmp/", "/shop/a", "/only-for-us/", "/ok"]
    hosts = ["a.test", "b.test", "d.test", "e.test", "f.test"]
    raw = spark.createDataFrame(
        [(h, BODIES[h]) for h in hosts], schema="host string, robots_txt string"
    )
    robots = parse_robots_txt(raw, agent="crawler-spark")
    frontier = spark.createDataFrame(
        [(h, f"https://{h}{p}") for h in hosts for p in probes],
        schema="host string, url string",
    )
    ours = {
        (r["host"], r["url"])
        for r in robots_allowed_precedence(frontier, robots).collect()
    }
    for h in hosts:
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(BODIES[h].splitlines())
        for p in probes:
            url = f"https://{h}{p}"
            expect = rp.can_fetch("crawler-spark", url)
            assert ((h, url) in ours) == expect, (h, p)


def test_precedence_allow_override(spark):
    raw = spark.createDataFrame(
        [("c.test", BODIES["c.test"])], schema="host string, robots_txt string"
    )
    robots = parse_robots_txt(raw)
    frontier = spark.createDataFrame(
        [
            ("c.test", "https://c.test/shop/secret"),
            ("c.test", "https://c.test/shop/public/item"),
            ("c.test", "https://c.test/other"),
        ],
        schema="host string, url string",
    )
    got = sorted(
        r["url"] for r in robots_allowed_precedence(frontier, robots).collect()
    )
    assert got == [
        "https://c.test/other",
        "https://c.test/shop/public/item",
    ]


def test_parse_plan_shape(spark):
    """Scale contract: the parse is one shuffle on host (windows + agg
    share the partitioning) and never broadcasts the bodies."""
    raw = spark.createDataFrame(
        list(BODIES.items()), schema="host string, robots_txt string"
    )
    plan = parse_robots_txt(raw)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_engine_crawl_from_raw_robots(spark, smoke_dir, tmp_path_factory):
    """End-to-end: rendering the smoke fixture's structured robots as
    raw robots.txt bodies, parsing them back, and crawling must give
    the same superstep/fetch totals as the structured-table crawl
    (FIXTURES.md golden: 303 pages, 4 supersteps, drained frontier)."""
    from pyspark.sql import Row

    from crawler_spark.engine import CrawlEngine, EngineConfig

    structured = spark.read.parquet(f"{smoke_dir}/robots.parquet").collect()
    bodies = []
    for r in structured:
        lines = ["User-agent: *"]
        lines += [f"Disallow: {p}" for p in (r["disallow_prefixes"] or [])]
        lines.append(f"Crawl-delay: {r['crawl_delay_ms'] / 1000}")
        bodies.append(Row(host=r["host"], robots_txt="\n".join(lines)))
    raw = spark.createDataFrame(bodies)
    robots_df = parse_robots_txt(raw, default_crawl_delay_ms=3000).drop(
        "allow_prefixes", "sitemap_urls"
    )
    # parsed table must reproduce the structured one exactly
    got = {
        r["host"]: (r["crawl_delay_ms"], sorted(r["disallow_prefixes"]))
        for r in robots_df.collect()
    }
    want = {
        r["host"]: (
            r["crawl_delay_ms"],
            sorted(r["disallow_prefixes"] or []),
        )
        for r in structured
    }
    assert got == want

    state = str(tmp_path_factory.mktemp("raw-robots-state"))
    eng = CrawlEngine(
        spark,
        pages_path=f"{smoke_dir}/pages.parquet",
        seeds_path=f"{smoke_dir}/seeds.parquet",
        robots_path=None,
        robots_df=robots_df,
        state_dir=state,
        config=EngineConfig(budget_ms=3_600_000),
        fresh=True,
    )
    summary = eng.run(max_supersteps=200)
    assert summary["pages_fetched"] == 303
    assert summary["supersteps"] == 4
    assert summary["frontier_rows"] == 0


def test_sitemap_lines_collected(parsed):
    assert parsed["a.test"]["sitemap_urls"] == [
        "https://a.test/sitemap.xml"
    ]
    assert parsed["b.test"]["sitemap_urls"] == []


def _ref_rule_match(path: str, rule: str) -> bool:
    """Independent pure-Python RFC 9309 §2.2.3 matcher (test oracle —
    urllib.robotparser does NOT implement wildcards, so the cross-check
    is against this from-the-RFC reimplementation + the RFC/Google
    documentation examples below)."""
    import re

    end = rule.endswith("$")
    body = rule[:-1] if end else rule
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    if end:
        rx += "$"
    return re.search(rx, path) is not None


def _ref_allowed(path: str, disallow: list[str], allow: list[str]) -> bool:
    d = max((len(r) for r in disallow if _ref_rule_match(path, r)), default=None)
    a = max((len(r) for r in allow if _ref_rule_match(path, r)), default=None)
    if d is None:
        return True
    return a is not None and a >= d


def test_wildcard_rules_rfc9309(spark):
    """RFC 9309 §2.2.3 ``*`` / trailing-``$`` patterns (round 5):
    documentation examples (Google robots.txt spec 'URL matching based
    on path values' table — public reference implementation semantics)
    plus overlapping allow/disallow pairs, cross-checked against an
    independent pure-Python matcher on every (rule-set, path) cell."""
    disallow = ["/*.php$", "/private*/", "/fish*", "/a$b", "/*/tail"]
    allow = ["/private*/data/", "/fish", "/public*.php$"]
    probes = [
        "/a.php",            # $-anchored match -> block
        "/a.php5",           # $ prevents match -> allow
        "/x/deep/a.php",     # * spans '/'
        "/private1/x",       # /private*/ with infix wildcard
        "/private/x",        # zero-width * match
        "/private1/data/z",  # longer allow overrides
        "/fish",             # disallow /fish* (6) beats allow /fish (5)
        "/fishheads/x.php",  # both wildcard rules fire
        "/a$b",              # mid-pattern $ is a literal octet
        "/a!b",              # ...and does not become 'any char'
        "/one/tail",         # leading-*-segment rule
        "/one/tail/more",    # prefix semantics after * rule
        "/public_x.php",     # allow (14) vs disallow /*.php$ (7)
        "/",                 # no rule matches
    ]
    robots = spark.createDataFrame(
        [("w.test", disallow, allow)],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [("w.test", f"https://w.test{p}") for p in probes],
        schema="host string, url string",
    )
    ours = {
        r["url"] for r in robots_allowed_precedence(frontier, robots).collect()
    }
    for p in probes:
        expect = _ref_allowed(p, disallow, allow)
        got = f"https://w.test{p}" in ours
        assert got == expect, (p, "expected", expect)
    # spot-pin the table rows that define the semantics (so a bug in
    # the reference matcher above can't silently bless itself)
    assert f"https://w.test/a.php5" in ours
    assert f"https://w.test/a.php" not in ours
    assert f"https://w.test/x/deep/a.php" not in ours
    assert f"https://w.test/private1/data/z" in ours
    assert f"https://w.test/fish" not in ours
    assert f"https://w.test/public_x.php" in ours
    assert f"https://w.test/a!b" in ours


def test_wildcard_free_rules_unchanged(spark):
    """Regression fence: rule sets with no metacharacters must behave
    byte-identically to the pre-wildcard prefix gate (the fast path)."""
    import random

    rng = random.Random(9309)
    segs = ["/a", "/ab", "/ab/c", "/b", "/", "/c/d/e"]
    disallow = ["/a", "/c/"]
    allow = ["/ab", "/c/d"]
    probes = ["".join(rng.choices("abc/", k=rng.randint(1, 8))) for _ in range(60)]
    probes = ["/" + p.lstrip("/") for p in probes] + segs
    robots = spark.createDataFrame(
        [("x.test", disallow, allow)],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [("x.test", f"https://x.test{p}") for p in set(probes)],
        schema="host string, url string",
    )
    ours = {
        r["url"] for r in robots_allowed_precedence(frontier, robots).collect()
    }
    for p in set(probes):
        d = max((len(r) for r in disallow if p.startswith(r)), default=None)
        a = max((len(r) for r in allow if p.startswith(r)), default=None)
        expect = d is None or (a is not None and a >= d)
        assert (f"https://x.test{p}" in ours) == expect, p


def test_engine_gate_honors_wildcards(spark):
    """politeness.robots_allowed — the engine's per-superstep successor
    gate — shares the RFC 9309 wildcard matcher (round 5): a
    `/*.php$`-style disallow must drop matching successors in BOTH the
    broadcast-join form and the collected map-literal fast path, and
    wildcard-free rules must behave exactly as before."""
    from crawler_spark.politeness import robots_allowed

    rules = {"g.test": ["/*.php$", "/private*/", "/lit"]}
    robots = spark.createDataFrame(
        [("g.test", 0, rules["g.test"])],
        "host string, crawl_delay_ms long, disallow_prefixes array<string>",
    )
    probes = {
        "/a.php": False,
        "/deep/b.php": False,
        "/a.php5": True,
        "/private9/x": False,
        "/privateX": True,   # no trailing slash matched by the rule
        "/lit/sub": False,   # literal prefix, fast path
        "/ok": True,
    }
    df = spark.createDataFrame(
        [("g.test", f"https://g.test{p}") for p in probes],
        "host string, url string",
    )
    for form, out in [
        ("join", robots_allowed(df, robots)),
        ("map", robots_allowed(df, robots, rules_map=rules)),
    ]:
        got = {r.url for r in out.collect()}
        for p, keep in probes.items():
            assert (f"https://g.test{p}" in got) == keep, (form, p)


def test_match_target_includes_query(spark):
    """RFC 9309 §2.2.2: rules match against path + query. A trailing-$
    rule must not fire when a query follows the path, and
    query-targeting rules must fire — in BOTH gates (precedence and
    the engine's), both engine-gate forms."""
    from crawler_spark.politeness import robots_allowed

    disallow = ["/*.php$", "/search?q=*", "/dl"]
    probes = {
        "/a.php": False,            # anchored, no query
        "/a.php?x=1": True,         # query defeats the $ anchor
        "/search?q=secret": False,  # rule reaches into the query
        "/search": True,
        "/dl?any=1": False,         # prefix rule unaffected by query
        "/ok?x=.php": False,        # * spans into the query; $ anchors
                                    # the END of path+query, which IS
                                    # '.php' here (Google semantics)
        "/ok?x=1": True,
    }
    robots = spark.createDataFrame(
        [("q.test", 0, disallow)],
        "host string, crawl_delay_ms long, disallow_prefixes array<string>",
    )
    df = spark.createDataFrame(
        [("q.test", f"https://q.test{p}") for p in probes],
        "host string, url string",
    )
    prec = spark.createDataFrame(
        [("q.test", disallow, [])],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    outs = {
        "engine-join": robots_allowed(df, robots),
        "engine-map": robots_allowed(
            df, robots, rules_map={"q.test": disallow}
        ),
        "precedence": robots_allowed_precedence(df, prec),
    }
    for form, out in outs.items():
        got = {r.url for r in out.collect()}
        for p, keep in probes.items():
            assert (f"https://q.test{p}" in got) == keep, (form, p)
