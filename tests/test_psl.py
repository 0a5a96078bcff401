"""Public-suffix-list registrable-domain tests (VERDICT r1 item 9).

Covers suffix classes the old two-level hand list could not express:
wildcard rules (*.ck, *.bd), exception rules (!www.ck,
!city.kawasaki.jp), and 3-label rules (act.edu.au) — plus injectability
and hypothesis properties.
"""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from crawler_spark.psl import PublicSuffixList, default_psl
from crawler_spark.urltools import registrable_domain


@pytest.mark.parametrize(
    "host,expected",
    [
        # plain gTLD (implicit '*' rule)
        ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("a.b.c.example.com", "example.com"),
        ("example.unlistedtld", "example.unlistedtld"),
        # two-level ccTLD suffixes
        ("www.example.co.uk", "example.co.uk"),
        ("deep.sub.example.co.uk", "example.co.uk"),
        ("shop.example.com.cn", "example.com.cn"),
        ("x.example.com.eg", "example.com.eg"),
        ("x.example.gob.mx", "example.gob.mx"),
        # CLASS: 3-label rules (not expressible as two-level pairs)
        ("school.act.edu.au", "school.act.edu.au"),
        ("www.school.act.edu.au", "school.act.edu.au"),
        ("plainschool.edu.au", "plainschool.edu.au"),
        # CLASS: wildcard rules — every label under the TLD is a suffix
        ("foo.bar.ck", "foo.bar.ck"),
        ("a.foo.bar.ck", "foo.bar.ck"),
        ("x.y.bd", "x.y.bd"),
        ("w.x.y.bd", "x.y.bd"),
        # CLASS: exception rules override the wildcard
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        ("city.kawasaki.jp", "city.kawasaki.jp"),
        ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
        # wildcard sibling of the exception still behaves as wildcard:
        # other.kawasaki.jp IS a public suffix, so one more label is the
        # registrable domain
        ("other.kawasaki.jp", "other.kawasaki.jp"),
        ("a.other.kawasaki.jp", "a.other.kawasaki.jp"),
        ("b.a.other.kawasaki.jp", "a.other.kawasaki.jp"),
        # case/trailing-dot normalization
        ("WWW.Example.CO.UK", "example.co.uk"),
        ("www.example.com.", "example.com"),
        # single label (no dots)
        ("localhost", "localhost"),
        # CLASS: rules only in the FULL upstream list (absent from the
        # former 426-rule curated subset — VERDICT r2 "What's missing" #3)
        ("x.school.pvt.k12.ma.us", "school.pvt.k12.ma.us"),  # 4-label ICANN
        ("a.shop.com.eg", "shop.com.eg"),
        ("x.example.com.bn", "example.com.bn"),
        # PRIVATE-section rules: distinct registrants on shared infra get
        # distinct politeness budgets (the 100 TB fairness argument)
        ("a.user.github.io", "user.github.io"),
        ("x.myblog.blogspot.com", "myblog.blogspot.com"),
        ("obj.bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ],
)
def test_registrable_domain_psl_classes(host, expected):
    assert default_psl().registrable_domain(host) == expected


def test_full_upstream_list_loaded():
    """Guard against regressing to a curated subset: the full upstream
    list has >9000 rules; the old subset had 426."""
    p = default_psl()
    assert len(p.rules) + len(p.exceptions) > 5000


def test_urltools_accepts_full_urls():
    assert registrable_domain("https://a.b.example.co.uk/p?q=1") == "example.co.uk"
    assert registrable_domain("http://sub.city.kawasaki.jp/") == "city.kawasaki.jp"
    assert registrable_domain("") is None
    assert registrable_domain(None) is None


def test_public_suffix_exposed():
    p = default_psl()
    assert p.public_suffix("www.example.co.uk") == "co.uk"
    assert p.public_suffix("foo.bar.ck") == "bar.ck"
    assert p.public_suffix("www.ck") == "ck"  # exception strips one label
    assert p.public_suffix("sub.city.kawasaki.jp") == "kawasaki.jp"


def test_injectable_rule_set():
    custom = PublicSuffixList(["zz", "corp.zz", "// comment", "", "!open.corp.zz"])
    assert custom.registrable_domain("a.b.corp.zz") == "b.corp.zz"
    assert custom.registrable_domain("open.corp.zz") == "open.corp.zz"
    assert custom.registrable_domain("x.open.corp.zz") == "open.corp.zz"
    # rules unknown to the custom list fall back to the implicit '*'
    assert custom.registrable_domain("www.example.co.uk") == "co.uk"


_LABEL = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)


@given(st.lists(_LABEL, min_size=1, max_size=5))
def test_registrable_domain_is_suffix_and_idempotent(labels):
    host = ".".join(labels)
    rd = default_psl().registrable_domain(host)
    assert rd is not None
    # the registrable domain is always a dot-boundary suffix of the host
    assert host == rd or host.endswith("." + rd)
    # idempotence: re-extracting from the registrable domain is a no-op
    assert default_psl().registrable_domain(rd) == rd


@given(st.lists(_LABEL, min_size=1, max_size=3))
def test_subdomains_share_registrable_domain(labels):
    base = ".".join(labels) + ".example.co.uk"
    assert default_psl().registrable_domain(base) == "example.co.uk"
