"""Conformance corpus: the reference's enabled unit tests, ported as data.

Sources (reference /root/reference):
- src/test.rs            (Smerity + Google robotstxt + reppy ports + CC/fuzz)
- src/test_repcpp.rs     (seomoz/rep-cpp ports)
- tests/integration_test.rs (10 real-world robots.txt in fixtures/robots/)

The two reppy tests the reference deliberately disables
(test.rs:468-485 grouping-unknown-keys, test.rs:554-561 skips-malformed-line)
are excluded here too.

Each Case carries one robots.txt + agent and every assertion the original
test made (allow/deny per URL, crawl delay, sitemaps, parse error). The
same corpus drives the pure-Python core tests AND the Spark-gate tests
(as a DataFrame), so both backends are held to identical semantics.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

_FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "robots")

UNSET = object()  # sentinel: "this case does not assert delay"


@dataclass(frozen=True)
class Case:
    case_id: str
    origin: str  # smerity | cc | fuzz | reppy | repcpp | rfc | forgive | google | realworld
    robots: bytes
    agent: str
    allowed: Sequence[Tuple[str, bool]] = ()
    delay: object = UNSET  # Optional[float] when asserted
    sitemaps: Optional[List[str]] = None
    parse_error: bool = False


def _real(name: str) -> bytes:
    with open(os.path.join(_FIXTURES, name), "rb") as f:
        return f.read()


def _crazy_long_line() -> bytes:
    # test.rs:240-251 — 1 MB "Disallow: /AAAA..." line. No '*'/'$' so the
    # reference compiles it as a plain prefix rule; parse succeeds.
    return b"Disallow: /" + b"AAAAAAAAAA" * 100_000


def _fuzzed_long_regex(statement: bytes) -> bytes:
    # test.rs:372-387 — ~4 KB rule with '*'s and a trailing '$' forces the
    # full-regex tier past the 42 KiB compile budget -> parse error.
    crash = bytearray(statement + b"A" * 4096 + b"*$")
    crash[10] = ord("*")
    crash[30] = ord("*")
    return bytes(crash)


def build_corpus() -> List[Case]:
    cases: List[Case] = []
    add = cases.append

    # ------------------------------------------------------------------
    # src/test.rs — Smerity unit tests
    # ------------------------------------------------------------------
    txt = (
        b"User-agent: *\n"
        b"        User-agent: BobBot\n"
        b"        User-AGENT: SmerBot"
    )
    add(Case("all_user_agents", "smerity", txt, "SmerBot", [("/index.html", True)]))

    txt = (
        b"User-Agent: A\n"
        b"        Crawl-Delay: 42\n"
        b"        # A B and the other Agent ...\n"
        b"        User-Agent: B\n"
        b"        User-Agent: C\n"
        b"        Crawl-Delay: 420\n"
        b"        User-Agent: D\n"
        b"        Crawl-Delay: -1.25\n"
        b"        User-Agent: E\n"
        b"        Crawl-Delay: 8\n"
        b"        User-Agent: *\n"
        b"        CRAWL-Delay : 3600\n"
        b"        User-Agent: Zero\n"
        b"        Crawl-Delay: 0"
    )
    add(Case("retrieve_crawl_delay/A", "smerity", txt, "A", delay=42.0))
    add(Case("retrieve_crawl_delay/B", "smerity", txt, "B", delay=420.0))
    add(Case("retrieve_crawl_delay/C", "smerity", txt, "C", delay=420.0))
    # D falls through to E's 8 (invalid -1.25 line became Raw and was dropped)
    add(Case("retrieve_crawl_delay/D", "smerity", txt, "D", delay=8.0))
    add(Case("retrieve_crawl_delay/Zero", "smerity", txt, "Zero", delay=0.0))

    txt = (
        b"User-Agent: A\n"
        b"        Crawl-Delay:1.0\n"
        b"        User-Agent: B\n"
        b"        Crawl-Delay:4.2\n"
        b"        User-Agent: C\n"
        b"        Crawl-Delay: \x41\xc2\xc3\xb1\x42"
    )
    add(Case("crawl_delay_not_integer/A", "smerity", txt, "A", delay=1.0))
    add(Case("crawl_delay_not_integer/B", "smerity", txt, "B", delay=4.2))
    add(Case("crawl_delay_not_integer/C", "smerity", txt, "C", delay=None))

    txt = (
        b"User-Agent: A\n"
        b"        Allow: \x41\xc2\xc3\xb1\x42\n"
        b"        Disallow: \x41\xc2\xc3\xb1\x42\n"
        b"        SiteMap: \x41\xc2\xc3\xb1\x42\n"
        b"        Crawl-Delay: \x41\xc2\xc3\xb1\x42\n"
        b"        Disallow: /bob/"
    )
    add(
        Case(
            "crawl_evil_utf8",
            "smerity",
            txt,
            "A",
            [("/bob/", False)],
            delay=None,
            sitemaps=[],
        )
    )

    txt = (
        b"user-agent: otherbot\n"
        b"        disallow: /kale\n"
        b"\n"
        b"        sitemap: https://example.com/sitemap.xml\n"
        b"        Sitemap: https://cdn.example.org/other-sitemap.xml\n"
        + "        siteMAP: https://ja.example.org/テスト-サイトマップ.xml".encode("utf-8")
    )
    sm = [
        "https://example.com/sitemap.xml",
        "https://cdn.example.org/other-sitemap.xml",
        "https://ja.example.org/テスト-サイトマップ.xml",
    ]
    add(Case("retrieve_sitemaps/named", "smerity", txt, "otherbot", sitemaps=sm))
    add(Case("retrieve_sitemaps/other", "smerity", txt, "blah", sitemaps=sm))

    txt = (
        b"User-Agent: Y\n"
        b"        Crawl-Delay: "
        b"115792089237316195423570985008687907853269984665640564039457584007913129639936"
    )
    add(Case("excessive_crawl_delay", "smerity", txt, "Y", delay=float(2**256)))

    txt = (
        b"Crawl-Delay: 42\n"
        b"        User-Agent: *\n"
        b"        Disallow: /blah\n"
        b"        User-Agent: SpecialFriend\n"
        b"        Allow: /\n"
        b"        Crawl-Delay: 1"
    )
    add(Case("starts_with_crawl_delay/other", "smerity", txt, "BobBot", delay=42.0))
    add(Case("starts_with_crawl_delay/friend", "smerity", txt, "SpecialFriend", delay=1.0))

    txt = (
        b"User-Agent: *\n"
        b"        \x00\x00Allow: /family\x00\x00\n"
        b"        Disallow: /family/photos\x00\x00\x00\n"
        b"        Crawl-Delay: 42"
    )
    add(
        Case(
            "handles_random_nulls",
            "smerity",
            txt,
            "BobBot",
            [("/family", True), ("/family/photos", False)],
            delay=42.0,
        )
    )

    txt = b"User-Agent: *\n        Disallow: /\n        Allow: /(Cat|Dog).html"
    add(
        Case(
            "doesnt_do_full_regex",
            "smerity",
            txt,
            "BobBot",
            [("/(Cat|Dog).html", True), ("/Cat.html", False)],
        )
    )

    add(
        Case(
            "crazy_long_prefix_line_parses",
            "smerity",
            _crazy_long_line(),
            "BobBot",
            [("/" + "AAAAAAAAAA" * 100_000 + "B", False), ("/B", True)],
        )
    )

    txt = (
        b"User-Agent: *\n"
        b"        Disallow: /\n"
        b"        Disallow: /*/about\n"
        b"        Allow: /about$"
    )
    add(
        Case(
            "handles_end_properly",
            "smerity",
            txt,
            "BobBot",
            [("https://quora.com/about", True), ("/about/", False)],
        )
    )

    # CC burn-test regressions -----------------------------------------
    txt = (
        b"\r\n"
        b"        User-agent: *\r\r\n"
        b"        Disallow: /en-AU/party\r\r\r\n\n\r\n\n"
        b"        User-Agent: BobBot\n"
        b"        Disallow: /fi-FI/party\r\r\n\n"
        b"        Disallow: /en-US/party\r\r\n\n"
        b"        \r\n\r\r\r\n\n\n"
        b"        Crawl-Delay: 4"
    )
    add(Case("double_return_newline/random", "cc", txt, "RandomBot", [("/en-AU/party", False)]))
    add(
        Case(
            "double_return_newline/bob",
            "cc",
            txt,
            "BobBot",
            [("/en-AU/party", True), ("/fi-FI/party", False), ("/en-US/party", False)],
            delay=4.0,
        )
    )

    txt = (
        b"User-agent: *\n"
        b"        Disallow: /basket*\n"
        b"        # Longest string takes priority. This is necessary due to conflicting Allow rules:\n"
        b"        Disallow: /*?" + b"*" * 72 + b"donotindex=1*"
    )
    add(
        Case(
            "crazy_long_regex",
            "cc",
            txt,
            "BobBot",
            [
                ("/basket", False),
                ("/basket/ball", False),
                ("/example/file?xyz=42", True),
                ("/example/file?xyz=42&donotindex=1", False),
            ],
        )
    )

    add(
        Case(
            "starts_with_wildcard/1",
            "smerity",
            b"Disallow: *",
            "BobBot",
            [("/", False), ("/a", False)],
        )
    )
    txt = b"Allow: *\n        Disallow: *y\n        Disallow: */a/*.html"
    add(
        Case(
            "starts_with_wildcard/2",
            "smerity",
            txt,
            "BobBot",
            [("/", True), ("/b", True), ("bob/a/home.html", False), ("/gray", False)],
        )
    )

    txt = (
        b"User-agent: *\n"
        b"        Allow: /ocean\n"
        b"        Disallow: /tooth$\n"
        b"        Disallow: /fish*$"
    )
    add(
        Case(
            "handles_starting_position",
            "smerity",
            txt,
            "BobBot",
            [
                ("/ocean", True),
                ("/fish", False),
                ("/shark/tooth", True),
                ("/tooth", False),
                ("/toothy", True),
                ("/shark/fish", True),
                ("/fish/fins", False),
                ("/fishy", False),
            ],
        )
    )

    # fuzzer regressions -------------------------------------------------
    add(
        Case(
            "fuzzed_long_regex/allow",
            "fuzz",
            _fuzzed_long_regex(b"Allow:*"),
            "BobBot",
            parse_error=True,
        )
    )
    add(
        Case(
            "fuzzed_long_regex/disallow",
            "fuzz",
            _fuzzed_long_regex(b"Disallow:*"),
            "BobBot",
            parse_error=True,
        )
    )

    # ------------------------------------------------------------------
    # reppy ports (test.rs:405-561, enabled set only)
    # ------------------------------------------------------------------
    txt = b"User-agent: *\n        Disallow: */test"
    add(
        Case(
            "reppy_leading_wildcard",
            "reppy",
            txt,
            "BobBot",
            [("/test", False), ("/test/", False), ("/foo/test", False), ("/foo", True)],
        )
    )

    txt = b"Disallow: /path\n        Allow: /path/exception\n        Crawl-delay: 7"
    add(
        Case(
            "reppy_no_leading_user_agent",
            "reppy",
            txt,
            "agent",
            [("/path/exception", True), ("/path", False), ("/", True)],
            delay=7.0,
        )
    )

    txt = b"User-agent: *\n        Disallow: /tmp\n\n        User-agent: other-agent\n        Allow: /tmp"
    add(Case("reppy_honours_default", "reppy", txt, "agent", [("/tmp", False), ("/path", True)]))

    txt = b"User-agent: *\n        Disallow: /tmp\n\n        User-agent: agent\n        Allow: /tmp"
    add(Case("reppy_honours_specific", "reppy", txt, "agent", [("/tmp", True), ("/path", True)]))

    txt = b"User-agent: one\n        User-agent: two\n        Disallow: /tmp"
    add(Case("reppy_grouping/one", "reppy", txt, "one", [("/tmp", False)]))
    add(Case("reppy_grouping/two", "reppy", txt, "two", [("/tmp", False)]))

    txt = b"User-agent: one\n        Crawl-delay: 1\n\n        User-agent: two\n        Crawl-delay: 2"
    add(Case("reppy_separates_agents/one", "reppy", txt, "one", delay=1.0))
    add(Case("reppy_separates_agents/two", "reppy", txt, "two", delay=2.0))

    txt = b"            Sitemap: http://a.com/sitemap.xml\n        Sitemap: http://b.com/sitemap.xml"
    add(
        Case(
            "reppy_sitemaps",
            "reppy",
            txt,
            "agent",
            sitemaps=["http://a.com/sitemap.xml", "http://b.com/sitemap.xml"],
        )
    )

    txt = b"User-agent: Agent\n        Disallow: /path"
    add(Case("reppy_case_insensitivity/lower", "reppy", txt, "agent", [("/path", False)]))
    add(Case("reppy_case_insensitivity/mixed", "reppy", txt, "AGeNT", [("/path", False)]))

    add(
        Case(
            "reppy_empty_allows_all",
            "reppy",
            b"",
            "agent",
            [("/", True), ("/foo", True), ("/foo/bar", True)],
            delay=None,
            sitemaps=[],
        )
    )

    txt = (
        b"User-Agent: *  # comment saying it's the default agent\n"
        b"        Allow: /\n"
        b"        Disallow: /foo"
    )
    add(
        Case(
            "reppy_comments",
            "reppy",
            txt,
            "agent",
            [("/", True), ("/foo", False), ("/foo/bar", False)],
        )
    )
    add(
        Case(
            "reppy_accepts_full_url",
            "reppy",
            txt,
            "agent",
            [
                ("https://example.com/", True),
                ("https://example.com/foo", False),
                ("https://example.com/foo/bar", False),
                ("https://example.com/found", True),
            ],
        )
    )

    # ------------------------------------------------------------------
    # RFC 9309 example (test.rs:569-631)
    # ------------------------------------------------------------------
    rfc = (
        b"# /robots.txt for http://www.fict.org/\n"
        b"        # comments to webmaster@fict.org\n"
        b"\n"
        b"        User-agent: unhipbot\n"
        b"        Disallow: /\n"
        b"\n"
        b"        User-agent: webcrawler\n"
        b"        User-agent: excite\n"
        b"        Disallow:\n"
        b"\n"
        b"        User-agent: *\n"
        b"        Disallow: /org/plans.html\n"
        b"        Allow: /org/\n"
        b"        Allow: /serv\n"
        b"        Allow: /~mak\n"
        b"        Disallow: /"
    )
    rfc_targets = [
        "/",
        "/index.html",
        "/server.html",
        "/services/fast.html",
        "/services/slow.html",
        "/orgo.gif",
        "/org/about.html",
        "/org/plans.html",
        "/%7Ejim/jim.html",
        "/~mak/mak.html",
    ]
    add(
        Case(
            "rfc_example/unhipbot",
            "rfc",
            rfc,
            "unhipbot",
            [("/robots.txt", True)] + [(t, False) for t in rfc_targets],
        )
    )
    for agent in ("webcrawler", "excite"):
        add(
            Case(
                f"rfc_example/{agent}",
                "rfc",
                rfc,
                agent,
                [("/robots.txt", True)] + [(t, True) for t in rfc_targets],
            )
        )
    add(
        Case(
            "rfc_example/anything",
            "rfc",
            rfc,
            "anything",
            [
                ("/robots.txt", True),
                ("/", False),
                ("/index.html", False),
                ("/server.html", True),
                ("/services/fast.html", True),
                ("/services/slow.html", True),
                ("/orgo.gif", False),
                ("/org/about.html", True),
                ("/org/plans.html", False),
                ("/%7Ejim/jim.html", False),
                ("/~mak/mak.html", True),
            ],
        )
    )

    # ------------------------------------------------------------------
    # forgiveness suite (test.rs:633-713)
    # ------------------------------------------------------------------
    txt = b"user-agent: FooBot\n        disallow /\n"
    add(Case("forgive_no_colon", "forgive", txt, "FooBot", [("/", False), ("/foo", False)]))

    txt = (
        b"user-agent: FooBot\n"
        b"        disallow: /a\n"
        b"        dissallow: /b\n"
        b"        dissalow: /c\n"
        b"        disalow: /d\n"
        b"        diasllow: /e\n"
        b"        disallaw: /f\n"
    )
    add(
        Case(
            "forgive_disallow_variations",
            "forgive",
            txt,
            "FooBot",
            [(p, False) for p in ["/a", "/b", "/c", "/d", "/e", "/f"]],
        )
    )

    txt = b"user-agent: FooBot\n        disallow:/a\n        dissallow/b\n        disallow    /c\n"
    add(
        Case(
            "forgive_not_too_forgiving",
            "forgive",
            txt,
            "FooBot",
            [("/a", False), ("/b", True), ("/c", False)],
        )
    )

    txt = b"user-agent: FooBot\n        site-map: /a\n        sitemap: /b\n        site map: /c\n"
    add(Case("forgive_sitemap_variations", "forgive", txt, "FooBot", sitemaps=["/a", "/b", "/c"]))

    txt = (
        b"user-agent: FooBot\n"
        b"        crawl-delay: 42\n"
        b"        user-agent: BobBot\n"
        b"        crawl delay: 420\n"
        b"        user-agent: EveBot\n"
        b"        crawldelay: 360\n"
    )
    add(Case("forgive_delay_variations/foo", "forgive", txt, "FooBot", delay=42.0))
    add(Case("forgive_delay_variations/bob", "forgive", txt, "BobBot", delay=420.0))
    add(Case("forgive_delay_variations/eve", "forgive", txt, "EveBot", delay=360.0))

    txt = (
        b"user-agent: FooBot\n"
        b"        disallow: /a\n"
        b"        user agent: BobBot\n"
        b"        disallow: /b\n"
        b"        useragent: EveBot\n"
        b"        disallow: /e\n"
    )
    add(Case("forgive_ua_variations/foo", "forgive", txt, "FooBot", [("/a", False)]))
    add(Case("forgive_ua_variations/bob", "forgive", txt, "BobBot", [("/b", False)]))
    add(Case("forgive_ua_variations/eve", "forgive", txt, "EveBot", [("/e", False)]))

    # ------------------------------------------------------------------
    # Google robotstxt ports (test.rs:715-1088)
    # ------------------------------------------------------------------
    txt = b"foo: FooBot\n        bar: /\n"
    add(Case("google_foo_bar", "google", txt, "FooBot", [("/", True), ("/foo", True)]))

    txt = b"user-agent FooBot\n        disallow /\n"
    add(Case("google_no_colon", "google", txt, "FooBot", [("/", False)]))

    txt = (
        b"allow: /foo/bar/\n"
        b"\n"
        b"        user-agent: FooBot\n"
        b"        disallow: /\n"
        b"        allow: /x/\n"
        b"        user-agent: BarBot\n"
        b"        disallow: /\n"
        b"        allow: /y/\n"
        b"\n"
        b"\n"
        b"        allow: /w/\n"
        b"        user-agent: BazBot\n"
        b"\n"
        b"        user-agent: FooBot\n"
        b"        allow: /z/\n"
        b"        disallow: /"
    )
    add(
        Case(
            "google_grouping/foo",
            "google",
            txt,
            "FooBot",
            [
                ("http://foo.bar/x/b", True),
                ("http://foo.bar/z/d", True),
                ("http://foo.bar/y/c", False),
                ("http://foo.bar/foo/bar/", False),
            ],
        )
    )
    add(
        Case(
            "google_grouping/bar",
            "google",
            txt,
            "BarBot",
            [
                ("http://foo.bar/y/c", True),
                ("http://foo.bar/w/a", True),
                ("http://foo.bar/z/d", False),
                ("http://foo.bar/foo/bar/", False),
            ],
        )
    )
    add(
        Case(
            "google_grouping/baz",
            "google",
            txt,
            "BazBot",
            [("http://foo.bar/z/d", True), ("http://foo.bar/foo/bar/", False)],
        )
    )

    txt = (
        b"User-agent: BarBot\n"
        b"        Sitemap: https://foo.bar/sitemap\n"
        b"        User-agent: *\n"
        b"        Disallow: /"
    )
    add(Case("google_grouping_other_rules/1foo", "google", txt, "FooBot", [("http://foo.bar/", False)]))
    add(Case("google_grouping_other_rules/1bar", "google", txt, "BarBot", [("http://foo.bar/", False)]))
    txt = (
        b"User-agent: FooBot\n"
        b"        Invalid-Unknown-Line: unknown\n"
        b"        User-agent: *\n"
        b"        Disallow: /\n"
    )
    add(Case("google_grouping_other_rules/2foo", "google", txt, "FooBot", [("http://foo.bar/", False)]))
    add(Case("google_grouping_other_rules/2bar", "google", txt, "BarBot", [("http://foo.bar/", False)]))

    txt = (
        b"USER-AGENT: FooBot\n"
        b"        ALLOW: /x/\n"
        b"        DISALLOW: /\n"
        b"\n"
        b"        user-agent: BarBot\n"
        b"        allow: /x/\n"
        b"        disallow: /\n"
        b"\n"
        b"        uSeR-aGeNt: BAZBOT\n"
        b"        AlLoW: /x/\n"
        b"        dIsAlLoW: /"
    )
    for bot in ("FooBot", "BarBot", "BazBot"):
        add(
            Case(
                f"google_case_insensitive/{bot}",
                "google",
                txt,
                bot,
                [("http://foo.bar/x/y", True), ("http://foo.bar/a/b", False)],
            )
        )

    global_txt = b"user-agent: *\n        allow: /\n        user-agent: FooBot\n        disallow: /"
    add(Case("google_global_groups/foo", "google", global_txt, "FooBot", [("http://foo.bar/x/y", False)]))
    add(Case("google_global_groups/bar", "google", global_txt, "BarBot", [("http://foo.bar/x/y", True)]))
    specific = (
        b"user-agent: FooBot\n"
        b"        allow: /\n"
        b"        user-agent: BarBot\n"
        b"        disallow: /\n"
        b"        user-agent: BazBot\n"
        b"        disallow: /"
    )
    add(Case("google_global_groups/qux", "google", specific, "QuxBot", [("http://foo.bar/x/y", True)]))

    txt = b"user-agent: FooBot\n        disallow: /x/"
    add(Case("google_value_case/lower", "google", txt, "FooBot", [("http://foo.bar/x/y", False)]))
    txt = b"user-agent: FooBot\n        disallow: /X/"
    add(Case("google_value_case/upper", "google", txt, "FooBot", [("http://foo.bar/x/y", True)]))

    add(
        Case(
            "google_longest_match/1",
            "google",
            b"user-agent: FooBot\n        disallow: /x/page.html\n        allow: /x/",
            "FooBot",
            [("http://foo.bar/x/page.html", False)],
        )
    )
    add(
        Case(
            "google_longest_match/2",
            "google",
            b"user-agent: FooBot\n        allow: /x/page.html\n        disallow: /x/",
            "FooBot",
            [("http://foo.bar/x/page.html", True), ("http://foo.bar/x/", False)],
        )
    )
    add(
        Case(
            "google_longest_match/3",
            "google",
            b"user-agent: FooBot\n        disallow: \n        allow: ",
            "FooBot",
            [("http://foo.bar/x/page.html", True)],
        )
    )
    add(
        Case(
            "google_longest_match/4",
            "google",
            b"user-agent: FooBot\n        disallow: /\n        allow: /",
            "FooBot",
            [("http://foo.bar/x/page.html", True)],
        )
    )
    add(
        Case(
            "google_longest_match/5",
            "google",
            b"user-agent: FooBot\n        disallow: /x\n        allow: /x/",
            "FooBot",
            [("http://foo.bar/x", False), ("http://foo.bar/x/", True)],
        )
    )
    add(
        Case(
            "google_longest_match/6",
            "google",
            b"user-agent: FooBot\n        disallow: /x/page.html\n        allow: /x/page.html",
            "FooBot",
            [("http://foo.bar/x/page.html", True)],
        )
    )
    add(
        Case(
            "google_longest_match/7",
            "google",
            b"user-agent: FooBot\n        allow: /page\n        disallow: /*.html",
            "FooBot",
            [("http://foo.bar/page.html", False), ("http://foo.bar/page", True)],
        )
    )
    add(
        Case(
            "google_longest_match/8",
            "google",
            b"user-agent: FooBot\n        allow: /x/page.\n        disallow: /*.html",
            "FooBot",
            [("http://foo.bar/x/page.html", True), ("http://foo.bar/x/y.html", False)],
        )
    )
    add(
        Case(
            "google_longest_match/9",
            "google",
            b"User-agent: *\n        Disallow: /x/\n        User-agent: FooBot\n        Disallow: /y/",
            "FooBot",
            [("http://foo.bar/x/page", True), ("http://foo.bar/y/page", False)],
        )
    )

    add(
        Case(
            "google_encoding/query",
            "google",
            b"User-agent: FooBot\n        Disallow: /\n"
            b"        Allow: /foo/bar?qux=taz&baz=http://foo.bar?tar&par",
            "FooBot",
            [("http://foo.bar/foo/bar?qux=taz&baz=http://foo.bar?tar&par", True)],
        )
    )
    add(
        Case(
            "google_encoding/utf8",
            "google",
            "User-agent: FooBot\n        Disallow: /\n        Allow: /foo/bar/ツ".encode("utf-8"),
            "FooBot",
            [
                ("http://foo.bar/foo/bar/ツ", True),
                ("http://foo.bar/foo/bar/%E3%83%84", True),
                ("/foo/bar/ツ", True),
                ("/foo/bar/%E3%83%84", True),
            ],
        )
    )
    add(
        Case(
            "google_encoding/pct",
            "google",
            b"User-agent: FooBot\n        Disallow: /\n        Allow: /foo/bar/%E3%83%84",
            "FooBot",
            [
                ("http://foo.bar/foo/bar/%E3%83%84", True),
                ("http://foo.bar/foo/bar/ツ", True),
            ],
        )
    )
    add(
        Case(
            "google_encoding/pct_ascii",
            "google",
            b"User-agent: FooBot\n        Disallow: /\n        Allow: /foo/bar/%62%61%7A",
            "FooBot",
            [
                ("http://foo.bar/foo/bar/baz", False),
                ("http://foo.bar/foo/bar/%62%61%7A", True),
            ],
        )
    )

    add(
        Case(
            "google_special_chars/wildcard",
            "google",
            b"User-agent: FooBot\n        Disallow: /foo/bar/quz\n        Allow: /foo/*/qux",
            "FooBot",
            [
                ("http://foo.bar/foo/bar/quz", False),
                ("http://foo.bar/foo/quz", True),
                ("http://foo.bar/foo//quz", True),
                ("http://foo.bar/foo/bax/quz", True),
            ],
        )
    )
    add(
        Case(
            "google_special_chars/dollar",
            "google",
            b"User-agent: FooBot\n        Disallow: /foo/bar$\n        Allow: /foo/bar/qux",
            "FooBot",
            [
                ("http://foo.bar/foo/bar", False),
                ("http://foo.bar/foo/bar/qux", True),
                ("http://foo.bar/foo/bar/", True),
                ("http://foo.bar/foo/bar/baz", True),
            ],
        )
    )
    add(
        Case(
            "google_special_chars/hash",
            "google",
            b"User-agent: FooBot\n        # Disallow: /\n        Disallow: /foo/quz#qux\n        Allow: /",
            "FooBot",
            [("http://foo.bar/foo/bar", True), ("http://foo.bar/foo/quz", False)],
        )
    )

    for i, rule in enumerate(["/fish", "/fish*"]):
        txt = f"user-agent: FooBot\n            disallow: /\n            allow: {rule}".encode()
        add(
            Case(
                f"google_docs/fish{i}",
                "google",
                txt,
                "FooBot",
                [
                    ("http://foo.bar/bar", False),
                    ("http://foo.bar/fish", True),
                    ("http://foo.bar/fish/salmon", True),
                    ("http://foo.bar/fishheads", True),
                    ("http://foo.bar/fishheads/yummy.html", True),
                    ("http://foo.bar/fish.html?id=anything", True),
                    ("http://foo.bar/Fish.asp", False),
                    ("http://foo.bar/catfish", False),
                    ("http://foo.bar/?id=fish", False),
                ],
            )
        )
    add(
        Case(
            "google_docs/fish_dir",
            "google",
            b"user-agent: FooBot\n        disallow: /\n        allow: /fish/",
            "FooBot",
            [
                ("http://foo.bar/fish/", True),
                ("http://foo.bar/fish/salmon", True),
                ("http://foo.bar/fish/?salmon", True),
                ("http://foo.bar/fish/salmon.html", True),
                ("http://foo.bar/fish/?id=anything", True),
                ("http://foo.bar/fish", False),
                ("http://foo.bar/fish.html", False),
                ("http://foo.bar/Fish/Salmon.html", False),
            ],
        )
    )
    add(
        Case(
            "google_docs/php",
            "google",
            b"user-agent: FooBot\n        disallow: /\n        allow: /*.php",
            "FooBot",
            [
                ("http://foo.bar/bar", False),
                ("http://foo.bar/filename.php", True),
                ("http://foo.bar/folder/filename.php", True),
                ("http://foo.bar//folder/any.php.file.html", True),
                ("http://foo.bar/filename.php/", True),
                ("http://foo.bar/index?f=filename.php/", True),
                ("http://foo.bar/php/", False),
                ("http://foo.bar/index?php", False),
                ("http://foo.bar/windows.PHP", False),
            ],
        )
    )
    add(
        Case(
            "google_docs/php_end",
            "google",
            b"user-agent: FooBot\n        disallow: /\n        allow: /*.php$",
            "FooBot",
            [
                ("http://foo.bar/bar", False),
                ("http://foo.bar/filename.php", True),
                ("http://foo.bar/folder/filename.php", True),
                ("http://foo.bar/filename.php?parameters", False),
                ("http://foo.bar/filename.php/", False),
                ("http://foo.bar/filename.php5", False),
                ("http://foo.bar/php/", False),
                ("http://foo.bar/filename?php", False),
                ("http://foo.bar/aaaphpaaa", False),
                ("http://foo.bar//windows.PHP", False),
            ],
        )
    )
    add(
        Case(
            "google_docs/fish_php",
            "google",
            b"user-agent: FooBot\n        disallow: /\n        allow: /fish*.php",
            "FooBot",
            [
                ("http://foo.bar/bar", False),
                ("http://foo.bar/fish.php", True),
                ("http://foo.bar/fishheads/catfish.php?parameters", True),
                ("http://foo.bar/Fish.PHP", False),
            ],
        )
    )

    add(
        Case(
            "google_precedence/1",
            "google",
            b"allow: /p\n        disallow: /",
            "BobBot",
            [("/page", True), ("http://example.com/page", True)],
        )
    )
    add(
        Case(
            "google_precedence/2",
            "google",
            b"allow: /folder\n        disallow: /folder",
            "BobBot",
            [("/folder", True), ("http://example.com/folder/page", True)],
        )
    )
    add(
        Case(
            "google_precedence/3",
            "google",
            b"allow: /page\n        disallow: /*.htm",
            "BobBot",
            [("/page.htm", False), ("http://example.com/page.htm", False)],
        )
    )
    add(
        Case(
            "google_precedence/4",
            "google",
            b"allow: /$\n        disallow: /",
            "BobBot",
            [("http://example.com/", True), ("http://example.com/page.htm", False)],
        )
    )

    # ------------------------------------------------------------------
    # rep-cpp ports (test_repcpp.rs)
    # ------------------------------------------------------------------
    txt = b"Disallow: /path\n        Allow: /path/exception\n        Crawl-delay: 5.2"
    add(
        Case(
            "repcpp_no_leading_ua",
            "repcpp",
            txt,
            "Agent",
            [("https://example.com/path/exception", True), ("https://example.com/path", False)],
            delay=5.2,
        )
    )
    add(Case("repcpp_malformed_delay", "repcpp", b"User-agent: *\n        Crawl-delay: word", "Agent", delay=None))
    add(Case("repcpp_empty", "repcpp", b"", "Agent", [("/", True)]))
    add(
        Case(
            "repcpp_full_url",
            "repcpp",
            b"User-Agent: agent\n        Disallow: /path;params?query",
            "Agent",
            [("http://userinfo@exmaple.com:10/path;params?query#fragment", False)],
        )
    )
    txt = (
        b"User-agent: meow\n"
        b"        Disallow: /\n"
        b"        Allow: ****/cats\n"
        b"        Allow: */kangaroos"
    )
    add(
        Case(
            "repcpp_leading_wildcard_allow",
            "repcpp",
            txt,
            "meow",
            [
                ("/kangaroo/zebra/cat/page.html", False),
                ("/cats.html", True),
                ("/cats/page.html", True),
                ("/get/more/cats/page.html", True),
                ("/kangaroos/page.html", True),
                ("/heaps/of/kangaroos/page.html", True),
                ("/kangaroosandkoalas/page.html", True),
            ],
        )
    )
    txt = (
        b"User-agent: meow\n"
        b"        Allow: /\n"
        b"        Disallow: ****/cats\n"
        b"        Disallow: */kangaroos"
    )
    add(
        Case(
            "repcpp_leading_wildcard_disallow",
            "repcpp",
            txt,
            "meow",
            [
                ("/kangaroo/zebra/cat/page.html", True),
                ("/cats.html", False),
                ("/cats/page.html", False),
                ("/get/more/cats/page.html", False),
                ("/kangaroos/page.html", False),
                ("/heaps/of/kangaroos/page.html", False),
                ("/kangaroosandkoalas/page.html", False),
            ],
        )
    )

    # ------------------------------------------------------------------
    # real-world integration corpus (tests/integration_test.rs)
    # ------------------------------------------------------------------
    hn = (
        b"User-Agent: *\n"
        b"        Disallow: /x?\n"
        b"        Disallow: /r?\n"
        b"        Disallow: /vote?\n"
        b"        Disallow: /reply?\n"
        b"        Disallow: /submitted?\n"
        b"        Disallow: /submitlink?\n"
        b"        Disallow: /threads?\n"
        b"        Crawl-delay: 30"
    )
    add(
        Case(
            "real/hn",
            "realworld",
            hn,
            "BobBot",
            [
                ("https://news.ycombinator.com/item?id=30611367", True),
                ("https://news.ycombinator.com/threads?id=Smerity", False),
                ("https://news.ycombinator.com/user?id=Smerity", True),
            ],
            delay=30.0,
        )
    )
    add(Case("real/reddit_008", "realworld", _real("reddit.robots.txt"), "008", [("https://www.reddit.com/r/rust/", False)]))
    add(
        Case(
            "real/reddit_bob",
            "realworld",
            _real("reddit.robots.txt"),
            "BobBot",
            [
                ("https://www.reddit.com/", True),
                ("https://www.reddit.com/r/rust/", True),
                ("https://www.reddit.com/posts/2020/", True),
                ("https://www.reddit.com/login", False),
                ("https://www.reddit.com/r/rust/.rss", True),
                ("https://www.reddit.com/sitemaps/2014.xml", True),
                ("https://www.reddit.com/r/rust/.json", False),
                ("https://www.reddit.com/r/rust/.xml", False),
                ("https://www.reddit.com/r/rust/?feed=simd", False),
            ],
        )
    )
    add(
        Case(
            "real/twitter_googlebot",
            "realworld",
            _real("twitter.robots.txt"),
            "GOOGLEBOT",
            [
                ("https://twitter.com/Smerity/following", False),
                ("https://twitter.com/halvarflake", True),
                ("https://twitter.com/search?q=%22Satoshi%20Nakamoto%22&src=trend_click", False),
                ("https://twitter.com/search?q=%23Satoshi&src=typed_query&f=top", True),
            ],
            delay=None,
        )
    )
    add(
        Case(
            "real/twitter_bob",
            "realworld",
            _real("twitter.robots.txt"),
            "BobBot",
            [
                ("https://twitter.com/Smerity/following", False),
                ("https://twitter.com/halvarflake", True),
                ("https://twitter.com/halvarflake/status/1501495664466927618", True),
                (
                    "https://twitter.com/halvarflake/status/1501495664466927618?s=20&t=7xv0WrBVxLVKo2OUCPn6OQ",
                    False,
                ),
                ("https://twitter.com/search?q=%23Satoshi&src=typed_query&f=top", True),
                ("/oauth", False),
            ],
            delay=1.0,
            sitemaps=["https://twitter.com/sitemap.xml"],
        )
    )
    add(
        Case(
            "real/quora",
            "realworld",
            _real("quora.robots.txt"),
            "BobBot",
            [
                ("https://quora.com/", True),
                ("https://quora.com/about", True),
                ("https://quora.com/about/", True),
                ("https://www.quora.com/about/tos", True),
                ("https://www.quora.com/challenges", True),
                ("https://www.quora.com/challenging", False),
                ("https://www.quora.com/What-is-the-saddest-part-of-being-a-programmer", False),
            ],
            delay=None,
        )
    )
    add(
        Case(
            "real/ebay",
            "realworld",
            _real("ebay.robots.txt"),
            "BobBot",
            [
                ("https://www.ebay.com/", True),
                ("https://www.ebay.com/signin", True),
                ("https://www.ebay.com/p/578453454", True),
                (
                    "https://www.ebay.com/b/HP-Z840-PC-Desktops-All-In-One-Computers/179/bn_89095575",
                    True,
                ),
                ("https://www.ebay.com/itm/124743368051", True),
                ("https://www.ebay.com/itm/124743368051,42", False),
                ("https://www.ebay.com/rewards", False),
                ("https://www.ebay.com/tickets/", False),
                ("https://www.ebay.com/today/", False),
                ("https://www.ebay.com/usr/bobby/all-follows", False),
                ("https://www.ebay.com/usr/smerity/followers", False),
                ("https://www.ebay.com/e/products?test", False),
            ],
            delay=None,
        )
    )
    add(
        Case(
            "real/substack",
            "realworld",
            _real("substack.robots.txt"),
            "BobBot",
            [
                ("https://substack.com/sign-in/", False),
                ("https://substack.com/publish", False),
                ("https://substack.com/embed", False),
            ],
            delay=None,
        )
    )
    add(
        Case(
            "real/cnet",
            "realworld",
            _real("cnet.robots.txt"),
            "BobBot",
            [
                (
                    "https://www.cnet.com/tech/mobile/homeland-security-details-new-tools-for-extracting-device-data-at-us-borders/",
                    True,
                )
            ],
            delay=None,
        )
    )
    add(
        Case(
            "real/ipwatchdog",
            "realworld",
            _real("ipwatchdog.robots.txt"),
            "BobBot",
            [
                (
                    "/2010/12/22/judge-kathleen-omalley-finally-confirmed-by-senate-for-cafc/id=13941/TEXT_IN_THE_MIDDLE_OF_THIS_%20%20http://inventivestep.net/2010/04/15/edward-dumont-nominated-to-federal-circuit/",
                    False,
                )
            ],
            delay=120.0,
        )
    )
    add(
        Case(
            "real/zillow",
            "realworld",
            _real("zillow.robots.txt"),
            "BobBot",
            [
                ("/homes/sanfrancisco/cbd/foreclosed/2021-12-01/", False),
                (
                    "/profiles/ProfileBorderTemplate,BOB,TRIES,HARD,TO,LIKE,ROBOTS,myzillow,AND,SO,ON,MyListingsTabulated.BUT.IT.IS.HARD.postings/ETC/ETC/owners/ETC/OwnersProfileUpsell.AND.SO.ON.DirectLink.sdirect",
                    False,
                ),
            ],
            delay=None,
        )
    )
    add(
        Case(
            "real/aviation_safety",
            "realworld",
            _real("aviation-safety.net.robots.txt"),
            "BobBot",
            [("/database/types/Douglas-DC-3/database/a/b/c/d/e/f/g/h/i/j/k/l", False)],
            delay=None,
        )
    )
    add(Case("real/sgppto_semrush", "realworld", _real("sgppto.robots.txt"), "SemrushBot", delay=60.0))
    add(
        Case(
            "real/sgppto_semrush_ba",
            "realworld",
            _real("sgppto.robots.txt"),
            "SemrushBot-BA",
            [("/", True), ("/events/action~agenda/", False)],
            delay=None,
        )
    )

    # --- engine regression: leading-'*' matched text -------------------
    # minregex.rs:97 — when the TEXT starts with '*', the first segment
    # of a starred pattern is NOT start-anchored. Reachable via relative
    # URL input (prepare passes it through). No upstream corpus case
    # covers it (found in round-1 advice), so this is ours.
    add(
        Case(
            "engine/leading_star_path",
            "fuzz",
            b"User-agent: *\nDisallow: /a*b\n",
            "BobBot",
            [
                ("*zz/aXXb", False),  # unanchored first segment matches
                ("*b", True),  # '/a' occurs nowhere -> allowed
                ("/aXb", False),  # canonical path: anchored match
                ("/zz/aXb", True),  # anchored: '/a' not at start
            ],
        )
    )

    return cases


CORPUS: List[Case] = build_corpus()
