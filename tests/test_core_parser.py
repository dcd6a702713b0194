"""Line-parser unit tests ported from the reference
(/root/reference/src/test.rs:12-82, 1091-1203 — exact Line-vector goldens)."""

from texting_robots_spark.robots_core import (
    ALLOW,
    DELAY,
    DISALLOW,
    RAW,
    SITEMAP,
    UA,
    Robot,
    RulePattern,
    parse_robots_txt,
    percent_encode,
)


def test_parser_line_elements():
    txt = (
        b"User-Agent: SmerBot\n"
        b"Disallow: /path\n"
        b"Allow:    /path/exception   # ONLY THIS IS ALLOWED\n"
        b"Crawl-delay : 60 # Very slow delay\n"
        b"\n"
        b"sitemap: https://example.com/sitemap.xml"
    )
    assert parse_robots_txt(txt) == [
        (UA, b"SmerBot"),
        (DISALLOW, b"/path"),
        (ALLOW, b"/path/exception"),
        (DELAY, 60.0),
        (RAW, b""),
        (SITEMAP, b"https://example.com/sitemap.xml"),
    ]


def test_parser_crawl_delay():
    assert parse_robots_txt(b"    crawl-delay  : 60") == [(DELAY, 60.0)]
    assert parse_robots_txt(b"    crawl-delay  : 3.16") == [(DELAY, 3.16)]
    assert parse_robots_txt(b"    crawl-delay  : 0.0") == [(DELAY, 0.0)]
    # negative delay: not a CrawlDelay line (falls through to Raw)
    (line,) = parse_robots_txt(b"    crawl-delay  : -1.618")
    assert line[0] == RAW
    # garbage delay: Raw
    (line,) = parse_robots_txt(b"Crawl-delay: wait")
    assert line[0] == RAW


def test_empty_disallow_becomes_allow_all():
    assert parse_robots_txt(b"Disallow:") == [(ALLOW, b"/")]
    assert parse_robots_txt(b"Disallow:   # nothing") == [(ALLOW, b"/")]


def test_lines_correctly_counted():
    base = (
        "User-Agent: foo\n"
        "            Allow: /some/path\n"
        "            User-Agent: bar\n"
        "            \n"
        "            \n"
        "            Disallow: /"
    )
    for ending in ("\n", "\r\n"):
        txt = base.replace("\n", ending).encode()
        lines = parse_robots_txt(txt)
        assert len(lines) == 6
        assert sum(1 for k, _ in lines if k in (UA, ALLOW, DISALLOW)) == 4

    lines = parse_robots_txt((base + "\n").encode())
    assert len(lines) == 6
    assert sum(1 for k, _ in lines if k in (UA, ALLOW, DISALLOW)) == 4

    # mixed \n and \r\n
    txt = b"User-Agent: foo\nAllow: /some/path\r\nUser-Agent: bar\n\r\n\nDisallow: /\n"
    lines = parse_robots_txt(txt)
    assert len(lines) == 6
    assert sum(1 for k, _ in lines if k in (UA, ALLOW, DISALLOW)) == 4


def test_utf8_bom_is_skipped():
    for bom in (b"\xef\xbb\xbf", b"\xef\xbb", b"\xef"):
        lines = parse_robots_txt(bom + b"User-Agent: foo\nAllow: /AnyValue\n")
        assert lines == [(UA, b"foo"), (ALLOW, b"/AnyValue")]

    # broken BOM leaves one broken (Raw) line
    lines = parse_robots_txt(b"\xef\x11\xbfUser-Agent: foo\nAllow: /AnyValue\n")
    assert lines == [(RAW, b"\x11\xbfUser-Agent: foo"), (ALLOW, b"/AnyValue")]

    # BOM in the middle of the file is NOT skipped
    lines = parse_robots_txt(b"User-Agent: foo\n\xef\xbb\xbfAllow: /AnyValue\n")
    assert lines == [(UA, b"foo"), (RAW, b"\xef\xbb\xbfAllow: /AnyValue")]


def test_star_rule_simplifier_golden():
    # test.rs:306-330 — collapsed matcher form is "/x*y/"
    r = Robot("BobBot", b"Disallow: /x***y/")
    assert not r.allowed("/x/y/")
    assert len(r.rules) == 1
    assert r.rules[0][0].as_str() == "/x*y/"
    # the ORIGINAL pattern (used for precedence length) keeps its stars
    assert r.rules[0][0].pattern == "/x***y/"


def test_percent_encode_goldens():
    assert percent_encode("/á") == "/%C3%A1"
    assert percent_encode("/%aa") == "/%aa"
    assert percent_encode("/a b") == "/a%20b"
    assert percent_encode('/<">`') == "/%3C%22%3E%60"
    assert percent_encode("/plain?q=1&x=２") == "/plain?q=1&x=%EF%BC%92"


def test_rule_pattern_tiers():
    assert RulePattern("/plain").as_str() == "/plain"
    assert RulePattern("/a*b").as_str() == "/a*b"
    assert RulePattern("/a**b").as_str() == "/a*b"
    assert RulePattern("/a$").as_str() == "^/a\\Z"
    p = RulePattern("/fish*$")
    assert p.is_match("/fish") and p.is_match("/fishy")
    assert not p.is_match("/shark/fish")
