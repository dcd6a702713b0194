"""The fast regex parser must be byte-for-byte identical to the
transliterated byte-at-a-time parser — on the corpus and on random
fuzz-ish inputs (keyword-dictionary-guided like the reference's fuzzer,
fuzz/keywords.dict)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from texting_robots_spark.conformance import CORPUS
from texting_robots_spark.robots_core import parse_robots_txt, parse_robots_txt_slow


def test_identical_on_corpus():
    for case in CORPUS:
        data = case.robots.replace(b"\x00", b"\n")
        assert parse_robots_txt(data) == parse_robots_txt_slow(data), case.case_id


_KEYWORDS = [
    b"user-agent",
    b"User-Agent",
    b"useragent",
    b"user agent",
    b"allow",
    b"Allow",
    b"disallow",
    b"Disallow",
    b"dissallow",
    b"disalow",
    b"sitemap",
    b"site-map",
    b"site map",
    b"crawl-delay",
    b"Crawl-Delay",
    b"crawldelay",
    b":",
    b" ",
    b"\t",
    b"\n",
    b"\r",
    b"\r\n",
    b"#",
    b"/",
    b"*",
    b"$",
    b"1.5",
    b"-2",
    b"inf",
    b"nan",
    b"\xef\xbb\xbf",
    b"\xef",
    b"\xc3\xb1",
    b"\xff",
    b"%aa",
]


@settings(max_examples=1500, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(_KEYWORDS),
            st.binary(max_size=6),
        ),
        max_size=24,
    )
)
def test_identical_on_fuzzed_inputs(parts):
    data = b"".join(parts)
    assert parse_robots_txt(data) == parse_robots_txt_slow(data), repr(data)


# --- scan_statements: the '\r'-free one-sweep statement scanner ---------

from texting_robots_spark.robots_core import RAW, scan_statements


def test_scan_equals_parse_on_corpus():
    for case in CORPUS:
        data = case.robots.replace(b"\x00", b"\n")
        if b"\r" in data:
            continue  # scanner contract: '\r'-free bodies only
        want = [ln for ln in parse_robots_txt(data) if ln[0] != RAW]
        assert scan_statements(data) == want, case.case_id


@settings(max_examples=1500, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from([k for k in _KEYWORDS if b"\r" not in k]),
            st.binary(max_size=6).filter(lambda b: b"\r" not in b),
        ),
        max_size=24,
    )
)
def test_scan_equals_parse_on_fuzzed_inputs(parts):
    data = b"".join(parts).replace(b"\x00", b"\n")
    want = [ln for ln in parse_robots_txt(data) if ln[0] != RAW]
    assert scan_statements(data) == want, repr(data)
