"""prepare_url_fast must be EXACTLY prepare_url — property-tested with
hypothesis plus every URL in the conformance corpus."""

from hypothesis import given, settings
from hypothesis import strategies as st

from texting_robots_spark.conformance import CORPUS
from texting_robots_spark.urltools import prepare_url, prepare_url_fast

ALL_CORPUS_URLS = sorted({u for c in CORPUS for u, _ in c.allowed})


def test_fast_equals_slow_on_corpus_urls():
    for u in ALL_CORPUS_URLS:
        assert prepare_url_fast(u) == prepare_url(u), u


def test_fast_equals_slow_on_tricky_cases():
    cases = [
        "",
        "/",
        "https://h",
        "https://h/",
        "https://h?q=1",
        "https://h#f",
        "https://h/a/../b",
        "https://h/a/./b",
        "https://h/a/%2e%2e/b",
        "https://h/a b",
        "https://h/a'b?c'd",
        "https://h/{x}^`",
        "https://u:p@h:8080/p?q#f",
        "https://h:80/p",
        "http://h:bad/p",
        "HTTPS://H/P",
        "https:////h/p",
        "https://h\\p\\q",
        "mailto:x@y",
        "ipfs://etc/",
        "https://h/ツ",
        "https://h/%E3%83%84",
        "relative/path",
        "https://[::1]/p",
        "https://h/p|q~!;,()*+",
        "https://h/p?a=1&b=2#frag?more#more",
    ]
    for u in cases:
        assert prepare_url_fast(u) == prepare_url(u), u


@settings(max_examples=2000, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x17F),
        max_size=60,
    )
)
def test_fast_equals_slow_on_random_tails(tail):
    for prefix in ("https://host.example", "http://h", ""):
        u = prefix + tail
        assert prepare_url_fast(u) == prepare_url(u), repr(u)


# --- batched prepare: one finditer sweep must equal the per-row fn ------

from texting_robots_spark.urltools import prepare_urls_batch


def test_batch_equals_fast_on_corpus_urls():
    batch = prepare_urls_batch(ALL_CORPUS_URLS)
    assert batch == [prepare_url_fast(u) for u in ALL_CORPUS_URLS]


def test_batch_handles_newlines_and_empties():
    urls = ["https://h/a", "bad\nurl", "", "https://h", "rel/p", "https://h/a b"]
    assert prepare_urls_batch(urls) == [prepare_url_fast(u) for u in urls]
    assert prepare_urls_batch([]) == []


@settings(max_examples=500, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x17F),
            max_size=40,
        ).map(lambda t: "https://host.example" + t),
        max_size=20,
    )
)
def test_batch_equals_fast_property(urls):
    assert prepare_urls_batch(urls) == [prepare_url_fast(u) for u in urls]


# --- batched canonicalize: the fast-line sweep must equal the per-row fn

from texting_robots_spark.urltools import canonicalize_url, canonicalize_urls_batch


def test_canonicalize_batch_equals_per_row_on_edges():
    cases = [
        "https://host.example/p/1",            # fast path: identity
        "https://a.b//x",                      # empty segment -> fallback
        "https://a.b/./x",                     # dot segment -> fallback
        "https://a.b/x/..",
        "https://a",                           # no path -> fallback ('/' added)
        "HTTPS://A.example/x",                 # uppercase -> fallback
        "https://a.example:80/x",              # explicit port -> fallback
        "https://a.example:443/x",
        "https://u:p@a.example/x",             # credentials stripped
        "https://a.example/x?b=2&a=1#f",       # query sort + frag strip
        "https://a.example/x?",                # empty query dropped
        "https://a.example/x y",               # needs encoding
        "https://xn--x.example/päth",     # non-ASCII
        "ftp://a.example/x",                   # non-http(s) -> None
        "relative/path",
        "",
        None,
        3.14,                                  # non-string -> None
    ]
    got = canonicalize_urls_batch(cases)
    exp = [canonicalize_url(u) if isinstance(u, str) else None for u in cases]
    assert got == exp


def test_canonicalize_batch_handles_embedded_newlines():
    urls = ["https://h.example/a", "bad\nurl", "https://h.example/b"]
    got = canonicalize_urls_batch(urls)
    assert got == [canonicalize_url(u) for u in urls]


@settings(max_examples=2000, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x17F),
        max_size=60,
    )
)
def test_canonicalize_batch_equals_per_row_property(tail):
    urls = [
        "https://host.example" + tail,
        "https://host.example/" + tail,
        tail,
    ]
    got = canonicalize_urls_batch(urls)
    assert got == [canonicalize_url(u) for u in urls], repr(tail)
