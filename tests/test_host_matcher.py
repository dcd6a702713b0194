"""HostMatcher (the gate's fused-alternation matcher) must agree with the
pure-Python Robot on the entire conformance corpus — same semantics, two
execution strategies."""

import pytest

from texting_robots_spark.conformance import CORPUS
from texting_robots_spark.functions.udfs import HostMatcher
from texting_robots_spark.robots_core import RobotsParseError, compile_robots
from texting_robots_spark.urltools import prepare_url

CASES = [c for c in CORPUS if c.allowed and not c.parse_error]


@pytest.mark.parametrize("case", CASES, ids=[c.case_id for c in CASES])
def test_host_matcher_matches_corpus(case):
    rules, _delay, _sitemaps = compile_robots(case.agent, case.robots)
    matcher = HostMatcher(rules)
    for url, expected in case.allowed:
        assert matcher.allowed(prepare_url(url)) == expected, (
            f"{case.case_id}: allowed({url!r})"
        )


def test_leading_star_path_matches_reference_quirk():
    """minregex.rs:97: when the matched TEXT starts with '*', the first
    '*'-segment of a starred pattern is NOT start-anchored. Reachable only
    via relative/odd URLs (prepare_url of a relative URL passes it
    through). Both the pure-Python Robot and the Spark HostMatcher must
    reproduce it."""
    from texting_robots_spark.robots_core import Robot

    body = b"User-agent: *\nDisallow: /a*b\n"
    robot = Robot("BobBot", body)
    rules, _d, _s = compile_robots("BobBot", body)
    matcher = HostMatcher(rules)
    cases = [
        ("*zz/aXXb", False),  # unanchored first segment: '/a' found mid-text
        ("*b", True),         # '/a' occurs nowhere -> no match -> allowed
        ("/aXb", False),      # canonical path: anchored, matches
        ("/zz/aXb", True),    # canonical path: anchored, '/a' not at start
    ]
    for path, expected in cases:
        assert robot.allowed(path) == expected, f"Robot({path!r})"
        assert matcher.allowed(prepare_url(path)) == expected, (
            f"HostMatcher({path!r})"
        )


def test_budget_cases_raise():
    for case in CORPUS:
        if case.parse_error:
            with pytest.raises(RobotsParseError):
                compile_robots(case.agent, case.robots)


def test_allowed_batch_equals_allowed_on_corpus():
    """The batched multiline-finditer path must agree with the per-row
    path (and therefore with Robot) on every corpus case, plus specials
    mixed into one batch."""
    import numpy as np

    for case in CASES:
        rules, _d, _s = compile_robots(case.agent, case.robots)
        matcher = HostMatcher(rules)
        paths = [prepare_url(u) for u, _ in case.allowed]
        # salt the batch with the special paths
        paths += ["/robots.txt", "*zz/aXXb", "/"]
        got = matcher.allowed_batch(paths)
        want = np.array([matcher.allowed(p) for p in paths])
        assert (got == want).all(), case.case_id


# --- hypothesis differential: guard dispatch vs per-rule scan -----------

from hypothesis import given, settings
from hypothesis import strategies as st

from texting_robots_spark.robots_core import RulePattern

_PAT_ALPHA = "/ab*$%2Ee.-?&"
_PATH_ALPHA = "/abXe%2E.?&$*"


@settings(max_examples=400, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=_PAT_ALPHA, max_size=8),
            st.booleans(),
        ),
        max_size=12,
    ),
    st.lists(st.text(alphabet=_PATH_ALPHA, min_size=1, max_size=10), max_size=8),
)
def test_guard_dispatch_equals_rule_scan(rules, paths):
    """For ANY rule list (precedence-sorted like compile_robots) and ANY
    path, the guard-dispatched HostMatcher must agree with the direct
    first-match RulePattern scan (the reference semantics)."""
    rules = sorted(set(rules), key=lambda r: (-len(r[0]), not r[1]))
    try:
        compiled = [(RulePattern(p), a) for p, a in rules]
    except Exception:
        return  # over-budget patterns are rejected at compile time
    matcher = HostMatcher(rules)

    def ref(path):
        if path == "/robots.txt":
            return True
        for rp, a in compiled:
            if rp.is_match(path):
                return a
        return True

    for path in paths:
        assert matcher.allowed(path) == ref(path), (rules, path)
    if paths:
        got = list(matcher.allowed_batch(paths))
        assert got == [ref(p) for p in paths]
