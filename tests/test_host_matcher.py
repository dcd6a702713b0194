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


def test_budget_cases_raise():
    for case in CORPUS:
        if case.parse_error:
            with pytest.raises(RobotsParseError):
                compile_robots(case.agent, case.robots)
