"""Conformance corpus against the pure-Python core.

Every enabled behavioral test from the reference suite
(/root/reference/src/test.rs, test_repcpp.rs, tests/integration_test.rs)
runs here via the shared data corpus in texting_robots_spark.conformance.
"""

import pytest

from texting_robots_spark.conformance import CORPUS, UNSET
from texting_robots_spark.robots_core import Robot, RobotsParseError


@pytest.mark.parametrize("case", CORPUS, ids=[c.case_id for c in CORPUS])
def test_corpus_case(case):
    if case.parse_error:
        with pytest.raises(RobotsParseError):
            Robot(case.agent, case.robots)
        return
    r = Robot(case.agent, case.robots)
    for url, expected in case.allowed:
        assert r.allowed(url) == expected, f"{case.case_id}: allowed({url!r})"
    if case.delay is not UNSET:
        assert r.delay == case.delay, f"{case.case_id}: delay"
    if case.sitemaps is not None:
        assert r.sitemaps == case.sitemaps, f"{case.case_id}: sitemaps"
