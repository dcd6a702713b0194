"""spark-robots-frontier: PySpark-native URL-frontier + fetch scheduler.

Robots gate semantics reproduce the reference Texting Robots library
(/root/reference, Smerity/texting_robots v0.2.2); see SURVEY.md.
"""

from .robots_core import (
    Robot,
    RobotsParseError,
    RulePattern,
    compile_robots,
    parse_robots_txt,
)
from .urltools import canonicalize_url, get_robots_url, prepare_url, UrlParseError

__all__ = [
    "Robot",
    "RobotsParseError",
    "RulePattern",
    "parse_robots_txt",
    "compile_robots",
    "canonicalize_url",
    "get_robots_url",
    "prepare_url",
    "UrlParseError",
]
