"""URL parsing/normalization helpers (WHATWG-flavored, dependency-free).

Covers three distinct operations the engine needs:

- ``prepare_url``     — path[?query][#fragment] slice used for robots
                        matching (reference lib.rs:504-518; keeps query
                        AND fragment, golden tests test.rs:1206-1240)
- ``get_robots_url``  — robots.txt URL derivation (reference lib.rs:284-312;
                        http/https only, strips credentials, keeps
                        non-default ports — test_get_robots_url.rs)
- ``canonicalize_url``— engine-specific canonical form for the URL-seen
                        set / url_hash (north_rule: lowercase host,
                        scheme/port normalization, sorted query, fragment
                        strip). NOT the same as prepare_url.

Implemented by hand (not urllib) because the reference follows the WHATWG
URL model: existing %xx stays verbatim, non-ASCII is UTF-8
percent-encoded, fragments are preserved for robots matching, and default
ports are dropped at parse time.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

__all__ = [
    "prepare_url",
    "prepare_url_fast",
    "prepare_urls_batch",
    "get_robots_url",
    "canonicalize_url",
    "split_absolute",
    "UrlParseError",
]


class UrlParseError(ValueError):
    """URL cannot be parsed / is unsuitable (mirrors the reference's
    error returns from get_robots_url, lib.rs:288-295)."""


_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):(.*)$", re.DOTALL)
_SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}
_DEFAULT_PORTS = {"http": 80, "https": 443}


def _encode_with(text: str, extra: frozenset) -> str:
    """Percent-encode UTF-8 bytes: controls, DEL, non-ASCII, and ``extra``
    ASCII chars. '%' is never encoded (existing sequences stay verbatim)."""
    out = []
    for b in text.encode("utf-8"):
        if b <= 0x1F or b >= 0x7F or chr(b) in extra:
            out.append("%%%02X" % b)
        else:
            out.append(chr(b))
    return "".join(out)


# WHATWG percent-encode sets (fragment ⊂ path ⊂ ...), '%' excluded everywhere
_FRAGMENT_SET = frozenset(' "<>`')
_PATH_SET = _FRAGMENT_SET | frozenset("#?{}^")
_QUERY_SET = frozenset(' "<>#') | frozenset("'")


# single-dot / double-dot segment forms, compared lowercase so every
# %2e / %2E case mix is covered (WHATWG matches case-insensitively)
_DOT1 = (".", "%2e")
_DOT2 = ("..", "%2e.", ".%2e", "%2e%2e")


def _remove_dot_segments(path: str) -> str:
    """WHATWG/RFC3986 dot-segment removal over a '/'-separated path."""
    if "." not in path and "%2e" not in path and "%2E" not in path:
        # no literal dot AND no percent-encoded dot ('/%2e%2e/' contains
        # no '.' at all) -> nothing to resolve
        return path
    output = []
    for seg in path.split("/"):
        low = seg.lower()
        if low in _DOT1:
            continue
        if low in _DOT2:
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # preserve a trailing slash when the last segment was '.'/'..'
    last = path.rsplit("/", 1)[-1].lower()
    if (last in _DOT1 or last in _DOT2) and (not output or output[-1] != ""):
        output.append("")
    result = "/".join(output)
    if not result.startswith("/"):
        result = "/" + result
    return result


class SplitUrl(NamedTuple):
    scheme: str
    userinfo: str
    host: str
    port: Optional[int]
    path: str
    query: Optional[str]
    fragment: Optional[str]


def _split_non_special(scheme: str, rest: str, url: str) -> SplitUrl:
    """Non-special scheme (foo:, mailto:, ipfs:, ...) per WHATWG/rust-url:
    a '//' prefix introduces a real authority (so 'foo://h/admin' has
    path '/admin', not '//h/admin'); otherwise the remainder is an opaque
    path percent-encoded with the C0 set (controls + non-ASCII only)."""
    # query/fragment split applies in both forms
    frag: Optional[str] = None
    query: Optional[str] = None
    hash_at = rest.find("#")
    if hash_at != -1:
        frag = rest[hash_at + 1 :]
        rest = rest[:hash_at]
    q_at = rest.find("?")
    if q_at != -1:
        query = rest[q_at + 1 :]
        rest = rest[:q_at]
    if rest[:2] == "//":
        # authority form: host may be empty and is opaque (not lowercased
        # beyond scheme rules); '\\' is NOT a separator for non-special
        j = 2
        while j < len(rest) and rest[j] != "/":
            j += 1
        authority = rest[2:j]
        tail = rest[j:]
        userinfo, sep, hostport = authority.rpartition("@")
        if not sep:
            hostport = authority
            userinfo = ""
        host, _, port_s = hostport.partition(":")
        port: Optional[int] = None
        if port_s:
            if not (port_s.isascii() and port_s.isdigit()):
                raise UrlParseError(f"invalid port in {url!r}")
            port = int(port_s)
            if port > 65535:
                raise UrlParseError(f"port out of range in {url!r}")
        path = _remove_dot_segments(tail) if tail else ""
        path = _encode_with(path, _PATH_SET)
        return SplitUrl(scheme, userinfo, host, port, path, query, frag)
    # opaque path: C0 percent-encode set = controls/DEL/non-ASCII only
    return SplitUrl(
        scheme, "", "", None, _encode_with(rest, frozenset()), query, frag
    )


def split_absolute(url: str) -> Optional[SplitUrl]:
    """Split an absolute special-scheme URL into normalized components.

    Returns None when ``url`` has no scheme (i.e. is relative). Raises
    UrlParseError for an unusable authority (empty host, bad port).
    Non-special schemes (mailto:, ipfs:, ...) are returned with an empty
    host and the remainder as an opaque path.
    """
    m = _SCHEME_RE.match(url)
    if m is None:
        return None
    scheme = m.group(1).lower()
    rest = m.group(2)
    if scheme not in _SPECIAL_SCHEMES:
        return _split_non_special(scheme, rest, url)
    # special scheme: skip any run of slashes/backslashes, then authority
    i = 0
    while i < len(rest) and rest[i] in "/\\":
        i += 1
    j = i
    while j < len(rest) and rest[j] not in "/\\?#":
        j += 1
    authority = rest[i:j]
    tail = rest[j:]
    # userinfo: everything before the LAST '@'
    userinfo, sep, hostport = authority.rpartition("@")
    if not sep:
        hostport = authority
        userinfo = ""
    # host[:port] — minimal IPv6 bracket support
    if hostport.startswith("["):
        close = hostport.find("]")
        if close == -1:
            raise UrlParseError(f"invalid IPv6 host in {url!r}")
        host = hostport[: close + 1]
        port_s = hostport[close + 1 :]
        if port_s.startswith(":"):
            port_s = port_s[1:]
        elif port_s:
            raise UrlParseError(f"invalid authority in {url!r}")
    else:
        host, _, port_s = hostport.partition(":")
    if not host:
        raise UrlParseError(f"empty host in {url!r}")
    port: Optional[int] = None
    if port_s:
        # ASCII digits only: str.isdigit() accepts Unicode digits like
        # '¹' which int() rejects (found by hypothesis)
        if not (port_s.isascii() and port_s.isdigit()):
            raise UrlParseError(f"invalid port in {url!r}")
        port = int(port_s)
        if port > 65535:
            raise UrlParseError(f"port out of range in {url!r}")
        if port == _SPECIAL_SCHEMES[scheme]:
            port = None  # WHATWG drops the scheme-default port at parse time
    host = host.lower()
    if not host.isascii():
        # IDNA/punycode (rust-url applies UTS46): per-label so empty
        # labels (trailing dots) pass through like the reference
        try:
            host = ".".join(
                lab if lab.isascii() else lab.encode("idna").decode("ascii")
                for lab in host.split(".")
            )
        except UnicodeError:
            raise UrlParseError(f"invalid IDNA host in {url!r}") from None
    # split path / query / fragment
    frag: Optional[str] = None
    query: Optional[str] = None
    hash_at = tail.find("#")
    if hash_at != -1:
        frag = tail[hash_at + 1 :]
        tail = tail[:hash_at]
    q_at = tail.find("?")
    if q_at != -1:
        query = tail[q_at + 1 :]
        tail = tail[:q_at]
    path = tail.replace("\\", "/")
    path = _remove_dot_segments(path) if path else "/"
    path = _encode_with(path, _PATH_SET)
    return SplitUrl(scheme, userinfo, host, port, path, query, fragment=frag)


def prepare_url(raw_url: str) -> str:
    """Extract ``path[?query][#fragment]`` for robots matching
    (reference lib.rs:504-518).

    Absolute URLs are parsed and serialized from the path onward (the
    WHATWG serialization percent-encodes as needed but leaves existing
    %xx verbatim); anything unparseable is treated as an
    already-relative URL and percent-encoded as-is; empty input is '/'.
    """
    if raw_url == "":
        return "/"
    try:
        parts = split_absolute(raw_url)
    except UrlParseError:
        parts = None
    if parts is None:
        # relative: percent-encode with the reference's FRAGMENT set
        return _encode_with(raw_url, _FRAGMENT_SET)
    out = parts.path
    if parts.query is not None:
        out += "?" + _encode_with(parts.query, _QUERY_SET)
    if parts.fragment is not None:
        out += "#" + _encode_with(parts.fragment, _FRAGMENT_SET)
    return out


# Fast path for prepare_url: a special-scheme URL whose authority has no
# userinfo/port/brackets and whose tail contains only characters that no
# percent-encode set touches and no dot segments serializes to exactly
# its raw tail. Tail character class = printable ASCII minus the union of
# the path/query/fragment encode sets (space " ' < > \\ ^ ` { }).
_FAST_URL_RE = re.compile(
    # authority must be ASCII: non-ASCII hosts go through the full parser
    # (IDNA, or the reference's percent-encode fallback on parse failure)
    r"^(?:https?|wss?|ftp)://[\x21-\x22\x24-\x2e\x30-\x39\x3b-\x3e\x41-\x5a\x5e-\x7e]+"
    r"([/?#][\x21\x23-\x26\x28-\x3b\x3d\x3f-\x5b\x5d\x5f\x61-\x7a\x7c\x7e]*)?$",
    # ASCII flag: without it, IGNORECASE makes [a-z] match e.g. 'İ'
    re.IGNORECASE | re.ASCII,
)


def prepare_url_fast(url: str) -> str:
    """Exact-equivalent of prepare_url with a no-allocation fast path for
    plain ASCII absolute URLs (the overwhelmingly common case in a
    frontier); anything unusual falls back to the full parser. Property-
    tested equal to prepare_url."""
    m = _FAST_URL_RE.match(url)
    if m is None:
        return prepare_url(url)
    tail = m.group(1)
    if tail is None:
        return "/"
    if "/." in tail or "%2e" in tail or "%2E" in tail:
        return prepare_url(url)  # possible dot segments -> full parser
    return tail if tail[0] == "/" else "/" + tail


# Batched variant of _FAST_URL_RE: per-line under re.MULTILINE, with the
# authority class additionally excluding '\n' and a catch-all (.*) second
# alternative so every line yields exactly one match — group(1) = tail of
# a fast-path URL, group(2) set when the line needs the full parser.
_FAST_URL_LINE_RE = re.compile(
    r"^(?:(?:https?|wss?|ftp)://[\x21-\x22\x24-\x2e\x30-\x39\x3b-\x3e\x41-\x5a\x5e-\x7e]+"
    r"([/?#][\x21\x23-\x26\x28-\x3b\x3d\x3f-\x5b\x5d\x5f\x61-\x7a\x7c\x7e]*)?"
    r"|(.*))$",
    re.IGNORECASE | re.ASCII | re.MULTILINE,
)


def prepare_urls_batch(urls) -> list:
    """``[prepare_url_fast(u) for u in urls]`` as ONE C-level regex sweep.

    Joins the batch with '\\n' and runs a single multiline finditer: the
    per-row Python cost drops to iterating match objects (the gate UDF's
    hot loop). Rows whose line hits the catch-all (odd scheme/authority,
    chars needing encoding, embedded newline batches) fall back to the
    per-row function. Property-tested equal to prepare_url_fast."""
    urls = list(urls)
    if not urls:
        return []
    joined = "\n".join(urls)
    if joined.count("\n") != len(urls) - 1:  # a URL contains '\n'
        return [prepare_url_fast(u) for u in urls]
    out: list = []
    append = out.append
    slow = prepare_url_fast
    i = 0
    for m in _FAST_URL_LINE_RE.finditer(joined):
        tail = m.group(1)
        if tail is not None:
            if "/." in tail or "%2e" in tail or "%2E" in tail:
                append(slow(urls[i]))  # possible dot segments
            else:
                append(tail if tail[0] == "/" else "/" + tail)
        elif m.group(2) is not None:
            append(slow(urls[i]))  # odd URL -> full parser
        else:
            append("/")  # fast URL with no tail at all
        i += 1
    if i != len(urls):  # desync (defensive) -> per-row
        return [slow(u) for u in urls]
    return out


def get_robots_url(url: str) -> str:
    """Derive the robots.txt URL (reference lib.rs:284-312).

    Requires an absolute http/https URL; strips username/password; keeps
    any non-default port; joins '/robots.txt'. Raises UrlParseError
    otherwise (relative input, wrong scheme, empty host, bad port).
    """
    parts = split_absolute(url)
    if parts is None:
        raise UrlParseError(f"relative URL cannot be a base: {url!r}")
    if parts.scheme not in ("http", "https"):
        raise UrlParseError(f"unsupported scheme for robots.txt: {url!r}")
    netloc = parts.host
    if parts.port is not None:
        netloc += f":{parts.port}"
    return f"{parts.scheme}://{netloc}/robots.txt"


# Fast-path line for canonicalize_urls_batch: a URL that serializes to
# ITSELF under canonicalize_url — lowercase http(s) scheme, lowercase
# ASCII reg-name host (no port, no credentials, no IP-literal brackets),
# a '/'-rooted path over unreserved-ish chars with no '%', no query, no
# fragment. Anything else (and any "/." dot-segment shape, checked
# outside the regex) falls back to the full parser. The catch-all (.*)
# second alternative makes every line yield exactly one match, like
# _FAST_URL_LINE_RE above. Property-tested equal to the per-row form.
_CANON_FAST_LINE_RE = re.compile(
    r"^(?:(https?://[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?/[A-Za-z0-9\-._~/!$&'()*+,;=:@]*)"
    r"|(.*))$",
    re.ASCII | re.MULTILINE,
)


def canonicalize_urls_batch(urls) -> list:
    """``[canonicalize_url(u) for u in urls]`` with the already-canonical
    majority case handled by ONE multiline regex sweep (the same trick
    as prepare_urls_batch): a crawl frontier's links are overwhelmingly
    plain lowercase absolute URLs that canonicalize to themselves, and
    the per-row parser costs ~5us vs ~1us for a C-level line match.
    Non-strings map to None; odd lines (uppercase, ports, queries,
    fragments, percent-escapes, dot segments, embedded newlines) take
    the exact per-row path. Property-tested equal to canonicalize_url.
    """
    urls = list(urls)
    if not urls:
        return []
    strs = [u if isinstance(u, str) else "" for u in urls]
    joined = "\n".join(strs)
    if joined.count("\n") != len(urls) - 1:  # a URL contains '\n'
        return [
            canonicalize_url(u) if isinstance(u, str) else None for u in urls
        ]
    out: list = []
    append = out.append
    i = 0
    for m in _CANON_FAST_LINE_RE.finditer(joined):
        g = m.group(1)
        if g is not None and "/." not in g and "//" not in g[8:]:
            append(g)
        else:
            u = urls[i]
            append(canonicalize_url(u) if isinstance(u, str) else None)
        i += 1
    if i != len(urls):  # desync (defensive) -> per-row
        return [
            canonicalize_url(u) if isinstance(u, str) else None for u in urls
        ]
    return out


def canonicalize_url(url: str) -> Optional[str]:
    """Canonical URL for the seen-set hash (north_rule): lowercase
    scheme/host, default port dropped, dot-segments resolved, query
    params sorted (stable for equal keys), fragment stripped.

    Returns None for relative / non-http(s) / unparseable input —
    callers drop such links from the frontier.
    """
    try:
        parts = split_absolute(url.strip())
    except UrlParseError:
        return None
    if parts is None or parts.scheme not in ("http", "https"):
        return None
    netloc = parts.host
    if parts.port is not None:
        netloc += f":{parts.port}"
    out = f"{parts.scheme}://{netloc}{parts.path}"
    if parts.query:
        params = sorted(parts.query.split("&"))
        out += "?" + _encode_with("&".join(params), _QUERY_SET)
    return out
