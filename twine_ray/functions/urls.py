"""URI normalization (SURVEY.md §2.2 M3).

Ray-native analog of Twine's liburi-based graph-URI derivation and
normalization (``twine:plug-ins/s3.c`` key->URI mapping; liburi
normalize): lowercase scheme/host, strip default ports, normalize
percent-encoding, collapse an empty path to '/'.

``normalize_url`` is the partition key of the whole pipeline (page
bucket = hash(normalize_url(url))), so it must be a deterministic pure
function.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")

# RFC 3986 unreserved characters: never need percent-encoding.
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _norm_pct(component: str) -> str:
    """Decode %XX escapes of unreserved chars; uppercase the hex of the rest."""

    def _one(m: re.Match) -> str:
        byte = int(m.group(1), 16)
        ch = chr(byte)
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(_one, component)


def normalize_url(url: str) -> str:
    """Normalize a URL into Twine's graph-URI canonical form.

    Rules (frozen; this is the pipeline partition key):
    - strip surrounding whitespace
    - scheme and host lowercased
    - default port stripped (http:80, https:443, ftp:21)
    - percent-encoding normalized in path/query/fragment (decode
      unreserved, uppercase remaining hex)
    - empty path with an authority becomes '/'
    - malformed URLs are returned whitespace-stripped but otherwise
      unchanged (never raise)
    """
    # ASCII-only strip: str.strip() would also eat Unicode whitespace
    # (e.g. U+0085) that a prior pass can expose, breaking idempotence.
    url = url.strip(" \t\r\n\f\v")
    if not url:
        return url
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    if netloc:
        host = parts.hostname or ""
        host = host.lower()
        # urlsplit().hostname strips the brackets off IPv6 literals;
        # re-wrap so the rebuilt URL stays valid (and the partition key
        # stable) for hosts like [::1]:8080 (ADVICE.md round 1)
        if ":" in host and not host.startswith("["):
            host = f"[{host}]"
        userinfo = ""
        if parts.username is not None:
            userinfo = parts.username
            if parts.password is not None:
                userinfo += ":" + parts.password
            userinfo += "@"
        try:
            port = parts.port
        except ValueError:
            port = None
        port_s = ""
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            port_s = f":{port}"
        netloc = f"{userinfo}{host}{port_s}"
    path = _norm_pct(parts.path)
    if netloc and not path:
        path = "/"
    query = _norm_pct(parts.query)
    fragment = _norm_pct(parts.fragment)
    return urlunsplit((scheme, netloc, path, query, fragment))
