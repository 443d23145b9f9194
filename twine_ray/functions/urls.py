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


# ---------------------------------------------------------------------------
# RFC 3986 reference resolution (for Turtle @base / RDF-XML xml:base /
# SPARQL BASE).  Twine delegates this to liburi/librdf
# (twine:libtwine/rdf.c); here it is the spec algorithm directly —
# §5.2.4 remove_dot_segments + §5.3 recomposition, STRICT mode (a
# same-scheme reference is still a reference).
# ---------------------------------------------------------------------------

_IRI_SPLIT_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.-]*):)?(?://([^/?#]*))?([^?#]*)"
    r"(?:\?([^#]*))?(?:#(.*))?$",
    re.DOTALL,
)


def _split_iri(iri: str):
    """RFC 3986 appendix-B split; unlike urlsplit it never lowercases
    or validates — resolution must preserve the reference verbatim."""
    m = _IRI_SPLIT_RE.match(iri)
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), \
        m.group(5)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = path[2:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = path[3:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            cut = path.find("/", 1)
            if cut == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:cut])
                path = path[cut:]
    return "".join(out)


def _merge_paths(base_auth, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.3 merge."""
    if base_auth is not None and not base_path:
        return "/" + ref_path
    cut = base_path.rfind("/")
    if cut == -1:
        return ref_path
    return base_path[: cut + 1] + ref_path


def resolve_iri(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.2 (strict).
    Pure and deterministic; neither input is normalized or validated —
    garbage in, the spec's garbage out (librdf behaves the same)."""
    r_scheme, r_auth, r_path, r_query, r_frag = _split_iri(ref)
    b_scheme, b_auth, b_path, b_query, _ = _split_iri(base)
    if r_scheme is not None:
        scheme, auth = r_scheme, r_auth
        path, query = remove_dot_segments(r_path), r_query
    elif r_auth is not None:
        scheme, auth = b_scheme, r_auth
        path, query = remove_dot_segments(r_path), r_query
    elif not r_path:
        scheme, auth, path = b_scheme, b_auth, b_path
        query = r_query if r_query is not None else b_query
    else:
        scheme, auth = b_scheme, b_auth
        if r_path.startswith("/"):
            path = remove_dot_segments(r_path)
        else:
            path = remove_dot_segments(
                _merge_paths(b_auth, b_path, r_path)
            )
        query = r_query
    out = ""
    if scheme is not None:
        out += scheme + ":"
    if auth is not None:
        out += "//" + auth
    out += path
    if query is not None:
        out += "?" + query
    if r_frag is not None:
        out += "#" + r_frag
    return out
