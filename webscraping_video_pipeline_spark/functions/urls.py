"""C1 — URL canonicalization + hashing (SURVEY.md §2.9 C1).

Reference semantic preserved: URLs/paths are compared as exact strings for
dedup (reference ``enhanced_batch_processor.py:515``,
``orchestrator/pipeline.py:158``); the engine canonicalizes first so that
trivially-distinct spellings of one resource dedup together, then keys
everything on ``xxhash64(canon_url)`` (JVM-side, whole-stage codegen).

Canonicalization rules (pinned; stdlib urllib, IDNA host):

- scheme + host lowercased, host IDNA-encoded;
- default ports stripped (``:80`` http, ``:443`` https);
- fragment dropped; trailing lone ``?`` dropped;
- query parameters sorted by (key, value), preserved otherwise;
- empty path becomes ``/``.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# query fast path: every segment is k=v over urlencode's always-safe
# alphabet (letters digits _.~-). For such queries parse_qsl's unquoting is
# the identity ('%' and '+' are not in the alphabet) and urlencode's
# quote_plus re-quoting is the identity too, so
# urlencode(sorted(parse_qsl(q))) == '&'.join('='.join(kv) for kv in
# sorted(seg.split('=', 1))) — byte-equal, ~3x cheaper. Anything else
# (encoded chars, blank keys, empty segments, bare keys) takes the full
# urllib path.
_SAFE_QUERY_RE = re.compile(
    r"[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*(?:&[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*)*"
)


def canonicalize_url(url: str | None) -> str | None:
    """Pure single-value canonicalization — the oracle code path."""
    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        # idna fast path: for a pure-ascii host the codec either returns the
        # label unchanged (len 1-63) or raises (empty/too-long label), and
        # the except-branch keeps the host unchanged — so the result is
        # always `host` itself; skip the codec round trip entirely.
        if host and not host.isascii():
            try:
                host = host.encode("idna").decode("ascii")
            except (UnicodeError, UnicodeDecodeError):
                pass  # keep the lowercased host as-is
        port = parts.port
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc = f"{host}:{port}"
        path = parts.path or "/"
        q = parts.query
        if not q:
            query = ""
        elif _SAFE_QUERY_RE.fullmatch(q):
            query = "&".join(
                "=".join(kv) for kv in sorted(seg.split("=", 1) for seg in q.split("&"))
            )
        else:
            query = urlencode(sorted(parse_qsl(q, keep_blank_values=True)))
        return urlunsplit((scheme, netloc, path, query, ""))
    except ValueError:
        return url


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_url)


def host_of(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None


@F.pandas_udf(T.StringType())
def host_of_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


def host_col(canon_url: Column) -> Column:
    """Host of an already-canonical URL, JVM-side (no Python round trip).

    Safe only on canonical URLs (lowercased host, no userinfo); the general
    case goes through :func:`host_of_udf`.
    """
    return F.regexp_extract(canon_url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def url_hash_col(canon_url: Column) -> Column:
    """xxhash64 of the canonical URL — the engine-wide dedup key (north_rule)."""
    return F.xxhash64(canon_url)
