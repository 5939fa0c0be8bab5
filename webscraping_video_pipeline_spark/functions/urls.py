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


# Vectorized fast-path shape (r6, guide §4.2: hand whole batches to
# vectorized ops, keep the scalar path for the tail): one regex admits only
# URLs whose canonicalization is expressible in pandas str ops with BYTE
# parity to canonicalize_url —
#   - scheme [A-Za-z][A-Za-z0-9+.-]*   (urlsplit's charset)
#   - pure-ASCII host [A-Za-z0-9.-]+   (no userinfo/brackets; the idna
#     fast path in canonicalize_url is a no-op for these)
#   - optional 1-4 digit port          (always a VALID port, so
#     urlsplit's .port cannot raise; int() drops leading zeros exactly
#     like urlsplit's port formatting)
#   - path with no '?'/'#'             (missing -> '/')
#   - optional query of 1-2 safe k=v segments (the _SAFE_QUERY_RE
#     alphabet; 2 segments are sorted by (key, value) with a vectorized
#     tuple compare — >=3 would need a per-row sort, so they fall back)
#   - optional fragment (dropped)
# Anything else — and any URL containing tab/CR/LF, which urlsplit strips
# mid-string — takes the scalar path. Parity is pinned by
# tests/test_urls.py (fuzz + the fast/slow boundary cases).
_FAST_URL_RE = re.compile(
    r"\A([A-Za-z][A-Za-z0-9+.\-]*)://"  # 1 scheme
    r"([A-Za-z0-9.\-]+)"  # 2 host
    r"(?::(\d{1,4}))?"  # 3 port
    r"(/[^?#]*)?"  # 4 path
    r"(?:\?([A-Za-z0-9_.~\-]+=[A-Za-z0-9_.~\-]*"  # 5 query (1-2 safe k=v)
    r"(?:&[A-Za-z0-9_.~\-]+=[A-Za-z0-9_.~\-]*)?))?"
    r"(?:#.*)?\Z",
    re.S,
)


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    import numpy as np

    s = urls.str.strip()
    ex = s.str.extract(_FAST_URL_RE)
    fast = ex[0].notna() & ~s.str.contains("[\t\r\n]", regex=True, na=True)
    if not fast.any():
        return urls.map(canonicalize_url)
    out = pd.Series(index=urls.index, dtype=object)
    f = ex.loc[fast]
    sch = f[0].str.lower()
    host = f[1].str.lower()
    port = pd.to_numeric(f[2], errors="coerce")
    is_def = ((sch == "http") & (port == 80)) | ((sch == "https") & (port == 443))
    keep_port = f[2].notna() & ~is_def
    netloc = host.where(
        ~keep_port,
        host + ":" + port.astype("Int64").astype(str),
    )
    path = f[3].fillna("/")
    q = f[4]
    has_q = q.notna()
    qfull = pd.Series("", index=q.index, dtype=object)
    if has_q.any():
        qq = q[has_q]
        first = qq.str.partition("&")
        two = first[1] == "&"
        seg1, seg2 = first[0], first[2]
        k1, v1 = seg1.str.partition("=")[0], seg1.str.partition("=")[2]
        k2, v2 = seg2.str.partition("=")[0], seg2.str.partition("=")[2]
        # (key, value) tuple order, vectorized — NOT raw segment order
        # ('=' sorts above digits, so "a=x" vs "a0=y" would flip)
        in_order = (k1 < k2) | ((k1 == k2) & (v1 <= v2))
        canon_q = pd.Series(
            np.where(
                two,
                np.where(in_order, seg1 + "&" + seg2, seg2 + "&" + seg1),
                qq,
            ),
            index=qq.index,
        )
        qfull[has_q] = "?" + canon_q
    out[fast] = sch + "://" + netloc + path + qfull
    slow = ~fast
    if slow.any():
        out[slow] = urls[slow].map(canonicalize_url)
    return out


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
