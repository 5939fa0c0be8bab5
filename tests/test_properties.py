"""Property-based checks (hypothesis) for the two functions whose
byte-exactness the north_rule depends on — beyond the golden fixtures:

- canonicalize_url: total (never raises), idempotent, scheme/host
  lowercased, fragment-free, query sorted — for ANY url-shaped string;
- extract_text: total over arbitrary bytes, deterministic, and its output
  never contains script/style payload or unnormalized whitespace runs.

The reference has no property tests at all (SURVEY §5); these are the
engine's replacement for its mock-based unit layer.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from webscraping_video_pipeline_spark.functions.extract import extract_text
from webscraping_video_pipeline_spark.functions.urls import canonicalize_url

_host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9-]{0,10}[A-Za-z0-9])?(\.[A-Za-z]{2,6}){1,2}", fullmatch=True)
_path = st.lists(
    st.text(string.ascii_letters + string.digits + "-._~", min_size=1, max_size=8),
    max_size=4,
).map(lambda segs: "/" + "/".join(segs))
_query = st.lists(
    st.tuples(
        st.text(string.ascii_lowercase, min_size=1, max_size=5),
        st.text(string.ascii_letters + string.digits, max_size=6),
    ),
    max_size=4,
).map(lambda kvs: "&".join(f"{k}={v}" for k, v in kvs))


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTTps"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(_query)
    frag = draw(st.sampled_from(["", "#frag", "#a/b?c"]))
    return f"{scheme}://{host}{port}{path}{'?' + q if q else ''}{frag}"


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_canonicalize_properties(url):
    c = canonicalize_url(url)
    assert c is not None
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    host = rest.split("/", 1)[0]
    assert host == host.lower()
    assert not (host.endswith(":80") and scheme == "http")
    assert not (host.endswith(":443") and scheme == "https")
    assert "#" not in c
    if "?" in c:
        params = c.split("?", 1)[1].split("&")
        assert params == sorted(params)
    # idempotent: canonical form is a fixed point
    assert canonicalize_url(c) == c


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_canonicalize_total_on_junk(s):
    # never raises; idempotent whenever it returns something url-shaped
    c = canonicalize_url(s)
    if c is not None and "://" in c:
        assert canonicalize_url(c) == c


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_extract_total_and_deterministic(raw):
    a = extract_text(raw)
    b = extract_text(raw)
    assert a == b
    assert a is not None


@settings(max_examples=200, deadline=None)
@given(
    st.text(st.characters(blacklist_characters="<>&\x00", blacklist_categories=("Cs",)), max_size=80),
    st.text(string.ascii_letters + " \t\n", max_size=40),
)
def test_extract_normalization_properties(body, scripty):
    html = f"<html><head><script>{scripty}</script></head><body><p>  {body} \t</p></body></html>"
    out = extract_text(html.encode("utf-8"))
    # script payload never leaks; whitespace runs collapse; blocks stripped
    for line in out.split("\n") if out else []:
        assert line == " ".join(line.split())
        assert line != ""
    if body.strip():
        assert " ".join(body.split()) in out


def _canonicalize_reference(url):
    """The original always-urllib implementation, kept verbatim as the
    differential-fuzz reference for the fast paths in canonicalize_url."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        try:
            host = host.encode("idna").decode("ascii") if host else host
        except (UnicodeError, UnicodeDecodeError):
            pass
        port = parts.port
        netloc = host
        if port is not None and str(port) != {"http": "80", "https": "443"}.get(scheme, ""):
            netloc = f"{host}:{port}"
        path = parts.path or "/"
        query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
        return urlunsplit((scheme, netloc, path, query, ""))
    except ValueError:
        return url


@settings(max_examples=400, deadline=None)
@given(_urls())
def test_fast_paths_match_reference_on_urls(url):
    assert canonicalize_url(url) == _canonicalize_reference(url)


@settings(max_examples=400, deadline=None)
@given(st.text(max_size=200))
def test_fast_paths_match_reference_on_junk(s):
    assert canonicalize_url(s) == _canonicalize_reference(s)


@settings(max_examples=300, deadline=None)
@given(
    _host,
    st.lists(
        st.tuples(st.text(max_size=6), st.text(max_size=6)),
        max_size=4,
    ),
)
def test_fast_paths_match_reference_on_messy_queries(host, kvs):
    from urllib.parse import quote_plus

    raw = "&".join(f"{k}={v}" for k, v in kvs)
    quoted = "&".join(f"{quote_plus(k)}={quote_plus(v)}" for k, v in kvs)
    for q in (raw, quoted, raw.replace("=", "", 1), quoted + "&&x"):
        url = f"https://{host}/p?{q}"
        assert canonicalize_url(url) == _canonicalize_reference(url)


# --------------------------------------------------------------- cuckoo C2
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=40)),
        max_size=60,
    )
)
@settings(max_examples=150, deadline=None)
def test_cuckoo_counted_delete_no_false_negatives(ops):
    """Exactness contract under arbitrary insert/delete interleavings:
    after any op sequence, every key with live multiplicity (per a Python
    multiset oracle) must still probe positive — aliasing or eviction may
    only produce false POSITIVES (the exact join corrects those), never
    false negatives."""
    import numpy as np

    from webscraping_video_pipeline_spark.operators.cuckoo import _Table

    t = _Table(16)  # small pow2 table: collisions + aliasing are frequent
    oracle: dict[int, int] = {}
    for is_delete, key in ops:
        h = key * 2654435761 + 11  # spread keys over fingerprints/buckets
        if is_delete:
            # the delete contract: only previously-inserted keys are ever
            # deleted (expired URLs are a subset of seen URLs) — deleting a
            # never-inserted alias could legally consume a live key's count
            if oracle.get(h, 0) > 0 and t.delete(h):
                oracle[h] = oracle[h] - 1
        elif t.n_evicted == 0:
            t.insert(h)
            oracle[h] = oracle.get(h, 0) + 1
    if t.n_evicted:
        return  # overflowed: probe degrades to all-positive upstream
    live = np.array([h for h, c in oracle.items() if c > 0], dtype=np.int64)
    if len(live):
        assert t.contains(live).all(), "live key probed negative"


def test_winnowing_guarantee(spark):
    """MOSS winnowing invariant: two documents sharing a common substring of
    length >= k + w - 1 (= 11 chars at k=8, w=4) MUST share at least one
    selected fingerprint — regardless of where the match sits. Planted
    matches at random offsets inside random noise, one Spark job for all
    pairs."""
    import random

    from webscraping_video_pipeline_spark.contract.text import winnow_fingerprints

    rng = random.Random(1234)
    alpha = string.ascii_lowercase

    def noise(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    rows = []
    for pair in range(40):
        shared = noise(rng.randint(11, 30))  # >= k + w - 1
        for side in (0, 1):
            pre, post = noise(rng.randint(0, 40)), noise(rng.randint(0, 40))
            rows.append((pair * 2 + side, pre + shared + post))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for pair in range(40):
        a, b = by_doc[pair * 2], by_doc[pair * 2 + 1]
        assert a & b, f"pair {pair}: planted >=11-char match shares no fingerprint"
