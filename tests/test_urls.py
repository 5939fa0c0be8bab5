"""C1 canonicalization goldens + UDF/pure-function agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_udf,
    host_col,
    host_of,
)

GOLDEN = [
    ("https://EXAMPLE.com/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a?", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com", "https://example.com/"),
    ("https://münchen.de/a", "https://xn--mnchen-3ya.de/a"),
    (None, None),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_canonicalize_golden(raw, want):
    assert canonicalize_url(raw) == want


def test_canonicalize_idempotent():
    for raw, want in GOLDEN:
        if want is not None:
            assert canonicalize_url(want) == want


def test_udf_matches_pure(spark, pages):
    got = (
        pages.select("url", canonicalize_url_udf("url").alias("canon"))
        .toPandas()
    )
    for _, r in got.iterrows():
        assert r.canon == canonicalize_url(r.url)


def test_host_col_matches_host_of(spark, pages):
    df = (
        pages.select(canonicalize_url_udf("url").alias("canon"))
        .select("canon", host_col(F.col("canon")).alias("h_jvm"))
        .toPandas()
    )
    for _, r in df.iterrows():
        assert r.h_jvm == host_of(r.canon)


def test_vectorized_fast_path_parity():
    """The r6 vectorized batch path inside canonicalize_url_udf must be
    byte-identical to the scalar function on the fast/slow boundary: safe
    1-2-param queries (including the prefix-key tuple-order trap), default
    and leading-zero ports, fallbacks (3 params, encoded chars, userinfo,
    idna hosts, 5-digit/invalid ports, mid-string control chars)."""
    import pandas as pd

    fn = canonicalize_url_udf.func
    cases = [
        None,
        "HTTPS://H7.Example.COM:443/p/123?b=2&a=1#frag",
        "http://h.com:0080/x",
        "http://h.com?",
        "http://h.com/p?a=x&a0=y",  # '=' sorts above digits: tuple order
        "http://h.com/p?a0=y&a=x",
        "http://h.com/p?a=b&a=a",
        "http://h.com/p?a=1&b=2&c=3",  # 3 params -> scalar path
        "http://h.com/p?x=%41",  # encoded -> scalar path
        "http://user@h.com/p",  # userinfo -> scalar path
        "http://h.com:65535/p",  # 5-digit port -> scalar path
        "http://h.com:99999/p",  # invalid port -> scalar path
        "http://ünïcode.example/p",  # idna -> scalar path
        "  http://h.com/p  ",
        "http://h\nx.com/p",  # urlsplit strips mid-string CR/LF/TAB
        "http://h.com:0/p",
        "http://h.com./p?~z=_1&A-a=.2",
        "http://h.com/p#frag#more",
        "not a url",
        "",
    ]
    got = fn(pd.Series(cases, dtype=object))
    for raw, g in zip(cases, got):
        g = None if pd.isna(g) else g
        assert g == canonicalize_url(raw), raw
