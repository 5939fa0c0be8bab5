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
