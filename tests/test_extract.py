"""E1 byte-identity: the pandas-UDF extraction must equal the golden text
for every synthetic page — the engine analog of the reference's integration
assertions (reference tests/test_integration.py:203) but with golden outputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.functions.extract import extract_text, extract_text_udf


def test_extract_udf_byte_identical(pages):
    mismatches = (
        pages.withColumn("got", extract_text_udf(F.col("html")))
        .filter(F.col("got") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_extract_edge_cases():
    # entities decoded
    assert extract_text(b"<p>fish &amp; chips &#x27;n</p>") == "fish & chips 'n"
    # script/style/comments dropped
    assert (
        extract_text(b"<body><script>var x=1;</script><p>a</p><style>p{}</style><!-- c --></body>")
        == "a"
    )
    # whitespace collapse + block separation
    assert extract_text(b"<h1>  a \n b </h1><p>c</p>") == "a b\nc"
    # inline elements join within a block
    assert extract_text(b"<div><a>x</a> <a>y</a></div>") == "x y"
    # br is a block break even self-closed
    assert extract_text(b"<p>a<br/>b</p>") == "a\nb"
    # bytes with replacement-safe decode
    assert extract_text(None) is None


def test_extract_deterministic():
    html = b"<html><body><p>same &quot;in&quot;</p></body></html>"
    assert extract_text(html) == extract_text(html) == 'same "in"'
