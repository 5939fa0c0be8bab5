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


def test_extract_jsonld_golden_fixture():
    """X13: the synth pages embed one VideoObject JSON-LD block
    (synth.build_html); extraction must return it verbatim and must NOT
    leak it into the text output (E1's script-skip contract)."""
    import json

    from webscraping_video_pipeline_spark import synth
    from webscraping_video_pipeline_spark.functions.extract import extract_jsonld

    for i in (0, 7, 42):
        html = synth.build_html(i, 1200)
        want = json.dumps(
            {"@type": "VideoObject", "name": synth.page_components(i)["title"], "id": i}
        )
        assert extract_jsonld(html) == [want]
        assert want not in (extract_text(html) or "")


def test_extract_jsonld_edge_cases():
    from webscraping_video_pipeline_spark.functions.extract import extract_jsonld

    # plain scripts are not captured; multiple ld+json blocks all are
    html = (
        b'<head><script>var x=1;</script>'
        b'<script type="application/ld+json">{"a":1}</script>'
        b'<script type="text/javascript">no</script>'
        b'<script type="application/ld+json">{"b":2}</script></head>'
    )
    assert extract_jsonld(html) == ['{"a":1}', '{"b":2}']
    assert extract_jsonld(b"<p>none</p>") == []
    assert extract_jsonld(None) is None


def test_validation_record_nested_shape(spark):
    """E2: the engine-side record carries failed_validators ARRAY<STRING>
    and a per-validator BOOLEAN struct (validation_pipeline.py:146-171)."""
    from pyspark.sql import types as T

    from webscraping_video_pipeline_spark.contract.text import validation_record

    df = spark.createDataFrame(
        [
            (1, "the value of and table", 40, "en"),    # all pass
            (2, "zz", 2, "xx"),                          # fails all but keyword
            (3, "the merge of a value arrives ok", 40, "en"),  # fails keyword
        ],
        "doc_id int, text string, n_chars int, lang string",
    )
    out = validation_record(df)
    schema = {f.name: f.dataType for f in out.schema.fields}
    assert schema["failed_validators"] == T.ArrayType(T.StringType())
    assert isinstance(schema["validators"], T.StructType)
    assert [f.name for f in schema["validators"].fields] == [
        "length", "lang", "stopwords", "keyword",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["validated"] and rows[1]["failed_validators"] == []
    assert not rows[2]["validated"]
    assert rows[2]["failed_validators"] == ["length", "lang", "stopwords"]
    assert rows[3]["failed_validators"] == ["keyword"]
    assert rows[2]["validators"]["keyword"] is True
