"""E1 — HTML -> text extraction (SURVEY.md §2.9 E1).

Reference semantic preserved: the validators derive content signals from the
downloaded bytes (reference ``validators/text_detection_validator.py:167-208``,
``cut_scene_validator.py:122-147``, ``video_processor.py:80-130``); here the
payload is webtext, so "extraction" is deterministic HTML->text with a
byte-identical-per-url contract (BASELINE.json ``input_hint``).

Rules (pinned; stdlib-only, locale-independent, golden-tested):

- script/style subtrees and comments contribute nothing;
- character/entity references are decoded (``html.parser`` convert_charrefs);
- block-level tag boundaries (html head body title h1-h6 p div ul ol li br hr
  table thead tbody tr td th section article header footer blockquote pre nav
  aside figure figcaption) split the output into blocks;
- within a block, whitespace runs collapse to a single space and the block is
  stripped; empty blocks are dropped; blocks join with ``\\n``.

The same pure function (``extract_text``) runs inside the pandas UDF on
executors and single-node in tests/oracles — identical code path, so
byte-identity is by construction of the *test*, not assumed.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_TAGS = frozenset(
    """html head body title h1 h2 h3 h4 h5 h6 p div ul ol li br hr table thead
    tbody tr td th section article header footer blockquote pre nav aside
    figure figcaption form fieldset dl dt dd""".split()
)
_SKIP_TAGS = frozenset({"script", "style", "template"})
_BREAK = "\x00"  # sentinel separating blocks during accumulation


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._parts.append(_BREAK)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._parts.append(_BREAK)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._parts.append(_BREAK)

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._parts.append(data)

    def result(self) -> str:
        blocks = "".join(self._parts).split(_BREAK)
        out = []
        for b in blocks:
            collapsed = " ".join(b.split())
            if collapsed:
                out.append(collapsed)
        return "\n".join(out)


def extract_text(html: bytes | str | None) -> str | None:
    """Pure single-value extraction — the oracle code path."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized batch wrapper around :func:`extract_text`."""
    return html.map(extract_text)


class _JsonLdExtractor(HTMLParser):
    """X13 — collect raw payloads of ``<script type="application/ld+json">``
    blocks (reference ``coverr_scraper.py:228-236`` parses these for
    VideoObject metadata). A SEPARATE parser from _TextExtractor: E1's
    byte-identical text contract requires script subtrees to contribute
    nothing to text, so JSON-LD rides its own extraction pass."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self._in_ldjson = 0
        self.payloads: list[str] = []
        self._buf: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "script" and dict(attrs).get("type") == "application/ld+json":
            self._in_ldjson += 1
            self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "script" and self._in_ldjson:
            self._in_ldjson -= 1
            self.payloads.append("".join(self._buf))

    def handle_data(self, data: str) -> None:
        if self._in_ldjson:
            self._buf.append(data)


def extract_jsonld(html: bytes | str | None) -> list[str] | None:
    """All JSON-LD payload strings of a page, document order, verbatim
    (no JSON parsing here — callers use get_json_object / from_json)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _JsonLdExtractor()
    p.feed(html)
    p.close()
    return p.payloads


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_jsonld_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized batch wrapper around :func:`extract_jsonld`."""
    return html.map(extract_jsonld)
