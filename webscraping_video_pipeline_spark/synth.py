"""Deterministic synthetic fixtures (FIXTURES.md §1) — no external data.

Every field derives from the row index via md5, never from RNG call order, so
any scale factor regenerates identically (the analog of the reference's canned
payloads in ``tests/mock_responses.py:63-105`` and the OpenCV sample video in
``tests/test_integration.py:85-120``).

Two generation paths share one pure row-builder:

- ``gen_pages_pdf(n)``            — driver-side pandas (test fixtures)
- ``gen_pages_spark(spark, n)``   — ``spark.range(n).mapInPandas`` (bench scale;
                                    each partition builds its index slice, so
                                    generation parallelizes with zero shuffle)

``pages.text`` is the golden extraction oracle: it is constructed directly
from the plain-text components (NOT by running the extractor), so the
byte-identity test in ``tests/test_extract.py`` is meaningful.
"""

from __future__ import annotations

import hashlib
import html as _html
import json

import numpy as np
import pandas as pd

BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")

LANGS = ["en", "de", "fr", "es", "pt", "zz"]
SOURCES = [  # the reference's 8 registered scrapers (main.py:158-167)
    "pexels",
    "pixabay",
    "videvo",
    "nasa",
    "internet_archive",
    "wikimedia",
    "coverr",
    "noaa",
]
# the exact delays used by the reference (config.py:15-72, nasa_scraper.py:41,
# coverr_scraper.py:47, noaa_scraper.py:50)
CRAWL_DELAYS = [0.5, 1.0, 2.0, 3.0, 3.6]
BUCKET_CAPACITIES = [1, 4, 10]

MEGA_HOSTS = ["big-a.example.com", "big-b.example.com", "big-c.example.com"]

_WORDS = (
    "stream river mountain forest cloud harbor meadow canyon glacier prairie "
    "lantern compass archive signal beacon vessel timber granite ember willow"
).split()


def _h(*parts: object) -> int:
    """Stable 63-bit hash of the given parts (md5-based; version-independent)."""
    key = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big") & 0x7FFFFFFFFFFFFFFF


def n_small_hosts(n_rows: int) -> int:
    return max(8, min(500, n_rows // 200))


def host_for(i: int, n_rows: int) -> str:
    """Zipf-like host pool with 3 deliberate mega-hosts (~36% of rows)."""
    r = _h("host", i) % 100
    if r < 18:
        return MEGA_HOSTS[0]
    if r < 30:
        return MEGA_HOSTS[1]
    if r < 36:
        return MEGA_HOSTS[2]
    return f"h{_h('smallhost', i) % n_small_hosts(n_rows)}.example.org"


def canon_url_for(i: int, n_rows: int) -> str:
    """The canonical URL for row index i (already in canonical form)."""
    host = host_for(i, n_rows)
    private = "private/" if _h("priv", i) % 33 == 0 else ""
    path = f"{private}p{_h('path', i) % 1_000_000}/page-{i}.html"
    query = f"?a={_h('qa', i) % 50}&b={_h('qb', i) % 50}" if _h("q", i) % 7 == 0 else ""
    return f"https://{host}/{path}{query}"


_VARIANTS = ("upper_host", "trailing_q", "fragment", "reorder_query", "default_port")


def _variant_of(canon: str, kind: str) -> str:
    scheme, rest = canon.split("://", 1)
    host, _, pathq = rest.partition("/")
    if kind == "upper_host":
        return f"{scheme}://{host.upper()}/{pathq}"
    if kind == "trailing_q" and "?" not in pathq:
        return f"{canon}?"
    if kind == "fragment":
        return f"{canon}#section-2"
    if kind == "reorder_query" and "?" in pathq:
        path, _, q = pathq.partition("?")
        params = q.split("&")
        return f"{scheme}://{host}/{path}?{'&'.join(reversed(params))}"
    if kind == "default_port":
        return f"{scheme}://{host}:443/{pathq}"
    return f"{canon}#section-2"  # fallback always canonicalizes away


def dup_target(i: int) -> int | None:
    """~5% of rows are non-canonical URL variants of an earlier row."""
    if i == 0 or _h("dup", i) % 100 >= 5:
        return None
    return i - 1 - (_h("duptgt", i) % min(i, 997))


def _sentence(i: int, k: int) -> str:
    n_words = 4 + _h("sw", i, k) % 8
    return " ".join(_WORDS[_h("w", i, k, j) % len(_WORDS)] for j in range(n_words))


def page_components(i: int) -> dict[str, object]:
    """Plain-text components of page i; html and golden text both build on these."""
    title = f"T{i} {_sentence(i, 0)}"
    h1 = f"H{i} {_sentence(i, 1)}"
    # entity edge cases: ~1 in 3 paragraphs carry &, ', <, unicode
    para = _sentence(i, 2)
    mode = _h("ent", i) % 6
    if mode == 0:
        para = f"{para} fish & chips 'n peas <tag-not-a-tag>"
    elif mode == 1:
        para = f"{para} naïve café — déjà-vu ★"
    elif mode == 2:
        para = f'{para} "quoted" & re-quoted  end'
    anchors = [f"link {_h('a', i, j) % 100}" for j in range(2 + _h("na", i) % 4)]
    return {"title": title, "h1": h1, "para": para, "anchors": anchors}


def outlinks_for(i: int, n_rows: int) -> list[str]:
    """2-5 deterministic outlinks to other canonical page URLs."""
    n_links = 2 + _h("nl", i) % 4
    return [canon_url_for(_h("lnk", i, j) % n_rows, n_rows) for j in range(n_links)]


def build_html(i: int, n_rows: int) -> bytes:
    c = page_components(i)
    esc = _html.escape
    links = outlinks_for(i, n_rows)
    jsonld = json.dumps({"@type": "VideoObject", "name": c["title"], "id": i})
    # whitespace-collapse edge case: some rows pad text with runs of whitespace
    pad = "  \n\t " if _h("pad", i) % 4 == 0 else ""
    anchor_html = " ".join(
        f'<a href="{esc(links[j % len(links)])}">{esc(a)}</a>'
        for j, a in enumerate(c["anchors"])
    )
    comment = f"<!-- build {i} <p>not text</p> -->" if _h("cm", i) % 3 == 0 else ""
    style = "<style>p { color: #333; }</style>" if _h("st", i) % 4 == 0 else ""
    doc = (
        f"<html><head><title>{esc(c['title'])}</title>"
        f'<script type="application/ld+json">{jsonld}</script>{comment}{style}</head>'
        f"<body><h1>{pad}{esc(c['h1'])}{pad}</h1>"
        f"<p>{pad}{esc(c['para'])}{pad}</p>"
        f"<div>{anchor_html}</div>"
        f"<script>var x = {i}; document.write('<b>no</b>');</script>"
        f"</body></html>"
    )
    return doc.encode("utf-8")


def golden_text(i: int) -> str:
    """Expected extraction output, built from components (not by parsing)."""
    c = page_components(i)
    para = " ".join(str(c["para"]).split())  # whitespace-collapsed
    anchors = " ".join(str(a) for a in c["anchors"])
    return "\n".join([str(c["title"]), " ".join(str(c["h1"]).split()), para, anchors])


# --------------------------------------------------------------------- pages


def _pages_rows(start: int, end: int, n_rows: int) -> pd.DataFrame:
    urls: list[str] = []
    tss = np.empty(end - start, dtype="datetime64[us]")
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    for i in range(start, end):
        j = dup_target(i)
        src = i if j is None else j
        if j is None:
            urls.append(canon_url_for(i, n_rows))
        else:
            kind = _VARIANTS[_h("vk", i) % len(_VARIANTS)]
            urls.append(_variant_of(canon_url_for(j, n_rows), kind))
        ts = BASE_TS + np.timedelta64(i * 13, "s")
        if _h("late", i) % 50 == 0:  # ~2% late rows (older than round watermark)
            ts = ts - np.timedelta64(30, "D")
        tss[i - start] = ts
        htmls.append(build_html(src, n_rows))
        texts.append(golden_text(src))
        langs.append(LANGS[src % len(LANGS)])
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="string"),
            "warc_ts": tss,
            "html": pd.Series(htmls, dtype=object),
            "text": pd.Series(texts, dtype="string"),
            "lang": pd.Series(langs, dtype="string"),
        }
    )


def gen_pages_pdf(n: int) -> pd.DataFrame:
    return _pages_rows(0, n, n)


def gen_pages_spark(spark, n: int, num_partitions: int | None = None):
    """Distributed generation: each partition builds its own index slice."""
    from .schemas import PAGES

    parts = num_partitions or spark.sparkContext.defaultParallelism

    def build(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield _pages_rows(int(ids.min()), int(ids.max()) + 1, n)

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(build, schema=PAGES)
    )


# --------------------------------------------------------------------- seeds


def _seeds_rows(start: int, end: int, n_pages: int, every_k: int = 3) -> pd.DataFrame:
    """Seed i -> page (i*k); ~1% point at URLs absent from pages (fetch misses)."""
    urls, prios, sources = [], [], []
    tss = np.empty(end - start, dtype="datetime64[us]")
    for s in range(start, end):
        if _h("miss", s) % 100 == 0:
            url = f"https://missing.example.net/m/{s}.html"
        else:
            i = (s * every_k) % n_pages
            j = dup_target(i)
            if j is None:
                url = canon_url_for(i, n_pages)
            else:
                kind = _VARIANTS[_h("vk", i) % len(_VARIANTS)]
                url = _variant_of(canon_url_for(j, n_pages), kind)
        urls.append(url)
        # popularity ordering analog (internet_archive_scraper.py:76)
        prios.append(1.0 / (1 + _h("prio", url) % 1000))
        sources.append(SOURCES[s % len(SOURCES)])
        tss[s - start] = BASE_TS + np.timedelta64(s, "s")
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="string"),
            "priority": pd.Series(prios, dtype="float64"),
            "source": pd.Series(sources, dtype="string"),
            "discovered_ts": tss,
        }
    )


def gen_seeds_pdf(n_seeds: int, n_pages: int) -> pd.DataFrame:
    return _seeds_rows(0, n_seeds, n_pages)


def gen_seeds_spark(spark, n_seeds: int, n_pages: int, num_partitions: int | None = None):
    from .schemas import SEEDS

    parts = num_partitions or spark.sparkContext.defaultParallelism

    def build(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield _seeds_rows(int(ids.min()), int(ids.max()) + 1, n_pages)

    return spark.range(0, n_seeds, 1, parts).mapInPandas(build, schema=SEEDS)


# --------------------------------------------------- host_policy / robots


def all_hosts(n_rows: int) -> list[str]:
    return MEGA_HOSTS + [f"h{k}.example.org" for k in range(n_small_hosts(n_rows))] + [
        "missing.example.net"
    ]


def gen_host_policy_pdf(n_rows: int) -> pd.DataFrame:
    hosts = all_hosts(n_rows)
    return pd.DataFrame(
        {
            "host": pd.Series(hosts, dtype="string"),
            "crawl_delay_s": [CRAWL_DELAYS[_h("delay", h) % len(CRAWL_DELAYS)] for h in hosts],
            "bucket_capacity": pd.Series(
                [BUCKET_CAPACITIES[_h("cap", h) % len(BUCKET_CAPACITIES)] for h in hosts],
                dtype="int32",
            ),
            "max_errors": pd.Series([3] * len(hosts), dtype="int32"),
        }
    )


def gen_robots_pdf(n_rows: int) -> pd.DataFrame:
    """Two snapshots per host (exercises the as-of join); ~20% of hosts
    disallow /private/ (hash(host)%5==0)."""
    hosts = all_hosts(n_rows)
    rows = []
    for h in hosts:
        disallow = ["/private/"] if _h("robots", h) % 5 == 0 else []
        for snap in (0, 1):
            rows.append(
                {
                    "host": h,
                    "fetched_ts": BASE_TS
                    - np.timedelta64(1, "D")
                    + np.timedelta64(snap * 12, "h"),
                    "disallow_prefixes": disallow,
                    "crawl_delay_s": (
                        float(CRAWL_DELAYS[_h("rdelay", h, snap) % len(CRAWL_DELAYS)])
                        if _h("rhasd", h) % 2 == 0
                        else None
                    ),
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["host"] = pdf["host"].astype("string")
    # keep the absent delays as real None, not float64 NaN: pandas coerces
    # mixed float/None to NaN, and only the Arrow createDataFrame path maps
    # NaN back to null — a non-Arrow session would see NaN crawl delays
    pdf["crawl_delay_s"] = pdf["crawl_delay_s"].astype(object).where(
        pdf["crawl_delay_s"].notna(), None
    )
    return pdf


def materialize_fixtures(spark, out_dir: str, n_pages: int, n_seeds: int | None = None):
    """Write the full fixture set as parquet under out_dir."""
    from .schemas import HOST_POLICY, PAGES, ROBOTS_CACHE, SEEDS

    n_seeds = n_seeds if n_seeds is not None else max(8, n_pages // 2)
    gen_pages_spark(spark, n_pages).write.mode("overwrite").parquet(f"{out_dir}/pages")
    gen_seeds_spark(spark, n_seeds, n_pages).write.mode("overwrite").parquet(
        f"{out_dir}/seeds"
    )
    spark.createDataFrame(gen_host_policy_pdf(n_pages), schema=HOST_POLICY).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/host_policy")
    spark.createDataFrame(gen_robots_pdf(n_pages), schema=ROBOTS_CACHE).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/robots_cache")
    return {
        "pages": f"{out_dir}/pages",
        "seeds": f"{out_dir}/seeds",
        "host_policy": f"{out_dir}/host_policy",
        "robots_cache": f"{out_dir}/robots_cache",
    }
