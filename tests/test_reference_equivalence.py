"""North-rule replay: crawl ordering and the final URL-seen set must match
the reference EXACTLY under the same seed list + politeness budget
(BASELINE.json north_rule).

The reference runs an imperative single-process loop (seen-set check ->
per-source rate-limited fetch -> state update; enhanced_batch_processor.py:
364-445,515-533, parallel_scraper_manager.py:87-97,189-198). This test
re-implements that loop style as a pure-Python ORACLE crawler — plain
dicts, lists and sorts, no Spark — drives it over the same fixtures, and
asserts the engine's distributed round plan reproduces, exactly:

  1. every fetch decision: (round, host, slot, canon_url, scheduled_ts,
     status) — slot equality pins per-host crawl ORDER, scheduled_ts
     equality pins the politeness timing arithmetic;
  2. the final url_seen set;
  3. the surviving frontier (including retry/backoff bookkeeping).

Only the key-generation helpers (canonicalize_url) and the engine-computed
xxhash64 values are shared; every scheduling/state decision is decided
independently by the oracle.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.functions.urls import canonicalize_url, host_of
from webscraping_video_pipeline_spark.plans.crawl import (
    BASE_ROUND_TS,
    CrawlConfig,
    CrawlEngine,
)

N_ROUNDS = 5
CFG = CrawlConfig(n_shards=8, salts=4, discover_outlinks=True)

_HREF_RE = re.compile(r'href="([^"]+)"')


def _page_outlinks(pages_pdf) -> dict[str, list[str]]:
    """canon_url -> harvested outlink canon_urls, mirroring the engine:
    one page row per canon (latest warc_ts, tiebreak url asc — the
    prepare_pages rule), href regex over decoded html, &amp; unescaped,
    http-prefixed only, then canonicalized."""
    best: dict[str, tuple] = {}  # canon -> (warc_ts, url, html)
    for r in pages_pdf.itertuples(index=False):
        canon = canonicalize_url(r.url)
        cur = best.get(canon)
        # winner: warc_ts DESC, url ASC
        if cur is None or (r.warc_ts, _NEG(r.url)) > (cur[0], _NEG(cur[1])):
            best[canon] = (r.warc_ts, r.url, r.html)
    out: dict[str, list[str]] = {}
    for canon, (_, _, html) in best.items():
        text = bytes(html).decode("utf-8", errors="replace")
        links = [
            canonicalize_url(h.replace("&amp;", "&"))
            for h in _HREF_RE.findall(text)
            if h.replace("&amp;", "&").startswith("http")
        ]
        out[canon] = links
    return out


class _NEG:
    """Reverse-order wrapper so (ts asc, url DESC) max-compare == (ts desc, url asc) winner."""

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other: "_NEG") -> bool:
        return self.s > other.s

    def __gt__(self, other: "_NEG") -> bool:
        return self.s < other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _NEG) and self.s == other.s


def _xxhash_map(spark, urls: list[str]) -> dict[str, int]:
    """Engine hash values for the oracle's tiebreaks (key generation only —
    the oracle makes no scheduling decision with Spark)."""
    df = spark.createDataFrame([(u,) for u in set(urls)], "canon_url string")
    return {
        r["canon_url"]: r["h"]
        for r in df.select("canon_url", F.xxhash64("canon_url").alias("h")).collect()
    }


def oracle_crawl(
    pages_pdf, seeds_pdf, policy_pdf, robots_pdf, hash_of, n_rounds, cfg, outlinks_of=None
):
    """The reference-style imperative crawler: one thread, explicit state."""
    base_ts = datetime.fromisoformat(BASE_ROUND_TS)

    # pages membership by canonical url (fetch hit/miss decision)
    pages_by_canon = {canonicalize_url(u) for u in pages_pdf["url"]}

    # policy: host -> (delay, capacity); robots: host -> snapshots
    policy = {
        r.host: (float(r.crawl_delay_s), int(r.bucket_capacity))
        for r in policy_pdf.itertuples(index=False)
    }
    robots_snaps: dict[str, list] = {}
    for r in robots_pdf.itertuples(index=False):
        robots_snaps.setdefault(r.host, []).append(
            (r.fetched_ts, list(r.disallow_prefixes), r.crawl_delay_s)
        )

    # initial frontier from seeds
    frontier = []
    for r in seeds_pdf.itertuples(index=False):
        canon = canonicalize_url(r.url)
        frontier.append(
            {
                "canon_url": canon,
                "url_hash": hash_of[canon],
                "host": host_of(canon),
                "priority": float(r.priority),
                "attempts": 0,
                "next_attempt_round": 0,
            }
        )

    seen: set[int] = set()
    fetch_log = []
    for k in range(n_rounds):
        round_ts = base_ts + timedelta(seconds=k * cfg.round_interval_s)

        due = [c for c in frontier if c["next_attempt_round"] <= k]
        deferred = [c for c in frontier if c["next_attempt_round"] > k]

        # J2: within-batch dedupe (best priority per hash, tiebreak canon
        # asc) then seen-set check — reference seen check :515-519
        best: dict[int, dict] = {}
        for c in due:
            cur = best.get(c["url_hash"])
            if cur is None or (-c["priority"], c["canon_url"]) < (-cur["priority"], cur["canon_url"]):
                best[c["url_hash"]] = c
        fresh = [c for c in best.values() if c["url_hash"] not in seen]

        # P2: robots as-of round_ts; disallowed URLs leave the crawl
        allowed = []
        robots_delay: dict[str, float | None] = {}
        for c in fresh:
            snaps = [s for s in robots_snaps.get(c["host"], []) if s[0] <= round_ts]
            dis, rdelay = [], None
            if snaps:
                snaps.sort(key=lambda s: s[0], reverse=True)
                dis, rdelay = snaps[0][1], snaps[0][2]
            robots_delay[c["host"]] = rdelay
            path = c["canon_url"].split("://", 1)[1]
            path = path[path.find("/"):] if "/" in path else "/"
            if not any(path.startswith(p) for p in dis):
                allowed.append(c)

        # P1: per-host ranking (priority desc, hash asc), token-bucket
        # admission, computed slots — reference sleeps become arithmetic
        scheduled = []
        by_host: dict[str, list] = {}
        for c in allowed:
            by_host.setdefault(c["host"], []).append(c)
        for host, cands in by_host.items():
            cands.sort(key=lambda c: (-c["priority"], c["url_hash"]))
            if host in policy:
                delay, cap = policy[host]
                rd = robots_delay.get(host)
                if rd is not None and not pd.isna(rd):
                    delay = float(rd)
            else:
                # hosts outside the policy table get pure defaults (the
                # engine's schedule_round joins FROM the policy side)
                delay, cap = cfg.default_delay_s, cfg.default_capacity
            for slot, c in enumerate(cands[:cap]):
                ts = round_ts + timedelta(microseconds=slot * int(delay * 1_000_000))
                scheduled.append({**c, "slot": slot, "scheduled_ts": ts})

        # J5: fetch against the pages snapshot; misses retry w/ backoff
        sched_hashes = {c["url_hash"] for c in scheduled}
        retryable, exhausted, fetched_canons = [], [], []
        for c in scheduled:
            status = "fetched" if c["canon_url"] in pages_by_canon else "miss"
            fetch_log.append(
                (k, c["host"], c["slot"], c["canon_url"], c["scheduled_ts"], status)
            )
            if status == "fetched":
                seen.add(c["url_hash"])
                fetched_canons.append(c["canon_url"])
            else:
                c2 = dict(c)
                c2["attempts"] += 1
                c2["next_attempt_round"] = k + 2 ** c2["attempts"]
                (retryable if c2["attempts"] < cfg.max_attempts else exhausted).append(c2)
        for c in exhausted:
            seen.add(c["url_hash"])

        # outlink discovery: links of every fetched page become next-round
        # candidates (priority = 1/(1 + pmod(xxhash64(canon), 1000)))
        discovered = []
        if cfg.discover_outlinks and outlinks_of is not None:
            for canon in fetched_canons:
                for link in outlinks_of.get(canon, []):
                    h = hash_of[link]
                    discovered.append(
                        {
                            "canon_url": link,
                            "url_hash": h,
                            "host": host_of(link),
                            "priority": 1.0 / (1 + (h % 1000)),
                            "attempts": 0,
                            "next_attempt_round": k + 1,
                        }
                    )

        # frontier': allowed-not-scheduled + deferred + retryable +
        # discovered (existing rows take precedence), minus seen
        nxt, taken = [], set()
        for c in (
            [c for c in allowed if c["url_hash"] not in sched_hashes]
            + deferred
            + retryable
            + discovered
        ):
            if c["url_hash"] not in seen and c["url_hash"] not in taken:
                taken.add(c["url_hash"])
                nxt.append(c)
        frontier = nxt

    return fetch_log, seen, frontier


@pytest.fixture(scope="module")
def engine_run(spark, pages, seeds, host_policy, robots_cache, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ref_eq"))
    eng = CrawlEngine(spark, wd, pages, seeds, host_policy, robots_cache, CFG)
    eng.run(N_ROUNDS)
    return eng


@pytest.fixture(scope="module")
def oracle_run(spark, pages, seeds, host_policy, robots_cache):
    pages_pdf = pages.toPandas()
    seeds_pdf = seeds.toPandas()
    outlinks_of = _page_outlinks(pages_pdf)
    canons = [canonicalize_url(u) for u in seeds_pdf["url"]]
    canons += [link for links in outlinks_of.values() for link in links]
    hash_of = _xxhash_map(spark, canons)
    return oracle_crawl(
        pages_pdf,
        seeds_pdf,
        host_policy.toPandas(),
        robots_cache.toPandas(),
        hash_of,
        N_ROUNDS,
        CFG,
        outlinks_of=outlinks_of,
    )


def test_crawl_ordering_matches_reference_oracle(engine_run, oracle_run):
    fetch_log, _, _ = oracle_run
    got = {
        (r["round"], r["host"], r["slot"], r["canon_url"], r["scheduled_ts"], r["status"])
        for r in engine_run.catalog.read_appended("fetch_log").collect()
    }
    want = set(fetch_log)
    assert got == want, (
        f"fetch decisions diverge: engine-only={sorted(got - want)[:5]} "
        f"oracle-only={sorted(want - got)[:5]}"
    )


def test_url_seen_set_matches_reference_oracle(engine_run, oracle_run):
    _, seen, _ = oracle_run
    got = {
        r["url_hash"]
        for r in engine_run.catalog.read_appended("url_seen", N_ROUNDS - 1).collect()
    }
    assert got == seen


def test_final_frontier_matches_reference_oracle(engine_run, oracle_run):
    _, _, frontier = oracle_run
    got = {
        (r["url_hash"], r["attempts"], r["next_attempt_round"])
        for r in engine_run.catalog.read_snapshot("frontier", N_ROUNDS - 1).collect()
    }
    want = {(c["url_hash"], c["attempts"], c["next_attempt_round"]) for c in frontier}
    assert got == want
