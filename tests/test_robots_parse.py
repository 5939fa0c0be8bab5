"""P2 — robots.txt parsing: pure function semantics + UDF equivalence.

The reference never fetches robots.txt (it hardcodes compliant UAs and
per-site delays — wikimedia_scraper.py:36-41, config.py:15-72); the engine
makes the contract explicit, so the parser is pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.operators.robots import (
    parse_robots_txt,
    parse_robots_udf,
)

ROBOTS = """\
# global rules
User-agent: *
Disallow: /private/
Crawl-delay: 2

User-agent: fastbot
User-agent: speedcrawler
Disallow: /tmp/
Disallow: /staging/
Crawl-delay: 0.5

User-agent: greedybot
Disallow: /
"""


def test_wildcard_group():
    dis, delay = parse_robots_txt(ROBOTS, "somebot/1.0")
    assert dis == ["/private/"] and delay == 2.0


def test_specific_group_wins_over_wildcard():
    dis, delay = parse_robots_txt(ROBOTS, "FastBot/2.1 (+crawler)")
    assert dis == ["/tmp/", "/staging/"] and delay == 0.5


def test_multi_agent_run_shares_group():
    dis, delay = parse_robots_txt(ROBOTS, "speedcrawler")
    assert dis == ["/tmp/", "/staging/"] and delay == 0.5


def test_disallow_all_and_empty_cases():
    dis, _ = parse_robots_txt(ROBOTS, "greedybot")
    assert dis == ["/"]
    assert parse_robots_txt(None) == ([], None)
    assert parse_robots_txt("") == ([], None)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ([], None)
    assert parse_robots_txt("garbage without colons\n\n") == ([], None)


def test_udf_matches_pure(spark):
    texts = [ROBOTS, "", "User-agent: *\nCrawl-delay: nope\nDisallow: /x/"]
    df = spark.createDataFrame([(t,) for t in texts], "robots_txt string")
    rows = (
        df.withColumn("p", parse_robots_udf(F.col("robots_txt")))
        .select("p.disallow_prefixes", "p.crawl_delay_s")
        .collect()
    )
    got = [(list(r.disallow_prefixes), r.crawl_delay_s) for r in rows]
    want = [parse_robots_txt(t) for t in texts]
    assert got == want
