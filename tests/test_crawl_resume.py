"""P4 — round orchestration: determinism, resume-equivalence, robots, lineage.

Mirrors the reference's resume contract (`resume_batch`,
enhanced_batch_processor.py:740-764): state after crash-at-round-k + restart
must equal the uninterrupted run.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.plans.crawl import CrawlConfig, CrawlEngine


def _engine(spark, wd, pages, seeds, host_policy, robots_cache):
    return CrawlEngine(
        spark, wd, pages, seeds, host_policy, robots_cache,
        CrawlConfig(n_shards=8, salts=4),
    )


def _state(eng):
    seen = sorted(r.url_hash for r in eng.catalog.read_appended("url_seen").collect())
    log = sorted(
        map(
            tuple,
            eng.catalog.read_appended("fetch_log")
            .select("round", "url_hash", "slot", "scheduled_ts", "status")
            .collect(),
        )
    )
    return seen, log


def test_resume_equals_uninterrupted(spark, pages, seeds, host_policy, robots_cache, tmp_path):
    wd_a, wd_b = str(tmp_path / "a"), str(tmp_path / "b")
    a = _engine(spark, wd_a, pages, seeds, host_policy, robots_cache)
    a.run(3)

    b = _engine(spark, wd_b, pages, seeds, host_policy, robots_cache)
    b.run(2)  # "crash" after round 1
    b2 = _engine(spark, wd_b, pages, seeds, host_policy, robots_cache)
    assert b2.catalog.last_round() == 1
    b2.run(3)  # resumes at round 2

    assert _state(a) == _state(b2)
    shutil.rmtree(wd_a, ignore_errors=True)


def test_crash_mid_round_is_invisible(spark, pages, seeds, host_policy, robots_cache, workdir):
    eng = _engine(spark, workdir, pages, seeds, host_policy, robots_cache)
    eng.run(2)
    seen_before, log_before = _state(eng)

    # simulate a crash mid-round-2: delta written but round never committed
    frontier = eng.catalog.read_snapshot("frontier")
    eng.catalog.append_round("url_seen", eng.catalog.read_appended("url_seen").limit(1), 2)
    assert eng.catalog.last_round() == 1  # manifest untouched
    # reads are manifest-gated: the partial round=2 delta is invisible
    assert _state(eng) == (seen_before, log_before)

    # re-running round 2 overwrites the partial delta (idempotent)
    eng2 = _engine(eng.spark, workdir, pages, seeds, host_policy, robots_cache)
    eng2.run(3)
    assert eng2.catalog.last_round() == 2
    assert eng2.catalog.read_appended("url_seen").count() > len(seen_before)
    assert frontier is not None


def test_robots_disallow_enforced(spark, pages, seeds, host_policy, robots_cache, workdir):
    eng = _engine(spark, workdir, pages, seeds, host_policy, robots_cache)
    eng.run(3)
    log = eng.catalog.read_appended("fetch_log")
    robots = robots_cache.filter(F.size("disallow_prefixes") > 0).select("host").distinct()
    violations = (
        log.withColumn(
            "path", F.regexp_extract("canon_url", r"^[a-z]+://[^/]+(/[^?#]*)", 1)
        )
        .filter(F.col("path").startswith("/private/"))
        .join(robots, "host", "left_semi")
        .count()
    )
    assert violations == 0


def test_lineage_metrics_recorded(spark, pages, seeds, host_policy, robots_cache, workdir):
    eng = _engine(spark, workdir, pages, seeds, host_policy, robots_cache)
    eng.run(2)
    m = eng.catalog.read_appended("round_metrics")
    stages = {r.stage for r in m.select("stage").distinct().collect()}
    assert {"scheduled", "fetched"} <= stages
    assert m.filter(F.col("t_ms") <= 0).count() == 0
    # per-partition rows sum to the committed counters
    man = eng.catalog.manifest()
    for k in ("0", "1"):
        n_sched = (
            m.filter((F.col("round") == int(k)) & (F.col("stage") == "scheduled"))
            .agg(F.sum("n_rows"))
            .collect()[0][0]
        )
        assert n_sched == man["rounds"][k]["n_scheduled"]


def test_empty_seeds_zero_round(spark, pages, host_policy, robots_cache, tmp_path):
    """A crawl started from zero seeds runs its rounds without crashing and
    schedules nothing (S1 edge: empty scan)."""
    import datetime

    from webscraping_video_pipeline_spark.schemas import SEEDS

    empty = spark.createDataFrame([], SEEDS)
    eng = _engine(spark, str(tmp_path / "empty"), pages, empty, host_policy, robots_cache)
    rounds = eng.run(2)
    assert [r["n_scheduled"] for r in rounds] == [0, 0]
    assert eng.catalog.read_appended("fetch_log") is None or (
        eng.catalog.read_appended("fetch_log").count() == 0
    )


def test_junk_seed_urls_become_misses(spark, pages, host_policy, robots_cache, tmp_path):
    """Junk-but-parseable URLs flow through canonicalization and land in the
    fetch log as `miss` rows (F2 guard + S11 fetch-miss path) instead of
    crashing the round."""
    import datetime

    from webscraping_video_pipeline_spark.schemas import SEEDS

    ts = datetime.datetime(2025, 6, 1)
    junk = spark.createDataFrame(
        [
            ("https://no-such-host.example.zzz/" + "x" * 500, 1.0, "junk", ts),
            ("https://:@weird.example.com:443/%zz?=&", 0.5, "junk", ts),
            ("http://plain.example.com/ok path with spaces", 0.4, "junk", ts),
        ],
        SEEDS,
    )
    eng = _engine(spark, str(tmp_path / "junk"), pages, junk, host_policy, robots_cache)
    rounds = eng.run(1)
    log = eng.catalog.read_appended("fetch_log")
    n_miss = log.filter(F.col("status") == "miss").count()
    assert rounds[0]["n_scheduled"] >= 1
    assert n_miss == rounds[0]["n_scheduled"]  # none of these exist in pages
