"""Cluster entrypoint: the crawl engine under ``spark-submit --py-files``.

This is the invocation the north rule names — the same `CrawlEngine` the
tests drive, launched on a real cluster at two cluster sizes:

    zip -r engine.zip webscraping_video_pipeline_spark
    spark-submit --py-files engine.zip \\
        --num-executors 8  --executor-cores 4 tools/submit_crawl.py \\
        --workdir hdfs://.../crawl_N --pages hdfs://.../pages \\
        --seeds hdfs://.../seeds --host-policy hdfs://.../host_policy \\
        --robots hdfs://.../robots_cache --rounds 5
    spark-submit --py-files engine.zip \\
        --num-executors 32 --executor-cores 4 tools/submit_crawl.py \\
        --workdir hdfs://.../crawl_4N ... --rounds 5

Each run prints ONE JSON line with per-round counters and overall
URLs/s; scaling efficiency = (rate_4N / rate_N) / 4. In this sandbox the
same script is smoke-run via ``spark-submit --master local[8]`` (see
tools/submit.sh); on a cluster the master/executor flags do the sizing —
the job code is identical, which is the point.

Without ``--pages`` the job synthesizes a small deterministic corpus on
the driver (smoke mode); real runs point all four inputs at parquet (or,
with an Iceberg runtime jar on the classpath, Iceberg) tables.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# when launched by spark-submit the package arrives via --py-files on the
# executors; on the driver, running from a repo checkout, add the repo root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True, help="checkpoint/catalog root")
    ap.add_argument("--pages", help="pages table path (parquet)")
    ap.add_argument("--seeds", help="seeds table path (parquet)")
    ap.add_argument("--host-policy", help="host_policy table path (parquet)")
    ap.add_argument("--robots", help="robots_cache table path (parquet)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--synth-pages", type=int, default=2000, help="smoke-mode corpus size")
    ap.add_argument("--synth-seeds", type=int, default=400, help="smoke-mode seed count")
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--salts", type=int, default=16)
    ap.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # master / executor count / memory all come from spark-submit flags
    spark = SparkSession.builder.appName("crawl-frontier").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from webscraping_video_pipeline_spark import schemas, synth
    from webscraping_video_pipeline_spark.plans.crawl import CrawlConfig, CrawlEngine

    if args.pages:
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        host_policy = spark.read.parquet(args.host_policy)
        robots = spark.read.parquet(args.robots)
        mode = "parquet"
    else:
        n = args.synth_pages
        pages = spark.createDataFrame(synth.gen_pages_pdf(n), schema=schemas.PAGES)
        seeds = spark.createDataFrame(
            synth.gen_seeds_pdf(args.synth_seeds, n), schema=schemas.SEEDS
        )
        host_policy = spark.createDataFrame(
            synth.gen_host_policy_pdf(n), schema=schemas.HOST_POLICY
        )
        robots = spark.createDataFrame(synth.gen_robots_pdf(n), schema=schemas.ROBOTS_CACHE)
        mode = f"synth({n})"

    cfg = CrawlConfig(
        n_shards=args.n_shards, salts=args.salts, seen_filter=args.seen_filter
    )
    eng = CrawlEngine(spark, args.workdir, pages, seeds, host_policy, robots, cfg)
    t0 = time.monotonic()
    rounds = eng.run(args.rounds)
    dt = time.monotonic() - t0
    n_scheduled = sum(r["n_scheduled"] for r in rounds)
    print(
        json.dumps(
            {
                "mode": mode,
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "rounds": rounds,
                "wall_s": round(dt, 2),
                "urls_per_sec": round(n_scheduled / dt, 1) if dt else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
