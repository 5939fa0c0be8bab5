"""Round-6 optimization harness (guide §1.4): time individual contract
queries with the noop sink, isolated from bench.py (which is FROZEN for
driver measurement).

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain PATH_DIR] q62_semantic_dedup ...

Prints one JSON line: {"sf": ..., "queries": {name: best_sec}, "samples": {...}}.
With --explain DIR, also writes DIR/<name>.txt containing
df.explain("formatted") output for each query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from webscraping_video_pipeline_spark.contract import QUERIES
    from webscraping_video_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cpus=args.cpus)
    for tname in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{args.sf}/{tname}.parquet").count()

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm and os.path.isdir(warm_dir) and warm_dir != args.sf:
        for name in args.names:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in args.names:
        fn = QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = min(ts)
        samples[name] = ts
        print(f"## {name}: {ts}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "queries": timings,
                      "samples": samples, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
