"""bench_extract + bench_seen (the remaining rows of BASELINE.md's
measurement plan), appended to BENCH/BASELINE.md.

- bench_extract: distributed synthetic pages -> extract_text pandas UDF;
  reports pages/s AND the byte-identity pass rate vs the golden `text`
  column (must be 100%). Run at two parallelism levels via subprocesses
  (a local-mode JVM's parallelism is fixed at startup).
- bench_seen: url_seen at 10^7 hashes -> Bloom shard build (merge) + a
  10^6-candidate probe (bloom prefilter + exact anti-join backstop);
  reports build and probe throughput and bytes/shard.

Usage: python tools/aux_bench.py            # orchestrates both, appends md
       python tools/aux_bench.py extract N  # one measurement (JSON line)
       python tools/aux_bench.py seen N M
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_extract(n_pages: int) -> dict:
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.functions.extract import extract_text_udf
    from webscraping_video_pipeline_spark.session import get_spark
    from webscraping_video_pipeline_spark.synth import gen_pages_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extract", cpus=cpus)
    pages = gen_pages_spark(spark, n_pages).select("html", "text").cache()
    pages.count()  # materialize input so timing is extraction only

    def one() -> tuple[float, int, int]:
        t0 = time.monotonic()
        agg = (
            pages.withColumn("et", extract_text_udf(F.col("html")))
            .select(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("et") == F.col("text")).cast("long")).alias("n_identical"),
            )
            .collect()[0]
        )
        return time.monotonic() - t0, agg["n"], agg["n_identical"]

    one()  # warm codegen + python workers
    (dt1, n, ident), (dt2, _, _) = one(), one()
    dt = min(dt1, dt2)
    pages.unpersist()
    return {
        "bench": "extract",
        "cpus": cpus,
        "n_pages": n,
        "identical": ident,
        "identity_rate": ident / n,
        "sec": round(dt, 3),
        "pages_per_sec": round(n / dt, 1),
    }


def run_seen(n_seen: int, n_cands: int) -> dict:
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.operators.dedup import (
        build_bloom_shards,
        dedupe_against_seen,
    )
    from webscraping_video_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_seen", cpus=cpus)
    parts = spark.sparkContext.defaultParallelism
    n_shards = parts * 4

    seen = (
        spark.range(0, n_seen, 1, parts)
        .select(F.xxhash64("id").alias("url_hash"))
        .cache()
    )
    seen.count()
    # candidates: half overlap the seen set, half are new
    cands = (
        spark.range(0, n_cands, 1, parts)
        .select(
            F.when(F.col("id") % 2 == 0, F.xxhash64((F.col("id") / 2).cast("long")))
            .otherwise(F.xxhash64(F.col("id") + n_seen * 7 + 13))
            .alias("url_hash"),
            F.concat(F.lit("u"), F.col("id")).alias("canon_url"),
        )
        .cache()
    )
    cands.count()

    def build_once() -> tuple[float, int]:
        t0 = time.monotonic()
        shards = build_bloom_shards(seen, n_shards=n_shards).cache()
        total_bytes = shards.select(F.sum(F.length("bits"))).collect()[0][0]
        return time.monotonic() - t0, int(total_bytes), shards

    t_b1, total_bytes, shards1 = build_once()
    t_b2, _, shards = build_once()
    shards1.unpersist()
    t_build = min(t_b1, t_b2)

    def probe_once() -> tuple[float, int]:
        t0 = time.monotonic()
        fresh = dedupe_against_seen(cands, seen, shards, n_shards=n_shards)
        n_new = fresh.count()
        return time.monotonic() - t0, n_new

    probe_once()
    (dt1, n_new), (dt2, _) = probe_once(), probe_once()
    dt = min(dt1, dt2)
    seen.unpersist()
    cands.unpersist()
    shards.unpersist()
    return {
        "bench": "seen",
        "cpus": cpus,
        "n_seen": n_seen,
        "n_cands": n_cands,
        "n_new": n_new,
        "build_sec": round(t_build, 3),
        "build_keys_per_sec": round(n_seen / t_build, 1),
        "probe_sec": round(dt, 3),
        "probe_cands_per_sec": round(n_cands / dt, 1),
        "bytes_per_shard": total_bytes // n_shards,
        "n_shards": n_shards,
    }


def run_skew(n_urls: int, mega_pct: int = 40) -> dict:
    """Mega-host stress: ``mega_pct``% of the frontier on ONE host. Times
    the politeness schedule (per-host ranking) with salts=1 (naive window —
    the whole mega-host lands in one task) vs salts=16 (two-phase salted
    top-k), asserting identical output. The wall-clock gap is the skew
    evidence; at 10^10 the naive plan is a single-task straggler."""
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.operators.politeness import schedule_round
    from webscraping_video_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(app_name="bench_skew", cpus=cpus)
    parts = spark.sparkContext.defaultParallelism
    hosts = 200
    host = (
        F.when(F.col("id") % 100 < mega_pct, F.lit("mega.example.com"))
        .otherwise(F.concat(F.lit("h"), F.pmod(F.xxhash64("id"), F.lit(hosts)), F.lit(".example.com")))
    )
    cands = (
        spark.range(0, n_urls, 1, parts)
        .select(
            host.alias("host"),
            F.concat(F.lit("https://x/p/"), F.col("id")).alias("canon_url"),
        )
        .withColumn("url_hash", F.xxhash64("canon_url"))
        .withColumn("priority", (F.pmod(F.xxhash64("url_hash"), F.lit(1000)) / 1000.0))
        .cache()
    )
    cands.count()
    policy = spark.createDataFrame(
        [("mega.example.com", 0.5, 64, 3)], "host string, crawl_delay_s double, bucket_capacity int, max_errors int"
    )

    def timed(salts: int) -> tuple[float, int]:
        sched = schedule_round(cands, policy, "2025-06-01 00:00:00", salts=salts)
        sched.count()  # warm
        t0 = time.monotonic()
        n = sched.count()
        return time.monotonic() - t0, n

    t_salted, n_salted = timed(16)
    t_naive, n_naive = timed(1)
    assert n_salted == n_naive, (n_salted, n_naive)
    cands.unpersist()
    return {
        "bench": "skew",
        "cpus": cpus,
        "n_urls": n_urls,
        "mega_share": mega_pct / 100,
        "scheduled": n_salted,
        "naive_sec": round(t_naive, 3),
        "salted_sec": round(t_salted, 3),
        "speedup": round(t_naive / t_salted, 2),
    }


def run_corpus(n_docs: int) -> dict:
    """Corpus-ops headroom: synthesize n_docs documents ENTIRELY JVM-side
    (deterministic word sequences from doc_id — same vocabulary shape as
    the testdata `documents` table), write them as a documents.parquet
    dir, and time the q58/q59/q60/q64 contract queries on it unchanged.
    This is the evidence the 500-row testdata can't give: the quality
    pack at scan speed and the chunk dedup's single shuffle at millions
    of documents."""
    import shutil

    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.contract import QUERIES
    from webscraping_video_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # BENCH_CORPUS_WORDS scales doc length (default 1x = 30-100 words);
    # the q64-vs-q66 crossover depends on it: hash-key dedup wins only
    # once chunk-text shuffle bytes bind (longer docs / loaded box).
    mult = int(os.environ.get("BENCH_CORPUS_WORDS", "1"))
    spark = get_spark(app_name="bench_corpus", cpus=cpus)
    workdir = "/tmp/corpus_bench"
    shutil.rmtree(workdir, ignore_errors=True)
    vocab = (
        "the a table scan slow fast key agg row hash value part merge batch "
        "spark window sort line order data column join small customer query "
        "big stream group vector filter dup"
    ).split()
    varr = F.array(*[F.lit(w) for w in vocab])
    d = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), (F.lit(30 * mult) + F.pmod(F.xxhash64("id"), F.lit(71 * mult))).cast("int")),
                    lambda i: F.element_at(varr, (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(len(vocab))) + 1).cast("int")),
                ),
                " ",
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    d.write.mode("overwrite").parquet(f"{workdir}/documents.parquet")

    timings: dict[str, float] = {}
    for name in (
        "q58_gopher_quality_rules",
        "q59_pii_scrub",
        "q60_ngram_decontamination",
        "q64_first_occurrence_chunk_dedup",
        "q66_chunk_dedup_hashkey",
        "q68_sequence_packing",
        "q70_intradoc_chunk_dedup",
        "q71_temperature_mix_weights",
        "q126_content_spam_features",
        "q137_line_density_boilerplate",
        "q164_cdc_chunk_dedup",
    ):
        fn = QUERIES[name]
        fn(spark, workdir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, workdir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 2)
    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "bench": "corpus",
        "cpus": cpus,
        "words_mult": mult,
        "n_docs": n_docs,
        "sec": timings,
        "docs_per_sec": {k: round(n_docs / v) for k, v in timings.items()},
    }


def run_ann(n_vecs: int, k: int) -> dict:
    """Centroid-assignment A/B at quantizer size ``k``: literal-embedded
    centroid expressions (q62's tactic — the k*dim literals live in the
    expression tree, so analysis/codegen cost grows with k and the plan
    ships with every task) vs the centroid-TABLE join
    (operators/kmeans.py::assign_cells_dot — the path that scales to
    10^3+ IVF cells). Identical decimal-fold math on both sides; outputs
    asserted cell-identical before timings are reported."""
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.operators.kmeans import (
        assign_cells_dot,
        assign_cells_np,
        seed_centroids,
    )
    from webscraping_video_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_ann", cpus=cpus)
    parts = spark.sparkContext.defaultParallelism
    dim = 64
    e = (
        spark.range(0, n_vecs, 1, parts)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(2000)) / 1000.0
                - 1.0,
            ).alias("v"),
        )
        .cache()
    )
    e.count()
    cents = seed_centroids(e, k).localCheckpoint()  # k rows, pinned
    cent_rows = sorted((r["cell"], list(r["c"])) for r in cents.collect())

    def dec_dot_lit(vals) -> F.Column:
        arr = F.array(*[F.lit(float(x)) for x in vals])
        return F.aggregate(
            F.zip_with(F.col("v"), arr, lambda x, y: (x * y).cast("decimal(27,12)")),
            F.lit(0).cast("decimal(27,12)"),
            lambda acc, pr: (acc + pr).cast("decimal(27,12)"),
        ).cast("double")

    def literal_assign():
        cdots = F.array(
            *[
                F.struct((-dec_dot_lit(cv)).alias("nd"), F.lit(cid).alias("cell"))
                for cid, cv in cent_rows
            ]
        )
        return e.select("vec_id", F.array_min(cdots)["cell"].alias("cell"))

    join_out = assign_cells_dot(e, cents)
    lit_out = literal_assign()
    n_mismatch = (
        join_out.alias("a")
        .join(lit_out.alias("b"), "vec_id")
        .filter(F.col("a.cell") != F.col("b.cell"))
        .count()
    )
    assert n_mismatch == 0, f"{n_mismatch} assignment mismatches"

    def one(df_fn) -> float:
        t0 = time.monotonic()
        # build the frame INSIDE the timed region: the literal path's
        # k*dim-literal analysis/codegen is part of its real cost
        df_fn().groupBy("cell").count().write.format("noop").mode(
            "overwrite"
        ).save()
        return time.monotonic() - t0

    # arms INTERLEAVED A/B/C per rep (shared-VM speed drifts on minute
    # scales; sequential per-arm timing hands one arm a slow window),
    # best-of-reps per arm. np = float64 numpy matmul argmin (squared-L2
    # metric — not output-identical to the dot argmin, so timed only; its
    # exact-path equivalence is pinned by tests/test_round4_fixes.py).
    arms = {
        "join": lambda: assign_cells_dot(e, cents),
        "lit": literal_assign,
        "np": lambda: assign_cells_np(e, cents),
    }
    best = {a: float("inf") for a in arms}
    for _ in range(3):
        for a, fn in arms.items():
            best[a] = min(best[a], one(fn))
    t_join, t_lit, t_np = best["join"], best["lit"], best["np"]
    e.unpersist()
    return {
        "bench": "ann_assign",
        "cpus": cpus,
        "n_vecs": n_vecs,
        "k": k,
        "dim": dim,
        "literal_sec": round(t_lit, 3),
        "join_sec": round(t_join, 3),
        "np_sec": round(t_np, 3),
        "lit_over_join": round(t_lit / t_join, 2),
        "join_over_np": round(t_join / t_np, 2),
    }


def run_ann_ladder(reps: int = 3) -> dict:
    """Interleaved timing of the trained-ANN ladder q74-q79 (+ q62)
    at sf0.1 — the round-4 VERDICT asked for drift-controlled medians of
    the slowest queries: every rep runs ALL queries round-robin, so each
    arm samples the same drifting host windows; the per-query median is
    then comparable across rounds even when the box's absolute speed
    wanders (see BENCH/BASELINE.md's drift section)."""
    from webscraping_video_pipeline_spark.contract import QUERIES
    from webscraping_video_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_ann_ladder", cpus=cpus)
    ladder = [
        "q74_kmeans_ivf_assign",
        "q75_ann_ivf_trained_topk",
        "q77_ann_pq_adc_rerank",
        "q79_ann_ivfpq_residual",
        "q62_semantic_dedup",
        "q76_scene_cut_detection",
    ]
    times: dict[str, list[float]] = {q: [] for q in ladder}
    for q in ladder:  # warmup: JIT, parquet footer cache, Python workers
        QUERIES[q](spark, sf_dir).count()
    for _ in range(reps):
        for q in ladder:
            t0 = time.monotonic()
            QUERIES[q](spark, sf_dir).count()
            times[q].append(round(time.monotonic() - t0, 2))
    med = {q: sorted(ts)[len(ts) // 2] for q, ts in times.items()}
    return {
        "bench": "ann_ladder",
        "cpus": cpus,
        "sf_dir": sf_dir,
        "reps": reps,
        "median_sec": med,
        "all_sec": times,
    }


def _sub(args: list[str], cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "aux_bench.py"), *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "extract":
        print(json.dumps(run_extract(int(sys.argv[2]))))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "seen":
        print(json.dumps(run_seen(int(sys.argv[2]), int(sys.argv[3]))))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "corpus":
        print(json.dumps(run_corpus(int(sys.argv[2]))))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        print(json.dumps(run_skew(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 40)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ann_ladder":
        print(json.dumps(run_ann_ladder(int(sys.argv[2]) if len(sys.argv) > 2 else 3)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ann":
        print(json.dumps(run_ann(int(sys.argv[2]), int(sys.argv[3]))))
        return

    # standalone sweep (scaling_bench.py is the BENCH/BASELINE.md writer);
    # 4/16 keeps task threads + their Python workers within the 32 cores
    n_pages = int(os.environ.get("BENCH_EXTRACT_PAGES", "200000"))
    for r in (
        _sub(["extract", str(n_pages)], 4),
        _sub(["extract", str(n_pages)], 16),
        _sub(["seen", "10000000", "1000000"], 16),
    ):
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
