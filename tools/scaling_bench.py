"""Two-cluster-size scaling evidence (BASELINE.md): run the identical
frontier job at local[8] and local[32] in separate processes (a JVM's
local-mode parallelism is fixed at startup), report throughput at both and
efficiency = (T8/T32)/4 == (rate32/rate8)/4, and write BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_urls] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_at(cpus: int, n_urls: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_QUERIES="none",
        BENCH_FRONTIER_URLS=str(n_urls),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    results = {}
    for cpus in (8, 32):
        r = run_at(cpus, n_urls, sf_dir)
        results[cpus] = r["frontier"]
        print(f"local[{cpus}]: {r['frontier']}", flush=True)

    r8, r32 = results[8]["urls_per_sec"], results[32]["urls_per_sec"]
    eff = (r32 / r8) / 4.0
    md = f"""# BENCH/BASELINE.md — measured engine numbers

## Two-parallelism scaling (stands in for N vs 4N executors)

Same job, same input, same seed: the engine's round plan
(canonicalize -> Bloom-sharded dedupe vs a 50%-overlap seen set ->
politeness schedule) over a {n_urls:,}-URL synthetic frontier, 200 hosts.
Run via separate processes because a local-mode JVM's parallelism is fixed
at startup; on a real cluster this is `spark-submit --py-files` at N and 4N
executors (see README).

| parallelism | wall s | URLs/s |
|---|---|---|
| local[8]  (N)  | {results[8]['sec']:.2f} | {r8:,.0f} |
| local[32] (4N) | {results[32]['sec']:.2f} | {r32:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.3f}**  (target >= 0.8; ratio/4)

Caveat: local[8] and local[32] share one machine's memory bandwidth and
disk, so this under-states true multi-node scaling where each executor
brings its own memory channels and spindles; the frontier job shuffles
only by (shard, host) with map-side-combined aggregates, so its network
volume per URL is O(1) and independent of cluster size.

## North metric

frontier URLs scheduled+deduped per second at local[32]: **{r32:,.0f} URLs/s**
(dedupe is exact: Bloom pre-filter + left-anti backstop).
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
