"""Same-host drift control + N->4N refresh for a round's BENCH entry.

Interleaves (A/B/A/B...) the frontier bench across: a PINNED older tree
(git worktree of a given commit), and the CURRENT tree at several
parallelism levels. Interleaving means every config samples the same
drifting host windows, so the tree-vs-tree ratio and the N->4N ratio are
like-for-like even when the box's absolute speed wanders 2x.

Usage: python tools/drift_bench.py <old_commit> [n_urls] [reps]
Prints one JSON line per run plus a summary JSON; numbers are then
recorded in BENCH/BASELINE.md's drift section by hand.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_frontier(tree: Path, cpus: int, n_urls: int, inner_reps: int = 2) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        BENCH_QUERIES="none",
        BENCH_FRONTIER_URLS=str(n_urls),
        BENCH_FRONTIER_REPS=str(inner_reps),
        PYTHONPATH=str(tree),
    )
    out = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=tree,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        return {"error": out.stderr[-500:]}
    return json.loads(lines[-1])["frontier"]


def main() -> None:
    old_commit = sys.argv[1]
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    old_tree = Path("/tmp/drift_tree")
    if not old_tree.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(old_tree), old_commit],
            cwd=REPO, check=True, capture_output=True,
        )

    # config -> (tree, cpus); r2-tree control runs at 32 (the BENCH_r* config),
    # current tree at the N->4N pairs (1,4) sub-saturation + (8,32) driver pair
    configs = {
        f"old@32": (old_tree, 32),
        "cur@32": (REPO, 32),
        "cur@8": (REPO, 8),
        "cur@1": (REPO, 1),
        "cur@4": (REPO, 4),
    }
    best: dict[str, dict] = {}
    for rep in range(reps):
        for name, (tree, cpus) in configs.items():
            r = run_frontier(tree, cpus, n_urls)
            if "error" in r:
                print(f"{name} rep{rep} ERROR: {r['error']}", flush=True)
                continue
            if name not in best or r["urls_per_sec"] > best[name]["urls_per_sec"]:
                best[name] = r
            print(
                f"{name} rep{rep}: {r['urls_per_sec']:,.0f} urls/s "
                f"(median {r.get('urls_per_sec_median', 0):,.0f}, {time.strftime('%H:%M:%S')})",
                flush=True,
            )
    summary = {
        name: {
            "urls_per_sec": round(b["urls_per_sec"], 1),
            "urls_per_sec_median": round(b.get("urls_per_sec_median", 0), 1),
            "sec": b["sec"],
        }
        for name, b in best.items()
    }
    if "cur@1" in best and "cur@4" in best:
        summary["eff_1_4"] = round(
            best["cur@4"]["urls_per_sec"] / best["cur@1"]["urls_per_sec"] / 4, 3
        )
    if "cur@8" in best and "cur@32" in best:
        summary["eff_8_32"] = round(
            best["cur@32"]["urls_per_sec"] / best["cur@8"]["urls_per_sec"] / 4, 3
        )
    if "old@32" in best and "cur@32" in best:
        summary["cur_vs_old_same_host"] = round(
            best["cur@32"]["urls_per_sec"] / best["old@32"]["urls_per_sec"], 3
        )
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
