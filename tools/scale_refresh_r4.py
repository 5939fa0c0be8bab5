"""Round-4 N->4N scaling refresh (north_rule evidence, re-measured each
round): the identical 2M-URL frontier job at interleaved parallelism
levels in separate JVMs, best-of-(outer x inner) per level, plus the
pure-CPU zero-communication control at the sub-saturation pairing.
Prints one JSON line; the numbers land in BENCH/BASELINE.md's round-4
section (the full BASELINE.md rewrite stays with tools/scaling_bench.py).

Usage: python tools/scale_refresh_r4.py [n_urls] [outer_reps]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scaling_bench import machine_ceiling_rates, run_frontier  # noqa: E402

LEVELS = (1, 2, 4, 8)
EFF_PAIRS = ((1, 4), (2, 8))


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    outer = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    fr: dict[int, dict] = {}
    for rep in range(outer):
        for cpus in LEVELS:
            r = run_frontier(cpus, n_urls, reps=2)
            if cpus not in fr or r["urls_per_sec"] > fr[cpus]["urls_per_sec"]:
                fr[cpus] = r
            print(
                f"rep{rep} local[{cpus}]: {r['urls_per_sec']:,.0f} URLs/s",
                file=sys.stderr,
                flush=True,
            )
    ceil = machine_ceiling_rates((1, 4), reps=2)
    out = {
        "bench": "scale_refresh_r4",
        "n_urls": n_urls,
        "urls_per_sec": {str(c): round(fr[c]["urls_per_sec"], 1) for c in LEVELS},
        "eff": {
            f"{a}->{b}": round(fr[b]["urls_per_sec"] / fr[a]["urls_per_sec"] / 4, 3)
            for a, b in EFF_PAIRS
        },
        "ceiling_pages_per_sec": {str(c): round(v, 1) for c, v in ceil.items()},
        "ceiling_eff_1_4": round(ceil[4] / ceil[1] / 4, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
