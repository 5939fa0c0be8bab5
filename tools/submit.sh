#!/usr/bin/env bash
# Two-cluster-size crawl run via spark-submit --py-files (north rule).
#
# On a real cluster set MASTER_N / MASTER_4N to executor sizings, e.g.
#   SUBMIT_FLAGS_N="--num-executors 8 --executor-cores 4"
#   SUBMIT_FLAGS_4N="--num-executors 32 --executor-cores 4"
# In this sandbox the two sizes are local[2] and local[8] masters
# (separate JVM processes, same input) — see BENCH/BASELINE.md for why
# sub-saturation pairings are the honest single-box stand-in.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUNDS="${ROUNDS:-3}"
PAGES="${SYNTH_PAGES:-2000}"
MASTER_N="${MASTER_N:-local[2]}"
MASTER_4N="${MASTER_4N:-local[8]}"
SUBMIT_FLAGS_N="${SUBMIT_FLAGS_N:---master $MASTER_N}"
SUBMIT_FLAGS_4N="${SUBMIT_FLAGS_4N:---master $MASTER_4N}"

ZIP=$(mktemp -d)/engine.zip
zip -qr "$ZIP" webscraping_video_pipeline_spark

run() { # $1 = label, $2 = submit flags
  local wd
  wd=$(mktemp -d)/crawl
  # shellcheck disable=SC2086
  spark-submit $2 --py-files "$ZIP" tools/submit_crawl.py \
    --workdir "$wd" --rounds "$ROUNDS" --synth-pages "$PAGES" \
    2>/dev/null | tail -1 | sed "s/^/$1 /"
}

run "N " "$SUBMIT_FLAGS_N"
run "4N" "$SUBMIT_FLAGS_4N"
