#!/usr/bin/env bash
# Round-3 perf matrix: run bench.py over the serving-mode configs, one
# chip job at a time (two processes sharing the chip starve/hang —
# docs/ROADMAP.md). Each line of /tmp/perf_matrix.log is one config's
# JSON. Usage: bash tools/perf_matrix.sh [logfile]
set -u
LOG=${1:-/tmp/perf_matrix.log}
cd "$(dirname "$0")/.."
: > "$LOG"

run() { # name [VAR=VAL ...]  — args must be env assignments only
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  env BENCH_SKIP_SELFTEST=1 BENCH_SKIP_REALISM=1 BENCH_SKIP_LATENCY=1 "$@" \
    timeout 900 python bench.py >> "$LOG" 2>&1
  echo "exit=$?" >> "$LOG"
}

# headline reproduction first (sanity that the chip is healthy)
run mad_default
# dispatch amortization
run mad_chunk8  BENCH_CHUNK=8
run mad_chunk25 BENCH_CHUNK=25
run mad_chunk8_unrolled BENCH_CHUNK=8 BENCH_CHUNK_UNROLL=8
# bf16 activations between convs
run mad_bf16act BENCH_PRECISION=bf16_act
run mad_bf16act_chunk8 BENCH_PRECISION=bf16_act BENCH_CHUNK=8
# pure inference
run none_default BENCH_MODE=NONE
run none_nometrics BENCH_MODE=NONE BENCH_NO_METRICS=1
run none_nometrics_chunk8 BENCH_MODE=NONE BENCH_NO_METRICS=1 BENCH_CHUNK=8
# multi-stream serving (VERDICT r2 #3: target >=170 total FPS at 4 streams)
run streams4_map BENCH_STREAMS=4
run streams4_map_chunk8 BENCH_STREAMS=4 BENCH_CHUNK=8
run streams4_unroll BENCH_STREAMS=4 BENCH_STREAM_IMPL=unroll
run streams4_unroll_chunk4 BENCH_STREAMS=4 BENCH_STREAM_IMPL=unroll BENCH_CHUNK=4
echo "done $(date +%H:%M:%S)" | tee -a "$LOG"
