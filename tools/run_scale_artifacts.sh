#!/bin/bash
# Round scale-artifact runner: the standing HEADLINE-change rule says every
# bench/spill artifact is re-run SOLO in one session, sentinel-checked, with
# loadavg decay waited out between back-to-back sweeps (README "Bench
# validity"; the second of two adjacent sweeps otherwise inherits the
# first's decaying 1-minute load). Run with nothing else on the box.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/scale_artifacts.log
: > "$LOG"

wait_idle() {
  # wait (up to 12 min) for the 1-minute loadavg to decay below 4
  for i in $(seq 1 72); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $L < 4.0 else 0)")
    [ "$ok" = "1" ] && { echo "idle at load=$L" >> "$LOG"; return 0; }
    sleep 10
  done
  echo "WARN: load never decayed below 4 ($L)" >> "$LOG"
}

check() {
  # sentinel check on a full record: reject cal>0.7, pre-load>16, steal>8
  python3 - "$1" <<'EOF'
import json, sys
rec = json.load(open(sys.argv[1]))
bad = []
if max(rec["cal"]) > 0.7: bad.append(f"cal={rec['cal']}")
if rec["load"][0] > 16: bad.append(f"load0={rec['load'][0]}")
if rec.get("steal", 0) > 8.0: bad.append(f"steal={rec['steal']}")
print(f"{sys.argv[1]}: value={rec['value']} load={rec['load']} cal={rec['cal']} shuf={rec['shuf']} steal={rec.get('steal')}"
      + (f"  REJECT: {bad}" if bad else "  sentinel-OK"))
sys.exit(1 if bad else 0)
EOF
}

bench_run() {  # $1=sf_dir $2=out
  wait_idle
  echo "=== bench $2 ($1) $(date +%T)" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_OUT="$2" python bench.py >> "$LOG" 2>&1
  check "$2" >> "$LOG" 2>&1 || {
    echo "RETRY $2 after sentinel reject" >> "$LOG"
    wait_idle
    SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_OUT="$2" python bench.py >> "$LOG" 2>&1
    check "$2" >> "$LOG" 2>&1 || {
      # round-10 advice: a twice-rejected record must never sit at the
      # committed artifact path looking valid — quarantine it under a
      # .rejected name and make the failure visible at the shell
      echo "FATAL: $2 rejected twice -> $2.rejected" >> "$LOG"
      mv "$2" "$2.rejected"
      FAILED=1
    }
  }
}
FAILED=0

spill_run() {  # $1=sf_dir $2=out
  wait_idle
  echo "=== spill $2 ($1) $(date +%T)" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$1" python tools/spill_probe.py 8g 0.05 2>> "$LOG" \
    | grep '^{' | tail -1 > "$2"
  python3 -c "import json,sys; r=json.load(open('$2')); print('$2: completed', r['completed'], 'failed', r['failed'])" >> "$LOG"
}

# Round-11: ONE 16x sweep (verdict next-round #8 asks for one clean
# sentinel-valid record; the round-10 run-to-run band evidence —
# BENCH_16x_b/c.json — stays committed from round 10).
bench_run /root/testdata/sf0.1 BENCH_1x_r11.json
bench_run /tmp/scale_sf0.1_4x BENCH_4x.json
bench_run /tmp/scale_sf0.1_16x BENCH_16x.json
spill_run /tmp/scale_sf0.1_4x SPILL_4x.json
spill_run /tmp/scale_sf0.1_16x SPILL_16x.json
echo "ALL DONE failed=$FAILED $(date +%T)" >> "$LOG"
exit "$FAILED"
