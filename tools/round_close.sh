#!/bin/bash
# Standing round-close sweep (VERDICT r14 items 5/8, institutionalized):
#   1. full ScalaTest suite
#   2. full Verify at sf0.01 + DuckDB differential + dtype sweep
#   3. the same Verify once under ANSI mode (silent-null arithmetic
#      becomes loud errors)
#   4. Bench at sf0.1 with the per-query map snapshotted to
#      bench/attribution_r<N>.json (diffable by a reader with no
#      builder context — the rolling attribution.json keeps moving)
#   5. Bench at sf1 (tools/make_sf1.py output) refreshing
#      bench/BENCH_sf1.json + bench/attribution_sf1.json, then
#      compare_bench triage vs the fresh sf0.1 numbers
# Usage: tools/round_close.sh <roundNumber>
set -euo pipefail
cd /root/repo
R="${1:?usage: tools/round_close.sh <roundNumber>}"

echo "== [1/5] sbt test"
sbt -batch test 2>&1 | tail -4

echo "== [2/5] Verify @ sf0.01 + differential + dtype sweep"
SPARK_GRAFT_CPUS=16 tools/run.sh graft.Verify /root/testdata/sf0.01 target/verify_close
# per-query map committed as the round's own correctness evidence
# (r18: the driver's CORRECTNESS artifact arrived empty — the repo
# must not depend on driver-side delivery for the hard signal)
python3 tools/verify_local.py /root/testdata/sf0.01 target/verify_close \
  "bench/correctness_r${R}_local.json" | tail -4
if grep -q '"hash_match": false' "bench/correctness_r${R}_local.json"; then
  echo "correctness snapshot has failures — failing the close"
  grep -B1 '"hash_match": false' "bench/correctness_r${R}_local.json" | head -20
  exit 1
fi
python3 tools/dtype_sweep.py /root/testdata/sf0.01 target/verify_close | tail -4

echo "== [3/5] Verify @ sf0.01 under ANSI mode"
# Capture the Verify exit code explicitly: under pipefail a crashed run
# piped into grep used to print "0 errors" and continue — this step must
# GATE like steps 1-2, not merely detect (r15 ADVICE).
ansi_log=/tmp/verify_ansi_close.log
set +e
SPARK_GRAFT_ANSI=true SPARK_GRAFT_CPUS=16 \
  tools/run.sh graft.Verify /root/testdata/sf0.01 target/verify_ansi_close \
  > "$ansi_log" 2>&1
ansi_rc=$?
set -e
if [ "$ansi_rc" -ne 0 ]; then
  echo "ANSI Verify CRASHED (exit $ansi_rc) — tail of $ansi_log:"
  tail -20 "$ansi_log"
  exit 1
fi
if grep "\[verify\]" "$ansi_log"; then
  echo "ANSI sweep: per-query errors above — failing the close"
  exit 1
fi
echo "ANSI sweep: 0 errors"

echo "== [4/5] Bench @ sf0.1"
# Bench now prints (attribution, FULL totals, compact totals) as its
# last three lines and persists the full totals to bench/totals.json;
# keep all three so compare_bench finds the full map
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.Bench 2>/dev/null | tail -3 > "/tmp/bench_sf01_r$R.txt"
cp bench/attribution.json "bench/attribution_r$R.json"
cp bench/totals.json "bench/totals_r$R.json"
tail -1 "/tmp/bench_sf01_r$R.txt" | head -c 800; echo
# two-sweep discipline (r19 VERDICT item 8): when a pre-close sweep A
# snapshot exists, record BOTH sweeps' totals side by side and name the
# number-of-record, so the judge never re-derives the slot decomposition
if [ -f "bench/totals_r${R}_sweepA.json" ]; then
  python3 - "$R" <<'PYEOF'
import json, sys
r = sys.argv[1]
a = json.load(open(f"bench/totals_r{r}_sweepA.json"))
b = json.load(open("bench/totals.json"))
rec = "A" if a["value"] <= b["value"] else "B"
json.dump({"round": int(r), "sweep_a_total_sec": a["value"],
           "sweep_b_total_sec": b["value"], "record": rec,
           "note": "two independent sf0.1 sweeps of the same HEAD; the"
                   " smaller total is the number-of-record, the gap is"
                   " slot drift (r19 proved up to 25% wall at flat cpu)"},
          open(f"bench/sweeps_r{r}.json", "w"), indent=1)
print(f"sweeps_r{r}.json: A={a['value']}s B={b['value']}s record={rec}")
PYEOF
fi
prev=$((R-1))
if [ -f "bench/attribution_r$prev.json" ]; then
  echo "-- round-over-round triage vs r$prev (jobs + cpuMs classes; paste"
  echo "-- the table into PLANS.md — r18 VERDICT item 8)"
  python3 tools/triage_bench.py "bench/attribution_r$prev.json" \
    "bench/attribution_r$R.json" | tail -40
fi

echo "== [5/5] Bench @ sf1 + triage"
if [ -d target/sf1 ]; then
  SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Bench 2>/dev/null | tail -3 > /tmp/bench_sf1_raw.txt
  # the copy below only makes sense if the sf1 run actually rewrote
  # totals.json (r19 ADVICE: a swallowed persist failure would snapshot
  # the earlier sf0.1 totals as the official sf1 record — Bench now
  # also fails loudly on a persist failure, this is belt-and-braces)
  grep -q '"sf":"target/sf1"' bench/totals.json || {
    echo "bench/totals.json is not the sf1 run — refusing to snapshot"; exit 1; }
  cp bench/totals.json bench/BENCH_sf1.json   # the FULL totals line
  cp bench/attribution.json bench/attribution_sf1.json
  # compare the min-of-two totals lines (the ones carrying "queries")
  python3 tools/compare_bench.py "/tmp/bench_sf01_r$R.txt" \
    bench/BENCH_sf1.json 10 | tail -20
else
  echo "target/sf1 missing — run: python3 tools/make_sf1.py"
fi
echo "== round_close done — triage superlinear flags into PLANS.md"
