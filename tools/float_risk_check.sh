#!/usr/bin/env bash
# OFF-TIER FLOAT-RISK CROSS-CHECK (r13 verdict items 3 + 5).
#
# The r13 q19c/q19d bug class: a float-deriving query can be
# hash-green at the sf0.01 gate tier while the decimal→double cast of
# a large scaled moment double-rounds DIFFERENTLY in DuckDB vs the
# JVM at another data size — the byte-deterministic per-round fixture
# masks the divergence until a size change happens to trip it. That
# bug was caught by a MANUAL sf0.001 run; this script mechanizes the
# lesson as part of tools/round_close.sh:
#
#   1. Run the float-risk Verify subset + check.py at sf0.001 AND
#      sf0.1 (the two tiers the sf0.01 gate does not see).
#   2. Generate a RESEEDED sf0.001-equivalent fixture (seed = round
#      number, i.e. a fresh value stream every round) and run the
#      same subset against it — re-rolling the data magnitudes a
#      fixed fixture would pin.
#
# Subset = the derived-statistic queries where cross-engine float
# evaluation genuinely differs (the r13 judge's list, ~3 min total).
# Red test: planting a 1-ulp divergence (e.g. rounding one side at 13
# significant digits instead of 12 in q19c) makes check.py FAIL the
# entry by name at the off-tiers — demonstrated r14, see BENCH_NOTES.
#
# FLOAT_SEED=n overrides the round-number seed for reproduction.
set -uo pipefail
cd "$(dirname "$0")/.."

SUBSET="q19c_stats q19d_regression q19g_percentile q19j_theilsen q19l_ks q34e_acf q14b_distribution"
# seed: one per round — the count of committed per-round correctness
# artifacts is the round number, deterministic within a round
SEED="${FLOAT_SEED:-$(ls CORRECTNESS_r*.json 2>/dev/null | wc -l)}"
fail=0

run_subset() { # $1 = fixture dir, $2 = tag
  local out="/tmp/float_risk_$2"
  rm -rf "$out"
  if ! tools/run_main.sh graft.Verify "$1" "$out" $SUBSET \
      2>"/tmp/float_risk_$2.err"; then
    echo "FLOAT-RISK FAIL [$2]: Verify died (/tmp/float_risk_$2.err)"
    fail=1
    return
  fi
  if ! python3 tools/check.py "$out" "$1" $SUBSET; then
    echo "FLOAT-RISK FAIL [$2]: oracle mismatch at $1"
    fail=1
  fi
}

echo "[float-risk] subset: $SUBSET"
run_subset /root/testdata/sf0.001 sf0001
run_subset /root/testdata/sf0.1 sf01

echo "[float-risk] reseeded fixture (seed=$SEED)..."
FIX="/tmp/float_fixture_seed$SEED"
if tools/run_main.sh graft.FloatFixture "$FIX" "$SEED" \
    2>"/tmp/float_fixture.err"; then
  run_subset "$FIX" "seed$SEED"
else
  echo "FLOAT-RISK FAIL: fixture generation died (/tmp/float_fixture.err)"
  fail=1
fi

if [ "$fail" = 0 ]; then
  echo "[float-risk] OK: subset green at sf0.001, sf0.1, and seed=$SEED"
fi
exit $fail
