#!/usr/bin/env bash
# Pre-snapshot gate (the r7 verdict's ask #6): one command that must
# exit 0 before any end-of-round commit. Runs, in order:
#   1. full `sbt test` — includes ExchangeLedgerSpec, which checks the
#      committed EXCHANGES.txt against the live sf0.001 plans AND the
#      sf0.001-vs-sf0.1 cross-SF identity, so ledger drift fails here;
#   2. the full oracle sweep at sf0.01 (graft.Verify +
#      tools/check_oracle.py) — every declared query must hash-match;
#   3. tools/drift_check.py — ledgers/COVERAGE/STATUS/bench-snapshot/
#      SparkEntry cross-referenced (the documentation-drift class).
# Prints PREFLIGHT: PASS/FAIL and the per-stage outcome; writes the
# run record to tools/preflight_last.txt (cited by STATUS.md).
set -u
cd /root/repo
out=/tmp/preflight_verify
rec=tools/preflight_last.txt
fail=0

echo "[preflight] 1/3 sbt test..."
if sbt -batch test > /tmp/preflight_test.log 2>&1; then
  t_ok="PASS ($(grep -Eo 'Passed: Total [0-9]+' /tmp/preflight_test.log | tail -1))"
else
  t_ok="FAIL (see /tmp/preflight_test.log)"
  fail=1
fi
echo "[preflight] sbt test: $t_ok"

echo "[preflight] 2/3 oracle sweep at sf0.01..."
if sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out" \
    > /tmp/preflight_dump.log 2>&1; then
  n_ok=$(python3 tools/check_oracle.py /root/testdata/sf0.01 $out \
    | tee /tmp/preflight_oracle.log | grep -c '^OK')
  n_bad=$(grep -cv '^OK' /tmp/preflight_oracle.log || true)
  if [ "$n_bad" -eq 0 ]; then
    o_ok="PASS ($n_ok/$n_ok OK)"
  else
    o_ok="FAIL ($n_ok OK, $n_bad not OK — /tmp/preflight_oracle.log)"
    fail=1
  fi
else
  o_ok="FAIL (Verify dump crashed — /tmp/preflight_dump.log)"
  fail=1
fi
echo "[preflight] oracle sweep: $o_ok"

echo "[preflight] 3/3 documentation-drift check..."
if python3 tools/drift_check.py > /tmp/preflight_drift.log 2>&1; then
  d_ok="PASS ($(tail -1 /tmp/preflight_drift.log))"
else
  d_ok="FAIL (see /tmp/preflight_drift.log)"
  fail=1
fi
echo "[preflight] drift check: $d_ok"

verdict=$([ $fail -eq 0 ] && echo PASS || echo FAIL)
{
  echo "preflight: $verdict"
  echo "date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "head: $(git rev-parse --short HEAD) (+$(git status --porcelain | wc -l) dirty)"
  echo "sbt test: $t_ok"
  echo "oracle sweep (sf0.01): $o_ok"
  echo "drift check: $d_ok"
} > $rec
cat $rec
exit $fail
