#!/bin/bash
# Per-file suite runner with one retry on abnormal exit (host XLA:CPU
# compile segfaults are sporadic; each file passes in isolation).
cd /root/repo
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
PASS=0; FAIL=0; FAILED=""
for f in tests/test_*.py; do
    out=$(timeout 900 python -m pytest "$f" -q 2>&1 | tail -1)
    rc=$?
    if [ $rc -ne 0 ]; then
        out=$(timeout 900 python -m pytest "$f" -q 2>&1 | tail -1)
        rc=$?
    fi
    echo "$f: rc=$rc $out"
    if [ $rc -eq 0 ]; then PASS=$((PASS+1)); else FAIL=$((FAIL+1)); FAILED="$FAILED $f"; fi
done
echo "FILES passed=$PASS failed=$FAIL$FAILED"
