#!/bin/bash
# Round-3 TPU measurement batch: run everything queued during the relay
# outage, sequentially, each with its own log under /tmp/tpu_r3/.
set -u
cd /root/repo
mkdir -p /tmp/tpu_r3

echo "=== [1/5] mega check (post gradient fix) ==="
timeout 1200 python -u scripts/tpu_escn_mega_check.py \
    > /tmp/tpu_r3/mega_check.log 2>&1
grep -v WARNING /tmp/tpu_r3/mega_check.log | tail -5

echo "=== [2/5] A_BWD=16 sweep ==="
PDB2R_TPU_MEGA_A_BWD=16 timeout 1200 python -u \
    scripts/tpu_escn_mega_check.py > /tmp/tpu_r3/abwd16.log 2>&1
grep -v WARNING /tmp/tpu_r3/abwd16.log | tail -5

echo "=== [3/5] fwd/bwd split ==="
timeout 2400 python -u scripts/tpu_escn_fwdbwd.py \
    > /tmp/tpu_r3/fwdbwd.log 2>&1
grep -v WARNING /tmp/tpu_r3/fwdbwd.log | tail -4

echo "=== [4/5] kernel micro ==="
timeout 1800 python -u scripts/tpu_mega_micro.py \
    > /tmp/tpu_r3/micro.log 2>&1
grep -v WARNING /tmp/tpu_r3/micro.log | tail -4

echo "=== [5/5] eSCN GSM compile probe ==="
timeout 3000 python -u scripts/tpu_escn_gsm.py \
    > /tmp/tpu_r3/gsm.log 2>&1
grep -v WARNING /tmp/tpu_r3/gsm.log | tail -4

echo "=== batch done ==="
