#!/bin/bash
# Round-4c follow-up queue (run after tpu_batch_r4b.sh): combined bf16
# fast paths, the XLA-remainder apportionment, and a fwd tile sweep
# under fast16. Logs land in /tmp/r4c_*.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ===" | tee -a /tmp/r4c_queue.log
  timeout 5400 python "$@" >"/tmp/r4c_${name}.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S) ===" | tee -a /tmp/r4c_queue.log
  grep -E "ms/iter|ms/force-call|parity|FAILED|x4 layers|ms/call" \
    "/tmp/r4c_${name}.log" | tail -12 | tee -a /tmp/r4c_queue.log
}

# 1. GD16 kernel marginals + A_BWD=32 probe + model parity/rate
run gd16 scripts/tpu_gd16.py
# 2. XLA remainder apportionment (node FFN, geometry chain, edge scalars)
run remainder scripts/tpu_escn_remainder.py
# 3. fwd tile sweep under fast16 (A=64 needs the bigger VMEM budget)
PDB2R_TPU_MEGA_GD16=1 \
PDB2R_TPU_MEGA_A_VMEM_MB=128 PDB2R_TPU_MICRO4_ABLS="" \
PDB2R_TPU_MICRO4_ASWEEP="64,16" \
  run asweep scripts/tpu_mega_micro4.py
# 4. split the gather cost: fwd noxs/noxt/noscat, bwd noxt/noscat
PDB2R_TPU_MICRO4_ABLS="noxs,noxt,noscat" \
  run gsplit_fwd scripts/tpu_mega_micro4.py
PDB2R_TPU_MICRO5_ABLS="noxs,noxt,noscat" \
  run gsplit_bwd scripts/tpu_mega_micro5.py
echo "=== QUEUE DONE $(date +%H:%M:%S) ===" | tee -a /tmp/r4c_queue.log
