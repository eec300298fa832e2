#!/bin/bash
# Round-4b TPU measurement queue (after the conv raw-row relayout
# elimination): kernel fwd/bwd marginals, fwd + bwd apportionment
# ablations, then the full-model fwd/bwd split. Sequential; each script
# gets a generous timeout (relay remote-compiles run 4-7 min per
# program). Logs land in /tmp/r4b_*.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ===" | tee -a /tmp/r4b_queue.log
  timeout 3600 python "$@" >"/tmp/r4b_${name}.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S) ===" | tee -a /tmp/r4b_queue.log
  tail -6 "/tmp/r4b_${name}.log" | tee -a /tmp/r4b_queue.log
}

# 1. kernel fwd + fwd/bwd marginals with the new raw-row layout
run micro3 scripts/tpu_mega_micro3.py
# 2. fwd apportionment ablations (relayout change already in)
PDB2R_TPU_MICRO4_ABLS="noact,nosilu,norot,nogather,noconv1,noconv2" \
  run micro4 scripts/tpu_mega_micro4.py
# 3. bwd apportionment ablations at A_BWD=16
run micro5 scripts/tpu_mega_micro5.py
# 4. full-model fwd/bwd split (end-to-end ms/force-call)
run fwdbwd scripts/tpu_escn_fwdbwd.py
# 5. bf16 rotation mode: kernel marginals + full-model parity vs XLA
run rot16 scripts/tpu_rot16.py
echo "=== QUEUE DONE $(date +%H:%M:%S) ===" | tee -a /tmp/r4b_queue.log
