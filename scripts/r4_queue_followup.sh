#!/bin/bash
# Round-4 follow-up chip queue: the HASAC n20-stabilized full run, the 3s5z
# 50M push, and a fresh bench (records the secondary guard-metric rates).
cd /root/repo
LOG=results/validation_r4
run() {
  name=$1; shift
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout 7200 "$@" > $LOGF 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" >> $LOG/queue.out
  if [ $rc -ne 0 ]; then echo "RUN FAILED rc=$rc" >> $LOGF; fi
}

# HASAC MPE with the reference-exact n_step=20 PLUS the reference's own
# SMAC-config stabilizers (valuenorm + huber): the CPU probe at 320k steps
# shows stable learning (-125 -> -85) where the bare config diverges in
# BOTH implementations.
run mpe_hasac_n20vn python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name r4_n20vn --use_valuenorm True --use_huber_loss True

run smac_3s5z_50m python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r4_50m --num_env_steps 50000000

run bench_r4probe python bench.py

echo FOLLOWUP_DONE >> $LOG/queue.out
