#!/bin/bash
# Round-5 phase 1: (a) sanity-probe the arrival-speed shaping on ShadowHandOver
# at the 50M budget where the r4 controls sit (tuned 0.16, tuned_decay 0.20,
# tuned_s2 0.34 won@50M) — the long 400M runs only launch if the probe stays
# in/above that band; (b) the 3s5z lr-decay push (VERDICT round-5 item 2: the
# 50M run decayed 0.85->0.625, linear lr decay is the named untried lever).
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
run() {
  name=$1; tmo=$2; shift 2
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout "$tmo" "$@" > $LOGF 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" >> $LOG/queue.out
  if [ $rc -ne 0 ]; then echo "RUN FAILED rc=$rc" >> $LOGF; fi
}

TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 64 --eval_episodes 64"

run dex_r5probe_velpen 2400 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r5probe_velpen $EVAL --use_linear_lr_decay True \
  --vel_pen_coef 0.05 --eval_interval 120 --log_interval 40

run smac_3s5z_lrdecay_s1 4500 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r5_lrdecay_s1 --use_linear_lr_decay True \
  --num_env_steps 30000000 --eval_episodes 64

echo R5_PHASE1_DONE >> $LOG/queue.out
