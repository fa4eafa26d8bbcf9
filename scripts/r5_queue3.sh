#!/bin/bash
# Round-5 phase 3: (a) 3s5z 50M WITH lr decay — the 30M+decay run sustained
# only ~0.73-0.81 (decay stopped the late collapse but cut high-lr learning
# time short; 50M+decay combines the r4 peak-reaching budget with the decay
# landing); (b) HASAC MPE sentinel for the std-floor change (VERDICT item 10:
# cheap non-regression run from a solved family after touching off-policy
# code).
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_PHASE2_DONE $LOG/queue.out 2>/dev/null; do sleep 30; done
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

run smac_3s5z_lrdecay_50m 5800 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r5_lrdecay_50m --use_linear_lr_decay True \
  --num_env_steps 50000000 --eval_episodes 64

# n_step 5 = the stable control configuration (the tuned n_step=20 config is
# the twin-confirmed inherently-divergent one, r4)
run mpe_hasac_stdfloor_sentinel 1500 python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name r5_stdfloor --n_step 5 --num_env_steps 1000000

echo R5_PHASE3_DONE >> $LOG/queue.out
