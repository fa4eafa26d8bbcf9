#!/bin/bash
# Round-4 continuation (fresh machine): re-run the two final-batch runs that
# the previous session's shutdown cut off — the 3s5z entropy-0.02 push toward
# the >=0.85 reference band, and the 9|8 raw-obs Humanoid 25M parity point.
cd /root/repo
LOG=results/validation_r4
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

run smac_3s5z_ent02 2400 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r4_ent02 --entropy_coef 0.02 --num_env_steps 30000000 \
  --eval_episodes 160

HUM=tuned_configs/mamujoco_jax/Humanoid-v2-17x1/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 16 --eval_episodes 16"
run hum_r4_98_rawobs_25m 2400 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_98_rawobs_25m --agent_conf "9|8" --obs_standardize False \
  --num_env_steps 25000000 $EVAL --log_interval 50 --eval_interval 100

echo SESSION2_DONE >> $LOG/queue.out
