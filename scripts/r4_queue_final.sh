#!/bin/bash
# Final round-4 measurement batch on a quiet chip.
cd /root/repo
LOG=results/validation_r4
run() {
  name=$1; shift
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout 7200 "$@" > $LOGF 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $LOG/queue.out
}
HUM=tuned_configs/mamujoco_jax/Humanoid-v2-17x1/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 16 --eval_episodes 16"
run hum_r4_98_rawobs_25m python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_98_rawobs_25m --agent_conf "9|8" --obs_standardize False \
  --num_env_steps 25000000 $EVAL --log_interval 50 --eval_interval 100
run smac_3s5z_ent02 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r4_ent02 --entropy_coef 0.02 --num_env_steps 30000000 \
  --eval_episodes 160
run bench_r4final python bench.py
echo FINAL_BATCH_DONE >> $LOG/queue.out
