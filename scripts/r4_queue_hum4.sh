#!/bin/bash
# Humanoid round 2: raw obs doubled single-agent survival (1437 vs 780).
# Probe raw obs on the multi-agent partitions at longer budgets.
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
run hum_r4_98_rawobs python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_98_rawobs --agent_conf "9|8" --obs_standardize False $EVAL \
  --log_interval 25 --eval_interval 50
run hum_r4_17x1_rawobs_25m python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_17x1_rawobs_25m --obs_standardize False --num_env_steps 25000000 \
  $EVAL --log_interval 50 --eval_interval 100
run hum_r4_1x17_rawobs_25m python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_1x17_rawobs_25m --agent_conf "1x17" --obs_standardize False \
  --num_env_steps 25000000 $EVAL --log_interval 50 --eval_interval 100
echo HUM4_DONE >> $LOG/queue.out
