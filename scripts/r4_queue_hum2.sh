#!/bin/bash
# Round-4 humanoid bisect probes: single-agent 1x17 (physics feasible?),
# raw-obs variant (per-obs standardization the blocker?), and both combined.
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
HUM=tuned_configs/mamujoco_jax/Humanoid-v2-17x1/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 16 --eval_episodes 16"

run hum_r4_1x17 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_1x17 --agent_conf "1x17" $EVAL --log_interval 25 --eval_interval 50
run hum_r4_rawobs python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_rawobs --obs_standardize False $EVAL --log_interval 25 --eval_interval 50
run hum_r4_1x17_rawobs python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_1x17_rawobs --agent_conf "1x17" --obs_standardize False $EVAL \
  --log_interval 25 --eval_interval 50

echo HUM2_DONE >> $LOG/queue.out
