#!/bin/bash
# Round-4 long-budget ShadowHandOver runs: phalanx-pad physics, curves were
# still climbing at the 50M cutoff (0.38/0.41) — extend to 150M, 2 seeds,
# plus a 100M lr-decay consolidation variant and the long CatchUnderarm.
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
TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 64 --eval_episodes 64"

run dex_r4long_s1 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4long_s1 $EVAL --num_env_steps 150000000 \
  --eval_interval 240 --log_interval 80
run dex_r4long_s2 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4long_s2 $EVAL --seed 2 --num_env_steps 150000000 \
  --eval_interval 240 --log_interval 80
run dex_r4long_decay python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4long_decay $EVAL --num_env_steps 100000000 \
  --use_linear_lr_decay True --eval_interval 240 --log_interval 80
run dex_r4long_catch python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r4long_catch \
  --task ShadowHandCatchUnderarm \
  --num_env_steps 100000000 --n_rollout_threads 256 --episode_length 75 \
  $EVAL --eval_interval 240 --log_interval 80 \
  --hidden_sizes "[256, 256, 256]" --entropy_coef 0.01 --gamma 0.95

echo DEXLONG_DONE >> $LOG/queue.out
