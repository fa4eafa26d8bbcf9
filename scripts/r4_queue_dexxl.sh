#!/bin/bash
# Extra-long ShadowHandOver runs: 400M steps, 256-episode evals for tight
# win-rate estimates (150M showed late-window ~0.45-0.57 with +/-0.06 noise).
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
TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 256 --eval_episodes 256"
run dex_r4xl_s1 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4xl_s1 $EVAL --num_env_steps 400000000 \
  --eval_interval 480 --log_interval 160
run dex_r4xl_s2 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4xl_s2 $EVAL --seed 2 --num_env_steps 400000000 \
  --eval_interval 480 --log_interval 160
echo DEXXL_DONE >> $LOG/queue.out
