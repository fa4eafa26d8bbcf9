#!/bin/bash
# Round-5 phase 4: CatchUnderarm stayed at won 0.14-0.16 @300M under the
# HandOver-winning shaping (velpen 0.05 + decay) — the 0.45 m lob has a
# different failure mode than HandOver's overshoot scatter. The chip runs
# dexhands at ~850k steps/s (300M ~ 9 min), so sweep the named levers at a
# 600M budget each, plus a BIG-BUDGET control (1B) to separate
# optimization-speed from capability ceiling, and a third HandOver seed for
# the sustained->=0.5 x >=2 seeds criterion.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_PHASE3_DONE $LOG/queue.out 2>/dev/null; do sleep 30; done
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

EVAL="--use_eval True --n_eval_rollout_threads 256 --eval_episodes 256"
CATCH="--algo happo --env dexhands_jax --task ShadowHandCatchUnderarm
  --n_rollout_threads 256 --episode_length 75 --entropy_coef 0.01
  --gamma 0.95 --eval_interval 480 --log_interval 320"
HS='--hidden_sizes'
HSV='[256, 256, 256]'
TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json

# third HandOver seed at 600M for the sustained criterion
run dex_r5long_s3 3600 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r5long_s3 $EVAL --seed 3 --use_linear_lr_decay True \
  --vel_pen_coef 0.05 --num_env_steps 600000000 \
  --eval_interval 480 --log_interval 320

# catch sweep, 600M each
run dex_r5catch_1b 3600 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_1b --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --num_env_steps 1000000000
run dex_r5catch_ctrl 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_ctrl --use_linear_lr_decay True \
  --num_env_steps 600000000
run dex_r5catch_ent005 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_ent005 --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --entropy_coef 0.005 --num_env_steps 600000000
run dex_r5catch_1024 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_1024 --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --n_rollout_threads 1024 --num_env_steps 600000000

echo R5_PHASE4_DONE >> $LOG/queue.out
