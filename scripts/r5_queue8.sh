#!/bin/bash
# Round-5 phase 8 (after 7): the overshoot-targeted CatchUnderarm arms.
# The behavioral probe showed failures are fast throws sailing ~1 m past
# the receiver; the wide penalty gate (vel_pen_width 8, coef 0.1) charges
# the pass-by while leaving the release point effectively free (d5999a9).
# Arm (a) = wide gate on the best-known setting (1024 envs, decay, 600M);
# arm (b) = wide gate + HandOver params-only transfer.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_PHASE7_DONE $LOG/queue.out 2>/dev/null; do sleep 30; done
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

run dex_r5catch_widegate 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_widegate --use_linear_lr_decay True \
  --vel_pen_coef 0.1 --vel_pen_width 8.0 \
  --n_rollout_threads 1024 --num_env_steps 600000000

S3DIR=$(grep -oP "results saved under \K\S+" $LOG/dex_r5long_s3.log | head -1)
if [ -n "$S3DIR" ]; then
  run dex_r5catch_widegate_ft 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
    --exp_name r5catch_widegate_ft --vel_pen_coef 0.1 --vel_pen_width 8.0 \
    --num_env_steps 600000000 --model_dir "$S3DIR"
fi

echo R5_PHASE8_DONE >> $LOG/queue.out
