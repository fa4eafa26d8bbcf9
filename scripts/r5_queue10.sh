#!/bin/bash
# Round-5 session-3 queue v2. The first wide-gate CatchUnderarm arm
# (coef 0.1 AND width 8 — two levers at once) was killed at 258M with
# won=0.026 vs the 1024-env control's 0.17 at the same step: that much
# pass-by charge suppresses throwing altogether. This queue runs the
# one-lever variant (HandOver-proven coef 0.05, width 8 only), then the
# remaining published-figure members, with SMACv2 moved up so it fits.
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

EVAL="--use_eval True --n_eval_rollout_threads 256 --eval_episodes 256"
CATCH="--algo happo --env dexhands_jax --n_rollout_threads 256
  --episode_length 75 --entropy_coef 0.01 --gamma 0.95
  --eval_interval 480 --log_interval 320"
HS='--hidden_sizes'
HSV='[256, 256, 256]'

run dex_r5catch_wg05 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchUnderarm --exp_name r5catch_wg05 \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --vel_pen_width 8.0 \
  --n_rollout_threads 1024 --num_env_steps 600000000

run dex_r5over2under 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchOver2Underarm --exp_name r5over2under \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000

run smacv2_protoss_decay 2700 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name r5protoss_decay --n_rollout_threads 64 \
  --use_linear_lr_decay True --num_env_steps 20000000 \
  --eval_interval 50 --eval_episodes 64

run dex_r5pen 2400 python -m harl_tpu.train \
  --load_config tuned_configs/dexhands_jax/ShadowHandPen/happo/config.json \
  --exp_name r5pen $EVAL --use_linear_lr_decay True \
  --num_env_steps 150000000 --eval_interval 480 --log_interval 320

run dex_r5metamt1 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandMetaMT1 --exp_name r5metamt1 \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000

echo R5_QUEUE10_DONE >> $LOG/queue.out
