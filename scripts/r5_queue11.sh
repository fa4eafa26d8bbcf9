#!/bin/bash
# Round-5 session-3 queue v3 (after queue10): the chip is ~3x faster than
# planning assumed (600M CatchUnderarm in ~14 min), so spend the surplus
# on the catch family:
#   1. wg05 fine-tune continuation (+600M at half lr) — the 600M endpoint
#      was 0.269 and RISING (0.227/0.241/0.269); params-only restore
#   2. CatchAbreast with the wg05 shaping at 1024 envs / 600M (r4 tail
#      was 0.146 unshaped @300M)
#   3. wg05 second seed (robustness of the 0.27 endpoint)
#   4. ShadowHandOver with the width-8 gate (sustained windows sit at
#      0.500/0.504 — test whether the wider gate lifts the margin)
#   5. TwoCatchUnderarm long shot with shaping
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_QUEUE10_DONE $LOG/queue.out 2>/dev/null; do sleep 20; done
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
CATCH="--algo happo --env dexhands_jax --n_rollout_threads 1024
  --episode_length 75 --entropy_coef 0.01 --gamma 0.95
  --eval_interval 480 --log_interval 320"
HS='--hidden_sizes'
HSV='[256, 256, 256]'
WG="--vel_pen_coef 0.05 --vel_pen_width 8.0 --use_linear_lr_decay True"

WG05DIR=$(grep -oP "results saved under \K\S+" $LOG/dex_r5catch_wg05.log | head -1)
if [ -n "$WG05DIR" ]; then
  run dex_r5catch_wg05_ft 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
    --task ShadowHandCatchUnderarm --exp_name r5catch_wg05_ft $WG \
    --lr 0.00025 --critic_lr 0.00025 \
    --num_env_steps 600000000 --model_dir "$WG05DIR"
fi

run dex_r5abreast_wg 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchAbreast --exp_name r5abreast_wg $WG \
  --num_env_steps 600000000

run dex_r5catch_wg05_s2 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchUnderarm --exp_name r5catch_wg05_s2 $WG \
  --seed 2 --num_env_steps 600000000

run dex_r5handover_wg8 2400 python -m harl_tpu.train \
  --load_config tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json \
  --exp_name r5handover_wg8 $EVAL $WG \
  --num_env_steps 400000000 --eval_interval 480 --log_interval 160

run dex_r5twocatch_wg 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandTwoCatchUnderarm --exp_name r5twocatch_wg $WG \
  --num_env_steps 300000000

echo R5_QUEUE11_DONE >> $LOG/queue.out
