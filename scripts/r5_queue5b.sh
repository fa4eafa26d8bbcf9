#!/bin/bash
# Round-5 phase 5b: re-prioritized continuation of r5_queue5.sh (whose shell
# was stopped mid-bench-warm to avoid editing a running script; the warm-up
# child kept running). Priorities over 5's tail: the catch-family SIBLING
# curves (Abreast / TwoCatchUnderarm — an explicit VERDICT item-1c Done
# criterion) and a HandOver->CatchUnderarm fine-tune (same obs/action
# spaces, gap 0.30->0.45 m) outrank the ent005/ctrl sweep arms.
# NOTE the fine-tune disables lr decay: the optax schedule is keyed on the
# RESTORED Adam update count, so decay-on would resume at lr~0.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
# wait for the still-running bench warm-up (prints "bench_cache size:" last)
for i in $(seq 1 300); do
  grep -q "bench_cache size:" $LOG/bench_cache_warm.log 2>/dev/null && break
  sleep 10
done
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

# 1. HandOver seed 3 (sustained >=0.5 criterion; also the fine-tune donor)
run dex_r5long_s3 3600 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r5long_s3 $EVAL --seed 3 --use_linear_lr_decay True \
  --vel_pen_coef 0.05 --num_env_steps 600000000 \
  --eval_interval 480 --log_interval 320

# 2. CatchUnderarm big-budget arm (1B)
run dex_r5catch_1b 3600 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_1b --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --num_env_steps 1000000000

# 3. CatchUnderarm fine-tuned from the trained HandOver seed-3 checkpoint
S3DIR=$(grep -oP "results saved under \K\S+" $LOG/dex_r5long_s3.log | head -1)
if [ -n "$S3DIR" ]; then
  run dex_r5catch_ft 3600 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
    --exp_name r5catch_ft --vel_pen_coef 0.05 --num_env_steps 600000000 \
    --model_dir "$S3DIR"
else
  echo "=== dex_r5catch_ft SKIPPED (no s3 run dir) ===" >> $LOG/queue.out
fi

# 4. CatchUnderarm big-batch arm
run dex_r5catch_1024 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_1024 --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --n_rollout_threads 1024 --num_env_steps 600000000

# 5-6. catch-family siblings off the floor (VERDICT item 1c)
run dex_r5abreast 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchAbreast --exp_name r5abreast \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000
run dex_r5twocatch 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandTwoCatchUnderarm --exp_name r5twocatch \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000

# 7. 3s5z second-seed >=0.8 criterion (seed 2 sustains 0.889 with this config)
run smac_3s5z_lrdecay_s3 4500 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r5_lrdecay_s3 --seed 3 --use_linear_lr_decay True \
  --num_env_steps 30000000 --eval_episodes 64

# 8. SMACv2 protoss tuned push
run smacv2_protoss_r5 4200 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name r5_protoss --n_rollout_threads 64 --use_linear_lr_decay True \
  --num_env_steps 20000000 --eval_interval 50 --eval_episodes 64

# 9. HASAC std-floor sentinel (r5 change 96fe20c touched the squashed logp)
run mpe_hasac_stdfloor_sentinel 1500 python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name r5_stdfloor --n_step 5 --num_env_steps 1000000

# 10. optional sweep tails (only reached if time allows)
run dex_r5catch_ent005 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_ent005 --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --entropy_coef 0.005 --num_env_steps 600000000
run dex_r5catch_ctrl 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_ctrl --use_linear_lr_decay True \
  --num_env_steps 600000000

echo R5_PHASE5B_DONE >> $LOG/queue.out
