#!/bin/bash
# Round-5 phase 5 (session restart: results/ was wiped before phases 3-4 ran).
# Priority-ordered single-chip queue:
#   0. warm bench_cache (the committed cache the driver's 480s bench needs —
#      commit 3991b32 changed bench.py but the cache itself was never produced)
#   1. CatchUnderarm sweep at 600M/1B (VERDICT item 1a: plateaued 0.14 @300M
#      under the HandOver-winning shaping; sweep batch size / entropy / budget)
#   2. HandOver seed 3 at 600M (strengthen the sustained >=0.5 x2-seed result)
#   3. 3s5z seed 3 + lr decay at 30M (item 2's second-seed >=0.8 criterion;
#      seed 2 with the same config sustains 0.889 over 24-30M)
#   4. SMACv2 protoss_5_vs_5 tuned 20M push (item 7)
#   5. HASAC MPE n_step=5 sentinel for the r5 std-floor change (item 10)
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

run bench_cache_warm 2200 bash scripts/warm_bench_cache.sh

EVAL="--use_eval True --n_eval_rollout_threads 256 --eval_episodes 256"
CATCH="--algo happo --env dexhands_jax --task ShadowHandCatchUnderarm
  --n_rollout_threads 256 --episode_length 75 --entropy_coef 0.01
  --gamma 0.95 --eval_interval 480 --log_interval 320"
HS='--hidden_sizes'
HSV='[256, 256, 256]'
TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json

run dex_r5catch_1024 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_1024 --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --n_rollout_threads 1024 --num_env_steps 600000000
run dex_r5catch_1b 3600 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_1b --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --num_env_steps 1000000000
run dex_r5catch_ent005 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_ent005 --use_linear_lr_decay True --vel_pen_coef 0.05 \
  --entropy_coef 0.005 --num_env_steps 600000000

run dex_r5long_s3 3600 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r5long_s3 $EVAL --seed 3 --use_linear_lr_decay True \
  --vel_pen_coef 0.05 --num_env_steps 600000000 \
  --eval_interval 480 --log_interval 320

run smac_3s5z_lrdecay_s3 4500 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r5_lrdecay_s3 --seed 3 --use_linear_lr_decay True \
  --num_env_steps 30000000 --eval_episodes 64

run smacv2_protoss_r5 4200 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name r5_protoss --n_rollout_threads 64 --use_linear_lr_decay True \
  --num_env_steps 20000000 --eval_interval 50 --eval_episodes 64

run mpe_hasac_stdfloor_sentinel 1500 python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name r5_stdfloor --n_step 5 --num_env_steps 1000000

run dex_r5catch_ctrl 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --exp_name r5catch_ctrl --use_linear_lr_decay True \
  --num_env_steps 600000000

echo R5_PHASE5_DONE >> $LOG/queue.out
