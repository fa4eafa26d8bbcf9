#!/bin/bash
# Round-5 phase 2, after the phase-1 probe validated the arrival-speed
# shaping (won 0.38 @50M vs r4 controls 0.16/0.20/0.34):
#   0. regenerate bench_cache (warm compile cache the driver's 480s bench
#      needs to fit all three metrics, VERDICT item 6)
#   1-3. the flagship dexhands runs: HandOver 400M x2 seeds + CatchUnderarm
#      300M, all decay+velpen (VERDICT item 1)
#   4. 3s5z lr-decay seed 2 (item 2)
#   5. football academy_counterattack_hard (item 8)
#   6. SMACv2 protoss_5_vs_5 tuned push (item 7)
#   7+. catch-family siblings off the floor (item 1c)
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
# wait for phase 1 to release the chip
while ! grep -q R5_PHASE1_DONE $LOG/queue.out 2>/dev/null; do sleep 20; done
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

TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 256 --eval_episodes 256"
SHAPE="--use_linear_lr_decay True --vel_pen_coef 0.05"

run dex_r5long_s1 7200 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r5long_s1 $EVAL $SHAPE --num_env_steps 400000000 \
  --eval_interval 480 --log_interval 160

run dex_r5catch 6000 python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r5catch \
  --task ShadowHandCatchUnderarm \
  --num_env_steps 300000000 --n_rollout_threads 256 --episode_length 75 \
  $EVAL $SHAPE --eval_interval 480 --log_interval 160 \
  --hidden_sizes "[256, 256, 256]" --entropy_coef 0.01 --gamma 0.95

run dex_r5long_s2 7200 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r5long_s2 $EVAL $SHAPE --seed 2 --num_env_steps 400000000 \
  --eval_interval 480 --log_interval 160

run smac_3s5z_lrdecay_s2 4500 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name r5_lrdecay_s2 --seed 2 --use_linear_lr_decay True \
  --num_env_steps 30000000 --eval_episodes 64

run football_cah 4000 python -m harl_tpu.train \
  --load_config tuned_configs/football_jax/academy_counterattack_hard/happo/config.json \
  --exp_name r5_cah --use_eval True --n_eval_rollout_threads 64 \
  --eval_episodes 64 --eval_interval 50

run smacv2_protoss_r5 4200 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name r5_protoss --n_rollout_threads 64 --use_linear_lr_decay True \
  --num_env_steps 20000000 --eval_interval 50 --eval_episodes 64

DEXCLI="--algo happo --env dexhands_jax --n_rollout_threads 256
  --episode_length 75 --entropy_coef 0.01 --gamma 0.95"
HS='--hidden_sizes'
HSV='[256, 256, 256]'

run dex_r5_abreast 3000 python -m harl_tpu.train $DEXCLI $HS "$HSV" \
  --exp_name r5_abreast --task ShadowHandCatchAbreast \
  --num_env_steps 150000000 $EVAL $SHAPE --eval_interval 480 --log_interval 160

run dex_r5_twocatch 3000 python -m harl_tpu.train $DEXCLI $HS "$HSV" \
  --exp_name r5_twocatch --task ShadowHandTwoCatchUnderarm \
  --num_env_steps 150000000 $EVAL $SHAPE --eval_interval 480 --log_interval 160

run dex_r5_over2under 3000 python -m harl_tpu.train $DEXCLI $HS "$HSV" \
  --exp_name r5_over2under --task ShadowHandCatchOver2Underarm \
  --num_env_steps 150000000 $EVAL $SHAPE --eval_interval 480 --log_interval 160

run dex_r5_metamt4 3000 python -m harl_tpu.train $DEXCLI $HS "$HSV" \
  --exp_name r5_metamt4 --task ShadowHandMetaMT4 \
  --num_env_steps 150000000 $EVAL $SHAPE --eval_interval 480 --log_interval 160

run smacv2_terran_r5 4200 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/terran_5_vs_5/happo/config.json \
  --exp_name r5_terran --n_rollout_threads 64 --use_linear_lr_decay True \
  --num_env_steps 20000000 --eval_interval 50 --eval_episodes 64

echo R5_PHASE2_DONE >> $LOG/queue.out
