#!/bin/bash
# Round-5 phase 5c: continuation of 5b after its shell was stopped to retry
# the HandOver->CatchUnderarm fine-tune (failed on a checkpoint-layout
# mismatch: --model_dir took only the ckpt dir itself, not the printed run
# dir — latest_checkpoint now descends into <run_dir>/models/). Drops the
# low-value ent005/ctrl sweep tails; chains into phase 7 via the 5B_DONE
# marker.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
# wait for the orphaned dex_r5catch_1024 child to finish (writes this line
# at the end of a completed run; fall through after 40 min regardless)
for i in $(seq 1 240); do
  grep -q "results saved under" $LOG/dex_r5catch_1024.log 2>/dev/null && break
  sleep 10
done
echo "=== 5c takes over $(date +%T) ===" >> $LOG/queue.out
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

# fine-tune retry: run dir now resolves via latest_checkpoint
S3DIR=$(grep -oP "results saved under \K\S+" $LOG/dex_r5long_s3.log | head -1)
if [ -n "$S3DIR" ]; then
  run dex_r5catch_ft 3600 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
    --exp_name r5catch_ft --vel_pen_coef 0.05 --num_env_steps 600000000 \
    --model_dir "$S3DIR"
else
  echo "=== dex_r5catch_ft SKIPPED (no s3 run dir) ===" >> $LOG/queue.out
fi

run dex_r5abreast 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchAbreast --exp_name r5abreast \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000
run dex_r5twocatch 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandTwoCatchUnderarm --exp_name r5twocatch \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000

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

echo R5_PHASE5B_DONE >> $LOG/queue.out
