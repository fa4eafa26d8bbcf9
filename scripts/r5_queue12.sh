#!/bin/bash
# Round-5 session-3 queue v4 (after queue11): retrain the table-task
# manip family now that the fingertip-reachability fix (TABLE_HAND_DZ)
# makes their objects graspable at all. Pen is a reference headline-figure
# member (assets/dexhands_learning_curve.jpg); the others have never had
# trained curves. Each 150M run costs ~5 min on this chip.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_QUEUE11_DONE $LOG/queue.out 2>/dev/null; do sleep 20; done
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

run dex_r5pen_fix 1800 python -m harl_tpu.train \
  --load_config tuned_configs/dexhands_jax/ShadowHandPen/happo/config.json \
  --exp_name r5pen_fix $EVAL --use_linear_lr_decay True \
  --num_env_steps 150000000 --eval_interval 480 --log_interval 320

MANIP="--algo happo --env dexhands_jax --n_rollout_threads 256
  --episode_length 125 --entropy_coef 0.01 --gamma 0.95
  --hidden_sizes [256,256,256] --eval_interval 480 --log_interval 320"

run dex_r5liftunderarm 1800 python -m harl_tpu.train \
  --load_config tuned_configs/dexhands_jax/ShadowHandLiftUnderarm/happo/config.json \
  --exp_name r5liftunderarm $EVAL --use_linear_lr_decay True \
  --num_env_steps 150000000 --eval_interval 480 --log_interval 320

run dex_r5graspplace 1800 python -m harl_tpu.train $MANIP $EVAL \
  --task ShadowHandGraspAndPlace --exp_name r5graspplace \
  --use_linear_lr_decay True --num_env_steps 150000000

run dex_r5blockstack 1800 python -m harl_tpu.train $MANIP $EVAL \
  --task ShadowHandBlockStack --exp_name r5blockstack \
  --use_linear_lr_decay True --num_env_steps 150000000

run dex_r5kettle 1800 python -m harl_tpu.train $MANIP $EVAL \
  --task ShadowHandKettle --exp_name r5kettle \
  --use_linear_lr_decay True --num_env_steps 150000000

echo R5_QUEUE12_DONE >> $LOG/queue.out
