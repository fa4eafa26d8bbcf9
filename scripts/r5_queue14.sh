#!/bin/bash
# Round-5 session-3 queue v6 (final): LiftUnderarm retry via CLI args
# (only a hasac tuned config exists — the happo load_config failed), and
# Pen at the catch-family's proven scale lever (1024 envs, 600M) after
# the 256-env/150M retrain showed slow return improvement but no lift.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_QUEUE13_DONE $LOG/queue.out 2>/dev/null; do sleep 20; done
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
MANIP="--algo happo --env dexhands_jax --n_rollout_threads 256
  --episode_length 125 --entropy_coef 0.01 --gamma 0.95
  --hidden_sizes [256,256,256] --eval_interval 480 --log_interval 320"

run dex_r5liftunderarm2 1800 python -m harl_tpu.train $MANIP $EVAL \
  --task ShadowHandLiftUnderarm --exp_name r5liftunderarm2 \
  --use_linear_lr_decay True --num_env_steps 150000000

run dex_r5pen_1024 1800 python -m harl_tpu.train $MANIP $EVAL \
  --task ShadowHandPen --exp_name r5pen_1024 \
  --n_rollout_threads 1024 --use_linear_lr_decay True \
  --num_env_steps 600000000

echo R5_QUEUE14_DONE >> $LOG/queue.out
