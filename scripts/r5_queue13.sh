#!/bin/bash
# Round-5 session-3 queue v5 (after queue12, final): the other two
# published-table SMACv2 maps under the same lr-decay lever that closed
# protoss (reference @10M real SC2: terran_5_vs_5 57.5, zerg_5_vs_5 42.5).
# Sized to finish before the driver's end-of-round bench run.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
while ! grep -q R5_QUEUE12_DONE $LOG/queue.out 2>/dev/null; do sleep 20; done
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

run smacv2_terran_decay 1500 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/terran_5_vs_5/happo/config.json \
  --exp_name r5terran_decay --n_rollout_threads 64 \
  --use_linear_lr_decay True --num_env_steps 20000000 \
  --eval_interval 50 --eval_episodes 64

run smacv2_zerg_decay 1500 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/zerg_5_vs_5/happo/config.json \
  --exp_name r5zerg_decay --n_rollout_threads 64 \
  --use_linear_lr_decay True --num_env_steps 20000000 \
  --eval_interval 50 --eval_episodes 64

echo R5_QUEUE13_DONE >> $LOG/queue.out
