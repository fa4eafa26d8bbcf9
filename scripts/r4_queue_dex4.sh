#!/bin/bash
# Round-4 chip queue #3: ShadowHandOver + catch family with near-critically
# damped (inelastic, PhysX-like) contacts — the r4 policy probe showed the
# catch (62% bounce-off-and-drop), not the toss, was the blocker.
cd /root/repo
LOG=results/validation_r4
mkdir -p $LOG
run() {
  name=$1; shift
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout 7200 "$@" > $LOGF 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" >> $LOG/queue.out
  if [ $rc -ne 0 ]; then echo "RUN FAILED rc=$rc" >> $LOGF; fi
}

TUNED=tuned_configs/dexhands_jax/ShadowHandOver/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 64 --eval_episodes 64"

run dex_r4ao_tuned python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4ao_tuned $EVAL --eval_interval 120 --log_interval 40

run dex_r4ao_tuned_s2 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4ao_tuned_s2 $EVAL --seed 2 --eval_interval 120 --log_interval 40

run dex_r4ao_catch python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r4ao_catch \
  --task ShadowHandCatchUnderarm \
  --num_env_steps 50000000 --n_rollout_threads 256 --episode_length 75 \
  $EVAL --eval_interval 120 --log_interval 40 \
  --hidden_sizes "[256, 256, 256]" --entropy_coef 0.01 --gamma 0.95

echo DEX_AO_SWEEP_DONE >> $LOG/queue.out
