#!/bin/bash
# Round-4 chip queue #1: ShadowHandOver schedule sweep (VERDICT r3 item 1).
# Key fact discovered: every r3 lateral-layout run used gamma 0.99 + 128x128;
# the reference's own tuned config (gamma 0.95, 3x256, ent 0.01) was never
# tried on the final geometry. Probe it + isolating variants, 50M each
# (reference budget; ~3-4 min wall per run on the chip).
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

# P1: reference tuned config verbatim (gamma 0.95, 3x256, ent 0.01, 256 thr)
run dex_r4_tuned python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4tuned $EVAL --eval_interval 120 --log_interval 40

# P2: tuned + 1024 threads (larger PPO batch)
run dex_r4_tuned1024 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4tuned1024 $EVAL --n_rollout_threads 1024 \
  --eval_interval 60 --log_interval 20

# P3: tuned + linear lr decay
run dex_r4_tuned_decay python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4tuneddecay $EVAL --use_linear_lr_decay True \
  --eval_interval 120 --log_interval 40

# P4: r3's expD (1024 thr, 128x128) but gamma 0.95 — isolate the gamma effect
run dex_r4_g95_h128 python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r4g95h128 --task ShadowHandOver \
  --num_env_steps 50000000 --n_rollout_threads 1024 --episode_length 75 \
  $EVAL --eval_interval 60 --log_interval 20 \
  --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.005 --gamma 0.95

# P5: tuned + entropy 0.005
run dex_r4_tuned_ent005 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4tunedent005 $EVAL --entropy_coef 0.005 \
  --eval_interval 120 --log_interval 40

# P6: tuned seed 2 (variance estimate on the lead candidate)
run dex_r4_tuned_s2 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4tuned_s2 $EVAL --seed 2 \
  --eval_interval 120 --log_interval 40

# P7: CatchUnderarm with the tuned-style schedule (VERDICT: get it >= 0.3)
run dex_r4_catchunderarm python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r4catch \
  --task ShadowHandCatchUnderarm \
  --num_env_steps 50000000 --n_rollout_threads 256 --episode_length 75 \
  $EVAL --eval_interval 120 --log_interval 40 \
  --hidden_sizes "[256, 256, 256]" --entropy_coef 0.01 --gamma 0.95

echo DEX_SWEEP_DONE >> $LOG/queue.out
