#!/bin/bash
# Round-4 master chip queue: phalanx-pad dexhands sweep, then SMAC pushes,
# then the MPE probes. Strictly serial within this script.
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

# --- dexhands with phalanx contact pads -------------------------------------
run dex_r4pad_tuned python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4pad_tuned $EVAL --eval_interval 120 --log_interval 40
run dex_r4pad_tuned_s2 python -m harl_tpu.train --load_config $TUNED \
  --exp_name r4pad_tuned_s2 $EVAL --seed 2 --eval_interval 120 --log_interval 40
run dex_r4pad_g99 python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r4pad_g99 --task ShadowHandOver \
  --num_env_steps 50000000 --n_rollout_threads 1024 --episode_length 75 \
  $EVAL --eval_interval 60 --log_interval 20 \
  --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.005
run dex_r4pad_catch python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name r4pad_catch \
  --task ShadowHandCatchUnderarm \
  --num_env_steps 50000000 --n_rollout_threads 256 --episode_length 75 \
  $EVAL --eval_interval 120 --log_interval 40 \
  --hidden_sizes "[256, 256, 256]" --entropy_coef 0.01 --gamma 0.95

# --- SMAC pushes ------------------------------------------------------------
SMAC35=tuned_configs/smaclite/3s5z/happo/config.json
run smac_3s5z_30m python -m harl_tpu.train --load_config $SMAC35 \
  --exp_name r4_30m --num_env_steps 30000000
run smac_3s5z_30m_s2 python -m harl_tpu.train --load_config $SMAC35 \
  --exp_name r4_30m_s2 --num_env_steps 30000000 --seed 2
# HATRPO 5m_vs_6m at the NATIVE horizon 70 (the r3 0.97 was measured at 100)
run smac_hatrpo_5m6m_h70 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/5m_vs_6m/hatrpo/config.json \
  --exp_name r4_h70

# --- MPE probes -------------------------------------------------------------
A2C=tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/haa2c/config.json
DISC=tuned_configs/pettingzoo_mpe/simple_spread_v2-discrete/happo/config.json
run mpe_haa2c_s1 python -m harl_tpu.train --load_config $A2C --exp_name r4_s1
run mpe_haa2c_s2 python -m harl_tpu.train --load_config $A2C --exp_name r4_s2 --seed 2
run mpe_haa2c_e1 python -m harl_tpu.train --load_config $A2C --exp_name r4_e1 --a2c_epoch 1
run mpe_disc_s2 python -m harl_tpu.train --load_config $DISC --exp_name r4_s2 --seed 2
run mpe_disc_s3 python -m harl_tpu.train --load_config $DISC --exp_name r4_s3 --seed 3

echo MASTER_QUEUE_DONE >> $LOG/queue.out
