#!/bin/bash
# Round-3 queue part 2: waits for the current chip run (pid $1) to finish,
# then runs the short capability runs before the long HASAC run.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
scripts/r3_queue.sh smac_5m_vs_6m_happo_20m python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/5m_vs_6m/happo/config.json --exp_name val_r3
scripts/r3_queue.sh dex_handover_happo_20m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name val_r3 \
  --task ShadowHandOver --num_env_steps 20000000 --n_rollout_threads 1024 \
  --episode_length 75 --log_interval 20 --eval_interval 60 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
scripts/r3_queue.sh dex_dooropen_happo_10m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name val_r3 \
  --task ShadowHandDoorOpenOutward --num_env_steps 10000000 --n_rollout_threads 1024 \
  --episode_length 75 --log_interval 20 --eval_interval 60 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
scripts/r3_queue.sh cheetah6x1_hasac_10m python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
  --exp_name val_r3 --num_env_steps 10000000
echo QUEUE2_DONE >> results/validation_r3/queue.out
