#!/bin/bash
# Round-3 queue 6 (replaces the tail of queue4): remaining SMAC maps, the
# new-layout handover run, then HASAC. Emits QUEUE4_DONE so queue5 follows.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
scripts/r3_queue.sh smac_8m_vs_9m_happo python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/8m_vs_9m/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
scripts/r3_queue.sh smac_mmm2_happo python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/MMM2/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
scripts/r3_queue.sh smacv2_protoss5v5_happo python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
scripts/r3_queue.sh dex_handover_overlap_20m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name val_r3b --task ShadowHandOver \
  --num_env_steps 20000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 20 --eval_interval 60 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
scripts/r3_queue.sh cheetah6x1_hasac_10m python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
  --exp_name val_r3 --num_env_steps 10000000
echo QUEUE4_DONE >> results/validation_r3/queue.out
