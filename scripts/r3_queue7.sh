#!/bin/bash
# Round-3 queue 7: long handover run, then HASAC, then signal queue5.
cd /root/repo
scripts/r3_queue.sh dex_handover_lateral_60m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name expD --task ShadowHandOver \
  --num_env_steps 60000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 40 --eval_interval 120 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.005
scripts/r3_queue.sh cheetah6x1_hasac_10m python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
  --exp_name val_r3 --num_env_steps 10000000
echo QUEUE4_DONE >> results/validation_r3/queue.out
