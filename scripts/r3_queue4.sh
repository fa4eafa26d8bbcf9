#!/bin/bash
# Round-3 queue part 4: handover exploration experiments + SMAC breadth,
# then the long HASAC run last. Waits for the door run (pid $1).
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
# handover experiment A: more entropy + bigger budget
scripts/r3_queue.sh dex_handover_expA python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name expA --task ShadowHandOver \
  --num_env_steps 40000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 40 --eval_interval 120 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.01
# SMAC breadth (short at these FPS)
scripts/r3_queue.sh smac_2s3z_happo python -m harl_tpu.train \
  --algo happo --env smaclite --exp_name val_r3 --map_name 2s3z \
  --num_env_steps 10000000 --n_rollout_threads 256 --episode_length 100 \
  --log_interval 5 --eval_interval 25
scripts/r3_queue.sh smac_3s5z_happo python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/3s5z/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
scripts/r3_queue.sh smac_8m_vs_9m_happo python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/8m_vs_9m/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
scripts/r3_queue.sh smac_mmm2_happo python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/MMM2/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
scripts/r3_queue.sh smacv2_protoss5v5_happo python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50
echo QUEUE4_SMAC_DONE >> results/validation_r3/queue.out
scripts/r3_queue.sh cheetah6x1_hasac_10m python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
  --exp_name val_r3 --num_env_steps 10000000
echo QUEUE4_DONE >> results/validation_r3/queue.out
