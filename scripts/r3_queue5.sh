#!/bin/bash
# Round-3 queue part 5 (after HASAC): football breadth, fixed-reward
# Humanoid, MPE discrete parity, pixel-CNN soccer learning run.
cd /root/repo
while ! grep -q QUEUE4_DONE results/validation_r3/queue.out 2>/dev/null; do sleep 60; done
scripts/r3_queue.sh dex_handover_lateral_100m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name expE --task ShadowHandOver \
  --num_env_steps 100000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 60 --eval_interval 180 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 \
  --entropy_coef 0.003 --use_linear_lr_decay True
for SCEN in academy_pass_and_shoot_with_keeper academy_run_pass_and_shoot_with_keeper academy_counterattack_easy; do
scripts/r3_queue.sh football_${SCEN#academy_} python -m harl_tpu.train \
  --load_config tuned_configs/football_jax/$SCEN/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 256 --num_env_steps 5000000 \
  --log_interval 10 --eval_interval 50
done
scripts/r3_queue.sh football_3v1_pixels python -m harl_tpu.train \
  --algo happo --env football_jax --exp_name val_r3_pix \
  --env_name academy_3_vs_1_with_keeper --representation pixels \
  --num_env_steps 3000000 --n_rollout_threads 128 --episode_length 128 \
  --log_interval 10 --eval_interval 30 --eval_episodes 64 --n_eval_rollout_threads 64
scripts/r3_queue.sh humanoid17x1_happo_10m python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/Humanoid-v2-17x1/happo/config.json \
  --exp_name val_r3 --n_rollout_threads 256 --episode_length 100 \
  --num_env_steps 10000000 --log_interval 20 --eval_interval 100 \
  --eval_episodes 16 --n_eval_rollout_threads 16
scripts/r3_queue.sh mpe_spread_discrete_happo python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-discrete/happo/config.json \
  --exp_name val_r3
scripts/r3_queue.sh mpe_spread_hasac python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name val_r3 --num_env_steps 3000000
scripts/r3_queue.sh mpe_speaker_listener_happo python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_speaker_listener_v3-discrete/happo/config.json \
  --exp_name val_r3 --num_env_steps 5000000
scripts/r3_queue.sh smac_5m_vs_6m_hatrpo python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/5m_vs_6m/hatrpo/config.json \
  --exp_name val_r3 --n_rollout_threads 64 --eval_interval 50 --num_env_steps 10000000
for TASK in ShadowHandCatchUnderarm AllegroHandOver ShadowHandMetaMT4; do
scripts/r3_queue.sh dex_${TASK}_30m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name val_r3 --task $TASK \
  --num_env_steps 30000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 60 --eval_interval 120 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 \
  --entropy_coef 0.003 --use_linear_lr_decay True
done
scripts/r3_queue.sh smac_5m_vs_6m_happo_seed2 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/5m_vs_6m/happo/config.json \
  --exp_name val_r3_s2 --seed 2 --num_env_steps 12000000
scripts/r3_queue.sh mpe_spread_had3qn python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-discrete/had3qn/config.json \
  --exp_name val_r3 --num_env_steps 3000000
scripts/r3_queue.sh mpe_spread_haa2c python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/haa2c/config.json \
  --exp_name val_r3 --num_env_steps 4000000
scripts/r3_queue.sh mpe_spread_mappo python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/mappo/config.json \
  --exp_name val_r3 --num_env_steps 4000000
scripts/r3_queue.sh bench_check python bench.py
echo QUEUE5_DONE >> results/validation_r3/queue.out
