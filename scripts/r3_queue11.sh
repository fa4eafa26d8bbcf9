#!/bin/bash
# Final round-3 chain, priority-ordered to fit the remaining wall clock.
cd /root/repo
while ! grep -q QUEUE5_DONE results/validation_r3/queue.out 2>/dev/null; do sleep 45; done
scripts/r3_queue.sh dex_handover_lateral_80m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name expF --task ShadowHandOver \
  --num_env_steps 80000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 60 --eval_interval 180 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 \
  --entropy_coef 0.005 --use_linear_lr_decay True
scripts/r3_queue.sh smac_5m_vs_6m_happo_seed2 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/5m_vs_6m/happo/config.json \
  --exp_name val_r3_s2 --seed 2 --num_env_steps 12000000
scripts/r3_queue.sh mpe_spread_hasac_n5 python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name val_r3_n5 --num_env_steps 3000000 --n_step 5
# capped continuation of the wedged HASAC run (evidence already at 9714@5.6M)
RUN=results/mamujoco_jax/HalfCheetah-v2/hasac/val_r3/seed-00001-20260821_071319
timeout 1500 python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
  --exp_name val_r3_resume --num_env_steps 4600000 --model_dir $RUN/models \
  > results/validation_r3/cheetah6x1_hasac_resume.log 2>&1
echo QUEUE11_DONE >> results/validation_r3/queue.out
