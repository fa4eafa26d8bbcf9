#!/bin/bash
# Final handover attempt: the 60M run's winning config (entropy 0.005) with
# a longer budget and late lr decay via two stages is approximated by a
# single 80M run at entropy 0.005 + linear decay.
cd /root/repo
while ! grep -q QUEUE9_DONE results/validation_r3/queue.out 2>/dev/null; do sleep 60; done
scripts/r3_queue.sh dex_handover_lateral_80m python -m harl_tpu.train \
  --algo happo --env dexhands_jax --exp_name expF --task ShadowHandOver \
  --num_env_steps 80000000 --n_rollout_threads 1024 --episode_length 75 \
  --log_interval 60 --eval_interval 180 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 \
  --entropy_coef 0.005 --use_linear_lr_decay True
scripts/r3_queue.sh mpe_spread_hasac_n5 python -m harl_tpu.train \
  --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json \
  --exp_name val_r3_n5 --num_env_steps 4000000 --n_step 5
scripts/r3_queue.sh smac_5m_vs_6m_happo_seed2 python -m harl_tpu.train \
  --load_config tuned_configs/smaclite/5m_vs_6m/happo/config.json \
  --exp_name val_r3_s2 --seed 2 --num_env_steps 12000000
echo QUEUE10_DONE >> results/validation_r3/queue.out
