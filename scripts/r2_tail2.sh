#!/bin/bash
# Second tail: longer budgets now that per-run wall cost is known (~65k FPS
# smaclite, ~30k FPS dexhands on one chip).
cd /root/repo
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date)"
  timeout "$to" python -m harl_tpu.train "$@" > "results/validation_r2/${name}.log" 2>&1
  echo "=== $name exit=$? $(date)"
}
run smac_5m_vs_6m_long 900 --algo happo --env smaclite --exp_name val_r2b \
  --map_name 5m_vs_6m --num_env_steps 15000000 --n_rollout_threads 256 \
  --episode_length 70 --log_interval 20 --eval_interval 60 --eval_episodes 32 \
  --n_eval_rollout_threads 32 --entropy_coef 0.01 --ppo_epoch 5 --critic_epoch 5
run smac_2s3z_happo 900 --algo happo --env smaclite --exp_name val_r2 \
  --map_name 2s3z --num_env_steps 12000000 --n_rollout_threads 256 \
  --episode_length 120 --log_interval 20 --eval_interval 60 --eval_episodes 32 \
  --n_eval_rollout_threads 32 --entropy_coef 0.01 --ppo_epoch 5 --critic_epoch 5
run cheetah6x1_hasac 900 --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json --exp_name parity_r2 --num_env_steps 2000000
run dex_handover_long 1200 --algo happo --env dexhands_jax --exp_name val_r2b \
  --task ShadowHandOver --num_env_steps 30000000 --n_rollout_threads 1024 \
  --episode_length 75 --log_interval 20 --eval_interval 60 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
echo TAIL2_DONE
