#!/bin/bash
# Round-2 validation queue on the real TPU chip: parity re-runs + learning
# evidence for the new envs. Logs under results/validation_r2/.
cd /root/repo
mkdir -p results/validation_r2
run() {
  name=$1; shift
  echo "=== $name start $(date)"
  timeout 6800 python -m harl_tpu.train "$@" > "results/validation_r2/${name}.log" 2>&1
  echo "=== $name exit=$? $(date)"
}
set -x
# 1. MPE spread parity re-run (self-collision reward fix)
run mpe_spread_happo --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/happo/config.json --exp_name parity_r2
# 2. SMAC asymmetric + heterogeneous win-rate runs
run smac_5m_vs_6m_happo --algo happo --env smaclite --exp_name val_r2 \
  --map_name 5m_vs_6m --num_env_steps 5000000 --n_rollout_threads 256 \
  --episode_length 70 --log_interval 10 --eval_interval 50 --eval_episodes 32 \
  --n_eval_rollout_threads 32 --entropy_coef 0.01 --ppo_epoch 5 --critic_epoch 5
run smac_2s3z_happo --algo happo --env smaclite --exp_name val_r2 \
  --map_name 2s3z --num_env_steps 5000000 --n_rollout_threads 256 \
  --episode_length 120 --log_interval 10 --eval_interval 50 --eval_episodes 32 \
  --n_eval_rollout_threads 32 --entropy_coef 0.01 --ppo_epoch 5 --critic_epoch 5
# 3. Dexhands: catch success rate + door task
run dex_handover_happo --algo happo --env dexhands_jax --exp_name val_r2 \
  --task ShadowHandOver --num_env_steps 8000000 --n_rollout_threads 1024 \
  --episode_length 75 --log_interval 10 --eval_interval 40 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
run dex_door_happo --algo happo --env dexhands_jax --exp_name val_r2 \
  --task ShadowHandDoorOpenOutward --num_env_steps 8000000 --n_rollout_threads 1024 \
  --episode_length 125 --log_interval 10 --eval_interval 40 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
# 4. Ant-4x2 walking gait
run ant_4x2_happo --algo happo --env mamujoco_jax --exp_name val_r2 \
  --scenario Ant-v2 --agent_conf 4x2 --episode_limit 1000 \
  --num_env_steps 10000000 --n_rollout_threads 512 --episode_length 64 \
  --log_interval 20 --eval_interval 100 --eval_episodes 16 \
  --n_eval_rollout_threads 16
# 5. HATD3 HalfCheetah-2x3 retry (tunnel flaked on the first attempt)
run cheetah2x3_hatd3 --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-2x3/hatd3/config.json --exp_name parity_r2
echo ALL_DONE_R2
