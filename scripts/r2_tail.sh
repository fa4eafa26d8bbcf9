#!/bin/bash
# Short-budget tail: the remaining round-2 evidence runs, sized to fit the
# rest of the round's wall clock.
cd /root/repo
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date)"
  timeout "$to" python -m harl_tpu.train "$@" > "results/validation_r2/${name}.log" 2>&1
  echo "=== $name exit=$? $(date)"
}
run cheetah2x3_hatd3 900 --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-2x3/hatd3/config.json --exp_name parity_r2 --num_env_steps 3000000
run dex_handover_happo 800 --algo happo --env dexhands_jax --exp_name val_r2 \
  --task ShadowHandOver --num_env_steps 6000000 --n_rollout_threads 1024 \
  --episode_length 75 --log_interval 10 --eval_interval 30 --eval_episodes 64 \
  --n_eval_rollout_threads 64 --ppo_epoch 5 --critic_epoch 5 --entropy_coef 0.003
run smac_5m_vs_6m_happo 800 --algo happo --env smaclite --exp_name val_r2 \
  --map_name 5m_vs_6m --num_env_steps 4000000 --n_rollout_threads 256 \
  --episode_length 70 --log_interval 10 --eval_interval 30 --eval_episodes 32 \
  --n_eval_rollout_threads 32 --entropy_coef 0.01 --ppo_epoch 5 --critic_epoch 5
run mpe_spread_happo 700 --load_config tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/happo/config.json --exp_name parity_r2 --num_env_steps 4000000
run ant_4x2_happo 700 --algo happo --env mamujoco_jax --exp_name val_r2 \
  --scenario Ant-v2 --agent_conf 4x2 --episode_limit 1000 \
  --num_env_steps 6000000 --n_rollout_threads 512 --episode_length 64 \
  --log_interval 20 --eval_interval 60 --eval_episodes 16 --n_eval_rollout_threads 16
echo TAIL_DONE
