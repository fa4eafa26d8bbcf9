#!/bin/bash
# Sequential parity runs on the one real TPU chip (tuned-config budgets).
cd /root/repo
set -x
for cfg in \
  tuned_configs/mamujoco_jax/HalfCheetah-v2-2x3/happo/config.json \
  tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/happo/config.json \
  tuned_configs/mamujoco_jax/HalfCheetah-v2-2x3/hatd3/config.json \
  tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
; do
  name=$(echo "$cfg" | tr '/' '_' | sed 's/tuned_configs_//;s/_config.json//')
  echo "=== $name start $(date)"
  timeout 7000 python -m harl_tpu.train --load_config "$cfg" --exp_name parity \
    > "results/parity/${name}.log" 2>&1
  echo "=== $name exit=$? $(date)"
done
echo ALL_DONE
