#!/bin/bash
# Final queue: resume HASAC for its remaining budget after queue5 finishes.
cd /root/repo
while ! grep -q QUEUE5_DONE results/validation_r3/queue.out 2>/dev/null; do sleep 60; done
RUN=results/mamujoco_jax/HalfCheetah-v2/hasac/val_r3/seed-00001-20260821_071319
scripts/r3_queue.sh cheetah6x1_hasac_resume python -m harl_tpu.train \
  --load_config tuned_configs/mamujoco_jax/HalfCheetah-v2-6x1/hasac/config.json \
  --exp_name val_r3_resume --num_env_steps 4600000 --model_dir $RUN/models
echo QUEUE9_DONE >> results/validation_r3/queue.out
