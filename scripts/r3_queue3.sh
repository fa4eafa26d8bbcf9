#!/bin/bash
# Round-3 queue part 3: SMAC breadth + SMACv2 curve, after queue2 finishes.
cd /root/repo
while ! grep -q QUEUE2_DONE results/validation_r3/queue.out 2>/dev/null; do sleep 30; done
# heterogeneous stalker/zealot map (the r2 queued run died silently)
scripts/r3_queue.sh smac_2s3z_happo python -m harl_tpu.train \
  --algo happo --env smaclite --exp_name val_r3 --map_name 2s3z \
  --num_env_steps 10000000 --n_rollout_threads 256 --episode_length 100 \
  --log_interval 5 --eval_interval 25
# reference-tuned maps (threads raised 20->64 for chip utilization)
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
echo QUEUE3_DONE >> results/validation_r3/queue.out
