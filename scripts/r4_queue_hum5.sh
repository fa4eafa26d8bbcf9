#!/bin/bash
# Humanoid obsk probes: reference observation factorization (agent_obsk 0 —
# each agent sees only its own joints' local body features, critic sees the
# full state), the reference tuned configs' actual setting.
cd /root/repo
LOG=results/validation_r4
run() {
  name=$1; shift
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout 7200 "$@" > $LOGF 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $LOG/queue.out
}
HUM=tuned_configs/mamujoco_jax/Humanoid-v2-17x1/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 16 --eval_episodes 16"
run hum_r4_obsk0 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_obsk0 --agent_obsk 0 $EVAL --log_interval 25 --eval_interval 50
run hum_r4_obsk0_98 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_obsk0_98 --agent_obsk 0 --agent_conf "9|8" $EVAL \
  --log_interval 25 --eval_interval 50
run hum_r4_obsk0_25m python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_obsk0_25m --agent_obsk 0 --num_env_steps 25000000 $EVAL \
  --log_interval 50 --eval_interval 100
echo HUM5_DONE >> $LOG/queue.out
