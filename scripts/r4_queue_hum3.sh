#!/bin/bash
# Humanoid physics probes: stickier feet (friction_vreg) — the bisect showed
# neither obs encoding nor the agent decomposition explains the ~150-step
# survival ceiling, leaving ground grip as the prime suspect.
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
run hum_r4_vreg02 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_vreg02 --friction_vreg 0.02 $EVAL --log_interval 25 --eval_interval 50
run hum_r4_vreg02_98 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_vreg02_98 --friction_vreg 0.02 --agent_conf "9|8" $EVAL \
  --log_interval 25 --eval_interval 50
echo HUM3_DONE >> $LOG/queue.out
