#!/bin/bash
# Round-4 chip queue #4: Humanoid-v2 17x1 / 9|8 parity probes.
# r3's run deviated from the reference tuned config (clip 0.2 vs 0.1, no lr
# decay, rollout window 100 vs 200); H1 is the reference config verbatim.
cd /root/repo
LOG=results/validation_r4
mkdir -p $LOG
run() {
  name=$1; shift
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout 7200 "$@" > $LOGF 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" >> $LOG/queue.out
  if [ $rc -ne 0 ]; then echo "RUN FAILED rc=$rc" >> $LOGF; fi
}

HUM=tuned_configs/mamujoco_jax/Humanoid-v2-17x1/happo/config.json
EVAL="--use_eval True --n_eval_rollout_threads 16 --eval_episodes 16"

# H1: reference tuned config verbatim (20 thr, eplen 200, lr decay, clip 0.1)
run hum_r4_tuned python -m harl_tpu.train --load_config $HUM \
  --exp_name r4tuned $EVAL --log_interval 25 --eval_interval 50

# H2: same schedule at 256 threads (more parallel data per update)
run hum_r4_tuned256 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4tuned256 $EVAL --n_rollout_threads 256 \
  --log_interval 4 --eval_interval 8

# H3: 9|8 partition with the same tuned schedule
run hum_r4_9_8 python -m harl_tpu.train --load_config $HUM \
  --exp_name r4_9_8 --agent_conf "9|8" $EVAL \
  --log_interval 25 --eval_interval 50

echo HUM_SWEEP_DONE >> $LOG/queue.out
