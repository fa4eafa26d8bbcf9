#!/bin/bash
# Discrete-MPE exploration probes (scripted greedy ceiling is -59.7; trained
# plateau -72): entropy and budget variants.
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
DISC=tuned_configs/pettingzoo_mpe/simple_spread_v2-discrete/happo/config.json
run mpe_disc_ent05 python -m harl_tpu.train --load_config $DISC --exp_name r4_ent05 --entropy_coef 0.05
run mpe_disc_ent03_decay python -m harl_tpu.train --load_config $DISC --exp_name r4_ent03d --entropy_coef 0.03 --use_linear_lr_decay True
run mpe_disc_20m python -m harl_tpu.train --load_config $DISC --exp_name r4_20m --num_env_steps 20000000
echo DISC_PROBES_DONE >> $LOG/queue.out
