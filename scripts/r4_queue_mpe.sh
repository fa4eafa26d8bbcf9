#!/bin/bash
# Round-4 chip queue #5: MPE parity probes — HAA2C (VERDICT item 3) and
# discrete simple_spread (item 6), multi-seed.
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

A2C=tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/haa2c/config.json
DISC=tuned_configs/pettingzoo_mpe/simple_spread_v2-discrete/happo/config.json

# HAA2C tuned, seeds 1-2, full 10M
run mpe_haa2c_s1 python -m harl_tpu.train --load_config $A2C --exp_name r4_s1
run mpe_haa2c_s2 python -m harl_tpu.train --load_config $A2C --exp_name r4_s2 --seed 2
# diagnostic: single a2c epoch (pure on-policy A2C update)
run mpe_haa2c_e1 python -m harl_tpu.train --load_config $A2C --exp_name r4_e1 --a2c_epoch 1

# discrete simple_spread, seeds 2-3 (r3 seed-1 ended -75.9 / best -68.5)
run mpe_disc_s2 python -m harl_tpu.train --load_config $DISC --exp_name r4_s2 --seed 2
run mpe_disc_s3 python -m harl_tpu.train --load_config $DISC --exp_name r4_s3 --seed 3

echo MPE_SWEEP_DONE >> $LOG/queue.out
