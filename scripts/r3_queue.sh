#!/bin/bash
# Round-3 chip queue: strictly serial runs on the one TPU chip.
# Each run logs to results/validation_r3/ and fails loudly (nonzero exit
# recorded in the log tail + queue.out).
cd /root/repo
LOG=results/validation_r3
run() {
  name=$1; shift
  # never clobber an earlier run's evidence: uniquify repeated names
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout 7200 "$@" > $LOGF 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" >> $LOG/queue.out
  if [ $rc -ne 0 ]; then echo "RUN FAILED rc=$rc" >> $LOGF; fi
}
run "$@"
