#!/bin/bash
# Round-5 session-3 queue (fresh machine — results/ from sessions 1-2 are
# gone; this re-runs the lost phase-7/8 arms in priority order):
#   0. solo warm-cache bench verification at the driver's 480s deadline
#      (phase-7 item (a) — the only prior guard reading was contended)
#   1. CatchUnderarm wide-gate arm (VERDICT item 1a: vel_pen_width 8
#      charges the diagnosed ~1 m pass-by, d5999a9) at the best-known
#      setting (1024 envs, lr decay, 600M)
#   2. CatchOver2Underarm + ShadowHandPen — the two remaining members of
#      the reference's published headline figure (assets/
#      dexhands_learning_curve.jpg plots Over, Over2Underarm, Pen)
#   3. SMACv2 protoss_5_vs_5 with the 3s5z-proven lr-decay lever at 20M
#      (VERDICT item 7; reference band 57.5% @10M per smac-winrates.png)
#   4. MetaMT1 if time allows
# The CPU humanoid twin probe (VERDICT item 4) forks after the bench so
# the bench reading stays uncontended.
cd /root/repo
LOG=results/validation_r5
mkdir -p $LOG
run() {
  name=$1; tmo=$2; shift 2
  LOGF=$LOG/$name.log
  if [ -e "$LOGF" ]; then LOGF=$LOG/${name}_$(date +%s).log; fi
  echo "=== $name start $(date +%T) ===" >> $LOG/queue.out
  timeout "$tmo" "$@" > $LOGF 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" >> $LOG/queue.out
  if [ $rc -ne 0 ]; then echo "RUN FAILED rc=$rc" >> $LOGF; fi
}

run bench_solo_verify 600 python bench.py

# CPU twin probe: reference HAPPO on the repo humanoid env, standardized
# obs (the round-4 open fidelity question). 2M steps ≈ what the host can
# do in this session at the observed ~230 FPS; torch is 1-thread pinned.
nohup timeout 10200 python scratch/ref_probe/run_ref_mamujoco.py 2000000 \
  > $LOG/ref_humanoid_std_s3.log 2>&1 &
echo "twin probe pid $!" >> $LOG/queue.out

EVAL="--use_eval True --n_eval_rollout_threads 256 --eval_episodes 256"
CATCH="--algo happo --env dexhands_jax --n_rollout_threads 256
  --episode_length 75 --entropy_coef 0.01 --gamma 0.95
  --eval_interval 480 --log_interval 320"
HS='--hidden_sizes'
HSV='[256, 256, 256]'

run dex_r5catch_widegate 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchUnderarm --exp_name r5catch_widegate \
  --use_linear_lr_decay True --vel_pen_coef 0.1 --vel_pen_width 8.0 \
  --n_rollout_threads 1024 --num_env_steps 600000000

run dex_r5over2under 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandCatchOver2Underarm --exp_name r5over2under \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000

run dex_r5pen 2400 python -m harl_tpu.train \
  --load_config tuned_configs/dexhands_jax/ShadowHandPen/happo/config.json \
  --exp_name r5pen $EVAL --use_linear_lr_decay True \
  --num_env_steps 150000000 --eval_interval 480 --log_interval 320

run smacv2_protoss_decay 2700 python -m harl_tpu.train \
  --load_config tuned_configs/smacv2/protoss_5_vs_5/happo/config.json \
  --exp_name r5protoss_decay --n_rollout_threads 64 \
  --use_linear_lr_decay True --num_env_steps 20000000 \
  --eval_interval 50 --eval_episodes 64

run dex_r5metamt1 2400 python -m harl_tpu.train $CATCH $HS "$HSV" $EVAL \
  --task ShadowHandMetaMT1 --exp_name r5metamt1 \
  --use_linear_lr_decay True --vel_pen_coef 0.05 --num_env_steps 300000000

echo R5_QUEUE9_DONE >> $LOG/queue.out
