#!/bin/bash
# Multi-bag organics on the native PM6 reward (BASELINE config 3 on real QM).
cd "$(dirname "$0")"
seed="${1:-1}"
python /root/repo/scripts/run.py --name=orgpm6 --formulas=CH3NO,C2H2O2 \
    --canvas_size=10 --symbols=X,H,C,N,O --reward=pm6 --model=covariant \
    --num_steps=14000 --num_steps_per_iter=140 --mini_batch_size=140 \
    --num_envs=10 --beta=-10 --bag_scale=6 --seed="$seed" \
    --eval_freq=10 --save_rollouts=eval > "run-$seed.out" 2>&1
