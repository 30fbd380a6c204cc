#!/bin/bash
# Halomethanes with the native PM6 reward: exercises the round-3 Cl and Br
# parameter blocks (anchor-fit to HCl/Cl2/CH3Cl and HBr/Br2/CH3Br) end to
# end in the full RL loop, plus the environment's H/F/Cl/Br solo-distance
# rule on elements the reference names but the round-2 backend lacked
# (reference molgym/environment.py:103-118).
cd "$(dirname "$0")"
seed="${1:-1}"
python /root/repo/scripts/run.py --name=halo --formulas=CH3Cl,CH3Br \
    --canvas_size=6 --symbols=X,H,C,Cl,Br --reward=pm6 --model=covariant \
    --num_steps=14000 --num_steps_per_iter=140 --mini_batch_size=140 \
    --num_envs=10 --beta=-10 --bag_scale=6 --seed="$seed" \
    --eval_freq=10 --save_rollouts=eval > "run-$seed.out" 2>&1
