#!/bin/bash
cd /root/repo/experiments/stochastic
python /root/repo/scripts/run_stochastic.py --name=stoch --formulas=C2H6O --size_range=4,9 \
  --canvas_size=10 --symbols=X,H,C,O --bag_scale=6 --model=covariant --beta=-10 \
  --maxl=3 --num_cg_levels=2 --min_mean_distance=0.9 --max_mean_distance=1.8 \
  --num_envs=10 --num_steps=7000 --num_steps_per_iter=140 --mini_batch_size=140 \
  --reward=device_lj --seed=1 --eval_freq=10 --save_rollouts=eval > run.out 2>&1

cd /root/repo/experiments/solvation
python - <<'PY' > mk_init.py.out 2>&1
from molgym_tpu.atoms import Atoms, write_xyz
write_xyz('solute.xyz', Atoms(['C','O'], [[0,0,0],[1.2,0,0]]))
PY
python /root/repo/scripts/run_solvation.py --name=solv --formulas=H2O --num_refills=2 \
  --initial_structure=solute.xyz --canvas_size=12 --symbols=X,H,C,O --bag_scale=4 \
  --model=internal --network_width=64 --num_envs=10 --num_steps=7000 \
  --num_steps_per_iter=140 --mini_batch_size=140 --reward=device_lj --seed=1 \
  --eval_freq=10 --save_rollouts=eval > run.out 2>&1

cd /root/repo/experiments/sf6_internal
python /root/repo/scripts/run.py --name=sf6int --formulas=SF6 --canvas_size=7 --symbols=X,S,F \
  --bag_scale=5 --model=internal --network_width=128 --min_mean_distance=1.10 \
  --max_mean_distance=2.10 --num_envs=10 --num_steps=14000 --num_steps_per_iter=140 \
  --mini_batch_size=140 --reward=device_lj --seed=1 --eval_freq=10 --save_rollouts=eval > run.out 2>&1
echo ALL_DONE > /root/repo/experiments/rest_done
