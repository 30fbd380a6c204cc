"""Scaffold-constrained experiment: grow a molecule inside the convex hull of
a fixed scaffold structure.

The reference ships the environment class for this
(ConstrainedMolecularEnvironment, reference molgym/environment.py:143-175) but
no driver script; this adds the missing CLI. Semantics match the reference:
the scaffold atoms are pre-placed on the canvas, new atoms must land inside
the scaffold's convex hull (here a precomputed static halfspace check instead
of a per-step Qhull/Delaunay call), and the reward is computed over the
non-scaffold atoms only (reference environment.py:173-175).
"""
import numpy as np

from molgym_tpu import formula as formula_lib
from molgym_tpu.atoms import read_xyz
from molgym_tpu.envs.environment import MolecularEnv, scaffold_halfspaces
from molgym_tpu.tools.arg_parser import build_default_argparser
from molgym_tpu.tools.driver import run_experiment


def build_parser():
    parser = build_default_argparser()
    parser.add_argument('--scaffold',
                        help='path to the scaffold XYZ file whose convex hull '
                        'constrains atom placement', type=str, required=True)
    return parser


def scaffold_envs(config, observation_space, reward_fn):
    formulas = [formula_lib.string_to_formula(s)
                for s in formula_lib.split_formula_strings(config['formulas'])]
    eval_strings = config.get('eval_formulas') or config['formulas']
    eval_formulas = [formula_lib.string_to_formula(s)
                     for s in formula_lib.split_formula_strings(eval_strings)]

    scaffold = read_xyz(config['scaffold'])
    n_scaffold = len(scaffold)
    n = observation_space.canvas_size
    if n_scaffold >= n:
        raise ValueError(f'scaffold has {n_scaffold} atoms but the canvas '
                         f'holds only {n}; raise --canvas_size')
    init_elements = np.zeros(n, np.int32)
    init_positions = np.zeros((n, 3), np.float32)
    for i, atom in enumerate(scaffold):
        if atom.z not in observation_space.z_to_index:
            raise ValueError(f'scaffold element {atom.symbol} must be listed '
                             f'in --symbols')
        init_elements[i] = observation_space.z_to_index[atom.z]
        init_positions[i] = atom.position
    hull = scaffold_halfspaces(init_positions[:n_scaffold].astype(np.float64))

    kwargs = dict(min_atomic_distance=config['min_atomic_distance'],
                  max_solo_distance=config['max_solo_distance'],
                  min_reward=config['min_reward'],
                  initial_elements=init_elements,
                  initial_positions=init_positions,
                  scaffold_halfspaces=hull,
                  n_scaffold=n_scaffold)
    train_env = MolecularEnv(
        reward_fn=reward_fn, observation_space=observation_space,
        formulas=np.stack([observation_space.bag_from_formula(f)
                           for f in formulas]), **kwargs)
    eval_env = MolecularEnv(
        reward_fn=reward_fn, observation_space=observation_space,
        formulas=np.stack([observation_space.bag_from_formula(f)
                           for f in eval_formulas]), **kwargs)
    return train_env, eval_env


def main() -> None:
    config = vars(build_parser().parse_args())
    run_experiment(config, env_builder=scaffold_envs)


if __name__ == '__main__':
    main()
