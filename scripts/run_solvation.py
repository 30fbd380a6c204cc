"""Solvation experiment (reference scripts/run_solvation.py): refillable bags
around an optional initial structure, with the solvation distance-penalty
reward."""
import numpy as np

from molgym_tpu import formula as formula_lib
from molgym_tpu.atoms import read_xyz
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.tools.arg_parser import build_default_argparser
from molgym_tpu.tools.driver import run_experiment


def build_parser():
    parser = build_default_argparser()
    parser.add_argument('--initial_structure',
                        help='path to an XYZ file pre-placed on the canvas',
                        type=str, default=None)
    parser.add_argument('--num_refills',
                        help='number of times the bag is refilled', type=int,
                        default=0)
    parser.add_argument('--distance_penalty',
                        help='solvation distance penalty', type=float,
                        default=0.01)
    return parser


def solvation_envs(config, observation_space, reward_fn):
    formulas = [formula_lib.string_to_formula(s)
                for s in formula_lib.split_formula_strings(config['formulas'])]
    eval_strings = config.get('eval_formulas') or config['formulas']
    eval_formulas = [formula_lib.string_to_formula(s)
                     for s in formula_lib.split_formula_strings(eval_strings)]

    init_elements = None
    init_positions = None
    if config.get('initial_structure'):
        atoms = read_xyz(config['initial_structure'])
        n = observation_space.canvas_size
        init_elements = np.zeros(n, np.int32)
        init_positions = np.zeros((n, 3), np.float32)
        for i, atom in enumerate(atoms):
            init_elements[i] = observation_space.z_to_index[atom.z]
            init_positions[i] = atom.position

    kwargs = dict(min_atomic_distance=config['min_atomic_distance'],
                  max_solo_distance=config['max_solo_distance'],
                  min_reward=config['min_reward'],
                  initial_elements=init_elements,
                  initial_positions=init_positions,
                  num_refills=config['num_refills'])
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
    run_experiment(config, env_builder=solvation_envs, solvation=True)


if __name__ == '__main__':
    main()
