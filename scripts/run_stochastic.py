"""Stochastic-bag training experiment (reference scripts/run_stochastic.py):
train on bags sampled from the base formula's element distribution within
--size_range (even total valence enforced), evaluate on fixed formulas."""
import numpy as np

from molgym_tpu import formula as formula_lib
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.tools.arg_parser import build_default_argparser
from molgym_tpu.tools.driver import run_experiment


def build_parser():
    parser = build_default_argparser()
    parser.add_argument('--size_range',
                        help='size range of sampled formulas, e.g. 4,10',
                        type=str, required=True)
    return parser


def stochastic_envs(config, observation_space, reward_fn):
    base = [formula_lib.string_to_formula(s)
            for s in formula_lib.split_formula_strings(config['formulas'])]
    eval_strings = config.get('eval_formulas') or config['formulas']
    eval_formulas = [formula_lib.string_to_formula(s)
                     for s in formula_lib.split_formula_strings(eval_strings)]
    size_range = formula_lib.parse_size_range(config['size_range'])
    kwargs = dict(min_atomic_distance=config['min_atomic_distance'],
                  max_solo_distance=config['max_solo_distance'],
                  min_reward=config['min_reward'])
    train_env = MolecularEnv(
        reward_fn=reward_fn, observation_space=observation_space,
        formulas=np.stack([observation_space.bag_from_formula(base[0])]),
        stochastic_size_range=size_range, **kwargs)
    eval_env = MolecularEnv(
        reward_fn=reward_fn, observation_space=observation_space,
        formulas=np.stack([observation_space.bag_from_formula(f)
                           for f in eval_formulas]), **kwargs)
    return train_env, eval_env


def main() -> None:
    config = vars(build_parser().parse_args())
    run_experiment(config, env_builder=stochastic_envs)


if __name__ == '__main__':
    main()
