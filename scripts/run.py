"""Single/multi-bag training experiment (reference scripts/run.py).

Example (fast, no quantum chemistry needed):
    python scripts/run.py --name=h2o --formulas=H2O --bag_scale=3 \
        --canvas_size=3 --symbols=X,H,O --reward=lj --model=internal \
        --num_steps=2048 --seed=1
"""
from molgym_tpu.tools.arg_parser import build_default_argparser
from molgym_tpu.tools.driver import run_experiment, standard_envs


def main() -> None:
    config = vars(build_default_argparser().parse_args())
    run_experiment(config, env_builder=standard_envs)


if __name__ == '__main__':
    main()
