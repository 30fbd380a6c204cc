"""CLI flag tree (reference molgym/tools/arg_parser.py parity + TPU additions).

Same flag names and defaults as the reference so existing run commands port
unchanged; additions: --reward backend selection (sparrow | lj | morse |
device_lj | device_morse), --num_reward_threads, --num_devices for data-
parallel meshes, and --optimizer amsgrad support carried over.
"""
from __future__ import annotations

import argparse


def build_default_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Command line tool of molgym-tpu')

    # Name and seed
    parser.add_argument('--name', help='experiment name', required=True)
    parser.add_argument('--seed', help='run ID', type=int, default=0)

    # Directories
    parser.add_argument('--log_dir', help='directory for log files', type=str,
                        default='logs')
    parser.add_argument('--model_dir', help='directory for model files',
                        type=str, default='models')
    parser.add_argument('--data_dir', help='directory for saved rollouts',
                        type=str, default='data')
    parser.add_argument('--results_dir', help='directory for results',
                        type=str, default='results')

    # Device
    parser.add_argument('--device', help='select device', type=str,
                        choices=['cpu', 'tpu', 'auto'], default='auto')
    parser.add_argument('--num_devices',
                        help='number of devices for the data-parallel mesh '
                             '(0 = all visible)', type=int, default=0)

    # Spaces
    parser.add_argument('--canvas_size',
                        help='maximum number of atoms on the canvas',
                        type=int, default=25)
    parser.add_argument('--symbols',
                        help='chemical symbols on canvas and in bag '
                             '(comma separated, X first)',
                        type=str, default='X,H,C,N,O,F')

    # Environment
    parser.add_argument('--formulas',
                        help='list of formulas for the environment '
                             '(comma separated)', type=str, required=True)
    parser.add_argument('--eval_formulas',
                        help='formulas used for evaluation (comma separated)',
                        type=str, required=False)
    parser.add_argument('--bag_scale', help='maximum bag size', type=int,
                        required=True)
    parser.add_argument('--min_atomic_distance',
                        help='minimum allowed atomic distance (Angstrom)',
                        type=float, default=0.6)
    parser.add_argument('--max_solo_distance',
                        help='maximum distance hydrogen/halogens can be from '
                             'the nearest heavy atom', type=float, default=2.0)
    parser.add_argument('--min_reward', help='minimum reward', type=float,
                        default=-0.6)

    # Reward backend
    parser.add_argument('--reward',
                        help='reward backend: pm6 (native NDDO SCF, matches '
                             'the reference Sparrow-PM6 golden energies), '
                             'sparrow (PM6 via scine when installed), '
                             'eht (native extended-Hückel electronic '
                             'structure), lj/morse (native C++ pair '
                             'potentials), device_lj/device_morse (pure '
                             'on-device)',
                        type=str, default='sparrow',
                        choices=['sparrow', 'pm6', 'eht', 'lj', 'morse',
                                 'device_lj', 'device_morse'])
    parser.add_argument('--host_reward_mode',
                        help='host reward transport: io_callback inside the '
                             'rollout scan, a host-orchestrated step loop '
                             '(pipelined: QM rewards overlap the next policy '
                             'forward; loop_serial forces the strict-order '
                             'loop), or auto-detect backend support',
                        type=str, default='auto',
                        choices=['auto', 'callback', 'loop', 'loop_serial'])
    parser.add_argument('--num_reward_threads',
                        help='host reward evaluator threads', type=int,
                        default=8)

    # Model
    parser.add_argument('--model', help='model representation', type=str,
                        default='internal',
                        choices=['internal', 'covariant', 'mlp'])
    parser.add_argument('--min_mean_distance', help='minimum mean distance',
                        type=float, default=0.8)
    parser.add_argument('--max_mean_distance', help='maximum mean distance',
                        type=float, default=1.8)
    parser.add_argument('--network_width', help='width of FC layers', type=int,
                        default=128)
    parser.add_argument('--maxl', help='max L in spherical expansion',
                        type=int, default=4)
    parser.add_argument('--num_cg_levels', help='number of CG layers',
                        type=int, default=3)
    parser.add_argument('--num_channels_hidden',
                        help='hidden channels in CG layers', type=int, default=10)
    parser.add_argument('--num_channels_per_element',
                        help='channels per element', type=int, default=4)
    parser.add_argument('--num_gaussians', help='number of GMM components',
                        type=int, default=3)
    parser.add_argument('--beta', help='beta of the spherical distribution',
                        required=False, default=None)
    parser.add_argument('--num_interactions',
                        help='SchNet interaction blocks (internal model)',
                        type=int, default=3)
    parser.add_argument('--encoder_dtype',
                        help='compute dtype of the covariant CG stack '
                        '(bfloat16 halves encoder HBM traffic on TPU; heads '
                        'stay float32)',
                        type=str, choices=['float32', 'bfloat16'],
                        default='float32')

    parser.add_argument('--load_latest', help='load latest checkpoint',
                        action='store_true', default=False)
    parser.add_argument('--load_model', help='load checkpoint directory',
                        type=str, default=None)
    parser.add_argument('--save_freq', help='save model every <n> iterations',
                        type=int, default=10)
    parser.add_argument('--eval_freq', help='evaluate every <n> iterations',
                        type=int, default=10)
    parser.add_argument('--num_eval_episodes',
                        help='episodes per evaluation '
                             '(default: one per eval formula)',
                        type=int, default=None)
    parser.add_argument('--eval_sample_k',
                        help='0 (default): reference-parity greedy eval. '
                             'K>0: SAMPLED eval with K episodes per formula; '
                             'adds return_best_mean (per-formula best) to '
                             'the eval stream — sidesteps the greedy-mode '
                             'pathology (experiments/stochastic_pm6)',
                        type=int, default=0)

    # Training algorithm
    parser.add_argument('--optimizer', help='optimizer', type=str,
                        default='adam', choices=['adam', 'amsgrad'])
    parser.add_argument('--discount', help='discount factor', type=float,
                        default=1.0)
    parser.add_argument('--num_steps', dest='max_num_steps',
                        help='maximum number of steps', type=int, default=50000)
    parser.add_argument('--num_steps_per_iter',
                        help='env steps per iteration', type=int, default=128)
    parser.add_argument('--mini_batch_size', help='mini batch size', type=int,
                        default=64)
    parser.add_argument('--num_envs', help='number of environment copies',
                        type=int, default=8)
    parser.add_argument('--clip_ratio', help='PPO clip ratio', type=float,
                        default=0.2)
    parser.add_argument('--learning_rate', help='Adam learning rate',
                        type=float, default=3e-4)
    parser.add_argument('--vf_coef', help='value loss coefficient', type=float,
                        default=0.5)
    parser.add_argument('--entropy_coef', help='entropy loss coefficient',
                        type=float, default=0.01)
    parser.add_argument('--max_num_train_iters',
                        help='max optimization epochs per iteration', type=int,
                        default=7)
    parser.add_argument('--gradient_clip', help='max gradient norm',
                        type=float, default=0.5)
    parser.add_argument('--lam', help='GAE lambda', type=float, default=0.97)
    parser.add_argument('--target_kl', help='KL early-stop target', type=float,
                        default=0.01)

    # Logging
    parser.add_argument('--log_level', help='log level', type=str,
                        default='INFO')
    parser.add_argument('--keep_models', help='keep all checkpoints',
                        action='store_true', default=False)
    parser.add_argument('--save_rollouts', help='which rollouts to save',
                        type=str, default='none',
                        choices=['none', 'train', 'eval', 'all'])
    parser.add_argument('--tensorboard', help='also write TensorBoard scalars',
                        action='store_true', default=False)
    parser.add_argument('--profile', help='capture a jax.profiler trace of one '
                        'training iteration into <log_dir>/profile',
                        action='store_true', default=False)
    parser.add_argument('--agg_backend',
                        help='backend for the covariant edge aggregation: '
                             'auto = fused Pallas kernel on TPU, XLA einsum '
                             'elsewhere',
                        type=str, default='auto',
                        choices=['auto', 'einsum', 'pallas'])
    parser.add_argument('--multihost',
                        help='initialize jax.distributed for multi-host meshes '
                             '(same program per host; artifacts rank-tagged)',
                        action='store_true', default=False)

    return parser
