"""Shared experiment-driver plumbing for the CLI scripts.

Factors the common setup of the reference's scripts/run*.py (directories,
logger, config snapshot, seeds, device, spaces, reward, model build/resume,
PPO launch — reference scripts/run.py:23-124) so each driver script only
declares how to build its environments.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from molgym_tpu import formula as formula_lib
from molgym_tpu.envs import reward as device_reward
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.envs.reward import RewardFn
from molgym_tpu.rl.ppo import PPOConfig, batch_ppo, make_optimizer
from molgym_tpu.spaces import ActionSpace, ObservationSpace, symbols_to_zs
from molgym_tpu.tools import util
from molgym_tpu.tools.model_io import ModelIO
from molgym_tpu.tools.model_util import build_model


def select_platform(device: str, num_devices: int = 0) -> None:
    if device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
        if num_devices > 1:
            # Virtual host devices for CPU data-parallel runs; must happen
            # before the backend initializes.
            flags = os.environ.get('XLA_FLAGS', '')
            if '--xla_force_host_platform_device_count' not in flags:
                os.environ['XLA_FLAGS'] = (
                    flags +
                    f' --xla_force_host_platform_device_count={num_devices}'
                ).strip()
    # 'tpu'/'auto': leave the default platform (TPU when available)


def supports_host_callbacks() -> bool:
    """Probe whether the active backend supports jax host callbacks — some
    PJRT plugins reject io_callback (UNIMPLEMENTED), in which case the
    host-loop rollout is used instead."""
    import jax.numpy as jnp
    import numpy as np

    def cb(x):
        return np.asarray(x)

    try:
        result = jax.jit(lambda x: jax.experimental.io_callback(
            cb, jax.ShapeDtypeStruct((), jnp.float32), x))(jnp.float32(1.0))
        jax.block_until_ready(result)
        return True
    except Exception:
        return False


def make_reward_fn(config: dict, solvation: bool = False
                   ) -> Tuple[RewardFn, Optional[object], float]:
    """Returns (batched RewardFn, host batch calculator or None, distance
    penalty) — the penalty is returned so callback and host-loop transports
    share one definition."""
    backend = config.get('reward', 'sparrow')
    penalty = config.get('distance_penalty', 0.01) if solvation else 0.0
    if backend == 'device_lj':
        fn = device_reward.make_lennard_jones_reward()
        return (device_reward.with_solvation_penalty(fn, penalty)
                if solvation else fn), None, penalty
    if backend == 'device_morse':
        fn = device_reward.make_morse_reward()
        return (device_reward.with_solvation_penalty(fn, penalty)
                if solvation else fn), None, penalty

    from molgym_tpu.calculators.reward_host import make_host_reward
    if backend == 'sparrow':
        from molgym_tpu.calculators.sparrow import SparrowBatchCalculator
        calc = SparrowBatchCalculator(
            num_threads=config.get('num_reward_threads', 8))
    else:
        from molgym_tpu.calculators.native import (METHOD_EHT, METHOD_LJ,
                                                   METHOD_MORSE, METHOD_PM6,
                                                   NativeBatchCalculator)
        calc = NativeBatchCalculator(method={
            'lj': METHOD_LJ, 'morse': METHOD_MORSE, 'eht': METHOD_EHT,
            'pm6': METHOD_PM6
        }[backend])
    from molgym_tpu.calculators.reward_host import TimedBatchCalculator
    calc = TimedBatchCalculator(calc)
    return make_host_reward(calc, distance_penalty=penalty), calc, penalty


EnvBuilder = Callable[[dict, ObservationSpace, RewardFn],
                      Tuple[MolecularEnv, MolecularEnv]]


def standard_envs(config: dict, observation_space: ObservationSpace,
                  reward_fn: RewardFn) -> Tuple[MolecularEnv, MolecularEnv]:
    """Multi-bag environments (reference scripts/run.py:68-94)."""
    train_formulas = [
        formula_lib.string_to_formula(s)
        for s in formula_lib.split_formula_strings(config['formulas'])
    ]
    eval_strings = config.get('eval_formulas') or config['formulas']
    eval_formulas = [
        formula_lib.string_to_formula(s)
        for s in formula_lib.split_formula_strings(eval_strings)
    ]
    kwargs = dict(min_atomic_distance=config['min_atomic_distance'],
                  max_solo_distance=config['max_solo_distance'],
                  min_reward=config['min_reward'])
    train_env = MolecularEnv(
        reward_fn=reward_fn, observation_space=observation_space,
        formulas=np.stack([observation_space.bag_from_formula(f)
                           for f in train_formulas]), **kwargs)
    eval_env = MolecularEnv(
        reward_fn=reward_fn, observation_space=observation_space,
        formulas=np.stack([observation_space.bag_from_formula(f)
                           for f in eval_formulas]), **kwargs)
    return train_env, eval_env


def run_experiment(config: dict, env_builder: EnvBuilder = standard_envs,
                   solvation: bool = False):
    util.create_directories([config['log_dir'], config['model_dir'],
                             config['data_dir'], config['results_dir']])
    tag = util.get_tag(config)
    util.setup_logger(config, directory=config['log_dir'], tag=tag)
    util.save_config(config, directory=config['log_dir'], tag=tag)
    util.set_seeds(config['seed'])
    select_platform(config.get('device', 'auto'),
                    num_devices=config.get('num_devices', 0) or 0)
    if config.get('agg_backend'):
        from molgym_tpu.ops.cg import set_aggregate_backend
        set_aggregate_backend(config['agg_backend'])

    rank = None
    if config.get('multihost'):
        # Multi-host SPMD: one process per host, mesh spans all hosts'
        # devices (ICI within a slice, DCN across slices). On TPU pods /
        # Slurm / OpenMPI the coordinator is auto-detected; generic launchers
        # export it via MOLGYM_COORDINATOR_ADDRESS / MOLGYM_NUM_PROCESSES /
        # MOLGYM_PROCESS_ID (used by the 2-process CPU smoke test).
        dist_kwargs = {}
        addr = os.environ.get('MOLGYM_COORDINATOR_ADDRESS')
        if addr:
            dist_kwargs = dict(
                coordinator_address=addr,
                num_processes=int(os.environ['MOLGYM_NUM_PROCESSES']),
                process_id=int(os.environ['MOLGYM_PROCESS_ID']))
        jax.distributed.initialize(**dist_kwargs)
        rank = jax.process_index()
        logging.info(f'jax.distributed initialized: process {rank} of '
                     f'{jax.process_count()}')
    logging.info(f'JAX devices: {jax.devices()}')

    # Persistent XLA compile cache: on TPU each new program shape costs a
    # multi-minute tunneled remote compile (and the remote queue can wedge
    # for ~20 min — experiments/perf/README.md round 5), so multi-seed /
    # resumed runs of the same config must not pay it again. No-op on the
    # CPU backend (see enable_compile_cache);
    # MOLGYM_TPU_XLA_CACHE_DISABLE=1 opts out entirely. Placed AFTER the
    # jax.distributed block: probing the backend earlier would initialize
    # it before distributed init (breaks --multihost).
    if os.environ.get('MOLGYM_TPU_XLA_CACHE_DISABLE', '') != '1':
        cache_dir = util.enable_compile_cache()
        if cache_dir:
            logging.info(f'Persistent XLA compile cache: {cache_dir}')

    zs = symbols_to_zs(config['symbols'])
    observation_space = ObservationSpace(canvas_size=config['canvas_size'], zs=zs)
    action_space = ActionSpace(zs=zs)

    reward_fn, host_calc, distance_penalty = make_reward_fn(
        config, solvation=solvation)

    host_loop_calc = None
    mode = config.get('host_reward_mode', 'auto')
    # 'loop' forces pipelined, 'loop_serial' forces serial; 'auto' measures
    # both transports on the first warm iterations and keeps the winner
    # (AutoTransportRollout — with the host energy cache, cheap rewards favor
    # the serial loop and expensive SCF rewards the pipelined one).
    pipelined = {'loop': True, 'loop_serial': False}.get(mode, 'auto')
    if host_calc is not None:
        if mode in ('loop', 'loop_serial') or (
                mode == 'auto' and not supports_host_callbacks()):
            logging.info(
                'Host rewards via %s host-loop rollout (backend lacks '
                'io_callback support or forced)',
                {'loop': 'pipelined', 'loop_serial': 'serial'}.get(
                    mode, 'auto-selected'))
            host_loop_calc = host_calc

    train_env, eval_env = env_builder(config, observation_space, reward_fn)

    agent = build_model(config, observation_space, action_space)
    rng = jax.random.PRNGKey(config['seed'])
    example_obs = train_env.init_states(rng, 1).observation()
    params = agent.init(rng, example_obs, rng, method=agent.act)
    logging.info(f'Model parameters: {util.count_params(params)}')

    ppo_config = PPOConfig(
        gamma=config['discount'], lam=config['lam'],
        clip_ratio=config['clip_ratio'], vf_coef=config['vf_coef'],
        entropy_coef=config['entropy_coef'], target_kl=config['target_kl'],
        gradient_clip=config['gradient_clip'],
        learning_rate=config['learning_rate'],
        max_num_train_iters=config['max_num_train_iters'],
        mini_batch_size=config['mini_batch_size'],
        amsgrad=config.get('optimizer', 'adam') == 'amsgrad')

    model_handler = ModelIO(directory=config['model_dir'], tag=tag,
                            keep=config.get('keep_models', False))
    start_num_steps = 0
    opt_state = None
    if config.get('load_latest') or config.get('load_model'):
        optimizer = make_optimizer(ppo_config)
        template = {'params': params, 'opt_state': optimizer.init(params)}
        if config.get('load_latest'):
            state, start_num_steps = model_handler.load_latest(template=template)
        else:
            state, start_num_steps = model_handler.load(
                config['load_model'], template=template)
        params = state['params']
        opt_state = state.get('opt_state')

    save_mode = config.get('save_rollouts', 'none')
    rollout_saver = None
    if save_mode != 'none':
        rollout_saver = util.RolloutSaver(directory=config['data_dir'], tag=tag,
                                          rank=rank)
    info_saver = util.InfoSaver(
        directory=config['results_dir'], tag=tag,
        tensorboard_dir=(os.path.join(config['log_dir'], 'tb')
                         if config.get('tensorboard') else None))

    mesh = None
    if config.get('num_devices', 0) and config['num_devices'] > 1:
        from molgym_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(config['num_devices'])
        logging.info(f'Data-parallel mesh: {mesh.shape}')

    result = batch_ppo(
        train_env, eval_env, agent, params,
        mesh=mesh,
        opt_state=opt_state,
        num_envs=config['num_envs'],
        num_eval_envs=1,
        config=ppo_config,
        start_num_steps=start_num_steps,
        max_num_steps=config['max_num_steps'],
        num_steps_per_iter=config['num_steps_per_iter'],
        save_freq=config['save_freq'],
        eval_freq=config['eval_freq'],
        # default: one greedy episode per eval formula so multi-bag evals
        # cover every bag in the cycle (reference scripts/run.py:69-70 — all
        # three reference drivers default num_eval_episodes=len(eval_formulas))
        num_eval_episodes=(config.get('num_eval_episodes')
                           or int(eval_env.formulas.shape[0])),
        eval_sample_k=config.get('eval_sample_k', 0) or 0,
        model_handler=model_handler,
        rollout_saver=rollout_saver,
        save_train_rollout=save_mode in ('train', 'all'),
        save_eval_rollout=save_mode in ('eval', 'all'),
        info_saver=info_saver,
        seed=config['seed'],
        profile_dir=(os.path.join(config['log_dir'], 'profile')
                     if config.get('profile') else None),
        host_loop_calculator=host_loop_calc,
        host_distance_penalty=distance_penalty,
        host_loop_pipelined=pipelined,
        host_reward_timer=host_calc,
    )
    if host_calc is not None and hasattr(host_calc, 'pool_stats'):
        logging.info(f'Host reward pool stats: {host_calc.pool_stats()}')
    return result
