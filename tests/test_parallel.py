"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molgym_tpu.agents.internal import make_mlp_internal_agent
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.envs.reward import make_lennard_jones_reward
from molgym_tpu.formula import string_to_formula
from molgym_tpu.parallel.mesh import make_dp_ppo_iteration, make_mesh
from molgym_tpu.rl.ppo import PPOConfig
from molgym_tpu.spaces import ObservationSpace


def build(num_envs):
    space = ObservationSpace(canvas_size=3, zs=[0, 8])
    formulas = np.stack([space.bag_from_formula(string_to_formula('O2'))])
    env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                       observation_space=space, formulas=formulas)
    agent = make_mlp_internal_agent(num_zs=2, canvas_size=3, network_width=16)
    rng = jax.random.PRNGKey(0)
    params = agent.init(rng, env.init_states(rng, num_envs).observation(), rng,
                        method=agent.act)
    return env, agent, params


class TestMesh:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_make_mesh(self):
        mesh = make_mesh(8)
        assert mesh.shape['dp'] == 8
        assert make_mesh(4).shape['dp'] == 4


class TestDataParallelPPO:
    @pytest.mark.slow
    def test_iteration_runs_sharded(self):
        num_envs = 8
        env, agent, params = build(num_envs)
        mesh = make_mesh(8)
        config = PPOConfig(mini_batch_size=8, max_num_train_iters=2, gamma=1.0)
        init_fn, iteration = make_dp_ppo_iteration(
            env, agent, config, num_envs=num_envs, num_steps_per_iter=16,
            mesh=mesh)
        rng = jax.random.PRNGKey(1)
        states, opt_state = init_fn(rng, params)
        # env states actually sharded along dp
        assert len(states.elements.sharding.device_set) == 8
        new_params, opt_state, states, traj, info = iteration(
            params, opt_state, states, rng)
        assert np.isfinite(float(np.asarray(info['total_loss'])))
        assert traj.rewards.shape == (2, num_envs)
        diff = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
            jax.tree.leaves(new_params), jax.tree.leaves(params)))
        assert diff > 0

    @pytest.mark.slow
    def test_dp_matches_single_device(self):
        """The sharded program must compute the same update as the unsharded
        one (bitwise-identical math modulo reduction order)."""
        num_envs = 8
        env, agent, params = build(num_envs)
        config = PPOConfig(mini_batch_size=8, max_num_train_iters=2, gamma=1.0)

        init_1, iter_1 = make_dp_ppo_iteration(
            env, agent, config, num_envs=num_envs, num_steps_per_iter=16,
            mesh=None)
        init_8, iter_8 = make_dp_ppo_iteration(
            env, agent, config, num_envs=num_envs, num_steps_per_iter=16,
            mesh=make_mesh(8))

        rng = jax.random.PRNGKey(2)
        s1, o1 = init_1(rng, params)
        s8, o8 = init_8(rng, params)
        p1, _, _, t1, i1 = iter_1(params, o1, s1, rng)
        p8, _, _, t8, i8 = iter_8(params, o8, s8, rng)
        np.testing.assert_allclose(np.asarray(t1.rewards), np.asarray(t8.rewards),
                                   atol=1e-5)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        assert float(np.asarray(i1['total_loss'])) == pytest.approx(
            float(np.asarray(i8['total_loss'])), abs=1e-4)


class TestMultihost:
    """2-process jax.distributed run on the CPU backend: initialization,
    global device visibility, and a cross-process collective (the mechanism
    --multihost relies on, tools/driver.py run_experiment)."""

    def test_two_process_distributed_psum(self, tmp_path):
        import os
        import socket
        import subprocess
        import sys
        import textwrap

        with socket.socket() as s:  # free port for the coordinator
            s.bind(('localhost', 0))
            port = s.getsockname()[1]

        worker = textwrap.dedent('''
            import sys
            import jax
            import jax.numpy as jnp
            import numpy as np
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            proc = int(sys.argv[1])
            jax.distributed.initialize(
                coordinator_address=f'localhost:{int(sys.argv[2])}',
                num_processes=2, process_id=proc)
            assert jax.process_count() == 2, jax.process_count()
            assert jax.process_index() == proc
            devs = jax.devices()
            n = len(devs)
            assert n == 4, devs  # 2 local CPU devices per process
            mesh = Mesh(np.array(devs), ('dp',))
            sharding = NamedSharding(mesh, P('dp'))
            # each process contributes its local shard; the jitted sum needs
            # a cross-process all-reduce
            x = jax.make_array_from_callback(
                (n,), sharding, lambda idx: np.arange(n, dtype=np.float32)[idx])
            total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
            assert float(total) == sum(range(n)), float(total)
            print(f'RANK{proc}_OK')
        ''')
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env.pop('JAX_NUM_PROCESSES', None)
        # this image's sitecustomize registers/initializes the single-client
        # TPU PJRT plugin at interpreter start when this var is set, which
        # both races the tunnel and pre-initializes jax before
        # jax.distributed can take effect — the workers must start clean
        env.pop('PALLAS_AXON_POOL_IPS', None)
        procs = [subprocess.Popen(
            [sys.executable, '-c', worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(tmp_path), text=True) for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f'rank {i} failed:\n{out}'
            assert f'RANK{i}_OK' in out

    @pytest.mark.slow
    def test_two_process_full_ppo_matches_single_process(self, tmp_path):
        """Full-program multihost proof (round-2 VERDICT item 7): one
        make_dp_ppo_iteration across 2 processes (2 CPU devices each, global
        4-way dp mesh) must produce the same updated parameters as the same
        iteration on a single-process 4-device mesh."""
        import os
        import socket
        import subprocess
        import sys
        import textwrap

        with socket.socket() as s:
            s.bind(('localhost', 0))
            port = s.getsockname()[1]

        worker = textwrap.dedent('''
            import sys
            import jax
            import numpy as np
            from jax.sharding import Mesh

            proc = int(sys.argv[1])
            jax.distributed.initialize(
                coordinator_address=f'localhost:{int(sys.argv[2])}',
                num_processes=2, process_id=proc)
            assert len(jax.devices()) == 4

            from molgym_tpu.agents.internal import make_mlp_internal_agent
            from molgym_tpu.envs.environment import MolecularEnv
            from molgym_tpu.envs.reward import make_lennard_jones_reward
            from molgym_tpu.formula import string_to_formula
            from molgym_tpu.parallel.mesh import (make_dp_ppo_iteration,
                                                  make_mesh)
            from molgym_tpu.rl.ppo import PPOConfig
            from molgym_tpu.spaces import ObservationSpace

            space = ObservationSpace(canvas_size=3, zs=[0, 8])
            formulas = np.stack([space.bag_from_formula(
                string_to_formula('O2'))])
            env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                               observation_space=space, formulas=formulas)
            agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                            network_width=16)
            rng = jax.random.PRNGKey(0)
            params = agent.init(
                rng, env.init_states(rng, 4).observation(), rng,
                method=agent.act)
            config = PPOConfig(mini_batch_size=4, max_num_train_iters=2,
                               gamma=1.0)
            init_fn, iteration = make_dp_ppo_iteration(
                env, agent, config, num_envs=4, num_steps_per_iter=8,
                mesh=make_mesh(4))
            rng = jax.random.PRNGKey(1)
            states, opt_state = init_fn(rng, params)
            new_params, opt_state, states, traj, info = iteration(
                params, opt_state, states, rng)
            jax.block_until_ready(new_params)
            leaves = [np.asarray(x.addressable_data(0))
                      for x in jax.tree.leaves(new_params)]
            np.savez(sys.argv[3], *leaves,
                     loss=np.asarray(info['total_loss'].addressable_data(0)))
            print(f'RANK{proc}_OK')
        ''')
        env_vars = dict(os.environ)
        env_vars['JAX_PLATFORMS'] = 'cpu'
        env_vars['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env_vars.pop('JAX_NUM_PROCESSES', None)
        env_vars.pop('PALLAS_AXON_POOL_IPS', None)
        # the workers run with cwd=tmp_path, so the repo root must be on
        # their path explicitly (molgym_tpu is not pip-installed)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env_vars['PYTHONPATH'] = repo_root + os.pathsep + env_vars.get(
            'PYTHONPATH', '')
        outs_npz = [str(tmp_path / f'rank{i}.npz') for i in range(2)]
        procs = [subprocess.Popen(
            [sys.executable, '-c', worker, str(i), str(port), outs_npz[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env_vars,
            cwd=str(tmp_path), text=True) for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f'rank {i} failed:\n{out}'
            assert f'RANK{i}_OK' in out

        # single-process 4-device reference (same seeds, same program)
        env, agent, params = build(4)
        config = PPOConfig(mini_batch_size=4, max_num_train_iters=2, gamma=1.0)
        init_fn, iteration = make_dp_ppo_iteration(
            env, agent, config, num_envs=4, num_steps_per_iter=8,
            mesh=make_mesh(4))
        rng = jax.random.PRNGKey(1)
        states, opt_state = init_fn(rng, params)
        ref_params, _, _, _, ref_info = iteration(params, opt_state, states,
                                                  rng)
        ref_leaves = [np.asarray(x) for x in jax.tree.leaves(ref_params)]

        for path in outs_npz:
            data = np.load(path)
            got = [data[f'arr_{i}'] for i in range(len(ref_leaves))]
            for a, b in zip(got, ref_leaves):
                np.testing.assert_allclose(a, b, atol=1e-4)
            assert float(data['loss']) == pytest.approx(
                float(np.asarray(ref_info['total_loss'])), abs=1e-4)

    @pytest.mark.slow
    def test_two_process_driver_multihost_smoke(self, tmp_path):
        """VERDICT r03 next #7: the REAL driver path under --multihost — env
        creation, checkpointing, and rank-tagged rollout artifacts across 2
        jax.distributed processes (2 CPU devices each, global 4-way dp mesh)
        via scripts/run.py, not just the mesh iteration function."""
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(('localhost', 0))
            port = s.getsockname()[1]

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        data_dir = tmp_path / 'data'  # shared: filenames are rank-tagged
        procs = []
        for proc_id in range(2):
            env_vars = dict(os.environ)
            env_vars['JAX_PLATFORMS'] = 'cpu'
            env_vars['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
            env_vars.pop('JAX_NUM_PROCESSES', None)
            env_vars.pop('PALLAS_AXON_POOL_IPS', None)
            env_vars['PYTHONPATH'] = repo_root + os.pathsep + env_vars.get(
                'PYTHONPATH', '')
            env_vars['MOLGYM_COORDINATOR_ADDRESS'] = f'localhost:{port}'
            env_vars['MOLGYM_NUM_PROCESSES'] = '2'
            env_vars['MOLGYM_PROCESS_ID'] = str(proc_id)
            rank_dir = tmp_path / f'rank{proc_id}'
            procs.append(subprocess.Popen(
                [sys.executable, os.path.join(repo_root, 'scripts', 'run.py'),
                 '--name=mh_smoke', '--formulas=O2', '--symbols=X,O',
                 '--canvas_size=3', '--bag_scale=3', '--reward=device_lj',
                 '--model=mlp', '--network_width=16', '--device=cpu',
                 '--num_devices=4', '--multihost', '--num_envs=4',
                 '--num_steps=16', '--num_steps_per_iter=8',
                 '--mini_batch_size=4', '--max_num_train_iters=2',
                 '--eval_freq=1', '--save_freq=1', '--save_rollouts=eval',
                 '--seed=1',
                 f'--log_dir={rank_dir}/logs', f'--model_dir={rank_dir}/models',
                 f'--results_dir={rank_dir}/results', f'--data_dir={data_dir}'],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env_vars, cwd=str(tmp_path), text=True))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f'rank {i} failed:\n{out}'
            assert 'jax.distributed initialized: process ' + str(i) in out

        # rank-tagged rollout artifacts from BOTH processes in the shared
        # data dir (tools/analysis.py parses the _rank-N suffix; reference
        # tools/analysis.py:17,25)
        names = [f.name for f in data_dir.iterdir()]
        for rank in range(2):
            tagged = [n for n in names if f'_rank-{rank}_' in n
                      and n.endswith('.pkl')]
            assert tagged, f'no rank-{rank} artifacts in {names}'
        # checkpoints + metric streams written under each rank's own dirs
        for rank in range(2):
            rank_dir = tmp_path / f'rank{rank}'
            assert any((rank_dir / 'models').iterdir())
            assert (rank_dir / 'results' / 'mh_smoke_run-1_eval.txt').exists()
