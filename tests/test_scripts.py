"""End-to-end tests for the offline analysis entry points (reference
scripts/plot.py:49-121 and scripts/structures.py:36-71) — the reference
ships both untested; here each main() runs against synthetic artifacts."""
import importlib.util
import json
import os
import pickle
import sys

import numpy as np
import pytest

SCRIPTS_DIR = os.path.join(os.path.dirname(__file__), os.pardir, 'scripts')


def load_script(name: str):
    """Import scripts/<name>.py as a module (scripts/ is not a package)."""
    path = os.path.join(SCRIPTS_DIR, name + '.py')
    spec = importlib.util.spec_from_file_location(f'script_{name}', path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = module
    spec.loader.exec_module(module)
    return module


class TestPlotMain:
    def test_writes_pdf_with_seed_aggregation(self, tmp_path, monkeypatch):
        monkeypatch.setenv('MPLBACKEND', 'Agg')
        results = tmp_path / 'results'
        results.mkdir()
        # two seeds of one experiment + one seed of another (mixed dirs are
        # the normal layout, reference scripts/plot.py aggregates per name)
        for seed, offset in [(1, 0.0), (2, 0.2)]:
            rows = [{'total_num_steps': s, 'return_mean': offset + s / 1000}
                    for s in (0, 140, 280)]
            with open(results / f'exp_run-{seed}_eval.txt', 'w') as f:
                f.writelines(json.dumps(r) + '\n' for r in rows)
        with open(results / 'other_run-1_eval.txt', 'w') as f:
            f.write(json.dumps({'total_num_steps': 0, 'return_mean': 1.0}) + '\n')

        out = tmp_path / 'curve.pdf'
        plot = load_script('plot')
        monkeypatch.setattr(sys, 'argv', [
            'plot.py', f'--dir={results}', '--mode=eval', f'--output={out}'])
        plot.main()
        assert out.exists() and out.stat().st_size > 0

    def test_missing_streams_raise(self, tmp_path, monkeypatch):
        monkeypatch.setenv('MPLBACKEND', 'Agg')
        empty = tmp_path / 'results'
        empty.mkdir()
        plot = load_script('plot')
        monkeypatch.setattr(sys, 'argv', ['plot.py', f'--dir={empty}'])
        with pytest.raises(RuntimeError, match='eval'):
            plot.main()


def make_trajectory(elements, positions, terminals):
    """A minimal [T, B] Trajectory as RolloutSaver pickles it."""
    from molgym_tpu.rl.buffer import Trajectory
    from molgym_tpu.spaces import Observation

    elements = np.asarray(elements, dtype=np.int32)  # [T, B, N]
    positions = np.asarray(positions, dtype=np.float32)  # [T, B, N, 3]
    terminals = np.asarray(terminals, dtype=bool)  # [T, B]
    T, B, N = elements.shape
    obs = Observation(elements=elements, positions=positions,
                      bag=np.zeros((T, B, 3), dtype=np.int32))
    zeros = np.zeros((T, B), dtype=np.float32)
    return Trajectory(obs=obs, next_obs=obs,
                      actions=np.zeros((T, B, 4), dtype=np.float32),
                      rewards=zeros, terminals=terminals, values=zeros,
                      logps=zeros,
                      bootstrap_value=np.zeros((B,), dtype=np.float32))


class TestStructuresMain:
    def test_extracts_terminal_canvases(self, tmp_path, monkeypatch):
        data = tmp_path / 'data'
        data.mkdir()
        # T=2, B=1, N=3; element values are indices into the run's zs list
        # (X,H,O -> 0,1,8). Only the t=1 terminal canvas must be extracted.
        elements = [[[1, 0, 0]], [[1, 2, 0]]]
        positions = np.zeros((2, 1, 3, 3))
        positions[1, 0, 1] = [0.0, 0.0, 0.96]
        traj = make_trajectory(elements, positions,
                               terminals=[[False], [True]])
        with open(data / 'exp_run-1_steps-140_eval.pkl', 'wb') as f:
            pickle.dump(traj, f)

        out = tmp_path / 'structures.xyz'
        structures = load_script('structures')
        monkeypatch.setattr(sys, 'argv', [
            'structures.py', f'--dir={data}', '--mode=eval',
            '--symbols=X,H,O', f'--output={out}'])
        structures.main()

        from molgym_tpu.atoms import read_xyz
        frames = read_xyz(str(out), index=slice(None))
        assert len(frames) == 1
        assert sorted(a.symbol for a in frames[0]) == ['H', 'O']
        np.testing.assert_allclose(frames[0][1].position, [0.0, 0.0, 0.96],
                                   atol=1e-6)

    def test_name_filter_and_empty_raise(self, tmp_path, monkeypatch):
        data = tmp_path / 'data'
        data.mkdir()
        traj = make_trajectory([[[1]]], np.zeros((1, 1, 1, 3)),
                               terminals=[[True]])
        with open(data / 'aaa_run-1_steps-10_eval.pkl', 'wb') as f:
            pickle.dump(traj, f)

        structures = load_script('structures')
        # --name filter excluding the only run: no terminal structures
        monkeypatch.setattr(sys, 'argv', [
            'structures.py', f'--dir={data}', '--mode=eval', '--symbols=X,H',
            f'--output={tmp_path / "out.xyz"}', '--name=zzz'])
        with pytest.raises(RuntimeError, match='No terminal structures'):
            structures.main()


class TestVerifyVsSparrow:
    def test_import_gated_path(self, capsys):
        """Without scine the script must explain itself and exit 2 (the only
        path runnable on this image; the scine path is the documented
        contract for hosts that can close the PARITY divergence loop)."""
        mod = load_script('verify_vs_sparrow')
        rc = mod.main()
        out = capsys.readouterr().out
        try:
            from molgym_tpu.calculators.sparrow import SPARROW_AVAILABLE
        except Exception:
            SPARROW_AVAILABLE = False
        if SPARROW_AVAILABLE:
            assert rc == 0
            assert 'golden set' in out
        else:
            assert rc == 2
            assert 'not installed' in out

    def test_divergence_bounds_table(self, capsys):
        """The PARITY.md bounds table generator runs and reproduces the
        committed SF6 per-step bound."""
        mod = load_script('pm6_divergence_bounds')
        mod.main()
        out = capsys.readouterr().out
        assert '| sf6_pm6 | SF6 | 19.4 (SF6) | 6 | 0.0052 |' in out
        assert 'Nonbonded' in out


class TestRunQM9:
    def test_formula_selection_deterministic(self):
        mod = load_script('run_qm9')
        tar = os.path.join(SCRIPTS_DIR, os.pardir, 'experiments', 'qm9_pm6',
                           'qm9_sample.tar.gz')
        got = mod.select_qm9_formulas(tar, 'X,H,C,N,O,F', 7, 4, 0)
        assert got == mod.select_qm9_formulas(tar, 'X,H,C,N,O,F', 7, 4, 0)
        assert len(got) == 4
        # every selection fits the canvas and the symbol set
        from molgym_tpu.formula import get_formula_size, string_to_formula
        for f in got:
            assert get_formula_size(string_to_formula(f)) <= 7
        # excluded-element filter: no F in the symbol set -> no CFH3
        no_f = mod.select_qm9_formulas(tar, 'X,H,C,N,O', 7, 99, 0)
        assert all('F' not in f for f in no_f)
        with pytest.raises(RuntimeError, match='no QM9 molecules'):
            mod.select_qm9_formulas(tar, 'X,H', 2, 4, 0)

    @pytest.mark.slow
    def test_end_to_end_cpu(self, tmp_path, monkeypatch):
        """The parser feeds run_experiment end to end (VERDICT r03 next #3):
        tiny multi-bag run on the committed QM9 sample, CPU + device_lj."""
        mod = load_script('run_qm9')
        tar = os.path.join(SCRIPTS_DIR, os.pardir, 'experiments', 'qm9_pm6',
                           'qm9_sample.tar.gz')
        monkeypatch.setattr(sys, 'argv', [
            'run_qm9.py', '--name=qm9smoke', f'--qm9_dataset={tar}',
            '--qm9_num_formulas=2', '--canvas_size=5', '--symbols=X,H,C,N,O,F',
            '--bag_scale=3',
            '--reward=device_lj', '--model=mlp', '--network_width=16',
            '--device=cpu', '--num_envs=4', '--num_steps=16',
            '--num_steps_per_iter=8', '--mini_batch_size=4',
            '--max_num_train_iters=2', '--eval_freq=1', '--save_freq=1',
            '--seed=1',
            f'--log_dir={tmp_path}/logs', f'--model_dir={tmp_path}/models',
            f'--results_dir={tmp_path}/results', f'--data_dir={tmp_path}/data'])
        mod.main()
        # the sampled formulas are recorded in the config snapshot
        with open(tmp_path / 'logs' / 'qm9smoke_run-1.json') as f:
            config = json.load(f)
        formulas = config['formulas'].split(',')
        assert len(formulas) == 2
        assert (tmp_path / 'results' / 'qm9smoke_run-1_eval.txt').exists()
