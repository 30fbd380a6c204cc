"""Tools tests: checkpoint IO round-trip, analysis regexes, QM9 parser."""
import io
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molgym_tpu.tools.analysis import (parse_buffer_filename,
                                       parse_json_lines_file,
                                       parse_results_filename)
from molgym_tpu.tools.model_io import (ModelIO, is_legacy_covariant_tree,
                                       migrate_legacy_covariant)
from molgym_tpu.tools.qm9_parser import parse_dataset


class TestModelIO:
    def _params(self, seed=0):
        rng = np.random.RandomState(seed)
        return {'dense': {'kernel': jnp.asarray(rng.randn(3, 4).astype(np.float32)),
                          'bias': jnp.zeros(4)}}

    def test_save_load_roundtrip(self, tmp_path):
        handler = ModelIO(directory=str(tmp_path), tag='exp_run-0')
        params = self._params()
        handler.save(params, opt_state=None, num_steps=128)
        state, steps = handler.load_latest(template={'params': self._params(1)})
        assert steps == 128
        np.testing.assert_allclose(state['params']['dense']['kernel'],
                                   params['dense']['kernel'])

    def test_latest_picks_max_and_deletes_old(self, tmp_path):
        handler = ModelIO(directory=str(tmp_path), tag='exp_run-0')
        handler.save(self._params(0), num_steps=100)
        handler.save(self._params(1), num_steps=200)
        # old checkpoint deleted (keep=False)
        names = os.listdir(tmp_path)
        assert 'exp_run-0_steps-100.model' not in names
        _, steps = handler.load_latest(template={'params': self._params(2)})
        assert steps == 200

    def test_keep_models(self, tmp_path):
        handler = ModelIO(directory=str(tmp_path), tag='exp_run-0', keep=True)
        handler.save(self._params(0), num_steps=100)
        handler.save(self._params(1), num_steps=200)
        names = os.listdir(tmp_path)
        assert 'exp_run-0_steps-100.model' in names

    def test_missing_raises(self, tmp_path):
        handler = ModelIO(directory=str(tmp_path), tag='nope_run-0')
        with pytest.raises(RuntimeError):
            handler.load_latest()


class TestLegacyCovariantMigration:
    """Round-1 covariant checkpoints use the per-l CGLevel weight naming
    (ag_mix_l{l}/w_r, cat_mix/mix_l{l}/w_r); the packed rewrite renamed and
    reshaped them. ModelIO must auto-detect + migrate so --load_latest/eval
    keep working across the format break (round-2 ADVICE item).

    The test builds a real packed agent, down-converts its params to the
    legacy layout with an independent inverse transform, writes a legacy
    checkpoint, and asserts the production restore path reproduces the
    packed tree bitwise."""

    _PACKED = __import__('re').compile(r'w_([ri])_l(\d+)_s(\d+)')

    @classmethod
    def _to_legacy(cls, tree):
        """Inverse of the model_io migration: packed -> round-1 layout."""
        import re
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and any(cls._PACKED.fullmatch(kk)
                                           for kk in v):
                if k == 'ag_mix':
                    for name, w in v.items():
                        m = cls._PACKED.fullmatch(name)
                        leg = out.setdefault(f'ag_mix_l{m.group(2)}', {})
                        w = np.asarray(w)
                        leg[f'w_{m.group(1)}'] = w.reshape(-1, w.shape[-1])
                else:
                    cat = out.setdefault('cat_mix', {})
                    ls = sorted({int(cls._PACKED.fullmatch(n).group(2))
                                 for n in v})
                    for l in ls:
                        mix = cat.setdefault(f'mix_l{l}', {})
                        for part in 'ri':
                            pieces = [
                                np.asarray(v[f'w_{part}_l{l}_s{s}'])
                                for s in range(3)
                                if f'w_{part}_l{l}_s{s}' in v
                            ]
                            mix[f'w_{part}'] = np.concatenate(
                                [p.reshape(-1, p.shape[-1]) for p in pieces],
                                axis=0)
            elif isinstance(v, dict):
                out[k] = cls._to_legacy(v)
            else:
                out[k] = np.asarray(v)
        return out

    def _packed_params(self):
        from molgym_tpu.agents.covariant import CovariantAC
        from molgym_tpu.atoms import Atoms
        from molgym_tpu.spaces import ObservationSpace
        space = ObservationSpace(canvas_size=4, zs=[0, 1, 8])
        agent = CovariantAC(zs=(0, 1, 8), canvas_size=4, network_width=16,
                            maxl=2, num_cg_levels=2, num_channels_hidden=3,
                            num_channels_per_element=2, num_gaussians=2,
                            bag_scale=3, min_max_distance=(0.9, 1.8),
                            beta=-10.0)
        obs = space.build(Atoms(), ((1, 1), ))
        obs = jax.tree.map(lambda x: jnp.asarray(x)[None], obs)
        rng = jax.random.PRNGKey(0)
        return agent.init(rng, obs, rng, method=agent.act)

    @pytest.mark.slow
    def test_roundtrip_through_modelio(self, tmp_path):
        import optax
        packed = self._packed_params()
        legacy = self._to_legacy(packed)
        assert is_legacy_covariant_tree(legacy)
        assert not is_legacy_covariant_tree(packed)

        opt = optax.adam(1e-3)
        legacy_state = {'params': legacy, 'opt_state': opt.init(legacy)}
        handler = ModelIO(directory=str(tmp_path), tag='legacy_run-0')
        handler.save(legacy_state['params'], legacy_state['opt_state'],
                     num_steps=500)

        template = {'params': packed, 'opt_state': opt.init(packed)}
        state, steps = handler.load_latest(template=template)
        assert steps == 500
        flat_new = jax.tree_util.tree_leaves_with_path(state['params'])
        flat_ref = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_leaves_with_path(packed))
        assert len(flat_new) == len(flat_ref)
        for path, leaf in flat_new:
            ref = flat_ref[jax.tree_util.keystr(path)]
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))
        # optimizer state migrated with the same structure as the template
        assert (jax.tree_util.tree_structure(state['opt_state'])
                == jax.tree_util.tree_structure(template['opt_state']))

    def test_migrate_rejects_mismatched_rows(self):
        packed = {'cat_mix': {'w_r_l0_s0': np.zeros((1, 3, 3)),
                              'w_r_l0_s1': np.zeros((2, 3, 3))}}
        legacy = {'cat_mix': {'mix_l0': {'w_r': np.zeros((5, 3))}}}
        with pytest.raises(ValueError):
            migrate_legacy_covariant(legacy, packed)


class TestAnalysis:
    def test_buffer_filename(self):
        meta = parse_buffer_filename('exp_run-3_steps-1280_eval.pkl')
        assert meta == {'name': 'exp', 'seed': 3, 'steps': 1280, 'rank': 0,
                        'mode': 'eval'}

    def test_buffer_filename_with_rank(self):
        meta = parse_buffer_filename('exp_run-3_steps-1280_rank-2_train.pkl')
        assert meta['rank'] == 2 and meta['mode'] == 'train'

    def test_results_filename(self):
        meta = parse_results_filename('exp_run-1_train.txt')
        assert meta == {'name': 'exp', 'seed': 1, 'mode': 'train'}

    def test_bad_filename_raises(self):
        with pytest.raises(RuntimeError):
            parse_buffer_filename('garbage.pkl')

    def test_json_lines(self, tmp_path):
        path = tmp_path / 'x.txt'
        path.write_text('{"a": 1}\n{"a": 2}\n')
        assert parse_json_lines_file(str(path)) == [{'a': 1}, {'a': 2}]


GDB_ENTRY = b"""3
gdb 1\t157.7 157.7 157.7 0. 13.2 -0.38 0.11 0.5 35.3 0.044 -40.4 -40.4 -40.4 -40.4 6.4
C\t-0.012 1.08 0.008\t-0.5
H\t0.002 -0.006 0.002\t0.13
H\t1.011 1.46 0.0\t0.13
100.1 200.2 300.3
C C
InChI=1S/CH4/h1H4 InChI=1S/CH4/h1H4
"""


def _gdb_record(gdb_id: int, symbols, smiles: str, rng) -> bytes:
    """A synthetic but format-exact GDB9 record (random small geometry)."""
    lines = [str(len(symbols))]
    props = ['gdb', str(gdb_id)] + [f'{rng.randn():.4f}' for _ in range(15)]
    if gdb_id % 3 == 0:  # the dataset's *^ exponent quirk, properties line
        props[5] = '1.2*^-3'
    lines.append('\t'.join(props))
    for i, sym in enumerate(symbols):
        x, y, z = rng.randn(3) * 1.2
        if gdb_id % 5 == 0 and i == 0:  # *^ quirk in a coordinate column
            lines.append(f'{sym}\t{x:.4f}*^0\t{y:.6f}\t{z:.6f}\t0.0')
        else:
            lines.append(f'{sym}\t{x:.6f}\t{y:.6f}\t{z:.6f}\t0.0')
    lines.append('\t'.join(['100.0'] * max(1, 3 * len(symbols) - 6)))
    lines.append(f'{smiles}\t{smiles}')
    lines.append('InChI=1S/x\tInChI=1S/x')
    return ('\n'.join(lines) + '\n').encode('ascii')


class TestQM9Parser:
    def test_parse_tar(self, tmp_path):
        tar_path = str(tmp_path / 'gdb9.tar')
        with tarfile.open(tar_path, 'w') as tar:
            info = tarfile.TarInfo('dsgdb9nsd_000001.xyz')
            data = GDB_ENTRY.replace(b'-0.38', b'-0.38*^0')  # notation fixup
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        entries = list(parse_dataset(tar_path))
        assert len(entries) == 1
        gdb_id, atoms, meta = entries[0]
        assert gdb_id == '1'
        assert atoms.symbols == ['C', 'H', 'H']
        assert meta['smiles'] == 'C'

    def test_fuzz_archive_skip_and_count(self, tmp_path, capsys):
        """~1,000-record archive with adversarial members mixed in: the
        parser must yield every well-formed record and SKIP (not crash on)
        every malformed one, matching the reference's regex-reject semantics
        (molgym/tools/qm9_parser.py:29-47). Covers: *^ exponents in
        properties and coordinate columns, blank SMILES lines, truncated
        records (frequency line sliding into the coordinate block), bogus
        element symbols, non-ascii bytes, empty members (VERDICT r04
        next #5)."""
        rng = np.random.RandomState(0)
        pool = [(['C', 'H', 'H', 'H', 'H'], 'C'),
                (['N', 'H', 'H', 'H'], 'N'),
                (['C', 'C', 'H', 'H', 'H', 'H', 'H', 'H'], 'CC'),
                (['C', 'O', 'H', 'H', 'H', 'H'], 'CO'),
                (['C', 'N', 'H'], 'C#N'),
                (['C', 'F', 'H', 'H', 'H'], 'CF')]
        n_good, n_bad = 940, 60
        tar_path = str(tmp_path / 'gdb9_fuzz.tar')
        good_ids = []
        with tarfile.open(tar_path, 'w') as tar:
            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            bad_slots = set(rng.choice(n_good + n_bad, size=n_bad,
                                       replace=False).tolist())
            gdb_id = 0
            for slot in range(n_good + n_bad):
                gdb_id += 1
                name = f'dsgdb9nsd_{gdb_id:06d}.xyz'
                if slot not in bad_slots:
                    symbols, smiles = pool[slot % len(pool)]
                    add(name, _gdb_record(gdb_id, symbols, smiles, rng))
                    good_ids.append(str(gdb_id))
                    continue
                kind = slot % 6
                base = _gdb_record(gdb_id, ['C', 'H', 'H', 'H', 'H'], 'C',
                                   rng)
                if kind == 0:    # truncated mid-coordinates: freq line
                    lines = base.splitlines()  # slides into the coord block
                    add(name, b'\n'.join(lines[:4] + lines[7:]) + b'\n')
                elif kind == 1:  # blank SMILES line
                    lines = base.splitlines()
                    lines[-2] = b''
                    add(name, b'\n'.join(lines) + b'\n')
                elif kind == 2:  # truncated after the properties line
                    add(name, b'\n'.join(base.splitlines()[:2]) + b'\n')
                elif kind == 3:  # bogus element symbol
                    add(name, base.replace(b'C\t', b'Qq\t', 1))
                elif kind == 4:  # non-ascii garbage
                    add(name, b'\xff\xfe' + base[2:])
                else:            # empty member
                    add(name, b'')
        entries = list(parse_dataset(tar_path))
        assert [e[0] for e in entries] == good_ids
        assert len(entries) == n_good
        # every skip is reported (skip-and-count semantics)
        out = capsys.readouterr().out
        assert out.count('Could not parse') == n_bad
        # strict mode raises on the first malformed member instead
        from molgym_tpu.tools.qm9_parser import ParserError
        with pytest.raises(ParserError):
            list(parse_dataset(tar_path, strict=True))

    def test_parse_entry_coordinate_exponent_fixup(self, tmp_path):
        """A *^ exponent inside a coordinate column (present in the real
        GDB9 tar) round-trips through the archive-level fixup."""
        rng = np.random.RandomState(1)
        data = _gdb_record(5, ['C', 'H', 'H', 'H', 'H'], 'C', rng)
        assert b'*^' in data
        tar_path = str(tmp_path / 'one.tar')
        with tarfile.open(tar_path, 'w') as tar:
            info = tarfile.TarInfo('dsgdb9nsd_000005.xyz')
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        (gdb_id, atoms, meta), = list(parse_dataset(tar_path))
        assert gdb_id == '5' and len(atoms) == 5 and meta['smiles'] == 'C'


class TestAnalysisToolkit:
    """The typed-artifact API (analysis.py rewrite) + seed aggregation."""

    def test_iter_artifacts_filters(self, tmp_path):
        from molgym_tpu.tools.analysis import iter_artifacts
        (tmp_path / 'a_run-1_train.txt').write_text('{}\n')
        (tmp_path / 'a_run-2_train.txt').write_text('{}\n')
        (tmp_path / 'a_run-1_eval.txt').write_text('{}\n')
        (tmp_path / 'a_run-1_steps-128_eval.pkl').write_text('')
        (tmp_path / 'notes.md').write_text('')
        train = list(iter_artifacts(str(tmp_path), mode='train', ext='txt'))
        assert [a.seed for a in train] == [1, 2]
        assert all(a.tag.startswith('a_run-') for a in train)
        pkls = list(iter_artifacts(str(tmp_path), ext='pkl'))
        assert len(pkls) == 1 and pkls[0].steps == 128

    def test_load_and_aggregate(self, tmp_path):
        import json

        from molgym_tpu.tools.analysis import (aggregate_over_seeds,
                                               load_metrics)
        for seed, returns in [(1, [0.0, 1.0]), (2, [0.5, 1.5])]:
            rows = [{'total_num_steps': 128 * (i + 1), 'return_mean': r}
                    for i, r in enumerate(returns)]
            (tmp_path / f'exp_run-{seed}_eval.txt').write_text(
                '\n'.join(json.dumps(r) for r in rows))
        frame = load_metrics(str(tmp_path), 'eval')
        assert len(frame) == 4
        agg = aggregate_over_seeds(frame)
        assert list(agg['mean']) == [0.25, 1.25]
        import numpy as _np
        assert _np.allclose(agg['std'], [0.3535533906, 0.3535533906])
