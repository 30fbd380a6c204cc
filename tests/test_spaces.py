"""Space round-trip and padding tests (parity with reference tests/test_spaces.py)."""
import numpy as np
import pytest

from molgym_tpu.atoms import Atom, Atoms
from molgym_tpu.formula import (formula_to_string, get_formula_size,
                                remove_atom_from_formula, string_to_formula,
                                zs_to_formula)
from molgym_tpu.spaces import ActionSpace, Observation, ObservationSpace, symbols_to_zs


class TestFormula:
    def test_parse_simple(self):
        assert string_to_formula('SF6') == ((16, 1), (9, 6))
        assert string_to_formula('H2O') == ((1, 2), (8, 1))

    def test_parse_grouped(self):
        assert dict(string_to_formula('Ca(OH)2')) == {20: 1, 8: 2, 1: 2}

    def test_parse_repeated(self):
        assert dict(string_to_formula('CH3CH3')) == {6: 2, 1: 6}

    def test_invalid(self):
        with pytest.raises(ValueError):
            string_to_formula('Zz3')

    def test_roundtrip(self):
        f = string_to_formula('C2H6O')
        assert string_to_formula(formula_to_string(f)) == f

    def test_remove(self):
        f = string_to_formula('H2O')
        f2 = remove_atom_from_formula(f, 1)
        assert dict(f2) == {1: 1, 8: 1}
        with pytest.raises(RuntimeError):
            remove_atom_from_formula(((1, 0), ), 1)

    def test_size(self):
        assert get_formula_size(string_to_formula('SF6')) == 7

    def test_zs_to_formula(self):
        assert dict(zs_to_formula([1, 1, 8])) == {1: 2, 8: 1}


class TestSpaces:
    def setup_method(self):
        self.zs = [0, 1, 6, 8]
        self.space = ObservationSpace(canvas_size=5, zs=self.zs)
        self.action_space = ActionSpace(zs=self.zs)

    def test_build_padding(self):
        atoms = Atoms(['H', 'O'], [[0, 0, 0], [1, 0, 0]])
        obs = self.space.build(atoms, formula=((1, 1), ))
        assert obs.elements.shape == (5, )
        assert obs.positions.shape == (5, 3)
        assert obs.bag.shape == (4, )
        np.testing.assert_array_equal(obs.elements, [1, 3, 0, 0, 0])
        np.testing.assert_array_equal(obs.bag, [0, 1, 0, 0])

    def test_roundtrip(self):
        atoms = Atoms(['C', 'H', 'H'], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        formula = ((1, 2), (8, 1))
        obs = self.space.build(atoms, formula)
        atoms2, formula2 = self.space.parse(obs)
        assert atoms2.symbols == ['C', 'H', 'H']
        np.testing.assert_allclose(atoms2.positions, atoms.positions, atol=1e-6)
        assert dict(formula2)[1] == 2 and dict(formula2)[8] == 1

    def test_too_many_atoms(self):
        atoms = Atoms(['H'] * 6, np.random.randn(6, 3))
        with pytest.raises(RuntimeError):
            self.space.build(atoms, formula=tuple())

    def test_unknown_element(self):
        atoms = Atoms(['N'], [[0, 0, 0]])
        with pytest.raises(RuntimeError):
            self.space.build(atoms, formula=tuple())

    def test_action_space(self):
        atom = self.action_space.to_atom((2, (1.0, 2.0, 3.0)))
        assert atom.symbol == 'C'
        idx, pos = self.action_space.from_atom(atom)
        assert idx == 2 and pos == (1.0, 2.0, 3.0)
        with pytest.raises(RuntimeError):
            self.action_space.to_atom((-1, (0, 0, 0)))

    def test_symbols_to_zs(self):
        assert symbols_to_zs('X,H,C,N,O,F') == [0, 1, 6, 7, 8, 9]


class TestXYZ:
    def test_write_read(self, tmp_path):
        from molgym_tpu.atoms import read_xyz, write_xyz
        atoms = Atoms(['O', 'H', 'H'],
                      [[0, 0, 0.119], [0, 0.763, -0.477], [0, -0.763, -0.477]])
        path = str(tmp_path / 'h2o.xyz')
        write_xyz(path, atoms, comment='water')
        atoms2 = read_xyz(path)
        assert atoms2.symbols == atoms.symbols
        np.testing.assert_allclose(atoms2.positions, atoms.positions, atol=1e-6)

    def test_multiframe(self, tmp_path):
        from molgym_tpu.atoms import read_xyz, write_xyz
        frames = [Atoms(['H'], [[0, 0, 0]]), Atoms(['He', 'H'], [[0, 0, 0], [1, 0, 0]])]
        path = str(tmp_path / 'frames.xyz')
        write_xyz(path, frames)
        out = read_xyz(path, index=slice(None))
        assert len(out) == 2 and len(out[1]) == 2
