"""Typed observation/action structures with static shapes.

TPU-first redesign of the reference's gym spaces (reference molgym/spaces.py).
The reference already pads the canvas to a fixed size with the null element
'X' (spaces.py:67-74); here that idea is carried to its conclusion: an
observation IS a pytree of fixed-shape arrays, usable directly inside jit /
vmap / scan, with no gym dependency.

  Observation:
    elements  int32[..., canvas_size]  index into `zs` (0 == null element X)
    positions float32[..., canvas_size, 3]  Angstrom
    bag       int32[..., num_zs]       atom counts per element index

  Action:
    element   int32[...]               index into `zs`
    position  float32[..., 3]          Cartesian placement, Angstrom

Host-side conversion to/from `Atoms` lives on the space objects, mirroring
`ObservationSpace.build/parse` (reference spaces.py:103-107).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from flax import struct

from molgym_tpu.atoms import Atom, Atoms
from molgym_tpu.formula import FormulaType
from molgym_tpu.periodic import ATOMIC_NUMBERS, CHEMICAL_SYMBOLS


@struct.dataclass
class Observation:
    elements: np.ndarray  # int32[..., canvas_size]
    positions: np.ndarray  # float32[..., canvas_size, 3]
    bag: np.ndarray  # int32[..., num_zs]


@struct.dataclass
class Action:
    element: np.ndarray  # int32[...]
    position: np.ndarray  # float32[..., 3]


class ActionSpace:
    """Maps between device actions (element index + xyz) and host Atom objects
    (reference CanvasItemSpace, spaces.py:21-41)."""

    def __init__(self, zs: List[int]) -> None:
        self.zs = list(zs)

    @property
    def size(self) -> int:
        return len(self.zs)

    def to_atom(self, action: Tuple[int, Sequence[float]]) -> Atom:
        element_index, position = action
        if element_index < 0:
            raise RuntimeError(f'Invalid element index: {element_index}')
        return Atom(self.zs[int(element_index)], position)

    def from_atom(self, atom: Atom) -> Tuple[int, Tuple[float, float, float]]:
        return self.zs.index(atom.z), tuple(atom.position)

    def build(self, atoms: Atoms) -> Tuple[int, Tuple[float, float, float]]:
        # Stop action: place the null element (z=0) at the origin.
        if len(atoms) == 0:
            return 0, (0.0, 0.0, 0.0)
        return self.from_atom(atoms[-1])


class ObservationSpace:
    """Static-shape observation builder/parser (reference ObservationSpace,
    spaces.py:96-107 + CanvasSpace padding semantics, spaces.py:47-74)."""

    def __init__(self, canvas_size: int, zs: List[int]) -> None:
        assert 0 in zs, '0 (the null element X) has to be in the list of atomic numbers'
        assert zs[0] == 0, 'the null element must come first'
        self.canvas_size = canvas_size
        self.zs = list(zs)
        self.z_to_index = {z: i for i, z in enumerate(self.zs)}

    @property
    def num_zs(self) -> int:
        return len(self.zs)

    # -- host -> arrays -------------------------------------------------------
    def build(self, atoms: Atoms, formula: FormulaType) -> Observation:
        if len(atoms) > self.canvas_size:
            raise RuntimeError(f'Too many atoms: {len(atoms)} > {self.canvas_size}')
        elements = np.zeros(self.canvas_size, dtype=np.int32)
        positions = np.zeros((self.canvas_size, 3), dtype=np.float32)
        for i, atom in enumerate(atoms):
            if atom.z not in self.z_to_index:
                raise RuntimeError(f'Element z={atom.z} not in space {self.zs}')
            elements[i] = self.z_to_index[atom.z]
            positions[i] = atom.position
        return Observation(elements=elements, positions=positions,
                           bag=self.bag_from_formula(formula))

    def bag_from_formula(self, formula: FormulaType) -> np.ndarray:
        bag = np.zeros(self.num_zs, dtype=np.int32)
        for z, count in formula:
            if z not in self.z_to_index:
                raise RuntimeError(f'Element z={z} not in space {self.zs}')
            bag[self.z_to_index[z]] += count
        return bag

    # -- arrays -> host -------------------------------------------------------
    def parse(self, observation: Observation) -> Tuple[Atoms, FormulaType]:
        elements = np.asarray(observation.elements)
        positions = np.asarray(observation.positions)
        bag = np.asarray(observation.bag)
        atoms = Atoms()
        for element_index, position in zip(elements, positions):
            if element_index != 0:
                atoms.append(Atom(self.zs[int(element_index)], position))
        formula = tuple((z, int(count)) for z, count in zip(self.zs, bag))
        return atoms, formula

    def to_atoms(self, observation: Observation) -> Atoms:
        return self.parse(observation)[0]


def symbols_to_zs(symbols: str) -> List[int]:
    """'X,H,C,N,O,F' -> [0, 1, 6, 7, 8, 9] (reference scripts/run.py:36)."""
    return [ATOMIC_NUMBERS[s.strip()] for s in symbols.split(',')]


def zs_to_symbols(zs: Sequence[int]) -> str:
    return ','.join(CHEMICAL_SYMBOLS[z] for z in zs)
