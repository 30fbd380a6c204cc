"""Geometry relaxation by BFGS on calculator energies/gradients.

Reference parity (molgym/minimizer.py): scipy BFGS with jac=True, inf-norm
gradient convergence at 3e-4 (ORCA TolMaxG), optional frozen atoms via a
gradient mask. Works with any calculator exposing the Sparrow-adapter API
(calculators/native.NativeCalc or the scine-backed Sparrow adapters).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import scipy.optimize

from molgym_tpu.atoms import Atoms


def minimize(
    calculator,
    atoms: Atoms,
    charge: int = 0,
    spin_multiplicity: int = 1,
    max_iter: int = 120,
    fixed_indices: Optional[Sequence[int]] = None,
    verbose: bool = False,
) -> Tuple[Atoms, bool]:
    atoms = atoms.copy()
    calculator.set_elements(list(atoms.symbols))
    calculator.set_settings({'molecular_charge': charge,
                             'spin_multiplicity': spin_multiplicity})

    mask = np.ones(len(atoms) * 3, dtype=np.float64)
    if fixed_indices:
        for index in fixed_indices:
            mask[index * 3:(index + 1) * 3] = 0.0

    def objective(coords: np.ndarray) -> Tuple[float, np.ndarray]:
        calculator.set_positions(coords.reshape(-1, 3))
        energy = calculator.calculate_energy()
        gradients = np.asarray(calculator.calculate_gradients())
        return energy, gradients.flatten() * mask

    result = scipy.optimize.minimize(
        objective,
        x0=atoms.positions.flatten(),
        jac=True,
        method='BFGS',
        options={
            'maxiter': max_iter,
            'disp': verbose,
            'norm': np.inf,
            'gtol': 3e-4,  # ORCA TolMaxG
        },
    )
    atoms.positions = result.x.reshape(-1, 3)
    return atoms, bool(result.success)
