"""One-command Sparrow-PM6 cross-check for scine hosts.

This image cannot install scine_sparrow, so the native PM6 backend is pinned
to the reference's 13 golden values (tests/test_nddo.py) and to experimental
thermochemistry anchors (experiments/pm6_anchor_fit/). Any host WITH scine
can close the remaining loop in one command:

    python scripts/verify_vs_sparrow.py

It re-runs (a) the golden set against a live Sparrow (reference
tests/test_sparrow.py:22-66 observations) and (b) every anchor molecule:
native-PM6-optimal geometry, then Sparrow PM6 vs native PM6 total and
atomization energies on that SAME geometry — the per-molecule delta IS the
reward-surface divergence the PARITY.md bounds table estimates from anchor
residuals (VERDICT r03 next #4).

Without scine the script prints what it would do and exits with status 2
(the import-gated path exercised by tests/test_scripts.py).
"""
from __future__ import annotations

import sys

import numpy as np

KCAL_PER_HA = 627.5094740631

# Golden observations (reference tests/resources/energy.dat + test_sparrow.py)
H2O_POS = np.array([[-0.27939703, 0.83823215, 0.00973345],
                    [-0.52040310, 1.77677325, 0.21391146],
                    [0.54473632, 0.90669722, -0.53501306]])
GOLDENS = [
    # (symbols, positions, multiplicity, golden total energy [Ha])
    (['H', 'H'], [[0, 0, 0], [1.2, 0, 0]], 1, -0.9379853016),
    (['H'], [[0, 0, 0]], 2, -0.4133180865),
    (['C'], [[0, 0, 0]], 1, -4.162353543),
    (['O'], [[0, 0, 0]], 1, -10.37062419),
    (['O', 'H', 'H'], H2O_POS, 1, -11.72459668),
]

# Anchor molecules (experiments/pm6_anchor_fit/README.md): rough starting
# geometry [Å]; each is relaxed on the native PM6 surface before comparison.
ANCHOR_MOLECULES = {
    'O2': (['O', 'O'], [[0, 0, 0], [1.3, 0, 0]], 3),
    'F2': (['F', 'F'], [[0, 0, 0], [1.45, 0, 0]], 1),
    'H2S': (['S', 'H', 'H'], [[0, 0, 0], [1.4, 0, 0], [-0.3, 1.35, 0]], 1),
    'SO2': (['S', 'O', 'O'], [[0, 0, 0], [1.5, 0.6, 0], [-1.5, 0.6, 0]], 1),
    'SF6': (['S'] + ['F'] * 6,
            [[0, 0, 0], [1.6, 0, 0], [-1.6, 0, 0], [0, 1.6, 0],
             [0, -1.6, 0], [0, 0, 1.6], [0, 0, -1.6]], 1),
    'SF4': (['S', 'F', 'F', 'F', 'F'],
            [[0, 0, 0], [1.65, 0, 0.4], [-1.65, 0, 0.4],
             [0, 1.55, -0.4], [0.4, -1.5, -0.4]], 1),
    'HCl': (['Cl', 'H'], [[0, 0, 0], [1.3, 0, 0]], 1),
    'Cl2': (['Cl', 'Cl'], [[0, 0, 0], [2.0, 0, 0]], 1),
    'CH3Cl': (['C', 'Cl', 'H', 'H', 'H'],
              [[0, 0, 0], [1.78, 0, 0], [-0.36, 1.03, 0],
               [-0.36, -0.51, 0.89], [-0.36, -0.51, -0.89]], 1),
    'HBr': (['Br', 'H'], [[0, 0, 0], [1.42, 0, 0]], 1),
    'Br2': (['Br', 'Br'], [[0, 0, 0], [2.28, 0, 0]], 1),
    'CH3Br': (['C', 'Br', 'H', 'H', 'H'],
              [[0, 0, 0], [1.94, 0, 0], [-0.36, 1.03, 0],
               [-0.36, -0.51, 0.89], [-0.36, -0.51, -0.89]], 1),
    # round-5 organic + hetero anchors (experiments/pm6_anchor_fit/README.md
    # round-5 tables): every H/C/N/O/F pair the experiment families bond
    'CH4': (['C', 'H', 'H', 'H', 'H'],
            [[0, 0, 0], [0.63, 0.63, 0.63], [0.63, -0.63, -0.63],
             [-0.63, 0.63, -0.63], [-0.63, -0.63, 0.63]], 1),
    'C2H6': (['C', 'C', 'H', 'H', 'H', 'H', 'H', 'H'],
             [[0, 0, 0], [0, 0, 1.54], [1.02, 0, -0.39],
              [-0.51, 0.88, -0.39], [-0.51, -0.88, -0.39],
              [-1.02, 0, 1.93], [0.51, 0.88, 1.93], [0.51, -0.88, 1.93]], 1),
    'C2H4': (['C', 'C', 'H', 'H', 'H', 'H'],
             [[0, 0, 0], [0, 0, 1.34], [0.93, 0, -0.56], [-0.93, 0, -0.56],
              [0.93, 0, 1.90], [-0.93, 0, 1.90]], 1),
    'NH3': (['N', 'H', 'H', 'H'],
            [[0, 0, 0], [0.94, 0, 0.39], [-0.47, 0.81, 0.39],
             [-0.47, -0.81, 0.39]], 1),
    'HCN': (['H', 'C', 'N'], [[0, 0, -1.07], [0, 0, 0], [0, 0, 1.15]], 1),
    'CH3OH': (['C', 'O', 'H', 'H', 'H', 'H'],
              [[0, 0, 0], [0, 0, 1.43], [-1.00, 0, -0.38],
               [0.51, 0.88, -0.38], [0.51, -0.88, -0.38],
               [0.45, 0.78, 1.73]], 1),
    'CO2': (['C', 'O', 'O'], [[0, 0, 0], [0, 0, 1.17], [0, 0, -1.17]], 1),
    'N2': (['N', 'N'], [[0, 0, 0], [1.10, 0, 0]], 1),
    'CH3F': (['C', 'F', 'H', 'H', 'H'],
             [[0, 0, 0], [1.39, 0, 0], [-0.36, 1.03, 0],
              [-0.36, -0.51, 0.89], [-0.36, -0.51, -0.89]], 1),
    'HF': (['F', 'H'], [[0, 0, 0], [0.92, 0, 0]], 1),
    'NO': (['N', 'O'], [[0, 0, 0], [1.15, 0, 0]], 2),
    'F2O': (['O', 'F', 'F'],
            [[0, 0, 0], [1.40, 0, 0], [-0.32, 1.36, 0]], 1),
    'NF3': (['N', 'F', 'F', 'F'],
            [[0, 0, 0], [1.28, 0, 0.55], [-0.64, 1.11, 0.55],
             [-0.64, -1.11, 0.55]], 1),
}


def native_calc(symbols, positions, multiplicity):
    from molgym_tpu.calculators.native import NativeCalc
    calc = NativeCalc(method='PM6')
    calc.set_elements(list(symbols))
    calc.set_positions(np.asarray(positions, float))
    calc.set_settings({'molecular_charge': 0,
                       'spin_multiplicity': multiplicity,
                       'unrestricted_calculation': 1})
    return calc


def sparrow_calc(symbols, positions, multiplicity):
    from molgym_tpu.calculators.sparrow import Sparrow
    calc = Sparrow('PM6')
    calc.set_elements(list(symbols))
    calc.set_positions(np.asarray(positions, float))
    calc.set_settings({'molecular_charge': 0,
                       'spin_multiplicity': multiplicity,
                       'unrestricted_calculation': 1})
    return calc


def atom_multiplicity(symbol: str) -> int:
    from molgym_tpu.periodic import ATOMIC_NUMBERS
    z = ATOMIC_NUMBERS[symbol]
    # Sparrow's golden atomic references use the minimal (n_elec mod 2)+1
    # multiplicity (reference tests/test_sparrow.py:36-48)
    return 2 if z % 2 == 1 else 1


def main() -> int:
    try:
        from molgym_tpu.calculators.sparrow import SPARROW_AVAILABLE
    except Exception:
        SPARROW_AVAILABLE = False
    if not SPARROW_AVAILABLE:
        print('scine_sparrow is not installed on this host.')
        print('On a scine host this script would:')
        print(f'  1. verify {len(GOLDENS)} golden energies against Sparrow')
        print(f'  2. relax {len(ANCHOR_MOLECULES)} anchor molecules on the '
              'native PM6 surface and report Sparrow-vs-native deltas')
        return 2

    from molgym_tpu.atoms import Atoms
    from molgym_tpu.minimizer import minimize

    print('== golden set ==')
    worst = 0.0
    for symbols, pos, mult, golden in GOLDENS:
        e_sp = sparrow_calc(symbols, pos, mult).calculate_energy()
        e_nat = native_calc(symbols, pos, mult).calculate_energy()
        worst = max(worst, abs(e_sp - golden), abs(e_nat - golden))
        print(f'{"".join(symbols):6s} sparrow {e_sp:+.8f}  native {e_nat:+.8f}'
              f'  golden {golden:+.8f}  d_sp {e_sp - golden:+.2e}'
              f'  d_nat {e_nat - golden:+.2e}')
    print(f'worst golden |delta|: {worst:.2e} Ha')

    print('\n== anchor molecules (native-PM6-optimal geometries) ==')
    for name, (symbols, pos, mult) in ANCHOR_MOLECULES.items():
        calc = native_calc(symbols, pos, mult)
        relaxed, ok = minimize(calc, Atoms(symbols, np.asarray(pos, float)))
        calc.set_positions(relaxed.positions)
        e_nat = calc.calculate_energy()
        sp = sparrow_calc(symbols, relaxed.positions, mult)
        e_sp = sp.calculate_energy()
        atoms_nat = sum(native_calc([s], [[0, 0, 0]],
                                    atom_multiplicity(s)).calculate_energy()
                        for s in symbols)
        atoms_sp = sum(sparrow_calc([s], [[0, 0, 0]],
                                    atom_multiplicity(s)).calculate_energy()
                       for s in symbols)
        atz_nat = (e_nat - atoms_nat) * KCAL_PER_HA
        atz_sp = (e_sp - atoms_sp) * KCAL_PER_HA
        print(f'{name:7s} minimized={ok}  E_nat {e_nat:+.6f}  E_sp {e_sp:+.6f}'
              f'  atomization nat {atz_nat:+8.1f} sp {atz_sp:+8.1f} kcal/mol'
              f'  delta {atz_nat - atz_sp:+7.1f}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
