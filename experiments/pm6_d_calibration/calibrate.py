"""Calibrate the S d-shell constants (zd, udd, beta_d) of the native PM6
backend against documented physical anchors.

The sp parameter block of S is the published PM6 set (as recalled for the
other elements, whose golden Sparrow values it reproduces); no golden data
exists for S on this image, so the three d constants are fit here instead of
trusted from recall. Anchors (experimental, via NIST-style heats of
formation; atomization = sum dHf(atoms) - dHf(molecule)):

  S atom     ground state must stay 3s2 3p4 (E = sp-only -6.117648 Ha)
  H2S        atomization -173 kcal/mol, r(S-H) 1.34 A, angle 92 deg
  SF6        atomization -472 kcal/mol, octahedral, r(S-F) 1.56 A
  SO2        atomization -256 kcal/mol, r(S-O) 1.43 A

Usage: python experiments/pm6_d_calibration/calibrate.py [--scan]
Prints the anchor table for the current in-tree constants, or scans a
(zd, udd, beta_d) grid with --scan.
"""
import argparse
import dataclasses
import itertools
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

KCAL = 627.509474


def set_d_params(zd, udd, beta_d):
    import molgym_tpu.calculators.nddo_ref as nr
    nr.PM6_PARAMS[16] = dataclasses.replace(
        nr.PM6_PARAMS[16], zd=zd, udd=udd, beta_d=beta_d)
    nr._spd_tables.cache_clear()


def anchors():
    import molgym_tpu.calculators.nddo_ref as nr

    def en(zs, pos):
        try:
            return nr.energy(zs, pos)
        except RuntimeError:
            return float('nan')

    es = en([16], [[0, 0, 0]])
    m = nr.NDDO([16], [[0, 0, 0]])
    m.scf()
    d_occ = float(np.sum(np.diag(m.p_alpha + m.p_beta)[4:]))
    eh = en([1], [[0, 0, 0]])
    ef = en([9], [[0, 0, 0]])
    eo = en([8], [[0, 0, 0]])

    def h2s(r, ang_deg):
        a = math.radians(ang_deg)
        return en([16, 1, 1], [[0, 0, 0], [r, 0, 0],
                               [r * math.cos(a), r * math.sin(a), 0]])

    def sf6(r):
        return en([16] + [9] * 6,
                  [[0, 0, 0], [r, 0, 0], [-r, 0, 0], [0, r, 0],
                   [0, -r, 0], [0, 0, r], [0, 0, -r]])

    def so2(r, ang_deg):
        a = math.radians(ang_deg)
        return en([16, 8, 8], [[0, 0, 0], [r, 0, 0],
                               [r * math.cos(a), r * math.sin(a), 0]])

    # bond-length scans for the minima
    rs_h = min(np.arange(1.15, 1.75, 0.05), key=lambda r: h2s(r, 92.1))
    rs_f = min(np.arange(1.40, 2.00, 0.05), key=sf6)
    rs_o = min(np.arange(1.25, 1.85, 0.05), key=lambda r: so2(r, 119.5))
    return {
        's_atom_e': es, 's_d_occupation': d_occ,
        'h2s_kcal': (h2s(rs_h, 92.1) - es - 2 * eh) * KCAL,
        'h2s_r': rs_h,
        'sf6_kcal': (sf6(rs_f) - es - 6 * ef) * KCAL, 'sf6_r': rs_f,
        'so2_kcal': (so2(rs_o, 119.5) - es - 2 * eo) * KCAL, 'so2_r': rs_o,
    }


TARGETS = {'h2s_kcal': -173.0, 'sf6_kcal': -472.0, 'so2_kcal': -256.0,
           'h2s_r': 1.34, 'sf6_r': 1.56, 'so2_r': 1.43}
# What the sp-only model gives (the d shell cannot fix the sp universe's
# overbinding, so the fit targets the d-DELTAS plus the one strongly
# d-dependent anchor, SF6 hypervalent atomization):
SP_BASELINE = {'h2s_kcal': -221.0, 'so2_kcal': -420.0}


def score(a):
    if a['s_d_occupation'] > 0.2 or not np.isfinite(a['sf6_kcal']):
        return float('inf')
    s = ((a['sf6_kcal'] - TARGETS['sf6_kcal']) / 30.0) ** 2
    for k in ('h2s_kcal', 'so2_kcal'):
        s += ((a[k] - SP_BASELINE[k]) / 40.0) ** 2
    s += ((a['sf6_r'] - TARGETS['sf6_r']) / 0.05) ** 2
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scan', action='store_true')
    ap.add_argument('--zd', type=float, nargs='*',
                    default=[1.1, 1.35, 1.6, 2.0])
    ap.add_argument('--udd', type=float, nargs='*',
                    default=[-30.0, -22.0, -14.0])
    ap.add_argument('--betad', type=float, nargs='*',
                    default=[-9.0, -6.0, -3.0])
    args = ap.parse_args()
    if not args.scan:
        a = anchors()
        for k, v in a.items():
            t = TARGETS.get(k)
            print(f'{k:>16}: {v:10.3f}' + (f'   (target {t})' if t else ''))
        print('score:', round(score(a), 3))
        return
    rows = []
    for zd, udd, bd in itertools.product(args.zd, args.udd, args.betad):
        set_d_params(zd, udd, bd)
        a = anchors()
        rows.append((score(a), zd, udd, bd, a))
        print(f'zd={zd:5.2f} udd={udd:6.1f} bd={bd:5.1f} '
              f'score={rows[-1][0]:9.3f} '
              f'h2s={a["h2s_kcal"]:7.1f} sf6={a["sf6_kcal"]:8.1f} '
              f'so2={a["so2_kcal"]:7.1f} '
              f'r=({a["h2s_r"]:.2f},{a["sf6_r"]:.2f},{a["so2_r"]:.2f}) '
              f'docc={a["s_d_occupation"]:.2f}', flush=True)
    rows.sort(key=lambda t: t[0])
    print('\nbest:', rows[0][:4])


if __name__ == '__main__':
    main()
