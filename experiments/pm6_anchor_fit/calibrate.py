"""Anchor the native PM6 backend's free constants to experimental
thermochemistry (round-3 VERDICT items 4/5 + extensions).

What is free and what is pinned:
  * The 13 Sparrow golden observations (reference tests/test_sparrow.py,
    tests/test_reward.py, tests/resources/*.dat) pin the H/C/N/O one-center
    blocks plus the H-H and O-H diatomic constants exactly — nothing fitted
    here touches them.
  * The DIATOMIC core-core constants (alpha, x) of pairs that carry no
    golden data are per-pair thermochemistry knobs (that is their role in
    PM6 itself): they shift a bond's energy/length without moving any other
    anchor. Fitted here per pair against experimental atomization energies
    and bond lengths (atomization = sum dHf(atoms) - dHf(molecule),
    298 K experimental heats of formation; tolerance discussion in
    README.md).
  * The three S d-shell constants (zd, udd, beta_d) are shared across all
    S molecules; the S-F pair is shared between SF6 and SF4 — the outer fit
    must reconcile those (grid scan with nested pair fits).

Anchors (kcal/mol, Angstrom):
  O2 (triplet)  -120.2 / 1.21      F2   -37.9 / 1.41
  H2S -173.2 / 1.34                SO2  -256.4 / 1.43
  SF4 -324.4 / 1.65,1.55 (ax,eq)   SF6  -471.4 / 1.56
  HCl -103.2 / 1.27                Cl2  -58.0 / 1.99
  CH3Cl -375.8 / 1.78 (C-Cl)

Usage:
  python experiments/pm6_anchor_fit/calibrate.py --table     # current state
  python experiments/pm6_anchor_fit/calibrate.py --fit-pairs # pair fits
  python experiments/pm6_anchor_fit/calibrate.py --fit-d     # d grid + pairs
"""
import argparse
import dataclasses
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

KCAL = 627.509474


def nr():
    import molgym_tpu.calculators.nddo_ref as mod
    return mod


def en(zs, pos, multiplicity=None):
    try:
        return nr().energy(zs, pos, multiplicity=multiplicity)
    except RuntimeError:
        return float('nan')


def set_pair(z1, z2, alpha, x):
    nr().PM6_PAIR_PARAMS[(min(z1, z2), max(z1, z2))] = (float(alpha), float(x))


def get_pair(z1, z2):
    return nr().PM6_PAIR_PARAMS.get((min(z1, z2), max(z1, z2)), (2.5, 1.0))


def set_d_params(zd, udd, beta_d):
    m = nr()
    m.PM6_PARAMS[16] = dataclasses.replace(m.PM6_PARAMS[16], zd=zd, udd=udd,
                                           beta_d=beta_d)
    m._spd_tables.cache_clear()


def atom_e(z, multiplicity=None):
    return en([z], [[0.0, 0.0, 0.0]], multiplicity)


# --- geometry builders -----------------------------------------------------

def diatomic(z1, z2, r, mult=None):
    return en([z1, z2], [[0, 0, 0], [r, 0, 0]], mult)


def bent(zc, zo, r, ang_deg):
    a = math.radians(ang_deg)
    return en([zc, zo, zo], [[0, 0, 0], [r, 0, 0],
                             [r * math.cos(a), r * math.sin(a), 0]])


def sf6(r):
    return en([16] + [9] * 6,
              [[0, 0, 0], [r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
               [0, 0, r], [0, 0, -r]])


def sf4(rax, req, ax_ang=173.1, eq_ang=101.6):
    a = math.radians(ax_ang / 2)
    e = math.radians(eq_ang / 2)
    return en([16, 9, 9, 9, 9],
              [[0, 0, 0],
               [rax * math.sin(a), 0, -rax * math.cos(a)],
               [-rax * math.sin(a), 0, -rax * math.cos(a)],
               [0, req * math.sin(e), req * math.cos(e)],
               [0, -req * math.sin(e), req * math.cos(e)]])


def ch3x(zx, rcx, rch=1.09, hcx_deg=108.4):
    # staggered methyl halide, C3v; H-C-X angle ~108.4 deg
    hc = math.radians(180.0 - hcx_deg)
    pos = [[0, 0, 0], [0, 0, rcx]]
    zs = [6, zx]
    for k in range(3):
        phi = 2 * math.pi * k / 3
        pos.append([rch * math.sin(hc) * math.cos(phi),
                    rch * math.sin(hc) * math.sin(phi),
                    -rch * math.cos(hc)])
        zs.append(1)
    return en(zs, pos)


def ch3cl(rccl, rch=1.09):
    return ch3x(17, rccl, rch)


# --- organic anchor geometries (round 5: bound the recalled organic pairs,
# VERDICT r04 next #3). Non-fitted internals fixed at experimental values. ---

def ch4(rch):
    # tetrahedral
    s = rch / math.sqrt(3)
    return en([6, 1, 1, 1, 1],
              [[0, 0, 0], [s, s, s], [s, -s, -s], [-s, s, -s], [-s, -s, s]])


def c2h6(rcc, rch=1.091, hcc_deg=111.2):
    # staggered ethane
    a = math.radians(180.0 - hcc_deg)
    zs = [6, 6]
    pos = [[0, 0, 0], [0, 0, rcc]]
    for k in range(3):
        phi = 2 * math.pi * k / 3
        pos.append([rch * math.sin(a) * math.cos(phi),
                    rch * math.sin(a) * math.sin(phi),
                    -rch * math.cos(a)])
        zs.append(1)
    for k in range(3):
        phi = 2 * math.pi * k / 3 + math.pi / 3  # staggered
        pos.append([rch * math.sin(a) * math.cos(phi),
                    rch * math.sin(a) * math.sin(phi),
                    rcc + rch * math.cos(a)])
        zs.append(1)
    return en(zs, pos)


def c2h4(rcc, rch=1.087, hch_deg=117.4):
    # planar ethylene
    half = math.radians(hch_deg / 2)
    zs = [6, 6, 1, 1, 1, 1]
    pos = [[0, 0, 0], [0, 0, rcc],
           [rch * math.sin(half), 0, -rch * math.cos(half)],
           [-rch * math.sin(half), 0, -rch * math.cos(half)],
           [rch * math.sin(half), 0, rcc + rch * math.cos(half)],
           [-rch * math.sin(half), 0, rcc + rch * math.cos(half)]]
    return en(zs, pos)


def pyramid(zc, zx, r, xcx_deg):
    # C3v pyramid: place X at polar angle theta from the axis such that the
    # X-C-X angle equals xcx_deg
    ang = math.radians(xcx_deg)
    # cos(XCX) = cos^2(theta) + sin^2(theta) * cos(120 deg)
    ct2 = (math.cos(ang) + 0.5) / 1.5
    theta = math.acos(math.sqrt(max(ct2, 0.0)))
    zs = [zc, zx, zx, zx]
    pos = [[0, 0, 0]]
    for k in range(3):
        phi = 2 * math.pi * k / 3
        pos.append([r * math.sin(theta) * math.cos(phi),
                    r * math.sin(theta) * math.sin(phi),
                    r * math.cos(theta)])
    return en(zs, pos)


def nh3(rnh, hnh_deg=106.7):
    return pyramid(7, 1, rnh, hnh_deg)


def hcn(rcn, rch=1.065):
    return en([1, 6, 7], [[0, 0, -rch], [0, 0, 0], [0, 0, rcn]])


def ch3oh(rco, rch=1.091, roh=0.956, coh_deg=108.5, hco_deg=110.0):
    # staggered methanol; O-H anti to one C-H
    zs = [6, 8]
    pos = [[0, 0, 0], [0, 0, rco]]
    a = math.radians(180.0 - hco_deg)
    for k in range(3):
        phi = 2 * math.pi * k / 3
        pos.append([rch * math.sin(a) * math.cos(phi),
                    rch * math.sin(a) * math.sin(phi),
                    -rch * math.cos(a)])
        zs.append(1)
    co = math.radians(coh_deg)
    pos.append([roh * math.sin(co) * math.cos(math.pi / 3),
                roh * math.sin(co) * math.sin(math.pi / 3),
                rco - roh * math.cos(co)])
    zs.append(1)
    return en(zs, pos)


def co2(rco):
    return en([6, 8, 8], [[0, 0, 0], [0, 0, rco], [0, 0, -rco]])


def h2o2(roo, roh=0.95, ooh_deg=99.9, dih_deg=113.7):
    a = math.radians(180.0 - ooh_deg)
    d = math.radians(dih_deg)
    return en([8, 8, 1, 1],
              [[0, 0, 0], [0, 0, roo],
               [roh * math.sin(a), 0, -roh * math.cos(a)],
               [roh * math.sin(a) * math.cos(d), roh * math.sin(a) * math.sin(d),
                roo + roh * math.cos(a)]])


def opt_1d(f, lo, hi, tol=1e-3):
    """Golden-section minimum of f on [lo, hi] (NaN-tolerant: falls back to
    a coarse grid argmin when the bracket hits non-convergence)."""
    grid = np.linspace(lo, hi, 25)
    vals = [f(r) for r in grid]
    if not np.isfinite(vals).any():
        return float('nan'), float('nan')
    i = int(np.nanargmin(vals))
    a, b = grid[max(0, i - 1)], grid[min(len(grid) - 1, i + 1)]
    gr = (math.sqrt(5) - 1) / 2
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = f(c), f(d)
    while b - a > tol:
        if not (np.isfinite(fc) and np.isfinite(fd)):
            return grid[i], vals[i]
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = f(d)
    r = 0.5 * (a + b)
    return r, f(r)


# --- anchors ---------------------------------------------------------------

# experimental 298K heats of formation (kcal/mol): atoms and molecules
DHF_ATOM = {1: 52.102, 6: 170.89, 7: 112.97, 8: 59.559, 9: 18.89, 16: 66.40,
            17: 28.99, 35: 26.74}
ANCHORS = {
    # name: (target_atomization_kcal, target_geometry)
    'O2': (-120.2, 1.208),
    'F2': (-37.9, 1.412),
    'H2S': (-173.2, 1.336),
    'SO2': (-256.4, 1.432),
    'SF6': (-471.4, 1.561),
    'SF4': (-324.4, (1.646, 1.545)),
    'HCl': (-103.2, 1.275),
    'Cl2': (-58.0, 1.988),
    'CH3Cl': (-375.8, 1.785),
    # Br (round 3, after Cl): dHf(HBr) = -8.70, dHf(Br2 g) = 7.39,
    # dHf(CH3Br) = -8.2 kcal/mol; bond lengths from experiment.
    'HBr': (-87.5, 1.414),
    'Br2': (-46.1, 2.281),
    'CH3Br': (-362.0, 1.934),
    # Organic anchors (round 5, VERDICT r04 next #3): bound the recalled
    # C-H / C-C / N-H / C-N / C-O / N-N / C-F pair constants the organics /
    # stochastic / QM9 families actually exercise. Targets from experimental
    # 298 K heats of formation: CH4 -17.89, C2H6 -20.04, C2H4 +12.54,
    # NH3 -10.98, HCN +32.3, CH3OH -48.07, CO2 -94.05, N2 0.0, CH3F -56.8,
    # H2O2 -32.48 kcal/mol; bond lengths from experiment.
    'CH4': (-397.2, 1.087),
    'C2H6': (-674.6, 1.536),
    'C2H4': (-537.7, 1.339),
    'NH3': (-280.3, 1.012),
    'HCN': (-303.7, 1.153),
    'CH3OH': (-486.9, 1.427),
    'CO2': (-384.1, 1.162),
    'N2': (-225.9, 1.098),
    'CH3F': (-402.9, 1.383),
    # held-out validation for the O2-fitted O-O pair (never fitted to this)
    'H2O2': (-255.8, 1.475),
    # QM9 closes the element set at H/C/N/O/F: the remaining hetero pairs.
    # dHf: HF -65.1, NO +21.58 (doublet), F2O +5.9, NF3 -31.6 kcal/mol.
    'HF': (-136.1, 0.917),
    'NO': (-150.9, 1.151),
    'F2O': (-91.4, 1.405),
    'NF3': (-201.2, 1.365),
}


def measure(name):
    """(atomization kcal/mol at the optimized geometry, geometry)."""
    if name == 'O2':
        ref = 2 * atom_e(8)
        r, e = opt_1d(lambda r: diatomic(8, 8, r, mult=3), 0.95, 1.6)
    elif name == 'F2':
        ref = 2 * atom_e(9)
        r, e = opt_1d(lambda r: diatomic(9, 9, r), 1.1, 1.9)
    elif name == 'H2S':
        ref = atom_e(16) + 2 * atom_e(1)
        r, e = opt_1d(lambda r: bent(16, 1, r, 92.1), 1.1, 1.8)
    elif name == 'SO2':
        ref = atom_e(16) + 2 * atom_e(8)
        r, e = opt_1d(lambda r: bent(16, 8, r, 119.5), 1.2, 1.9)
    elif name == 'SF6':
        ref = atom_e(16) + 6 * atom_e(9)
        r, e = opt_1d(sf6, 1.35, 2.0)
    elif name == 'SF4':
        ref = atom_e(16) + 4 * atom_e(9)
        # 2-round coordinate descent over (r_ax, r_eq) — the surface is
        # smooth and single-welled here, and this costs ~6x less than a
        # dense 2-D scan inside the pair fit loop
        rax, req = 1.65, 1.58
        for _ in range(2):
            rax, _ = opt_1d(lambda a: sf4(a, req), rax - 0.18, rax + 0.18,
                            tol=4e-3)
            req, e = opt_1d(lambda q: sf4(rax, q), req - 0.18, req + 0.18,
                            tol=4e-3)
        r = (rax, req)
    elif name == 'HCl':
        ref = atom_e(17) + atom_e(1)
        r, e = opt_1d(lambda r: diatomic(17, 1, r), 1.0, 1.7)
    elif name == 'Cl2':
        ref = 2 * atom_e(17)
        r, e = opt_1d(lambda r: diatomic(17, 17, r), 1.6, 2.5)
    elif name == 'CH3Cl':
        ref = atom_e(6) + atom_e(17) + 3 * atom_e(1)
        r, e = opt_1d(ch3cl, 1.5, 2.2)
    elif name == 'HBr':
        ref = atom_e(35) + atom_e(1)
        r, e = opt_1d(lambda r: diatomic(35, 1, r), 1.1, 1.9)
    elif name == 'Br2':
        ref = 2 * atom_e(35)
        r, e = opt_1d(lambda r: diatomic(35, 35, r), 1.9, 2.8)
    elif name == 'CH3Br':
        ref = atom_e(6) + atom_e(35) + 3 * atom_e(1)
        r, e = opt_1d(lambda r: ch3x(35, r), 1.6, 2.4)
    elif name == 'CH4':
        ref = atom_e(6) + 4 * atom_e(1)
        r, e = opt_1d(ch4, 0.95, 1.3)
    elif name == 'C2H6':
        ref = 2 * atom_e(6) + 6 * atom_e(1)
        r, e = opt_1d(c2h6, 1.35, 1.75)
    elif name == 'C2H4':
        ref = 2 * atom_e(6) + 4 * atom_e(1)
        r, e = opt_1d(c2h4, 1.2, 1.5)
    elif name == 'NH3':
        ref = atom_e(7) + 3 * atom_e(1)
        # wide bracket: a 0.9-1.2 bracket clipped the optimizer at the
        # boundary and made the round-5 session-1 fit target a non-minimum
        r, e = opt_1d(nh3, 0.9, 1.5)
    elif name == 'HCN':
        ref = atom_e(1) + atom_e(6) + atom_e(7)
        r, e = opt_1d(hcn, 1.0, 1.35)
    elif name == 'CH3OH':
        ref = atom_e(6) + atom_e(8) + 4 * atom_e(1)
        r, e = opt_1d(ch3oh, 1.3, 1.8)
    elif name == 'CO2':
        ref = atom_e(6) + 2 * atom_e(8)
        r, e = opt_1d(co2, 1.05, 1.35)
    elif name == 'N2':
        ref = 2 * atom_e(7)
        r, e = opt_1d(lambda r: diatomic(7, 7, r), 0.95, 1.35)
    elif name == 'CH3F':
        ref = atom_e(6) + atom_e(9) + 3 * atom_e(1)
        r, e = opt_1d(lambda r: ch3x(9, r), 1.2, 1.6)
    elif name == 'H2O2':
        ref = 2 * atom_e(8) + 2 * atom_e(1)
        r, e = opt_1d(h2o2, 1.25, 1.9)
    elif name == 'HF':
        ref = atom_e(1) + atom_e(9)
        r, e = opt_1d(lambda r: diatomic(1, 9, r), 0.8, 1.2)
    elif name == 'NO':
        ref = atom_e(7) + atom_e(8)
        r, e = opt_1d(lambda r: diatomic(7, 8, r, mult=2), 1.0, 1.4)
    elif name == 'F2O':
        ref = atom_e(8) + 2 * atom_e(9)
        r, e = opt_1d(lambda r: bent(8, 9, r, 103.3), 1.2, 1.65)
    elif name == 'NF3':
        ref = atom_e(7) + 3 * atom_e(9)
        r, e = opt_1d(lambda r: pyramid(7, 9, r, 102.4), 1.2, 1.8)
    else:
        raise KeyError(name)
    return (e - ref) * KCAL, r


def table(names=None):
    rows = {}
    for name in names or ANCHORS:
        got_e, got_r = measure(name)
        tgt_e, tgt_r = ANCHORS[name]
        rows[name] = (got_e, tgt_e, got_r, tgt_r)
        print(f'{name:>7}: atomization {got_e:8.1f} (target {tgt_e:8.1f})  '
              f'geom {got_r} (target {tgt_r})', flush=True)
    return rows


# --- pair fitting ----------------------------------------------------------

PAIR_OF = {'O2': (8, 8), 'F2': (9, 9), 'H2S': (1, 16), 'SO2': (8, 16),
           'HCl': (1, 17), 'Cl2': (17, 17), 'CH3Cl': (6, 17),
           'HBr': (1, 35), 'Br2': (35, 35), 'CH3Br': (6, 35),
           'CH4': (1, 6), 'C2H6': (6, 6), 'C2H4': (6, 6), 'NH3': (1, 7),
           'HCN': (6, 7), 'CH3OH': (6, 8), 'CO2': (6, 8), 'N2': (7, 7),
           'CH3F': (6, 9), 'HF': (1, 9), 'NO': (7, 8), 'F2O': (8, 9),
           'NF3': (7, 9)}

ORGANIC_ANCHORS = ['CH4', 'C2H6', 'C2H4', 'NH3', 'HCN', 'CH3OH', 'CO2',
                   'N2', 'CH3F', 'H2O2']
HETERO_ANCHORS = ['HF', 'NO', 'F2O', 'NF3']


def fit_pair(names, pair, x0=None, scale_e=None, verbose=True):
    """Least-squares fit of one pair's (alpha, x) to the named anchors'
    atomization energies + geometries."""
    from scipy.optimize import least_squares

    if isinstance(names, str):
        names = [names]

    def residuals(p):
        alpha, x = p
        set_pair(*pair, alpha, x)
        res = []
        for name in names:
            got_e, got_r = measure(name)
            tgt_e, tgt_r = ANCHORS[name]
            se = scale_e or max(10.0, 0.04 * abs(tgt_e))
            if not np.isfinite(got_e):
                res.extend([50.0, 50.0])
                continue
            res.append((got_e - tgt_e) / se)
            got_r = np.atleast_1d(got_r).astype(float)
            tgt_r = np.atleast_1d(tgt_r).astype(float)
            res.extend(((got_r - tgt_r) / 0.03).tolist())
        return np.asarray(res)

    # alpha lower bound: keeps the fitted correction LOCAL to the bond.
    # For the standard exp(-alpha R) form an unconstrained fit drifts to
    # alpha ~1.3-1.7, which matches the bond anchors but leaks multi-kcal
    # spurious repulsion into 2.5-3 A nonbonded pairs (e.g. water-water
    # O...O in the solvation environments); published PM6 alphas for these
    # pairs sit in 2.2-3.2, so the >=2.0 bound also acts as a physical
    # prior. The N-H pair uses the R^2-GAUSSIAN form (nddo_ref.py
    # GAUSS_R2_PAIRS: 1 + x exp(-alpha R^2)), whose exponent is quadratic —
    # alpha = 0.9 already gives exp(-5.6) ~ 0.004 at 2.5 A, so the same
    # locality argument permits the lower bound 0.9 there (round 5: the
    # >=2.0 bound misapplied to the R^2 form was what kept NH3 54 kcal/mol
    # overbound).
    lo_alpha = 0.9 if tuple(sorted(pair)) in nr().GAUSS_R2_PAIRS else 2.0
    p0 = np.asarray(x0 if x0 is not None else get_pair(*pair))
    p0 = np.clip(p0, [lo_alpha, -0.95], [8.0, 40.0])
    sol = least_squares(residuals, p0, diff_step=0.05,
                        bounds=([lo_alpha, -0.95], [8.0, 40.0]))
    set_pair(*pair, *sol.x)
    if verbose:
        print(f'pair {pair}: alpha={sol.x[0]:.6f} x={sol.x[1]:.6f} '
              f'cost={sol.cost:.3f}', flush=True)
    return sol


def fit_all_pairs(include_cl=True, verbose=True):
    fit_pair('O2', (8, 8), verbose=verbose)
    fit_pair('F2', (9, 9), verbose=verbose)
    fit_pair('H2S', (1, 16), verbose=verbose)
    fit_pair('SO2', (8, 16), verbose=verbose)
    sol_sf = fit_pair(['SF6', 'SF4'], (9, 16), verbose=verbose)
    if include_cl:
        fit_pair('HCl', (1, 17), verbose=verbose)
        fit_pair('Cl2', (17, 17), verbose=verbose)
        fit_pair('CH3Cl', (6, 17), verbose=verbose)
        fit_pair('HBr', (1, 35), verbose=verbose)
        fit_pair('Br2', (35, 35), verbose=verbose)
        fit_pair('CH3Br', (6, 35), verbose=verbose)
    return sol_sf


def fit_organics(verbose=True):
    """Round-5 organic pair calibration (VERDICT r04 next #3). The recalled
    organic pair constants measured far off experiment (CH4 overbinding
    65 kcal/mol at r(C-H)=0.95 A, CO2 by 285, N2 by 143 — see README round-5
    section), so every pair the organics/stochastic/QM9 families exercise is
    anchor-fit here. Order matters: C-H first (CH4), then the pairs whose
    anchor molecules contain C-H bonds; C-Cl / C-Br are RE-fit at the end
    because their anchors (CH3Cl / CH3Br) contain three C-H bonds each.
    O-H / H-H stay golden-pinned throughout."""
    fit_pair('CH4', (1, 6), verbose=verbose)
    fit_pair(['C2H6', 'C2H4'], (6, 6), verbose=verbose)
    fit_pair('NH3', (1, 7), verbose=verbose)
    fit_pair('HCN', (6, 7), verbose=verbose)
    fit_pair(['CH3OH', 'CO2'], (6, 8), verbose=verbose)
    fit_pair('N2', (7, 7), verbose=verbose)
    fit_pair('CH3F', (6, 9), verbose=verbose)
    fit_pair('CH3Cl', (6, 17), verbose=verbose)
    fit_pair('CH3Br', (6, 35), verbose=verbose)
    # remaining H/C/N/O/F hetero pairs (QM9 bonds): measured first, fit only
    # what is off — HF/NO/F2O/NF3 anchors are single-pair, order-free
    fit_pair('HF', (1, 9), verbose=verbose)
    fit_pair('NO', (7, 8), verbose=verbose)
    fit_pair('F2O', (8, 9), verbose=verbose)
    fit_pair('NF3', (7, 9), verbose=verbose)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--table', action='store_true')
    ap.add_argument('--organics', action='store_true',
                    help='measure only the round-5 organic anchors')
    ap.add_argument('--fit-organics', action='store_true',
                    help='anchor-fit the organic pairs (round 5)')
    ap.add_argument('--fit-hetero', action='store_true',
                    help='anchor-fit the remaining H/C/N/O/F hetero pairs '
                         '(HF, NO, F2O, NF3; round 5)')
    ap.add_argument('--fit-pairs', action='store_true')
    ap.add_argument('--fit-d', action='store_true')
    ap.add_argument('--no-cl', action='store_true')
    ap.add_argument('--zd', type=float, nargs='*', default=[1.0, 1.2, 1.45])
    ap.add_argument('--udd', type=float, nargs='*', default=[-28.0, -22.0, -16.0])
    ap.add_argument('--betad', type=float, nargs='*', default=[-7.0, -5.0, -3.5])
    args = ap.parse_args()

    if args.fit_pairs:
        fit_all_pairs(include_cl=not args.no_cl)
        print('\nfinal pair table entries:')
        for pair in sorted(set(PAIR_OF.values()) | {(9, 16)}):
            print(f'  {pair}: {get_pair(*pair)}')
        table()
        return
    if args.fit_d:
        import itertools
        rows = []
        for zd, udd, bd in itertools.product(args.zd, args.udd, args.betad):
            set_d_params(zd, udd, bd)
            # S atom must stay 3s2 3p4
            m = nr().NDDO([16], [[0, 0, 0]])
            m.scf()
            docc = float(np.sum(np.diag(m.p_alpha + m.p_beta)[4:]))
            if docc > 0.2:
                print(f'zd={zd} udd={udd} bd={bd}: d-collapse ({docc:.2f})',
                      flush=True)
                continue
            sol = fit_all_pairs(include_cl=False, verbose=False)
            # score: S-molecule residuals after the pair fits
            score = 2 * sol.cost
            for name in ('H2S', 'SO2'):
                got_e, _ = measure(name)
                score += ((got_e - ANCHORS[name][0])
                          / max(10.0, 0.04 * abs(ANCHORS[name][0]))) ** 2
            rows.append((score, zd, udd, bd,
                         {p: get_pair(*p) for p in [(1, 16), (8, 16), (9, 16)]}))
            print(f'zd={zd:5.2f} udd={udd:6.1f} bd={bd:5.2f} '
                  f'score={score:9.3f} pairs={rows[-1][4]}', flush=True)
        rows.sort(key=lambda t: t[0])
        print('\nbest:', rows[0])
        return
    if args.fit_hetero:
        print('-- current values --')
        table(HETERO_ANCHORS)
        fit_pair('HF', (1, 9))
        fit_pair('NO', (7, 8))
        fit_pair('F2O', (8, 9))
        fit_pair('NF3', (7, 9))
        print('-- after fit --')
        table(HETERO_ANCHORS)
        for p in [(1, 9), (7, 8), (8, 9), (7, 9)]:
            print(f'  {p}: {get_pair(*p)}')
        return
    if args.fit_organics:
        fit_organics()
        print('\nfinal organic pair table entries:')
        for pair in [(1, 6), (6, 6), (1, 7), (6, 7), (6, 8), (7, 7), (6, 9),
                     (6, 17), (6, 35)]:
            print(f'  {pair}: {get_pair(*pair)}')
        table(ORGANIC_ANCHORS + ['CH3Cl', 'CH3Br'])
        return
    if args.organics:
        table(ORGANIC_ANCHORS)
        return
    table()


if __name__ == '__main__':
    main()
