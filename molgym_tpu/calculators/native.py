"""ctypes bindings to the native host runtime (csrc/libmolgym_host.so).

The library is built on demand with `make -C csrc` (g++, no deps). It provides
the thread-pooled batched reward evaluator and single-molecule energies/
gradients with analytic derivatives (the minimizer backend), replacing the
role scine_sparrow's pybind11 layer plays for the reference
(molgym/calculator.py) with a C ABI + ctypes (no pybind11 in this image).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'csrc')
_LIB_PATH = os.path.join(_CSRC_DIR, 'libmolgym_host.so')

METHOD_LJ = 0
METHOD_MORSE = 1
METHOD_EHT = 2  # extended Hückel (native electronic structure, csrc/eht.cpp)
METHOD_PM6 = 3  # native NDDO/PM6 SCF (csrc/nddo.cpp) — reference reward parity

_lib: Optional[ctypes.CDLL] = None


_FINGERPRINT_PATH = os.path.join(_CSRC_DIR, '.built_on')


def _host_fingerprint() -> str:
    """CPU identity hash of this host. The library is built -march=native and
    the committed .so survives a fresh checkout with mtimes equal to the
    sources (make sees it as up to date), so without this check a binary
    built on a DIFFERENT host loads silently. That is not just an illegal-
    instruction risk: instruction selection/FMA contraction differs across
    builds, and on knife-edge near-degenerate clusters the SCF can land in a
    different UHF basin than this host's numpy/BLAS oracle (measured: an
    O3NF cluster 0.137 Ha apart — tests/test_nddo.py random-molecule
    parity). Mirrors the CPU-feature keying of the XLA compile cache
    (tools/util.py)."""
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            lines = [ln for ln in f
                     if ln.startswith(('model name', 'flags'))]
        key = ''.join(sorted(set(lines)))
    except OSError:
        import platform
        key = platform.processor() + platform.machine()
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def _build() -> None:
    fp = _host_fingerprint()
    stamp = None
    try:
        with open(_FINGERPRINT_PATH) as f:
            stamp = f.read().strip()
    except OSError:
        pass
    # -B forces a full rebuild when the .so was built on another host (or
    # the stamp is missing — e.g. a fresh checkout, where the committed
    # binary's provenance is unknown)
    args = ['make', '-C', _CSRC_DIR] + ([] if stamp == fp else ['-B'])
    try:
        subprocess.run(args, check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        if os.path.exists(_LIB_PATH):  # toolchain missing: committed binary
            import warnings               # is better than nothing
            warnings.warn('csrc rebuild failed; using the existing '
                          'libmolgym_host.so (possibly built on another '
                          'host)', RuntimeWarning)
            return
        raise
    with open(_FINGERPRINT_PATH, 'w') as f:
        f.write(fp)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if os.path.isdir(_CSRC_DIR) and os.path.exists(
            os.path.join(_CSRC_DIR, 'Makefile')):
        # rebuilds when sources are newer than the .so OR the .so was built
        # on a different host (see _host_fingerprint)
        _build()
    elif not os.path.exists(_LIB_PATH):
        raise RuntimeError(f'native library missing: {_LIB_PATH}')
    lib = ctypes.CDLL(_LIB_PATH)

    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_dbl_p = ctypes.POINTER(ctypes.c_double)
    c_u8_p = ctypes.POINTER(ctypes.c_ubyte)

    lib.mg_batch_reward.restype = ctypes.c_int
    lib.mg_batch_reward.argtypes = [
        ctypes.c_int, ctypes.c_int, c_int_p, c_dbl_p, c_int_p, c_int_p,
        c_dbl_p, c_u8_p, ctypes.c_int, ctypes.c_double, c_dbl_p
    ]
    lib.mg_energy.restype = ctypes.c_double
    lib.mg_energy.argtypes = [c_int_p, c_dbl_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_double]
    lib.mg_gradients.restype = ctypes.c_int
    lib.mg_gradients.argtypes = [c_int_p, c_dbl_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_double, c_dbl_p]
    lib.mg_pool_stats.restype = None
    lib.mg_pool_stats.argtypes = [ctypes.POINTER(ctypes.c_longlong),
                                  ctypes.POINTER(ctypes.c_longlong)]
    lib.mg_nddo_energy.restype = ctypes.c_double
    lib.mg_nddo_energy.argtypes = [c_int_p, c_dbl_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
    lib.mg_nddo_gradients.restype = ctypes.c_int
    lib.mg_nddo_gradients.argtypes = [c_int_p, c_dbl_p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, c_dbl_p]
    lib.mg_nddo_supported.restype = ctypes.c_int
    lib.mg_nddo_supported.argtypes = [ctypes.c_int]
    lib.mg_eht_orbitals.restype = ctypes.c_int
    lib.mg_eht_orbitals.argtypes = [c_int_p, c_dbl_p, ctypes.c_int, c_dbl_p,
                                    ctypes.c_int, c_int_p]
    lib.mg_nddo_scf_density.restype = ctypes.c_int
    lib.mg_nddo_scf_density.argtypes = [
        c_int_p, c_dbl_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, c_dbl_p, c_dbl_p, c_int_p, c_dbl_p]
    _lib = lib
    return lib


def eht_orbital_energies(zs, positions) -> Tuple[np.ndarray, int]:
    """Sorted EHT MO energies (eV) + valence electron count — the orbital-
    level surface used by external-anchor tests (degeneracies, Koopmans IPs)."""
    lib = load_library()
    zs = np.ascontiguousarray(zs, dtype=np.int32)
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    eps = np.zeros(16 + 4 * len(zs), dtype=np.float64)
    n_elec = ctypes.c_int()
    n = lib.mg_eht_orbitals(_ptr(zs, ctypes.c_int), _ptr(pos, ctypes.c_double),
                            len(zs), _ptr(eps, ctypes.c_double), len(eps),
                            ctypes.byref(n_elec))
    return eps[:n] * 27.211386, n_elec.value


def nddo_scf_density(zs, positions, charge: int = 0, multiplicity: int = 0
                     ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Converged PM6 UHF (energy_hartree, p_alpha, p_beta) from the C++ SCF.

    The densities exist for cross-implementation FUNCTIONAL-parity checks
    (tests/test_nddo.py): on near-degenerate clusters the C++ and numpy
    oracle trajectories may converge to different genuine UHF basins
    depending on machine FP; the oracle evaluating its own energy functional
    on this density is the parity statement that survives that.
    Raises RuntimeError when the SCF does not converge."""
    lib = load_library()
    zs = np.ascontiguousarray(zs, dtype=np.int32)
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    cap = (9 * len(zs)) ** 2  # spd worst case
    pa = np.zeros(cap, dtype=np.float64)
    pb = np.zeros(cap, dtype=np.float64)
    norb = ctypes.c_int()
    energy = ctypes.c_double()
    ret = lib.mg_nddo_scf_density(
        _ptr(zs, ctypes.c_int), _ptr(pos, ctypes.c_double), len(zs),
        charge, multiplicity, cap, _ptr(pa, ctypes.c_double),
        _ptr(pb, ctypes.c_double), ctypes.byref(norb), ctypes.byref(energy))
    if ret != 0:
        raise RuntimeError(f'mg_nddo_scf_density failed (code {ret})')
    n = norb.value
    return energy.value, pa[:n * n].reshape(n, n), pb[:n * n].reshape(n, n)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class NativeBatchCalculator:
    """Batched interaction-reward evaluator over the native thread pool."""

    def __init__(self, method: int = METHOD_LJ, epsilon: float = 0.15) -> None:
        self.lib = load_library()
        self.method = method
        self.epsilon = epsilon

    def batch_reward(self, zs: np.ndarray, positions: np.ndarray,
                     n_atoms: np.ndarray, new_z: np.ndarray,
                     new_pos: np.ndarray, valid: np.ndarray) -> np.ndarray:
        n_mols, max_atoms = zs.shape
        zs = np.ascontiguousarray(zs, dtype=np.int32)
        positions = np.ascontiguousarray(positions, dtype=np.float64)
        n_atoms = np.ascontiguousarray(n_atoms, dtype=np.int32)
        new_z = np.ascontiguousarray(new_z, dtype=np.int32)
        new_pos = np.ascontiguousarray(new_pos, dtype=np.float64)
        valid = np.ascontiguousarray(valid, dtype=np.uint8)
        rewards = np.zeros(n_mols, dtype=np.float64)
        ret = self.lib.mg_batch_reward(
            n_mols, max_atoms, _ptr(zs, ctypes.c_int),
            _ptr(positions, ctypes.c_double), _ptr(n_atoms, ctypes.c_int),
            _ptr(new_z, ctypes.c_int), _ptr(new_pos, ctypes.c_double),
            _ptr(valid, ctypes.c_ubyte), self.method, self.epsilon,
            _ptr(rewards, ctypes.c_double))
        assert ret == 0
        return rewards

    def pool_stats(self) -> Tuple[int, int]:
        evals = ctypes.c_longlong()
        batches = ctypes.c_longlong()
        self.lib.mg_pool_stats(ctypes.byref(evals), ctypes.byref(batches))
        return evals.value, batches.value


class NativeCalc:
    """Single-molecule calculator with the Sparrow-adapter API shape
    (set_elements/set_positions/set_settings/calculate_energy/
    calculate_gradients — reference molgym/calculator.py:9-81), backed by the
    native pair potentials. Usable directly by the BFGS minimizer."""

    def __init__(self, method: str = 'LJ', epsilon: float = 0.15) -> None:
        from molgym_tpu.periodic import ATOMIC_NUMBERS
        self.lib = load_library()
        self.method = {'LJ': METHOD_LJ, 'MORSE': METHOD_MORSE,
                       'EHT': METHOD_EHT, 'PM6': METHOD_PM6}[method.upper()]
        self.epsilon = epsilon
        self._atomic_numbers = ATOMIC_NUMBERS
        self._zs: Optional[np.ndarray] = None
        self._positions: Optional[np.ndarray] = None
        self._settings: dict = {}

    def set_elements(self, elements: Sequence) -> None:
        zs = [self._atomic_numbers[e] if isinstance(e, str) else int(e)
              for e in elements]
        self._zs = np.ascontiguousarray(zs, dtype=np.int32)

    def set_positions(self, positions) -> None:
        self._positions = np.ascontiguousarray(positions, dtype=np.float64).reshape(-1, 3)

    def set_settings(self, settings: dict) -> None:
        # PM6 honors molecular_charge / spin_multiplicity (reference
        # calculator.py:38-63 contract); pair potentials accept for parity.
        self._settings = dict(settings)

    def _scf_args(self):
        charge = int(self._settings.get('molecular_charge', 0))
        # multiplicity 0 -> native default rule (sum Z) % 2 + 1
        mult = int(self._settings.get('spin_multiplicity', 0))
        return charge, mult

    def calculate_energy(self) -> float:
        assert self._zs is not None and self._positions is not None
        if self.method == METHOD_PM6:
            charge, mult = self._scf_args()
            return float(self.lib.mg_nddo_energy(
                _ptr(self._zs, ctypes.c_int),
                _ptr(self._positions, ctypes.c_double), len(self._zs),
                charge, mult))
        return float(self.lib.mg_energy(
            _ptr(self._zs, ctypes.c_int), _ptr(self._positions, ctypes.c_double),
            len(self._zs), self.method, self.epsilon))

    def calculate_gradients(self) -> np.ndarray:
        assert self._zs is not None and self._positions is not None
        grad = np.zeros((len(self._zs), 3), dtype=np.float64)
        if self.method == METHOD_PM6:
            charge, mult = self._scf_args()
            ret = self.lib.mg_nddo_gradients(
                _ptr(self._zs, ctypes.c_int),
                _ptr(self._positions, ctypes.c_double), len(self._zs),
                charge, mult, _ptr(grad, ctypes.c_double))
        else:
            ret = self.lib.mg_gradients(
                _ptr(self._zs, ctypes.c_int),
                _ptr(self._positions, ctypes.c_double),
                len(self._zs), self.method, self.epsilon,
                _ptr(grad, ctypes.c_double))
        assert ret == 0
        return grad
