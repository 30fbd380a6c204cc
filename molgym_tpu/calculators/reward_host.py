"""Host-reward bridge: batched io_callback from the jitted rollout to a host
evaluator pool (native C++ or Sparrow), plus object-API reward classes
matching the reference's `MolecularReward` surface (molgym/reward.py).

The env batch crosses the device->host boundary once per vector step; the
evaluator fans the batch out over its thread pool (SURVEY.md §2.3 plan).
"""
from __future__ import annotations

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.atoms import Atom, Atoms
from molgym_tpu.envs.reward import RewardFn


def make_host_reward(batch_calculator, distance_penalty: float = 0.0) -> RewardFn:
    """Wrap a batched host evaluator (NativeBatchCalculator /
    SparrowBatchCalculator) as a RewardFn usable inside jit/scan.

    The callback signature matches the device-reward contract
    (envs/reward.py): positions[B,N,3], zs[B,N] atomic numbers, new_pos[B,3],
    new_z[B], valid[B] -> float32[B].
    """

    def host_fn(positions, zs, new_pos, new_z, valid):
        n_atoms = (np.asarray(zs) > 0).sum(axis=-1).astype(np.int32)
        rewards = batch_calculator.batch_reward(
            np.asarray(zs), np.asarray(positions, dtype=np.float64), n_atoms,
            np.asarray(new_z), np.asarray(new_pos, dtype=np.float64),
            np.asarray(valid))
        if distance_penalty:
            dist = np.linalg.norm(np.asarray(new_pos, dtype=np.float64), axis=-1)
            rewards = rewards - distance_penalty * dist * np.asarray(valid)
        return rewards.astype(np.float32)

    def reward_fn(positions, zs, new_pos, new_z, valid):
        result_shape = jax.ShapeDtypeStruct((positions.shape[0], ), jnp.float32)
        return jax.experimental.io_callback(
            host_fn, result_shape, positions, zs, new_pos, new_z, valid,
            ordered=False)

    return reward_fn


class TimedBatchCalculator:
    """Wraps a batch calculator, accumulating wall time + call count.

    Feeds the per-iteration `reward_time` train metric (reference parity: the
    reference reports per-reward elapsed_time, molgym/reward.py:51-53). Works
    for both reward transports since io_callback and the host loop both go
    through batch_reward.
    """

    def __init__(self, inner) -> None:
        self.inner = inner
        self.total_time = 0.0
        self.total_calls = 0

    def batch_reward(self, *args, **kwargs):
        start = time.perf_counter()
        result = self.inner.batch_reward(*args, **kwargs)
        self.total_time += time.perf_counter() - start
        self.total_calls += 1
        return result

    def pool_stats(self):
        return self.inner.pool_stats()


# -- object API (host-side, reference molgym/reward.py parity) -------------------

class MolecularReward:
    def calculate(self, atoms: Atoms, new_atom: Atom) -> Tuple[float, dict]:
        raise NotImplementedError

    @staticmethod
    def get_minimum_spin_multiplicity(atoms: Atoms) -> int:
        return int(sum(int(a.z) for a in atoms)) % 2 + 1


class InteractionReward(MolecularReward):
    """r = -(E(atoms+new) - E(atoms) - E(new alone)) (reference
    molgym/reward.py:22-72). backend='sparrow' uses PM6 via scine (when
    installed); 'lj'/'morse' use the native C++ pair potentials."""

    def __init__(self, backend: str = 'sparrow', method: str = 'PM6') -> None:
        self.backend = backend
        if backend == 'sparrow':
            from molgym_tpu.calculators.sparrow import (SPARROW_AVAILABLE,
                                                        SparrowBatchCalculator)
            if not SPARROW_AVAILABLE:
                raise RuntimeError(
                    "backend='sparrow' requires scine_sparrow; use 'lj' or "
                    "'morse' on hosts without it")
            self._batch = SparrowBatchCalculator(method=method)
        else:
            from molgym_tpu.calculators.native import (METHOD_EHT, METHOD_LJ,
                                                       METHOD_MORSE,
                                                       METHOD_PM6,
                                                       NativeBatchCalculator)
            method_id = {'lj': METHOD_LJ, 'morse': METHOD_MORSE,
                         'eht': METHOD_EHT, 'pm6': METHOD_PM6}[backend]
            self._batch = NativeBatchCalculator(method=method_id)

    @property
    def batch_calculator(self):
        return self._batch

    def calculate(self, atoms: Atoms, new_atom: Atom) -> Tuple[float, dict]:
        start = time.time()
        n = len(atoms)
        zs = np.zeros((1, max(n, 1)), dtype=np.int32)
        positions = np.zeros((1, max(n, 1), 3), dtype=np.float64)
        if n:
            zs[0, :n] = atoms.numbers
            positions[0, :n] = atoms.positions
        reward = self._batch.batch_reward(
            zs, positions, np.array([n], np.int32),
            np.array([new_atom.z], np.int32),
            new_atom.position.reshape(1, 3), np.array([1], np.uint8))
        return float(reward[0]), {'elapsed_time': time.time() - start}


class SolvationReward(InteractionReward):
    """Interaction reward minus distance penalty (reference reward.py:75-100)."""

    def __init__(self, distance_penalty: float = 0.01, **kwargs) -> None:
        super().__init__(**kwargs)
        self.distance_penalty = distance_penalty

    def calculate(self, atoms: Atoms, new_atom: Atom) -> Tuple[float, dict]:
        reward, info = super().calculate(atoms, new_atom)
        reward -= self.distance_penalty * float(np.linalg.norm(new_atom.position))
        return reward, info
