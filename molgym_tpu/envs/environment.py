"""Molecular-design MDP as pure jittable functions.

TPU-first redesign of the reference environments (reference
molgym/environment.py). The MDP semantics are identical:

  * stop element (z == 0)          -> done, reward 0            (env.py:52-55)
  * invalid geometry               -> done, reward = min_reward (env.py:58-64)
  * reward < min_reward            -> clamp + done, atom placed (env.py:66-73)
  * canvas full or bag empty       -> done                      (env.py:81-83)
  * validity: min pairwise distance (env.py:91-98) and H/F/Cl/Br within
    max_solo_distance of a heavy atom (env.py:103-118)

but the state is a pytree of fixed-shape arrays and `step`/`reset` are pure
functions composed under vmap/scan, replacing the per-env Python object loop
(reference env_container.py:88-97).

Design deltas (documented intentionally):
  * Selecting an element whose bag count is 0 is treated as an invalid action
    (min_reward + done) instead of raising (reference tools/util.py:33-40
    raises RuntimeError); agents mask it out, so this only affects adversarial
    actions.
  * The scaffold-containment test for the constrained environment is a static
    halfspace check (A x <= b) precomputed from the scaffold's convex hull on
    the host at construction time, instead of a per-step Qhull/Delaunay call
    (reference environment.py:166-171) — the scaffold is fixed per env, so the
    hull is static and the check becomes one small matmul on device.

Environment variants (reference environment.py:129-249) are expressed as
configuration, not subclasses: a formula table with a cycling cursor
(multi-bag), an optional initial structure (refillable/scaffold), a refill
budget, and an optional stochastic bag sampler.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from molgym_tpu.envs.reward import RewardFn
from molgym_tpu.periodic import SOLO_CANDIDATE_ZS, Z_TO_BOND_COUNT
from molgym_tpu.spaces import Observation, ObservationSpace


@struct.dataclass
class EnvState:
    elements: jnp.ndarray  # int32[N] canvas element indices (0 = empty slot)
    positions: jnp.ndarray  # float32[N, 3]
    bag: jnp.ndarray  # int32[Z]
    n_atoms: jnp.ndarray  # int32 scalar
    formula_cursor: jnp.ndarray  # int32 scalar: next formula in the cycle
    refill_count: jnp.ndarray  # int32 scalar
    rng: jnp.ndarray  # PRNG key (stochastic bag sampling)

    def observation(self) -> Observation:
        return Observation(elements=self.elements, positions=self.positions,
                           bag=self.bag)


@struct.dataclass
class StepResult:
    state: EnvState
    observation: Observation
    reward: jnp.ndarray  # float32[B]
    done: jnp.ndarray  # bool[B]
    # NOTE: reward wall time is tracked host-side (TimedBatchCalculator ->
    # per-iteration `reward_time` in the train JSONL; reference parity for
    # reward.py:51-53) — a per-step device-side field can't time host work.


class MolecularEnv:
    """Vectorized molecular-design environment.

    All public methods are pure and jittable; the instance only holds static
    configuration (shapes, tables) that gets baked into the compiled program.
    """

    def __init__(
        self,
        reward_fn: RewardFn,
        observation_space: ObservationSpace,
        formulas: np.ndarray,  # int32[F, Z] bag table (cycled on reset)
        min_atomic_distance: float = 0.6,
        max_solo_distance: float = 2.0,
        min_reward: float = -0.6,
        initial_elements: Optional[np.ndarray] = None,  # int32[N] pre-placed canvas
        initial_positions: Optional[np.ndarray] = None,  # float32[N, 3]
        num_refills: int = 0,
        scaffold_halfspaces: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        n_scaffold: int = 0,
        stochastic_size_range: Optional[Tuple[int, int]] = None,
    ) -> None:
        self.observation_space = observation_space
        self.reward_fn = reward_fn
        self.canvas_size = observation_space.canvas_size
        self.num_zs = observation_space.num_zs

        self.zs_array = jnp.asarray(np.array(observation_space.zs, dtype=np.int32))
        self.formulas = jnp.asarray(np.asarray(formulas, dtype=np.int32))
        assert self.formulas.ndim == 2 and self.formulas.shape[1] == self.num_zs

        self.min_atomic_distance = float(min_atomic_distance)
        self.max_solo_distance = float(max_solo_distance)
        self.min_reward = float(min_reward)
        self.num_refills = int(num_refills)
        self.n_scaffold = int(n_scaffold)

        if initial_elements is None:
            initial_elements = np.zeros(self.canvas_size, dtype=np.int32)
            initial_positions = np.zeros((self.canvas_size, 3), dtype=np.float32)
        self.initial_elements = jnp.asarray(initial_elements.astype(np.int32))
        self.initial_positions = jnp.asarray(initial_positions.astype(np.float32))
        self.initial_n_atoms = jnp.asarray(
            np.sum(np.asarray(initial_elements) != 0).astype(np.int32))

        # solo-candidate mask over element indices (H, F, Cl, Br)
        solo = np.isin(np.array(observation_space.zs), np.array(SOLO_CANDIDATE_ZS))
        self.solo_mask = jnp.asarray(solo)

        if scaffold_halfspaces is not None:
            a, b = scaffold_halfspaces
            self.hull_a = jnp.asarray(a.astype(np.float32))  # [H, 3]
            self.hull_b = jnp.asarray(b.astype(np.float32))  # [H]
        else:
            self.hull_a = None
            self.hull_b = None

        self.stochastic_size_range = stochastic_size_range
        if stochastic_size_range is not None:
            # Sampling distribution over elements from the base formula
            # (reference StochasticEnvironment, environment.py:210-249).
            base = np.asarray(formulas[0], dtype=np.float64)
            total = base.sum()
            self.z_probs = jnp.asarray((base / max(total, 1.0)).astype(np.float32))
            bond_counts = np.array(
                [Z_TO_BOND_COUNT.get(int(z), 0) for z in observation_space.zs],
                dtype=np.int32)
            self.bond_counts = jnp.asarray(bond_counts)

    # -- reset ---------------------------------------------------------------

    def _sample_bag(self, rng: jnp.ndarray) -> jnp.ndarray:
        """Sample a bag of `size` atoms from z_probs with even total valence
        (reference environment.py:226-249). Resampling runs a bounded
        while_loop; parity almost always satisfied within a few tries."""
        lo, hi = self.stochastic_size_range
        max_size = hi

        def draw(rng):
            rng, k_size, k_elems = jax.random.split(rng, 3)
            if lo < hi:
                size = jax.random.randint(k_size, (), lo, hi)
            else:
                size = jnp.asarray(hi, dtype=jnp.int32)
            draws = jax.random.categorical(
                k_elems, jnp.log(jnp.maximum(self.z_probs, 1e-20)),
                shape=(max_size, ))
            sel = jnp.arange(max_size) < size
            one_hot = jax.nn.one_hot(draws, self.num_zs, dtype=jnp.int32)
            bag = jnp.sum(one_hot * sel[:, None].astype(jnp.int32), axis=0)
            return rng, bag

        def cond(carry):
            _rng, bag, tries = carry
            parity = jnp.sum(bag * self.bond_counts) % 2
            return jnp.logical_and(parity != 0, tries < 64)

        def body(carry):
            rng, _bag, tries = carry
            rng, bag = draw(rng)
            return rng, bag, tries + 1

        rng, bag = draw(rng)
        _, bag, _ = jax.lax.while_loop(cond, body, (rng, bag, jnp.int32(0)))
        return bag

    def reset(self, state: EnvState) -> Tuple[EnvState, Observation]:
        """Single-env reset: restore the (possibly pre-seeded) canvas and load
        the next bag from the cycle or the stochastic sampler."""
        cursor = state.formula_cursor % self.formulas.shape[0]
        rng = state.rng
        if self.stochastic_size_range is not None:
            rng, sub = jax.random.split(rng)
            bag = self._sample_bag(sub)
        else:
            bag = self.formulas[cursor]
        new_state = EnvState(
            elements=self.initial_elements,
            positions=self.initial_positions,
            bag=bag,
            n_atoms=self.initial_n_atoms,
            formula_cursor=cursor + 1,
            refill_count=jnp.zeros((), jnp.int32),
            rng=rng,
        )
        return new_state, new_state.observation()

    def init_states(self, rng: jnp.ndarray, num_envs: int) -> EnvState:
        """Create and reset a batch of env states. Env i starts at formula
        i-th offset 0 (matching the reference: every env has its own cycle,
        scripts/run.py:72-94 builds identical envs)."""
        keys = jax.random.split(rng, num_envs)
        zero = jnp.zeros((), jnp.int32)
        proto = EnvState(elements=self.initial_elements,
                         positions=self.initial_positions,
                         bag=jnp.zeros(self.num_zs, jnp.int32), n_atoms=zero,
                         formula_cursor=zero, refill_count=zero, rng=keys[0])
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs, ) + x.shape), proto)
        states = states.replace(rng=keys)
        states, _ = jax.vmap(self.reset)(states)
        return states

    # -- step ----------------------------------------------------------------

    def _is_valid(self, state: EnvState, new_pos: jnp.ndarray,
                  element_index: jnp.ndarray) -> jnp.ndarray:
        occupied = jnp.arange(self.canvas_size) < state.n_atoms
        diff = state.positions - new_pos[None, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))

        too_close = jnp.any(jnp.logical_and(occupied, dist < self.min_atomic_distance))

        # H/F/Cl/Br must be near a heavy (non-candidate) atom if any atoms exist.
        is_candidate = self.solo_mask[element_index]
        heavy = jnp.logical_and(occupied, jnp.logical_not(self.solo_mask[state.elements]))
        near_heavy = jnp.any(jnp.logical_and(heavy, dist < self.max_solo_distance))
        covered = jnp.logical_or(
            jnp.logical_or(state.n_atoms == 0, jnp.logical_not(is_candidate)),
            near_heavy)

        valid = jnp.logical_and(jnp.logical_not(too_close), covered)

        # Bag must contain the chosen element, and the canvas must have a free
        # slot (design delta: invalid action instead of raising; the reference
        # raises 'Too many atoms' when stepped past capacity).
        valid = jnp.logical_and(valid, state.bag[element_index] > 0)
        valid = jnp.logical_and(valid, state.n_atoms < self.canvas_size)

        if self.hull_a is not None:
            inside = jnp.all(self.hull_a @ new_pos + self.hull_b <= 1e-6)
            valid = jnp.logical_and(valid, inside)
        return valid

    def reward_inputs(self, states: EnvState, element_index: jnp.ndarray,
                      position: jnp.ndarray):
        """Device phase A: validity + the batched reward-function inputs.
        Lets a host loop evaluate rewards between two jitted phases on
        backends without host-callback support (see rl/rollout.py)."""
        stop = self.zs_array[element_index] == 0  # [B]
        valid = jax.vmap(self._is_valid)(states, position, element_index)
        needs_reward = jnp.logical_and(jnp.logical_not(stop), valid)

        zs_atomic = self.zs_array[states.elements] * (
            jnp.arange(self.canvas_size)[None, :] < states.n_atoms[:, None])
        if self.n_scaffold > 0:
            # Reward over non-scaffold atoms only (reference environment.py:173-175).
            non_scaffold = jnp.arange(self.canvas_size)[None, :] >= self.n_scaffold
            zs_atomic = zs_atomic * non_scaffold
        new_z = self.zs_array[element_index]
        return stop, valid, needs_reward, zs_atomic, new_z

    def finalize_step(self, states: EnvState, element_index: jnp.ndarray,
                      position: jnp.ndarray, stop: jnp.ndarray,
                      valid: jnp.ndarray,
                      raw_reward: jnp.ndarray) -> StepResult:
        """Device phase B: state update given precomputed validity + rewards
        (host-loop mode calls reward_inputs / finalize_step separately so the
        validity work runs once)."""
        return self._finalize(states, element_index, position, stop, valid,
                              raw_reward)

    def step(self, states: EnvState, element_index: jnp.ndarray,
             position: jnp.ndarray) -> StepResult:
        """Batched step. element_index: int32[B]; position: float32[B, 3].
        The reward function runs inline (device reward or io_callback); the
        host-loop path uses reward_inputs + finalize_step instead."""
        stop, valid, needs_reward, zs_atomic, new_z = self.reward_inputs(
            states, element_index, position)
        # Batched reward — the single host/device boundary of the step.
        raw_reward = self.reward_fn(states.positions, zs_atomic, position,
                                    new_z, needs_reward)
        return self._finalize(states, element_index, position, stop, valid,
                              raw_reward)

    def _finalize(self, states: EnvState, element_index: jnp.ndarray,
                  position: jnp.ndarray, stop: jnp.ndarray, valid: jnp.ndarray,
                  raw_reward: jnp.ndarray) -> StepResult:

        def update_one(state, elem_idx, pos, stop_i, valid_i, raw_r):
            low = raw_r < self.min_reward
            reward = jnp.where(stop_i, 0.0,
                               jnp.where(valid_i, jnp.maximum(raw_r, self.min_reward),
                                         self.min_reward)).astype(jnp.float32)

            place = jnp.logical_and(valid_i, jnp.logical_not(stop_i))
            slot = jnp.clip(state.n_atoms, 0, self.canvas_size - 1)
            elements = jnp.where(
                place, state.elements.at[slot].set(elem_idx), state.elements)
            positions = jnp.where(
                place, state.positions.at[slot].set(pos), state.positions)
            bag = jnp.where(place, state.bag.at[elem_idx].add(-1), state.bag)
            n_atoms = state.n_atoms + place.astype(jnp.int32)

            canvas_full = n_atoms >= self.canvas_size
            bag_empty = jnp.sum(bag) == 0

            # Refillable variant (reference environment.py:178-207): an empty
            # bag refills from the cycle until the budget runs out.
            refill = jnp.logical_and(
                bag_empty, state.refill_count < self.num_refills)
            refill = jnp.logical_and(refill, jnp.logical_not(canvas_full))
            cursor = state.formula_cursor % self.formulas.shape[0]
            bag = jnp.where(refill, self.formulas[cursor], bag)
            formula_cursor = state.formula_cursor + refill.astype(jnp.int32)
            refill_count = state.refill_count + refill.astype(jnp.int32)
            bag_empty = jnp.sum(bag) == 0

            done = stop_i | ~valid_i | (place & low) | canvas_full | bag_empty

            new_state = EnvState(elements=elements, positions=positions, bag=bag,
                                 n_atoms=n_atoms, formula_cursor=formula_cursor,
                                 refill_count=refill_count, rng=state.rng)
            return new_state, reward, done

        new_states, rewards, dones = jax.vmap(update_one)(
            states, element_index, position, stop, valid, raw_reward)
        return StepResult(state=new_states, observation=new_states.observation(),
                          reward=rewards, done=dones)

    def reset_if_terminal(self, states: EnvState,
                          dones: jnp.ndarray) -> Tuple[EnvState, Observation]:
        """Auto-reset finished envs (reference env_container.py:102-112)."""
        reset_states, _ = jax.vmap(self.reset)(states)
        new_states = jax.tree.map(
            lambda r, s: jnp.where(
                dones.reshape(dones.shape + (1, ) * (r.ndim - 1)), r, s),
            reset_states, states)
        return new_states, new_states.observation()


def scaffold_halfspaces(scaffold_positions: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute convex-hull halfspaces A, b with {x : A x + b <= 0} the hull
    interior. Host-side, once per env construction (replaces the reference's
    per-step ConvexHull/Delaunay, environment.py:166-171)."""
    from scipy.spatial import ConvexHull
    hull = ConvexHull(np.asarray(scaffold_positions, dtype=np.float64))
    # hull.equations: [H, 4] rows (normal, offset) with normal.x + offset <= 0 inside
    eq = hull.equations
    return eq[:, :3].astype(np.float32), eq[:, 3].astype(np.float32)
