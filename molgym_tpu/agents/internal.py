"""Internal-coordinates actor-critic family.

Re-architecture of the reference SchNetAC (reference
molgym/agents/internal/agent.py): an agent is an atom *encoder* (any module
mapping the padded canvas to per-atom features) plus a shared stack of
autoregressive heads:

  stop=0 -> focus (masked categorical over atoms) -> element (masked by bag)
  -> (distance, angle, dihedral) tanh-squashed Gaussians with learned global
  log-stds (agent.py:65-82,244-281) -> kappa orientation flip scored by
  re-encoding both candidate placements (agent.py:153-179,283-295).

Flat sub-action layout (the reference's `a`, agent.py:297-300):
  [stop, focus, element, distance, angle, dihedral, kappa]      (7,)

Everything is batched: the reference's per-observation Python loops
(agent.py:124-143, 163-177) become vmapped tensor ops; the kappa surrogate is
two extra batched encoder passes, and z-matrix placement happens on device
(ops/zmat.py) instead of in `to_action_space` host conversion (agent.py:91-110).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.agents.base import AgentOutput
from molgym_tpu.agents.modules import MLP
from molgym_tpu.distributions.discrete import (categorical_argmax,
                                               categorical_entropy,
                                               categorical_log_prob,
                                               categorical_sample,
                                               masked_categorical_probs,
                                               normal_log_prob, normal_sample)
from molgym_tpu.ops import zmat
from molgym_tpu.ops.masked import masked_sum, to_one_hot
from molgym_tpu.spaces import Observation

NUM_SUBACTIONS = 7


class AtomMLPEncoder(nn.Module):
    """Cheap non-invariant encoder: per-atom MLP over (one-hot(z), position).
    Development/CI baseline; the SchNet encoder is the paper-parity one."""
    num_zs: int
    width: int
    num_afeats: int

    @nn.compact
    def __call__(self, elements: jnp.ndarray, positions: jnp.ndarray,
                 bag: jnp.ndarray) -> jnp.ndarray:
        one_hot = to_one_hot(elements, self.num_zs)
        x = jnp.concatenate([one_hot, positions], axis=-1)
        return MLP(output_dims=(self.width, self.num_afeats))(x)


class InternalAC(nn.Module):
    """Autoregressive internal-coordinate actor-critic over a pluggable
    encoder. encoder_cls is constructed lazily so the whole agent is one flax
    module tree."""
    num_zs: int
    canvas_size: int
    network_width: int
    min_max_distance: Tuple[float, float]
    encoder: nn.Module
    num_afeats: int

    @property
    def num_subactions(self) -> int:
        return NUM_SUBACTIONS

    def setup(self):
        width = self.network_width
        self.num_latent_beta = width // 4
        self.phi_beta = MLP(output_dims=(width, self.num_latent_beta))
        self.phi_focus = MLP(output_dims=(width, 1))
        self.phi_element = MLP(output_dims=(width, self.num_zs))
        self.phi_continuous = MLP(output_dims=(width, 3))
        self.phi_kappa = MLP(output_dims=(width, 1))
        self.critic = MLP(output_dims=(width, width, 1))
        # learned global stds for (d, theta, psi) (reference agent.py:65-66)
        self.log_stds = self.param(
            'log_stds', lambda _rng: jnp.log(jnp.array([0.15, 0.25, 0.25], jnp.float32)))

        lo, hi = self.min_max_distance
        self.ranges_width = jnp.array([hi - lo, np.pi, np.pi], jnp.float32)
        self.ranges_center = jnp.array([(hi + lo) / 2, np.pi / 2, np.pi / 2], jnp.float32)

    # -- pieces ---------------------------------------------------------------

    def _masks(self, n_atoms: jnp.ndarray):
        idx = jnp.arange(self.canvas_size)[None, :]
        occupied = idx < n_atoms[:, None]
        # focus the null slot 0 when the canvas is empty (reference
        # agent.py:134-135 / covariant agent.py:183-187)
        focus_mask = jnp.logical_or(occupied, idx == 0)
        n = n_atoms[:, None]
        action_mask = jnp.concatenate([
            (n >= 1), jnp.ones_like(n, bool), (n >= 1), (n >= 2), (n >= 3), (n >= 3)
        ], axis=-1).astype(jnp.float32)  # [B, 6]
        return occupied, focus_mask, action_mask

    def _encode(self, obs: Observation) -> jnp.ndarray:
        feats = self.encoder(obs.elements, obs.positions, obs.bag)
        occupied = (jnp.arange(self.canvas_size)[None, :] <
                    jnp.sum((obs.elements != 0).astype(jnp.int32), axis=-1)[:, None])
        return feats * occupied[..., None]

    def _surrogate_kappa_logits(self, obs, n_atoms, focus, element, distance,
                                angle, dihedral, latent_bag_next):
        """Score the +/-dihedral candidate placements by re-encoding the
        extended canvas (reference surrogate_features, agent.py:153-179)."""
        slot = jnp.clip(n_atoms, 0, self.canvas_size - 1)

        def candidate_feats(sign):
            pos = jax.vmap(zmat.position_atom)(
                obs.positions, n_atoms, focus, distance, angle, sign * dihedral)
            elements_ext = jax.vmap(lambda e, s, v: e.at[s].set(v))(
                obs.elements, slot, element)
            positions_ext = jax.vmap(lambda p, s, v: p.at[s].set(v))(
                obs.positions, slot, pos)
            feats = self.encoder(elements_ext, positions_ext, obs.bag)
            return jnp.take_along_axis(
                feats, slot[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]

        f0 = candidate_feats(jnp.float32(1.0))
        f1 = candidate_feats(jnp.float32(-1.0))
        v0 = self.phi_kappa(jnp.concatenate([f0, latent_bag_next], axis=-1))
        v1 = self.phi_kappa(jnp.concatenate([f1, latent_bag_next], axis=-1))
        return jnp.concatenate([v0, v1], axis=-1)  # [B, 2]

    # -- main -----------------------------------------------------------------

    def _step(self, obs: Observation, actions: Optional[jnp.ndarray],
              rng: Optional[jnp.ndarray], deterministic: bool):
        batch = obs.elements.shape[0]
        n_atoms = jnp.sum((obs.elements != 0).astype(jnp.int32), axis=-1)
        occupied, focus_mask, action_mask = self._masks(n_atoms)

        atom_feats = self._encode(obs)  # [B, N, F]
        bag_f = obs.bag.astype(jnp.float32)
        latent_bag = self.phi_beta(bag_f)  # [B, Lb]
        latent = jnp.concatenate([
            atom_feats,
            jnp.broadcast_to(latent_bag[:, None, :],
                             (batch, self.canvas_size, latent_bag.shape[-1]))
        ], axis=-1)  # [B, N, L]

        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_focus, k_elem, k_cont, k_kappa = jax.random.split(rng, 4)

        # Focus
        focus_logits = self.phi_focus(latent)[..., 0]
        focus_probs = masked_categorical_probs(focus_logits, focus_mask)
        if actions is not None:
            focus = jnp.round(actions[:, 1]).astype(jnp.int32)
        elif deterministic:
            focus = categorical_argmax(focus_probs)
        else:
            focus = categorical_sample(k_focus, focus_probs)
        focus_oh = to_one_hot(focus, self.canvas_size)
        focused = jnp.einsum('bn,bnl->bl', focus_oh, latent)

        # Element
        element_mask = obs.bag > 0
        element_logits = self.phi_element(focused)
        element_probs = masked_categorical_probs(element_logits, element_mask)
        if actions is not None:
            element = jnp.round(actions[:, 2]).astype(jnp.int32)
        elif deterministic:
            element = categorical_argmax(element_probs)
        else:
            element = categorical_sample(k_elem, element_probs)
        element_oh = to_one_hot(element, self.num_zs)

        # Continuous (distance, angle, dihedral)
        f = jnp.concatenate([focused, element_oh], axis=-1)
        means = jnp.tanh(self.phi_continuous(f))  # [B, 3] in (-1, 1)
        means = means * (self.ranges_width / 2) + self.ranges_center
        stds = jnp.exp(1e-6 + self.log_stds)[None, :]
        if actions is not None:
            cont = actions[:, 3:6]
        elif deterministic:
            cont = means
        else:
            cont = normal_sample(k_cont, means, jnp.broadcast_to(stds, means.shape))
            # sampled distance must stay positive (reference agent.py:252)
            cont = cont.at[:, 0].set(jnp.maximum(cont[:, 0], 0.001))
        distance, angle, dihedral = cont[:, 0], cont[:, 1], cont[:, 2]

        # Kappa via surrogate re-encoding
        bag_next = bag_f - element_oh
        latent_bag_next = self.phi_beta(bag_next)
        kappa_logits = self._surrogate_kappa_logits(
            obs, n_atoms, focus, element, distance, angle, dihedral, latent_bag_next)
        kappa_probs = jax.nn.softmax(kappa_logits, axis=-1)
        if actions is not None:
            kappa = jnp.round(actions[:, 6]).astype(jnp.int32)
        elif deterministic:
            kappa = categorical_argmax(kappa_probs)
        else:
            kappa = categorical_sample(k_kappa, kappa_probs)

        # Log-probs per sub-action, masked by canvas-size validity
        logp_parts = jnp.stack([
            categorical_log_prob(focus_probs, focus),
            categorical_log_prob(element_probs, element),
            normal_log_prob(distance, means[:, 0], stds[0, 0]),
            normal_log_prob(angle, means[:, 1], stds[0, 1]),
            normal_log_prob(dihedral, means[:, 2], stds[0, 2]),
            categorical_log_prob(kappa_probs, kappa),
        ], axis=-1)  # [B, 6]
        logp = jnp.sum(logp_parts * action_mask, axis=-1)

        ent_parts = jnp.stack([
            categorical_entropy(focus_probs),
            categorical_entropy(element_probs),
        ], axis=-1)
        ent = jnp.sum(ent_parts * action_mask[:, :2], axis=-1)

        # Critic: masked sum pooling + bag latent (reference agent.py:305-315)
        pooled = masked_sum(atom_feats, occupied.astype(jnp.float32))
        v = self.critic(jnp.concatenate([pooled, latent_bag], axis=-1))[..., 0]

        if actions is None:
            stop = jnp.zeros((batch, ), jnp.float32)
            actions = jnp.stack([
                stop, focus.astype(jnp.float32), element.astype(jnp.float32),
                distance, angle, dihedral, kappa.astype(jnp.float32)
            ], axis=-1)

        sign = jnp.where(kappa == 1, -1.0, 1.0)
        position = jax.vmap(zmat.position_atom)(
            obs.positions, n_atoms, focus, distance, angle, sign * dihedral)

        return AgentOutput(action_flat=actions, element=element,
                           position=position, logp=logp, ent=ent, v=v)

    # -- public (use with module.apply(..., method=...)) ----------------------

    def act(self, obs: Observation, rng: jnp.ndarray,
            deterministic: bool = False) -> AgentOutput:
        return self._step(obs, None, rng, deterministic)

    def evaluate(self, obs: Observation, action_flat: jnp.ndarray):
        out = self._step(obs, action_flat, None, False)
        return out.logp, out.ent, out.v

    def __call__(self, obs: Observation, rng: jnp.ndarray) -> AgentOutput:
        return self.act(obs, rng)


def make_mlp_internal_agent(num_zs: int, canvas_size: int,
                            network_width: int = 64,
                            min_max_distance: Tuple[float, float] = (0.8, 1.8)
                            ) -> InternalAC:
    num_afeats = network_width // 2
    return InternalAC(
        num_zs=num_zs, canvas_size=canvas_size, network_width=network_width,
        min_max_distance=min_max_distance, num_afeats=num_afeats,
        encoder=AtomMLPEncoder(num_zs=num_zs, width=network_width,
                               num_afeats=num_afeats))
