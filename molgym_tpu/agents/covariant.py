"""SO(3)-covariant actor-critic.

Re-architecture of the reference CovariantAC (molgym/agents/covariant/agent.py):
Cormorant covariants per atom -> rotation-invariant scalars -> masked focus
head -> one-hot selection of the focused atom's covariants -> masked element
head -> per-element channel slice (agent.py:53-57,255-259) -> GMM distance
head (tanh-squashed means, learned log-stds; agent.py:117-133,261-276) ->
distance-conditioned covariants via a CG mixer (agent.py:278-282) -> spherical
density over the placement direction (SO3 / ExpSO3, agent.py:199-207,284-292)
-> critic from masked-summed transformed invariants (agent.py:310-316).

Flat sub-action layout (agent.py:297-300):
  [focus, element, distance, nx, ny, nz]                       (6,)

The Cartesian placement atoms[focus] + d * n happens on device
(the reference converts per-observation on host, agent.py:147-163).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.agents.base import AgentOutput
from molgym_tpu.agents.cormorant import CormorantEncoder, CormorantMixer
from molgym_tpu.agents.modules import MLP
from molgym_tpu.distributions import spherical
from molgym_tpu.distributions.discrete import (categorical_argmax,
                                               categorical_entropy,
                                               categorical_log_prob,
                                               categorical_sample,
                                               masked_categorical_probs)
from molgym_tpu.distributions.gmm import gmm_argmax, gmm_log_prob, gmm_sample
from molgym_tpu.ops.masked import to_one_hot
from molgym_tpu.ops.so3 import (atomic_scalars, select_atomic_covariats,
                                select_atomic_invariats, select_taus)
from molgym_tpu.spaces import Observation

NUM_SUBACTIONS = 6


class CovariantAC(nn.Module):
    zs: Tuple[int, ...]  # atomic numbers incl. leading 0
    canvas_size: int
    network_width: int = 128
    maxl: int = 4
    num_cg_levels: int = 3
    num_channels_hidden: int = 10
    num_channels_per_element: int = 4
    num_gaussians: int = 3
    bag_scale: int = 5
    min_max_distance: Tuple[float, float] = (0.9, 1.8)
    beta: Optional[float] = None
    # 'bfloat16' runs the Cormorant CG stack in bf16 (outputs cast back to
    # f32 before the heads); halves the encoder's HBM traffic on TPU.
    encoder_dtype: Optional[str] = None

    @property
    def num_subactions(self) -> int:
        return NUM_SUBACTIONS

    def setup(self):
        num_zs = len(self.zs)
        self.num_channels_out = num_zs * self.num_channels_per_element
        self.encoder = CormorantEncoder(
            num_zs=num_zs, maxl=self.maxl, num_cg_levels=self.num_cg_levels,
            num_channels_hidden=self.num_channels_hidden,
            num_channels_out=self.num_channels_out,
            charge_scale=float(max(self.zs)), bag_scale=float(self.bag_scale),
            hard_cut=min(self.min_max_distance[1], 2.1),
            soft_cut=min(self.min_max_distance[1], 2.1),
            compute_dtype=self.encoder_dtype)
        self.cg_mix = CormorantMixer(maxl=self.maxl,
                                     tau_out=self.num_channels_per_element)

        width = self.network_width
        self.phi_focus = MLP(output_dims=(width, 1))
        self.phi_element = MLP(output_dims=(width, num_zs))
        self.phi_d = MLP(output_dims=(width, 2 * self.num_gaussians))
        self.phi_trans = MLP(output_dims=(width, width))
        self.phi_v = MLP(output_dims=(width, 1))
        self.inv_norm = nn.LayerNorm()
        self.element_inv_norm = nn.LayerNorm()
        self.distance_log_stds = self.param(
            'distance_log_stds',
            lambda _rng: jnp.log(0.1 * jnp.ones(self.num_gaussians, jnp.float32)))

        lo, hi = self.min_max_distance
        self.distance_half_width = (hi - lo) / 2.0
        self.distance_center = (hi + lo) / 2.0
        self.zs_array = jnp.asarray(np.array(self.zs, dtype=np.int32))

    def _step(self, obs: Observation, actions: Optional[jnp.ndarray],
              rng: Optional[jnp.ndarray], deterministic: bool,
              return_dists: bool = False):
        batch = obs.elements.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_focus, k_elem, k_d, k_so3 = jax.random.split(rng, 4)

        n_atoms = jnp.sum((obs.elements != 0).astype(jnp.int32), axis=-1)
        empty = n_atoms == 0
        idx = jnp.arange(self.canvas_size)[None, :]
        atom_mask = idx < n_atoms[:, None]
        focus_mask = jnp.logical_or(atom_mask, idx == 0)

        # Covariants and invariants. LayerNorm keeps head inputs O(1)
        # independent of the CG stack's activation scale (rotation-invariant
        # features, so invariance is preserved) — TPU redesign delta for
        # trainability; the reference relies on cormorant's init specifics.
        covariats = self.encoder(obs.elements, obs.positions, obs.bag,
                                 self.zs_array)  # per l [B, N, tau, m, 2]
        invariats = self.inv_norm(atomic_scalars(covariats))  # [B, N, D]

        # Focus
        focus_logits = self.phi_focus(invariats)[..., 0]
        focus_probs = masked_categorical_probs(focus_logits, focus_mask)
        if actions is not None:
            focus = jnp.round(actions[:, 0]).astype(jnp.int32)
        elif deterministic:
            focus = categorical_argmax(focus_probs)
        else:
            focus = categorical_sample(k_focus, focus_probs)
        focus_oh = to_one_hot(focus, self.canvas_size)

        focused_cov = select_atomic_covariats(covariats, focus_oh)
        focused_inv = select_atomic_invariats(invariats, focus_oh)

        # Element
        element_mask = obs.bag > 0
        element_logits = self.phi_element(focused_inv)
        element_probs = masked_categorical_probs(element_logits, element_mask)
        if actions is not None:
            element = jnp.round(actions[:, 1]).astype(jnp.int32)
        elif deterministic:
            element = categorical_argmax(element_probs)
        else:
            element = categorical_sample(k_elem, element_probs)

        # Per-element channel slice (agent.py:255-259)
        offsets = jnp.arange(self.num_channels_per_element)[None, :]
        indices = offsets + element[:, None] * self.num_channels_per_element
        element_cov = select_taus(focused_cov, indices)
        element_inv = self.element_inv_norm(atomic_scalars(element_cov))

        # Distance: GMM
        gmm_out = self.phi_d(element_inv)
        gmm_log_w = gmm_out[:, :self.num_gaussians]
        d_means = (jnp.tanh(gmm_out[:, self.num_gaussians:]) *
                   self.distance_half_width + self.distance_center)
        d_stds = jnp.maximum(jnp.exp(self.distance_log_stds), 1e-6)
        if actions is not None:
            distance = actions[:, 2]
        elif deterministic:
            distance = gmm_argmax(k_d, gmm_log_w, d_means, d_stds)
        else:
            distance = jnp.maximum(
                gmm_sample(k_d, gmm_log_w, d_means, d_stds), 0.001)

        # Condition covariants on the distance (agent.py:278-282):
        # l=0 rep with the distance tiled over the element channels.
        d_rep0 = jnp.broadcast_to(
            distance[:, None], (batch, self.num_channels_per_element))
        d_rep0 = jnp.stack([d_rep0, jnp.zeros_like(d_rep0)], axis=-1)[..., None, :]
        distance_so3 = [d_rep0]  # [B, cpe, 1, 2]
        cond_cov = self.cg_mix(element_cov, distance_so3)

        so3_dist = spherical.make_so3_distribution(cond_cov, empty=empty,
                                                   beta=self.beta)
        if actions is not None:
            orientation = actions[:, 3:6]
        elif deterministic:
            orientation = spherical.argmax(so3_dist)
        else:
            orientation = spherical.sample(so3_dist, k_so3)

        # Log-prob and entropy
        logp = (categorical_log_prob(focus_probs, focus) +
                categorical_log_prob(element_probs, element) +
                gmm_log_prob(gmm_log_w, d_means, d_stds, distance) +
                spherical.log_prob(so3_dist, orientation))
        ent = categorical_entropy(focus_probs) + categorical_entropy(element_probs)

        # Value (agent.py:310-316)
        trans = self.phi_trans(invariats)
        value_feats = jnp.einsum('bn,bnf->bf', atom_mask.astype(trans.dtype), trans)
        v = self.phi_v(value_feats)[..., 0]

        if actions is None:
            actions = jnp.concatenate([
                focus[:, None].astype(jnp.float32),
                element[:, None].astype(jnp.float32),
                distance[:, None], orientation
            ], axis=-1)

        focus_pos = jnp.einsum('bn,bnc->bc', focus_oh, obs.positions)
        position = jnp.where(empty[:, None], 0.0,
                             focus_pos + distance[:, None] * orientation)

        out = AgentOutput(action_flat=actions, element=element,
                          position=position, logp=logp, ent=ent, v=v)
        if return_dists:
            return out, dict(focus_probs=focus_probs,
                             element_probs=element_probs,
                             gmm=(gmm_log_w, d_means, d_stds),
                             so3_dist=so3_dist)
        return out

    # -- public ----------------------------------------------------------------

    def act(self, obs: Observation, rng: jnp.ndarray,
            deterministic: bool = False) -> AgentOutput:
        return self._step(obs, None, rng, deterministic)

    def evaluate(self, obs: Observation, action_flat: jnp.ndarray):
        out = self._step(obs, action_flat, None, False)
        return out.logp, out.ent, out.v

    def act_with_dists(self, obs: Observation, rng: jnp.ndarray,
                       deterministic: bool = False):
        """act + distribution internals (equivariance tests; the reference
        returns `dists` from step, agent.py:331)."""
        return self._step(obs, None, rng, deterministic, return_dists=True)

    def __call__(self, obs: Observation, rng: jnp.ndarray) -> AgentOutput:
        return self.act(obs, rng)
