"""Benchmark: actor-critic fwd+bwd per PPO minibatch on the canonical SF6
covariant configuration (BASELINE.md: canvas 7, maxl 4, 3 CG levels, hidden
10, 4 channels/element, minibatch 140, beta=-10).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = our fwd+bwd milliseconds per minibatch (lower is better),
               measured on the default JAX device (TPU under the driver).
vs_baseline  = baseline_ms / value  (>1 means faster than baseline).

Baseline methodology: the reference stack (torch + cormorant + schnetpack +
torch-scatter) is not installable here and publishes no numbers (BASELINE.md),
so the baseline is a faithful torch re-implementation of the reference's
covariant hot path — relative spherical harmonics, per-level radial-gated
edge reps, CG aggregate/square contractions with identical CG tables and
identical shapes, plus backward — executed with torch on this host's CPU
(the reference's own --device=cpu mode, arg_parser.py:18). Same math, same
shapes, reference's framework.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 140  # canonical SF6 minibatch (README.md:67-84 of the reference)
CANVAS = 7
ZS = (0, 9, 16)  # X, F, S
MAXL = 4
NUM_LEVELS = 3
HIDDEN = 10
CPE = 4  # channels per element
WIDTH = 128


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Ours (JAX)
# ---------------------------------------------------------------------------

def make_batch(rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    n_atoms = rng.randint(1, CANVAS + 1, size=BATCH)
    elements = np.zeros((BATCH, CANVAS), np.int32)
    positions = np.zeros((BATCH, CANVAS, 3), np.float32)
    bag = np.zeros((BATCH, len(ZS)), np.int32)
    for b in range(BATCH):
        elements[b, :n_atoms[b]] = rng.randint(1, len(ZS), size=n_atoms[b])
        positions[b, :n_atoms[b]] = rng.randn(n_atoms[b], 3) * 1.2
        bag[b, 1] = rng.randint(1, 6)
        bag[b, 2] = 1
    return elements, positions, bag


def _enable_compile_cache():
    import os
    import jax
    cache_dir = os.environ.get('MOLGYM_TPU_XLA_CACHE',
                               '/tmp/molgym_tpu_xla_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def bench_ours(iters=30):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from molgym_tpu.agents.covariant import CovariantAC
    from molgym_tpu.spaces import Observation

    agent = CovariantAC(zs=ZS, canvas_size=CANVAS, network_width=WIDTH,
                        maxl=MAXL, num_cg_levels=NUM_LEVELS,
                        num_channels_hidden=HIDDEN,
                        num_channels_per_element=CPE, num_gaussians=3,
                        bag_scale=5, min_max_distance=(1.10, 2.10), beta=-10.0)
    elements, positions, bag = make_batch()
    obs = Observation(elements=jnp.asarray(elements),
                      positions=jnp.asarray(positions), bag=jnp.asarray(bag))
    rng = jax.random.PRNGKey(0)
    params = agent.init(rng, obs, rng, method=agent.act)
    actions = agent.apply(params, obs, rng, False, method=agent.act).action_flat

    def loss_fn(p):
        logp, ent, v = agent.apply(p, obs, actions, method=agent.evaluate)
        # PPO-shaped scalar: policy + value + entropy terms all contribute
        return jnp.mean(logp) + 0.5 * jnp.mean(jnp.square(v)) + 0.01 * jnp.mean(ent)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g = grad_fn(params)
    jax.block_until_ready(g)  # compile + warmup
    g = grad_fn(params)
    jax.block_until_ready(g)

    start = time.perf_counter()
    for _ in range(iters):
        g = grad_fn(params)
    jax.block_until_ready(g)
    ms = (time.perf_counter() - start) / iters * 1000.0
    import jax as _jax
    log(f'ours: {ms:.2f} ms/minibatch on {_jax.devices()[0]}')
    return ms


# ---------------------------------------------------------------------------
# Baseline proxy (torch CPU, reference-style covariant hot path)
# ---------------------------------------------------------------------------

def bench_torch_baseline(iters=3):
    import torch

    from molgym_tpu.ops.cg import cg_table

    torch.manual_seed(0)
    elements_np, positions_np, bag_np = make_batch()
    B, N = BATCH, CANVAS
    positions = torch.tensor(positions_np)
    atom_mask = torch.tensor(elements_np != 0)
    edge_mask = (atom_mask[:, :, None] & atom_mask[:, None, :] &
                 ~torch.eye(N, dtype=torch.bool)[None])

    tables = {(l1, l2, l): torch.tensor(cg_table(l1, l2, l), dtype=torch.float32)
              for l1 in range(MAXL + 1) for l2 in range(MAXL + 1)
              for l in range(abs(l1 - l2), min(l1 + l2, MAXL) + 1)}

    def sph_torch(rel):
        """Complex SH (real/imag stacked) — same recursion as ops/sph.py."""
        import math
        px, py, pz = rel[..., 0], rel[..., 1], rel[..., 2]
        r = torch.sqrt(torch.clamp(px * px + py * py + pz * pz, min=1e-24))
        px, py, pz = px / r, py / r, pz / r
        x = pz
        u_r, u_i = [torch.ones_like(px)], [torch.zeros_like(px)]
        for _m in range(1, MAXL + 1):
            pr, pi = u_r[-1], u_i[-1]
            u_r.append(pr * px - pi * py)
            u_i.append(pr * py + pi * px)
        pt = {}
        for m in range(MAXL + 1):
            pmm = ((-1.0) ** m) * float(np.prod(np.arange(1, 2 * m, 2)))
            pt[(m, m)] = torch.full_like(x, pmm)
            if m + 1 <= MAXL:
                pt[(m + 1, m)] = (2 * m + 1) * x * pt[(m, m)]
            for l in range(m + 2, MAXL + 1):
                pt[(l, m)] = ((2 * l - 1) * x * pt[(l - 1, m)] -
                              (l + m - 1) * pt[(l - 2, m)]) / (l - m)
        out = []
        for l in range(MAXL + 1):
            comps = []
            for m in range(-l, l + 1):
                am = abs(m)
                norm = math.sqrt((2 * l + 1) / (4 * math.pi) *
                                 math.factorial(l - am) / math.factorial(l + am))
                base = norm * pt[(l, am)]
                yr, yi = base * u_r[am], base * u_i[am]
                if m < 0:
                    phase = (-1.0) ** am
                    yr, yi = phase * yr, -phase * yi
                comps.append(torch.stack([yr, yi], dim=-1))
            out.append(torch.stack(comps, dim=-2))
        return out

    def complex_contract(a, b, table, pattern):
        rr = torch.einsum(pattern, a[..., 0], b[..., 0], table)
        ii = torch.einsum(pattern, a[..., 1], b[..., 1], table)
        ri = torch.einsum(pattern, a[..., 0], b[..., 1], table)
        ir = torch.einsum(pattern, a[..., 1], b[..., 0], table)
        return torch.stack([rr - ii, ri + ir], dim=-1)

    channels = [HIDDEN] * (NUM_LEVELS - 1) + [len(ZS) * CPE]

    # learnable per-level params: radial dense + per-l complex mix
    params = []
    tau_in = HIDDEN
    n_basis = 16
    for tau_out in channels:
        level = {
            'rad': [torch.randn(n_basis, tau_in, requires_grad=True)
                    for _ in range(MAXL + 1)],
            # up to (maxl+1)^2 (l1,l2) pairs contribute channels per output l
            'mix': [torch.randn((MAXL + 1) ** 2 * tau_in, tau_out, 2,
                                requires_grad=True)
                    for _ in range(MAXL + 1)],
        }
        params.append(level)
        tau_in = tau_out

    x0 = torch.randn(B, N, HIDDEN, requires_grad=True)

    def forward():
        rel = positions[:, :, None, :] - positions[:, None, :, :]
        norms = torch.sqrt(torch.clamp((rel * rel).sum(-1), min=1e-24))
        sph = sph_torch(rel)
        centers = torch.linspace(0, 2.1, n_basis)
        gamma = 0.5 / (centers[1] - centers[0]) ** 2
        rbf = torch.exp(-gamma * (norms[..., None] - centers) ** 2)
        gate = edge_mask.float() * torch.sigmoid((2.1 - norms) / 0.2)

        rep = [torch.stack([x0, torch.zeros_like(x0)], dim=-1)[..., None, :]]
        for level in params:
            tau = rep[0].shape[-3]
            # edge reps + CG aggregate
            ag = [None] * (MAXL + 1)
            for l2 in range(MAXL + 1):
                radial = torch.einsum('bijg,gt->bijt', rbf, level['rad'][l2][:, :tau])
                edge = (radial * gate[..., None])[..., None, None] * \
                    sph[l2][..., None, :, :]
                for l1 in range(len(rep)):
                    for l in range(abs(l1 - l2), min(l1 + l2, MAXL) + 1):
                        t = tables[(l2, l1, l)]
                        part = complex_contract(edge, rep[l1],
                                                t, 'bijtm,bjtn,mnk->bitk')
                        ag[l] = part if ag[l] is None else torch.cat(
                            [ag[l], part], dim=-3)
            # uniform mix, CG square, concat-mix (reference CatMixReps role)
            out = []
            for l in range(MAXL + 1):
                w = level['mix'][l]
                t_in = ag[l].shape[-3]
                wr, wi = w[:t_in, :, 0], w[:t_in, :, 1]
                mr = torch.einsum('bntm,ts->bnsm', ag[l][..., 0], wr) - \
                    torch.einsum('bntm,ts->bnsm', ag[l][..., 1], wi)
                mi = torch.einsum('bntm,ts->bnsm', ag[l][..., 0], wi) + \
                    torch.einsum('bntm,ts->bnsm', ag[l][..., 1], wr)
                out.append(torch.stack([mr, mi], dim=-1))
            sq = [None] * (MAXL + 1)
            for l1 in range(MAXL + 1):
                for l2 in range(MAXL + 1):
                    for l in range(abs(l1 - l2), min(l1 + l2, MAXL) + 1):
                        t = tables[(l1, l2, l)]
                        part = complex_contract(out[l1], out[l2], t,
                                                'bntm,bntq,mqk->bntk')
                        sq[l] = part if sq[l] is None else sq[l] + part
            rep = [o + s[..., :o.shape[-3], :, :] for o, s in zip(out, sq)]
        # invariant readout + scalar loss
        loss = sum((r * r).sum() for r in rep) / B
        return loss

    # warmup
    loss = forward()
    loss.backward()
    start = time.perf_counter()
    for _ in range(iters):
        x0.grad = None
        loss = forward()
        loss.backward()
    ms = (time.perf_counter() - start) / iters * 1000.0
    log(f'torch-cpu baseline proxy: {ms:.2f} ms/minibatch')
    return ms


def main():
    ours_ms = bench_ours()
    try:
        baseline_ms = bench_torch_baseline()
    except Exception as exc:  # baseline must never break the bench line
        log(f'torch baseline failed: {exc!r}')
        baseline_ms = float('nan')

    vs_baseline = (baseline_ms / ours_ms) if np.isfinite(baseline_ms) else 0.0
    print(json.dumps({
        'metric': 'sf6_covariant_fwdbwd_ms_per_minibatch',
        'value': round(ours_ms, 3),
        'unit': 'ms',
        'vs_baseline': round(vs_baseline, 3),
    }))


if __name__ == '__main__':
    main()
