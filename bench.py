"""Benchmark: actor-critic fwd+bwd per PPO minibatch on the canonical SF6
covariant configuration (BASELINE.md: canvas 7, maxl 4, 3 CG levels, hidden
10, 4 channels/element, minibatch 140, beta=-10).

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline",
"extra"} immediately after the headline measurement (extras empty) so a
driver timeout can never lose the number, then RE-PRINTS the full record
after EVERY completed extra. Parsing the first JSON line of stdout yields a
valid headline; parsing the last yields the richest record available at the
moment the process ended — a mid-extras kill loses only the extras that had
not finished yet (VERDICT r04 next #1: an overrun with data strictly beats
an on-time empty record).

value        = our fwd+bwd milliseconds per minibatch (lower is better),
               measured on the default JAX device (TPU under the driver).
vs_baseline  = baseline_ms / value  (>1 means faster than baseline).
extra        = secondary metrics (each individually fault-tolerant and
               deadline-guarded so the headline line always prints):
               mfu_est_pct            MXU utilization estimate at batch 140
                                      (HLO flops / time / 197 TFLOP/s v5e peak)
               ms_batch_2240          fwd+bwd ms at 16x batch (saturation
                                      probe: scaling curve vs dispatch bound)
               mfu_est_pct_batch_2240
               ms_bf16                batch-140 ms with --encoder_dtype
                                      bfloat16
               ms_bf16_2240           bfloat16 at saturation batch (native-
                                      rate MXU dots win ~1.29x there)
               mfu_est_pct_bf16_2240
               env_steps_per_sec_eht  SF6 training-rollout env-steps/s with
                                      the native EHT quantum reward through
                                      the PIPELINED host-loop transport
               env_steps_per_sec_eht_serial
                                      same through the serial host loop (the
                                      round-1 transport; the ratio is the
                                      pipelining speedup)
               env_steps_per_sec_pm6  same pipelined rollout with the native
                                      NDDO/PM6 SCF reward (reference parity
                                      backend, incl. the d shell on S)
               ms_einsum_agg          batch-140 ms through the XLA einsum
                                      aggregate (the non-default backend;
                                      the headline uses the Pallas kernel)
               auto_transport_{eht,pm6}
                                      which host-loop transport the 'auto'
                                      reward mode selects per backend
                                      (measured A/B, AutoTransportRollout)
               ms_internal_agent      fwd+bwd ms for the SchNet (internal)
                                      model family at the same batch

Baseline methodology: the reference stack (torch + cormorant + schnetpack +
torch-scatter) is not installable here and publishes no numbers (BASELINE.md),
so the baseline is a faithful torch re-implementation of the reference's
covariant hot path — relative spherical harmonics, per-level radial-gated
edge reps, CG aggregate/square contractions with identical CG tables and
identical shapes, plus backward — executed with torch on this host's CPU
(the reference's own --device=cpu mode, arg_parser.py:18). Same math, same
shapes, reference's framework.

The baseline denominator is PINNED (BASELINE_PIN_MS below): the proxy is
host-load-sensitive (16,323 ms in BENCH_r04 vs ~7,265 implied by r03 — a
2.25x swing that made vs_baseline incomparable across rounds, VERDICT r04
weak #3 / next #2). The pin is the median of 7 back-to-back idle-host runs
measured 2026-08-19 on this image (see that constant's comment for the raw
runs); `vs_baseline` divides the pin by our measurement, and the live
re-measurement is still recorded as `extra.baseline_live_ms` so drift stays
visible without contaminating the headline ratio.
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

def make_batch(rng_seed=0, batch=BATCH):
    rng = np.random.RandomState(rng_seed)
    n_atoms = rng.randint(1, CANVAS + 1, size=batch)
    elements = np.zeros((batch, CANVAS), np.int32)
    positions = np.zeros((batch, CANVAS, 3), np.float32)
    bag = np.zeros((batch, len(ZS)), np.int32)
    for b in range(batch):
        elements[b, :n_atoms[b]] = rng.randint(1, len(ZS), size=n_atoms[b])
        positions[b, :n_atoms[b]] = rng.randn(n_atoms[b], 3) * 1.2
        bag[b, 1] = rng.randint(1, 6)
        bag[b, 2] = 1
    return elements, positions, bag


def _enable_compile_cache():
    # Backend+CPU-fingerprint-keyed persistent cache (VERDICT r02 item 2).
    from molgym_tpu.tools.util import enable_compile_cache
    enable_compile_cache()


def make_agent(encoder_dtype=None):
    from molgym_tpu.agents.covariant import CovariantAC
    return CovariantAC(zs=ZS, canvas_size=CANVAS, network_width=WIDTH,
                       maxl=MAXL, num_cg_levels=NUM_LEVELS,
                       num_channels_hidden=HIDDEN,
                       num_channels_per_element=CPE, num_gaussians=3,
                       bag_scale=5, min_max_distance=(1.10, 2.10), beta=-10.0,
                       encoder_dtype=encoder_dtype)


SEED_BATCH = 10  # divides 140 and 2240
_SEED_CACHE = {}  # encoder_dtype -> (params, elements, positions, bag, acts)


def _seed_batch(encoder_dtype):
    """(params, seed obs arrays, seed actions) on the host CPU, cached.

    The op-by-op CPU init+act phase used to run at the FULL batch and
    dominated the extras budget (~90 s at batch 140, several hundred at
    2240 — BENCH_r04/r05 forensics): flax params are batch-independent and
    action VALUES affect neither the jit key nor the dense masked compute's
    timing, so one SEED_BATCH-sized init+act serves every batch size via
    tiling (obs and actions tiled TOGETHER so they stay consistent). The
    measured grad program's shapes/dtypes — and therefore its compile-cache
    key and its cost — are unchanged."""
    import jax
    import jax.numpy as jnp

    from molgym_tpu.spaces import Observation

    if encoder_dtype in _SEED_CACHE:
        return _SEED_CACHE[encoder_dtype]
    agent = make_agent(encoder_dtype)
    elements, positions, bag = make_batch(batch=SEED_BATCH)
    # init + action generation on host CPU: only the grad program pays the
    # (multi-minute, tunneled) TPU compile. The pallas aggregate kernel can't
    # compile for CPU, so force the einsum backend here — the parameter tree
    # is backend-independent.
    from molgym_tpu.ops import cg as cg_mod
    saved_backend = cg_mod.aggregate_backend()
    cg_mod.set_aggregate_backend('einsum')
    with jax.default_device(jax.devices('cpu')[0]):
        obs_cpu = Observation(elements=jnp.asarray(elements),
                              positions=jnp.asarray(positions),
                              bag=jnp.asarray(bag))
        rng = jax.random.PRNGKey(0)
        # op-by-op on purpose: jitting init+act into two CPU programs was
        # measured NOT to help (97.5 s vs 89.5 s — the one-shot CPU compile
        # costs what the op-by-op dispatch costs on this single-core host)
        params = agent.init(rng, obs_cpu, rng, method=agent.act)
        acts = np.asarray(agent.apply(params, obs_cpu, rng, False,
                                      method=agent.act).action_flat)
    cg_mod.set_aggregate_backend(saved_backend)
    out = (params, elements, positions, bag, acts)
    _SEED_CACHE[encoder_dtype] = out
    return out


def build_grad_fn(batch=BATCH, encoder_dtype=None):
    import jax
    import jax.numpy as jnp

    from molgym_tpu.spaces import Observation

    agent = make_agent(encoder_dtype)
    params, elements, positions, bag, acts = _seed_batch(encoder_dtype)
    assert batch % SEED_BATCH == 0
    reps = batch // SEED_BATCH
    dev = jax.devices()[0]
    obs = jax.device_put(Observation(
        elements=jnp.asarray(np.tile(elements, (reps, 1))),
        positions=jnp.asarray(np.tile(positions, (reps, 1, 1))),
        bag=jnp.asarray(np.tile(bag, (reps, 1)))), dev)
    params = jax.device_put(params, dev)
    actions = jax.device_put(jnp.asarray(np.tile(acts, (reps, 1))), dev)

    def loss_fn(p):
        logp, ent, v = agent.apply(p, obs, actions, method=agent.evaluate)
        # PPO-shaped scalar: policy + value + entropy terms all contribute
        return jnp.mean(logp) + 0.5 * jnp.mean(jnp.square(v)) + 0.01 * jnp.mean(ent)

    return jax.jit(jax.grad(loss_fn)), params


def build_internal_grad_fn():
    """Grad program for the second model family (reference ICML-2020 SchNet
    agent) at the same SF6 minibatch — shared between the ms_internal_agent
    extra and scripts/warm_bench_cache.py so the warm and the measurement
    produce the same jit key."""
    import jax
    import jax.numpy as jnp

    from molgym_tpu.agents.schnet import make_schnet_agent
    from molgym_tpu.spaces import Observation
    agent = make_schnet_agent(num_zs=len(ZS), canvas_size=CANVAS,
                              network_width=WIDTH,
                              min_max_distance=(1.10, 2.10),
                              n_interactions=3)
    elements, positions, bag = make_batch()
    with jax.default_device(jax.devices('cpu')[0]):
        obs_cpu = Observation(elements=jnp.asarray(elements),
                              positions=jnp.asarray(positions),
                              bag=jnp.asarray(bag))
        rng = jax.random.PRNGKey(0)
        params = agent.init(rng, obs_cpu, rng, method=agent.act)
        actions = agent.apply(params, obs_cpu, rng, False,
                              method=agent.act).action_flat
    dev = jax.devices()[0]
    obs = jax.device_put(obs_cpu, dev)
    params = jax.device_put(params, dev)
    actions = jax.device_put(actions, dev)

    def loss_fn(p):
        logp, ent, v = agent.apply(p, obs, actions,
                                   method=agent.evaluate)
        return (jnp.mean(logp) + 0.5 * jnp.mean(jnp.square(v))
                + 0.01 * jnp.mean(ent))

    return jax.jit(jax.grad(loss_fn)), params


LAST_COMPILE_S = 0.0  # first-call (compile+warmup) time of the last time_grad


def time_grad(grad_fn, params, iters=30):
    import jax
    global LAST_COMPILE_S
    start = time.perf_counter()
    g = grad_fn(params)
    jax.block_until_ready(g)  # compile + warmup
    LAST_COMPILE_S = time.perf_counter() - start
    g = grad_fn(params)
    jax.block_until_ready(g)
    start = time.perf_counter()
    for _ in range(iters):
        g = grad_fn(params)
    jax.block_until_ready(g)
    return (time.perf_counter() - start) / iters * 1000.0


def hlo_flops(grad_fn, params):
    """Host-side HLO flop count (pre-optimization); lowered for CPU because
    the tunneled TPU plugin returns None from cost_analysis. The Pallas
    kernels cannot lower for CPU, so the fallback lowers the einsum-backend
    equivalent (same math, backend-independent flops)."""
    import jax

    from molgym_tpu.ops import cg as cg_mod
    ca = grad_fn.lower(params).cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    if ca is None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
        saved = cg_mod.aggregate_backend()
        cg_mod.set_aggregate_backend('einsum')
        try:
            with jax.default_device(jax.devices('cpu')[0]):
                ca = grad_fn.lower(abstract).cost_analysis() or {}
        finally:
            cg_mod.set_aggregate_backend(saved)
    return float(ca.get('flops', 0.0))


PEAK_FLOPS = 197e12  # TPU v5e bf16 peak (XLA multiplies f32 in bf16 passes)


def bench_ours(iters=30):
    import jax

    import os

    from molgym_tpu.tools.util import enable_compile_cache
    cache_dir = enable_compile_cache()
    try:  # count BEFORE the headline compile adds its own entry
        entries = len(os.listdir(cache_dir)) if cache_dir else 0
    except OSError:
        entries = -1
    grad_fn, params = build_grad_fn()
    ms = time_grad(grad_fn, params, iters)
    log(f'ours: {ms:.2f} ms/minibatch on {jax.devices()[0]}')
    return ms, grad_fn, params, cache_dir, entries


def bench_env_steps_qm(pipelined: bool, method: str = 'EHT', reps: int = 3):
    """SF6 training-rollout throughput (env-steps/s) with a native quantum
    reward (EHT or PM6) through the host-loop transport (the configuration
    of experiments/sf6_eht / sf6_pm6: 10 envs, 140 steps per iteration)."""
    import jax
    import numpy as np_

    from molgym_tpu.calculators.native import (METHOD_EHT, METHOD_PM6,
                                               NativeBatchCalculator)
    from molgym_tpu.envs.environment import MolecularEnv
    from molgym_tpu.envs.reward import make_lennard_jones_reward
    from molgym_tpu.formula import string_to_formula
    from molgym_tpu.rl.rollout import (make_host_loop_rollout_fn,
                                       make_pipelined_host_rollout_fn)
    from molgym_tpu.spaces import ObservationSpace

    num_envs, steps_per_env = 10, 14  # 140 env steps per iteration
    space = ObservationSpace(canvas_size=CANVAS, zs=list(ZS))
    env = MolecularEnv(
        reward_fn=make_lennard_jones_reward(),  # unused by host-loop path
        observation_space=space,
        formulas=np_.stack([space.bag_from_formula(string_to_formula('SF6'))]))
    agent = make_agent()
    calc = NativeBatchCalculator(
        method={'EHT': METHOD_EHT, 'PM6': METHOD_PM6}[method])

    make = (make_pipelined_host_rollout_fn if pipelined
            else make_host_loop_rollout_fn)
    rollout = make(env, agent, calc, steps_per_env)

    rng = jax.random.PRNGKey(0)
    states = env.init_states(rng, num_envs)
    params = agent.init(rng, states.observation(), rng, method=agent.act)

    _, traj = rollout(params, states, rng)  # compile + warmup
    jax.block_until_ready(traj.rewards)
    best = float('inf')
    for rep in range(reps):
        # fresh rollout rng per rep: identical keys would be 100% hits in
        # the host energy cache, which is not the training access pattern
        rep_rng = jax.random.fold_in(rng, rep + 1)
        start = time.perf_counter()
        _, traj = rollout(params, states, rep_rng)
        jax.block_until_ready(traj.rewards)
        best = min(best, time.perf_counter() - start)
    sps = num_envs * steps_per_env / best
    log(f'{method} env-steps/s ({"pipelined" if pipelined else "serial"}): '
        f'{sps:.1f}')
    return sps


def bench_auto_transport(method: str = 'EHT') -> str:
    """Which transport the 'auto' host-reward mode selects for this reward
    backend (AutoTransportRollout measured A/B: serial tends to win for
    cheap cached EHT, pipelined for PM6 SCF)."""
    import jax
    import numpy as np_

    from molgym_tpu.calculators.native import (METHOD_EHT, METHOD_PM6,
                                               NativeBatchCalculator)
    from molgym_tpu.envs.environment import MolecularEnv
    from molgym_tpu.envs.reward import make_lennard_jones_reward
    from molgym_tpu.formula import string_to_formula
    from molgym_tpu.rl.rollout import make_auto_host_rollout_fn
    from molgym_tpu.spaces import ObservationSpace

    num_envs, steps_per_env = 10, 14
    space = ObservationSpace(canvas_size=CANVAS, zs=list(ZS))
    env = MolecularEnv(
        reward_fn=make_lennard_jones_reward(),
        observation_space=space,
        formulas=np_.stack([space.bag_from_formula(string_to_formula('SF6'))]))
    agent = make_agent()
    calc = NativeBatchCalculator(
        method={'EHT': METHOD_EHT, 'PM6': METHOD_PM6}[method])
    rollout = make_auto_host_rollout_fn(env, agent, calc, steps_per_env)

    rng = jax.random.PRNGKey(0)
    states = env.init_states(rng, num_envs)
    params = agent.init(rng, states.observation(), rng, method=agent.act)
    i = 0
    while rollout.choice is None and i < 8:
        _, traj = rollout(params, states, jax.random.fold_in(rng, i))
        jax.block_until_ready(traj.rewards)
        i += 1
    log(f'auto transport for {method}: {rollout.choice}')
    return rollout.choice


def collect_extras(headline, grad_fn140, params140, ms140, deadline,
                   compile_s):
    """Secondary metrics. Non-flagship extras carry a conservative wall-clock
    estimate scaled by the HEADLINE's observed compile time (warm persistent
    cache => seconds; cold tunneled-TPU compile => minutes) and are skipped
    when the remaining budget cannot cover it. The three FLAGSHIP extras
    (mfu_est_pct, env_steps_per_sec_pm6, ms_bf16_2240 — the north-star
    metrics of BASELINE.json) run UNCONDITIONALLY, deadline or not: four
    rounds of BENCH history show the deadline guard produces empty records
    under a cold cache (r01 no extras, r02 rc=124, r03 PM6 skipped, r04
    everything skipped), and the driver tolerates overrun (r04: rc=0 at
    -465 s). The full record is re-printed to stdout after every completed
    extra, so a kill mid-extras loses only the unfinished ones."""
    extras = headline['extra']
    skipped = []
    # A fresh program shape costs about one headline compile; never assume
    # less than 30 s for the tunneled-TPU round trips.
    c = max(compile_s, 30.0)

    def emit():
        extras['skipped'] = skipped
        print(json.dumps(headline), flush=True)

    def guard(name, fn, est_s, flagship=False):
        remaining = deadline - time.time()
        if not flagship and remaining < est_s:
            log(f'extra {name}: skipped (est {est_s:.0f}s > '
                f'remaining {remaining:.0f}s)')
            skipped.append(name)
            return
        if flagship and remaining < est_s:
            log(f'extra {name}: flagship, running despite overrun '
                f'(est {est_s:.0f}s > remaining {remaining:.0f}s)')
        try:
            extras[name] = fn()
        except Exception as exc:
            log(f'extra {name} failed: {exc!r}')
        emit()

    def mfu140():
        flops = hlo_flops(grad_fn140, params140)
        return round(flops / (ms140 / 1e3) / PEAK_FLOPS * 100, 4)

    def batch_2240():
        grad_fn, params = build_grad_fn(batch=2240)
        ms = time_grad(grad_fn, params, iters=10)
        extras['mfu_est_pct_batch_2240'] = round(
            hlo_flops(grad_fn, params) / (ms / 1e3) / PEAK_FLOPS * 100, 4)
        return round(ms, 3)

    def bf16():
        grad_fn, params = build_grad_fn(encoder_dtype='bfloat16')
        return round(time_grad(grad_fn, params), 3)

    def bf16_2240():
        # bf16 at saturation batch: the kernels feed bf16 dot inputs at the
        # MXU's native rate (f32 accumulation), which wins ~1.29x where the
        # step is table-contraction-bound (measured 95.5 vs 122.7 ms f32,
        # ~23% MFU — experiments/perf/README.md round 4)
        grad_fn, params = build_grad_fn(batch=2240,
                                        encoder_dtype='bfloat16')
        ms = time_grad(grad_fn, params, iters=10)
        extras['mfu_est_pct_bf16_2240'] = round(
            hlo_flops(grad_fn, params) / (ms / 1e3) / PEAK_FLOPS * 100, 4)
        return round(ms, 3)

    def internal_agent():
        # second model family (reference ICML-2020 SchNet agent): fwd+bwd
        # per SF6 minibatch through the batched cfconv SchNet encoder
        grad_fn, params = build_internal_grad_fn()
        return round(time_grad(grad_fn, params), 3)

    def einsum_agg():
        # the default aggregate backend is the fused Pallas kernel on TPU
        # (ops/cg.py 'auto'); this times the XLA einsum path for comparison
        from molgym_tpu.ops.cg import set_aggregate_backend
        set_aggregate_backend('einsum')
        try:
            grad_fn, params = build_grad_fn()
            return round(time_grad(grad_fn, params), 3)
        finally:
            set_aggregate_backend('auto')

    # Headline robustness + forensic markers first (free): was the persistent
    # cache warm for the headline program, how many entries the cache dir
    # held when the run started (one-look forensics for a cold capture,
    # VERDICT r04 next #1c), and what an immediate re-measurement of the SAME
    # compiled program reads (host-load variance is ~1 ms on the tunneled
    # chip — VERDICT r03 weak #3 / next #8).
    extras['cache_warm'] = bool(compile_s < 10.0)
    extras['headline_compile_s'] = round(compile_s, 1)
    try:
        extras['ms_headline_rerun'] = round(
            time_grad(grad_fn140, params140, iters=30), 3)
    except Exception as exc:
        log(f'headline rerun failed: {exc!r}')
    emit()

    # FLAGSHIP extras run first and unconditionally (north-star metrics):
    # mfu_est_pct needs no TPU compile at all (CPU lowering); the host-QM
    # reward pipeline (SURVEY §7 hard-part 3) and the native-rate bf16
    # saturation point are the two headline architecture claims.
    guard('mfu_est_pct', mfu140, est_s=120, flagship=True)
    guard('env_steps_per_sec_pm6',
          lambda: round(bench_env_steps_qm(True, 'PM6'), 1),
          est_s=c + 120, flagship=True)
    guard('ms_bf16_2240', bf16_2240, est_s=2 * c + 120, flagship=True)
    # live torch proxy re-measurement (vs the pinned denominator): host-load
    # drift marker, ~70 s of pure CPU
    guard('baseline_live_ms', lambda: round(bench_torch_baseline(), 1),
          est_s=90, flagship=True)
    # Deadline-guarded secondaries. The rollout TPU programs are
    # backend-agnostic (the QM happens host-side), so EHT/auto reuse the
    # PM6 compiles from the flagship pass.
    guard('auto_transport_pm6', lambda: bench_auto_transport('PM6'),
          est_s=c + 90)  # compiles the serial program; A/B reps are cheap
    guard('env_steps_per_sec_eht',
          lambda: round(bench_env_steps_qm(True, 'EHT'), 1), est_s=60)
    guard('env_steps_per_sec_eht_serial',
          lambda: round(bench_env_steps_qm(False, 'EHT'), 1), est_s=60)
    guard('auto_transport_eht', lambda: bench_auto_transport('EHT'),
          est_s=90)
    guard('ms_bf16', bf16, est_s=c + 60)
    guard('ms_internal_agent', internal_agent, est_s=c + 60)
    guard('ms_einsum_agg', einsum_agg, est_s=c + 60)
    guard('ms_batch_2240', batch_2240, est_s=2 * c + 120)
    return extras


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


# Pinned torch-CPU baseline denominator (VERDICT r04 next #2): median of 7
# back-to-back idle-host runs of bench_torch_baseline() on this image,
# 2026-08-19: [7318.9, 7661.3, 7830.7, 7986.2, 8260.3, 8691.2, 9582.4] ms
# (also recorded in experiments/perf/README.md "Pinned baseline").
# vs_baseline is comparable across rounds by construction from r05 on; the
# live proxy is still re-measured into extra.baseline_live_ms so drift stays
# visible without contaminating the headline ratio.
BASELINE_PIN_MS = 7986.2


def main():
    import os
    started = time.time()
    deadline = started + float(os.environ.get('MOLGYM_BENCH_BUDGET_S', 900))
    ours_ms, grad_fn, params, cache_dir, cache_entries = bench_ours()
    compile_s = LAST_COMPILE_S
    headline = {
        'metric': 'sf6_covariant_fwdbwd_ms_per_minibatch',
        'value': round(ours_ms, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_PIN_MS / ours_ms, 3),
        'extra': {
            'baseline_pin_ms': BASELINE_PIN_MS,
            'bench_started_unix': int(started),
            'cache_dir': cache_dir,
            'cache_entries_at_start': cache_entries,
            # Host-load forensics (VERDICT r04 weak #4): ±1.6 ms of the
            # headline spread across rounds tracks host-side dispatch
            # contention, not kernel changes. 1-min load average at the
            # moment the headline was measured makes that one-look.
            'load_avg_1m': round(os.getloadavg()[0], 2),
        },
    }
    # Print the headline NOW: extras must never be able to lose the number.
    print(json.dumps(headline), flush=True)

    collect_extras(headline, grad_fn, params, ours_ms, deadline, compile_s)
    # Final stdout line carries the full record; first-line and last-line
    # parsers both get a valid JSON object.
    print(json.dumps(headline), flush=True)


if __name__ == '__main__':
    main()
