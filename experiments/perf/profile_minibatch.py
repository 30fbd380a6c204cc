"""Perf deep-dive on the SF6 covariant fwd+bwd minibatch step (VERDICT #3).

Answers three questions the round-1 bench left open:
  1. Where does the per-minibatch time go?  (device-op breakdown parsed from a
     jax.profiler trace — no TensorBoard needed)
  2. Is batch 140 dispatch/latency-bound?   (batch-size sweep 140 -> 4480)
  3. What is the MXU utilization?           (XLA cost-analysis FLOPs / time
     against the chip's peak)

Usage:  python experiments/perf/profile_minibatch.py [--sweep] [--trace]
                                                      [--dtype f32|bf16]
Writes its findings to stdout; run on the real TPU (default platform).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

CANVAS = 7
ZS = (0, 9, 16)  # X, F, S
MAXL = 4
NUM_LEVELS = 3
HIDDEN = 10
CPE = 4
WIDTH = 128

# TPU v5e (lite) peak: 197 TFLOP/s bf16 on the MXU; XLA's default matmul
# precision on TPU multiplies f32 operands in bf16 passes, so one peak number
# serves both dtypes for an MFU *estimate*.
PEAK_FLOPS = 197e12


def log(*a):
    print(*a, flush=True)


def make_batch(batch, rng_seed=0):
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


def build_grad_fn(batch, encoder_dtype=None):
    import jax
    import jax.numpy as jnp

    from molgym_tpu.agents.covariant import CovariantAC
    from molgym_tpu.spaces import Observation

    agent = CovariantAC(zs=ZS, canvas_size=CANVAS, network_width=WIDTH,
                        maxl=MAXL, num_cg_levels=NUM_LEVELS,
                        num_channels_hidden=HIDDEN,
                        num_channels_per_element=CPE, num_gaussians=3,
                        bag_scale=5, min_max_distance=(1.10, 2.10), beta=-10.0,
                        encoder_dtype=encoder_dtype)
    elements, positions, bag = make_batch(batch)
    # init + action generation on host CPU: only the grad program pays the
    # (multi-minute, tunneled) TPU compile. The pallas aggregate kernel can't
    # compile for CPU, so force the einsum backend here — the parameter tree
    # is backend-independent.
    from molgym_tpu.ops import cg as cg_mod
    saved_backend = cg_mod.aggregate_backend()
    saved_cg = cg_mod._CG_BACKEND
    saved_sq = cg_mod._SQUARE_BACKEND
    cg_mod.set_aggregate_backend('einsum')
    cg_mod.set_cg_backend('einsum')
    cg_mod.set_square_backend('einsum')
    with jax.default_device(jax.devices('cpu')[0]):
        obs_cpu = Observation(elements=jnp.asarray(elements),
                              positions=jnp.asarray(positions),
                              bag=jnp.asarray(bag))
        rng = jax.random.PRNGKey(0)
        params = agent.init(rng, obs_cpu, rng, method=agent.act)
        actions = agent.apply(params, obs_cpu, rng, False,
                              method=agent.act).action_flat
    cg_mod.set_aggregate_backend(saved_backend)
    cg_mod.set_cg_backend(saved_cg)
    cg_mod.set_square_backend(saved_sq)
    dev = jax.devices()[0]
    obs = jax.device_put(obs_cpu, dev)
    params = jax.device_put(params, dev)
    actions = jax.device_put(actions, dev)

    def loss_fn(p):
        logp, ent, v = agent.apply(p, obs, actions, method=agent.evaluate)
        return jnp.mean(logp) + 0.5 * jnp.mean(jnp.square(v)) + 0.01 * jnp.mean(ent)

    return jax.jit(jax.grad(loss_fn)), params


def timed(grad_fn, params, iters=30):
    import jax
    g = grad_fn(params)
    jax.block_until_ready(g)
    g = grad_fn(params)
    jax.block_until_ready(g)
    start = time.perf_counter()
    for _ in range(iters):
        g = grad_fn(params)
    jax.block_until_ready(g)
    return (time.perf_counter() - start) / iters * 1000.0


def cost_flops(grad_fn, params):
    # Host-side HLO cost analysis (pre-optimization): no device compile, so
    # the sweep doesn't pay a second multi-minute tunnel compile per shape.
    # Some PJRT plugins (the tunneled TPU backend) return None here — fall
    # back to a CPU lowering of the same function for the FLOP count. The
    # Pallas kernels cannot lower for CPU, so the fallback lowers the
    # einsum-backend equivalent (same math, backend-independent flops).
    ca = grad_fn.lower(params).cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    if ca is None:
        import jax

        from molgym_tpu.ops import cg as cg_mod
        cpu = jax.devices('cpu')[0]
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
        saved = cg_mod.aggregate_backend()
        cg_mod.set_aggregate_backend('einsum')
        try:
            with jax.default_device(cpu):
                ca = grad_fn.lower(abstract).cost_analysis() or {}
        finally:
            cg_mod.set_aggregate_backend(saved)
    return float(ca.get('flops', 0.0)), {
        k: v for k, v in ca.items()
        if isinstance(v, float) and ('bytes accessed' == k or k == 'flops')}


def run_sweep(dtype):
    import jax
    log(f'device: {jax.devices()[0]}, dtype={dtype}')
    log(f'{"batch":>6} {"ms":>8} {"flops":>12} {"GFLOP/s":>10} '
        f'{"MFU%":>7} {"ms/140rows":>11}')
    rows = []
    # 4480 exhausts HBM on this chip (lane-padded edge/backward intermediates
    # at 32x the canonical batch); 2240 already shows the scaling trend.
    for batch in (140, 560, 2240):
        grad_fn, params = build_grad_fn(batch)
        ms = timed(grad_fn, params)
        flops, _ = cost_flops(grad_fn, params)
        gflops = flops / (ms / 1e3) / 1e9
        mfu = flops / (ms / 1e3) / PEAK_FLOPS * 100
        log(f'{batch:>6} {ms:>8.2f} {flops:>12.3e} {gflops:>10.1f} '
            f'{mfu:>7.3f} {ms / (batch / 140):>11.3f}')
        rows.append(dict(batch=batch, ms=round(ms, 3), flops=flops,
                         mfu_pct=round(mfu, 4)))
    log(json.dumps(rows))
    return rows


def run_trace(batch):
    import jax
    trace_dir = '/tmp/molgym_prof'
    os.system(f'rm -rf {trace_dir}')
    grad_fn, params = build_grad_fn(batch)
    g = grad_fn(params)
    jax.block_until_ready(g)
    with jax.profiler.trace(trace_dir):
        for _ in range(20):
            g = grad_fn(params)
        jax.block_until_ready(g)
    summarize_trace(trace_dir, iters=20)


def summarize_trace(trace_dir, iters):
    paths = glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True)
    if not paths:
        log('no trace file found')
        return
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # Identify device (TensorCore) process ids by name, then the leaf-op
    # thread ("XLA Ops") within them — module/step tracks overlap the ops.
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'
                 and 'args' in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if 'TPU' in name or 'Tensor' in name.lower()
                   or '/device' in name}
    tid_names = {(e['pid'], e['tid']): e['args'].get('name', '')
                 for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'thread_name'
                 and 'args' in e}
    log(f'\ndevice tracks: '
        f'{sorted(v for (p, _t), v in tid_names.items() if p in device_pids)}')
    op_tids = {key for key, name in tid_names.items()
               if key[0] in device_pids and 'op' in name.lower()}

    def aggregate(keep):
        op_time, op_count, total = collections.Counter(), collections.Counter(), 0.0
        for e in events:
            if e.get('ph') != 'X' or not keep(e):
                continue
            name, dur = e.get('name', '?'), e.get('dur', 0)
            op_time[name] += dur
            op_count[name] += 1
            total += dur
        return op_time, op_count, total

    op_time, op_count, total = aggregate(
        lambda e: (e.get('pid'), e.get('tid')) in op_tids)
    if not total:  # fallback: everything on device pids
        op_time, op_count, total = aggregate(
            lambda e: e.get('pid') in device_pids)
    log(f'total device op time: {total / iters / 1000:.3f} ms per step '
        f'(x{iters} steps traced)')
    log(f'{"us/step":>9} {"pct":>6} {"calls":>6}  op')
    for name, dur in op_time.most_common(40):
        log(f'{dur / iters:>9.1f} {100 * dur / total:>5.1f}% '
            f'{op_count[name] // iters:>6}  {name[:110]}')
    # category rollup by HLO opcode prefix
    cat = collections.Counter()
    for name, dur in op_time.items():
        cat[name.split('.')[0].split('(')[0]] += dur
    log('\ncategory rollup:')
    for name, dur in cat.most_common(20):
        log(f'{dur / iters:>9.1f} {100 * dur / total:>5.1f}%  {name}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sweep', action='store_true')
    ap.add_argument('--trace', action='store_true')
    ap.add_argument('--batch', type=int, default=140)
    ap.add_argument('--agg', choices=['einsum', 'pallas'], default='einsum',
                    help='backend for the fused edge aggregate')
    ap.add_argument('--dtype', choices=['f32', 'bf16'], default='f32',
                    help='encoder compute dtype')
    ap.add_argument('--cg', choices=['einsum', 'pallas'], default='einsum',
                    help='backend for the elementwise CG product')
    ap.add_argument('--square', choices=['auto', 'einsum', 'pallas'],
                    default='auto',
                    help="backend for the level CG square ('auto' follows "
                         '--agg)')
    args = ap.parse_args()
    if args.agg != 'einsum':
        from molgym_tpu.ops.cg import set_aggregate_backend
        set_aggregate_backend(args.agg)
    if args.cg != 'einsum':
        from molgym_tpu.ops.cg import set_cg_backend
        set_cg_backend(args.cg)
    if args.square != 'auto':
        from molgym_tpu.ops.cg import set_square_backend
        set_square_backend(args.square)

    from molgym_tpu.tools.util import enable_compile_cache
    enable_compile_cache()

    if args.sweep:
        run_sweep('f32')
    if args.trace:
        run_trace(args.batch)
    if not (args.sweep or args.trace):
        dt = 'bfloat16' if args.dtype == 'bf16' else None
        grad_fn, params = build_grad_fn(args.batch, encoder_dtype=dt)
        ms = timed(grad_fn, params)
        log(f'batch {args.batch}: {ms:.2f} ms')
        flops, extras = cost_flops(grad_fn, params)
        log(f'flops={flops:.3e}, '
            f'MFU≈{flops / (ms / 1e3) / PEAK_FLOPS * 100:.3f}% {extras}')


if __name__ == '__main__':
    main()
