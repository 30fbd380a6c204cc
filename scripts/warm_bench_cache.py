"""Warm the persistent XLA compile cache with EXACTLY the programs bench.py
runs (same jit keys), so the driver's end-of-round `python bench.py` hits a
warm cache no matter when it fires (VERDICT r04 next #1a).

Warming MUST go through bench.py's own builders — warming via
experiments/perf/profile_minibatch.py or hand-rolled equivalents produced a
cache entry whose key did NOT match the driver's run in round 4 (forensics in
VERDICT r04). This script therefore imports bench and calls the same
build_grad_fn / rollout constructors with the same arguments.

Protocol (documented in README.md and ROADMAP.md): running

    python scripts/warm_bench_cache.py && python bench.py

and verifying the final JSON line's extras are non-empty is the LAST action
of every build session, re-triggered by any later commit touching
molgym_tpu/{ops,agents,rl,envs,distributions} or bench.py.

KNOWN LIMIT (round-5 forensics, experiments/perf/README.md): cache keys are
invocation-structure-dependent for Pallas programs — Mosaic kernels embed
caller stack frames in a serialized blob the key canonicalization cannot
strip — so entries written by THIS script's process never match a
`python bench.py` process. This script still matters: it pays the XLA
server-side compile once, so the follow-up bench.py run's misses recompile
in tens of seconds and write the entries the driver's identical invocation
then hits. MOLGYM_STABLE_CACHE_KEYS=1 (opt-in) removes the caller frames
and makes keys invocation-independent.

Default warms the headline + flagship-extra programs; --all adds every
deadline-guarded extra's program too.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, '.')

import bench  # noqa: E402


def _warm(name, fn):
    start = time.perf_counter()
    fn()
    wall = time.perf_counter() - start
    compile_s = bench.LAST_COMPILE_S
    print(f'warmed {name}: {wall:.1f}s wall '
          f'(last headline-style compile {compile_s:.1f}s)', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--all', action='store_true',
                    help='also warm every deadline-guarded extra program')
    args = ap.parse_args()

    from molgym_tpu.tools.util import enable_compile_cache
    cache_dir = enable_compile_cache()
    print(f'cache dir: {cache_dir}', flush=True)

    # headline: batch-140 f32 grad program
    def headline():
        grad_fn, params = bench.build_grad_fn()
        bench.time_grad(grad_fn, params, iters=1)
    _warm('headline (batch 140 f32)', headline)

    # flagship extras --------------------------------------------------------
    # env_steps_per_sec_pm6: the pipelined host-loop rollout programs
    _warm('pm6 pipelined rollout',
          lambda: bench.bench_env_steps_qm(True, 'PM6', reps=1))

    # ms_bf16_2240: saturation-batch bf16 grad program
    def bf16_2240():
        grad_fn, params = bench.build_grad_fn(batch=2240,
                                              encoder_dtype='bfloat16')
        bench.time_grad(grad_fn, params, iters=1)
    _warm('bf16 batch 2240', bf16_2240)

    if args.all:
        # auto_transport compiles the serial rollout program (EHT reuses the
        # PM6 compiles — the TPU programs are reward-backend-agnostic)
        _warm('serial rollout', lambda: bench.bench_env_steps_qm(
            False, 'PM6', reps=1))

        def bf16_140():
            grad_fn, params = bench.build_grad_fn(encoder_dtype='bfloat16')
            bench.time_grad(grad_fn, params, iters=1)
        _warm('bf16 batch 140', bf16_140)

        def f32_2240():
            grad_fn, params = bench.build_grad_fn(batch=2240)
            bench.time_grad(grad_fn, params, iters=1)
        _warm('f32 batch 2240', f32_2240)

        def einsum_agg():
            from molgym_tpu.ops.cg import set_aggregate_backend
            set_aggregate_backend('einsum')
            try:
                grad_fn, params = bench.build_grad_fn()
                bench.time_grad(grad_fn, params, iters=1)
            finally:
                set_aggregate_backend('auto')
        _warm('einsum aggregate (batch 140)', einsum_agg)

        def internal():
            grad_fn, params = bench.build_internal_grad_fn()
            bench.time_grad(grad_fn, params, iters=1)
        _warm('internal (schnet) agent', internal)

    print('warm_bench_cache: done', flush=True)


if __name__ == '__main__':
    main()
