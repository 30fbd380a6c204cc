"""Where does the cold headline compile go? (VERDICT r04 next #4)

Times lower() and compile() of the batch-140 grad program separately, per
contraction backend, with an optional pass-level HLO dump whose file mtimes
give a compiler-pass timeline. Run each mode in a fresh process:

    python experiments/perf/compile_timing.py pallas
    python experiments/perf/compile_timing.py einsum
    python experiments/perf/compile_timing.py pallas --dump /tmp/xdump

No persistent cache is enabled — this measures the true cold compile.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('mode', choices=['pallas', 'einsum'])
    ap.add_argument('--dump', default=None,
                    help='xla_dump_to dir (adds pass-level dumps)')
    ap.add_argument('--batch', type=int, default=None)
    ap.add_argument('--perturb', action='store_true',
                    help='tweak a loss constant so the HLO differs from any '
                         'previously-compiled program — distinguishes a '
                         'remote-compiler cache hit from a true cold compile')
    args = ap.parse_args()

    if args.dump:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            f' --xla_dump_to={args.dump} --xla_dump_hlo_pass_re=.*')

    import bench
    from molgym_tpu.ops import cg as cg_mod

    if args.mode == 'einsum':
        cg_mod.set_aggregate_backend('einsum')
        cg_mod.set_square_backend('einsum')

    t0 = time.time()
    kwargs = {} if args.batch is None else {'batch': args.batch}
    grad_fn, params = bench.build_grad_fn(**kwargs)
    print(f'build+init: {time.time() - t0:.1f}s', flush=True)

    if args.perturb:
        import jax
        import jax.numpy as jnp
        inner = grad_fn  # inner jit inlines under the outer trace; the tiny
        # trailing multiplies make the HLO differ from any prior program
        grad_fn = jax.jit(lambda p: jax.tree.map(
            lambda g: g * jnp.float32(1.0000001), inner(p)))

    t0 = time.time()
    lowered = grad_fn.lower(params)
    print(f'lower: {time.time() - t0:.1f}s', flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    print(f'compile: {time.time() - t0:.1f}s', flush=True)

    import jax
    t0 = time.time()
    out = compiled(params)
    jax.block_until_ready(out)
    print(f'first-exec: {time.time() - t0:.1f}s', flush=True)


if __name__ == '__main__':
    main()
