"""Reproduce the invocation-structure-dependent compile-cache keys — and
verify the MOLGYM_STABLE_CACHE_KEYS fix.

The persistent-cache key jax computes for a program hashes a canonicalized
(strip-debuginfo) serialization of the lowered StableHLO module. Pallas/
Mosaic kernels, however, ride inside `stablehlo.custom_call @tpu_custom_call`
as a *serialized inner MLIR module* (backend_config) whose own location info
— including up to 10 CALLER frames (jax default
`jax_include_full_tracebacks_in_locations=True`) — the outer strip pass
cannot reach. Result: the same program traced from different top-level
scripts (or through an extra wrapper frame) hashes to different keys, so a
"warmed" cache misses for any differently-launched process. See the
"Why warmed cache keys kept missing" section of README.md for the full
forensics (reference has no counterpart — its CUDA path has no compile
cache; this is a TPU/XLA-stack failure mode).

Usage (each run prints one line; needs the TPU backend for Mosaic lowering,
but only LOWERS — no compile, no cache writes):

    python experiments/perf/key_stability_probe.py            # style A
    python - <<'EOF'                                          # style B
    import runpy
    def wrapper_frame():
        runpy.run_path('experiments/perf/key_stability_probe.py',
                       run_name='__main__')
    wrapper_frame()
    EOF

Default env: the two hashes DIFFER (the bug). With MOLGYM_STABLE_CACHE_KEYS=1
exported for both: identical hashes (verified 2026-08-20: f189f54b10267fc6
from both styles; without the flag, 862b188ea132bf26 vs cb445583a770b2fb).
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax

if os.environ.get('MOLGYM_STABLE_CACHE_KEYS', '0') == '1':
    jax.config.update('jax_include_full_tracebacks_in_locations', False)

import bench  # noqa: E402


def main():
    import jax._src.cache_key as ck  # the canonicalization under test
    grad_fn, params = bench.build_grad_fn()
    lowered = grad_fn.lower(params)
    m = lowered.compiler_ir('stablehlo')
    canon = ck._canonicalize_ir(m, ck.IgnoreCallbacks.NO)
    print('canon-ir sha:', hashlib.sha256(canon).hexdigest()[:16],
          'len', len(canon), flush=True)


if __name__ == '__main__':
    main()
