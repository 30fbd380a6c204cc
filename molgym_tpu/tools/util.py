"""Host-side utility toolbox: logging, artifact savers, config snapshots.

Same artifact formats as the reference so its offline analysis layer keeps
working (reference molgym/tools/util.py:105-183): JSON-lines metric streams
named `{tag}_{train|opt|eval}.txt`, pickled rollouts named
`{tag}_steps-{n}_{info}.pkl`, run tag `{name}_run-{seed}`, per-run JSON config
snapshot and a stream+file logger.
"""
from __future__ import annotations

import json
import logging
import os
import pickle
import sys
from typing import List, Optional

import numpy as np


def enable_compile_cache() -> str:
    """Enable the persistent XLA compilation cache, keyed by backend + host
    CPU fingerprint. Returns the cache directory ('' if disabled).

    XLA:CPU cache entries embed AOT machine code for the compile host's exact
    CPU features; loading them on a different host triggers
    cpu_aot_loader.cc feature-mismatch errors (at worst SIGILL). Keying the
    directory by a CPU-feature hash keeps same-host reruns warm while making
    cross-machine reuse impossible.

    On the CPU backend the persistent cache is DISABLED entirely: XLA bakes
    tuning preferences (+prefer-no-scatter/+prefer-no-gather) into the AOT
    entry's target-feature list, and cpu_aot_loader's host check compares
    them against /proc/cpuinfo — so every reload, even same-machine, logs a
    scary feature-mismatch error (verified empirically: fresh dir, same
    process re-run). CPU compiles are local and fast; clean stderr is worth
    more than the warm start. Set MOLGYM_TPU_XLA_CACHE_CPU=1 to force it on.

    Even on the TPU backend, CPU-platform executables slip into the cache:
    bench/driver code deliberately jits small init/action-gen programs on the
    host CPU platform to avoid tunneled TPU compiles, and any such program
    whose compile exceeded the min-compile-time floor was written as a CPU
    AOT entry — whose reload then logs the same pseudo-feature mismatch (seen
    throughout BENCH_r02's stderr). Fix: set the floor to 10 s, well above
    any local CPU compile but far below the multi-minute tunneled TPU
    compiles this cache exists for, and version the directory key ('p2') so
    stale CPU entries from the old policy are never re-read.
    """
    import hashlib
    import platform

    import jax
    if (jax.default_backend() == 'cpu'
            and os.environ.get('MOLGYM_TPU_XLA_CACHE_CPU', '0') != '1'):
        return ''
    try:
        with open('/proc/cpuinfo') as fh:
            flags = next((ln for ln in fh if ln.startswith('flags')), '')
    except OSError:
        flags = ''
    fp = hashlib.sha1((platform.machine() + flags).encode()).hexdigest()[:10]
    # Default under $HOME, not /tmp: /tmp is wiped between sessions on this
    # image (observed 2026-08-18: every tunneled-TPU program went back to a
    # multi-minute fresh compile), while the home volume persists with the
    # repo. The machine fingerprint in the dir name keeps a restored home on
    # different hardware from replaying foreign AOT entries.
    default_base = os.path.join(
        os.environ.get('XDG_CACHE_HOME', os.path.expanduser('~/.cache')),
        'molgym_tpu_xla_cache')
    base = os.environ.get('MOLGYM_TPU_XLA_CACHE', default_base)
    cache_dir = f'{base}_{jax.default_backend()}_{fp}_p2'
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
    # Cache keys are INVOCATION-STRUCTURE-DEPENDENT by default: Pallas/Mosaic
    # kernels are embedded in the HLO as a serialized inner MLIR module
    # (tpu_custom_call backend_config) that carries its own location info,
    # including the CALLER's stack frames. The cache key canonicalization
    # (jax cache_key._canonicalize_ir) strips debug info only from the OUTER
    # module — it cannot reach inside the serialized blob — so the same
    # program traced from `python bench.py`, `python /path/bench.py`, or any
    # wrapper script hashes to a different key (verified: 6 distinct keys for
    # one program across one day's processes; two caller structures differ in
    # exactly the 12 tpu_custom_call backend_config lines of the stripped
    # IR). Opting in stops embedding caller tracebacks in locations, making
    # keys stable across invocation styles. Off by default because flipping
    # it changes every existing key (a full re-warm); see
    # experiments/perf/README.md for the forensics and protocol.
    if os.environ.get('MOLGYM_STABLE_CACHE_KEYS', '0') == '1':
        jax.config.update('jax_include_full_tracebacks_in_locations', False)
    return cache_dir


def get_tag(config: dict) -> str:
    return '{exp}_run-{seed}'.format(exp=config['name'], seed=config['seed'])


def save_config(config: dict, directory: str, tag: str, verbose: bool = True) -> None:
    formatted = json.dumps(config, indent=4, sort_keys=True, default=str)
    if verbose:
        logging.info(formatted)
    with open(os.path.join(directory, tag + '.json'), mode='w') as f:
        f.write(formatted)


def create_directories(directories: List[str]) -> None:
    for directory in directories:
        os.makedirs(directory, exist_ok=True)


def setup_logger(config: dict, directory: str, tag: str) -> None:
    logger = logging.getLogger()
    logger.setLevel(config.get('log_level', 'INFO'))
    # drop pre-existing stream handlers (absl/basicConfig) to avoid duplicates
    for handler in list(logger.handlers):
        logger.removeHandler(handler)
    formatter = logging.Formatter(
        '%(asctime)s.%(msecs)03d %(levelname)s: %(message)s',
        datefmt='%Y-%m-%d %H:%M:%S')

    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    fh = logging.FileHandler(os.path.join(directory, tag + '.log'))
    fh.setFormatter(formatter)
    logger.addHandler(fh)


def set_seeds(seed: int) -> None:
    np.random.seed(seed)


class RolloutSaver:
    """Pickles rollout trajectories under data/ with the reference's filename
    scheme `{tag}_steps-{n}_{mode}.pkl` (tools/util.py:157-169), optionally
    rank-tagged for multi-host runs (the analysis layer parses `_rank-N`,
    tools/analysis.py:17)."""

    def __init__(self, directory: str, tag: str, rank: Optional[int] = None) -> None:
        self.directory = directory
        self.tag = tag
        self.rank = rank
        self._suffix = '.pkl'

    def save(self, obj: object, num_steps: int, info: str) -> None:
        parts = [self.tag, f'steps-{num_steps}']
        if self.rank is not None:
            parts.append(f'rank-{self.rank}')
        parts.append(info)
        path = os.path.join(self.directory, '_'.join(parts) + self._suffix)
        logging.debug(f'Saving rollout: {path}')
        with open(path, mode='wb') as f:
            pickle.dump(obj, f)


class InfoSaver:
    """Appends JSON lines to `{tag}_{name}.txt` (tools/util.py:172-183);
    optionally mirrors scalars to TensorBoard (the reference pins tensorboardX
    but never uses it — here it is a real, optional sink)."""

    def __init__(self, directory: str, tag: str,
                 tensorboard_dir: Optional[str] = None) -> None:
        self.directory = directory
        self.tag = tag
        self._suffix = '.txt'
        self._tb = None
        if tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(tensorboard_dir, tag))
            except ImportError:
                logging.warning('tensorboardX not available; JSONL only')

    def save(self, obj: dict, name: str) -> None:
        path = os.path.join(self.directory, self.tag + '_' + name + self._suffix)
        logging.debug(f'Saving info: {path}')
        clean = {}
        for key, value in obj.items():
            if isinstance(value, (np.floating, np.integer)):
                value = value.item()
            clean[key] = value
        with open(path, mode='a') as f:
            f.write(json.dumps(clean))
            f.write('\n')
        if self._tb is not None:
            step = clean.get('total_num_steps', 0)
            for key, value in clean.items():
                if key != 'total_num_steps' and isinstance(value, (int, float)) \
                        and np.isfinite(value):
                    self._tb.add_scalar(f'{name}/{key}', value, step)
            self._tb.flush()


def count_params(params) -> int:
    import jax
    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
