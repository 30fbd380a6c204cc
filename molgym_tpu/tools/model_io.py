"""Checkpoint save/load with the reference's file-naming contract.

The reference pickles whole torch modules as `{tag}_steps-{n}.model`, deletes
the previous file unless --keep_models, and resumes by regex-parsing the step
count (molgym/tools/model_util.py:51-117). Here a checkpoint is an orbax
directory `{tag}_steps-{n}.model` holding params AND optimizer state (the
reference loses optimizer state on resume — fixed deliberately, SURVEY.md §5).
"""
from __future__ import annotations

import logging
import os
import re
import shutil
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import orbax.checkpoint as ocp


@dataclass
class ModelPathInfo:
    path: str
    tag: str
    num_steps: int


_PACKED_W = re.compile(r'w_([ri])_l(\d+)_s(\d+)')


def _is_packed_mix(node: Any) -> bool:
    return isinstance(node, dict) and any(
        _PACKED_W.fullmatch(k) for k in node)


def _migrate_packed_mix(kind: str, old_parent: dict, template: dict) -> dict:
    """Translate one legacy ComplexLinear/CatMixReps weight group into the
    PackedCatMix layout, using the template's shapes as the layout spec.

    Legacy layout (round-1 CGLevel, see tests/covariant/test_so3_ops.py
    TestPackedLevel): per-l 2-D weights
      ag_mix_l{l}/{w_r,w_i}           [p*tau, tau_out]
      cat_mix/mix_l{l}/{w_r,w_i}      [tau_out + p_sq*tau_out + tau, tau_out]
    Packed layout (CGLevelPacked): 3-D weights
      ag_mix/w_{r,i}_l{l}_s0          [p, tau, tau_out]
      cat_mix/w_{r,i}_l{l}_s{0,1,2}   s0=[1,tau_out,tau_out] (linear part),
                                      s1=[p_sq,tau_out,tau_out] (CG square),
                                      s2=[1,tau,tau_out] (atom skip)
    The concatenated legacy cat rows are ordered [linear, square, atom]."""
    out = {}
    for name, tmpl in template.items():
        m = _PACKED_W.fullmatch(name)
        if m is None:
            raise KeyError(f'unexpected key in packed mix template: {name}')
        part, l, s = f'w_{m.group(1)}', int(m.group(2)), int(m.group(3))
        shape = tuple(np.shape(tmpl))
        if kind == 'ag_mix':
            w = np.asarray(old_parent[f'ag_mix_l{l}'][part])
            out[name] = w.reshape(shape)
        else:
            w = np.asarray(old_parent['cat_mix'][f'mix_l{l}'][part])
            sizes = []
            for si in range(3):
                t_si = template.get(f'{part}_l{l}_s{si}')
                sizes.append(0 if t_si is None
                             else int(np.prod(np.shape(t_si)[:2])))
            if sum(sizes) != w.shape[0]:
                raise ValueError(
                    f'legacy cat_mix mix_l{l} has {w.shape[0]} rows, packed '
                    f'template expects {sum(sizes)}')
            pieces = np.split(w, np.cumsum(sizes)[:-1], axis=0)
            out[name] = pieces[s].reshape(shape)
    return out


def is_legacy_covariant_tree(tree: Any) -> bool:
    """True if the tree contains round-1 per-l CG level weights
    (ag_mix_l{l} / cat_mix/mix_l{l}) anywhere."""
    if isinstance(tree, dict):
        if any(re.fullmatch(r'ag_mix_l\d+', k) for k in tree):
            return True
        return any(is_legacy_covariant_tree(v) for v in tree.values())
    if isinstance(tree, (list, tuple)):
        return any(is_legacy_covariant_tree(v) for v in tree)
    return False


def migrate_legacy_covariant(old: Any, template: Any) -> Any:
    """Translate a round-1 covariant checkpoint tree (per-l CGLevel params)
    into the current PackedCatMix layout, returning a tree with the
    template's structure, shapes and dtypes.

    Works on the params tree and on optimizer-state trees that mirror it
    (Adam mu/nu), so a full {'params', 'opt_state'} checkpoint migrates in
    one call. Promotion of tests/covariant/test_so3_ops.py translate_params
    into the production restore path (round-2 ADVICE)."""
    if isinstance(template, dict):
        if not isinstance(old, dict):
            raise TypeError(f'structure mismatch: dict template vs {type(old)}')
        out = {}
        for key, tval in template.items():
            if key in ('ag_mix', 'cat_mix') and _is_packed_mix(tval):
                out[key] = _migrate_packed_mix(key, old, tval)
            elif key in old:
                out[key] = migrate_legacy_covariant(old[key], tval)
            else:
                raise KeyError(f'checkpoint is missing key {key!r}')
        return out
    if isinstance(template, (list, tuple)):
        if old is None and len(template) > 0:
            raise ValueError(
                'structure mismatch: checkpoint has an empty node where the '
                'template expects a populated state — was the checkpoint '
                'saved under a different optimizer chain?')
        if hasattr(template, '_fields'):  # namedtuple (optax states)
            # a raw orbax restore yields namedtuples as dicts keyed by field
            parts = [
                migrate_legacy_covariant(
                    old[f] if isinstance(old, dict) else old[i],
                    getattr(template, f))
                for i, f in enumerate(template._fields)
            ]
            return type(template)(*parts)
        if len(old) != len(template):
            raise ValueError('structure mismatch: sequence length')
        parts = [migrate_legacy_covariant(o, t) for o, t in zip(old, template)]
        return type(template)(parts)
    # leaf: cast to the template leaf's dtype
    dtype = getattr(template, 'dtype', None)
    arr = np.asarray(old)
    return arr.astype(dtype) if dtype is not None else arr


class ModelIO:
    def __init__(self, directory: str, tag: str, keep: bool = False) -> None:
        self.directory = os.path.abspath(directory)
        self.tag = tag
        self.keep = keep
        self.old_path: Optional[str] = None
        self._steps_string = '_steps-'
        self._suffix = '.model'
        import jax
        self._per_process = jax.process_count() > 1
        if self._per_process:
            # Multi-process (--multihost): each rank saves its own full copy
            # of the (replicated) state to its own model_dir. The default
            # collective save would cross-match orbax barrier keys between
            # the ranks' independent saves to different directories;
            # primary_host=None makes every process its own primary with no
            # cross-process coordination (leaves are fetched to host numpy
            # in save()).
            self._checkpointer = ocp.Checkpointer(
                ocp.StandardCheckpointHandler(),
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=None))
        else:
            self._checkpointer = ocp.StandardCheckpointer()

    def _get_model_dirname(self, num_steps: int) -> str:
        return f'{self.tag}{self._steps_string}{num_steps}{self._suffix}'

    def _parse_model_path(self, path: str) -> Optional[ModelPathInfo]:
        name = os.path.basename(os.path.normpath(path))
        regex = re.compile(
            rf'(?P<tag>.+){self._steps_string}(?P<num_steps>\d+){self._suffix}')
        match = regex.match(name)
        if not match:
            return None
        return ModelPathInfo(path=path, tag=match.group('tag'),
                             num_steps=int(match.group('num_steps')))

    def _list_checkpoints(self) -> Sequence[ModelPathInfo]:
        if not os.path.isdir(self.directory):
            return []
        infos = []
        for name in os.listdir(self.directory):
            info = self._parse_model_path(os.path.join(self.directory, name))
            if info and info.tag == self.tag:
                infos.append(info)
        return infos

    def save(self, params: Any, opt_state: Any = None, num_steps: int = 0) -> str:
        if not self.keep and self.old_path and os.path.exists(self.old_path):
            logging.debug(f'Deleting old model: {self.old_path}')
            shutil.rmtree(self.old_path, ignore_errors=True)
        path = os.path.join(self.directory, self._get_model_dirname(num_steps))
        logging.debug(f'Saving model: {path}')
        state = {'params': params}
        if opt_state is not None:
            state['opt_state'] = opt_state
        if self._per_process:
            # Replicated global arrays are host-fetchable on every process;
            # numpy leaves keep the per-process save coordination-free.
            import jax
            state = jax.tree.map(np.asarray, state)
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        self._checkpointer.save(path, state)
        if hasattr(self._checkpointer, 'wait_until_finished'):
            self._checkpointer.wait_until_finished()  # sync ckptr: no-op
        self.old_path = path
        return path

    def load(self, path: str, template: Any = None) -> Tuple[Any, int]:
        """Returns ({'params': ..., 'opt_state': ...?}, num_steps). Pass a
        matching pytree `template` to restore exact array types/structure.

        Round-1 covariant checkpoints (per-l CGLevel weight naming) are
        auto-detected and migrated to the PackedCatMix layout on the fly,
        so --load_latest / eval keep working across the format break."""
        info = self._parse_model_path(path)
        if info is None or not os.path.exists(path):
            raise RuntimeError(f"Cannot find model '{path}'")
        logging.info(f'Loading model: {info.path}')
        if template is not None:
            try:
                state = self._checkpointer.restore(path, template)
            except Exception as exc:
                raw = self._restore_raw(path)
                if not is_legacy_covariant_tree(raw):
                    raise
                logging.info('Legacy covariant checkpoint detected; '
                             'migrating to the packed parameter layout')
                missing = {k for k in template if k not in raw}
                state = {k: migrate_legacy_covariant(raw[k], template[k])
                         for k in template if k in raw}
                if missing:
                    logging.warning(
                        f'Legacy checkpoint lacks {sorted(missing)}; '
                        f'restore error was: {exc!r}')
        else:
            state = self._checkpointer.restore(path)
        return state, info.num_steps

    def _restore_raw(self, path: str) -> Any:
        """Structure-free restore: every leaf as a host numpy array (no
        sharding/device metadata applied), for migration of checkpoints
        written under older parameter layouts."""
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path)
        tree = getattr(meta, 'item_metadata', meta)
        tree = getattr(tree, 'tree', tree)
        import jax.tree_util as jtu
        restore_args = jtu.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(path,
                             args=ocp.args.PyTreeRestore(
                                 restore_args=restore_args))

    def load_latest(self, template: Any = None) -> Tuple[Any, int]:
        infos = self._list_checkpoints()
        if not infos:
            raise RuntimeError(f"Cannot find model to load in '{self.directory}'")
        latest = max(infos, key=lambda info: info.num_steps)
        return self.load(latest.path, template=template)
