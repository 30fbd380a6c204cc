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

import orbax.checkpoint as ocp


@dataclass
class ModelPathInfo:
    path: str
    tag: str
    num_steps: int


class ModelIO:
    def __init__(self, directory: str, tag: str, keep: bool = False) -> None:
        self.directory = os.path.abspath(directory)
        self.tag = tag
        self.keep = keep
        self.old_path: Optional[str] = None
        self._steps_string = '_steps-'
        self._suffix = '.model'
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
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        self._checkpointer.save(path, state)
        self._checkpointer.wait_until_finished()
        self.old_path = path
        return path

    def load(self, path: str, template: Any = None) -> Tuple[Any, int]:
        """Returns ({'params': ..., 'opt_state': ...?}, num_steps). Pass a
        matching pytree `template` to restore exact array types/structure."""
        info = self._parse_model_path(path)
        if info is None or not os.path.exists(path):
            raise RuntimeError(f"Cannot find model '{path}'")
        logging.info(f'Loading model: {info.path}')
        if template is not None:
            state = self._checkpointer.restore(path, template)
        else:
            state = self._checkpointer.restore(path)
        return state, info.num_steps

    def load_latest(self, template: Any = None) -> Tuple[Any, int]:
        infos = self._list_checkpoints()
        if not infos:
            raise RuntimeError(f"Cannot find model to load in '{self.directory}'")
        latest = max(infos, key=lambda info: info.num_steps)
        return self.load(latest.path, template=template)
