"""Multi-bag training on formulas sampled from the QM9/GDB9 dataset.

The reference ships a QM9 parser as dataset utility (reference
molgym/tools/qm9_parser.py:29-47) and trains its multi-bag setting on
dataset-derived formulas (ICLR'21 usage of scripts/run.py:72-94). This
driver closes that loop natively: point --qm9_dataset at a GDB9 tar
(the committed experiments/qm9_pm6/qm9_sample.tar.gz of real small QM9
members, or the full 133k dsgdb9nsd archive), and the bag set is sampled
from the PARSED molecules instead of hand-written --formulas.

Selection is deterministic in --qm9_selection_seed (independent of --seed,
so multi-seed runs train on the SAME bag set): parse -> formula strings ->
keep those whose elements all lie in --symbols and whose size fits
--canvas_size -> dedup in id order -> rng.choice of --qm9_num_formulas.

Example (the committed experiments/qm9_pm6 family):
    python scripts/run_qm9.py --name=qm9pm6 \
        --qm9_dataset=experiments/qm9_pm6/qm9_sample.tar.gz \
        --qm9_num_formulas=4 --canvas_size=7 --symbols=X,H,C,N,O,F \
        --reward=pm6 --model=covariant --beta=-10 --bag_scale=6 \
        --num_envs=10 --num_steps=8400 --num_steps_per_iter=140 \
        --mini_batch_size=140 --seed=1 --save_rollouts=eval
"""
from __future__ import annotations

import logging
from typing import List

import numpy as np

from molgym_tpu.formula import (formula_to_string, get_formula_size,
                                string_to_formula, zs_to_formula)
from molgym_tpu.spaces import symbols_to_zs
from molgym_tpu.tools.arg_parser import build_default_argparser
from molgym_tpu.tools.driver import run_experiment, standard_envs
from molgym_tpu.tools.qm9_parser import parse_dataset


def select_qm9_formulas(dataset_path: str, symbols: str, canvas_size: int,
                        num_formulas: int, selection_seed: int) -> List[str]:
    allowed = set(symbols_to_zs(symbols))
    seen = set()
    candidates = []
    for _gdb_id, atoms, _info in parse_dataset(dataset_path):
        zs = [a.z for a in atoms]
        if len(zs) > canvas_size or any(z not in allowed for z in zs):
            continue
        formula = formula_to_string(zs_to_formula(zs))
        if formula in seen:
            continue
        seen.add(formula)
        candidates.append(formula)
    if not candidates:
        raise RuntimeError(
            f'no QM9 molecules from {dataset_path} fit --symbols={symbols} '
            f'and --canvas_size={canvas_size}')
    if num_formulas >= len(candidates):
        return candidates
    rng = np.random.RandomState(selection_seed)
    idx = rng.choice(len(candidates), size=num_formulas, replace=False)
    return [candidates[i] for i in sorted(idx)]


def main() -> None:
    parser = build_default_argparser()
    for action in parser._actions:
        if action.dest == 'formulas':
            action.required = False  # derived from the dataset below
            action.help += ' (ignored: sampled from --qm9_dataset)'
    parser.add_argument('--qm9_dataset', required=True,
                        help='GDB9 tar of xyz records (full dsgdb9nsd '
                             'archive or the committed sample)')
    parser.add_argument('--qm9_num_formulas', type=int, default=4,
                        help='bag-set size sampled from the dataset')
    parser.add_argument('--qm9_selection_seed', type=int, default=0,
                        help='formula-sampling seed (independent of --seed '
                             'so multi-seed runs share one bag set)')
    config = vars(parser.parse_args())

    formulas = select_qm9_formulas(
        config['qm9_dataset'], config['symbols'], config['canvas_size'],
        config['qm9_num_formulas'], config['qm9_selection_seed'])
    # sanity: every selected formula round-trips through the bag machinery
    for f in formulas:
        assert get_formula_size(string_to_formula(f)) <= config['canvas_size']
    config['formulas'] = ','.join(formulas)
    logging.info(f'QM9-sampled formulas: {config["formulas"]}')
    print(f'QM9-sampled formulas: {config["formulas"]}', flush=True)
    run_experiment(config, env_builder=standard_envs)


if __name__ == '__main__':
    main()
