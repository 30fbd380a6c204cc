"""Extract generated molecular structures from saved rollouts (reference
scripts/structures.py): unpickle trajectory buffers, take the canvases at
terminal steps, write a multi-frame XYZ file."""
import argparse
import os
import pickle

import numpy as np

from molgym_tpu.atoms import Atoms, write_xyz
from molgym_tpu.periodic import CHEMICAL_SYMBOLS
from molgym_tpu.tools.analysis import collect_buffer_paths, parse_buffer_filename


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description='Extract terminal structures')
    parser.add_argument('--dir', help='directory with rollout pickles',
                        type=str, default='data')
    parser.add_argument('--mode', help='which rollouts', type=str,
                        default='eval', choices=['train', 'eval'])
    parser.add_argument('--symbols', help='comma-separated symbols (X first) '
                        'used by the run', type=str, required=True)
    parser.add_argument('--output', help='output XYZ file', type=str,
                        default='structures.xyz')
    parser.add_argument('--name', help='only rollouts of this experiment '
                        'name (directories holding several runs would '
                        'otherwise mix canvases with different symbol sets)',
                        type=str, default=None)
    return parser


def terminal_structures(traj, zs) -> list:
    """Canvases of `next_obs` at terminal steps (the completed molecules)."""
    terminals = np.asarray(traj.terminals)  # [T, B]
    elements = np.asarray(traj.next_obs.elements)  # [T, B, N]
    positions = np.asarray(traj.next_obs.positions)  # [T, B, N, 3]
    structures = []
    T, B = terminals.shape
    for t in range(T):
        for b in range(B):
            if terminals[t, b]:
                elem = elements[t, b]
                keep = elem != 0
                if keep.sum() == 0:
                    continue
                symbols = [CHEMICAL_SYMBOLS[zs[e]] for e in elem[keep]]
                structures.append(Atoms(symbols, positions[t, b][keep]))
    return structures


def main() -> None:
    args = build_parser().parse_args()
    from molgym_tpu.spaces import symbols_to_zs
    zs = symbols_to_zs(args.symbols)

    paths = sorted(collect_buffer_paths(args.dir, mode=args.mode),
                   key=lambda p: parse_buffer_filename(os.path.basename(p))['steps'])
    if args.name is not None:
        paths = [p for p in paths
                 if parse_buffer_filename(os.path.basename(p))['name']
                 == args.name]
    structures = []
    for path in paths:
        with open(path, 'rb') as f:
            traj = pickle.load(f)
        structures.extend(terminal_structures(traj, zs))
    if not structures:
        raise RuntimeError('No terminal structures found')
    write_xyz(args.output, structures)
    print(f'Wrote {len(structures)} structures to {args.output}')


if __name__ == '__main__':
    main()
