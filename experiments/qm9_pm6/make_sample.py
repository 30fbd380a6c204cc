"""Build qm9_sample.tar.gz — a GDB9-format archive of the smallest real
QM9 member molecules (H/C/N/O/F, the dataset's element set).

The full 133,885-record dsgdb9nsd tar cannot be downloaded on this image
(zero egress), so this sample stands in for it: record layout, filenames and
the `*^` scientific-notation quirk match the real dataset exactly (parser
contract: molgym_tpu/tools/qm9_parser.py, reference
molgym/tools/qm9_parser.py:29-47), and every molecule genuinely appears in
QM9 (GDB-17 small members / its hydrocarbon-heteroatom seeds). Geometries
are NOMINAL (idealized bond lengths/angles) — the training pipeline consumes
only the FORMULAS; anyone with the real tar points --qm9_dataset at it
instead and nothing else changes.

Run: python experiments/qm9_pm6/make_sample.py  (writes the tar next to it)
"""
from __future__ import annotations

import io
import os
import tarfile

# (gdb-style id, [(symbol, x, y, z)], smiles)
MOLECULES = [
    (1, [('C', 0, 0, 0), ('H', 0.63, 0.63, 0.63), ('H', -0.63, -0.63, 0.63),
         ('H', -0.63, 0.63, -0.63), ('H', 0.63, -0.63, -0.63)], 'C'),
    (2, [('N', 0, 0, 0.07), ('H', 0.94, 0, -0.32), ('H', -0.47, 0.81, -0.32),
         ('H', -0.47, -0.81, -0.32)], 'N'),
    (3, [('O', 0, 0, 0.12), ('H', 0.76, 0, -0.47), ('H', -0.76, 0, -0.47)],
     'O'),
    (4, [('C', 0, 0, 0.6), ('C', 0, 0, -0.6), ('H', 0, 0, 1.66),
         ('H', 0, 0, -1.66)], 'C#C'),
    (5, [('C', 0, 0, 0.5), ('N', 0, 0, -0.65), ('H', 0, 0, 1.57)], 'C#N'),
    (6, [('C', 0, 0, 0.77), ('C', 0, 0, -0.77),
         ('H', 1.02, 0, 1.16), ('H', -0.51, 0.88, 1.16),
         ('H', -0.51, -0.88, 1.16), ('H', -1.02, 0, -1.16),
         ('H', 0.51, 0.88, -1.16), ('H', 0.51, -0.88, -1.16)], 'CC'),
    (7, [('C', 0.05, 0, 0.66), ('O', 0.05, 0, -0.77), ('H', -0.97, 0, 1.02),
         ('H', 0.56, 0.89, 1.04), ('H', 0.56, -0.89, 1.04),
         ('H', -0.85, 0, -1.06)], 'CO'),
    (8, [('C', 0, 0, 0.53), ('O', 0, 0, -0.68),
         ('H', 0.94, 0, 1.12), ('H', -0.94, 0, 1.12)], 'C=O'),
    (9, [('C', 0, 0, 0.66), ('C', 0, 0, -0.66),
         ('H', 0.92, 0, 1.23), ('H', -0.92, 0, 1.23),
         ('H', 0.92, 0, -1.23), ('H', -0.92, 0, -1.23)], 'C=C'),
    (10, [('C', 0, 0, 0.7), ('F', 0, 0, -0.69), ('H', 1.03, 0, 1.03),
          ('H', -0.51, 0.89, 1.03), ('H', -0.51, -0.89, 1.03)], 'CF'),
    (11, [('C', 0.05, 0, 0.7), ('N', 0.05, 0, -0.75), ('H', -0.99, 0, 1.05),
          ('H', 0.55, 0.88, 1.08), ('H', 0.55, -0.88, 1.08),
          ('H', -0.43, 0.81, -1.1), ('H', -0.43, -0.81, -1.1)], 'CN'),
    (12, [('C', 0, 0, 1.18), ('C', 0, 0, -0.28), ('N', 0, 0, -1.44),
          ('H', 1.03, 0, 1.55), ('H', -0.51, 0.89, 1.55),
          ('H', -0.51, -0.89, 1.55)], 'CC#N'),
    (13, [('C', 0, 0, 0.42), ('O', 1.09, 0, -0.15), ('O', -1.13, 0, -0.19),
          ('H', 0.05, 0, 1.51), ('H', -1.02, 0, -1.15)], 'OC=O'),
    (14, [('C', 0, 0.51, 0.76), ('C', 0, 0.51, -0.76), ('O', 0, -0.46, 0),
          ('H', 0.91, 0.87, 1.23), ('H', -0.91, 0.87, 1.23),
          ('H', 0.91, 0.87, -1.23), ('H', -0.91, 0.87, -1.23)], 'C1CO1'),
    (15, [('N', 0, 0, 1.17), ('C', 0, 0, 0), ('H', 0.5, 0.87, -0.4),
          ('H', 0.5, -0.87, -0.4), ('H', -1.0, 0, -0.4)],
     '[NH]=C'),  # methanimine CH3N
    (16, [('C', 0, 0, 1.21), ('C', 0, 0, -0.16), ('O', 0, 0, -1.37),
          ('H', 1.03, 0, 1.58), ('H', -0.51, 0.89, 1.58),
          ('H', -0.51, -0.89, 1.58), ('H', 0.94, 0, -0.53)], 'CC=O'),
]


def record(gdb_id: int, atoms, smiles: str) -> bytes:
    lines = [str(len(atoms))]
    # properties line: 'gdb <id>' + 15 floats (nominal values; the parser
    # reads only the id). One uses the dataset's *^ exponent quirk so any
    # consumer inherits the fixup requirement.
    props = ['gdb', str(gdb_id)] + ['0.0'] * 15
    props[5] = '1.2*^-3'
    lines.append('\t'.join(props))
    for sym, x, y, z in atoms:
        lines.append(f'{sym}\t{x:.6f}\t{y:.6f}\t{z:.6f}\t0.0')
    lines.append('\t'.join(['100.0'] * 3))          # frequencies
    lines.append(f'{smiles}\t{smiles}')             # smiles (gdb, relaxed)
    lines.append('InChI=1S/sample\tInChI=1S/sample')
    return ('\n'.join(lines) + '\n').encode('ascii')


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'qm9_sample.tar.gz')
    with tarfile.open(out, 'w:gz') as tar:
        for gdb_id, atoms, smiles in MOLECULES:
            data = record(gdb_id, atoms, smiles)
            info = tarfile.TarInfo(name=f'dsgdb9nsd_{gdb_id:06d}.xyz')
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    print(f'wrote {out} ({len(MOLECULES)} records)')


if __name__ == '__main__':
    main()
