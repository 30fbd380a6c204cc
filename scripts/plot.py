"""Learning-curve plots (reference scripts/plot.py): load JSON-lines metric
streams from results/, aggregate mean±std over seeds per experiment, write
`average_return.pdf`."""
import argparse

import matplotlib.pyplot as plt

from molgym_tpu.tools.analysis import aggregate_over_seeds, load_metrics

FIG_WIDTH, FIG_HEIGHT = 6.0, 4.0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description='Plot learning curves')
    parser.add_argument('--dir', help='directory with results files', type=str,
                        default='results')
    parser.add_argument('--mode', help='metric stream to plot', type=str,
                        default='eval', choices=['train', 'eval', 'opt'])
    parser.add_argument('--output', help='output file', type=str,
                        default='average_return.pdf')
    return parser


def main() -> None:
    args = build_parser().parse_args()
    grouped = aggregate_over_seeds(load_metrics(args.dir, args.mode))

    fig, ax = plt.subplots(figsize=(FIG_WIDTH, FIG_HEIGHT),
                           constrained_layout=True)
    for name, group in grouped.groupby('name'):
        ax.plot(group['total_num_steps'], group['mean'], label=name)
        std = group['std'].fillna(0.0)
        ax.fill_between(group['total_num_steps'], group['mean'] - std,
                        group['mean'] + std, alpha=0.25)
    ax.set_xlabel('environment steps')
    ax.set_ylabel('average return')
    ax.legend()
    fig.savefig(args.output)
    print(f'Wrote {args.output}')


if __name__ == '__main__':
    main()
