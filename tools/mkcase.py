#!/usr/bin/env python
"""Case generator + runner CLI.

The buildnml/case-run role of the reference's CESM integration
(/root/reference/cime_config/buildnml) for standalone experiments:
point it at a BLOM `limits` deck, it builds the experiment and runs it.

    python tools/mkcase.py <limits-file> [--rundir DIR] [--nsteps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('limits')
    ap.add_argument('--rundir', default='.')
    ap.add_argument('--nsteps', type=int, default=None)
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (f64 parity mode)')
    args = ap.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)

    from blom_tpu.drivers import case

    model, cfg = case.build_case(args.limits)
    os.makedirs(args.rundir, exist_ok=True)
    s, clock, crc = case.run_case(model, cfg, rundir=args.rundir,
                                  nsteps=args.nsteps)
    print(f' chksum: dp {crc:10d}')
    print(f' integration day {clock.time:.2f}, nstep {clock.nstep}')
    print(' normal end of BLOM-TPU run')


if __name__ == '__main__':
    main()
