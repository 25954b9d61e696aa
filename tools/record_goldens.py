"""Record Fortran golden trajectories for the parity gate.

Run on any host where the Fortran reference can be built (gfortran +
meson + netcdf-fortran; this container has no Fortran compiler — see
PARITY.md):

    cd /root/reference
    meson setup bld --buildtype=debugoptimized -Dmpi=false
    meson compile -C bld
    cd tests/fuk95 && ../../bld/blom     # runs the fuk95 limits deck

Patch the reference driver (or use its restart output) to dump the
prognostic fields every DUMP_EVERY steps, then convert here to the
golden archives `goldens/fuk95_step{N:04d}.npz` consumed by
tests/test_golden_parity.py.

This script does the conversion step: it reads the reference's restart
files (mod_restart.F90 layout: dp/temp/saln/u/v/pb/ub/vb at both time
levels) and writes the compact npz goldens.
"""

import argparse
import pathlib

import numpy as np

FIELDS = ('dp', 'temp', 'saln', 'u', 'v', 'pb', 'ub', 'vb')
DUMP_EVERY = 10
NSTEPS = 100


def convert_restart(path: str, step: int, outdir: str):
    """Convert one reference restart (NetCDF) to a golden npz."""
    from scipy.io import netcdf_file
    out = {}
    with netcdf_file(path, 'r', mmap=False) as nc:
        for name in FIELDS:
            if name in nc.variables:
                out[name] = np.array(nc.variables[name][:], np.float64)
    dst = pathlib.Path(outdir) / f'fuk95_step{step:04d}.npz'
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f'wrote {dst} ({sorted(out)})')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('restarts', nargs='+',
                    help='reference restart files, one per dump step')
    ap.add_argument('--outdir', default='goldens')
    ap.add_argument('--start', type=int, default=DUMP_EVERY)
    ap.add_argument('--every', type=int, default=DUMP_EVERY)
    args = ap.parse_args()
    for i, path in enumerate(args.restarts):
        convert_restart(path, args.start + i * args.every, args.outdir)


if __name__ == '__main__':
    main()
