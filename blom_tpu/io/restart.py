"""Checkpoint / restart.

TPU-native re-design of the reference restart system
(reference: /root/reference/phy/mod_restart.F90 — registry-driven NetCDF
dump of all prognostic + auxiliary state with rotating file naming and a
rstdate.txt log; restart_write :1143, restart_read :1463).

Here the State pytree is the registry: every leaf is saved verbatim
(compressed .npz single-host; orbax/tensorstore is the planned sharded
multi-host path), plus clock metadata.  Restart continuation is bit-exact
by construction because the step function is pure: reloading the pytree
reproduces the exact scan input (the reference needs halo re-priming and
delt1 switching, mod_blom_init.F90:244-378; here delt1 handling lives in
the clock)."""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import jax.numpy as jnp

from ..core import modeltime
from ..core.state import State


def write_restart(path: str, state: State, clock: modeltime.ModelTime):
    """Dump the full state + clock (restart_write, mod_restart.F90:1143)."""
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    meta = dict(
        calendar=clock.calendar, baclin=clock.baclin, batrop=clock.batrop,
        lstep=clock.lstep, dlt=clock.dlt, nstep_in_day=clock.nstep_in_day,
        date0=clock.date0.to_ymd(), date=clock.date.to_ymd(),
        nstep0=clock.nstep0, nstep=clock.nstep,
        time0=clock.time0, time=clock.time)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez_compressed(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def read_restart(path: str, dtype=None):
    """Load (state, clock) (restart_read, mod_restart.F90:1463)."""
    from ..core import calendar as cal

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z['__meta__']))
        kwargs = {}
        for f in dataclasses.fields(State):
            a = z[f.name]
            if dtype is not None and a.dtype.kind == 'f':
                a = a.astype(dtype)
            kwargs[f.name] = jnp.asarray(a)
    state = State(**kwargs)
    clock = modeltime.ModelTime(
        calendar=meta['calendar'], baclin=meta['baclin'],
        batrop=meta['batrop'], lstep=meta['lstep'], dlt=meta['dlt'],
        nstep_in_day=meta['nstep_in_day'],
        date0=cal.Date.from_ymd(meta['date0']),
        date=cal.Date.from_ymd(meta['date']),
        nstep0=meta['nstep0'], nstep=meta['nstep'],
        time0=meta['time0'], time=meta['time'])
    return state, clock


def restart_filename(runid: str, clock: modeltime.ModelTime,
                     rstfrq: float = 1., rstmon: bool = False,
                     annual: bool = False) -> str:
    """Rotating restart file name (restart_write naming,
    mod_restart.F90:1158-1200): annual restarts get a dated name;
    otherwise a 3-slot rotation keyed by month or restart count."""
    y, mo, d = clock.date.year, clock.date.month, clock.date.day
    if annual:
        return (f'{runid}_restphy_{y:04d}.{mo:02d}.{d:02d}'
                f'_{int(round(clock.time)):06d}.npz')
    if rstmon:
        slot = (mo + 10) % 3 + 1
    else:
        slot = (int(round(min(clock.nstep / max(rstfrq, 1.),
                              clock.time))) - 1) % 3 + 1
    return f'{runid}_restphy_{slot}.npz'


def update_rstdate(dirpath: str, runid: str, fname: str,
                   clock: modeltime.ModelTime):
    """Append the written restart's date to rstdate.txt
    (mod_restart.F90:1178-1212)."""
    y, mo, d = clock.date.year, clock.date.month, clock.date.day
    line = (f'{fname}: date {y:04d}.{mo:02d}.{d:02d},'
            f' integration day {int(round(clock.time))}')
    path = os.path.join(dirpath, 'rstdate.txt')
    lines = []
    if os.path.exists(path):
        with open(path) as f:
            lines = [ln.rstrip('\n') for ln in f if ln.strip()]
    lines.append(line)
    with open(path, 'w') as f:
        f.write('\n'.join(lines[-100:]) + '\n')


def restart_write_rotating(dirpath: str, runid: str, state: State,
                           clock: modeltime.ModelTime,
                           rstfrq: float = 1., rstmon: bool = False,
                           annual: bool = False) -> str:
    """Write a restart with the reference's rotating naming + rstdate
    log (restart_write, mod_restart.F90:1143-1260)."""
    fname = restart_filename(runid, clock, rstfrq, rstmon, annual)
    path = os.path.join(dirpath, fname)
    write_restart(path, state, clock)
    update_rstdate(dirpath, runid, fname, clock)
    return path


def write_restart_sharded(dirpath: str, state: State,
                          clock: modeltime.ModelTime):
    """Sharded (multi-host capable) restart via orbax/tensorstore: each
    host writes only its shards (the PnetCDF-parallel analogue of
    restart_write; SURVEY tensorstore path).  Metadata rides a JSON
    sidecar."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(dirpath)
    tree = {f.name: getattr(state, f.name)
            for f in dataclasses.fields(state)}
    # orbax rejects zero-size leaves (e.g. trc with ntr = 0): record
    # their shape/dtype in the sidecar instead
    empty = {k: (list(v.shape), str(v.dtype)) for k, v in tree.items()
             if v.size == 0}
    tree = {k: v for k, v in tree.items() if v.size > 0}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, 'state'), tree, force=True)
    meta = dict(
        empty_leaves=empty,
        calendar=clock.calendar, baclin=clock.baclin,
        batrop=clock.batrop, lstep=clock.lstep, dlt=clock.dlt,
        nstep_in_day=clock.nstep_in_day, date0=clock.date0.to_ymd(),
        date=clock.date.to_ymd(), nstep0=clock.nstep0,
        nstep=clock.nstep, time0=clock.time0, time=clock.time)
    with open(os.path.join(path, 'clock.json'), 'w') as f:
        json.dump(meta, f)


def read_restart_sharded(dirpath: str, shardings=None):
    """Load a sharded restart; `shardings` optionally maps leaf names
    to jax.sharding.Sharding for direct sharded restore."""
    import orbax.checkpoint as ocp

    from ..core import calendar as cal

    path = os.path.abspath(dirpath)
    with open(os.path.join(path, 'clock.json')) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.join(path, 'state'))
    for k, (shape, dt) in meta.get('empty_leaves', {}).items():
        tree[k] = jnp.zeros(tuple(shape), dt)
    if shardings:
        import jax
        tree = {k: (jax.device_put(v, shardings[k])
                    if k in shardings else jnp.asarray(v))
                for k, v in tree.items()}
    else:
        tree = {k: jnp.asarray(v) for k, v in tree.items()}
    state = State(**tree)
    clock = modeltime.ModelTime(
        calendar=meta['calendar'], baclin=meta['baclin'],
        batrop=meta['batrop'], lstep=meta['lstep'], dlt=meta['dlt'],
        nstep_in_day=meta['nstep_in_day'],
        date0=cal.Date.from_ymd(meta['date0']),
        date=cal.Date.from_ymd(meta['date']),
        nstep0=meta['nstep0'], nstep=meta['nstep'],
        time0=meta['time0'], time=meta['time'])
    return state, clock
