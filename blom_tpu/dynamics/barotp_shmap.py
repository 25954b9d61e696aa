"""Margin-k halo-amortized barotropic solver under shard_map.

The production multi-chip path for the barotropic subcycling
(reference: /root/reference/phy/mod_barotp.F90:387-397 — pb_t/ubflx_t/
vbflx_t halos exchanged with margin 2 every 2nd substep, so ~30-100
substeps cost ~15-50 exchanges instead of one per stencil op).

Under plain GSPMD the substep scan emits collective-permutes for every
stencil shift of every substep (~8 per substep).  Here the whole
subcycle runs inside `shard_map`: the per-step constant fields are
halo-widened ONCE to `margin` ghost rings, and the working time levels
are exchanged every `SUBS_PER_EXCH` substeps.  Each substep's chained
updates (pb -> u -> v) consume up to 3 ghost rings, so margin 6 buys 2
substeps per exchange: collective count per baroclinic step drops from
~8*lstep to ~4*lstep/2 + one-off widening (~10x fewer; measured in
tests/test_barotp_shmap.py by counting collective-permutes in the
compiled HLO).

Tripolar (arctic) grids are supported: every exchange fills the top
mesh row's north ghosts with fold rows (parallel.halo.fold_fixup_stack;
the distributed fold of mod_xc.F90:2518-2700).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.grid import Grid
from ..core.state import State
from ..parallel.halo import halo_exchange
from . import barotp as bt

#: ghost rings consumed by one substep's chained pb->u->v updates
RINGS_PER_SUBSTEP = 3
#: substeps between exchanges; margin = RINGS_PER_SUBSTEP * SUBS_PER_EXCH
SUBS_PER_EXCH = 2


def wide_tree(tree, margin, ny, nx, per_i, per_j, fold_specs=None):
    """Halo-widen a whole pytree with ONE exchange: stack all leaves
    (grouped by dtype) into single (N, j, i) arrays, exchange, unstack
    — 4 collective-permutes per dtype group regardless of field
    count.

    With `fold_specs` (a flat list aligned with jax.tree.flatten(tree):
    (kind, sign, partner_leaf_idx) per leaf or None to skip) the top
    mesh row's north ghosts are tripolar fold rows instead of zeros
    (parallel.halo.fold_fixup_stack; mod_xc.F90:2518-2700)."""
    import jax as _jax
    from ..parallel.halo import fold_fixup_stack
    _V = {'p': 0, 'u': 1, 'v': 2, 'q': 3}
    leaves, treedef = _jax.tree.flatten(tree)
    out = [None] * len(leaves)

    def nrows(l):
        return int(np.prod(l.shape[:-2])) if l.ndim > 2 else 1

    dtypes = sorted({str(l.dtype) for l in leaves if l.ndim >= 2})
    for dt in dtypes:
        idxs = [i for i, l in enumerate(leaves)
                if l.ndim >= 2 and str(l.dtype) == dt]
        st = jnp.concatenate(
            [leaves[i].reshape((-1,) + leaves[i].shape[-2:])
             for i in idxs], 0)
        st = halo_exchange(st, margin, ny, nx, per_i, per_j)
        if fold_specs is not None:
            offs = {}
            pos = 0
            for i in idxs:
                offs[i] = pos
                pos += nrows(leaves[i])
            variant = np.full(pos, -1, np.int32)
            sign = np.ones(pos)
            srcr = np.arange(pos)
            for i in idxs:
                spec = fold_specs[i]
                if spec is None:
                    continue
                k, sg, partner = spec
                r0, nr = offs[i], nrows(leaves[i])
                variant[r0:r0 + nr] = _V[k]
                sign[r0:r0 + nr] = sg
                if partner is not None:
                    if partner not in offs:
                        raise ValueError(
                            'fold partner leaf in a different dtype '
                            'group')
                    srcr[r0:r0 + nr] = np.arange(
                        offs[partner], offs[partner] + nr)
            if (variant >= 0).any():
                st = fold_fixup_stack(st, margin, ny, nx, variant,
                                      sign, srcr)
        pos = 0
        for i in idxs:
            l = leaves[i]
            sz = nrows(l)
            blk = st[pos:pos + sz]
            out[i] = blk.reshape(l.shape[:-2] + blk.shape[-2:])
            pos += sz
    for i, l in enumerate(leaves):
        if out[i] is None:
            out[i] = l          # scalars / 1-D leaves pass through
    return _jax.tree.unflatten(treedef, out)


def sync_tree(tree, ny, nx, fold_specs):
    """Block-local arctic_sync over a pytree of UNWIDENED blocks: one
    stacked fold_sync_stack per dtype group (the shard_map counterpart
    of parallel.arctic.sync_state)."""
    import jax as _jax
    from ..parallel.halo import fold_sync_stack
    _V = {'p': 0, 'u': 1, 'v': 2, 'q': 3}
    leaves, treedef = _jax.tree.flatten(tree)
    out = [None] * len(leaves)

    def nrows(l):
        return int(np.prod(l.shape[:-2])) if l.ndim > 2 else 1

    dtypes = sorted({str(l.dtype) for l in leaves if l.ndim >= 2})
    for dt in dtypes:
        idxs = [i for i, l in enumerate(leaves)
                if l.ndim >= 2 and str(l.dtype) == dt]
        st = jnp.concatenate(
            [leaves[i].reshape((-1,) + leaves[i].shape[-2:])
             for i in idxs], 0)
        offs = {}
        pos = 0
        for i in idxs:
            offs[i] = pos
            pos += nrows(leaves[i])
        variant = np.full(pos, -1, np.int32)
        sign = np.ones(pos)
        srcr = np.arange(pos)
        for i in idxs:
            spec = fold_specs[i]
            if spec is None:
                continue
            k, sg, partner = spec
            r0, nr = offs[i], nrows(leaves[i])
            variant[r0:r0 + nr] = _V[k]
            sign[r0:r0 + nr] = sg
            if partner is not None:
                srcr[r0:r0 + nr] = np.arange(offs[partner],
                                             offs[partner] + nr)
        # variant -1 rows keep their top row unchanged inside the
        # stacked sync
        st = fold_sync_stack(st, ny, nx, variant, sign, srcr)
        pos = 0
        for i in idxs:
            l = leaves[i]
            sz = nrows(l)
            out[i] = st[pos:pos + sz].reshape(l.shape)
            pos += sz
    for i, l in enumerate(leaves):
        if out[i] is None:
            out[i] = l
    return _jax.tree.unflatten(treedef, out)


def crop_tree(tree, margin):
    """Drop `margin` ghost rings from the trailing (j, i) axes of every
    array leaf."""
    import jax as _jax
    m = margin
    return _jax.tree.map(
        lambda a: a[..., m:-m, m:-m] if getattr(a, 'ndim', 0) >= 2 else a,
        tree)


def barotp_block(ny: int, nx: int, per_i: bool, per_j: bool,
                 fld_l, ubflxs, vbflxs, ubflxs_p, vbflxs_p,
                 m: int, n: int, lstep: int, dlt, par: bt.BarotpParams,
                 subs_per_exch: int = SUBS_PER_EXCH,
                 arctic: bool = False):
    """Block-local margin-k barotropic core: must run inside shard_map
    over a ('y','x') mesh.  Inputs are UNPADDED local blocks; outputs
    are unpadded (out, sums) dicts for bt.finalize.

    With `arctic`, every exchange fills the top mesh row's north
    ghosts with tripolar fold rows (the reference's per-substep fold
    halos, mod_barotp.F90:387-397 + mod_xc.F90:2518-2700)."""
    margin = RINGS_PER_SUBSTEP * subs_per_exch

    def wide(a):
        return halo_exchange(a, margin, ny, nx, per_i, per_j)

    def crop(a):
        return a[..., margin:-margin, margin:-margin]

    # widen every per-step-constant field once (one exchange)
    fold_specs = None
    if arctic:
        from ..parallel.fold_specs import leaf_specs
        fold_specs = leaf_specs(
            (fld_l, ubflxs, vbflxs, ubflxs_p, vbflxs_p),
            overrides={1: ('u', -1.), 2: ('v', -1.),
                       3: ('u', -1.), 4: ('v', -1.)})
    fld_w, ubflxs, vbflxs, ubflxs_p, vbflxs_p = wide_tree(
        (fld_l, ubflxs, vbflxs, ubflxs_p, vbflxs_p), margin,
        ny, nx, per_i, per_j, fold_specs=fold_specs)
    sh = bt.local_shifts()

    def exch_carries(pb_t, ubflx_t, vbflx_t):
        """One stacked margin-M exchange of the working time levels
        (the xctilr of mod_barotp.F90:387-397)."""
        st = jnp.concatenate(
            [crop(pb_t), crop(ubflx_t), crop(vbflx_t)], axis=0)
        st = wide(st)
        if arctic:
            from ..parallel.halo import fold_fixup_stack
            st = fold_fixup_stack(
                st, margin, ny, nx,
                variant=np.array([0, 0, 1, 1, 2, 2]),
                sign=np.array([1., 1., -1., -1., -1., -1.]),
                src_rows=np.arange(6))
        return st[:2], st[2:4], st[4:6]

    def runner(nb, substep_fn, half_, carry):
        # carry fields live at the widened shape; every subs_per_exch
        # substeps: crop, exchange, continue
        nex = -(-half_ // subs_per_exch)

        def body(c, ex):
            pb_t, ubflx_t, vbflx_t, us, vs, uc, vc = c
            pb_t, ubflx_t, vbflx_t = exch_carries(
                pb_t, ubflx_t, vbflx_t)
            c = (pb_t, ubflx_t, vbflx_t, us, vs, uc, vc)
            lll0 = 1 + (nb - 1) * half_ + ex * subs_per_exch

            def sub_body(cc, k):
                lll = lll0 + k
                cc2 = substep_fn(nb, cc, lll)
                # past-the-end substeps of the last partial exchange
                # group are no-ops
                keep = (lll <= nb * half_)
                return jax.tree.map(
                    lambda x2, x1: jnp.where(keep, x2, x1),
                    cc2, cc), None

            c, _ = lax.scan(sub_body, c, jnp.arange(subs_per_exch))
            return c, None

        c = carry
        c, _ = lax.scan(body, c, jnp.arange(nex))
        return c

    out, sums = bt.run_blocks(
        fld_w, sh, ubflxs, vbflxs, ubflxs_p, vbflxs_p,
        m, n, lstep, dlt, par,
        im1=sh.im1, jm1=sh.jm1,
        iu=fld_w['iu'], iv=fld_w['iv'], ip=fld_w['ip'],
        block_runner=runner)
    out = {k: crop(v) for k, v in out.items()}
    sums = {k: crop(v) for k, v in sums.items()}
    return out, sums


def make_barotp_shmap(mesh, subs_per_exch: int = SUBS_PER_EXCH):
    """Build a drop-in replacement for dynamics.barotp.barotp that runs
    the subcycle inside shard_map over `mesh` (axes ('y', 'x')) with
    margin-k amortized halo exchange."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ny, nx = mesh.devices.shape
    margin = RINGS_PER_SUBSTEP * subs_per_exch

    def barotp_fn(grid: Grid, s: State, utotn, vtotn, m: int, n: int,
                  lstep: int, dlt, par: bt.BarotpParams) -> State:
        fld = bt._prologue(grid, s, utotn, vtotn, m, n, par)
        per_i, per_j = grid.periodic_i, grid.periodic_j
        arctic = grid.arctic

        def local(fld_l, ubflxs, vbflxs, ubflxs_p, vbflxs_p):
            return barotp_block(ny, nx, per_i, per_j, fld_l, ubflxs,
                                vbflxs, ubflxs_p, vbflxs_p, m, n, lstep,
                                dlt, par, subs_per_exch, arctic=arctic)

        def specs_like(tree):
            return jax.tree.map(
                lambda a: P(*([None] * (a.ndim - 2) + ['y', 'x'])), tree)

        args = (fld, s.ubflxs, s.vbflxs, s.ubflxs_p, s.vbflxs_p)
        in_specs = specs_like(args)

        def osp(extra):
            return P(*([None] * extra + ['y', 'x']))

        out_keys_2d = ('pb_m', 'pbu_m', 'pbv_m', 'ubflx_m', 'vbflx_m',
                       'ub_m', 'vb_m', 'pb_n', 'pbu_n', 'pbv_n',
                       'ubflx_n', 'vbflx_n', 'ub_n', 'vb_n',
                       'pb_p', 'pbu_p', 'pbv_p')
        out_keys_3d = ('pb_mn', 'ubflx_mn', 'vbflx_mn')
        out_spec = {k: osp(0) for k in out_keys_2d}
        out_spec.update({k: osp(1) for k in out_keys_3d})
        sums_spec = {'ubflxs': osp(1), 'vbflxs': osp(1),
                     'ubflxs_p': osp(1), 'vbflxs_p': osp(1),
                     'ubcors_p': osp(0), 'vbcors_p': osp(0)}
        out_specs = (out_spec, sums_spec)

        out, sums = shard_map(local, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)(*args)
        out['pvtrop_n'] = fld['pvtrop_n']
        return bt.finalize(grid, s, m, n, out, sums)

    return barotp_fn
