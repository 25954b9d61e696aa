"""Loop-level numpy oracle of the reference HOR3MAP PPM path.

Written directly from the Fortran (/root/reference/phy/mod_hor3map.F90),
independent of the production JAX implementation, as the double
re-derivation harness described in PARITY.md: prepare_ppm (:1308-1497,
regular path — no near-empty-cell merging, which the tests avoid by
construction), reconstruct_ppm_edge_values (:1707-1763),
limit_ppm_interior_monotonic (:1872-1927),
limit_ppm_interior_non_oscillatory (:1929-1998), limit_ppm_boundary
(:2000-2070), limit_ppm_posdef (:2072-2098), polycoeff_ppm (:2100-2117)
and the PPM branch of remap (:4723-4790) as exact piecewise-parabola
integration.

Everything is scalar/loop numpy on one column; no JAX.
"""

import numpy as np

EPS = 1.e-14  # mod_hor3map.F90:114


# ---------------------------------------------------------------- LU
def lu_decompose(a):
    """In-place LU decomposition, no pivoting (mod_hor3map.F90:577-598)."""
    n = a.shape[0]
    for k in range(n - 1):
        q = 1.0 / a[k, k]
        for i in range(k + 1, n):
            a[i, k] *= q
            for j in range(k + 1, n):
                a[i, j] -= a[i, k] * a[k, j]
    return a


def lu_solve(lu, x):
    """Solve with an LU-decomposed matrix (mod_hor3map.F90:600-629)."""
    n = lu.shape[0]
    x = x.copy()
    for i in range(1, n):
        for j in range(i):
            x[i] -= lu[i, j] * x[j]
    x[n - 1] /= lu[n - 1, n - 1]
    for i in range(n - 2, -1, -1):
        for j in range(i + 1, n):
            x[i] -= lu[i, j] * x[j]
        x[i] /= lu[i, i]
    return x


def edge_ih4_coeff(h1, h2):
    """Tridiagonal row coefficients for 4th-order edges
    (mod_hor3map.F90:631-648)."""
    q = 1.0 / (h1 + h2)
    t1 = h2 * h2 * q * q
    t2 = h1 * h1 * q * q
    t3 = 2.0 * t1 * (h2 + 2.0 * h1) * q
    t4 = 2.0 * t2 * (h1 + 2.0 * h2) * q
    return t1, t2, t3, t4


def edge_slope_lblu(lb_ord, h):
    """LU matrix for the left-boundary edge/slope estimate
    (mod_hor3map.F90:913-975)."""
    n = lb_ord
    a = np.zeros((n, n))
    a[:, 0] = 1.0
    a[0, 1] = 0.5 * h[0]
    for i in range(1, n):
        a[i, 1] = a[i - 1, 1] + 0.5 * (h[i - 1] + h[i])
    if n > 2:
        a2sq = a[:, 1] ** 2
        hsq = h[:n] ** 2
        a[0, 2] = a[0, 1] * h[0] / 3.0
        for i in range(1, n):
            a[i, 2] = 0.5 * (a2sq[i] + hsq[i] / 12.0)
        if n > 3:
            a[0, 3] = 0.25 * a[0, 2] * h[0]
            for i in range(1, n):
                a[i, 3] = a[i, 1] * (a2sq[i] + 0.25 * hsq[i]) / 6.0
            if n > 4:
                a[0, 4] = 0.2 * a[0, 3] * h[0]
                for i in range(1, n):
                    a[i, 4] = (a2sq[i] * (a2sq[i] + 0.5 * hsq[i])
                               + hsq[i] * hsq[i] / 80.0) / 24.0
                if n > 5:
                    a[0, 5] = a[0, 4] * h[0] / 6.0
                    for i in range(1, n):
                        a[i, 5] = (a[i, 1] * (a2sq[i] + 0.75 * hsq[i])
                                   * (a2sq[i] + hsq[i] / 12.0)) / 120.0
    return lu_decompose(a)


def edge_slope_rblu(rb_ord, h):
    """LU matrix for the right-boundary edge/slope estimate
    (mod_hor3map.F90:977-1039).  h holds the last rb_ord cell widths."""
    n = rb_ord
    a = np.zeros((n, n))
    a[:, 0] = 1.0
    a[n - 1, 1] = -0.5 * h[n - 1]
    for i in range(n - 2, -1, -1):
        a[i, 1] = a[i + 1, 1] - 0.5 * (h[i + 1] + h[i])
    if n > 2:
        a2sq = a[:, 1] ** 2
        hsq = h[:n] ** 2
        for i in range(n - 1):
            a[i, 2] = 0.5 * (a2sq[i] + hsq[i] / 12.0)
        a[n - 1, 2] = -a[n - 1, 1] * h[n - 1] / 3.0
        if n > 3:
            for i in range(n - 1):
                a[i, 3] = a[i, 1] * (a2sq[i] + 0.25 * hsq[i]) / 6.0
            a[n - 1, 3] = -0.25 * a[n - 1, 2] * h[n - 1]
            if n > 4:
                for i in range(n - 1):
                    a[i, 4] = (a2sq[i] * (a2sq[i] + 0.5 * hsq[i])
                               + hsq[i] * hsq[i] / 80.0) / 24.0
                a[n - 1, 4] = -0.2 * a[n - 1, 3] * h[n - 1]
                if n > 5:
                    for i in range(n - 1):
                        a[i, 5] = (a[i, 1] * (a2sq[i] + 0.75 * hsq[i])
                                   * (a2sq[i] + hsq[i] / 12.0)) / 120.0
                    a[n - 1, 5] = -a[n - 1, 4] * h[n - 1] / 6.0
    return lu_decompose(a)


# ------------------------------------------------------- reconstruction
def reconstruct_ppm_edge_values(h, u, lb_ord, rb_ord):
    """Edge values by the implicit 4th-order scheme
    (mod_hor3map.F90:1707-1763).  h, u: (ns,).  Returns uedge (ns+1,)."""
    ns = len(u)
    uedge = np.zeros(ns + 1)

    if lb_ord == 1:
        uedge[0] = u[0]
    else:
        lblu = edge_slope_lblu(lb_ord, h[:lb_ord])
        uedge[0] = lu_solve(lblu, u[:lb_ord].copy())[0]
    # NOTE the reference tests lb_ord for the right boundary too
    # (mod_hor3map.F90:1735 "if (lb_ord == 1)"); with lb_ord == rb_ord
    # (all shipped decks) the behavior is identical, and we use rb_ord.
    if rb_ord == 1:
        uedge[ns] = u[ns - 1]
    else:
        rblu = edge_slope_rblu(rb_ord, h[ns - rb_ord:ns])
        uedge[ns] = lu_solve(rblu, u[ns - rb_ord:ns].copy())[0]

    td = np.zeros((4, ns + 1))
    rhs = np.zeros(ns + 1)
    for j in range(1, ns):          # interior edge j between cells j-1, j
        td[0, j], td[1, j], td[2, j], td[3, j] = \
            edge_ih4_coeff(h[j - 1], h[j])
        rhs[j] = td[2, j] * u[j - 1] + td[3, j] * u[j]

    gam = np.zeros(ns + 1)
    for j in range(1, ns):
        bei = 1.0 / (1.0 - td[0, j] * gam[j - 1])
        uedge[j] = (rhs[j] - td[0, j] * uedge[j - 1]) * bei
        gam[j] = td[1, j] * bei
    for j in range(ns - 1, 0, -1):
        uedge[j] -= gam[j] * uedge[j + 1]
    return uedge


def _slope_clamp(h, hci, u, uel, uer, j):
    """The shared slope-based edge clamp of both interior limiters."""
    sl = 2.0 * (u[j] - u[j - 1]) / h[j]
    sr = 2.0 * (u[j + 1] - u[j]) / h[j]
    if sl * sr > 0.0:
        sc = (u[j + 1] - u[j - 1]) * hci[j]
        sc = np.copysign(min(abs(sl), abs(sr), abs(sc)), sc)
        if (u[j - 1] - uel[j]) * (u[j] - uel[j]) > 0.0:
            uel[j] = u[j] - (np.copysign(1.0, sc)
                             * min(0.5 * h[j] * abs(sc),
                                   abs(uel[j] - u[j])))
        if (u[j + 1] - uer[j]) * (u[j] - uer[j]) > 0.0:
            uer[j] = u[j] + (np.copysign(1.0, sc)
                             * min(0.5 * h[j] * abs(sc),
                                   abs(uer[j] - u[j])))
    else:
        uel[j] = u[j]
        uer[j] = u[j]


def _parabola_limit(u, uel, uer, j):
    d = uer[j] - uel[j]
    q = d * (2.0 * u[j] - uel[j] - uer[j])
    r = d * d / 3.0
    if q > r:
        uel[j] = 3.0 * u[j] - 2.0 * uer[j]
    elif -r > q:
        uer[j] = 3.0 * u[j] - 2.0 * uel[j]


def limit_ppm_interior_monotonic(h, hci, u, uel, uer):
    """mod_hor3map.F90:1872-1927."""
    ns = len(u)
    for j in range(1, ns - 1):
        _slope_clamp(h, hci, u, uel, uer, j)
    for j in range(2, ns - 1):
        if (uel[j] - uer[j - 1]) * (u[j] - u[j - 1]) < 0.0:
            uel[j] = 0.5 * (uer[j - 1] + uel[j])
            uer[j - 1] = uel[j]
    for j in range(1, ns - 1):
        _parabola_limit(u, uel, uer, j)


def limit_ppm_interior_non_oscillatory(h, hci, u, uel, uer):
    """mod_hor3map.F90:1929-1998."""
    ns = len(u)
    d2 = np.array([uel[j] - 2.0 * u[j] + uer[j] for j in range(ns)])
    for j in range(1, ns - 1):
        if d2[j - 1] * d2[j] < 0.0 or d2[j] * d2[j + 1] < 0.0:
            _slope_clamp(h, hci, u, uel, uer, j)
    for j in range(2, ns - 1):
        if (uel[j] - uer[j - 1]) * (u[j] - u[j - 1]) < 0.0:
            uel[j] = 0.5 * (uer[j - 1] + uel[j])
            uer[j - 1] = uel[j]
    for j in range(1, ns - 1):
        if d2[j - 1] * d2[j] < 0.0 or d2[j] * d2[j + 1] < 0.0:
            _parabola_limit(u, uel, uer, j)


def limit_ppm_boundary(h, u, uel, uer, pc_left=False, pc_right=False):
    """mod_hor3map.F90:2000-2070."""
    ns = len(u)
    if pc_left:
        uel[0] = u[0]
        uer[0] = u[0]
    else:
        if (u[1] - uer[0]) * (u[0] - uer[0]) > 0.0:
            uel[0] = u[0]
            uer[0] = u[0]
        else:
            s = 2.0 * (u[2] - u[1]) / (h[1] + h[2])
            if s > 0:
                uer[0] = max(u[0], min(uer[0], u[0] + s * h[0] / 3.0))
            else:
                uer[0] = min(u[0], max(uer[0], u[0] + s * h[0] / 3.0))
            uel[0] = 0.5 * (3.0 * u[0] - uer[0])
    if pc_right:
        uel[ns - 1] = u[ns - 1]
        uer[ns - 1] = u[ns - 1]
    else:
        if (u[ns - 1] - uel[ns - 1]) * (u[ns - 2] - uel[ns - 1]) > 0.0:
            uel[ns - 1] = u[ns - 1]
            uer[ns - 1] = u[ns - 1]
        else:
            s = 2.0 * (u[ns - 2] - u[ns - 3]) / (h[ns - 3] + h[ns - 2])
            if s > 0:
                uel[ns - 1] = min(u[ns - 1],
                                  max(uel[ns - 1],
                                      u[ns - 1] - s * h[ns - 1] / 3.0))
            else:
                uel[ns - 1] = max(u[ns - 1],
                                  min(uel[ns - 1],
                                      u[ns - 1] - s * h[ns - 1] / 3.0))
            uer[ns - 1] = 0.5 * (3.0 * u[ns - 1] - uel[ns - 1])


def limit_ppm_posdef(u, uel, uer):
    """mod_hor3map.F90:2072-2098."""
    ns = len(u)
    for j in range(ns):
        min_u_0 = min(u[j], 0.0)
        uel[j] = max(uel[j], min_u_0)
        uer[j] = max(uer[j], min_u_0)
        sl = 2.0 * (3.0 * u[j] - 2.0 * uel[j] - uer[j])
        a2 = 3.0 * (uel[j] - 2.0 * u[j] + uer[j])
        sr = sl + 2.0 * a2
        if sl < 0.0 and sr > 0.0:
            if a2 * uel[j] - 0.25 * sl * sl < a2 * min_u_0:
                q = 3.0 * u[j] / (3.0 * sl * sr + 4.0 * a2 * a2)
                uel[j] = sl * sl * q
                uer[j] = sr * sr * q


def ppm_reconstruct(x_edge, u, limiting='non_oscillatory',
                    lb_ord=4, rb_ord=4, pc_left=False, pc_right=False):
    """Full PPM reconstruction of one column: returns polycoeff (3, ns)
    with f(xi) = c0 + c1*xi + c2*xi^2 on xi in [0, 1] per cell
    (prepare_ppm + reconstruct + polycoeff_ppm).  Assumes all cells are
    comfortably wide (no merging path)."""
    ns = len(u)
    h = np.abs(np.diff(x_edge))
    hci = np.zeros(ns)
    for j in range(1, ns - 1):
        hci[j] = 2.0 / (h[j - 1] + 2.0 * h[j] + h[j + 1])
    lb_ord = min(ns, lb_ord, 4)
    rb_ord = min(ns, rb_ord, 4)

    uedge = reconstruct_ppm_edge_values(h, u, lb_ord, rb_ord)
    uel = uedge[:-1].copy()
    uer = uedge[1:].copy()

    if limiting == 'monotonic':
        limit_ppm_interior_monotonic(h, hci, u, uel, uer)
        limit_ppm_boundary(h, u, uel, uer, pc_left, pc_right)
    elif limiting == 'non_oscillatory':
        limit_ppm_interior_non_oscillatory(h, hci, u, uel, uer)
        limit_ppm_boundary(h, u, uel, uer, pc_left, pc_right)
    elif limiting == 'non_oscillatory_posdef':
        limit_ppm_interior_non_oscillatory(h, hci, u, uel, uer)
        limit_ppm_boundary(h, u, uel, uer, pc_left, pc_right)
        limit_ppm_posdef(u, uel, uer)
    elif limiting != 'no_limiting':
        raise ValueError(limiting)

    pc = np.zeros((3, ns))
    for j in range(ns):
        pc[0, j] = uel[j]
        pc[1, j] = 6.0 * u[j] - 4.0 * uel[j] - 2.0 * uer[j]
        pc[2, j] = 3.0 * (uel[j] - 2.0 * u[j] + uer[j])
    return pc


def remap_ppm(x_edge_src, pc, u_src, x_edge_dst):
    """PPM remap of one column by exact piecewise-parabola integration
    (the PPM branch of remap, mod_hor3map.F90:4723-4790).  Destination
    cells of (near-)zero width get the reconstruction point value."""
    ns = pc.shape[1]
    nd = len(x_edge_dst) - 1
    u_dst = np.zeros(nd)

    def integral(js, xil, xir):
        """Integral of cell js's parabola over [xil, xir] in xi units,
        times the source cell width."""
        h = x_edge_src[js + 1] - x_edge_src[js]

        def anti(x):
            return ((pc[2, js] * x / 3.0 + pc[1, js] / 2.0) * x
                    + pc[0, js]) * x
        return h * (anti(xir) - anti(xil))

    def point(js, xi):
        return (pc[2, js] * xi + pc[1, js]) * xi + pc[0, js]

    for jd in range(nd):
        pl = x_edge_dst[jd]
        pr = x_edge_dst[jd + 1]
        if pr - pl <= 1.e-11:
            # point value at pl in its source layer
            js = int(np.clip(np.searchsorted(x_edge_src, pl,
                                             side='right') - 1, 0, ns - 1))
            hs = x_edge_src[js + 1] - x_edge_src[js]
            xi = (pl - x_edge_src[js]) / hs if hs > 0 else 0.0
            u_dst[jd] = point(js, np.clip(xi, 0.0, 1.0))
            continue
        acc = 0.0
        for js in range(ns):
            sl = max(x_edge_src[js], pl)
            sr = min(x_edge_src[js + 1], pr)
            if sr <= sl:
                continue
            hs = x_edge_src[js + 1] - x_edge_src[js]
            xil = (sl - x_edge_src[js]) / hs
            xir = (sr - x_edge_src[js]) / hs
            acc += integral(js, xil, xir)
        u_dst[jd] = acc / (pr - pl)
    return u_dst
