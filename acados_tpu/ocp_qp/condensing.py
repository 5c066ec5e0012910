"""Partial condensing: N-stage OCP-QP -> N2-stage OCP-QP (horizon re-blocking).

TPU-native counterpart of the reference's partial condensing wrapper
(/root/reference/acados/ocp_qp/ocp_qp_partial_condensing.c:172-253, which
wraps HPIPM's d_part_cond_qp_*): groups of M = N/N2 consecutive stages are
condensed into one stage whose state is the block-entry state and whose
control stacks the block's M controls. Intermediate states are eliminated
by forward substitution

    x_{k0+i} = Gamma_i x_bar + Phi_i u_bar + gamma_i .

Why this matters on TPU: the sequential Riccati scan is O(N) steps of tiny
(nx, nu) algebra — latency-bound on the MXU. Condensing trades scan length
for per-stage matrix size ((M*nu)-wide blocks), exactly the knob
`qp_solver_cond_N` exposes in the reference (docs/features/index.md:115-119).
The condensing itself is one `vmap` over blocks: every block's elimination
runs in parallel as batched matmuls.

Deviations from HPIPM:
- uniform block size only (N2 must divide N); HPIPM distributes a remainder
  over the first blocks (d_part_cond_qp_compute_block_size). Static XLA
  shapes favor uniformity; the interface layer picks a divisor of N.
- constraint rows of all block stages are carried as condensed general rows
  (this matches HPIPM: state bounds of eliminated stages become general
  constraints on (x_bar, u_bar)).

Expansion recovers the full-horizon primal/dual solution, including the
eliminated dynamics multipliers pi via the stage-wise stationarity identity
(the reference expands via d_part_cond_qp_expand_sol).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from acados_tpu.ocp_qp.data import OcpQp, OcpQpSol
from acados_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class PartialCondCache:
    """Per-block elimination operators needed to expand the solution.

    Gams (N2, M, nx, nx)    x_{k0+i} = Gams[j,i] x_bar_j + ...
    Phis (N2, M, nx, M*nu)
    gams (N2, M, nx)
    """

    Gams: jnp.ndarray
    Phis: jnp.ndarray
    gams: jnp.ndarray


def _block_prop(A, B, b):
    """Within-block state propagation operators.

    A (M, nx, nx), B (M, nx, nu), b (M, nx) ->
      Gams/Phis/gams for i = 0..M-1 plus the block-exit triple
      (Gam_M, Phi_M, gam_M) = condensed (A_bar, B_bar, b_bar).
    """
    M, nx, nu = B.shape
    dt = A.dtype

    def step(carry, inp):
        Gam, Phi, gam = carry
        A_i, B_i, b_i, i = inp
        out = (Gam, Phi, gam)
        Gam_n = A_i @ Gam
        Phi_n = A_i @ Phi
        Phi_n = jax.lax.dynamic_update_slice(Phi_n, B_i, (0, i * nu))
        gam_n = A_i @ gam + b_i
        return (Gam_n, Phi_n, gam_n), out

    init = (jnp.eye(nx, dtype=dt), jnp.zeros((nx, M * nu), dt),
            jnp.zeros((nx,), dt))
    (GamM, PhiM, gamM), (Gams, Phis, gams) = jax.lax.scan(
        step, init, (A, B, b, jnp.arange(M)))
    return Gams, Phis, gams, GamM, PhiM, gamM


def _condense_block(A, B, b, Q, R, S, q, r, C, D, lg, ug):
    """Condense one block of M stages. All inputs are the block's M stages.

    Returns the condensed stage's cost/dynamics/constraint data.
    """
    M, nx, nu = B.shape
    nc = C.shape[1]
    dt = A.dtype
    Gams, Phis, gams, A_bar, B_bar, b_bar = _block_prop(A, B, b)

    # --- cost ---------------------------------------------------------------
    # x_i = Gam_i xb + Phi_i ub + gam_i;  u_i = E_i ub (contiguous blocks)
    Qg = jnp.einsum("iab,ib->ia", Q, gams) + q       # Q_i gam_i + q_i
    Q_bar = jnp.einsum("iax,iab,iby->xy", Gams, Q, Gams)
    q_bar = jnp.einsum("iax,ia->x", Gams, Qg)

    # R_bar = Phi'QPhi + blkdiag(R) + E'S Phi + (E'S Phi)'
    PQP = jnp.einsum("iau,iab,ibv->uv", Phis, Q, Phis)
    Rblk = jnp.zeros((M, nu, M, nu), dt)
    Rblk = Rblk.at[jnp.arange(M), :, jnp.arange(M), :].set(R)
    Rblk = Rblk.reshape(M * nu, M * nu)
    SPhi = jnp.einsum("iux,ixv->iuv", S, Phis).reshape(M * nu, M * nu)
    R_bar = PQP + Rblk + SPhi + SPhi.T
    S_bar = (jnp.einsum("iau,iab,ibx->ux", Phis, Q, Gams)
             + jnp.einsum("iux,ixy->iuy", S, Gams).reshape(M * nu, nx))
    r_bar = (jnp.einsum("iau,ia->u", Phis, Qg)
             + (jnp.einsum("iux,ix->iu", S, gams) + r).reshape(M * nu))

    # --- constraints ----------------------------------------------------------
    # g_i = C_i x_i + D_i u_i = (C_i Gam_i) xb + (C_i Phi_i + D_i E_i) ub
    #       + C_i gam_i
    C_bar = jnp.einsum("ica,iax->icx", C, Gams).reshape(M * nc, nx)
    CPhi = jnp.einsum("ica,iau->icu", C, Phis)            # (M, nc, M*nu)
    DE = jnp.zeros((M, nc, M, nu), dt)
    DE = DE.at[jnp.arange(M), :, jnp.arange(M), :].set(D)
    D_bar = (CPhi + DE.reshape(M, nc, M * nu)).reshape(M * nc, M * nu)
    Cg = jnp.einsum("ica,ia->ic", C, gams)
    lg_bar = (lg - Cg).reshape(M * nc)
    ug_bar = (ug - Cg).reshape(M * nc)

    cache = (Gams, Phis, gams)
    return (Q_bar, R_bar, S_bar, q_bar, r_bar, A_bar, B_bar, b_bar,
            C_bar, D_bar, lg_bar, ug_bar, cache)


def _resolve_keep(nc, keep_rows):
    """Static per-stage-class row-keep counts (n0, npath, nterm)."""
    if keep_rows is None:
        return nc, nc, nc
    if len(keep_rows) == 2:
        n0, npth = keep_rows
        ne = nc
    else:
        n0, npth, ne = keep_rows
    return min(int(n0), nc), min(int(npth), nc), min(int(ne), nc)


def partial_condense(qp: OcpQp, N2: int, keep_rows=None):
    """Condense an N-stage OcpQp to N2 stages (N2 must divide N).

    keep_rows: optional static (n0, npath) — the number of REAL rows of
    the initial / path stage classes (form.con_0.nrows, form.con.nrows).
    Rows beyond these are padding (statically disabled masks) and are
    PRUNED before condensing, so the condensed stage carries
    M*npath (+ stage-0 extras) rows instead of M*nc. This is the HPIPM
    analog of not promoting absent rows to general constraints
    (ocp_qp_partial_condensing.c:172-253 keeps only real rows); without
    it the row blowup swamps the scan-length saving (round-2 bench).
    Stage 0's rows beyond npath (e.g. the x0 equality rows) attach to
    condensed stage 0 uneliminated: its block-entry state IS x0.

    Returns (qp_cond, cache). The terminal stage carries the original
    terminal rows (padded into the condensed row budget).
    """
    d = qp.dims
    N, nx, nu, nc = d.N, d.nx, d.nu, d.nc
    if N % N2 != 0:
        raise ValueError(f"partial condensing needs N2 | N, got N={N}, "
                         f"N2={N2}")
    M = N // N2
    dt = qp.q.dtype
    n0, npth, ne = _resolve_keep(nc, keep_rows)
    n_extra = max(0, n0 - npth)
    ncb = max(M * npth + n_extra, ne)

    def blk(a):
        return a.reshape((N2, M) + a.shape[1:])

    out = jax.vmap(_condense_block)(
        blk(qp.A), blk(qp.B), blk(qp.b), blk(qp.Q[:N]), blk(qp.R),
        blk(qp.S), blk(qp.q[:N]), blk(qp.r),
        blk(qp.C[:N])[:, :, :npth], blk(qp.D)[:, :, :npth],
        blk(qp.lg[:N])[:, :, :npth], blk(qp.ug[:N])[:, :, :npth])
    (Q_b, R_b, S_b, q_b, r_b, A_b, B_b, b_b, C_b, D_b, lg_b, ug_b,
     (Gams, Phis, gams)) = out

    nrb = M * npth

    def rows_mat(Cp, term_C):
        """(N2, nrb, k) path rows -> (N2+1, ncb, k) padded + terminal."""
        k = term_C.shape[-1]
        out = jnp.zeros((N2 + 1, ncb, k), dt)
        out = out.at[:N2, :nrb].set(Cp.reshape(N2, nrb, k))
        return out.at[N2, :ne].set(term_C[:ne])

    def rows_vec(vp, term_v, fill):
        out = jnp.full((N2 + 1, ncb), fill, dt)
        out = out.at[:N2, :nrb].set(vp.reshape(N2, nrb))
        return out.at[N2, :ne].set(term_v[:ne])

    def stage_rows_vec(v, fill):
        """Original (N+1, nc) row vector -> condensed layout."""
        path = blk(v[:N])[:, :, :npth]
        return rows_vec(path, v[N], fill)

    C = rows_mat(C_b, qp.C[N])
    D = jnp.zeros((N2, ncb, M * nu), dt).at[:, :nrb].set(
        D_b.reshape(N2, nrb, M * nu))
    lg = rows_vec(lg_b, qp.lg[N], -1.0)
    ug = rows_vec(ug_b, qp.ug[N], 1.0)
    mask_l = stage_rows_vec(qp.mask_l, 0.0)
    mask_u = stage_rows_vec(qp.mask_u, 0.0)
    Zl = stage_rows_vec(qp.Zl, 0.0)
    Zu = stage_rows_vec(qp.Zu, 0.0)
    zl = stage_rows_vec(qp.zl, 0.0)
    zu = stage_rows_vec(qp.zu, 0.0)
    soft = stage_rows_vec(qp.soft_mask, 0.0)

    if n_extra:
        # stage-0 rows npth:n0, attached directly (Gam_0 = I, Phi_0 = 0)
        sl_ = slice(npth, n0)
        C = C.at[0, nrb:nrb + n_extra].set(qp.C[0, sl_])
        D = D.at[0, nrb:nrb + n_extra, :nu].set(qp.D[0, sl_])
        lg = lg.at[0, nrb:nrb + n_extra].set(qp.lg[0, sl_])
        ug = ug.at[0, nrb:nrb + n_extra].set(qp.ug[0, sl_])
        mask_l = mask_l.at[0, nrb:nrb + n_extra].set(qp.mask_l[0, sl_])
        mask_u = mask_u.at[0, nrb:nrb + n_extra].set(qp.mask_u[0, sl_])
        Zl = Zl.at[0, nrb:nrb + n_extra].set(qp.Zl[0, sl_])
        Zu = Zu.at[0, nrb:nrb + n_extra].set(qp.Zu[0, sl_])
        zl = zl.at[0, nrb:nrb + n_extra].set(qp.zl[0, sl_])
        zu = zu.at[0, nrb:nrb + n_extra].set(qp.zu[0, sl_])
        soft = soft.at[0, nrb:nrb + n_extra].set(qp.soft_mask[0, sl_])

    qp_cond = OcpQp(
        Q=jnp.concatenate([Q_b, qp.Q[N][None]]),
        R=R_b, S=S_b,
        q=jnp.concatenate([q_b, qp.q[N][None]]),
        r=r_b, A=A_b, B=B_b, b=b_b,
        C=C, D=D, lg=lg, ug=ug, mask_l=mask_l, mask_u=mask_u,
        Zl=Zl, Zu=Zu, zl=zl, zu=zu, soft_mask=soft,
    )
    return qp_cond, PartialCondCache(Gams=Gams, Phis=Phis, gams=gams)


def partial_expand(qp: OcpQp, cache: PartialCondCache,
                   sol_c: OcpQpSol, keep_rows=None) -> OcpQpSol:
    """Expand a condensed solution back to the full horizon.

    keep_rows must match the partial_condense call. Interior dynamics
    multipliers are recovered from the stationarity identity at
    eliminated states:
      pi_{k-1} = Q_k x_k + q_k + S_k'u_k - C_k'lam_k + A_k'pi_k .
    """
    d = qp.dims
    N, nx, nu, nc = d.N, d.nx, d.nu, d.nc
    N2, M = cache.Gams.shape[0], cache.Gams.shape[1]
    n0, npth, ne = _resolve_keep(nc, keep_rows)
    n_extra = max(0, n0 - npth)
    nrb = M * npth

    xb = sol_c.x            # (N2+1, nx)
    ub = sol_c.u            # (N2, M*nu)
    u = ub.reshape(N, nu)

    # interior states: x_{jM+i} = Gam_i xb_j + Phi_i ub_j + gam_i
    x_blocks = (jnp.einsum("jiab,jb->jia", cache.Gams, xb[:N2])
                + jnp.einsum("jiau,ju->jia", cache.Phis, ub)
                + cache.gams)
    x = jnp.concatenate([x_blocks.reshape(N, nx), xb[N2][None]])

    def unblk(v_c, fill=0.0):
        """Condensed rows (N2+1, ncb) -> original rows (N+1, nc); pruned
        padding rows take their disabled-row default `fill`."""
        out = jnp.full((N + 1, nc), fill, v_c.dtype)
        path = v_c[:N2, :nrb].reshape(N, npth)
        out = out.at[:N, :npth].set(path)
        if n_extra:
            out = out.at[0, npth:n0].set(v_c[0, nrb:nrb + n_extra])
        return out.at[N, :ne].set(v_c[N2, :ne])

    lam_l = unblk(sol_c.lam_lg)
    lam_u = unblk(sol_c.lam_ug)
    t_l = unblk(sol_c.t_lg, fill=1.0)
    t_u = unblk(sol_c.t_ug, fill=1.0)
    sl = unblk(sol_c.sl)
    su = unblk(sol_c.su)

    # pi: boundary multipliers are the condensed ones; interiors by a
    # per-block reversed scan over the stationarity identity.
    lam_d = qp.mask_l * lam_l - qp.mask_u * lam_u

    def blk(a):
        return a.reshape((N2, M) + a.shape[1:])

    # data at stages k = jM+i for i = 1..M-1 (interior states of block j)
    Qb = blk(qp.Q[:N])
    qb = blk(qp.q[:N])
    Sb = blk(qp.S)
    Ab = blk(qp.A)
    Cb = blk(qp.C[:N])
    ub_stage = blk(u)
    xb_stage = blk(x[:N])
    lamd_b = blk(lam_d[:N])

    def pi_block(pibar_j, Qj, qj, Sj, uj, Cj, lamj, Aj, xj):
        def step(pi_next, inp):
            Q_i, q_i, S_i, u_i, C_i, lam_i, A_i, x_i = inp
            pi_prev = (Q_i @ x_i + q_i + S_i.T @ u_i - C_i.T @ lam_i
                       + A_i.T @ pi_next)
            return pi_prev, pi_prev
        xs = (Qj[1:], qj[1:], Sj[1:], uj[1:], Cj[1:], lamj[1:], Aj[1:],
              xj[1:])
        _, pis = jax.lax.scan(step, pibar_j, xs, reverse=True)
        # pis[i-1] = pi_{jM+i-1} for i = 1..M-1; append the boundary pi.
        return jnp.concatenate([pis, pibar_j[None]])

    pi = jax.vmap(pi_block)(sol_c.pi, Qb, qb, Sb, ub_stage, Cb, lamd_b,
                            Ab, xb_stage).reshape(N, nx)

    return OcpQpSol(x=x, u=u, pi=pi, lam_lg=lam_l, lam_ug=lam_u,
                    t_lg=t_l, t_ug=t_u, sl=sl, su=su)


def condense_warm(warm: OcpQpSol, N2: int, keep_rows=None) -> OcpQpSol:
    """Map a full-horizon warm start onto the condensed variables
    (row layout must match partial_condense's keep_rows)."""
    N = warm.u.shape[0]
    M = N // N2
    nc = warm.lam_lg.shape[-1]
    n0, npth, ne = _resolve_keep(nc, keep_rows)
    n_extra = max(0, n0 - npth)
    nrb = M * npth
    ncb = max(nrb + n_extra, ne)

    def rows(v, fill):
        out = jnp.full((N2 + 1, ncb), fill, v.dtype)
        out = out.at[:N2, :nrb].set(v[:N, :npth].reshape(N2, nrb))
        if n_extra:
            out = out.at[0, nrb:nrb + n_extra].set(v[0, npth:n0])
        return out.at[N2, :ne].set(v[N, :ne])

    return OcpQpSol(
        x=jnp.concatenate([warm.x[:N:M], warm.x[N][None]]),
        u=warm.u.reshape(N2, M * warm.u.shape[-1]),
        pi=warm.pi[M - 1::M],
        lam_lg=rows(warm.lam_lg, 0.0), lam_ug=rows(warm.lam_ug, 0.0),
        t_lg=rows(warm.t_lg, 1.0), t_ug=rows(warm.t_ug, 1.0),
        sl=rows(warm.sl, 0.0), su=rows(warm.su, 0.0))


# ---------------------------------------------------------------------------
# Non-uniform block sizes (HPIPM remainder distribution) via inert padding
# ---------------------------------------------------------------------------

def hpipm_block_sizes(N: int, N2: int):
    """HPIPM's block-size rule: distribute the remainder over the FIRST
    blocks (reference d_part_cond_qp_compute_block_size, used at
    ocp_qp_partial_condensing.c:172-177): sizes = [M+1]*R + [M]*(N2-R)
    with M, R = divmod(N, N2)."""
    M, R = divmod(N, N2)
    return [M + 1] * R + [M] * (N2 - R)


def _pad_maps(N: int, N2: int, sizes=None):
    """Static index maps for padding ragged blocks to the uniform width
    Mmax: returns (Mmax, link_src (N2*Mmax,), link_real mask,
    node_src (N2*Mmax+1,), node_real mask, o2p_node (N+1,),
    o2p_link (N,)). sizes: explicit per-block sizes (reference
    qp_solver_cond_block_size); default = HPIPM's remainder rule."""
    import numpy as np

    bs = list(sizes) if sizes is not None else hpipm_block_sizes(N, N2)
    assert len(bs) == N2 and sum(bs) == N, (bs, N, N2)
    Mmax = max(bs)
    offs = np.concatenate([[0], np.cumsum(bs)])
    link_src, link_real = [], []
    node_src, node_real = [], []
    o2p_node = np.zeros(N + 1, np.int64)
    o2p_link = np.zeros(N, np.int64)
    for j in range(N2):
        for i in range(Mmax):
            t = j * Mmax + i
            if i < bs[j]:
                link_src.append(offs[j] + i)
                link_real.append(True)
                node_src.append(offs[j] + i)
                node_real.append(True)
                o2p_node[offs[j] + i] = t
                o2p_link[offs[j] + i] = t
            else:
                link_src.append(0)
                link_real.append(False)
                # padding nodes sit BEHIND the block's real links on
                # identity dynamics: the carried state is the block's
                # last real node, so warm starts lifted through this map
                # stay dynamically consistent at padding links
                node_src.append(offs[j] + bs[j])
                node_real.append(False)
    node_src.append(N)
    node_real.append(True)
    o2p_node[N] = N2 * Mmax
    return (Mmax, np.asarray(link_src), np.asarray(link_real),
            np.asarray(node_src), np.asarray(node_real), o2p_node,
            o2p_link)


def pad_qp_to_blocks(qp: OcpQp, N2: int, block_sizes=None):
    """Pad an N-stage QP with inert stages so every condensing block has
    the uniform width Mmax = ceil-ish per HPIPM's block sizes: padding
    links have identity dynamics (A=I, B=0, b=0) and unit control
    Hessian (R=I — the padded controls decouple and solve to zero);
    padding nodes carry zero cost and fully-masked rows. The padded QP's
    solution restricted to the real indices IS the original QP's
    solution (the inert stages change nothing).

    Returns (qp_padded, maps) with maps for unpad_sol."""
    N = qp.dims.N
    nx, nu = qp.dims.nx, qp.dims.nu
    dt = qp.q.dtype
    maps = _pad_maps(N, N2, sizes=block_sizes)
    Mmax, l_src, l_real, n_src, n_real, _, _ = maps
    lr = jnp.asarray(l_real)[:, None, None]
    lrv = jnp.asarray(l_real)[:, None]
    nr = jnp.asarray(n_real)[:, None, None]
    nrv = jnp.asarray(n_real)[:, None]
    ls = jnp.asarray(l_src)
    ns = jnp.asarray(n_src)

    eye = jnp.eye(nx, dtype=dt)
    eyeu = jnp.eye(nu, dtype=dt)
    gl = lambda a: a[ls]
    gn = lambda a: a[ns]
    qp_p = OcpQp(
        Q=jnp.where(nr, gn(qp.Q), 0.0),
        R=jnp.where(lr, gl(qp.R), eyeu),
        S=jnp.where(lr, gl(qp.S), 0.0),
        q=jnp.where(nrv, gn(qp.q), 0.0),
        r=jnp.where(lrv, gl(qp.r), 0.0),
        A=jnp.where(lr, gl(qp.A), eye),
        B=jnp.where(lr, gl(qp.B), 0.0),
        b=jnp.where(lrv, gl(qp.b), 0.0),
        C=jnp.where(nr, gn(qp.C), 0.0),
        D=jnp.where(lr, gl(qp.D), 0.0),
        lg=jnp.where(nrv, gn(qp.lg), -1.0),
        ug=jnp.where(nrv, gn(qp.ug), 1.0),
        mask_l=jnp.where(nrv, gn(qp.mask_l), 0.0),
        mask_u=jnp.where(nrv, gn(qp.mask_u), 0.0),
        Zl=jnp.where(nrv, gn(qp.Zl), 0.0),
        Zu=jnp.where(nrv, gn(qp.Zu), 0.0),
        zl=jnp.where(nrv, gn(qp.zl), 0.0),
        zu=jnp.where(nrv, gn(qp.zu), 0.0),
        soft_mask=jnp.where(nrv, gn(qp.soft_mask), 0.0),
    )
    return qp_p, maps


def unpad_sol(sol_p: OcpQpSol, maps) -> OcpQpSol:
    """Restrict a padded-horizon solution to the original indices."""
    _, _, _, _, _, o2p_node, o2p_link = maps
    pn = jnp.asarray(o2p_node)
    pl = jnp.asarray(o2p_link)
    g_n = lambda a: a[pn]
    g_l = lambda a: a[pl]
    return OcpQpSol(x=g_n(sol_p.x), u=g_l(sol_p.u), pi=g_l(sol_p.pi),
                    lam_lg=g_n(sol_p.lam_lg), lam_ug=g_n(sol_p.lam_ug),
                    t_lg=g_n(sol_p.t_lg), t_ug=g_n(sol_p.t_ug),
                    sl=g_n(sol_p.sl), su=g_n(sol_p.su))


def pad_warm_to_blocks(warm: OcpQpSol, maps) -> OcpQpSol:
    """Lift a warm start onto the padded horizon (padding controls zero,
    padding nodes inherit the block-interior state duals as zeros)."""
    _, l_src, l_real, n_src, n_real, _, _ = maps
    ls = jnp.asarray(l_src)
    ns = jnp.asarray(n_src)
    lrv = jnp.asarray(l_real)[:, None]
    nrv = jnp.asarray(n_real)[:, None]
    return OcpQpSol(
        x=warm.x[ns], u=jnp.where(lrv, warm.u[ls], 0.0),
        pi=jnp.where(lrv, warm.pi[ls], 0.0),
        lam_lg=jnp.where(nrv, warm.lam_lg[ns], 0.0),
        lam_ug=jnp.where(nrv, warm.lam_ug[ns], 0.0),
        t_lg=jnp.where(nrv, warm.t_lg[ns], 1.0),
        t_ug=jnp.where(nrv, warm.t_ug[ns], 1.0),
        sl=jnp.where(nrv, warm.sl[ns], 0.0),
        su=jnp.where(nrv, warm.su[ns], 0.0))
