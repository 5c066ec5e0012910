"""AcadosOcpBatchSolver: N_batch solves as one sharded vmap.

API mirror of the reference batch solver
(/root/reference/interfaces/acados_template/acados_template/acados_ocp_batch_solver.py:60-768),
whose backend is an OpenMP parallel-for over independent C capsules
(acados_solver.in.c:3223-3244). Here the batch is one vmapped jitted solve
whose leading axis is sharded over all available devices (ICI), so the same
code scales from 1 chip to a multi-host slice. `num_threads_in_batch_solve`
is accepted for compatibility and ignored.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.interface.acados_ocp import AcadosOcp
from acados_tpu.interface.builder import build_ocp, data_to_jax
from acados_tpu.interface.solver import AcadosOcpSolver, _sqp_opts_from
from acados_tpu.ocp_nlp.linearize import NlpIterate
from acados_tpu.ocp_nlp.sqp import make_sqp_solver
from acados_tpu.parallel.mesh import make_batch_mesh, shard_batch


class _BatchView:
    """Per-instance get/set view (reference: batch_solver.ocp_solvers[i])."""

    def __init__(self, parent, i):
        self._p = parent
        self._i = i

    def set(self, stage, field, value):
        value = np.atleast_1d(np.asarray(value, np.float64))
        p, i = self._p, self._i
        if field in ("x", "u", "pi", "sl", "su"):
            p._iterate[field][i, stage] = value
            return
        if field == "p":
            p._data["p"][i, stage] = value
            return
        if field in ("yref", "W"):
            key = (field + "_0" if stage == 0
                   else field + "_e" if stage == p.N else field)
            if stage in (0, p.N):
                p._data[key][i] = value
            else:
                p._data[key][i, stage - 1] = value
            return
        if field in ("lbx", "ubx", "lbu", "ubu", "lg", "ug", "lh", "uh"):
            lay = p._layout(stage)
            lower = field.startswith("l")
            kind = field[1:]
            off, n = {"bx": (lay.off_bx, lay.nbx),
                      "bu": (lay.off_bu, lay.nbu),
                      "g": (lay.off_g, lay.ng),
                      "h": (lay.off_h, lay.nh)}[kind]
            if stage == 0:
                p._data["lb_0" if lower else "ub_0"][i, off:off + n] = value
            elif stage == p.N:
                p._data["lb_e" if lower else "ub_e"][i, off:off + n] = value
            else:
                p._data["lb" if lower else "ub"][i, stage - 1,
                                                 off:off + n] = value
            return
        raise ValueError(field)

    def get(self, stage, field):
        p, i = self._p, self._i
        if field in ("x", "u", "pi", "sl", "su"):
            return p._iterate[field][i, stage].copy()
        raise ValueError(field)

    def get_status(self):
        return int(p_status[self._i]) if (p_status := self._p._status) \
            is not None else None


class AcadosOcpBatchSolver:
    """Batch of N_batch identical-structure OCPs solved as one vmap."""

    def __init__(self, ocp: AcadosOcp, N_batch: int,
                 num_threads_in_batch_solve=None, json_file=None,
                 build=None, generate=None, verbose=False, devices=None):
        del num_threads_in_batch_solve, json_file, build, generate, verbose
        self.acados_ocp = ocp
        self.N_batch = N_batch
        self.form, data1, self.layouts = build_ocp(ocp)
        self.opts = _sqp_opts_from(ocp)
        self.dtype = (jnp.float64 if ocp.solver_options.dtype == "float64"
                      else jnp.float32)
        self.N = self.form.N
        solve1 = make_sqp_solver(self.form, self.opts)
        self._solve_fn = jax.jit(jax.vmap(solve1))
        self.mesh = make_batch_mesh(devices)
        # batch-tiled host data
        self._data = {k: np.tile(v, (N_batch,) + (1,) * np.ndim(v))
                      for k, v in data1.items()}
        N, nx, nu, nc = self.form.N, self.form.nx, self.form.nu, self.form.nc
        z = lambda *s: np.zeros((N_batch,) + s)
        self._iterate = dict(x=z(N + 1, nx), u=z(N, nu), pi=z(N, nx),
                             lam_l=z(N + 1, nc), lam_u=z(N + 1, nc),
                             sl=z(N + 1, nc), su=z(N + 1, nc))
        self.ocp_solvers = [_BatchView(self, i) for i in range(N_batch)]
        self._status = None
        self._stats = None
        self._time_tot = float("nan")

    def _layout(self, stage):
        return self.layouts["0" if stage == 0
                            else ("e" if stage == self.N else "p")]

    def solve(self, n_batch=None):
        """Solve all instances; returns array of statuses."""
        del n_batch
        data = data_to_jax(self._data, self.dtype)
        init = NlpIterate(**{k: jnp.asarray(v, self.dtype)
                             for k, v in self._iterate.items()})
        if len(self.mesh.devices.flat) > 1 and \
                self.N_batch % len(self.mesh.devices.flat) == 0:
            data = shard_batch(data, self.mesh)
            init = shard_batch(init, self.mesh)
        t0 = time.perf_counter()
        it, stats = self._solve_fn(data, init)
        # true fence: a host transfer (block_until_ready returns before
        # execution completes on the axon TPU tunnel)
        _ = np.asarray(jnp.ravel(stats.status)[0])
        self._time_tot = time.perf_counter() - t0
        self._iterate = {k: np.asarray(getattr(it, k))
                         for k in self._iterate}
        self._stats = stats
        self._status = np.asarray(stats.status)
        self._phase_cache = None
        return self._status

    # -- batched RTI phase API ------------------------------------------------
    # Reference: the generated capsule's batched phase entries
    # (batch_setup_qp_matrices_and_factorize, acados_solver.in.c:3246)
    # OpenMP-parallelize the preparation phase over capsules; here the
    # phases are make_rti_solver's (prepare, feedback) vmapped over the
    # batch — the deployment shape of an RL / scenario-MPC loop: prepare
    # between samples, inject the measured x0 batch, feedback.

    def _ensure_rti_fns(self):
        if self.acados_ocp.solver_options.nlp_solver_type != "SQP_RTI":
            raise RuntimeError("batched prepare/feedback requires "
                               "nlp_solver_type == 'SQP_RTI'")
        if getattr(self, "_rti_batch_fns", None) is None:
            from acados_tpu.ocp_nlp.rti import make_rti_solver
            prep1, fb1 = make_rti_solver(self.form, self.opts)
            self._rti_batch_fns = (
                jax.jit(jax.vmap(lambda d, i: prep1(d, i))),
                jax.jit(jax.vmap(lambda d, i, c: prep1(d, i,
                                                       prev_cache=c))),
                jax.jit(jax.vmap(fb1)))
            self._rti_cache = None

    def _batch_data_init(self):
        data = data_to_jax(self._data, self.dtype)
        init = NlpIterate(**{k: jnp.asarray(v, self.dtype)
                             for k, v in self._iterate.items()})
        return data, init

    def prepare(self):
        """Batched RTI preparation: linearize + predictor-QP solve for
        every instance (one vmapped program). Call between samples; the
        cache feeds the next feedback(). AS-RTI levels (as_rti_level in
        the options) advance from the previous cycle's cache
        automatically."""
        self._ensure_rti_fns()
        prep0, prep_prev, _ = self._rti_batch_fns
        data, init = self._batch_data_init()
        if self._rti_cache is None \
                or self.opts.as_rti_level == "STANDARD":
            cache = prep0(data, init)
        else:
            cache = prep_prev(data, init, self._rti_cache)
        _ = np.asarray(jnp.ravel(cache.g0)[0])  # fence
        self._rti_cache = cache

    # reference capsule spelling
    setup_qp_matrices_and_factorize = prepare

    def feedback(self, x0=None):
        """Batched RTI feedback: inject fresh initial states and solve
        the prepared QPs (warm-started from the predictor solutions).

        x0: optional (N_batch, nbx0) measured initial states; None keeps
        the bounds already set (per-instance constraints_set). Returns
        the (N_batch,) status array."""
        if getattr(self, "_rti_cache", None) is None:
            raise RuntimeError("call prepare() before feedback()")
        if x0 is not None:
            lay = self._layout(0)
            x0 = np.asarray(x0, np.float64).reshape(self.N_batch, lay.nbx)
            sl = slice(lay.off_bx, lay.off_bx + lay.nbx)
            self._data["lb_0"][:, sl] = x0
            self._data["ub_0"][:, sl] = x0
        _, _, fb = self._rti_batch_fns
        data, init = self._batch_data_init()
        t0 = time.perf_counter()
        it, stats = fb(self._rti_cache, data, init)
        _ = np.asarray(jnp.ravel(stats.status)[0])  # fence
        self._time_tot = time.perf_counter() - t0
        self._iterate = {k: np.asarray(getattr(it, k))
                         for k in self._iterate}
        self._stats = stats
        self._status = np.asarray(stats.status)
        self._phase_cache = None
        return self._status

    # flattened iterate API (reference get_flat/set_flat,
    # acados_ocp_batch_solver.py)
    def get_flat(self, field: str):
        if field in ("x", "u", "pi", "sl", "su"):
            return self._iterate[field].reshape(self.N_batch, -1).copy()
        if field == "lam":
            return np.concatenate([self._iterate["lam_l"],
                                   self._iterate["lam_u"]],
                                  axis=2).reshape(self.N_batch, -1)
        raise ValueError(field)

    def set_flat(self, field: str, value):
        if field == "lam":
            nc = self._iterate["lam_l"].shape[2]
            lam = np.asarray(value, np.float64).reshape(
                self.N_batch, -1, 2 * nc)
            self._iterate["lam_l"] = lam[:, :, :nc].copy()
            self._iterate["lam_u"] = lam[:, :, nc:].copy()
            return
        tgt = self._iterate[field]
        self._iterate[field] = np.asarray(value, np.float64).reshape(
            tgt.shape)

    def store_iterate_to_flat_obj(self):
        """Reference: AcadosOcpFlattenedBatchIterate."""
        from acados_tpu.interface.iterate import \
            AcadosOcpFlattenedBatchIterate
        return AcadosOcpFlattenedBatchIterate(
            x=self.get_flat("x"), u=self.get_flat("u"),
            pi=self.get_flat("pi"), lam=self.get_flat("lam"),
            sl=self.get_flat("sl"), su=self.get_flat("su"),
            N_batch=self.N_batch)

    def load_iterate_from_flat_obj(self, flat):
        for f in ("x", "u", "pi", "lam", "sl", "su"):
            self.set_flat(f, getattr(flat, f))

    def eval_solution_sensitivity(self, stages, with_respect_to,
                                  return_sens_x=True,
                                  return_sens_u=True,
                                  sanity_checks=True):
        """Batched forward solution sensitivities (reference
        acados_ocp_batch_solver.py:342): one program vmapped over
        (batch x seed directions).

        Returns arrays with shape (B, len(stages), dim, n_seeds)."""
        del sanity_checks
        from acados_tpu.ocp_nlp.sensitivity import (KktFactor, SensOpts,
                                                    forward_sensitivity)
        if isinstance(stages, int):
            stages = [stages]
        form = self.form
        data = data_to_jax(self._data, self.dtype)
        init = NlpIterate(**{k: jnp.asarray(v, self.dtype)
                             for k, v in self._iterate.items()})
        zero1 = jax.tree.map(
            lambda a: jnp.zeros_like(a[0]), data)
        if with_respect_to in ("params_global", "p_global", "p"):
            n_wrt = self.form.np_
            def seed(i):
                p = jnp.zeros_like(zero1.p).at[:, i].set(1.0)
                return zero1.replace(p=p)
        elif with_respect_to == "initial_state":
            lay = self._layout(0)
            n_wrt = lay.nbx
            def seed(i):
                e = jnp.zeros_like(zero1.lb_0).at[lay.off_bx + i].set(1.0)
                return zero1.replace(lb_0=e, ub_0=e)
        else:
            raise ValueError(with_respect_to)
        seeds = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[seed(i) for i in range(n_wrt)])

        def one(data1, it1):
            kf = KktFactor(form, SensOpts(), data1, it1)
            dx, du, _, _, _ = jax.vmap(
                lambda d: forward_sensitivity(kf, d))(seeds)
            return dx, du

        dxs, dus = jax.jit(jax.vmap(one))(data, init)
        dxs = np.moveaxis(np.asarray(dxs), 1, -1)  # (B, N+1, nx, n_wrt)
        dus = np.moveaxis(np.asarray(dus), 1, -1)
        sens_x = np.stack([dxs[:, s] for s in stages], axis=1)
        sens_u = np.stack(
            [dus[:, s] if s < self.N
             else np.zeros_like(dus[:, 0]) for s in stages], axis=1)
        out = []
        if return_sens_x:
            out.append(sens_x)
        if return_sens_u:
            out.append(sens_u)
        return tuple(out) if len(out) > 1 else out[0]

    def eval_adjoint_solution_sensitivity(self, seed_x, seed_u,
                                          with_respect_to="params_global",
                                          sanity_checks=True):
        """Batched adjoint solution sensitivities (the RL policy-gradient
        path). Reference: acados_ocp_batch_solver.py:227 ->
        ocp_nlp_eval_solution_sens_adj_p; here one vmapped Riccati-factored
        IFT solve over the batch.

        seed_x/seed_u: arrays (B, N+1, nx) / (B, N, nu), or lists of
        (stage, (B, dim) array) pairs, or None. Returns (B, np) for
        'params_global' / 'p_global'."""
        del sanity_checks
        from acados_tpu.ocp_nlp.sensitivity import (KktFactor, SensOpts,
                                                    adjoint_sensitivity)
        B, N, nx, nu = self.N_batch, self.N, self.form.nx, self.form.nu
        sx = np.zeros((B, N + 1, nx))
        su = np.zeros((B, N, nu))

        def fill(tgt, seeds):
            if seeds is None:
                return
            if isinstance(seeds, (list, tuple)):
                for stage, vec in seeds:
                    v = np.asarray(vec)
                    if v.ndim == 3:  # (B, dim, n_seeds): sum seed columns
                        v = v.sum(axis=-1)
                    tgt[:, stage] += v.reshape(tgt[:, stage].shape)
            else:
                tgt[:] = np.asarray(seeds).reshape(tgt.shape)

        fill(sx, seed_x)
        fill(su, seed_u)

        form = self.form

        def one(data, it, seed_x1, seed_u1):
            kf = KktFactor(form, SensOpts(), data, it)
            return adjoint_sensitivity(kf, seed_x1, seed_u1)

        data = data_to_jax(self._data, self.dtype)
        init = NlpIterate(**{k: jnp.asarray(v, self.dtype)
                             for k, v in self._iterate.items()})
        grad = jax.jit(jax.vmap(one))(data, init,
                                      jnp.asarray(sx, self.dtype),
                                      jnp.asarray(su, self.dtype))
        if with_respect_to in ("params_global", "p_global", "p"):
            return np.asarray(grad.p).sum(axis=1)
        if with_respect_to == "p_stagewise":
            return np.asarray(grad.p)
        if with_respect_to == "all":
            return grad
        raise ValueError(with_respect_to)

    def get_stats(self, field):
        if field == "time_tot":
            return self._time_tot
        if field == "sqp_iter" or field == "nlp_iter":
            return np.asarray(self._stats.sqp_iter)
        if field == "qp_iter":
            return np.asarray(self._stats.qp_iter_total)
        if field in ("time_lin", "time_qp", "time_sim", "time_reg",
                     "time_glob"):
            return self._phase_times()[field]
        raise ValueError(field)

    def _phase_times(self):
        """Batched per-phase times by FUSED DIFFERENCING (reference
        timing surface: ocp_nlp_timings, ocp_nlp_common.h:410-428).

        Ordered host-clock callbacks do not vmap, so the batched solve
        cannot measure its phases from inside. Instead: time the
        linearization as a fused program (outputs tree-summed so XLA
        keeps the production layouts), then the fused linearize+QP
        program with the PRODUCTION QP configuration (x0 elimination,
        condensing, scaling), both at the last solve's iterate; the
        difference attributes the QP phase. Inputs are normalized
        through host numpy first — a standalone program fed device
        arrays from another program pays input-layout conversion that
        would corrupt the differencing. Scaled by the lockstep
        iteration count (the batch max: that is what a vmapped
        while_loop actually executes). Cached per solve."""
        if getattr(self, "_phase_cache", None) is not None:
            return self._phase_cache
        import time as _time

        from acados_tpu.ocp_nlp.linearize import (build_static_rows,
                                                  linearize)
        from acados_tpu.ocp_nlp.regularize import regularize_qp
        from acados_tpu.ocp_nlp.sqp import use_x0_elimination
        from acados_tpu.ocp_qp.data import OcpQpSol
        from acados_tpu.ocp_qp.ipm import solve_ocp_qp
        from acados_tpu.ocp_qp.xcond import solve_ocp_qp_xcond

        form, opts = self.form, self.opts
        data, it = self._batch_data_init()
        lm = jnp.asarray(opts.levenberg_marquardt, self.dtype)
        x0f = use_x0_elimination(form, opts)
        static_rows = build_static_rows(form, self.dtype)

        def qp_solve(qp, i):
            # mirror of make_sqp_solver's backend dispatch, including
            # the first-QP-from-NLP warm start (without it the chain's
            # attribution pays cold barrier re-centering — 7 IPM iters
            # — that the warm production path never executes)
            warm = None
            if opts.warm_start_first_qp_from_nlp:
                warm = OcpQpSol(
                    x=jnp.zeros_like(qp.q), u=jnp.zeros_like(qp.r),
                    pi=i.pi, lam_lg=i.lam_l, lam_ug=i.lam_u,
                    t_lg=jnp.ones_like(i.lam_l),
                    t_ug=jnp.ones_like(i.lam_u), sl=i.sl, su=i.su)
            if opts.qpscaling != "NO_SCALING":
                from acados_tpu.ocp_qp.qpscaling import scale_qp
                qp, _ = scale_qp(qp,
                                 unit_rows_0=form.nx if x0f else 0)
                warm = None  # warm point is in unscaled units
            qp = regularize_qp(qp, opts.regularize_method,
                               opts.reg_epsilon)
            if opts.full_cond:
                return solve_ocp_qp_xcond(qp, opts.qp_opts,
                                          full_cond=True)
            if opts.cond_N is not None:
                return solve_ocp_qp_xcond(
                    qp, opts.qp_opts, cond_N=opts.cond_N,
                    warm=warm,
                    cond_block_size=opts.cond_block_size,
                    x0_fixed=x0f)
            return solve_ocp_qp(qp, opts.qp_opts, warm=warm,
                                x0_fixed=x0f)

        lin = jax.jit(jax.vmap(lambda d, i: jax.tree.map(
            jnp.sum, linearize(form, static_rows, d, i, lm))))
        both = jax.jit(jax.vmap(lambda d, i: qp_solve(
            linearize(form, static_rows, d, i, lm), i)))

        def timed(f, reps=3):
            out = f(data, it)
            _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
            ts = []
            for _i in range(reps):
                t0 = _time.perf_counter()
                out = f(data, it)
                _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
                ts.append(_time.perf_counter() - t0)
            return min(ts)

        t_lin = timed(lin)
        t_both = timed(both)
        t_qp = max(t_both - t_lin, 0.0)
        n_iter = (int(np.max(np.asarray(self._stats.sqp_iter)))
                  if self._stats is not None else 1) or 1
        self._phase_cache = {
            "time_lin": t_lin * n_iter,
            "time_sim": t_lin * n_iter,  # fused lin includes the sweep
            "time_reg": 0.0,             # fused into the QP program
            "time_qp": t_qp * n_iter,
            "time_glob": max(0.0,
                             self._time_tot - t_both * n_iter),
        }
        return self._phase_cache
