"""AcadosOcpSolver: the user-facing solve/get/set surface.

API mirror of the reference AcadosOcpSolver
(/root/reference/interfaces/acados_template/acados_template/acados_ocp_solver.py):
solve / get / set / cost_set / constraints_set / get_stats / get_cost /
get_residuals / store_iterate / load_iterate / reset / solve_for_x0 /
print_statistics. Instead of codegen + ctypes into a C capsule
(acados_ocp_solver.py:126-355), construction builds a jitted SQP solve
closure; `set` mutates host-side numpy data that is shipped to device at
`solve()`. Data changes never recompile — only changing the problem
structure or options does.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from acados_tpu.interface.acados_ocp import AcadosOcp
from acados_tpu.interface.builder import StageLayout, build_ocp, data_to_jax
from acados_tpu.ocp_nlp.linearize import NlpIterate
from acados_tpu.ocp_nlp.rti import make_rti_solver
from acados_tpu.ocp_nlp.sensitivity import (KktFactor, SensOpts,
                                            adjoint_sensitivity,
                                            forward_sensitivity)
from acados_tpu.ocp_nlp.sqp import SqpOpts, make_sqp_solver
from acados_tpu.ocp_qp.ipm import IpmOpts
from acados_tpu.utils.types import ACADOS_INFTY


def _fence(tree):
    """True device fence: pull one scalar to host. On the axon TPU tunnel
    `jax.block_until_ready` returns before execution completes (verified:
    an 8k matmul "completed" in 0.05 ms without this), so all wall-clock
    timing must force a transfer."""
    leaf = jax.tree.leaves(tree)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    return tree


def _sqp_opts_from(ocp: AcadosOcp) -> SqpOpts:
    so = ocp.solver_options
    if so.sim_method_newton_tol != 0.0:
        raise NotImplementedError(
            "sim_method_newton_tol > 0 (tolerance-terminated IRK Newton) "
            "is not supported: the integrator runs a fixed newton_iter "
            "count inside jit (the reference's default, newton_tol = 0); "
            "raise sim_method_newton_iter instead")
    qp_tol = so.qp_tol
    if qp_tol is None:
        # QP solved tighter than the NLP tolerance (reference default
        # behavior: qp tol ~ 1e-2 * nlp tol, floor at dtype capability)
        qp_tol = min(so.nlp_solver_tol_stat * 1e-1, 1e-6) \
            if so.dtype == "float64" else max(
                so.nlp_solver_tol_stat * 1e-1, 1e-6)
    # hpipm_mode presets (reference acados_ocp_options.py:133, HPIPM
    # d_ocp_qp_ipm_arg_set_default dispatch, ocp_qp_hpipm.c:147-160):
    # SPEED caps the IPM iterations aggressively, ROBUST raises the cap,
    # backs off the fraction-to-boundary and starts the barrier high;
    # BALANCE = defaults. mu0 presets follow HPIPM's mode defaults
    # (low start for the warm-dominated modes, high for ROBUST).
    mode = {"BALANCE": dict(mu0=1e1), "SPEED": dict(iter_max=15, mu0=1e1),
            "SPEED_ABS": dict(iter_max=15, mu0=1e4),
            "ROBUST": dict(iter_max=100, tau=0.99, mu0=1e2)}[so.hpipm_mode]
    iter_max = mode.get("iter_max", so.qp_solver_iter_max)
    if so.qp_solver_iter_max != 50:   # user override beats the preset
        iter_max = so.qp_solver_iter_max
    mu0 = so.qp_solver_mu0 if so.qp_solver_mu0 > 0 else mode["mu0"]
    pick = lambda v: qp_tol if v is None else v
    qp_opts = IpmOpts(iter_max=iter_max, mu0=mu0,
                      tau=mode.get("tau", 0.995),
                      mu_min=so.tau_min,
                      tol_stat=pick(so.qp_solver_tol_stat),
                      tol_eq=pick(so.qp_solver_tol_eq),
                      tol_ineq=pick(so.qp_solver_tol_ineq),
                      tol_comp=pick(so.qp_solver_tol_comp))
    max_iter = (1 if so.nlp_solver_type == "SQP_RTI"
                else so.nlp_solver_max_iter)
    return SqpOpts(
        max_iter=max_iter,
        rti=(so.nlp_solver_type == "SQP_RTI"),
        warm_start_first_qp_from_nlp=bool(
            so.qp_solver_warm_start
            or so.nlp_solver_warm_start_first_qp_from_nlp
            or so.nlp_solver_warm_start_first_qp),
        tol_stat=so.nlp_solver_tol_stat, tol_eq=so.nlp_solver_tol_eq,
        tol_ineq=so.nlp_solver_tol_ineq, tol_comp=so.nlp_solver_tol_comp,
        tol_min_step_norm=(so.nlp_solver_tol_min_step_norm
                           if so.nlp_solver_tol_min_step_norm is not None
                           else so.tol_min_step_norm),
        timeout_max_time=so.timeout_max_time,
        timeout_heuristic=so.timeout_heuristic,
        levenberg_marquardt=so.levenberg_marquardt,
        with_adaptive_levenberg_marquardt=(
            so.with_adaptive_levenberg_marquardt),
        adaptive_levenberg_marquardt_lam=(
            so.adaptive_levenberg_marquardt_lam),
        adaptive_levenberg_marquardt_mu_min=(
            so.adaptive_levenberg_marquardt_mu_min),
        adaptive_levenberg_marquardt_mu0=(
            so.adaptive_levenberg_marquardt_mu0),
        regularize_method=so.regularize_method,
        reg_epsilon=so.reg_epsilon,
        globalization=(so.globalization
                       if so.nlp_solver_type != "SQP_RTI" else "FIXED_STEP"),
        alpha_min=so.globalization_alpha_min,
        alpha_reduction=so.globalization_alpha_reduction,
        line_search_use_sufficient_descent=(
            so.globalization_line_search_use_sufficient_descent),
        eps_sufficient_descent=so.globalization_eps_sufficient_descent,
        globalization_use_SOC=so.globalization_use_SOC,
        funnel_initialization_increase_factor=(
            so.globalization_funnel_init_increase_factor),
        funnel_initialization_upper_bound=(
            so.globalization_funnel_init_upper_bound),
        funnel_sufficient_decrease_factor=(
            so.globalization_funnel_sufficient_decrease_factor),
        funnel_kappa=so.globalization_funnel_kappa,
        funnel_fraction_switching_condition=(
            so.globalization_funnel_fraction_switching_condition),
        funnel_initial_penalty_parameter=(
            so.globalization_funnel_initial_penalty_parameter),
        cond_N=_resolve_cond(ocp), full_cond=_is_full_cond(so),
        cond_block_size=(tuple(int(b) for b in
                               so.qp_solver_cond_block_size)
                         if so.qp_solver_cond_block_size else None),
        as_rti_level=_as_rti_level_str(so.as_rti_level),
        as_rti_iter=so.as_rti_iter,
        as_rti_advancement=so.as_rti_advancement_strategy,
        step_length=(so.globalization_fixed_step_length
                     if so.globalization_fixed_step_length is not None
                     else so.nlp_solver_step_length),
        full_step_dual=so.globalization_full_step_dual,
        with_anderson_acceleration=so.with_anderson_acceleration,
        anderson_activation_threshold=so.anderson_activation_threshold,
        store_iterates=so.store_iterates,
        qpscaling=so.qpscaling_scale_objective,
        collect_phase_times=so.collect_phase_times,
        nlp_qp_tol_strategy=so.nlp_qp_tol_strategy,
        nlp_qp_tol_reduction_factor=so.nlp_qp_tol_reduction_factor,
        nlp_qp_tol_safety_factor=so.nlp_qp_tol_safety_factor,
        qp_opts=qp_opts)


def _is_full_cond(so) -> bool:
    return str(so.qp_solver).startswith("FULL_CONDENSING")


def _resolve_cond(ocp) -> int | None:
    """Map qp_solver_cond_N to the nearest divisor of N (xcond front-end;
    reference qp_solver_cond_N, ocp_qp_partial_condensing.c:250-253)."""
    so = ocp.solver_options
    if so.qp_solver_cond_N is None or _is_full_cond(so):
        return None
    from acados_tpu.ocp_qp.xcond import resolve_cond_N
    if hasattr(ocp, "N_list"):  # multiphase
        N = sum(ocp.N_list)
    else:
        N = so.N_horizon or ocp.dims.N
    return resolve_cond_N(N, so.qp_solver_cond_N)


def _as_rti_level_str(level) -> str:
    """Accept the reference's int encoding (0..4 = A,B,C,D,STANDARD,
    ocp_nlp_sqp_rti.h:70-77) or a string."""
    if isinstance(level, str):
        return level
    return {0: "A", 1: "B", 2: "C", 3: "D", 4: "STANDARD"}[int(level)]


class AcadosOcpSolver:
    """Drop-in style replacement for the reference class of the same name."""

    def __init__(self, ocp: AcadosOcp, json_file=None, build=None,
                 generate=None, verbose=False):
        del json_file, build, generate, verbose  # codegen-era args accepted
        self.acados_ocp = ocp
        from acados_tpu.interface.multiphase import (AcadosMultiphaseOcp,
                                                     build_mocp)
        self._is_mocp = isinstance(ocp, AcadosMultiphaseOcp)
        if self._is_mocp:
            # reference: AcadosOcpSolver accepts AcadosMultiphaseOcp
            # directly (acados_ocp_solver.py handles both problem classes)
            self.form, self._data, self.layouts = build_mocp(ocp)
        else:
            self.form, self._data, self.layouts = build_ocp(ocp)
        self.opts = _sqp_opts_from(ocp)
        self.dtype = (jnp.float64 if ocp.solver_options.dtype == "float64"
                      else jnp.float32)
        if self.dtype == jnp.float64 and not jax.config.read("jax_enable_x64"):
            raise RuntimeError("dtype float64 requires jax_enable_x64")
        self._solve_fn = self._make_solve_fn()
        self._solve_fn_noelim = None  # lazy barrier-x0 fallback (solve())
        self._rti_fns = None  # built lazily on first rti_phase use
        self._rti_phase = 0
        self._rti_cache = None
        self._rti_prev_cache = None
        self.N = self.form.N
        self._iterate = self._zero_iterate()
        self._default_init = True
        self._last_stats = None
        self._phase_cache = None
        self._print_level = int(ocp.solver_options.print_level)
        self._time_tot = float("nan")
        self._time_prep = float("nan")
        self._time_fb = float("nan")

    # -- iterate management --------------------------------------------------
    def _zero_iterate(self):
        N, nx, nu, nc = (self.form.N, self.form.nx, self.form.nu,
                         self.form.nc)
        z = lambda *s: np.zeros(s)
        return dict(x=z(N + 1, nx), u=z(N, nu), pi=z(N, nx),
                    lam_l=z(N + 1, nc), lam_u=z(N + 1, nc),
                    sl=z(N + 1, nc), su=z(N + 1, nc))

    def _iterate_jax(self) -> NlpIterate:
        return NlpIterate(**{k: jnp.asarray(v, self.dtype)
                             for k, v in self._iterate.items()})

    def reset(self, reset_qp_solver_mem=1):
        """Reference: acados_ocp_solver.py reset()."""
        del reset_qp_solver_mem
        self._iterate = self._zero_iterate()
        self._default_init = True
        self._rti_cache = None
        self._rti_prev_cache = None

    # -- options ---------------------------------------------------------------
    def options_set(self, field: str, value):
        """Reference: acados_ocp_solver.py options_set (subset: the
        runtime-settable options; structural ones raise)."""
        if field == "rti_phase":
            value = int(value)
            if value not in (0, 1, 2):
                raise ValueError("rti_phase must be 0, 1 or 2")
            if value and self.acados_ocp.solver_options.nlp_solver_type \
                    != "SQP_RTI":
                raise ValueError("rti_phase requires SQP_RTI")
            self._rti_phase = value
            return
        if field == "print_level":
            self._print_level = int(value)
            return
        if field == "levenberg_marquardt":
            self.opts = self.opts.replace(levenberg_marquardt=float(value))
        elif field in ("tol_stat", "tol_eq", "tol_ineq", "tol_comp"):
            self.opts = self.opts.replace(**{field: float(value)})
        elif field in ("qp_tol_stat", "qp_tol_eq", "qp_tol_ineq",
                       "qp_tol_comp"):
            self.opts = self.opts.replace(
                qp_opts=self.opts.qp_opts.replace(
                    **{field[3:]: float(value)}))
        elif field in ("step_length", "nlp_solver_step_length"):
            self.opts = self.opts.replace(step_length=float(value))
        elif field in ("alpha_min", "globalization_alpha_min"):
            self.opts = self.opts.replace(alpha_min=float(value))
        elif field in ("alpha_reduction", "globalization_alpha_reduction"):
            self.opts = self.opts.replace(alpha_reduction=float(value))
        elif field == "anderson_activation_threshold":
            self.opts = self.opts.replace(
                anderson_activation_threshold=float(value))
        elif field == "with_anderson_acceleration":
            self.opts = self.opts.replace(
                with_anderson_acceleration=bool(value))
        elif field == "store_iterates":
            self.opts = self.opts.replace(store_iterates=bool(value))
        elif field == "qp_mu0":
            self.opts = self.opts.replace(
                qp_opts=self.opts.qp_opts.replace(mu0=float(value)))
        elif field == "qp_iter_max":
            self.opts = self.opts.replace(
                qp_opts=self.opts.qp_opts.replace(iter_max=int(value)))
        elif field in ("timeout_max_time", "timeout_heuristic"):
            # predictive in-loop timeout (static in the jitted loop ->
            # rebuild the solve closure)
            if field == "timeout_max_time":
                self.acados_ocp.solver_options.timeout_max_time = \
                    float(value)
                self.opts = self.opts.replace(
                    timeout_max_time=float(value))
            else:
                self.acados_ocp.solver_options.timeout_heuristic = \
                    str(value)
                self.opts = self.opts.replace(
                    timeout_heuristic=str(value))
            self._solve_fn = self._make_solve_fn()
            return
        elif field == "warm_start_first_qp":
            return  # accepted: warm starting is explicit here
        else:
            # string-keyed fallback over the full options surface
            # (reference ocp_nlp_solver_opts_set dispatching,
            # ocp_nlp_interface.c:1309)
            if hasattr(self.opts, field):
                cur = getattr(self.opts, field)
                cast = type(cur) if cur is not None else (lambda v: v)
                self.opts = self.opts.replace(**{field: cast(value)})
            elif hasattr(self.acados_ocp.solver_options, field):
                setattr(self.acados_ocp.solver_options, field, value)
                self.opts = _sqp_opts_from(self.acados_ocp)
            else:
                raise ValueError(
                    f"options_set: unsupported field {field!r}")
        self._solve_fn = self._make_solve_fn()
        self._rti_fns = None

    def _make_solve_fn(self):
        """Plan dispatch (reference ocp_nlp_solver_t plan enum
        {SQP, SQP_RTI, SQP_WITH_FEASIBLE_QP, DDP},
        ocp_nlp_interface.h:51-59)."""
        kind = self.acados_ocp.solver_options.nlp_solver_type
        if kind == "DDP":
            from acados_tpu.ocp_nlp.ddp import make_ddp_solver
            return make_ddp_solver(self.form, self.opts)
        if kind == "SQP_WITH_FEASIBLE_QP":
            from acados_tpu.ocp_nlp.wfqp import make_wfqp_solver
            return make_wfqp_solver(self.form, self.opts)
        return make_sqp_solver(self.form, self.opts)

    def _ensure_rti(self):
        if self._rti_fns is None:
            self._rti_fns = make_rti_solver(self.form, self.opts)
        return self._rti_fns

    def _solve_rti_phase(self) -> int:
        prepare, feedback = self._ensure_rti()
        self._maybe_default_init()

        def _prepare():
            # AS-RTI levels reuse the previous cycle's cache (matrices for
            # B/C, iterate backup + QP for A); STANDARD ignores it.
            if (self.opts.as_rti_level != "STANDARD"
                    and self._rti_prev_cache is not None):
                return prepare(data_to_jax(self._data, self.dtype),
                               self._iterate_jax(), self._rti_prev_cache)
            return prepare(data_to_jax(self._data, self.dtype),
                           self._iterate_jax())

        if self._rti_phase == 1:
            t0 = time.perf_counter()
            self._rti_cache = _fence(_prepare())
            self._time_prep = time.perf_counter() - t0
            self._time_tot = self._time_prep
            # AS-RTI levels advance the internal iterate during preparation
            if self.opts.as_rti_level != "STANDARD":
                self._iterate = {k: np.asarray(getattr(self._rti_cache.it,
                                                       k))
                                 for k in self._iterate}
            return 0
        if self._rti_cache is None:
            # feedback without preparation: prepare implicitly (reference
            # requires the user to order the phases; be forgiving)
            t0 = time.perf_counter()
            self._rti_cache = _prepare()
            self._time_prep = time.perf_counter() - t0
        t0 = time.perf_counter()
        it, stats = _fence(feedback(
            self._rti_cache, data_to_jax(self._data, self.dtype),
            self._iterate_jax()))
        self._time_fb = time.perf_counter() - t0
        self._time_tot = self._time_fb
        self._iterate = {k: np.asarray(getattr(it, k))
                         for k in self._iterate}
        self._last_stats = stats
        self._rti_prev_cache = self._rti_cache
        self._rti_cache = None
        self._default_init = False
        return int(stats.status)

    # -- solve ----------------------------------------------------------------
    def _maybe_default_init(self):
        if not self._default_init:
            return
        # reference-style default initialization: x ~ x0 everywhere
        lay = self.layouts["0"]
        if lay.nbx:
            x0 = 0.5 * (self._data["lb_0"][:lay.nbx]
                        + self._data["ub_0"][:lay.nbx])
            xs = np.array(self._iterate["x"])
            idx = list(self.form.con_0.idxbx)
            xs[:, idx] = np.clip(x0, -1e6, 1e6)
            self._iterate["x"] = xs
        self._default_init = False

    def _x0_bounds_asymmetric(self) -> bool:
        """True when x0 elimination is active but lb_0 != ub_0 on the
        state rows (solve() then uses the barrier fallback)."""
        from acados_tpu.ocp_nlp.sqp import use_x0_elimination
        if not use_x0_elimination(self.form, self.opts):
            return False
        lay = self._layout(0)
        nx = self.form.nx
        off = lay.off_bx
        return not np.array_equal(self._data["lb_0"][off:off + nx],
                                  self._data["ub_0"][off:off + nx])

    def solve(self) -> int:
        """Solve; returns acados status (0 success). For SQP_RTI with
        rti_phase set via options_set, runs only that phase
        (reference: ocp_nlp_sqp_rti.c rti_phase PREPARATION/FEEDBACK)."""
        if self._rti_phase in (1, 2):
            return self._solve_rti_phase()
        self._maybe_default_init()
        from acados_tpu.utils.debug_checks import (check_iterate,
                                                   check_nlp_data,
                                                   debug_checks_enabled)
        if debug_checks_enabled(self.acados_ocp.solver_options):
            check_nlp_data(self._data)
            check_iterate(self._iterate)
        solve_fn = self._solve_fn
        if self._x0_bounds_asymmetric():
            # x0 elimination pins x0 to lb_0 and assumes lb_0 == ub_0 on
            # the state rows; constraints_set can legitimately open that
            # box (a genuine initial-state range), so the solve falls
            # back to the barrier treatment for THIS data (lazy second
            # jit; the reference reduce_eq_dof likewise only applies to
            # true equalities). Checked at solve time — setting lbx then
            # ubx is transiently asymmetric and must not trip this.
            if self._solve_fn_noelim is None:
                opts_ne = self.opts.replace(eliminate_x0=False)
                self._solve_fn_noelim = make_sqp_solver(self.form, opts_ne)
            solve_fn = self._solve_fn_noelim
        t0 = time.perf_counter()
        it, stats = solve_fn(data_to_jax(self._data, self.dtype),
                             self._iterate_jax())
        it, stats = _fence((it, stats))
        self._time_tot = time.perf_counter() - t0
        self._iterate = {k: np.asarray(getattr(it, k))
                         for k in self._iterate}
        self._last_stats = stats
        self._phase_cache = None
        if self._print_level > 0:
            # jit compiles the whole solve into one program, so the
            # iteration table prints post-hoc (reference prints live,
            # ocp_nlp_sqp.c:449-465)
            self.print_statistics()
        budget = self.acados_ocp.solver_options.timeout_max_time
        if budget and self._time_tot > budget and int(stats.status) != 0:
            return 7  # ACADOS_TIMEOUT (post-hoc; see options docstring)
        return int(stats.status)

    def solve_for_x0(self, x0_bar, fail_on_nonzero_status=True,
                     print_stats_on_failure=True):
        """Reference: acados_ocp_solver.py solve_for_x0."""
        self.set(0, "lbx", x0_bar)
        self.set(0, "ubx", x0_bar)
        status = self.solve()
        if status != 0:
            if print_stats_on_failure:
                self.print_statistics()
            if fail_on_nonzero_status:
                raise RuntimeError(f"solve failed with status {status}")
        return self.get(0, "u")

    # -- get / set -------------------------------------------------------------
    def _stage_dims(self, stage: int):
        """(nx, nu) at a stage; trims padding for multiphase problems
        (reference returns phase-dim arrays from the multi-solver)."""
        if not self._is_mocp:
            return self.form.nx, self.form.nu
        import numpy as _np
        starts = _np.cumsum(self.acados_ocp.N_list)
        i = int(_np.searchsorted(starts, stage, side="right"))
        i = min(i, len(self.acados_ocp.N_list) - 1)
        from acados_tpu.interface.multiphase import _phase_dims
        return _phase_dims(self.acados_ocp)[i]

    def get(self, stage: int, field: str):
        """Reference: ocp_nlp_get_at_stage (ocp_nlp_interface.c:1704)."""
        it = self._iterate
        if field == "x":
            return it["x"][stage][:self._stage_dims(stage)[0]].copy()
        if field == "u":
            return it["u"][stage][:self._stage_dims(stage)[1]].copy()
        if field == "pi":
            return it["pi"][stage].copy()
        if field in ("sl", "su"):
            lay = self._layout(stage)
            return it[field][stage][self._soft_slice(stage)].copy()
        if field == "lam":
            # reference lam layout: [lam_lb; lam_ub] over the stage's rows
            lay = self._layout(stage)
            n = lay.nrows
            return np.concatenate([it["lam_l"][stage][:n],
                                   it["lam_u"][stage][:n]])
        if field == "z":
            # algebraic variable at the shooting node (reference
            # ocp_nlp_get_at_stage 'z'; z at interval start from the IRK
            # stage solution — sim z output)
            if self.form.z_fun is None or stage >= self.N:
                return np.zeros((0,))
            import jax.numpy as jnp
            d = self._data
            return np.asarray(self.form.z_fun(
                jnp.asarray(it["x"][stage]), jnp.asarray(it["u"][stage]),
                jnp.asarray(np.asarray(d["p"])[stage]),
                jnp.asarray(np.asarray(d["ts"])[stage]),
                jnp.asarray(np.asarray(d["dts"])[stage])))
        raise ValueError(f"get: unknown field {field!r}")

    def _layout(self, stage) -> StageLayout:
        return self.layouts["0" if stage == 0
                            else ("e" if stage == self.N else "p")]

    def _soft_slice(self, stage):
        spec = (self.form.con_0 if stage == 0 else
                self.form.con_e if stage == self.N else self.form.con)
        return list(spec.soft_rows)

    def set(self, stage: int, field: str, value):
        """Reference: acados_ocp_solver.py set() — iterate fields and the
        common data fields (p, yref, bounds)."""
        value = np.atleast_1d(np.asarray(value, np.float64))
        it = self._iterate
        if field in ("x", "u", "pi", "sl", "su"):
            if field == "x":
                it["x"][stage] = value
            elif field == "u":
                it["u"][stage] = value
            elif field == "pi":
                it["pi"][stage] = value
            else:
                rows = self._soft_slice(stage)
                it[field][stage][rows] = value
            self._default_init = False
            return
        if field == "p":
            value = np.atleast_1d(np.asarray(value, np.float64))
            if value.shape[0] == self._data["p"].shape[1]:
                self._data["p"][stage] = value
            else:
                # stage part only; the [p_global | global_data] tail is
                # owned by set_p_global_and_precompute_dependencies
                self._data["p"][stage, :value.shape[0]] = value
            return
        if field in ("yref", "W"):
            self.cost_set(stage, field, value)
            return
        if field in ("lbx", "ubx", "lbu", "ubu", "lg", "ug", "lh", "uh"):
            self.constraints_set(stage, field, value)
            return
        raise ValueError(f"set: unknown field {field!r}")

    def cost_set(self, stage: int, field: str, value):
        """Reference: acados_ocp_solver.py cost_set."""
        value = np.asarray(value, np.float64)
        if field == "yref":
            if stage == 0:
                self._data["yref_0"] = value
            elif stage == self.N:
                self._data["yref_e"] = value
            else:
                self._data["yref"][stage - 1] = value
            return
        if field == "W":
            if stage == 0:
                self._data["W_0"] = value
            elif stage == self.N:
                self._data["W_e"] = value
            else:
                self._data["W"][stage - 1] = value
            return
        if field in ("Zl", "Zu", "zl", "zu"):
            rows = self._soft_slice(stage)
            key = field + ("_0" if stage == 0 else
                           "_e" if stage == self.N else "")
            tgt = self._data[key] if stage in (0, self.N) \
                else self._data[key][stage - 1]
            sc = np.atleast_1d(value)
            for j, rowi in enumerate(rows):
                tgt[rowi] = sc[j] if j < len(sc) else sc[-1]
            return
        raise ValueError(f"cost_set: unknown field {field!r}")

    def constraints_set(self, stage: int, field: str, value):
        """Reference: acados_ocp_solver.py constraints_set. Maps the
        per-kind bound vectors onto the unified rows."""
        value = np.atleast_1d(np.asarray(value, np.float64))
        lay = self._layout(stage)
        lower = field.startswith("l")
        kind = field[1:]
        off, n = {"bx": (lay.off_bx, lay.nbx), "bu": (lay.off_bu, lay.nbu),
                  "g": (lay.off_g, lay.ng), "h": (lay.off_h, lay.nh)}[kind]
        if n == 0:
            raise ValueError(f"stage {stage} has no '{kind}' rows")
        if stage == 0:
            key = "lb_0" if lower else "ub_0"
            self._data[key][off:off + n] = value
        elif stage == self.N:
            key = "lb_e" if lower else "ub_e"
            self._data[key][off:off + n] = value
        else:
            key = "lb" if lower else "ub"
            self._data[key][stage - 1][off:off + n] = value

    # -- solution sensitivities -------------------------------------------------
    def _kkt_factor(self) -> KktFactor:
        so = self.acados_ocp.solver_options
        return KktFactor(
            self.form,
            SensOpts(t_lam_min=so.solution_sens_qp_t_lam_min),
            data_to_jax(self._data, self.dtype),
            self._iterate_jax())

    def _zero_data_tangent(self):
        data = data_to_jax(self._data, self.dtype)
        return jax.tree.map(jnp.zeros_like, data), data

    def eval_param_sens(self, index: int, stage=None):
        """Forward solution sensitivity wrt one parameter entry.
        Reference: AcadosOcpSolver.eval_param_sens ->
        ocp_nlp_common_eval_param_sens (ocp_nlp_common.c:4039). stage=None
        seeds the parameter at ALL stages (the reference's global-parameter
        convention); an int seeds only that stage.

        Returns dict with 'sens_x' (N+1, nx) and 'sens_u' (N, nu)."""
        d_data, _ = self._zero_data_tangent()
        p = np.zeros_like(self._data["p"])
        if stage is None:
            p[:, index] = 1.0
        else:
            p[stage, index] = 1.0
        d_data = d_data.replace(p=jnp.asarray(p, self.dtype))
        kf = self._kkt_factor()
        dx, du, dpi, _, _ = forward_sensitivity(kf, d_data)
        return {"sens_x": np.asarray(dx), "sens_u": np.asarray(du)}

    def set_p_global_and_precompute_dependencies(self, p_global_values):
        """Set the global parameters once and (re)compute the
        p_global-only precomputed data (reference: generated
        p_global_precompute_fun, p_global_precompute_fun.in.h;
        AcadosOcpSolver method of the same name). The stage callables
        see [p_stage | p_global | global_data] as their `p` argument."""
        import jax.numpy as _jnp

        m = self.acados_ocp.model
        from acados_tpu.interface.acados_ocp import _dim_of
        npg = _dim_of(getattr(m, "p_global", None))
        if npg == 0:
            raise ValueError("model.p_global is not declared")
        vals = np.atleast_1d(np.asarray(p_global_values, np.float64))
        if vals.shape[0] != npg:
            raise ValueError(f"expected {npg} p_global values")
        fn = getattr(m, "p_global_precompute_fun", None)
        gd = (np.asarray(fn(_jnp.asarray(vals))).reshape(-1)
              if fn is not None else np.zeros(0))
        np_total = self._data["p"].shape[1]
        np_stage = np_total - npg - gd.shape[0]
        self._data["p"][:, np_stage:np_stage + npg] = vals
        if gd.shape[0]:
            self._data["p"][:, np_stage + npg:] = gd

    def eval_and_get_optimal_value_gradient(self,
                                            with_respect_to="p_global"):
        """Gradient of the optimal objective value wrt 'p_global' (all
        stages share the parameter) or 'initial_state'. Envelope theorem
        at the converged KKT point — reference eval_lagr_grad_p
        (ocp_nlp_common.c:4181) / AcadosOcpSolver.
        eval_and_get_optimal_value_gradient."""
        from acados_tpu.ocp_nlp.sensitivity import (
            eval_lagrange_grad_p, optimal_value_grad_x0)
        it = self._iterate_jax()
        data = data_to_jax(self._data, self.dtype)
        if with_respect_to in ("p_global", "params_global"):
            g = eval_lagrange_grad_p(self.form, data, it)
            return np.asarray(jnp.sum(g, axis=0))
        if with_respect_to == "initial_state":
            return np.asarray(optimal_value_grad_x0(self.form, data, it))
        raise ValueError(f"with_respect_to {with_respect_to!r}")

    def eval_solution_sensitivity(self, stages, with_respect_to,
                                  return_sens_x=True, return_sens_u=True,
                                  sanity_checks=True):
        """Forward sensitivities of (x_stage, u_stage) wrt all entries of
        'initial_state' or 'params_global'/'p_global'. Reference:
        acados_ocp_solver.py eval_solution_sensitivity.

        Returns (sens_x, sens_u): lists over stages of arrays with a
        trailing axis over the n_wrt seed directions."""
        del sanity_checks
        if isinstance(stages, int):
            stages = [stages]
        kf = self._kkt_factor()
        zero, _ = self._zero_data_tangent()
        if with_respect_to in ("params_global", "p_global", "p"):
            n_wrt = self.form.np_
            def seed(i):
                p = jnp.zeros_like(zero.p).at[:, i].set(1.0)
                return zero.replace(p=p)
        elif with_respect_to == "initial_state":
            lay = self.layouts["0"]
            n_wrt = lay.nbx
            def seed(i):
                e = jnp.zeros_like(zero.lb_0).at[lay.off_bx + i].set(1.0)
                return zero.replace(lb_0=e, ub_0=e)
        else:
            raise ValueError(with_respect_to)
        # one vmapped batch over all seed directions (the reference loops
        # ctypes calls; here a single device program handles every seed)
        seeds = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[seed(i) for i in range(n_wrt)])
        dxs, dus, _, _, _ = jax.vmap(
            lambda d: forward_sensitivity(kf, d))(seeds)
        dxs = np.moveaxis(np.asarray(dxs), 0, -1)  # (N+1, nx, n_wrt)
        dus = np.moveaxis(np.asarray(dus), 0, -1)
        sens_x = [dxs[s] for s in stages]
        sens_u = [dus[s] if s < self.N
                  else np.zeros((self.form.nu, n_wrt)) for s in stages]
        out = []
        if return_sens_x:
            out.append(sens_x if len(stages) > 1 else sens_x[0])
        if return_sens_u:
            out.append(sens_u if len(stages) > 1 else sens_u[0])
        return tuple(out) if len(out) > 1 else out[0]

    def eval_adjoint_solution_sensitivity(self, seed_x, seed_u,
                                          with_respect_to="params_global",
                                          sanity_checks=True):
        """Adjoint solution sensitivity: gradient of sum of seeded solution
        entries wrt the parameters. Reference:
        eval_adjoint_solution_sensitivity -> eval_solution_sens_adj_p
        (ocp_nlp_common.c:4108). seed_x/seed_u: lists of (stage, seed_vec)
        pairs, or full (N+1, nx)/(N, nu) arrays, or None.

        Returns gradient array: (np,) for 'params_global', or the full
        NlpData cotangent pytree for 'all'."""
        del sanity_checks
        sx = np.zeros((self.N + 1, self.form.nx))
        su = np.zeros((self.N, self.form.nu))
        def fill(tgt, seeds):
            if seeds is None:
                return
            if isinstance(seeds, (list, tuple)):
                for stage, vec in seeds:
                    tgt[stage] += np.asarray(vec).reshape(tgt[stage].shape)
            else:
                tgt[:] = np.asarray(seeds).reshape(tgt.shape)
        fill(sx, seed_x)
        fill(su, seed_u)
        kf = self._kkt_factor()
        grad = adjoint_sensitivity(kf, jnp.asarray(sx, self.dtype),
                                   jnp.asarray(su, self.dtype))
        if with_respect_to in ("params_global", "p_global", "p"):
            return np.asarray(grad.p).sum(axis=0)
        if with_respect_to == "p_stagewise":
            return np.asarray(grad.p)
        if with_respect_to == "initial_state":
            lay = self.layouts["0"]
            g = np.asarray(grad.lb_0) + np.asarray(grad.ub_0)
            return g[lay.off_bx:lay.off_bx + lay.nbx]
        if with_respect_to == "all":
            return grad
        raise ValueError(with_respect_to)

    # -- stats ------------------------------------------------------------------
    def get_cost(self) -> float:
        return float(self._last_stats.cost)

    def get_residuals(self, recompute=False):
        s = self._last_stats
        return np.array([float(s.res_stat), float(s.res_eq),
                         float(s.res_ineq), float(s.res_comp)])

    def get_stats(self, field: str):
        """Reference: acados_ocp_solver.py get_stats (subset)."""
        s = self._last_stats
        if field == "sqp_iter" or field == "nlp_iter":
            return int(s.sqp_iter)
        if field == "qp_iter":
            return int(s.qp_iter_total)
        if field == "statistics":
            n = int(s.sqp_iter) + 1
            tab = np.asarray(s.stat)[:n]
            return np.concatenate([np.arange(n)[:, None], tab],
                                  axis=1).T
        if field == "time_preparation":
            return self._time_prep
        if field == "time_feedback":
            return self._time_fb
        if field == "time_tot":
            return self._time_tot
        if field in ("time_lin", "time_qp", "time_sim", "time_reg",
                     "time_glob"):
            return self._phase_times()[field]
        if field == "residuals":
            return self.get_residuals()
        if field == "cost_value":
            return self.get_cost()
        raise ValueError(f"get_stats: unknown field {field!r}")

    def _phase_times(self):
        """Per-phase timing surface (reference ocp_nlp_timings,
        ocp_nlp_common.h:410-428: time_lin/time_qp/time_sim/...).

        The fused XLA program cannot be timed from inside (everything is
        one compiled computation), so phases are measured by *isolated
        re-execution*: the linearization, QP solve, regularization and
        integrator sweep are each jitted standalone, run at the last
        solve's final iterate, timed, and scaled by the iteration counts
        from the stat matrix. Cached per solve; first call pays the
        (cached-after-first) compile.

        With solver_options.collect_phase_times the per-phase times are
        instead MEASURED inside the solve (reference semantics,
        ocp_nlp_timings, ocp_nlp_common.h:410-428) via ordered host-clock
        callbacks at the phase boundaries; time_sim is then reported as
        part of time_lin (the fused linearization includes the
        integrator sweep), matching the reference's time_lin >= time_sim
        containment."""
        st = self._last_stats
        if st is not None and getattr(st, "phase_times", None) is not None:
            pt = np.asarray(st.phase_times, np.float64)
            return {"time_lin": float(pt[0]), "time_sim": float(pt[0]),
                    "time_reg": float(pt[1]), "time_qp": float(pt[2]),
                    "time_glob": float(pt[3])}
        if getattr(self, "_phase_cache", None) is not None:
            return self._phase_cache
        import time as _time

        from acados_tpu.ocp_nlp.linearize import (build_static_rows,
                                                  linearize)
        from acados_tpu.ocp_nlp.regularize import regularize_qp
        from acados_tpu.ocp_qp.ipm import solve_ocp_qp

        form, opts = self.form, self.opts
        data = data_to_jax(self._data, self.dtype)
        it = self._iterate_jax()
        lm = jnp.asarray(opts.levenberg_marquardt, self.dtype)

        @jax.jit
        def lin_fn(data, it):
            static_rows = build_static_rows(form, self.dtype)
            return linearize(form, static_rows, data, it, lm)

        @jax.jit
        def sim_fn(data, it):
            # dynamics sweep incl. forward sensitivities (time_sim +
            # time_sim_ad analog)
            def one(xk, uk, pk, tk, dtk):
                w = jnp.concatenate([xk, uk])
                phi = lambda w_: form.step_fn(w_[:form.nx], w_[form.nx:],
                                              pk, tk, dtk)
                return phi(w), jax.jacfwd(phi)(w)

            return jax.vmap(one)(it.x[:-1], it.u, data.p[:-1],
                                 data.ts[:-1], data.dts)

        @jax.jit
        def reg_fn(qp):
            return regularize_qp(qp, opts.regularize_method,
                                 opts.reg_epsilon)

        def timed(f, *args):
            out = _fence(f(*args))  # compile
            t0 = _time.perf_counter()
            out = _fence(f(*args))
            return _time.perf_counter() - t0, out

        t_lin, qp = timed(lin_fn, data, it)
        t_sim, _ = timed(sim_fn, data, it)
        t_reg, qp_r = timed(reg_fn, qp)
        t_qp, _ = timed(lambda q: solve_ocp_qp(q, opts.qp_opts), qp_r)

        n_iter = max(int(self._last_stats.sqp_iter), 1) \
            if self._last_stats is not None else 1
        self._phase_cache = {
            "time_lin": t_lin * n_iter,
            "time_sim": t_sim * n_iter,
            "time_reg": t_reg * n_iter,
            "time_qp": t_qp * n_iter,
            "time_glob": max(
                0.0, self._time_tot - (t_lin + t_qp + t_reg) * n_iter),
        }
        return self._phase_cache

    def custom_update(self, data=None):
        """Custom-update hook between solver calls (reference
        AcadosOcpSolver.custom_update + custom_update_templates/): with a
        ZoroDescription attached, runs the zoRO covariance propagation +
        bound tightening (interface/zoro.py); otherwise `data` may be a
        callable(solver) implementing an arbitrary update."""
        if self.acados_ocp.zoro_description is not None:
            from acados_tpu.interface.zoro import zoro_custom_update
            zoro_custom_update(self)
            return 0
        if callable(data):
            data(self)
            return 0
        raise ValueError("custom_update: attach ocp.zoro_description or "
                         "pass a callable(solver)")

    def get_iterates(self):
        """Per-iteration primal trajectories when store_iterates is on
        (reference AcadosOcpSolver.get_iterates / mem->iterates).
        Returns dict with 'x' (n_iter+1, N+1, nx) and 'u' arrays."""
        s = self._last_stats
        if s is None or s.iterates_x is None:
            raise RuntimeError("set solver_options.store_iterates = True "
                               "before solve()")
        n = int(s.sqp_iter) + 1
        return {"x": np.asarray(s.iterates_x)[:n],
                "u": np.asarray(s.iterates_u)[:n]}

    def print_statistics(self):
        """Reference-style iteration table (ocp_nlp_sqp.c print_iteration)."""
        tab = self.get_stats("statistics").T
        cols = ["iter", "res_stat", "res_eq", "res_ineq", "res_comp",
                "qp_status", "qp_iter", "alpha", "step_norm"]
        print("  ".join(f"{c:>9s}" for c in cols))
        for row in tab:
            print("  ".join(f"{int(row[0]):>9d}" if i == 0 else
                            f"{row[i]:>9.3e}" for i in range(len(cols))))

    # -- iterate save/load -------------------------------------------------------
    def store_iterate_to_obj(self):
        """Reference: AcadosOcpIterate (acados_ocp_iterate.py:40)."""
        return {k: v.copy() for k, v in self._iterate.items()}

    def load_iterate_from_obj(self, obj):
        for k in self._iterate:
            self._iterate[k] = np.asarray(obj[k], np.float64).copy()
        self._default_init = False

    def get_flat(self, field: str) -> np.ndarray:
        """Flat all-stage value of one iterate field (reference
        ocp_nlp_get_all, ocp_nlp_interface.c:1914). Fields: x, u, pi,
        lam (per stage [lam_l, lam_u] over the unified rows), sl, su."""
        it = self._iterate
        if field in ("x", "u", "pi", "sl", "su"):
            return it[field].reshape(-1).copy()
        if field == "lam":
            return np.concatenate([it["lam_l"], it["lam_u"]],
                                  axis=1).reshape(-1)
        raise ValueError(f"get_flat: unknown field {field!r}")

    def set_flat(self, field: str, value):
        """Inverse of get_flat (reference ocp_nlp_set_all,
        ocp_nlp_interface.c:2018)."""
        it = self._iterate
        value = np.asarray(value, np.float64)
        if field in ("x", "u", "pi", "sl", "su"):
            it[field] = value.reshape(it[field].shape).copy()
        elif field == "lam":
            nc = it["lam_l"].shape[1]
            lam = value.reshape(-1, 2 * nc)
            it["lam_l"] = lam[:, :nc].copy()
            it["lam_u"] = lam[:, nc:].copy()
        else:
            raise ValueError(f"set_flat: unknown field {field!r}")
        self._default_init = False

    def store_iterate_to_flat_obj(self):
        """Reference: store_iterate_to_flat_obj ->
        AcadosOcpFlattenedIterate."""
        from acados_tpu.interface.iterate import AcadosOcpFlattenedIterate
        return AcadosOcpFlattenedIterate(
            x=self.get_flat("x"), u=self.get_flat("u"),
            pi=self.get_flat("pi"), lam=self.get_flat("lam"),
            sl=self.get_flat("sl"), su=self.get_flat("su"))

    def load_iterate_from_flat_obj(self, flat):
        """Reference: load_iterate_from_flat_obj (warm-start transfer
        between solvers of the same formulation)."""
        for f in ("x", "u", "pi", "lam", "sl", "su"):
            self.set_flat(f, getattr(flat, f))

    def store_iterate(self, filename: str, overwrite=True, verbose=False):
        """Reference: store_iterate -> json file. A '.atni' extension
        selects the native binary checkpoint format (C++ writer,
        acados_tpu/native) — JSON round-trips MB-scale batched iterates
        too slowly for checkpoint/restore in production loops."""
        del overwrite, verbose
        if filename.endswith(".atni"):
            from acados_tpu.native import save_iterate_bin
            save_iterate_bin(filename, self._iterate)
            return
        with open(filename, "w") as f:
            json.dump({k: v.tolist() for k, v in self._iterate.items()}, f)

    def load_iterate(self, filename: str, verbose=False):
        del verbose
        if filename.endswith(".atni"):
            from acados_tpu.native import load_iterate_bin
            self.load_iterate_from_obj(load_iterate_bin(filename))
            return
        with open(filename) as f:
            obj = json.load(f)
        self.load_iterate_from_obj({k: np.asarray(v) for k, v in
                                    obj.items()})

    def dump_qp_to_file(self, filename: str):
        """Debug dump of the QP linearized at the current iterate
        (reference ACADOS_DEBUG_SQP_PRINT_QPS_TO_FILE,
        ocp_nlp_common.h:674-675 + print.c QP printers): writes every
        stage-blocked QP matrix/vector to an .npz so a failing SQP
        subproblem can be inspected or re-solved standalone
        (`OcpQp(**{k: jnp.asarray(v) for ...})`)."""
        from acados_tpu.ocp_nlp.linearize import build_static_rows, \
            linearize
        static_rows = build_static_rows(self.form, self.dtype)
        qp = linearize(self.form, static_rows,
                       data_to_jax(self._data, self.dtype),
                       self._iterate_jax(), 0.0)
        np.savez(filename, **{k: np.asarray(getattr(qp, k))
                              for k in ("Q", "R", "S", "q", "r", "A", "B",
                                        "b", "C", "D", "lg", "ug", "mask_l",
                                        "mask_u", "Zl", "Zu", "zl", "zu",
                                        "soft_mask")})
