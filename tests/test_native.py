"""Host runtime helper tests (timers, flat pack, binary iterate
checkpoints) plus the solver-level .atni round trip."""
import numpy as np
import pytest

from acados_tpu.native import (load_iterate_bin, monotonic_time,
                               native_available, pack_flat, save_iterate_bin,
                               unpack_flat)


def test_native_removed():
    """The C++ duplicate was deliberately removed (round-2 review): the
    host helpers are IO-bound and the pure-numpy path is the product."""
    assert not native_available()


def test_monotonic_time():
    t0 = monotonic_time()
    t1 = monotonic_time()
    assert t1 >= t0


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    arrs = [rng.normal(size=s) for s in [(21, 4), (20, 1), (20, 4), (3,)]]
    flat = pack_flat(arrs)
    assert flat.size == sum(a.size for a in arrs)
    outs = unpack_flat(flat, [a.shape for a in arrs])
    for a, o in zip(arrs, outs):
        np.testing.assert_array_equal(a, o)


def test_iterate_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    fields = {"x": rng.normal(size=(11, 4)), "u": rng.normal(size=(10, 1)),
              "lam_l": rng.normal(size=(11, 5))}
    p = str(tmp_path / "it.atni")
    save_iterate_bin(p, fields)
    out = load_iterate_bin(p)
    assert set(out) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(out[k], fields[k])
        assert out[k].shape == fields[k].shape


def test_solver_atni_roundtrip(tmp_path):
    """store_iterate/load_iterate with the binary format preserves the
    warm start exactly (reference store_iterate/load_iterate contract)."""
    from acados_tpu import AcadosOcpSolver
    from test_interface import make_ocp
    solver = AcadosOcpSolver(make_ocp(N=8))
    assert solver.solve() == 0
    p = str(tmp_path / "sol.atni")
    solver.store_iterate(p)
    x_before = solver.get(3, "x")
    solver2 = AcadosOcpSolver(make_ocp(N=8))
    solver2.load_iterate(p)
    np.testing.assert_array_equal(solver2.get(3, "x"), x_before)
