"""On-TPU test tier (VERDICT r4 item 4): run the PRODUCTION kernels on the
real chip so a Pallas/Mosaic regression fails tests, not just the bench.

Usage:  python -m pytest tests_tpu/ -q -p xdist -n 0

Run SERIALLY (-n 0): the repo default `-n auto` makes xdist workers
share the single chip — compiles contend through the remote-compile
tunnel (measured 467 s vs 92 s serial) and a loaded tunnel occasionally
produces a flaky in-tolerance assertion. The main `tests/` suite forces
CPU/float64 (numerical oracles); this tier runs float32 on the TPU and
checks against host-side float64 numpy oracles. The whole tier skips
cleanly when no TPU is attached, so it is safe to include in any runner.
"""
import numpy as np
import pytest

import jax

collect_ignore_glob = []


def _has_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not _has_tpu():
        skip = pytest.mark.skip(reason="no TPU backend attached")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
