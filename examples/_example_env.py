"""Shared example bootstrap: repo-root import path + CPU float64.

The examples run the float64 oracle path on CPU so they work anywhere
(float64 linear algebra is unsupported on TPU). For the TPU production
path, drop this import, use dtype="float32" in the solver options, and
let jax pick up the TPU platform.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
