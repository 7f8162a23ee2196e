"""Test configuration: force JAX onto CPU with 8 virtual devices.

The driver runs tests on a machine with a single real TPU attached (platform
'axon'); tests must be deterministic and multi-device-capable, so we pin the
CPU backend and split it into 8 virtual devices
(SURVEY.md §4: multi-device tests via xla_force_host_platform_device_count).

Opt-in real-TPU lane (round-3 verdict #4): set UVTRACE_TEST_PLATFORM=tpu to
keep the attached chip visible and run the compiled-kernel parity tests:

    UVTRACE_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu

Tests marked `tpu` compile the Pallas kernels with Mosaic on the real device
and assert bit-equality against interpret mode (a real Mosaic miscompile was
caught once — bool while-carries, ops/traverse_mxu.py); they self-skip when
no TPU is attached.
"""

import os

TEST_PLATFORM = os.environ.get("UVTRACE_TEST_PLATFORM", "cpu")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

if TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.fixture(scope="session")
def testroom_mesh():
    from uvtrace.geometry.gltf import load_glb

    return load_glb(os.path.join(ASSETS, "testroomopt.glb"))


@pytest.fixture(scope="session")
def small_room():
    from uvtrace.geometry.procedural import make_box_room

    return make_box_room(subdivisions=4, clutter=3, seed=1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
