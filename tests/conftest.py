"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The standard JAX idiom for testing pjit sharding without TPU hardware
(SURVEY.md §4): force the host platform and fake 8 devices.  Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in _flags:
    # XLA:CPU's collective rendezvous EXITS THE PROCESS (rendezvous.cc
    # LOG(FATAL): "Termination timeout for `all reduce ...` of 40 seconds
    # exceeded. Exiting to ensure a consistent program state") when a
    # participant thread is starved past the default timeout.  On this
    # single-core container, 8 virtual devices' rendezvous threads are
    # routinely starved — the cause of the intermittent SIGABRTs in long
    # suite runs (message lost to pytest capture; recovered with an
    # LD_PRELOAD SIGABRT backtrace hook).  Collectives here are correct,
    # just slow; give them time.
    _flags = (_flags
              + " --xla_cpu_collective_timeout_seconds=1200"
              + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              ).strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is exported; force the CPU client so tests see the
# 8 virtual devices.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    Long pytest runs accumulate hundreds of compiled XLA:CPU programs over
    the 8-virtual-device mesh; past a threshold the CPU thunk runtime
    intermittently aborts ("Fatal Python error: Aborted" with no glog
    output) on this single-core container — the same heavy test passes in
    a fresh process.  Modules rarely share jit cache entries, so clearing
    between modules costs little and keeps the per-process program count
    bounded.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_backbone_cfg():
    from srsem.core.config import BackboneConfig

    return BackboneConfig(kind="resnet50", image_size=64, compute_dtype="float32")


@pytest.fixture(scope="session")
def small_clip_cfg():
    from srsem.core.config import BackboneConfig

    return BackboneConfig(kind="resnet50_clip", image_size=64, compute_dtype="float32")
