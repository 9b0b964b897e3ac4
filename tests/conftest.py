"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated the JAX-native way — an
``xla_force_host_platform_device_count=8`` CPU mesh (SURVEY.md §4) — since
real multi-chip TPU hardware is not available in CI.

Some environments install a ``sitecustomize`` hook (``PYTHONPATH``
pointing at a PJRT-plugin shim) that registers a remote accelerator
backend at interpreter start and pins platform selection so that a later
``JAX_PLATFORMS=cpu`` is ignored. Running the suite over such a tunnel is
both slow (network round-trip per op) and wrong (single device, no
8-device mesh), so if we detect it we re-exec the interpreter with a
sanitized environment. The re-exec happens in ``pytest_configure`` (not at
module import) so we can stop pytest's fd-level capture first — an exec'd
child would otherwise inherit the capture temp files as stdout/stderr and
its output would be lost. Set ``SMC_TESTS_KEEP_PLATFORM=1`` to opt out
(e.g. to smoke the suite on real hardware).
"""
import os
import sys


def _needs_sanitized_reexec() -> bool:
    if os.environ.get("SMC_TESTS_KEEP_PLATFORM") == "1":
        return False
    if os.environ.get("_SMC_TESTS_REEXECED") == "1":
        return False
    # A PJRT-plugin sitecustomize on PYTHONPATH wins over JAX_PLATFORMS;
    # any non-cpu platform request means we are not on the CPU mesh.
    pythonpath = os.environ.get("PYTHONPATH", "")
    platforms = os.environ.get("JAX_PLATFORMS", "")
    return bool(pythonpath) or (platforms not in ("", "cpu"))


def pytest_configure(config):
    if not _needs_sanitized_reexec():
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_SMC_TESTS_REEXECED"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()  # restore real stdout/stderr fds
    sys.stdout.flush()
    sys.stderr.flush()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *args], env)


os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
