"""Test configuration: force a hermetic CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the standard
JAX trick for testing pjit/shard_map without a pod); numeric tests also run
on CPU so the suite is fast and does not claim the real TPU. The real-chip
path is exercised by bench.py and __graft_entry__.py.

If the environment wires a TPU PJRT plugin into every interpreter via
sitecustomize (PALLAS_AXON_POOL_IPS), plugin initialization happens at
interpreter start — before pytest can configure anything — and every test
process would claim (or hang on) the single real TPU. In that case we
re-exec pytest once with the plugin env removed and the CPU mesh configured.
The re-exec happens in pytest_configure, after global output capture is
stopped, so the child's output reaches the terminal fds.
"""

import os
import sys


def _cpu_env(env):
    # Scrub every handle through which jax could discover the TPU PJRT
    # plugin (sitecustomize's register() exports these into os.environ).
    for key in list(env):
        if key.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_")):
            env.pop(key)
    env.pop("_AXON_REGISTERED", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    return env


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + list(config.invocation_params.args),
        _cpu_env(dict(os.environ)),
    )


# On machines without the TPU plugin hook, just default to the CPU mesh in
# this process (no re-exec needed). With the hook present, leave os.environ
# alone — pytest_configure above re-execs into a scrubbed child instead.
if not os.environ.get("PALLAS_AXON_POOL_IPS"):
    _cpu_env(os.environ)
