"""Test session config: run JAX on a virtual 8-device CPU mesh.

This is the fake-backend story the reference lacks (SURVEY.md §4): multi-chip
sharding logic is exercised on ``--xla_force_host_platform_device_count=8``
virtual CPU devices, so the whole suite runs anywhere, deterministically.

The machine environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU PJRT
plugin registered by sitecustomize at interpreter startup) whose hooks slow
every XLA compile — even CPU ones — by ~10-20x. Since the plugin is already
registered before pytest starts, the clean escape is to relaunch the suite in
a child process with the axon environment scrubbed (see pytest_configure);
the child runs on fast local CPU devices.
"""

import os
import sys

_AXON_VARS = (
    "PALLAS_AXON_POOL_IPS",
    "AXON_POOL_SVC_OVERRIDE",
    "AXON_LOOPBACK_RELAY",
    "PALLAS_AXON_REMOTE_COMPILE",
)

_NEEDS_RELAUNCH = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))

if not _NEEDS_RELAUNCH:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    if not _NEEDS_RELAUNCH:
        return
    import subprocess

    env = dict(os.environ)
    for var in _AXON_VARS:
        env.pop(var, None)
    # drop the sitecustomize dir that force-registers the axon PJRT plugin
    pythonpath = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    env["JAX_PLATFORMS"] = "cpu"

    # hand the child the real terminal fds: pytest's global fd capture is
    # already active, so suspend it for the duration of the child run
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    rc = subprocess.call([sys.executable, "-m", "pytest", *config.invocation_params.args],
                         env=env)
    os._exit(rc)
