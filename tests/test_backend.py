"""Sanity check: the suite runs on 8 virtual CPU devices (fake backend)."""

import pytest


def test_virtual_cpu_mesh():
    import jax

    devices = jax.devices()
    assert devices[0].platform == "cpu"
    assert len(devices) == 8


def test_select_devices():
    """--gpus semantics: subset by index, validated (reference ssn_opts.py:60)."""
    import jax

    from action_detection_tpu.parallel import select_devices

    assert select_devices() == jax.devices()
    assert select_devices([1, 3]) == [jax.devices()[1], jax.devices()[3]]
    with pytest.raises(ValueError, match="out of range"):
        select_devices([8])
    with pytest.raises(ValueError, match="out of range"):
        select_devices([-1])
    with pytest.raises(ValueError, match="duplicate"):
        select_devices([0, 0])
