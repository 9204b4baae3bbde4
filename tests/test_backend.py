"""Sanity check: the suite runs on 8 virtual CPU devices (fake backend)."""


def test_virtual_cpu_mesh():
    import jax

    devices = jax.devices()
    assert devices[0].platform == "cpu"
    assert len(devices) == 8
