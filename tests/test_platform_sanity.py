"""Guard: the test harness must run on host CPU with 8 virtual devices,
not through the TPU tunnel (slow remote compiles, bf16 matmuls)."""


def test_platform_is_cpu_with_8_devices():
    import jax

    devs = jax.devices()
    assert devs[0].platform == "cpu", devs
    assert len(devs) == 8, devs
