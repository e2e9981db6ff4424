import os, sys
def test_platform():
    print("jax preloaded:", "jax" in sys.modules)
    import jax
    print("env:", os.environ.get("JAX_PLATFORMS"), "devices:", jax.devices())
    assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
