"""utils.hermetic: the wedged-remote-TPU survival layer every entry point
(tests, bench, dryrun, CLI) funnels through."""

import os

from multimodalmusig_tpu.utils import hermetic


def test_scrubbed_env_drops_proxy_activation():
    base = {
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "PALLAS_AXON_TPU_GEN": "v5e",
        "PYTHONPATH": "/root/.axon_site:/somewhere/else",
        "JAX_PLATFORMS": "axon",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=3 --xla_foo=1",
        "HOME": "/root",
    }
    env = hermetic.scrubbed_env(n_devices=4, base=base)
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "PALLAS_AXON_TPU_GEN" not in env
    assert "axon_site" not in env["PYTHONPATH"]
    assert "/somewhere/else" in env["PYTHONPATH"]
    # repo root (wherever this checkout lives) stays importable, first
    assert env["PYTHONPATH"].split(os.pathsep)[0] == hermetic._REPO_ROOT
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
    assert "--xla_foo=1" in env["XLA_FLAGS"]
    assert env["HOME"] == "/root"


def test_scrubbed_env_without_device_count():
    env = hermetic.scrubbed_env(base={"XLA_FLAGS": "--xla_force_host_platform_device_count=3"})
    assert "XLA_FLAGS" not in env


def test_run_hermetic_sees_virtual_devices():
    proc = hermetic.run_hermetic(
        "import jax; assert len(jax.devices()) == 4, jax.devices(); "
        "assert jax.devices()[0].platform == 'cpu'; print('OK4')",
        n_devices=4,
        timeout=120.0,
    )
    assert "OK4" in proc.stdout


def test_probe_default_backend_scrubbed_env():
    # With a scrubbed environment the default backend is plain CPU, so the
    # probe must come back quickly with "cpu" (healthy-backend path). The
    # inherited environment may carry a remote-TPU proxy whose tunnel state
    # we cannot assume, so the healthy case is tested hermetically.
    platform = hermetic.probe_default_backend(timeout=120.0, env=hermetic.scrubbed_env())
    assert platform == "cpu"


def test_probe_default_backend_broken_env_returns_none():
    env = hermetic.scrubbed_env()
    env["JAX_PLATFORMS"] = "definitely_not_a_backend"
    assert hermetic.probe_default_backend(timeout=120.0, env=env) is None
