"""Hermetic-environment helpers: survive a wedged remote TPU tunnel.

The deployment environment can attach JAX to a remote TPU through a proxy
PJRT plugin registered by a sitecustomize hook (activated by the
``PALLAS_AXON_POOL_IPS`` env var, loaded via ``PYTHONPATH``). When the
tunnel behind that plugin is down, *any* backend initialization — even
``jax.devices("cpu")`` preceded by an innocent ``jax.devices()`` — can hang
indefinitely or crash. Every entry point that must never hang (tests, the
benchmark, the multichip dryrun, the CLI) funnels through this module.

Two layers of defense:

* in-process (:func:`force_cpu`): before any backend initializes, pin
  ``jax_platforms=cpu`` via config (the env var was already read at import
  time if the sitecustomize imported jax first) and drop the proxy plugin's
  backend factory so nothing can touch it.
* subprocess (:func:`scrubbed_env`, :func:`run_hermetic`): an env dict with
  the proxy's activation var and PYTHONPATH entry removed, CPU platform
  pinned, and (optionally) N virtual CPU devices forced — the pattern for
  testing `jax.sharding` code without real multi-chip hardware.

The reference has no analogue (single-process Julia, `Pkg.test` just runs —
test/runtests.jl:3); this is what makes "anyone can run it" true here.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Mapping, Optional

__all__ = [
    "force_cpu",
    "scrubbed_env",
    "run_hermetic",
    "probe_default_backend",
]

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Env vars that activate or configure the remote-TPU proxy plugin; all are
# dropped from hermetic child environments.
_PROXY_ENV_VARS = (
    "PALLAS_AXON_POOL_IPS",
    "PALLAS_AXON_TPU_GEN",
    "PALLAS_AXON_REMOTE_COMPILE",
    "AXON_POOL_SVC_OVERRIDE",
    "AXON_LOOPBACK_RELAY",
    "PJRT_LIBRARY_PATH",
)


def _strip_proxy_pythonpath(pythonpath: str) -> str:
    """Remove sitecustomize entries that register the proxy backend."""
    kept = [
        p
        for p in pythonpath.split(os.pathsep)
        if p and "axon_site" not in p
    ]
    return os.pathsep.join(kept)


def force_cpu(n_virtual_devices: Optional[int] = None) -> None:
    """Pin this process to the CPU backend, defusing the proxy plugin.

    Safe to call only BEFORE any JAX backend has initialized (i.e. before
    the first ``jax.devices()`` / first traced computation). Idempotent.

    ``n_virtual_devices``: if given, force that many virtual CPU devices
    (only effective if XLA hasn't parsed XLA_FLAGS yet, i.e. pre-init).
    """
    if n_virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    # For any subprocesses we spawn:
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # The env var is read into config at jax-import time; if the
    # sitecustomize imported jax before us, setting os.environ above is too
    # late — update the config directly.
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as xb

        xb._backend_factories.pop("axon", None)
    except Exception:
        pass  # jax internals moved; JAX_PLATFORMS=cpu alone still protects us


def scrubbed_env(
    n_devices: Optional[int] = None,
    base: Optional[Mapping[str, str]] = None,
    enable_x64: bool = False,
) -> dict:
    """Environment for a hermetic CPU subprocess.

    Drops the proxy plugin activation (env vars + PYTHONPATH entry), pins
    JAX_PLATFORMS=cpu, keeps the repo importable, and — when ``n_devices``
    is given — forces that many virtual CPU devices so ``jax.sharding``
    code can run a real Mesh without hardware.
    """
    env = dict(base if base is not None else os.environ)
    for var in _PROXY_ENV_VARS:
        env.pop(var, None)
    pythonpath = _strip_proxy_pythonpath(env.get("PYTHONPATH", ""))
    env["PYTHONPATH"] = (
        _REPO_ROOT + (os.pathsep + pythonpath if pythonpath else "")
    )
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if n_devices is not None:
        flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    if enable_x64:
        env["JAX_ENABLE_X64"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return env


def run_hermetic(
    code: str,
    n_devices: Optional[int] = None,
    timeout: Optional[float] = 600.0,
    enable_x64: bool = False,
) -> subprocess.CompletedProcess:
    """Run ``python -c code`` in a scrubbed CPU environment.

    Raises ``subprocess.CalledProcessError`` on non-zero exit and
    ``subprocess.TimeoutExpired`` on timeout; stdout/stderr are captured
    as text either way.
    """
    return subprocess.run(
        [sys.executable, "-c", code],
        env=scrubbed_env(n_devices, enable_x64=enable_x64),
        capture_output=True,
        text=True,
        timeout=timeout,
        check=True,
        cwd=_REPO_ROOT,
    )


def probe_default_backend(
    timeout: float = 120.0, env: Optional[Mapping[str, str]] = None
) -> Optional[str]:
    """Bounded-time check of the DEFAULT (possibly remote-TPU) backend.

    Runs ``jax.devices()`` in a child with the given environment (default:
    the *current*, unscrubbed one). Returns the platform string (e.g.
    ``"tpu"``) if the backend comes up within the deadline, else None. The
    child — not this process — absorbs any hang, so callers can fall back
    to CPU cleanly.
    """
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=dict(env) if env is not None else None,
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    out = proc.stdout.strip().splitlines()
    return out[-1] if out else None
