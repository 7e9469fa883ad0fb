"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-device sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), the pattern recommended for testing
jax.sharding code without real multi-chip hardware. float64 is enabled for
numerical-parity tests against the (Float64 CPU) Julia reference semantics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin this process (and all subprocesses tests spawn) to the CPU backend and
# drop the remote-TPU proxy plugin's factory BEFORE any backend initializes:
# the deployment sitecustomize registers a proxy whose wedged tunnel hangs
# any backend init — merely setting JAX_PLATFORMS=cpu here is too late when
# that sitecustomize already imported jax at interpreter startup.
from multimodalmusig_tpu.utils.hermetic import force_cpu  # noqa: E402

force_cpu(n_virtual_devices=8)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Bundled BRCA-EU data: shipped in-repo under data/ (BSD-2, same files the
# reference bundles), with the read-only upstream mount as fallback — a bare
# clone runs the real-data tests. The skip guard remains for stripped
# checkouts without the data directory.
from multimodalmusig_tpu.utils.data import brca_data_dir  # noqa: E402

BRCA_DATA_DIR = brca_data_dir()
requires_brca_data = pytest.mark.skipif(
    not os.path.isfile(os.path.join(BRCA_DATA_DIR, "brca-eu_snv_counts.tsv")),
    reason="BRCA-EU data not present (stripped checkout)",
)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


# ---------------------------------------------------------------------------
# Shared fixtures: the reference's hand-computed tiny corpora
# (test/lda.jl:4-16, test/mmctm.jl:4-33, test/ilda.jl:4-22, test/immctm.jl:6-51)
# ---------------------------------------------------------------------------


@pytest.fixture
def lda_fixture():
    """K=2, α=0.1, η=0.1, 2 docs over a 2-term vocab (test/lda.jl:4-16)."""
    X = [
        np.array([[1, 5], [2, 8]]),
        np.array([[1, 2], [2, 5]]),
    ]
    return dict(K=2, alpha=0.1, eta=0.1, X=X)


@pytest.fixture
def mmctm_fixture():
    """K=[2,3], α=[0.1,0.1], 2 docs x 2 modalities (test/mmctm.jl:4-33)."""
    X = [
        [np.array([[1, 5], [2, 8]]), np.array([[1, 2], [2, 5]])],
        [np.array([[3, 4], [4, 9]]), np.array([[3, 4], [4, 6]])],
    ]
    return dict(K=[2, 3], alpha=[0.1, 0.1], X=X)
