"""Does jax.block_until_ready actually block on this backend?

Round-5 session 2 recorded (tools/immctm_extrap_ab.py) that on the remote
axon backend block_until_ready can return before execution completes, which
would make every tool that times through it (roofline.py, iter_marginal.py,
eta_marginal.py, ...) undercount walls. This measures the same compiled
~O(100 ms) computation timed three ways:

  enqueue only      (no sync)              -> pure dispatch cost
  block_until_ready                        -> ? (the question)
  np.asarray fetch  (device_get)           -> ground truth upper bound

If block ~= fetch, block_until_ready is a real barrier here and the timing
tools stand. If block ~= enqueue, every block-timed number is wrong.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = 4096

    @jax.jit
    def work(a):
        def body(_, x):
            return jnp.tanh(x @ x) * 0.999 + 0.001

        # scalar output: the fetch arm then measures compute + a ~4-byte
        # transfer, not a 67 MB tunnel copy
        return jnp.sum(jax.lax.fori_loop(0, 30, body, a))

    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), jnp.float32)
    out = work(a)
    np.asarray(out)  # compile + drain

    def rep(f, k=5):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    t_enq = rep(lambda: work(a))
    # drain anything in flight before the next timing mode
    np.asarray(work(a))
    t_blk = rep(lambda: jax.block_until_ready(work(a)))
    np.asarray(work(a))
    t_fch = rep(lambda: np.asarray(work(a)))

    print(f"platform={jax.default_backend()}  n={n}  30-deep matmul chain")
    print(f"  enqueue only      : {t_enq * 1e3:9.2f} ms")
    print(f"  block_until_ready : {t_blk * 1e3:9.2f} ms")
    print(f"  np.asarray fetch  : {t_fch * 1e3:9.2f} ms")
    if t_blk < 0.5 * t_fch:
        print("  -> block_until_ready is NOT a barrier here; "
              "block-timed tools undercount")
    else:
        print("  -> block_until_ready blocks correctly here")


if __name__ == "__main__":
    main()
