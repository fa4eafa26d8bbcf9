"""Micro-benchmark: Pallas fused GAE kernel vs lax.scan on the real device."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from harl_tpu.ops.pallas_gae import gae_pallas
from harl_tpu.ops.returns import compute_gae


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(jax.device_get(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.time() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    for T, B in [(32, 2048), (200, 2048), (32, 8192)]:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        rewards = jax.random.normal(ks[0], (T, B, 1))
        values = jax.random.normal(ks[1], (T + 1, B, 1))
        masks = (jax.random.uniform(ks[2], (T + 1, B, 1)) > 0.1).astype(jnp.float32)
        bad = (jax.random.uniform(ks[3], (T + 1, B, 1)) > 0.1).astype(jnp.float32)

        scan = jax.jit(lambda r, v, m, b: compute_gae(r, v, m, b, 0.99, 0.95))
        pal = jax.jit(lambda r, v, m, b: gae_pallas(r, v, m, b, 0.99, 0.95))
        assoc = jax.jit(
            lambda r, v, m, b: compute_gae(r, v, m, b, 0.99, 0.95, impl="assoc")
        )
        import numpy as np

        a = jax.device_get(scan(rewards, values, masks, bad))
        b_ = jax.device_get(pal(rewards, values, masks, bad))
        c_ = jax.device_get(assoc(rewards, values, masks, bad))
        err = float(np.max(np.abs(a - b_)))
        err_assoc = float(np.max(np.abs(a - c_)))
        ts = timeit(scan, rewards, values, masks, bad)
        tp = timeit(pal, rewards, values, masks, bad)
        ta = timeit(assoc, rewards, values, masks, bad)
        print(
            f"T={T} B={B}: scan {ts*1e6:.0f}us  pallas {tp*1e6:.0f}us "
            f"assoc {ta*1e6:.0f}us  err_pallas {err:.2e} err_assoc {err_assoc:.2e}"
        )


if __name__ == "__main__":
    main()
