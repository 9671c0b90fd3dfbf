"""TPU experiment 9: K-padded pack dot (37 -> 128 contraction)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np

print("devices:", jax.devices(), flush=True)

def timed(name, fn, state, iters=30):
    state = fn(state); jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.3f} ms", flush=True)

key = jax.random.PRNGKey(0)
for Kdim in (37, 64, 128):
    M0 = jax.random.normal(key, (14080, Kdim), jnp.float32)
    F0 = jax.random.normal(key, (Kdim, 10112), jnp.float32)
    def dot_chained(c, M0=M0, F0=F0):
        s, _ = c
        M, F = jax.lax.optimization_barrier((M0 + s * 1e-30, F0))
        out = jnp.dot(M, F, precision=jax.lax.Precision.HIGH)
        return (out[0, 0] * 1e-30, out)
    timed(f"dot 14080x{Kdim}x10112 HIGH", jax.jit(dot_chained),
          (0.0, jnp.zeros((14080, 10112))))
# selected-size control (fits VMEM)
M0 = jax.random.normal(key, (2640, 37), jnp.float32)
F0 = jax.random.normal(key, (37, 10112), jnp.float32)
def dot_sel(c):
    s, _ = c
    M, F = jax.lax.optimization_barrier((M0 + s * 1e-30, F0))
    out = jnp.dot(M, F, precision=jax.lax.Precision.HIGH)
    return (out[0, 0] * 1e-30, out)
timed("dot 2640x37x10112 HIGH (VMEM-fit)", jax.jit(dot_sel),
      (0.0, jnp.zeros((2640, 10112))))
print("DONE", flush=True)
