"""TPU experiment 7: decompose pack cost (matmul vs relayout vs write)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
T10, F_dim, Pp = 14080, 37, 10112
pr = Pp // 128
M = jax.random.normal(key, (T10, F_dim), jnp.float32)
F = jax.random.normal(key, (F_dim, Pp), jnp.float32)
HI = jax.lax.Precision.HIGH

def timed(name, fn, state, iters=30):
    state = fn(state); jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.3f} ms", flush=True)

# (a) dot + fused reduce (no HBM write of the product)
timed("a: dot+sum (compute only)",
      jax.jit(lambda s: jnp.dot(M + s*1e-30, F, precision=HI).sum()), 0.0)
# (b) dot + reshape to kernel layout + reduce
timed("b: dot+reshape(T,10pr,128)+sum",
      jax.jit(lambda s: jnp.dot(M + s*1e-30, F, precision=HI)
              .reshape(T10 // 10, 10 * pr, 128).sum()), 0.0)
# (c) dot materialized in HBM (chained through a scalar)
timed("c: dot->HBM (no reshape)",
      jax.jit(lambda c: (c[0] + 1e-30*c[1][0, 0],
                         jnp.dot(M + c[0]*1e-30, F, precision=HI))),
      (0.0, jnp.zeros((T10, Pp))))
# (d) dot -> reshape -> HBM (= pack_constants shape)
timed("d: dot->reshape->HBM",
      jax.jit(lambda c: (c[0] + 1e-30*c[1][0, 0, 0],
                         jnp.dot(M + c[0]*1e-30, F, precision=HI)
                         .reshape(T10 // 10, 10 * pr, 128))),
      (0.0, jnp.zeros((T10 // 10, 10 * pr, 128))))
# (e) einsum into (pr, 10T, 128) then transpose to (10T, pr, 128) -> HBM
F3 = F.reshape(F_dim, pr, 128)
timed("e: einsum rml + transpose -> HBM",
      jax.jit(lambda c: (c[0] + 1e-30*c[1][0, 0, 0],
                         jnp.einsum("mf,frl->rml", M + c[0]*1e-30, F3,
                                    precision=HI).transpose(1, 0, 2))),
      (0.0, jnp.zeros((T10, pr, 128))))
# (f) pure relayout: (10T, Pp) -> (T, 10pr, 128) copy
X = jax.random.normal(key, (T10, Pp), jnp.float32)
timed("f: reshape relayout only",
      jax.jit(lambda c: (c[0] + 1e-30*c[1][0, 0, 0],
                         (X + c[0]*1e-30).reshape(T10 // 10, 10*pr, 128))),
      (0.0, jnp.zeros((T10 // 10, 10 * pr, 128))))
print("DONE", flush=True)
