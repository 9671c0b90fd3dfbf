"""Focused pack microbenchmark: why is the pack matmul at 65 GB/s?"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np

print("devices:", jax.devices(), flush=True)

def bench(name, fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return dt

key = jax.random.PRNGKey(0)
Pp = 10112
for rows, tag in [(14080, "full-T"), (1280, "128-tri"), (2560, "256-tri")]:
    M = jax.random.normal(key, (rows, 37), jnp.float32)
    F = jax.random.normal(key, (37, Pp), jnp.float32)
    gb = rows * Pp * 4 / 1e9
    for prec in ["default", "high", "highest"]:
        p = dict(default=jax.lax.Precision.DEFAULT,
                 high=jax.lax.Precision.HIGH,
                 highest=jax.lax.Precision.HIGHEST)[prec]
        f = jax.jit(lambda M, F, p=p: jnp.dot(M, F, precision=p))
        dt = bench(f"dot {tag} ({rows}x37x{Pp}) {prec} [{gb:.2f}GB out]",
                   f, M, F)
        print(f"   -> {gb/dt:.0f} GB/s effective", flush=True)

# K-padded variant: pad contraction to 128 explicitly
M = jax.random.normal(key, (14080, 128), jnp.float32)
F = jax.random.normal(key, (128, Pp), jnp.float32)
f = jax.jit(lambda M, F: jnp.dot(M, F, precision=jax.lax.Precision.HIGH))
dt = bench("dot 14080x128x10112 high", f, M, F)
print(f"   -> {14080*Pp*4/1e9/dt:.0f} GB/s effective", flush=True)

# bf16 output variant
f = jax.jit(lambda M, F: jnp.dot(M, F, precision=jax.lax.Precision.HIGH,
                                 preferred_element_type=jnp.float32))
# transpose orientation: (Pp, 37) @ (37, 10T)
Mt = jax.random.normal(key, (37, 14080), jnp.float32)
Ft = jax.random.normal(key, (Pp, 37), jnp.float32)
f2 = jax.jit(lambda Ft, Mt: jnp.dot(Ft, Mt, precision=jax.lax.Precision.HIGH))
dt = bench("dot transposed 10112x37x14080 high", f2, Ft, Mt)
print(f"   -> {14080*Pp*4/1e9/dt:.0f} GB/s effective", flush=True)

# plain copy for reference bandwidth
X = jax.random.normal(key, (14080, Pp), jnp.float32)
f3 = jax.jit(lambda x: x * 1.0000001)
dt = bench("elementwise copy 0.57GB", f3, X)
print(f"   -> {2*14080*Pp*4/1e9/dt:.0f} GB/s r+w effective", flush=True)
print("DONE", flush=True)
