import time, jax, jax.numpy as jnp
from ml_function_tpu.ops.kernels.embedding_grad import grouped_gather, split_gather
B, F, V, D = 8192, 26, 100_000, 8
TV = F*V
groups = tuple((j*V, (j+1)*V, (j,)) for j in range(F))
k = jax.random.PRNGKey(0)
ids = jax.random.randint(k, (B, F), 0, V, jnp.int32) + jnp.arange(F, dtype=jnp.int32)[None]*V
tab = jax.random.normal(jax.random.PRNGKey(1), (TV, D), jnp.float32)

def timeit(name, f, n=20):
    @jax.jit
    def loop(ids, tab):
        def body(i, acc):
            ids_i = (ids % V + i) % V + (ids // V) * V
            g = jax.grad(lambda t: jnp.sum(jnp.square(f(t, ids_i))))(tab)
            return acc + g[0, 0] * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    float(loop(ids, tab)); t0=time.perf_counter(); float(loop(ids, tab))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

timeit("split_gather fwd+bwd", lambda t, i: split_gather(t, i.reshape(-1), 8))
timeit("grouped_gather fwd+bwd", lambda t, i: grouped_gather(t, i, groups, 8))
