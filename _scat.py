import time, jax, jax.numpy as jnp
B, F, V, D = 8192, 26, 100_000, 8
TV = F * V
k = jax.random.PRNGKey(0)
ids = jax.random.randint(k, (B, F), 0, V, jnp.int32) + jnp.arange(F, dtype=jnp.int32)[None]*V
g = jax.random.normal(jax.random.PRNGKey(1), (B*F, D), jnp.float32)

def timeit(name, f, n=20):
    @jax.jit
    def loop(ids, g):
        def body(i, acc):
            ids_i = (ids + i) % V + (ids // V) * 0  # keep in range, depend on i
            o = f(ids_i, g + acc)
            return acc + jnp.sum(jax.tree_util.tree_leaves(o)[0][0]).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    float(loop(ids, g)); t0=time.perf_counter(); float(loop(ids, g))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

def s1(ids, g):
    return jnp.zeros((TV, D), jnp.float32).at[ids.reshape(-1)].add(g)
timeit("1 scatter (2.6M,8)", s1)

for G in (2, 13, 26):
    fg = F // G
    def sG(ids, g, G=G, fg=fg):
        outs = []
        gr = g.reshape(B, F, D)
        for j in range(G):
            sub = ids[:, j*fg:(j+1)*fg].reshape(-1)
            gj = gr[:, j*fg:(j+1)*fg].reshape(-1, D)
            outs.append(jnp.zeros((fg*V, D), jnp.float32).at[sub % (fg*V)].add(gj))
        return outs
    timeit(f"{G} disjoint scatters", sG)
