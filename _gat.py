import time, jax, jax.numpy as jnp
B, F, V, D = 8192, 26, 100_000, 8
TV = F * V
k = jax.random.PRNGKey(0)
ids = jax.random.randint(k, (B, F), 0, V, jnp.int32) + jnp.arange(F, dtype=jnp.int32)[None]*V
tab = jax.random.normal(jax.random.PRNGKey(1), (TV, D), jnp.float32)

def timeit(name, f, n=20):
    @jax.jit
    def loop(ids, tab):
        def body(i, acc):
            ids_i = (ids + i) % V + (ids // V) * V * 0 + (ids // V) * V
            o = f((ids % V + i) % V + (ids // V) * V, tab)
            return acc + jnp.sum(jax.tree_util.tree_leaves(o)[0][0]).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    float(loop(ids, tab)); t0=time.perf_counter(); float(loop(ids, tab))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

def g1(ids, tab):
    return tab[ids.reshape(-1)]
timeit("1 gather (2.6M,8)", g1)

for G in (2, 13, 26):
    fg = F // G
    def gG(ids, tab, G=G, fg=fg):
        outs = []
        for j in range(G):
            sub = ids[:, j*fg:(j+1)*fg].reshape(-1)
            lo = j*fg*V
            outs.append(jax.lax.dynamic_slice_in_dim(tab, lo, fg*V)[sub - lo])
        return outs
    timeit(f"{G} sliced gathers", gG)

def gG2(ids, tab, G=26, fg=1):
    outs = []
    for j in range(G):
        sub = ids[:, j].reshape(-1)
        outs.append(tab[sub])  # full-table gather, just split ids
    return outs
timeit("26 id-split gathers (full table each)", gG2)
