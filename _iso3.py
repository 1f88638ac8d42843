import time, jax, jax.numpy as jnp, optax
from ml_function_tpu.features.schema import criteo_feature_set
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import create_train_state, loss_fn

B, V = 8192, 100_000
fs = criteo_feature_set([V]*26, n_dense=13, embed_dim=8)
model = get_model("deepfm", fs, hidden=(256,128,64))
opt = optax.adam(1e-3)
ts = create_train_state(model, jax.random.PRNGKey(0), opt)
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(1),3)
dense = jax.random.uniform(k1,(B,13),jnp.float32)
ids = jax.random.randint(k2,(B,26),1,V,jnp.int32)
label = jax.random.bernoulli(k3,0.3,(B,)).astype(jnp.float32)

def timeit(name, vary, n=20):
    @jax.jit
    def loop(ids, p, o):
        def body(i, carry):
            p, o = carry
            ids_i = (ids + i) % V if vary else ids
            batch = {"dense": dense, "sparse": ids_i, "label": label}
            g = jax.grad(lambda p: loss_fn(model,p,{},batch,jax.random.PRNGKey(0))[0])(p)
            u, o = opt.update(g, o, p)
            return optax.apply_updates(p, u), o
        return jax.lax.fori_loop(0, n, body, (p, o))
    c = loop(ids, ts.params, ts.opt_state)
    float(jnp.sum(jax.tree_util.tree_leaves(c)[0]).astype(jnp.float32))
    t0=time.perf_counter(); c = loop(ids, ts.params, ts.opt_state)
    float(jnp.sum(jax.tree_util.tree_leaves(c)[0]).astype(jnp.float32))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

timeit("full step, varying ids", True)
timeit("full step, fixed ids", False)
