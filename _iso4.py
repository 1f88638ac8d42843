import time, sys, jax, jax.numpy as jnp, optax
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
ids0 = jax.random.randint(k2,(B,26),1,V,jnp.int32)
label = jax.random.bernoulli(k3,0.3,(B,)).astype(jnp.float32)

def grad_of(ids_i, p):
    batch = {"dense": dense, "sparse": ids_i, "label": label}
    return jax.grad(lambda p: loss_fn(model,p,{},batch,jax.random.PRNGKey(0))[0])(p)

def timeit(name, body_fn, n=10):
    @jax.jit
    def loop(ids, p, o):
        def body(i, carry):
            p, o = carry
            return body_fn((ids + i) % V, p, o)
        return jax.lax.fori_loop(0, n, body, (p, o))
    print("compiling", name, file=sys.stderr, flush=True)
    c = loop(ids0, ts.params, ts.opt_state)
    float(jnp.sum(jax.tree_util.tree_leaves(c[0])[0][0]))
    t0=time.perf_counter(); c = loop(ids0, ts.params, ts.opt_state)
    float(jnp.sum(jax.tree_util.tree_leaves(c[0])[0][0]))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

which = sys.argv[1]
if which == "A":
    def A(ids_i, p, o):
        g = grad_of(ids_i, p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g), o
    timeit("grads -> axpy into params", A)
elif which == "C":
    def C(ids_i, p, o):
        g = grad_of(ids_i, p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2
    timeit("full adam step", C)
