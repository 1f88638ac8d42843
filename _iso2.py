import time, jax, jax.numpy as jnp, optax
from ml_function_tpu.features.schema import criteo_feature_set
from ml_function_tpu.ops.embedding import FusedEmbedding
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import create_train_state, loss_fn

B, V = 8192, 100_000
fs = criteo_feature_set([V]*26, n_dense=13, embed_dim=8)
fe = FusedEmbedding(fs)
params = fe.init(jax.random.PRNGKey(0))
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(1),3)
ids = jax.random.randint(k2,(B,26),1,V,jnp.int32)

def timeit(name, f, n=20):
    @jax.jit
    def loop(ids):
        def body(i, acc):
            ids_i = (ids + i) % V
            return acc + f(ids_i) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    float(loop(ids)); t0=time.perf_counter(); float(loop(ids))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

# embed_inputs-equivalent fwd+bwd: cross+linear
def f1(ids_i):
    def loss(p):
        emb, lin = fe.sparse_all(p, ids_i)
        return jnp.sum(jnp.square(emb)) + jnp.sum(jnp.square(lin))
    return jax.grad(loss)(params)["table"][0, 0]
timeit("sparse_all fwd+bwd (cross+linear)", f1)

def f2(ids_i):
    def loss(p):
        emb = fe.sparse(p, ids_i)
        return jnp.sum(jnp.square(emb))
    return jax.grad(loss)(params)["table"][0, 0]
timeit("sparse only fwd+bwd", f2)

# full deepfm loss grad (params fixed ids varying)
model = get_model("deepfm", fs, hidden=(256,128,64))
mp, _ = model.init(jax.random.PRNGKey(0))
dense = jax.random.uniform(k1,(B,13),jnp.float32)
label = jax.random.bernoulli(k3,0.3,(B,)).astype(jnp.float32)
def f3(ids_i):
    batch = {"dense": dense, "sparse": ids_i, "label": label}
    g = jax.grad(lambda p: loss_fn(model,p,{},batch,jax.random.PRNGKey(0))[0])(mp)
    return g["embedding"]["table"][0,0]
timeit("deepfm loss grad", f3)
