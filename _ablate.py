import time, jax, jax.numpy as jnp, optax
from ml_function_tpu.features.schema import criteo_feature_set
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import create_train_state, loss_fn

BATCH=8192; VOCAB=100_000
fs = criteo_feature_set([VOCAB]*26, n_dense=13, embed_dim=8)
model = get_model("deepfm", fs, hidden=(256,128,64))
opt = optax.adam(1e-3)
ts = create_train_state(model, jax.random.PRNGKey(0), opt)
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(1),3)
batch = {"dense": jax.random.uniform(k1,(BATCH,13),jnp.float32),
         "sparse": jax.random.randint(k2,(BATCH,26),1,VOCAB,jnp.int32),
         "label": jax.random.bernoulli(k3,0.3,(BATCH,)).astype(jnp.float32)}

def timeit(name, f, carry, n=30):
    @jax.jit
    def run(c): return jax.lax.fori_loop(0,n,lambda i,c: f(c), c)
    c = run(carry); float(jnp.sum(jax.tree_util.tree_leaves(c)[0]).astype(jnp.float32))
    t0=time.perf_counter(); c=run(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(c)[0]).astype(jnp.float32))
    per=(time.perf_counter()-t0)/n
    print(f"{name}: {per*1e3:.3f} ms")

p0, o0 = ts.params, ts.opt_state
# forward only
def fwd(p):
    l,_,_ = model.apply(p,{},batch,train=False)
    return jax.tree_util.tree_map(lambda x: x + 0*jnp.sum(l)*1e-9, p)
timeit("forward", fwd, p0)
# grad only
def g(p):
    grads = jax.grad(lambda p: loss_fn(model,p,{},batch,jax.random.PRNGKey(0))[0])(p)
    return jax.tree_util.tree_map(lambda a,b: a+1e-9*b, p, grads)
timeit("fwd+bwd", g, p0)
# full step adam
def step_adam(c):
    p,o = c
    grads = jax.grad(lambda p: loss_fn(model,p,{},batch,jax.random.PRNGKey(0))[0])(p)
    u,o = opt.update(grads,o,p)
    return optax.apply_updates(p,u), o
timeit("fwd+bwd+adam", step_adam, (p0,o0))
# full step sgd
sgd = optax.sgd(1e-3); os0 = sgd.init(p0)
def step_sgd(c):
    p,o = c
    grads = jax.grad(lambda p: loss_fn(model,p,{},batch,jax.random.PRNGKey(0))[0])(p)
    u,o = sgd.update(grads,o,p)
    return optax.apply_updates(p,u), o
timeit("fwd+bwd+sgd", step_sgd, (p0,os0))
