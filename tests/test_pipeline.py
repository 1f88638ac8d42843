"""GPipe pipeline over the 'model' axis == sequential stage application,
forward AND backward, composed with data sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.parallel.mesh import make_mesh
from ml_function_tpu.parallel.pipeline import (make_pipeline,
                                               pipeline_spec_tree,
                                               stack_stage_params)


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(data=2, model=4)


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make_params(n_stages, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), n_stages)
    return stack_stage_params(
        [{"w": jax.random.normal(k, (d, d)) * 0.5, "b": jnp.zeros((d,))}
         for k in ks])


def _sequential(stacked, x):
    for s in range(stacked["w"].shape[0]):
        x = _stage_fn(jax.tree_util.tree_map(lambda a: a[s], stacked), x)
    return x


def test_pipeline_forward_matches_sequential(mesh24):
    d, batch, m = 8, 16, 4
    params = _make_params(4, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d))
    pipe = make_pipeline(mesh24, _stage_fn, n_microbatches=m)
    got = pipe(params, x)
    want = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_backward_matches_sequential(mesh24):
    d, batch, m = 4, 8, 2
    params = _make_params(4, d, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, d))
    pipe = make_pipeline(mesh24, _stage_fn, n_microbatches=m)

    g_pipe = jax.grad(lambda p: jnp.mean(jnp.square(pipe(p, x))))(params)
    g_seq = jax.grad(lambda p: jnp.mean(jnp.square(_sequential(p, x))))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        g_pipe, g_seq)


def test_pipeline_jits_and_trains(mesh24):
    """One adam step through the pipelined tower decreases a regression
    loss — the full pp training path compiles under jit."""
    import optax
    d, batch, m = 8, 32, 4
    params = _make_params(4, d, seed=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (batch, d))
    y = jax.random.normal(jax.random.PRNGKey(6), (batch, d))
    pipe = make_pipeline(mesh24, _stage_fn, n_microbatches=m)
    opt = optax.adam(1e-2)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean(jnp.square(pipe(p, x) - y)))(params)
        upd, ost = opt.update(g, ost, params)
        return optax.apply_updates(params, upd), ost, loss

    losses = []
    for _ in range(5):
        params, ost, loss = step(params, ost)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_pipeline_bad_microbatch_split(mesh24):
    params = _make_params(4, 4)
    pipe = make_pipeline(mesh24, _stage_fn, n_microbatches=3)
    with pytest.raises(ValueError):
        pipe(params, jnp.zeros((8, 4)))  # 8 rows ≠ 2 shards × 3 microbatches


def test_pipeline_spec_tree_marks_stage_axis():
    from jax.sharding import PartitionSpec as P
    params = _make_params(4, 4)
    specs = pipeline_spec_tree(params)
    assert specs["w"] == P("model", None, None)
    assert specs["b"] == P("model", None)


def test_pipelined_autoint_matches_sequential_stack():
    """The REAL model on the pipeline (VERDICT r4 next #7): AutoInt's MHA
    block stack split over model-axis stages inside the sharded train step
    must equal the unpipelined step — same loss, logits, updated params."""
    import optax

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.parallel.train import (create_sharded_state,
                                                make_sharded_train_step,
                                                shard_batch)
    from ml_function_tpu.train.loop import iter_batches

    mesh = make_mesh(data=4, model=2)
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=5,
                                vocab_size=17, embed_dim=8, seed=2)
    model = get_model("autoint", fs, n_layers=4)
    # SGD: updates are LINEAR in grads, so the collective float
    # reassociation stays tiny in the params; Adam would turn a
    # sign-flipped near-zero gradient into a full +-lr step
    opt = optax.sgd(1e-2)
    batch = next(iter_batches(data, 64))
    got = {}
    for micro in (0, 2):
        sts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
        step = make_sharded_train_step(model, opt, mesh, donate=False,
                                       pp_microbatches=micro)
        sts2, out = step(sts, shard_batch(batch, mesh))
        got[micro] = (np.asarray(out["loss"]), np.asarray(out["logits"]),
                      [np.asarray(x) for x in
                       jax.tree_util.tree_leaves(sts2.params)])
    np.testing.assert_allclose(got[2][0], got[0][0], rtol=1e-6)
    np.testing.assert_allclose(got[2][1], got[0][1], rtol=1e-5, atol=1e-6)
    for a, b in zip(got[2][2], got[0][2]):
        # Adam normalizes tiny grads by sqrt(v): float reassociation
        # through the ppermute/psum hand-offs shows up at ~5e-4 relative
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)
