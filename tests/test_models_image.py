"""DICM image-CTR (models/image.py): build/grad + the image path carries a
planted VISUAL signal id embeddings cannot represent (closes the last
reference shelf paper, PARITY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_function_tpu.features.synthetic import make_image_ctr_data
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import fit, iter_batches, train_test_split


def test_dicm_forward_and_grad():
    fs, data = make_image_ctr_data(n_rows=64, n_items=20, n_cates=5,
                                   seq_len=6, img_dim=8, embed_dim=4)
    model = get_model("dicm", fs, img_dim=8, img_tower=(8,), hidden=(16, 8))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert logits.shape == (16,)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        lg, _, ax = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg)) + sum(ax.values())

    g = jax.grad(loss)(params)
    tower_g = sum(float(jnp.sum(jnp.abs(x)))
                  for x in jax.tree_util.tree_leaves(g["tower"]))
    assert np.isfinite(tower_g) and tower_g > 0  # grads reach the image tower


def test_dicm_learns_visual_signal():
    """Label is a pure image-similarity function (ad image · mean history
    image); ids see it only through ~16 observations each, so the image
    tower carries the signal. Measured on this config: DICM 0.58 AUC vs a
    DIN ablation (same data, no image path) at 0.53 — the test asserts the
    image path's absolute floor; the ablation gap is documented in
    PARITY.md."""
    fs, data = make_image_ctr_data(n_rows=6000, n_items=300, n_cates=12,
                                   seq_len=8, img_dim=16, embed_dim=4,
                                   seed=1)
    train, test = train_test_split(data, 0.2, seed=0)
    model = get_model("dicm", fs, img_dim=16, img_tower=(32, 16),
                      hidden=(32, 16))
    ts, res = fit(model, train, epochs=8, batch_size=512,
                  learning_rate=5e-3, eval_data=test)
    assert res.eval_metrics["auc"] > 0.55, res.eval_metrics
