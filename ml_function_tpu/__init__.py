"""ml_function_tpu — a TPU-native CTR training & scoring framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
model zoo ``TIXhjq/ML_Function`` (TF2 Keras): the full feature-interaction and
behavior-sequence CTR model lineages, sparse/dense/sequence feature pipeline,
graph-embedding pretraining, GBDT feature harness — plus multi-chip sharding
(pjit/shard_map over a device mesh) and fused Pallas kernels the reference
lacks. See SURVEY.md for the structural map.
"""

__version__ = "0.1.0"

from .features.schema import (DenseSpec, FeatureSet, SeqSpec, SparseSpec,
                              criteo_feature_set)


def __getattr__(name):
    # lazy top-level conveniences (keep `import ml_function_tpu` light)
    if name in ("get_model", "MODEL_REGISTRY"):
        from . import models
        return getattr(models, name)
    if name in ("fit", "train_test_split", "iter_batches"):
        from .train import loop
        return getattr(loop, name)
    if name in ("Scorer", "export_model", "load_scorer"):
        from . import serving
        return getattr(serving, name)
    if name in ("MetaEmbedding", "make_meta_train_step", "fnn_from_fm"):
        from . import models
        return getattr(models, name)
    if name in ("plan_field_order", "expected_shard_loads"):
        from .parallel import planner
        return getattr(planner, name)
    if name in ("RowAdagrad", "RowAdam", "make_sparse_train_step",
                "create_sparse_train_state", "make_row_optimizer"):
        from .train import sparse
        return getattr(sparse, name)
    raise AttributeError(name)


__all__ = [
    "DenseSpec", "SparseSpec", "SeqSpec", "FeatureSet", "criteo_feature_set",
    "get_model", "MODEL_REGISTRY", "fit", "train_test_split", "iter_batches",
    "Scorer", "export_model", "load_scorer", "MetaEmbedding",
    "make_meta_train_step", "fnn_from_fm", "plan_field_order",
    "expected_shard_loads", "RowAdagrad", "RowAdam",
    "make_sparse_train_step", "create_sparse_train_state",
    "make_row_optimizer",
]
