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

__all__ = [
    "DenseSpec", "SparseSpec", "SeqSpec", "FeatureSet", "criteo_feature_set",
]
