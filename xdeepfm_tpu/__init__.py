"""xdeepfm_tpu — a TPU-native CTR feature-interaction and scoring engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
``Syclus123/xDeepFM-pytorch`` (a DeepCTR-Torch v0.2.9 fork): the xDeepFM family
(linear + CIN + DNN), attention-pooled CIN variants, the SFG "pro" variant with
AutoDis, the surrounding DeepCTR model zoo, and a Keras-style fit/evaluate/
predict engine — redesigned TPU-first (stacked embedding tables with fused
gathers, jitted train step, device-resident metrics, mesh sharding, Pallas CIN
kernels).
"""

__version__ = "0.1.0"

from .features import (
    DenseFeat,
    FeatureSchema,
    SparseFeat,
    VarLenSparseFeat,
    get_feature_names,
)

__all__ = [
    "DenseFeat",
    "FeatureSchema",
    "SparseFeat",
    "VarLenSparseFeat",
    "get_feature_names",
]
