from .activations import Dice, PReLU, activation_fn, make_activation
from .core import DNN, PredictionLayer, LocalActivationUnit, torch_linear_init
from .interaction import (
    FM,
    CIN,
    AFMLayer,
    BiInteractionPooling,
    BilinearInteraction,
    ConvLayer,
    CrossNet,
    CrossNetMix,
    InnerProductLayer,
    InteractingLayer,
    LogTransformLayer,
    OutterProductLayer,
    SENETLayer,
)
from .sequence import (
    AGRUCell,
    AUGRUCell,
    AttentionSequencePoolingLayer,
    DynamicGRU,
    KMaxPooling,
    SequencePoolingLayer,
)
from .cin_attention import (
    AttentionPooling,
    CINAttention,
    CINAttentionV2,
    MultiHeadSelfAttention,
)
