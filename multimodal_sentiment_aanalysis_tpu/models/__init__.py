from .layers import (
    PositionalEncoding,
    MultiheadAttention,
    TransformerEncoderLayer,
    TransformerEncoder,
)
from .eeg import EEGMultiScaleNet
from .subnetwork import Subnetwork
from .cross_modal import CrossModalTransformer
from .fusion_model import MultimodalTransformerModel
from .simclr import (
    EyeMLPNet,
    PPSMLPNet,
    MultiModalEncoder,
    ProjectionHead,
    Classifier,
)
from .memhacl import MEMHACLEncoder, MEMHACLClassifier
from .torch_import import (
    variables_from_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "PositionalEncoding",
    "MultiheadAttention",
    "TransformerEncoderLayer",
    "TransformerEncoder",
    "EEGMultiScaleNet",
    "Subnetwork",
    "CrossModalTransformer",
    "MultimodalTransformerModel",
    "EyeMLPNet",
    "PPSMLPNet",
    "MultiModalEncoder",
    "ProjectionHead",
    "Classifier",
    "MEMHACLEncoder",
    "MEMHACLClassifier",
    "variables_from_torch_state_dict",
    "load_torch_checkpoint",
]
