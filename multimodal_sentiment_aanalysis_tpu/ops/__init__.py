from .losses import (
    supervised_infonce,
    ntxent_supervised_two_view,
    ntxent_indexed,
    cross_entropy,
    masked_cross_entropy,
    masked_accuracy,
)
from .rnn import lstm, bilstm_stack

__all__ = [
    "supervised_infonce",
    "ntxent_supervised_two_view",
    "ntxent_indexed",
    "cross_entropy",
    "masked_cross_entropy",
    "masked_accuracy",
    "lstm",
    "bilstm_stack",
]
