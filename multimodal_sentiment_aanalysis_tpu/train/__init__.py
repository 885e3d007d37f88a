from .state import TrainState, module_mask, zero_masked_grads
from .multitask import MultiTaskTrainer, PHASES
from .engine import Trainer
from .simclr import contrastive_pretrain, finetune
from .memhacl import memhacl_pretrain, memhacl_finetune
from .vloso import VectorizedLOSOTrainer
from .vphased import VectorizedPhasedTrainer
from .vsimclr import VectorizedSimCLRTrainer

__all__ = [
    "TrainState",
    "module_mask",
    "zero_masked_grads",
    "MultiTaskTrainer",
    "PHASES",
    "Trainer",
    "contrastive_pretrain",
    "finetune",
    "memhacl_pretrain",
    "memhacl_finetune",
    "VectorizedLOSOTrainer",
    "VectorizedPhasedTrainer",
    "VectorizedSimCLRTrainer",
]
