"""Training layer: trainer, optimizers, checkpointing."""

from connectome_gnn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from connectome_gnn_tpu.train.trainer import Trainer, reference_adam

__all__ = ["Trainer", "reference_adam", "restore_checkpoint", "save_checkpoint"]
