"""Utilities: checkpointing, structured logging (reference aux subsystems, SURVEY.md §5)."""

from gp_grief_tpu.utils.checkpoint import load_pytree, save_pytree
from gp_grief_tpu.utils.logging import MetricLogger

__all__ = ["save_pytree", "load_pytree", "MetricLogger"]
