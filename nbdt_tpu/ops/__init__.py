"""Pallas TPU kernels for the NBDT hot path."""

from .soft_traversal import (
    fused_soft_head,
    make_fused_soft_head,
    prepare_head_constants,
)
