"""Hand-written Pallas TPU kernels for the bandwidth-bound hot ops."""

from gp_grief_tpu.ops.pallas.kron_pallas import (
    fused_schedule_applicable,
    kron_matmat_pallas,
    kron_matvec_fused,
    kron_matvec_pallas,
    kron_matvec_slab,
    last_slab_pass,
    slab_schedule_applicable,
)
from gp_grief_tpu.ops.pallas.phi_pallas import phi_fused_pallas

__all__ = [
    "kron_matvec_pallas",
    "kron_matmat_pallas",
    "kron_matvec_slab",
    "kron_matvec_fused",
    "last_slab_pass",
    "slab_schedule_applicable",
    "fused_schedule_applicable",
    "phi_fused_pallas",
]
