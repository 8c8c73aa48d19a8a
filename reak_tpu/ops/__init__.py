"""Pallas TPU kernels for the hot compute path.

(SURVEY.md §2.24: "Pallas kernels: fused twist-shaping/aggregate-mass
assembly, blocked Cholesky/QR for the condensed MPC QP, batched small-matrix
solves" — the batched-solve kernel lives here; mass assembly stays in the
fused SoA trace, which XLA already emits as full-lane VPU code.)
"""
from reak_tpu.ops import chol_lanes

__all__ = ["chol_lanes"]
