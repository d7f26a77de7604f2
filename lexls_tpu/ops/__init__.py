"""Custom TPU kernels (Pallas) for the hot compute paths."""

from .pallas_lqr import factorize_fast_batched, panel_factorize

__all__ = ["factorize_fast_batched", "panel_factorize"]
