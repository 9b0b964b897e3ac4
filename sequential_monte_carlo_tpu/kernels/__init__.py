"""Pallas TPU kernels for the measured hot paths (SURVEY.md §7.7).

Resample+gather generations (all bitwise-equal to searchsorted+take):
``resample_pallas.resample_gather`` (dense f32), ``resample_gather_bytes``
(dense int8 byte-plane) and ``resample_walk`` (monotone chunk-walk with
in-kernel byte-planing — the one the filters route to). Superseded
generations live outside the shipped package as measured ablation records:
``benchmarks/ablations/resample_banded.py`` (gen 2, windowed) and
``benchmarks/ablations/resample_take_walk.py`` (gen 5, lane-gather —
loses 2× to the matmul walk). UC-SV model kernel: ``ucsv_pallas`` (fused
propagate+reweight). The whole-step walk+propagate+reweight mega-kernels
(round 1's ``ucsv_step_pallas``, round 2's ``ucsv_walk_pallas``) are
deleted: both lost to the two-kernel route at every measured size because
the planar layout starves the in-kernel propagate of sublanes
(PERF_NOTES.md).
"""
from .resample_pallas import (
    resample_gather,
    resample_gather_bytes,
    stratified_uniforms,
    systematic_uniforms,
)
from .resample_walk import resample_gather_walk

__all__ = [
    "resample_gather",
    "resample_gather_bytes",
    "resample_gather_walk",
    "stratified_uniforms",
    "systematic_uniforms",
]
