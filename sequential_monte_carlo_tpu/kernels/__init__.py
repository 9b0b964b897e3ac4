"""Pallas TPU kernels for the measured hot paths (SURVEY.md §7.7).

Resample+gather generations (all bitwise-equal to searchsorted+take):
``resample_pallas.resample_gather`` (dense f32), ``resample_gather_bytes``
(dense int8 byte-plane), ``resample_banded`` (windowed, superseded), and
``resample_walk`` (monotone chunk-walk — the one the filters route to).
UC-SV model kernels: ``ucsv_pallas`` (fused propagate+reweight, the
two-kernel route / sharded path) and ``ucsv_walk_pallas`` (whole-step
walk+propagate+reweight fusion — the default single-chip UC-SV route;
replaced round 1's ``ucsv_step_pallas`` mega-kernel, which measured slower).
"""
from .resample_pallas import (
    resample_gather,
    resample_gather_bytes,
    stratified_uniforms,
    systematic_uniforms,
)
from .resample_walk import resample_gather_walk
from .ucsv_walk_pallas import ucsv_walk_step

__all__ = [
    "resample_gather",
    "resample_gather_bytes",
    "resample_gather_walk",
    "stratified_uniforms",
    "systematic_uniforms",
    "ucsv_walk_step",
]
