from .base import IBISState, SMC2State, SMCConfig, StepInfo
from .density_tempered import TemperStage, density_tempered
from .ibis import IBIS
from .smc2 import SMC2, expected_parameters

__all__ = [
    "SMCConfig",
    "SMC2State",
    "IBISState",
    "StepInfo",
    "SMC2",
    "IBIS",
    "density_tempered",
    "TemperStage",
    "expected_parameters",
]
