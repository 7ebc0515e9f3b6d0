"""Scheduler registry.

The reference ships five from-scratch schedulers with precomputed tables
(utilities.py:267-1127: LMSDiscrete, DDIM, EulerAncestral, DPMSolver
multistep, PNDM); DDIM is the serving default (trt_model.py:36).
"""

from __future__ import annotations

from .ddim import DDIMScheduler
from .dpm_solver import DPMSolverMultistepScheduler
from .euler_ancestral import EulerAncestralScheduler
from .lms import LMSDiscreteScheduler
from .pndm import PNDMScheduler

_REGISTRY = {
    "DDIM": DDIMScheduler,
    "DPM": DPMSolverMultistepScheduler,
    "DPM++": DPMSolverMultistepScheduler,
    "EulerA": EulerAncestralScheduler,
    "PNDM": PNDMScheduler,
    "LMSD": LMSDiscreteScheduler,
    "LMS": LMSDiscreteScheduler,
}


def register_scheduler(name: str, cls):
    _REGISTRY[name] = cls


def make_scheduler(name: str, **kwargs):
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown scheduler {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    # constructed OUTSIDE the except: a KeyError raised inside a
    # scheduler's __init__ must surface as itself, not be misreported
    # as an unknown-scheduler error with its traceback suppressed
    return cls(**kwargs)


def available_schedulers():
    return sorted(_REGISTRY)
