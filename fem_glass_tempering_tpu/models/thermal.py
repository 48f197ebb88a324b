"""Thermal parameter bundle.

Replaces the reference's ThermalModel (ThermalModel.py:6-29), which wraps the
heat-equation parameters as mesh-bound dolfinx Constants. In JAX, scalars fold
into jitted kernels as compile-time constants, so this is a thin named view
over ModelParams kept for API parity; rho/cp/k are carried but (like the
reference weak form, ThermoViscoProblem.py:293-306) unused by the form.
"""

from __future__ import annotations

from dataclasses import dataclass

from fem_glass_tempering_tpu.config import ModelParams


@dataclass(frozen=True)
class ThermalModel:
    f: float
    epsilon: float
    sigma: float
    alpha: float
    htc: float
    rho: float
    cp: float
    k: float
    T_ambient: float

    @staticmethod
    def from_params(p: ModelParams) -> "ThermalModel":
        return ThermalModel(
            f=p.f, epsilon=p.epsilon, sigma=p.sigma, alpha=p.alpha,
            htc=p.htc, rho=p.rho, cp=p.cp, k=p.k, T_ambient=p.T_ambient,
        )
