"""dt-adaptive failure recovery tests (the reference just aborts on a
failed Newton solve, ThermoViscoProblem.py:390)."""

import pytest

from fem_glass_tempering_tpu.config import (
    FEConfig,
    OutputConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem


def _cfg(dt, max_it, on_failure):
    return RunConfig(
        fe=FEConfig(),
        time=TimeConfig(0.0, dt, dt),     # one step
        solver=SolverConfig(newton_max_it=max_it, on_failure=on_failure),
        output=OutputConfig(write_every=0, formats=()),
    )


def test_raise_on_failure():
    prob = ThermoViscoProblem(config=_cfg(40.0, 4, "raise"))
    prob.setup()
    with pytest.raises(RuntimeError, match="failed to converge"):
        prob.solve()


def test_halve_dt_recovers():
    prob = ThermoViscoProblem(config=_cfg(40.0, 4, "halve_dt"))
    prob.setup()
    st = prob.solve()
    assert getattr(prob.diagnostics, "dt_halvings", 0) >= 1
    # time still reaches the end of the step
    assert float(st.t) == pytest.approx(40.0, rel=1e-12)


def test_halve_dt_exhausts():
    cfg = _cfg(40.0, 1, "halve_dt")   # 1 Newton iteration can never pass
    prob = ThermoViscoProblem(config=cfg)
    prob.setup()
    with pytest.raises(RuntimeError, match="dt halvings"):
        prob.solve()
