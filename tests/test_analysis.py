"""Tempering analysis/post-processing tests."""

import numpy as np

from fem_glass_tempering_tpu.config import OutputConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.models.analysis import (
    stress_l2_norm,
    temper_metrics,
    through_thickness_profile,
)
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem


def _run(n_steps=50):
    cfg = RunConfig(time=TimeConfig(0.0, n_steps * 0.1, 0.1),
                    output=OutputConfig(write_every=0, formats=()))
    prob = ThermoViscoProblem(config=cfg)
    prob.setup()
    st = prob.solve()
    return prob, st


def test_profile_extraction_and_metrics():
    prob, st = _run()
    prof = through_thickness_profile(
        prob.fs_sigma, st.sigma, axis=0,
        T_fs=prob.fs_T, T=st.T)
    assert prof.coordinate[0] == 0.0 and prof.coordinate[-1] == 50.0
    assert np.all(np.diff(prof.coordinate) > 0)
    assert prof.temperature is not None
    # surfaces are cooler than the core
    assert prof.temperature[0] < prof.temperature[len(prof.temperature) // 2]
    m = temper_metrics(prof)
    assert m["thickness"] == 50.0
    assert np.isfinite(m["surface_compression"])
    # symmetric slab: profile symmetric up to the deterministic
    # last-cell-wins asymmetry of DG->CG interpolation (~1e-4 relative; the
    # reference's sequential overwrite has the same property)
    scale = np.abs(prof.stress).max()
    np.testing.assert_allclose(prof.stress, prof.stress[::-1],
                               atol=2e-3 * scale)


def test_stress_l2_norm_positive():
    prob, st = _run(10)
    n = stress_l2_norm(prob.fs_sigma, st.sigma)
    assert n > 0
    # zero field -> zero norm
    assert stress_l2_norm(prob.fs_sigma, np.zeros_like(np.asarray(st.sigma))) == 0.0
