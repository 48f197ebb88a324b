"""The reference driver's workload (reference main.py:6-62), verbatim
semantics: 1D graded glass slab, t in [0, 50] s, dt = 0.1, DG-1 temperature,
CG-1 stress, radiative + convective cooling, reference physics mode."""

from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

fe_config = {
    "T": {"element": "DG", "degree": 1},
    "sigma": {"element": "CG", "degree": 1},
}

model_params = {
    "f": 0.0, "epsilon": 0.93, "sigma": 5.670e-8,
    "T_ambient": 600.0, "T_0": 800.0, "alpha": 1.0, "htc": 280.1,
    "rho": 2500.0, "cp": 1433.0, "k": 1.0,
    "H": 627.8e3, "Tb": 869.0, "Rg": 8.314,
    "alpha_solid": 9.10e-6, "alpha_liquid": 25.10e-6, "Tf_init": 873.0,
}

model = ThermoViscoProblem(config=fe_config, time=(0.0, 50.0), dt=0.1,
                           model_parameters=model_params)
model.setup(dirichlet_bc=False)
model.solve(progress=True)
