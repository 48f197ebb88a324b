"""fem_glass_tempering_tpu — a TPU-native coupled thermo-viscoelastic FEM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pzimbrod/fem-glass-tempering ("SurroGlas"): an implicit nonlinear heat
equation (convective + T^4 radiative cooling, CG or SIPG-DG elements)
coupled to a Tool-Narayanaswamy / Prony-series viscoelastic tempering
model, on 1D/2D/3D meshes, single- or multi-chip via jax.sharding.

Layer map (TPU-first, cf. reference layer map in SURVEY.md §1):
  - fem/      SoA mesh, element tabulation, function spaces  (replaces dolfinx C++/basix)
  - ops/      batched element kernels, assembly, interpolation (replaces FFCx codegen)
  - solver/   matrix-free Newton-Krylov                        (replaces PETSc/NewtonSolver)
  - models/   thermal + viscoelastic physics, problem driver  (replaces the reference's Python layer)
  - parallel/ mesh partitioning + shard_map halo exchange     (replaces MPI/mpi4py)
  - io/       VTU/XDMF/npz writers, checkpoint/resume         (replaces ADIOS2/HDF5)
"""

__version__ = "0.1.0"

from fem_glass_tempering_tpu.config import (  # noqa: F401
    FEConfig,
    ModelParams,
    SolverConfig,
    TimeConfig,
    default_model_params,
)
