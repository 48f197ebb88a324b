"""Independent differential-validation oracles.

These are deliberately separate implementations (pure numpy/scipy, no JAX,
no code shared with the framework's assembly/solver/material modules) of
the reference's algorithms, used to break the circularity of self-anchored
golden regressions when the dolfinx stack itself is not installable.
"""
