"""tpu_cfd: TPU-native CFD + neural-operator framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capability set of ``scaomath/torch-cfd``
(staggered-grid finite-volume Navier-Stokes with pressure projection,
pseudo-spectral vorticity solver, SFNO/FNO3d neural operators, Sobolev/
Bochner losses, data generation and fine-tuning pipelines), designed
TPU-first: pytree field data model, pure-function steppers under
``jit``/``vmap``/``lax.scan``, batch sharding over an ICI device mesh via
``jax.sharding``, and Pallas kernels for profiled hot spots.
"""

__version__ = "0.1.0"

from tpu_cfd import boundaries, grids, tensor_utils
from tpu_cfd.grids import (
    Grid,
    GridArray,
    GridArrayTensor,
    GridArrayVector,
    GridVariable,
    GridVariableVector,
    applied,
)
from tpu_cfd.boundaries import (
    BCType,
    ConstantBoundaryConditions,
    HomogeneousBoundaryConditions,
    periodic_boundary_conditions,
)
