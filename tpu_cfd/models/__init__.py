"""Neural operators: SFNO (Spectral-Refiner) and FNO3d, flax.linen modules."""

from tpu_cfd.models.base import (
    LayerNormnd,
    PointwiseFFN,
    SpectralConv,
    apply_with_latents,
    params_to_double,
)
from tpu_cfd.models.sfno import (
    SFNO,
    HelmholtzProjection,
    LiftingOperator,
    OutConv,
    SpaceTimePositionalEncoding,
    SpectralConvS,
    SpectralConvT,
)
from tpu_cfd.models.fno3d import FNO3d
