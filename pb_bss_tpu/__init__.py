"""pb_bss_tpu: TPU-native multi-channel blind source separation.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
fgnt/pb_bss: complex directional mixture-model EM (cACGMM, complex
Watson/Bingham, vMF, GMM and spatial+spectral integration models),
frequency permutation alignment, mask/beamforming extraction
(GEV/MVDR/wMWF/LCMV/PCA) and on-device evaluation metrics.

Design: models are pytree dataclasses, trainers are jitted ``lax.scan``
EM loops, the independent frequency axis is the sharding axis over a
``jax.sharding.Mesh``, and the hot kernels (quadratic form, weighted
scatter, batched Hermitian eigh) are MXU/VPU-shaped.
"""
import sys as _sys

from . import utils  # noqa: F401
from . import parallel  # noqa: F401
from . import pipeline  # noqa: F401
from .pipeline import separate  # noqa: F401
from . import streaming  # noqa: F401
from .streaming import StreamingSeparator  # noqa: F401
from . import math  # noqa: F401
from . import ops  # noqa: F401
from . import initializer  # noqa: F401
from . import permutation_alignment  # noqa: F401
from .permutation_alignment import (  # noqa: F401
    DHTVPermutationAlignment,
    GreedyPermutationAlignment,
    OraclePermutationAlignment,
)
from . import extraction  # noqa: F401
from . import evaluation  # noqa: F401
from . import transform  # noqa: F401

# `models` is the distribution layer; expose the reference-compatible
# name `pb_bss_tpu.distribution` as an alias module.
from . import models  # noqa: F401
_sys.modules[__name__ + '.distribution'] = models
# ``from pb_bss_tpu.distribution.utils import ...`` needs the dotted
# submodule path registered too (attribute aliasing alone does not
# satisfy the import system's finder for `from x.y.z import n`).
_sys.modules[__name__ + '.distribution.utils'] = models.base
distribution = models

__version__ = '0.1.0'
