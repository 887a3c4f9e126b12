"""Distribution layer: complex directional densities + EM trainers.

Exported under both ``pb_bss_tpu.models`` and the reference-compatible
alias ``pb_bss_tpu.distribution``.
"""
from .base import (  # noqa: F401
    Model,
    modelclass,
    parameter_from_dict,
    get_trainer_class_from_model,
    stack_parameters,
    force_hermitian,
)
from .complex_circular_symmetric_gaussian import (  # noqa: F401
    ComplexCircularSymmetricGaussian,
    ComplexCircularSymmetricGaussianTrainer,
)
from .complex_angular_central_gaussian import (  # noqa: F401
    ComplexAngularCentralGaussian,
    ComplexAngularCentralGaussianTrainer,
    normalize_observation,
    sample_complex_angular_central_gaussian,
)
from .cacgmm import (  # noqa: F401
    CACGMM,
    CACGMMTrainer,
    sample_cacgmm,
)
from .cacgmm_streaming import (  # noqa: F401
    StreamingCACGMM,
    StreamingCACGMMState,
)
from .gaussian import (  # noqa: F401
    Gaussian,
    DiagonalGaussian,
    SphericalGaussian,
    GaussianTrainer,
)
from .gmm import (  # noqa: F401
    GMM,
    GMMTrainer,
    BinaryGMM,
    BinaryGMMTrainer,
)
from .von_mises_fisher import (  # noqa: F401
    VonMisesFisher,
    VonMisesFisherTrainer,
)
from .vmfmm import (  # noqa: F401
    VMFMM,
    VMFMMTrainer,
)
from .complex_watson import (  # noqa: F401
    ComplexWatson,
    ComplexWatsonTrainer,
)
from .cwmm import (  # noqa: F401
    CWMM,
    CWMMTrainer,
)
from .complex_bingham import (  # noqa: F401
    ComplexBingham,
    ComplexBinghamTrainer,
)
from .cbmm import (  # noqa: F401
    CBMM,
    CBMMTrainer,
)
from .gcacgmm import (  # noqa: F401
    GCACGMM,
    GCACGMMTrainer,
)
from .vmfcacgmm import (  # noqa: F401
    VMFCACGMM,
    VMFCACGMMTrainer,
)
from .fca import (  # noqa: F401
    FCA,
    FCATrainer,
)
from . import mixture_model_utils  # noqa: F401
from .mixture_model_utils import (  # noqa: F401
    estimate_mixture_weight,
    log_pdf_to_affiliation,
)

# Reference-compatible module name: ``pb_bss.distribution.utils`` holds
# the model base / serialization helpers; here that is ``models.base``
# (reference pb_bss/distribution/utils.py).
from . import base as utils  # noqa: F401
