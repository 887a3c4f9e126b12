from . import linalg  # noqa: F401
from .linalg import (  # noqa: F401
    eigh,
    eigh_jacobi,
    force_hermitian,
    unit_norm,
    stable_solve,
    solve_pinv,
    get_pca,
    gev_max_eigvec,
    condition_hermitian,
)
