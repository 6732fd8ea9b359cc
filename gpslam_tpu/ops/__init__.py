"""Linear-algebra backends (ref S6-S9): dense, BCR chain+Schur, PCG,
supernodal sparse Cholesky, Pallas kernels, host-side ordering."""

from . import (  # noqa: F401
    amalgamated,
    chain,
    dense,
    matfree,
    order,
    pallas_bcr,
    pallas_chol,
    pcg,
    smallblock,
    supernodal,
    tridiag,
)
