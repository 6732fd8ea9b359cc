"""Linear-algebra backends (ref S6-S9): dense, BCR chain+Schur, PCG."""

from . import chain, dense, matfree, pcg, smallblock, tridiag  # noqa: F401
