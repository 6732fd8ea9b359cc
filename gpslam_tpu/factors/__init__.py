"""Factor kernels (ref G3-G9): GP priors, interpolators, measurements."""

from . import gp_priors, interpolate, measurements  # noqa: F401
