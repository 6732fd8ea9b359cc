"""GP prior closed forms (reference: gpslam/gp/GPutils, SURVEY.md §2.1 G2)."""

from . import wnoa, wnoj  # noqa: F401
