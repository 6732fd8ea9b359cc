"""Test-suite config: enable f64 so reference computations can run in double.

Library code stays dtype-polymorphic (f32 arrays in, f32 out — python scalars
are weak-typed); tests pass explicit float32 inputs when exercising the
TPU-realistic precision path.
"""

import jax

jax.config.update("jax_enable_x64", True)
