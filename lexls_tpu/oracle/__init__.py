"""NumPy oracle: independent reference implementation used for testing.

Plays the role of the reference's MATLAB validation prototype
(``interfaces/matlab-octave/tests/implementation/lexqr``): the JAX/TPU
solver is tested against this oracle; the oracle itself is tested against
SVD-based brute force and KKT invariants.
"""

from . import generate, lexlse, lexlsi

__all__ = ["lexlse", "lexlsi", "generate"]
