"""lexls_tpu — a TPU-native lexicographic least-squares framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++ library lexls (jrl-umi3218/lexls): lexicographic QR over
cascaded priority levels, a primal active-set method for inequality
hierarchies, warm/hot starting across sequences of related problems,
regularization, and batched multi-chip solving over a device mesh.
"""

__version__ = "0.1.0"

from .types import (
    CtrType,
    EqualityHierarchy,
    InequalityHierarchy,
    LexLSError,
    ObjectiveType,
    ParametersLexLSE,
    ParametersLexLSI,
    RegularizationType,
    TerminationStatus,
    build_general_hierarchy,
    build_hierarchy_with_bounds,
)
from .api import LexLSE, LexLSEResult
from .lexlsi import (
    LexLSIResult,
    LexLSIState,
    Structure,
    solve,
    solve_collect_wrong_sign,
    solve_core,
    solve_core_batched,
    solve_lambda,
)

__all__ = [
    "LexLSE",
    "LexLSEResult",
    "LexLSIResult",
    "LexLSIState",
    "Structure",
    "solve",
    "solve_collect_wrong_sign",
    "solve_core",
    "solve_core_batched",
    "solve_lambda",
    "CtrType",
    "EqualityHierarchy",
    "InequalityHierarchy",
    "LexLSError",
    "ObjectiveType",
    "ParametersLexLSE",
    "ParametersLexLSI",
    "RegularizationType",
    "TerminationStatus",
    "build_general_hierarchy",
    "build_hierarchy_with_bounds",
]
