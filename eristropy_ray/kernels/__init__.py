"""Pure numerical core — no Ray imports anywhere in this subpackage.

Kernel semantics follow the reference library (see per-module docstrings for
``/root/reference`` file:line citations) but every implementation here is a
fresh, vectorized numpy design rather than a loop transliteration: the
reference depends on numba/statsmodels/scipy/sklearn/optuna, none of which
exist in this environment.
"""

from eristropy_ray.kernels.sampen import sampen
from eristropy_ray.kernels.permen import permen
from eristropy_ray.kernels.difference import difference
from eristropy_ray.kernels.stats import mean, standard_error, mean_squared_error

__all__ = [
    "sampen",
    "permen",
    "difference",
    "mean",
    "standard_error",
    "mean_squared_error",
]
