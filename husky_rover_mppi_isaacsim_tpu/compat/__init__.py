"""NumPy reference oracles for bit-match testing (never used in production).

- :mod:`warp_oracle` — scalar NumPy mirror of the Warp production kernels.
- :mod:`numpy_oracle` — mirror of the thesis ``python_mppi_projection``
  reference implementation (the BASELINE bit-match spec).
"""

from . import numpy_oracle, warp_oracle

__all__ = ["numpy_oracle", "warp_oracle"]
