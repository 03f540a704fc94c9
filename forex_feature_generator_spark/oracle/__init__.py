"""Pure-Python/numpy oracle: a line-faithful transcription of the reference
C# semantics (/root/reference). Used ONLY to produce golden fixtures and to
verify the vectorized Spark engine — deliberately slow and obvious.

Numeric model: C# computes features in `double` (decimal bar fields are cast
to double at every use site, e.g. DirectionalFeatures.cs:22); we use float64
throughout. C# double division by zero yields ±Inf/NaN (no exception) — the
oracle uses numpy float64 scalars with errors suppressed to match.
"""

import numpy as np

np.seterr(all="ignore")
