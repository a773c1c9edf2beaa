"""Money arithmetic shared by the Arrow/pandas-side operators.

One convention, one implementation: half-away-from-zero integer cents,
matching the SQL oracles' ``CAST(CAST(v AS DECIMAL(18,2)) * 100 AS
BIGINT)`` and the decimal-cast recipe the JVM-side plans use. pandas
``.round()`` would round half-to-even and diverge on exact half-cent
doubles (ADVICE round 1).
"""

from __future__ import annotations

import numpy as np


def cents_i64(v: np.ndarray) -> int:
    """Sum of half-away-from-zero cents over a float array (2-decimal
    payment values). NaNs are rejected loudly rather than silently cast
    (int64 cast of NaN is undefined behavior in numpy)."""
    if len(v) == 0:
        return 0
    if np.isnan(v).any():
        raise ValueError("cents_i64: NaN in value column")
    return int(np.floor(np.abs(v) * 100 + 0.5).astype("int64") @ np.sign(v).astype("int64"))
