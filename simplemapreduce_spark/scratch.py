"""Scratch-directory layout for sink round-trip queries.

One helper so every sink path (csv/json/orc/xml round-trips, the
foreachBatch parquet sink) lands under the same GC-managed root
(session.gc_scratch cleans stale runs).
"""

from __future__ import annotations

import os
import tempfile


def scratch_dir(kind: str, sf_dir: str) -> str:
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), "smr_scratch", f"{kind}_{sf_tag}")
