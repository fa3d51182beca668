"""FM-index construction, serialization, and query model."""

from bwbble_tpu.index.fmindex import FMIndex  # noqa: F401
