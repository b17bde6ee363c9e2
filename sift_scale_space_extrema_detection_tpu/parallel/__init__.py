"""Multi-device / multi-host parallel execution (see distributed.py)."""

from .distributed import (
    detect_and_describe_data_parallel,
    distributed_bundle_adjust,
    make_mesh,
)

__all__ = [
    "detect_and_describe_data_parallel",
    "distributed_bundle_adjust",
    "make_mesh",
]
