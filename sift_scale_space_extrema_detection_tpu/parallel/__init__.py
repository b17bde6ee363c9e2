"""Multi-device / multi-host parallel execution (see distributed.py)."""

from .distributed import (
    detect_and_describe_data_parallel,
    distributed_bundle_adjust,
    make_mesh,
    match_against_keyframes_sharded,
)

__all__ = [
    "detect_and_describe_data_parallel",
    "distributed_bundle_adjust",
    "make_mesh",
    "match_against_keyframes_sharded",
]
