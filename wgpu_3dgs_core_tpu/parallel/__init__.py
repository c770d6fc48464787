from .mesh import (
    DATA_AXIS,
    gaussian_sharding,
    initialize_multihost,
    make_mesh,
    pad_to_multiple,
    replicated,
)
from .sharded import render_sharded

__all__ = [
    "DATA_AXIS",
    "gaussian_sharding",
    "initialize_multihost",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "render_sharded",
]
