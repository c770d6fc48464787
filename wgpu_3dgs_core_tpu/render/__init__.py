from .camera import Camera
from .reference import render_reference
from .renderer import (
    RenderResult,
    measure_max_fragments,
    render,
    render_gaussians,
)
from .train import TrainableGaussians, fit, make_train_step

__all__ = [
    "Camera",
    "render_reference",
    "RenderResult",
    "measure_max_fragments",
    "render",
    "render_gaussians",
    "TrainableGaussians",
    "fit",
    "make_train_step",
]
