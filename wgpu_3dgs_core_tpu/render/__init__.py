from .camera import Camera
from .reference import render_reference
from .renderer import RenderResult, render, render_gaussians

__all__ = [
    "Camera",
    "render_reference",
    "RenderResult",
    "render",
    "render_gaussians",
]
