"""Write a small gaussian scene to PLY (reference: examples/write_ply.rs).

Builds three axis-colored gaussians and writes examples/model.ply.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wgpu_3dgs_core_tpu import GaussianSoA  # noqa: E402


def build_scene() -> GaussianSoA:
    n = 3
    soa = GaussianSoA.zeros(n)
    soa.pos[:] = [[-1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
    soa.color[:] = [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255]]
    soa.scale[:] = 0.3
    return soa


def main():
    path = os.path.join(os.path.dirname(__file__), "model.ply")
    scene = build_scene()
    scene.to_ply().write_to_file(path)
    print(f"wrote {len(scene)} gaussians to {path}")


if __name__ == "__main__":
    main()
