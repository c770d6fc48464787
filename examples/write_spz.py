"""Write a small gaussian scene to compressed SPZ
(reference: examples/write_spz.rs, which uses version 2 options).

Usage: python examples/write_spz.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wgpu_3dgs_core_tpu import SpzEncodeOptions  # noqa: E402
from write_ply import build_scene  # noqa: E402


def main():
    path = os.path.join(os.path.dirname(__file__), "model.spz")
    scene = build_scene()
    spz = scene.to_spz(SpzEncodeOptions(version=2))
    spz.write_to_file(path)
    print(f"wrote {len(spz)} gaussians to {path} "
          f"({os.path.getsize(path)} bytes compressed)")


if __name__ == "__main__":
    main()
