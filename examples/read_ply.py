"""Read a PLY scene and upload it to a device buffer
(reference: examples/read_ply.rs).

Usage: python examples/read_ply.py [path/to/model.ply]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wgpu_3dgs_core_tpu import (  # noqa: E402
    GaussianSoA,
    GaussiansBuffer,
    read_ply,
)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "model.ply"
    )
    ply = read_ply(path)
    soa = GaussianSoA.from_ply(ply)
    buf = GaussiansBuffer.new(soa)
    print(f"loaded {len(buf)} gaussians ({buf.nbytes} bytes on device)")
    print(f"first position: {soa.pos[0]}")


if __name__ == "__main__":
    main()
