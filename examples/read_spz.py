"""Read an SPZ scene and upload it to a device buffer
(reference: examples/read_spz.rs).

Usage: python examples/read_spz.py [path/to/model.spz]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wgpu_3dgs_core_tpu import (  # noqa: E402
    GaussianSoA,
    GaussiansBuffer,
    read_spz,
)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "model.spz"
    )
    spz = read_spz(path)
    soa = GaussianSoA.from_spz(spz)
    buf = GaussiansBuffer.new(soa)
    print(f"loaded {len(buf)} gaussians (SPZ v{spz.header.version}, "
          f"SH degree {spz.header.sh_degree})")
    print(f"first position: {soa.pos[0]}")


if __name__ == "__main__":
    main()
