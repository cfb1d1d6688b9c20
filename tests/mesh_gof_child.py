"""Child process for test_encode_gof_mesh_byte_identical: runs the
sequential-vs-mesh production GOF comparison in a fresh interpreter (the
full-suite process accumulates enough XLA CPU state on this 2-CPU box to
OOM-crash when this heaviest test runs last)."""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vpcc_tpu.encoder import Encoder
from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.synthetic import make_sphere_cloud, make_torus_cloud
from vpcc_tpu.parallel.mesh import make_mesh


def main():
    frames = [
        make_sphere_cloud(bits=7, n_samples=14000, seed=31),
        make_torus_cloud(bits=7, n_samples=13000, seed=32),
        make_sphere_cloud(bits=7, n_samples=13500, seed=33),
    ]

    def cfg_():
        cfg = VPCCConfig()
        cfg.geometry3dCoordinatesBitdepth = 7
        cfg.resolution = 127
        cfg.minimumImageWidth = 256
        cfg.minimumImageHeight = 256
        cfg.iterationCountRefineSegmentation = 2
        cfg.geometryQP = 26
        cfg.attributeQP = 32
        return cfg

    stream_seq, rec_seq = Encoder(cfg_()).encode_gof(frames)
    mesh = make_mesh(min(4, len(jax.devices())))
    enc_mesh = Encoder(cfg_())
    stream_mesh, rec_mesh = enc_mesh.encode_gof(frames, mesh=mesh)
    assert stream_mesh == stream_seq, (
        len(stream_mesh), len(stream_seq), "mesh stream differs",
    )
    for a, b in zip(rec_seq, rec_mesh):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)
    print(f"MESH_GOF_OK {len(stream_seq)}")


if __name__ == "__main__":
    main()
