"""Multi-chip scaling: meshes, tensor-parallel inference, sharded training."""

from bnn_pynq_tpu.parallel.mesh import make_mesh  # noqa: F401
