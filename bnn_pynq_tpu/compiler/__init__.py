"""Offline parameter compiler: BN→threshold folding + packing."""

from bnn_pynq_tpu.compiler.finnthesizer import (  # noqa: F401
    CompiledNetwork, compile_network,
)
from bnn_pynq_tpu.compiler.artifacts import (  # noqa: F401
    save_artifact, load_artifact,
)
