"""Model zoo: SFC/LFC/CNV network configs and inference graph builders."""

from bnn_pynq_tpu.models.config import (  # noqa: F401
    ConvSpec, DenseSpec, PoolSpec, NetworkConfig,
    sfc, lfc, cnv, get_config, AVAILABLE_CONFIGS,
)
