"""Runtime: inference engine, classifier API, serving."""

from bnn_pynq_tpu.runtime.engine import InferenceEngine  # noqa: F401
