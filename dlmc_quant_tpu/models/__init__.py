"""Model zoo: TPU-native (NHWC, flax) classification models.

Mirrors the reference's model zoo capability (ref: model/classification/)
with a registry of factory functions; see ``registry.py``.
"""

from dlmc_quant_tpu.models.registry import get_model, list_models, register  # noqa: F401
