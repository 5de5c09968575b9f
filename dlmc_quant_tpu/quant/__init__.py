from dlmc_quant_tpu.quant.config import (  # noqa: F401
    LayerQConfig,
    QuantScheme,
    TensorQConfig,
    scheme_from_dict,
)
