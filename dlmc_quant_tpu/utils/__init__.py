from dlmc_quant_tpu.utils.config import ConfigParser  # noqa: F401
from dlmc_quant_tpu.utils.metric_tracker import MetricTracker  # noqa: F401
