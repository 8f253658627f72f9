from sgp_tpu.utils.config import Config, config
from sgp_tpu.utils.logging import logger

__all__ = ["Config", "config", "logger"]
