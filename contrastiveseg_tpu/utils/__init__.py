from contrastiveseg_tpu.utils.config import Config
from contrastiveseg_tpu.utils.registry import Registry
from contrastiveseg_tpu.utils.logging import get_logger

__all__ = ["Config", "Registry", "get_logger"]
