from contrastiveseg_tpu.losses.manager import LOSSES, build_loss

__all__ = ["LOSSES", "build_loss"]
