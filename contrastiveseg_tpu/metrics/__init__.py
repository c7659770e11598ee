from contrastiveseg_tpu.metrics.running_score import RunningScore

__all__ = ["RunningScore"]
