from .orchestration import Pipeline, Stage, StageFailure

__all__ = ["Pipeline", "Stage", "StageFailure"]
