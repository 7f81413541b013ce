from .binaryclassification import BinaryClassificationEvaluator
from .calibration import CalibrationEvaluator
from .ranking import RankingEvaluator, ReciprocalRankFusion

__all__ = ["BinaryClassificationEvaluator", "CalibrationEvaluator",
           "RankingEvaluator", "ReciprocalRankFusion"]
