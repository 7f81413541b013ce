from .binaryclassification import BinaryClassificationEvaluator
from .ranking import RankingEvaluator, ReciprocalRankFusion

__all__ = ["BinaryClassificationEvaluator", "RankingEvaluator"]
