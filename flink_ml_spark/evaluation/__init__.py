from .binaryclassification import BinaryClassificationEvaluator
from .ranking import RankingEvaluator

__all__ = ["BinaryClassificationEvaluator", "RankingEvaluator"]
