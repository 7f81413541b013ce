from .binaryclassification import BinaryClassificationEvaluator
from .calibration import CalibrationEvaluator
from .multiclass import MulticlassClassificationEvaluator
from .ranking import RankingEvaluator, ReciprocalRankFusion
from .regression import RegressionEvaluator
from .sliced import SlicedBinaryClassificationEvaluator

__all__ = ["BinaryClassificationEvaluator", "CalibrationEvaluator",
           "MulticlassClassificationEvaluator", "RankingEvaluator",
           "ReciprocalRankFusion", "RegressionEvaluator",
           "SlicedBinaryClassificationEvaluator"]
