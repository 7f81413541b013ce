from .knn import Knn, KnnModel
from .linear import (LinearSVC, LinearSVCModel, LogisticRegression,
                     LogisticRegressionModel)
from .naivebayes import NaiveBayes, NaiveBayesModel

__all__ = [n for n in dir() if not n.startswith("_")]
