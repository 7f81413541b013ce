from .online import (OnlineKMeans, OnlineLogisticRegression,
                     OnlineStandardScaler, OnlineStandardScalerModel)
from .windows import Windows

__all__ = ["OnlineStandardScaler", "OnlineStandardScalerModel",
           "OnlineKMeans", "OnlineLogisticRegression", "Windows"]
