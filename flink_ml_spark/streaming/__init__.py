from .dedup import (StreamingExactDeduplicator,
                    StreamingIncrementalDeduplicator)
from .online import (OnlineKMeans, OnlineLogisticRegression,
                     OnlineStandardScaler, OnlineStandardScalerModel)
from .stateful import StatefulSessionizer
from .windows import Windows

__all__ = ["OnlineStandardScaler", "OnlineStandardScalerModel",
           "OnlineKMeans", "OnlineLogisticRegression",
           "StatefulSessionizer", "StreamingExactDeduplicator",
           "StreamingIncrementalDeduplicator", "Windows"]
