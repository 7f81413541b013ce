from .dedup import (StreamingExactDeduplicator,
                    StreamingIncrementalDeduplicator)
from .cardinality import StreamingCardinalityMonitor
from .drift import StreamingDriftMonitor
from .quality import StreamingQualityGate
from .online import (OnlineKMeans, OnlineLogisticRegression,
                     OnlineStandardScaler, OnlineStandardScalerModel)
from .stateful import StatefulSessionizer, StreamingFunnel
from .windows import Windows

__all__ = ["StreamingCardinalityMonitor",
           "OnlineStandardScaler", "OnlineStandardScalerModel",
           "OnlineKMeans", "OnlineLogisticRegression",
           "StatefulSessionizer", "StreamingDriftMonitor",
           "StreamingQualityGate",
           "StreamingExactDeduplicator",
           "StreamingIncrementalDeduplicator", "Windows"]
