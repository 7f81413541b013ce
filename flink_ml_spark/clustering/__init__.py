from .agglomerativeclustering import AgglomerativeClustering
from .kmeans import KMeans, KMeansModel

__all__ = ["KMeans", "KMeansModel", "AgglomerativeClustering"]
