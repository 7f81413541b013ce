from .kmeans import KMeans, KMeansModel

__all__ = ["KMeans", "KMeansModel"]
