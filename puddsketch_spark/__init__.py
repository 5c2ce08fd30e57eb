"""puddsketch_spark — PySpark-native distributed sketch / approximate-aggregation engine.

Mergeable, Arrow-vectorized sketch UDAFs (UDDSketch quantiles + HLL, count-min,
t-digest, KLL, Bloom) over transcript-shaped tables, plus training-data
pipeline operators (dedup, similarity search, text analysis).
"""
__version__ = "0.1.0"
