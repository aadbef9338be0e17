from prom_etl_db_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
