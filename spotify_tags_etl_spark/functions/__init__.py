from spotify_tags_etl_spark.functions.text import indel_ratio, normalize_text, normalize_udf, ratio_udf

__all__ = ["indel_ratio", "normalize_text", "normalize_udf", "ratio_udf"]
