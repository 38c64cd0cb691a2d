from spotify_tags_etl_spark.plans.registry import QueryDef, all_queries, all_oracles, register

__all__ = ["QueryDef", "all_queries", "all_oracles", "register"]
