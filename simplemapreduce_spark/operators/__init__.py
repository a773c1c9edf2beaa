from simplemapreduce_spark.operators.map_reduce import map_reduce

__all__ = ["map_reduce"]
