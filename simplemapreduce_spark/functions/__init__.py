from simplemapreduce_spark.functions.text import tokens, distinct_tokens
from simplemapreduce_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["tokens", "distinct_tokens", "cosine_similarity", "dot", "l2_norm"]
