from indra_db_spark.operators.topk import global_topk, grouped_topn, argmax_per_group  # noqa: F401
from indra_db_spark.operators.setops import (  # noqa: F401
    keyed_intersect,
    keyed_union,
    keyed_except,
    semi_join,
    anti_join,
)
