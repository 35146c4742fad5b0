"""Service shim: the REST layer's parameter parsing, query compilation and
permission shaping, engine-independent (reference: indra_db_service/api.py +
call_handlers.py; SURVEY.md §2.9/§3.1-3.2).  No web framework here — these
are the pure functions a Flask/FastAPI front end would call."""

from indra_db_spark.service.params import (
    MAX_LIST_LEN,
    MAX_STMTS,
    apply_medscan_censor,
    compile_query,
    query_from_simple_json,
    query_from_web_params,
)

__all__ = [
    "MAX_LIST_LEN",
    "MAX_STMTS",
    "apply_medscan_censor",
    "compile_query",
    "query_from_simple_json",
    "query_from_web_params",
]
