"""The batch materialization DAG — the rebuild of the reference's assembly
pipeline (indra_db/readonly_dumping/export_assembly.py +
readonly_dumping.py; SURVEY.md §2.8) as pure DataFrame jobs:

    distill -> (preprocess) -> dedup/link -> refinement -> belief
            -> readonly table builders (RUN_ORDER DAG)

Each stage is a function DataFrame -> DataFrame so the DAG composes and each
edge can be checkpointed to Parquet.  Heavy Python (grounding, real INDRA
hashing) stays behind narrow, swappable UDF seams.
"""

from indra_db_spark.assembly.belief import belief_scores
from indra_db_spark.assembly.distill import distill_readings
from indra_db_spark.assembly.readonly import build_readonly
from indra_db_spark.assembly.refinement import refinement_pairs

__all__ = [
    "belief_scores",
    "distill_readings",
    "build_readonly",
    "refinement_pairs",
]
