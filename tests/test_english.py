"""Differential tests for the Spark-native English renderer.

Strategy mirrors the clean_json_loads suite: a pure-Python twin of the
grammar (functions/english.py:py_english) is the pinned reference, and the
Spark column expression must agree on every (type × agent-count) cell.
Reference behavior: indra_db_service/util.py:144-165 and
call_handlers.py:234-272.
"""

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

from indra_db_spark.functions.english import (
    english_expr,
    meta_english_expr,
    py_english,
    py_meta_english,
    render_english,
)
from indra_db_spark.schemas import TYPE_NUMS, TYPE_REGISTRY

NAMES = ["MEK", "ERK", "TP53", "AKT1", "BRAF"]


def _cases():
    cases = []
    for t in TYPE_REGISTRY + [None]:
        for n in range(5):
            cases.append((t, {str(i): NAMES[i] for i in range(n)}))
    # ag_num keys need not be contiguous or start at 0, and string sort
    # breaks past "9" — pin the int-ordering behavior
    cases.append(("Phosphorylation", {"1": "ERK"}))
    cases.append(("Complex", {"2": "C", "10": "K", "0": "A"}))
    cases.append((None, {"10": "K", "2": "C", "0": "A"}))
    return cases


def test_spark_matches_python_twin(spark):
    cases = _cases()
    schema = StructType(
        [
            StructField("i", ShortType()),
            StructField("type_name", StringType()),
            StructField("agents", MapType(StringType(), StringType())),
        ]
    )
    df = spark.createDataFrame(
        [Row(i=i, type_name=t, agents=ags) for i, (t, ags) in enumerate(cases)],
        schema,
    )
    got = {
        r.i: r.english
        for r in df.select(
            "i", english_expr(F.col("type_name"), F.col("agents")).alias("english")
        ).collect()
    }
    for i, (t, ags) in enumerate(cases):
        assert got[i] == py_english(t, ags), (t, ags, got[i])


def test_meta_english_mirrors_reference_shape(spark):
    # _make_english_from_meta (util.py:144-165): exact bolded shapes
    assert py_meta_english({}) == ""
    assert py_meta_english({"0": "A"}) == "<b>A</b> is modified"
    assert py_meta_english({"0": "A", "1": "B"}) == "<b>A</b> affects <b>B</b>"
    assert (
        py_meta_english({"0": "A", "1": "B", "2": "C"})
        == "<b>A</b> affects <b>B</b>, and <b>C</b>"
    )
    assert (
        py_meta_english({"0": "A", "1": "B", "2": "C", "3": "D"})
        == "<b>A</b> affects <b>B</b>, <b>C</b>, and <b>D</b>"
    )
    df = spark.createDataFrame(
        [Row(agents={"0": "A", "1": "B", "2": "C", "3": "D"})],
        StructType([StructField("agents", MapType(StringType(), StringType()))]),
    )
    row = df.select(meta_english_expr(F.col("agents")).alias("e")).first()
    assert row.e == "<b>A</b> affects <b>B</b>, <b>C</b>, and <b>D</b>"


def test_render_english_resolves_type_num(spark):
    df = spark.createDataFrame(
        [
            Row(
                type_num=TYPE_NUMS["Activation"],
                agent_json={"0": "MEK", "1": "ERK"},
            ),
            Row(type_num=TYPE_NUMS["Complex"], agent_json={"0": "A", "1": "B"}),
            Row(type_num=None, agent_json={"0": "X"}),
        ],
        StructType(
            [
                StructField("type_num", ShortType()),
                StructField("agent_json", MapType(StringType(), StringType())),
            ]
        ),
    )
    out = {r.type_num: r.english for r in render_english(df).collect()}
    assert out[TYPE_NUMS["Activation"]] == "MEK activates ERK."
    assert out[TYPE_NUMS["Complex"]] == "A binds B."
    assert out[None] == "<b>X</b> is modified"


@pytest.mark.parametrize(
    "t,ags,expect",
    [
        ("Phosphorylation", {"0": "MEK", "1": "ERK"}, "MEK phosphorylates ERK."),
        ("Phosphorylation", {"1": "ERK"}, "ERK is phosphorylated."),
        ("Inhibition", {"0": "A", "1": "B"}, "A inhibits B."),
        ("Complex", {"0": "A", "1": "B", "2": "C"}, "A binds B, and C."),
        (
            "Complex",
            {"0": "A", "1": "B", "2": "C", "3": "D"},
            "A binds B, C, and D.",
        ),
        ("Autophosphorylation", {"0": "EGFR"}, "EGFR phosphorylates itself."),
        ("Translocation", {"0": "NFKB"}, "NFKB translocates."),
        ("ActiveForm", {"0": "RAS"}, "RAS is active."),
        ("Gef", {"0": "SOS1", "1": "RAS"}, "SOS1 is a GEF for RAS."),
        ("Gap", {"0": "NF1", "1": "RAS"}, "NF1 is a GAP for RAS."),
        ("IncreaseAmount", {"0": "A", "1": "B"}, "A increases the amount of B."),
        ("DecreaseAmount", {"1": "B"}, "B is degraded."),
    ],
)
def test_grammar_cells(t, ags, expect):
    assert py_english(t, ags) == expect
