"""Spark-native English rendering of interaction rows.

Reference surface: ``indra_db_service/util.py:144-165``
(``_make_english_from_meta``) and ``call_handlers.py:234-272`` (the
``with_english`` response option).  The reference renders by instantiating
INDRA statement objects and calling the external ``indra`` English/HTML
assemblers row-by-row on the web driver; here the entire render is a single
JVM-side column expression (CASE over a verb table + ordered agent-map
formatting) — shuffle-free, vectorized, and SQL-portable, so the catalog
entry (``english_render``) carries a full DuckDB oracle.

The grammar is a deterministic approximation of the public INDRA
EnglishAssembler surface for the types in ``schemas.TYPE_REGISTRY``:

- two or more agents:      "A <verb> B."           (Phosphorylation, ...)
- missing/unknown subject: "B <passive>."          ("B is phosphorylated.")
- Complex:                 "A binds B[, C, and D]."
- Autophosphorylation:     "A phosphorylates itself."
- Translocation:           "A translocates."
- ActiveForm:              "A is active."  (interaction rows carry only
  (type, agents) — no is_active flag — so the negative form is not
  renderable at this grain; the reference's typed path has the same
  limitation, since call_handlers.py builds the statement from
  type + agents via stmt_from_interaction)
- Gef / Gap:               "A is a GEF for B." / "A is a GAP for B."

and the type-less meta fallback mirrors ``_make_english_from_meta``
verbatim: "<b>A</b> affects <b>B</b>, <b>C</b>, and <b>D</b>" with the
single-agent "<b>A</b> is modified" degenerate case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from indra_db_spark.schemas import TYPE_REGISTRY

__all__ = [
    "VERBS",
    "english_expr",
    "meta_english_expr",
    "render_english",
    "py_english",
    "py_meta_english",
]

#: type → (active 3rd-person verb phrase, passive phrase).  Types handled by
#: a special pattern (Complex, ActiveForm, Autophosphorylation,
#: Translocation, Gef, Gap) carry verbs only for the generic fallback when
#: their agent count is off-pattern.
VERBS: dict[str, tuple[str, str]] = {
    "Acetylation": ("acetylates", "is acetylated"),
    "Activation": ("activates", "is activated"),
    "Autophosphorylation": ("phosphorylates", "is phosphorylated"),
    "Complex": ("binds", "is in a complex"),
    "Conversion": ("converts", "is converted"),
    "DecreaseAmount": ("decreases the amount of", "is degraded"),
    "Dephosphorylation": ("dephosphorylates", "is dephosphorylated"),
    "Deubiquitination": ("deubiquitinates", "is deubiquitinated"),
    "Gap": ("is a GAP for", "is regulated"),
    "Gef": ("is a GEF for", "is regulated"),
    "IncreaseAmount": ("increases the amount of", "is produced"),
    "Inhibition": ("inhibits", "is inhibited"),
    "Methylation": ("methylates", "is methylated"),
    "Phosphorylation": ("phosphorylates", "is phosphorylated"),
    "Translocation": ("translocates", "is translocated"),
    "Ubiquitination": ("ubiquitinates", "is ubiquitinated"),
    "ActiveForm": ("activates", "is active"),
}


def _ordered_agents(agents: Column) -> Column:
    """Agent names ordered by integer ag_num — agent_json is
    Map(str(ag_num) → name) and string sort breaks past ag_num 9."""
    keys = F.array_sort(
        F.transform(F.map_keys(agents), lambda k: k.cast("int"))
    )
    return F.transform(
        keys, lambda k: F.element_at(agents, k.cast("string"))
    )


def _list_phrase(ags: Column, bold: bool = False) -> Column:
    """Oxford-comma list of every agent after the first:
    [B] → "B"; [B,C] → "B, and C"; [B,C,D] → "B, C, and D".

    Matches ``_make_english_from_meta``'s middle/last assembly so the meta
    fallback and the Complex pattern share one implementation.
    """
    deco = (lambda c: F.concat(F.lit("<b>"), c, F.lit("</b>"))) if bold else (lambda c: c)
    rest = F.slice(ags, 2, F.greatest(F.size(ags) - 1, F.lit(0)))
    n = F.size(rest)
    middles = F.array_join(
        F.transform(F.slice(rest, 1, F.greatest(n - 1, F.lit(0))), deco),
        ", ",
    )
    last = deco(F.element_at(rest, -1))
    return F.when(n <= 0, F.lit("")).otherwise(
        F.when(n == 1, deco(F.element_at(rest, 1))).otherwise(
            F.concat(middles, F.lit(", and "), last)
        )
    )


def english_expr(type_name: Column, agents: Column) -> Column:
    """English sentence for (statement-type name, agent_json map).

    A null ``type_name`` falls through to the bolded meta rendering
    (``meta_english_expr``), exactly as ``_make_english_from_meta`` does
    when the interaction carries no type.
    """
    ags = _ordered_agents(agents)
    n = F.size(ags)
    a0, a1 = F.element_at(ags, 1), F.element_at(ags, 2)

    active = F.lit(None).cast("string")
    passive = F.lit(None).cast("string")
    for t, (act, pas) in VERBS.items():
        active = F.when(type_name == t, F.lit(act)).otherwise(active)
        passive = F.when(type_name == t, F.lit(pas)).otherwise(passive)

    generic = F.when(
        n >= 2, F.concat(a0, F.lit(" "), active, F.lit(" "), a1, F.lit("."))
    ).otherwise(F.concat(a0, F.lit(" "), passive, F.lit(".")))

    typed = (
        F.when(n <= 0, F.lit(""))
        .when(
            (type_name == "Complex") & (n >= 2),
            F.concat(a0, F.lit(" binds "), _list_phrase(ags), F.lit(".")),
        )
        .when(
            type_name == "Autophosphorylation",
            F.concat(a0, F.lit(" phosphorylates itself.")),
        )
        .when(type_name == "Translocation", F.concat(a0, F.lit(" translocates.")))
        .when(
            type_name == "ActiveForm",
            F.concat(a0, F.lit(" is active.")),
        )
        .when(
            (type_name == "Gef") & (n >= 2),
            F.concat(a0, F.lit(" is a GEF for "), a1, F.lit(".")),
        )
        .when(
            (type_name == "Gap") & (n >= 2),
            F.concat(a0, F.lit(" is a GAP for "), a1, F.lit(".")),
        )
        .otherwise(generic)
    )
    return F.when(type_name.isNull(), meta_english_expr(agents)).otherwise(typed)


def meta_english_expr(agents: Column) -> Column:
    """Type-less fallback, mirroring ``_make_english_from_meta``
    (util.py:144-165) including its ``<b>`` bolding:

    - 0 agents → ""
    - 1 agent  → "<b>A</b> is modified"
    - n agents → "<b>A</b> affects <b>B</b>[, <b>C</b>]*, and <b>D</b>"
    """
    ags = _ordered_agents(agents)
    n = F.size(ags)
    b0 = F.concat(F.lit("<b>"), F.element_at(ags, 1), F.lit("</b>"))
    b1 = F.concat(F.lit("<b>"), F.element_at(ags, 2), F.lit("</b>"))
    return (
        F.when(n <= 0, F.lit(""))
        .when(n == 1, F.concat(b0, F.lit(" is modified")))
        .when(n == 2, F.concat(b0, F.lit(" affects "), b1))
        .otherwise(F.concat(b0, F.lit(" affects "), _list_phrase(ags, bold=True)))
    )


def render_english(
    df: DataFrame,
    type_num_col: str = "type_num",
    agents_col: str = "agent_json",
    out_col: str = "english",
) -> DataFrame:
    """Attach an ``english`` column to an interactions/relations-grain
    frame, resolving ``type_num`` through the registry the same way the
    readonly schema's type dictionary does (readonly_schema.py:69-95)."""
    # NB: element_at(arr, NULL) does NOT return null in Spark 4 (it wraps
    # to the last element) — guard the null type explicitly so the meta
    # fallback fires for type-less rows
    type_name = F.when(
        F.col(type_num_col).isNotNull(),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPE_REGISTRY]),
            F.col(type_num_col).cast("int") + 1,
        ),
    )
    return df.withColumn(out_col, english_expr(type_name, F.col(agents_col)))


# ------------------------------------------------- pure-Python twin
# Used by the differential tests (tests/test_english.py) the same way
# clean_json_loads is pinned: identical grammar, no Spark.

def py_english(type_name: str | None, agents: dict[str, str]) -> str:
    ags = [agents[k] for k in sorted(agents, key=int)]
    if type_name is None:
        return py_meta_english(agents)
    if not ags:
        return ""
    a0 = ags[0]
    if type_name == "Complex" and len(ags) >= 2:
        return f"{a0} binds {_py_list(ags[1:])}."
    if type_name == "Autophosphorylation":
        return f"{a0} phosphorylates itself."
    if type_name == "Translocation":
        return f"{a0} translocates."
    if type_name == "ActiveForm":
        return f"{a0} is active."
    if type_name == "Gef" and len(ags) >= 2:
        return f"{a0} is a GEF for {ags[1]}."
    if type_name == "Gap" and len(ags) >= 2:
        return f"{a0} is a GAP for {ags[1]}."
    act, pas = VERBS[type_name]
    if len(ags) >= 2:
        return f"{a0} {act} {ags[1]}."
    return f"{a0} {pas}."


def py_meta_english(agents: dict[str, str]) -> str:
    ags = [agents[k] for k in sorted(agents, key=int)]
    if not ags:
        return ""
    if len(ags) == 1:
        return f"<b>{ags[0]}</b> is modified"
    return f"<b>{ags[0]}</b> affects " + _py_list(ags[1:], bold=True)


def _py_list(rest: list[str], bold: bool = False) -> str:
    deco = (lambda s: f"<b>{s}</b>") if bold else (lambda s: s)
    if len(rest) == 1:
        return deco(rest[0])
    return ", ".join(deco(a) for a in rest[:-1]) + ", and " + deco(rest[-1])
