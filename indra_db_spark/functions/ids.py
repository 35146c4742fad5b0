"""Identifier normalization helpers.

Python-side (driver) normalizers for external ids fed into query
predicates, mirroring the reference's semantics (indra_db/schemas/
mixins.py:266-405 pmid/pmcid/doi parsers; indra_db/util/insert.py:159-175
regularize_agent_id; indra_db/util/dump_sif.py:632-646 fix_id)."""

from __future__ import annotations

import re
from typing import Optional


def process_pmid(pmid: str) -> Optional[int]:
    """PMIDs are integers; reject anything else (mixins.py:266-274)."""
    try:
        return int(str(pmid).strip())
    except (TypeError, ValueError):
        return None


def process_pmcid(pmcid: str) -> tuple[Optional[int], Optional[int]]:
    """'PMC1234.2' → (1234, 2): strip the PMC prefix, split the version
    (mixins.py:316-336)."""
    s = str(pmcid).strip()
    if s.upper().startswith("PMC"):
        s = s[3:]
    version = None
    if "." in s:
        s, _, v = s.partition(".")
        try:
            version = int(v)
        except ValueError:
            version = None
    try:
        return int(s), version
    except ValueError:
        return None, version


_DOI_RE = re.compile(r"^\s*(?:(?:https?://)?(?:dx\.)?doi\.org/)?10\.(\d+)/(.+?)\s*$", re.I)


def process_doi(doi: str) -> tuple[Optional[int], Optional[str]]:
    """'10.1234/abc.5' → (1234, 'abc.5'): namespace int + group id,
    tolerating URL prefixes (mixins.py:379-405)."""
    m = _DOI_RE.match(str(doi))
    if not m:
        return None, None
    return int(m.group(1)), m.group(2).lower()


def regularize_agent_id(agent_id: str, namespace: Optional[str]) -> str:
    """Strip a redundant 'NS:' prefix from a grounding id so 'CHEBI:1234'
    and '1234' match the same rows — except CHEBI ids, which canonically
    KEEP their prefix (insert.py:159-175)."""
    s = str(agent_id).strip()
    if not namespace or namespace in ("NAME", "TEXT", "AUTO"):
        return s
    ns = namespace.upper()
    if ns == "CHEBI":
        return s if s.upper().startswith("CHEBI:") else f"CHEBI:{s}"
    prefix = f"{ns}:"
    while s.upper().startswith(prefix):
        s = s[len(prefix):]
    return s


_GO_RE = re.compile(r"^GO:?0*(\d+)$", re.I)


def fix_id(db_name: str, db_id: str) -> tuple[str, str]:
    """Common grounding-id repairs (dump_sif.py:632-646): GO zero-padding,
    EFO prefix strip, UP isoform split."""
    if db_name == "GO":
        m = _GO_RE.match(db_id)
        if m:
            return db_name, f"GO:{int(m.group(1)):07d}"
    if db_name == "EFO" and db_id.startswith("EFO:"):
        return db_name, db_id[4:]
    if db_name == "UP" and "-" in db_id:
        return db_name, db_id.split("-")[0]
    return db_name, db_id


def synth_ag_id(col):
    """Deterministic negative 31-bit surrogate agent id from a string key —
    Spark column expression matching the reference's zlib.crc32 trick
    (readonly_dumping.py:1192-1202: synthetic ids are negative so they can
    never collide with real serial ids)."""
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    return (-(F.crc32(c.cast("string")).bitwiseAND(F.lit(0x7FFFFFFF)))).cast("int")


_CAMEL_RE = re.compile(r"_([a-z])")


def make_statement_camel(name: str) -> str:
    """'increase_amount' -> 'IncreaseAmount'; already-camel input passes
    through unchanged (idempotent — web params arrive in either form; the
    reference's web-param type normalization, query.py:2330-2338)."""
    s = name.strip()
    if "_" in s or s.islower():
        s = _CAMEL_RE.sub(lambda m: m.group(1).upper(), s.lower())
    return s[:1].upper() + s[1:]


def camel_to_snake(camel: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", camel).lower()
