"""Provenance ledger + xDD ingestion (reference:
schemas/principal_schema.py:1008-1104 bookkeeping tables; cli/xdd.py
XddManager; cli/preassembly.py:9-63 update selection)."""

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from indra_db_spark.assembly.provenance import PROVENANCE_SCHEMAS, ProvenanceLedger
from indra_db_spark.schemas import RAW_STATEMENTS_SCHEMA, TEXT_REF_SCHEMA
from indra_db_spark.sources.xdd import (
    XddBatch,
    generate_reading_id,
    process_xdd_groups,
    record_xdd_run,
)


def dt(day, hour=0):
    return datetime(2020, 1, day, hour)


# ---------------------------------------------------------------------------
# ledger


@pytest.fixture()
def ledger(spark, tmp_path):
    return ProvenanceLedger(spark, str(tmp_path / "lake"))


def test_empty_tables_have_schema(ledger):
    for name, schema in PROVENANCE_SCHEMAS.items():
        df = ledger.load(name)
        assert df.schema == schema
        assert df.count() == 0


def test_content_update_bookkeeping(ledger):
    # content.py:548-557: max(datetime) per source; None before first upload
    assert ledger.latest_content_update("pubmed") is None
    ledger.record(
        "updates",
        [
            {"init_upload": True, "source": "pubmed", "datetime": dt(1)},
            {"init_upload": False, "source": "pubmed", "datetime": dt(5)},
            {"init_upload": True, "source": "pmc_oa", "datetime": dt(3)},
        ],
    )
    assert ledger.latest_content_update("pubmed") == dt(5)
    assert ledger.latest_content_update("pmc_oa") == dt(3)


def test_source_file_unique_probe(ledger):
    # content.py:820-827 archive-already-processed check
    ledger.record(
        "source_file",
        [{"source": "pubmed", "name": "baseline-0001.xml.gz", "load_date": dt(1)}],
    )
    assert ledger.has_source_file("pubmed", "baseline-0001.xml.gz")
    assert not ledger.has_source_file("pubmed", "baseline-0002.xml.gz")


def test_reading_high_water_marks(ledger):
    # reading.py:89-92: reader -> max(latest_datetime)
    ledger.record(
        "reading_updates",
        [
            {
                "complete_read": True,
                "reader": "REACH",
                "reader_version": "1.6.1",
                "run_datetime": dt(2),
                "earliest_datetime": dt(1),
                "latest_datetime": dt(2),
            },
            {
                "complete_read": False,
                "reader": "REACH",
                "reader_version": "1.6.3-e48717",
                "run_datetime": dt(9),
                "earliest_datetime": dt(2),
                "latest_datetime": dt(8),
            },
            {
                "complete_read": True,
                "reader": "SPARSER",
                "reader_version": "April2020-linux",
                "run_datetime": dt(4),
                "earliest_datetime": dt(1),
                "latest_datetime": dt(4),
            },
        ],
    )
    assert ledger.latest_reading_datetimes() == {"REACH": dt(8), "SPARSER": dt(4)}


def test_preassembly_update_selection(ledger):
    # preassembly.py:13-21: per-type last update includes the last FULL run
    with pytest.raises(ValueError):
        ledger.last_preassembly_updates(["Activation"])
    ledger.record(
        "preassembly_updates",
        [
            {"corpus_init": True, "run_datetime": dt(1), "stmt_type": None},
            {"corpus_init": False, "run_datetime": dt(4), "stmt_type": "Activation"},
            {"corpus_init": False, "run_datetime": dt(2), "stmt_type": "Inhibition"},
            {"corpus_init": False, "run_datetime": dt(3), "stmt_type": None},
        ],
    )
    last = ledger.last_preassembly_updates(["Activation", "Inhibition", "Complex"])
    # Activation's own run (day 4) beats the full run (day 3); Inhibition's
    # own run (day 2) is superseded by the newer full run; Complex has only
    # the full run.
    assert last == {"Activation": dt(4), "Inhibition": dt(3), "Complex": dt(3)}

    # preassembly.py:55-63: only types with newer raw statements update
    need = ledger.types_needing_update(
        {"Activation": dt(5), "Inhibition": dt(2, 1), "Complex": dt(2)}
    )
    assert need == ["Activation"]  # Inhibition/Complex raw predate their update


# ---------------------------------------------------------------------------
# xDD


def _bib(xddid, doi=None, publisher="Wiley"):
    b = {"_xddid": xddid, "publisher": publisher}
    if doi:
        b["identifier"] = [{"type": "doi", "id": doi}]
    return b


def _stmt(xddid, reader, name_a, name_b, pmid="999"):
    return {
        "id": f"uuid-{xddid}-{reader}-{name_a}",
        "type": "Activation",
        "agents": [name_a, name_b],
        "evidence": [
            {
                "source_api": reader.lower(),
                "pmid": pmid,  # must be dropped (cli/xdd.py:56)
                "text_refs": {"CONTENT_ID": xddid, "READER": reader},
            }
        ],
    }


@pytest.fixture()
def xdd_root(tmp_path):
    root = tmp_path / "xdd"
    day1 = root / "2020-01-01"
    day1.mkdir(parents=True)
    # run1, no id_src: two bibs (one bioRxiv preprint), two statements
    (day1 / "run1_bib.json").write_text(
        json.dumps(
            [
                _bib("x1", "10.1/aaa"),
                _bib("x2", "10.1/bbb", publisher="bioRxiv"),
                _bib("x3"),  # no identifier -> statements skipped
            ]
        )
    )
    (day1 / "run1_stmts.json").write_text(
        json.dumps(
            [
                _stmt("x1", "REACH", "A", "B"),
                _stmt("x2", "SPARSER", "C", "D"),
                _stmt("x3", "REACH", "E", "F"),  # bib has no DOI
            ]
        )
    )
    # run2 with id_src: same DOI as x1 -> same trid, distinct source
    (day1 / "run2_abc_bib.json").write_text(json.dumps([_bib("y1", "10.1/aaa")]))
    (day1 / "run2_abc_stmts.json").write_text(
        json.dumps([_stmt("y1", "REACH", "A", "G")])
    )
    # day 2: run3 missing its stmts file -> day partial; run4 complete
    day2 = root / "2020-01-02"
    day2.mkdir()
    (day2 / "run3_bib.json").write_text(json.dumps([_bib("z0", "10.1/zzz")]))
    (day2 / "run4_bib.json").write_text(json.dumps([_bib("z1", "10.1/ccc")]))
    (day2 / "run4_stmts.json").write_text(
        json.dumps([_stmt("z1", "SPARSER", "H", "I")])
    )
    return str(root)


@pytest.fixture()
def text_refs(spark):
    # one pre-existing ref matches 10.1/AAA (DOIs match upper-cased,
    # cli/xdd.py:47)
    rows = [
        {"trid": 7, "doi": "10.1/AAA"},
        {"trid": 9, "doi": "10.9/other"},
    ]
    return spark.createDataFrame(
        [
            {**{f.name: None for f in TEXT_REF_SCHEMA.fields}, **r}
            for r in rows
        ],
        TEXT_REF_SCHEMA,
    )


def test_xdd_ingestion(spark, xdd_root, text_refs):
    batch = process_xdd_groups(spark, xdd_root, text_refs, max_existing={"tcid": 0})

    assert batch.days_complete == ["2020-01-01"]
    assert batch.days_partial == ["2020-01-02"]
    assert batch.skipped_no_doi == 1  # x3's statement

    # DOI resolution: 10.1/AAA reuses trid 7; BBB/CCC minted above max (9)
    refs = {r["doi"]: r["trid"] for r in batch.text_refs_new.collect()}
    assert set(refs) == {"10.1/BBB", "10.1/CCC"}
    assert sorted(refs.values()) == [10, 11]

    tc = batch.text_content_new.collect()
    by_src = {(r["text_ref_id"], r["source"]): r for r in tc}
    trid_bbb = refs["10.1/BBB"]
    assert (7, "xdd") in by_src  # run1 statements on the existing ref
    assert (7, "xdd-abc") in by_src  # run2's id_src becomes xdd-abc
    assert by_src[(trid_bbb, "xdd")]["preprint"] is True  # bioRxiv
    for r in tc:
        assert (r["format"], r["text_type"]) == ("xdd", "fulltext")

    # reading ids follow the AABBC hash (read_db.py:37-62)
    readings = batch.reading_new.collect()
    for r in readings:
        assert r["rid"] == generate_reading_id(
            r["text_content_id"], r["reader"], r["reader_version"]
        )

    # statements: evidence text_refs enriched, pmid dropped
    stmts = batch.raw_statements_new.collect()
    assert len(stmts) == 4
    assert [(f.name, f.dataType) for f in batch.raw_statements_new.schema.fields] == [
        (f.name, f.dataType) for f in RAW_STATEMENTS_SCHEMA.fields
    ]  # nullability flags differ on literal columns; names/types must match
    rid_set = {r["rid"] for r in readings}
    for s in stmts:
        sj = json.loads(bytes(s["json"]))
        ev = sj["evidence"][0]
        assert "pmid" not in ev
        trefs = ev["text_refs"]
        assert trefs["DOI"] and trefs["TRID"] and trefs["XDD_RUN_ID"]
        assert trefs["XDD_GROUP_ID"] in ("2020-01-01", "2020-01-02")
        assert s["reading_id"] in rid_set
        assert s["db_info_id"] is None
    # sid dense and above the (empty-corpus) base
    assert sorted(s["sid"] for s in stmts) == [1, 2, 3, 4]


def test_xdd_ledger_skip_and_idempotent_retry(spark, xdd_root, text_refs, tmp_path):
    ledger = ProvenanceLedger(spark, str(tmp_path / "lake"))
    batch = process_xdd_groups(spark, xdd_root, text_refs, ledger=ledger, max_existing={"tcid": 0})
    record_xdd_run(ledger, batch, dt(10))
    assert ledger.processed_xdd_days() == {"2020-01-01"}

    # Second run: day1 skipped (recorded), day2 retried; with the first
    # run's statements as the existing corpus the uuid anti-join leaves
    # nothing new (cli/xdd.py:125-135 skipped-uuid semantics).
    existing = batch.raw_statements_new
    again = process_xdd_groups(
        spark, xdd_root, text_refs, existing_raw=existing, ledger=ledger,
        max_existing={"tcid": 0},
    )
    assert again.days_partial == ["2020-01-02"]
    assert "2020-01-01" not in again.days_complete + again.days_partial
    assert again.raw_statements_new.count() == 0


def test_xdd_parse_error_demotes_day(spark, xdd_root, text_refs, tmp_path):
    import pathlib

    bad = pathlib.Path(xdd_root) / "2020-01-01" / "run1_stmts.json"
    bad.write_text("{not json")
    batch = process_xdd_groups(spark, xdd_root, text_refs, max_existing={"tcid": 0})
    assert batch.days_complete == []
    assert set(batch.days_partial) == {"2020-01-01", "2020-01-02"}
    # the intact run2 pair still ingests (reference loads what it got)
    uuids = {r["uuid"] for r in batch.raw_statements_new.collect()}
    assert uuids == {"uuid-y1-REACH-A", "uuid-z1-SPARSER-H"}


def test_xdd_malformed_entries_and_unknown_reader(spark, tmp_path, text_refs):
    """Regression pack: a bib entry with an identifier missing 'id' demotes
    the day instead of crashing; an unknown READER drops its statement
    instead of minting a NULL reading id; a duplicated bib entry does not
    duplicate statements; a TRIPS statement on a known day is dropped."""
    root = tmp_path / "xdd2"
    good = root / "2021-06-01"
    good.mkdir(parents=True)
    # duplicated bib entry for g1 + one statement with an unknown reader
    good_bibs = [_bib("g1", "10.5/good"), _bib("g1", "10.5/good")]
    (good / "run1_bib.json").write_text(json.dumps(good_bibs))
    (good / "run1_stmts.json").write_text(
        json.dumps(
            [
                _stmt("g1", "REACH", "A", "B"),
                _stmt("g1", "TRIPS", "A", "C"),  # not in XDD_READER_VERSIONS
            ]
        )
    )
    bad = root / "2021-06-02"
    bad.mkdir()
    (bad / "run2_bib.json").write_text(
        json.dumps([{"_xddid": "b1", "identifier": [{"type": "doi"}]}])
    )
    (bad / "run2_stmts.json").write_text(
        json.dumps([_stmt("b1", "REACH", "X", "Y")])
    )

    batch = process_xdd_groups(spark, str(root), text_refs, max_existing={"tcid": 0})
    # malformed bib file -> parse_error -> day demoted, not crashed
    assert batch.days_partial == ["2021-06-02"]
    assert batch.days_complete == ["2021-06-01"]
    raws = batch.raw_statements_new.collect()
    # exactly ONE raw statement: REACH kept once (dup bib collapsed),
    # TRIPS dropped for lack of a reading-id base
    assert len(raws) == 1
    assert raws[0]["uuid"] == "uuid-g1-REACH-A"
    readings = batch.reading_new.collect()
    assert {r["reader"] for r in readings} == {"REACH"}


def test_trrust_manager_skips_malformed_rows(tmp_path):
    from indra_db_spark.sources.knowledgebase import TrrustManager

    p = tmp_path / "trrust.tsv"
    p.write_text(
        "TF1\tT1\tActivation\t111;222\n"
        "\n"  # blank line -> csv.reader yields []
        "TF2\tT2\tRepression\t333\textra-col\n"
        "short\trow\n"
    )
    stmts = list(TrrustManager(str(p)).get_statements())
    assert [s["evidence"]["pmid"] for s in stmts] == ["111", "222", "333"]


def test_curation_store_concurrent_submits(spark, tmp_path):
    import threading

    from indra_db_spark.plans.principal import CurationStore

    store = CurationStore(spark, str(tmp_path / "cur"))
    errs = []

    def work(k):
        try:
            for i in range(5):
                store.submit(
                    hash_val=k * 100 + i, tag="grounding",
                    curator="c@x.org", ip="127.0.0.1",
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    rows = store.df().collect()
    assert len(rows) == 20  # no lost submissions
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(1, 21))  # no duplicate ids


def test_xdd_special_char_filenames_survive_path_join(spark, tmp_path, text_refs):
    """input_file_name() returns percent-encoded URIs; a space or a literal
    '+' in a file name must decode back to the listing path, not silently
    fail the path join and vanish the file's rows."""
    root = tmp_path / "xdd3"
    day = root / "2022-03-01"
    day.mkdir(parents=True)
    (day / "run 5_bib.json").write_text(json.dumps([_bib("s1", "10.7/sp")]))
    (day / "run 5_stmts.json").write_text(
        json.dumps([_stmt("s1", "REACH", "A", "B")])
    )
    (day / "a+b_bib.json").write_text(json.dumps([_bib("p1", "10.7/pl")]))
    (day / "a+b_stmts.json").write_text(
        json.dumps([_stmt("p1", "SPARSER", "C", "D")])
    )
    batch = process_xdd_groups(
        spark, str(root), text_refs, max_existing={"tcid": 0}
    )
    assert batch.days_complete == ["2022-03-01"]
    uuids = {r["uuid"] for r in batch.raw_statements_new.collect()}
    assert uuids == {"uuid-s1-REACH-A", "uuid-p1-SPARSER-C"}


def test_xdd_tcid_guard_requires_base_over_nonempty_corpus(
    spark, xdd_root, text_refs
):
    """Defaulting the tcid high-water mark to 0 over a corpus that already
    has text_refs would mint colliding tcids (and reading ids); the caller
    must pass text_content or pin max_existing['tcid'] explicitly."""
    with pytest.raises(ValueError, match="tcid high-water mark"):
        process_xdd_groups(spark, xdd_root, text_refs)
