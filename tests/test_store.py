"""Triple store seam (SURVEY §4.4): pred-bucketed layout, idempotent
append (MERGE-INTO stand-in), predicate-pruned scans, KB save/load."""

import os

from pyspark.sql import functions as F

from kr_spark.kb import KB
from kr_spark.sources.store import ParquetTripleStore
from tests.conftest import TEST_TRIPLES_6_1, load_fixture


def test_store_roundtrip_and_idempotent_append(kb, spark, tmp_path):
    load_fixture(kb, TEST_TRIPLES_6_1)
    path = str(tmp_path / "store")
    kb.save(path)

    back = KB.load(spark, path)
    assert back.size() == kb.size()

    # re-saving the same KB must not grow the store (set semantics)
    kb.save(path)
    assert KB.load(spark, path).size() == back.size()

    # appending one new + one duplicate triple adds exactly one row
    kb.add_statements([("ex/new", "foaf/name", "Newcomer")])
    kb.add_statements([("ex/a", "foaf/name", "Alice")])  # dup of fixture
    kb.save(path)
    assert KB.load(spark, path).size() == back.size() + 1


def test_store_layout_is_pred_bucketed(kb, spark, tmp_path):
    load_fixture(kb, TEST_TRIPLES_6_1)
    path = str(tmp_path / "store")
    kb.save(path, pred_buckets=4)
    data = os.path.join(path, "data")
    dirs = {d for d in os.listdir(data) if d.startswith("p_bucket=")}
    assert dirs  # physical partition dirs exist
    assert all(d.split("=")[1].isdigit() for d in dirs)
    assert os.path.exists(os.path.join(path, "manifest.json"))


def test_scan_predicate_prunes_to_one_bucket(kb, spark, tmp_path):
    load_fixture(kb, TEST_TRIPLES_6_1)
    path = str(tmp_path / "store")
    kb.save(path, pred_buckets=4)
    store = ParquetTripleStore(spark, path, pred_buckets=4)
    name_p = kb.term("foaf/name").v
    scanned = store.scan_predicate(name_p)
    assert scanned.count() == 2
    assert {r.o for r in scanned.collect()} == {"Alice", "Bob"}
    # the scan reads a single bucket directory, not the whole table
    files = scanned.inputFiles()
    assert files and all("p_bucket=" in f for f in files)
    buckets_read = {f.split("p_bucket=")[1].split("/")[0] for f in files}
    assert len(buckets_read) == 1


def test_loaded_kb_queries_identically(kb, spark, tmp_path):
    load_fixture(kb, TEST_TRIPLES_6_1)
    path = str(tmp_path / "store")
    kb.save(path)
    back = KB.load(spark, path)
    rows = back.query(
        [("?/p", "rdf/type", "foaf/Person"), ("?/p", "foaf/name", "?/n")]
    )
    assert {b["n"].v for b in rows} == {"Alice", "Bob"}
