"""Port of the reference's ``dev.ipynb`` smoke scenario (its only
correctness artifact) as a falsifiable pytest: ingest the Star-Wars-lore
corpus under tenant QWERTY, search, filter-search, scroll each shape,
exercise every delete variant, update, and the catalog listing.
Shapes and semantics asserted per FIXTURES.md §B; exact scores differ
from the notebook's (deterministic embedder instead of the live
service)."""

from __future__ import annotations

import shutil

import pytest

from vector_db_handler_spark.api import VectorDBApi
from vector_db_handler_spark.pipeline import DocumentPipeline
from vector_db_handler_spark.store import PointsStore

USER = "QWERTY"
DIM = 64  # small dim keeps the test fast; reference default is 1024

CORPUS = [
    ("The Death Star's thermal exhaust port was its primary weakness, leading to its destruction.",
     {"DocId": 4, "ChunkId": 12, "Title": "Death Star Blueprints"}),
    ("The Galactic Civil War raged between the Rebel Alliance and the Empire.",
     {"DocId": 2, "ChunkId": 3, "Title": "Galactic Civil War Chronicles"}),
    ("Rogue One stole the Death Star plans from the Imperial archive on Scarif.",
     {"DocId": 7, "ChunkId": 8, "Title": "The Rogue One Operation"}),
    ("Tatooine's twin suns make moisture farming the only viable trade.",
     {"DocId": 5, "ChunkId": 9, "Title": "Tatooine Survival Report"}),
    ("The Senate was dissolved, and regional governors took direct control.",
     {"DocId": 6, "ChunkId": 2, "Title": "The Fall of the Senate"}),
    ("Kyber crystals power both lightsabers and the Death Star's superlaser.",
     {"DocId": 9, "ChunkId": 4, "Title": "Kyber Crystal Lore"}),
]
SINGLE = ("Rebel heroes came from every corner of the galaxy.",
          {"DocId": 15, "ChunkId": 6, "Title": "Rebel Heroes"})


@pytest.fixture()
def api(spark, tmp_path):
    root = str(tmp_path / "points")
    store = PointsStore(spark, root, vector_size=DIM)
    api = VectorDBApi(DocumentPipeline(store, dim=DIM))
    # ingest: 6-chunk batch + 1 single upsert (dev.ipynb cells 095fc328, 5d15f422)
    api.upsert_list_data(USER, [c for c, _ in CORPUS], [m for _, m in CORPUS])
    api.upsert_data(USER, SINGLE[0], SINGLE[1])
    yield api
    shutil.rmtree(root, ignore_errors=True)


def test_search_shape_and_order(api):
    # cell 82295874: ≤5 results, score-descending, reference dict shape
    res = api.search_query(USER, "What was the primary weakness of the Death Star?")["Results"]
    assert 0 < len(res) <= 5
    assert set(res[0]) == {"DocId", "ChunkId", "Title", "Similarity Score"}
    scores = [r["Similarity Score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    # threshold=0 default: no negative similarities survive (ref :339)
    assert all(s >= 0 for s in scores)


def test_search_on_doc_filters(api):
    # cell e41bf49a: doc_ids=[2,4] → only those docs, score order
    res = api.search_query_on_doc(USER, [2, 4], "Death Star weakness")["Results"]
    assert {r["DocId"] for r in res} <= {2, 4} and len(res) == 2


def test_search_on_doc_empty_ids_matches_all(api):
    # empty doc_ids ⇒ match-all (ref :526-529): identical to an
    # unfiltered search (threshold=0 still drops negative scores, :339)
    res = api.search_query_on_doc(USER, [], "Death Star weakness", limit=10)["Results"]
    unfiltered = api.search_query(USER, "Death Star weakness", limit=10)["Results"]
    assert res == unfiltered and len(res) >= 2


def test_scroll_shapes(api):
    # cell b754840d: collection scroll has NO VectorId
    rows = api.scroll_user_collection(USER)["Results"]
    assert len(rows) == 7
    assert set(rows[0]) == {"DocId", "ChunkId", "Title"}
    # cells 2f73211b/84de15f1/5d65ef34: doc/chunk/docs scrolls include VectorId
    doc = api.scroll_user_doc(USER, 4)["Results"]
    assert len(doc) == 1 and set(doc[0]) == {"DocId", "ChunkId", "Title", "VectorId"}
    chunk = api.scroll_user_chunk(USER, 4, 12)["Results"]
    assert len(chunk) == 1 and chunk[0]["Title"] == "Death Star Blueprints"
    # doc_ids=[9,15,3,2] → only existing docs 2, 9, 15
    docs = api.scroll_user_docs(USER, [9, 15, 3, 2])["Results"]
    assert sorted({r["DocId"] for r in docs}) == [2, 9, 15]


def test_reupsert_duplicates_not_replaces(api):
    # insert-only upsert: same (DocId, ChunkId) re-ingested ⇒ 8 rows (ref :105)
    api.upsert_data(USER, CORPUS[0][0], CORPUS[0][1])
    assert len(api.scroll_user_collection(USER, limit=50)["Results"]) == 8
    assert len(api.scroll_user_doc(USER, 4, limit=50)["Results"]) == 2


def test_update_touches_only_first_match(api):
    before = api.scroll_user_doc(USER, 4)["Results"]
    api.update_data(USER, "totally new text about exhaust ports", 4, 12)
    after = api.scroll_user_doc(USER, 4)["Results"]
    # same id, same payload — only the vector changed (ref :320-330)
    assert after == before
    # updated vector now matches the new text's embedding exactly
    res = api.search_query(USER, "totally new text about exhaust ports")["Results"]
    assert res[0]["DocId"] == 4 and res[0]["Similarity Score"] > 0.99


def test_update_no_match_is_silent_noop(api):
    api.update_data(USER, "anything", 999, 999)  # must not raise (ref :320)
    assert len(api.scroll_user_collection(USER)["Results"]) == 7


def test_delete_variants(api):
    api.delete_doc(USER, 4)
    assert api.scroll_user_doc(USER, 4)["Results"] == []
    api.delete_doc_by_title(USER, "Rebel Heroes")
    assert {r["DocId"] for r in api.scroll_user_collection(USER)["Results"]} == {2, 5, 6, 7, 9}
    api.delete_chunk(USER, 2, 3)
    assert api.scroll_user_doc(USER, 2)["Results"] == []
    ids = [r["VectorId"] for r in api.scroll_user_docs(USER, [5, 6])["Results"]]
    api.delete_chunk_by_id(USER, ids[0])
    api.delete_chunk_list_by_id(USER, ids[1:])
    assert {r["DocId"] for r in api.scroll_user_collection(USER)["Results"]} == {7, 9}


def test_truncate_keeps_collection_drop_removes_it(api):
    api.delete_user_collection_data(USER)
    assert api.scroll_user_collection(USER)["Results"] == []
    assert api.list_users_collection()["Collections"] == ["user_QWERTY"]  # cell 13bb78c7
    api.delete_user_collection(USER)
    assert api.list_users_collection()["Collections"] == []


def test_tenant_isolation(api):
    api.upsert_data("other-tenant", "foreign text", {"DocId": 1, "ChunkId": 1, "Title": "x"})
    assert len(api.scroll_user_collection(USER)["Results"]) == 7
    assert api.search_query("other-tenant", "foreign text")["Results"][0]["DocId"] == 1
    # catalog leaks all tenants, mangled (ref :559-568, :68)
    assert api.list_users_collection()["Collections"] == ["user_QWERTY", "user_other_tenant"]


def test_upsert_list_length_mismatch_raises(api):
    with pytest.raises(ValueError):
        api.upsert_list_data(USER, ["a", "b"], [{}])


def test_health(api):
    assert api.health() == {"message": "Service is up and running"}
