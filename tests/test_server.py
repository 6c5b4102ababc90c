"""HTTP integration tests: the wire contract of the reference's axum router
(POST /search, GET /scan, /media/*, SPA fallback — main.rs:50-58) against a
tiny corpus on disk, through a real aiohttp server.
"""

import asyncio
import json
import os
import urllib.parse

import numpy as np
import pytest
from PIL import Image

from aiohttp.test_utils import TestClient, TestServer

from image_search_tpu.server.app import build_app
from image_search_tpu.server.args import ServerArgs, parse_args
from image_search_tpu.server.engine import SearchEngine


def make_corpus(root, n=8):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        arr = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"photo_{i}.jpg"))


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    media = str(root / "pics")
    make_corpus(media)
    os.makedirs(media + "/sub", exist_ok=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(media + "/sub/dark.png")
    args = ServerArgs(
        model_weights=str(root / "missing.safetensors"),  # random tiny model
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(root / "idx"),
        chunk_size=4,
        k=50,
    )
    return SearchEngine(args)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def client(engine):
    loop = asyncio.new_event_loop()
    c = loop.run_until_complete(_make_client(engine))
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()


async def _make_client(engine):
    app = build_app(engine)
    client = TestClient(TestServer(app))
    await client.start_server()
    return client


def test_scan_then_search_flow(client):
    c, loop = client

    async def flow():
        # scan embeds the corpus and blocks until done (search.rs:108-118)
        r = await c.get("/scan")
        assert r.status == 200
        stats = await r.json()
        assert stats["embedded"] == 9
        assert stats["decode_failures"] == 0

        # search returns the reference wire shape
        r = await c.post("/search", json={"q": "a dark square"})
        assert r.status == 200
        body = await r.json()
        assert set(body.keys()) == {"images"}
        assert len(body["images"]) == 9  # k clamped to corpus
        first = body["images"][0]
        assert set(first.keys()) >= {"id", "image_path"}
        assert first["image_path"].startswith("media/")
        assert first["id"] == urllib.parse.quote(first["image_path"], safe="")
        return body

    body = loop.run_until_complete(flow())

    async def media_and_feedback():
        # every result URL must be servable (GET /media/*)
        path = body["images"][0]["image_path"]
        r = await c.get("/" + path)
        assert r.status == 200
        assert (await r.read())[:4] in (b"\xff\xd8\xff\xe0", b"\x89PNG")

        # relevance-feedback round: mark two, re-search (the Rocchio loop)
        marked = [img["image_path"] for img in body["images"][:2]]
        r = await c.post("/search", json={"q": "a dark square", "referenced_images": marked})
        assert r.status == 200
        refined = await r.json()
        assert len(refined["images"]) == 9

        # scores must differ from the plain text search (the query moved)
        s0 = [i["score"] for i in body["images"]]
        s1 = [i["score"] for i in refined["images"]]
        assert s0 != s1

    loop.run_until_complete(media_and_feedback())


def test_rescan_is_idempotent(client):
    c, loop = client

    async def f():
        r = await c.get("/scan")
        stats = await r.json()
        assert stats["embedded"] == 0
        assert stats["skipped_existing"] == 9

    loop.run_until_complete(f())


def test_search_param_validation(client):
    c, loop = client

    async def f():
        r = await c.post("/search", data=b"not json", headers={"content-type": "application/json"})
        assert r.status == 400
        r = await c.post("/search", json={})  # missing q
        assert r.status == 400
        r = await c.post("/search", json={"q": 42})
        assert r.status == 400
        # referenced_images defaults to [] (serde default, data/src/lib.rs:7)
        r = await c.post("/search", json={"q": "ok"})
        assert r.status == 200

    loop.run_until_complete(f())


def test_unknown_referenced_images_ignored(client):
    c, loop = client

    async def f():
        r = await c.post(
            "/search",
            json={"q": "x", "referenced_images": ["media/nope.jpg", "not-media/../etc"]},
        )
        assert r.status == 200
        body = await r.json()
        assert len(body["images"]) == 9

    loop.run_until_complete(f())


def test_spa_fallback_and_root(client):
    c, loop = client

    async def f():
        for path in ("/", "/some/client/route"):
            r = await c.get(path)
            assert r.status == 200
            text = await r.text()
            assert "<html" in text.lower()
        r = await c.get("/static/app.js")
        assert r.status == 200

    loop.run_until_complete(f())


def test_path_traversal_blocked(engine):
    assert engine.to_abs_path("media/../../etc/passwd") is None
    assert engine.to_abs_path("/etc/passwd") is None
    assert engine.to_abs_path("media/ok.jpg") is not None


def test_cli_flag_names_match_reference():
    """The reference's short/long flags must parse (server_arguments.rs:8-27)."""
    args = parse_args(
        ["-w", "/w.safetensors", "-m", "/tmp/pics", "-c", "123", "-a", "0.0.0.0", "-p", "8080"]
    )
    assert args.model_weights == "/w.safetensors"
    assert args.media_dir == "/tmp/pics"
    assert args.chunk_size == 123
    assert args.addr == "0.0.0.0"
    assert args.port == 8080
    # defaults mirror the reference
    d = parse_args([])
    assert d.media_dir == "~/Pictures"
    assert d.chunk_size == 500
    assert d.port == 3000
    assert d.addr == "127.0.0.1"


def test_metrics_endpoint(client):
    c, loop = client

    async def f():
        r = await c.get("/metrics")
        assert r.status == 200
        m = await r.json()
        assert m["gauges"]["corpus_size"] == 9.0
        assert m["counters"]["searches"] >= 1
        assert "index_search" in m["latencies"]
        assert m["latencies"]["index_search"]["p50_ms"] >= 0

    loop.run_until_complete(f())


def test_health_endpoint(client):
    c, loop = client

    async def f():
        r = await c.get("/health")
        assert r.status == 200
        h = await r.json()
        assert h["status"] == "ok" and h["corpus"] == 9

    loop.run_until_complete(f())


def test_literal_percent_filename_feedback(tmp_path):
    """Advisor regression: a filename containing a LITERAL %XX sequence must
    survive the feedback round-trip verbatim (the reference never unquotes);
    the urldecoded form is only a fallback for clients echoing the id."""
    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(3)
    for name in ["photo%20a.jpg", "photo a.jpg", "plain.jpg"]:
        arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(media, name))
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
        chunk_size=4,
    )
    eng = SearchEngine(args)
    eng.scan()

    # raw literal-% path resolves to itself, NOT to 'photo a.jpg'
    got = eng._resolve_selection("media/photo%20a.jpg")
    assert got == os.path.join(eng.media_dir, "photo%20a.jpg")
    # an urlencoded id for the space-named file falls back to the decoded form
    # only when the raw string is unknown to the index
    enc = "media/photo%20b.jpg"  # decodes to 'photo b.jpg' (not indexed) -> raw
    assert eng._resolve_selection(enc) == os.path.join(eng.media_dir, "photo%20b.jpg")
    # feedback search with the literal-% file actually uses the selection
    res_plain = eng.search("anything")
    res_fb = eng.search("anything", referenced_images=["media/photo%20a.jpg"])
    assert res_plain != res_fb  # Rocchio moved the ranking


def test_text_cache_is_lru(tmp_path):
    """Hot repeated queries survive eviction pressure (LRU, not FIFO)."""
    media = str(tmp_path / "pics")
    make_corpus(media, n=2)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng._cached_text_embed("hot")
    # fill the cache to capacity with cold entries
    for i in range(511):
        eng._text_cache[f"cold{i}"] = eng._text_cache["hot"]
    eng._cached_text_embed("hot")  # refresh recency
    eng._cached_text_embed("new")  # triggers one eviction
    assert "hot" in eng._text_cache
    assert "cold0" not in eng._text_cache  # the LRU entry went instead


def test_prune_on_scan_removes_deleted_files(tmp_path):
    """--prune-on-scan: deleting a photo from disk removes it from results on
    the next scan, durably. The reference keeps deleted photos forever."""
    media = str(tmp_path / "pics")
    make_corpus(media, n=5)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
        prune_on_scan=True,
    )
    eng = SearchEngine(args)
    stats = eng.scan()
    assert stats.embedded == 5 and stats.pruned == 0
    res = eng.search("anything")
    assert len(res) == 5

    victim = res[0]["image_path"]
    os.remove(os.path.join(eng.media_dir, victim[len("media/"):]))
    stats2 = eng.scan()
    assert stats2.pruned == 1 and stats2.embedded == 0
    res2 = eng.search("anything")
    assert len(res2) == 5 - 1
    assert victim not in [r["image_path"] for r in res2]

    # durability: a fresh engine over the same index dir stays pruned
    eng2 = SearchEngine(args)
    res3 = eng2.search("anything")
    assert victim not in [r["image_path"] for r in res3]
    assert len(res3) == 4


def test_prune_refuses_when_media_tree_unavailable(tmp_path):
    """Round-2 review finding: a down NAS mount (media dir missing OR
    yielding zero images) must NOT durably tombstone the whole corpus."""
    import shutil

    media = str(tmp_path / "pics")
    make_corpus(media, n=3)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
        prune_on_scan=True,
    )
    eng = SearchEngine(args)
    eng.scan()
    assert len(eng.search("x")) == 3

    # "unmounted": the directory vanishes entirely
    shutil.rmtree(media)
    assert eng.prune_missing() == 0
    assert len(eng.search("x")) == 3

    # "mounted but empty" (0 images while the index holds rows): refuse too
    os.makedirs(media)
    assert eng.prune_missing() == 0
    assert len(eng.search("x")) == 3

    # a REAL partial deletion still prunes
    make_corpus(media, n=3)
    os.remove(os.path.join(media, "photo_0.jpg"))
    assert eng.prune_missing() == 1
    assert len(eng.search("x")) == 2


def test_remove_endpoint(client):
    """POST /remove tombstones by media path; results shrink accordingly.

    Runs LAST in this module: it mutates the shared module-scope corpus.
    """
    c, loop = client

    async def flow():
        r = await c.get("/scan")
        assert r.status == 200
        r = await c.post("/search", json={"q": "x", "referenced_images": []})
        images = (await r.json())["images"]
        n0 = len(images)
        victim = images[0]["image_path"]

        r = await c.post("/remove", json={"images": [victim]})
        assert r.status == 200 and (await r.json())["removed"] == 1
        r = await c.post("/search", json={"q": "x", "referenced_images": []})
        after = (await r.json())["images"]
        assert len(after) == n0 - 1
        assert victim not in [im["image_path"] for im in after]

        # bad body -> 400; unknown path -> removed 0
        assert (await c.post("/remove", json={"nope": 1})).status == 400
        r = await c.post("/remove", json={"images": ["media/ghost.jpg"]})
        assert (await r.json())["removed"] == 0

    loop.run_until_complete(flow())


def test_duplicates_endpoint(tmp_path):
    """GET /duplicates groups identical photos; thresholds validated."""
    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    Image.fromarray(arr).save(os.path.join(media, "orig.png"))
    Image.fromarray(arr).save(os.path.join(media, "copy.png"))  # exact dup
    Image.fromarray(
        rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    ).save(os.path.join(media, "other.png"))
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()

    groups = eng.find_duplicate_groups(threshold=0.999)
    assert groups == [["media/copy.png", "media/orig.png"]]

    loop = asyncio.new_event_loop()

    async def drive():
        c = TestClient(TestServer(build_app(eng)))
        await c.start_server()
        try:
            r = await c.get("/duplicates", params={"threshold": "0.999"})
            assert r.status == 200
            body = await r.json()
            assert body["groups"] == [["media/copy.png", "media/orig.png"]]
            # small corpus, no sketch: the legacy exact route, labeled
            assert body["mode"] == "legacy_exact"
            assert (await c.get("/duplicates", params={"threshold": "2"})).status == 400
            assert (await c.get("/duplicates", params={"threshold": "x"})).status == 400
        finally:
            await c.close()

    loop.run_until_complete(drive())
    loop.close()


def test_remove_survives_rescan_and_restore_undoes(tmp_path):
    """Review finding: POST /remove must NOT be silently undone by the next
    scan while the file is still on disk; restore=true re-enables it."""
    media = str(tmp_path / "pics")
    make_corpus(media, n=4)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    victim = eng.search("x")[0]["image_path"]
    assert eng.remove_images([victim]) == 1
    assert len(eng.search("x")) == 3

    # the file is STILL on disk; a rescan must not resurrect it
    stats = eng.scan()
    assert stats.embedded == 0
    assert victim not in [r["image_path"] for r in eng.search("x")]

    # a fresh engine over the same store keeps the exclusion too
    eng2 = SearchEngine(args)
    eng2.scan()
    assert victim not in [r["image_path"] for r in eng2.search("x")]

    # restore clears the exclusion; the next scan re-embeds it
    assert eng2.restore_images([victim]) == 1
    stats = eng2.scan()
    assert stats.embedded == 1
    assert victim in [r["image_path"] for r in eng2.search("x")]


def test_exclusions_survive_compaction(tmp_path):
    media = str(tmp_path / "pics")
    make_corpus(media, n=3)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    victim = eng.search("x")[0]["image_path"]
    eng.remove_images([victim])
    del eng

    from image_search_tpu.index import EmbeddingStore

    from image_search_tpu.config import get_config

    dim = get_config("clip-tiny-test").projection_dim
    store = EmbeddingStore(str(tmp_path / "idx"), dim)
    store.compact()
    assert len(store.excluded_paths()) == 1

    eng2 = SearchEngine(args)
    eng2.scan()
    assert victim not in [r["image_path"] for r in eng2.search("x")]


def test_restore_accepts_urlencoded_id(tmp_path):
    """Advisor (round 2): a client that removed an image via its urlencoded
    ``id`` field must be able to restore it the same way — restore_images
    now resolves the encoded form like /remove does."""
    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(3)
    fname = "my photo #1.png"  # urlencodes to my%20photo%20%231.png
    Image.fromarray(
        rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    ).save(os.path.join(media, fname))
    make_corpus(media, n=2)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    results = eng.search("x")
    target = next(r for r in results if fname in r["image_path"])
    assert target["id"] != target["image_path"]  # really encoded

    # remove via the encoded id, then restore via the encoded id
    assert eng.remove_images([target["id"]]) == 1
    assert all(fname not in r["image_path"] for r in eng.search("x"))
    assert eng.restore_images([target["id"]]) == 1
    stats = eng.scan()
    assert stats.embedded == 1
    assert any(fname in r["image_path"] for r in eng.search("x"))


def test_remove_accounting_and_remove_after_prune(tmp_path):
    """Advisor (round 2): (a) request duplicates / unknown paths must not
    pollute the exclusion set; (b) a path already prune-tombstoned (file
    later reappears) can still be explicitly excluded via /remove."""
    media = str(tmp_path / "pics")
    make_corpus(media, n=3)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    victim = eng.search("x")[0]["image_path"]

    # duplicates in one request: one row removed, one exclusion recorded
    assert eng.remove_images([victim, victim, "media/never_indexed.jpg"]) == 1
    abs_victim = eng.to_abs_path(victim)
    assert abs_victim in eng._excluded
    assert eng.to_abs_path("media/never_indexed.jpg") not in eng._excluded

    # prune flow: file vanishes, prune tombstones it (no exclusion) ...
    other = next(p for p in (eng.search("x")[i]["image_path"] for i in range(2)))
    abs_other = eng.to_abs_path(other)
    img_bytes = open(abs_other, "rb").read()
    os.remove(abs_other)
    assert eng.prune_missing() == 1
    # ... then the file REAPPEARS; /remove on the now-rowless path must
    # record an exclusion so the next scan cannot resurrect it
    open(abs_other, "wb").write(img_bytes)
    assert eng.remove_images([other]) == 0  # no live row to remove
    assert abs_other in eng._excluded
    stats = eng.scan()
    assert stats.embedded == 0
    assert all(r["image_path"] != other for r in eng.search("x"))
    # the exclusion is durable across restart
    eng2 = SearchEngine(args)
    assert eng2.scan().embedded == 0
    assert all(r["image_path"] != other for r in eng2.search("x"))


def test_search_image_endpoint(client, engine):
    """POST /search_image: raw image bytes in, wire-format results out; the
    query photo itself must rank first (identical preprocess+embed);
    garbage bytes and empty bodies answer 400."""
    c, loop = client

    async def drive():
        r = await c.get("/scan")
        assert r.status == 200
        fname = "photo_3.jpg"
        with open(os.path.join(engine.media_dir, fname), "rb") as f:
            data = f.read()
        r = await c.post("/search_image", data=data)
        assert r.status == 200
        body = await r.json()
        assert body["images"], body
        assert body["images"][0]["image_path"] == f"media/{fname}"
        # k override caps the result count
        r = await c.post("/search_image?k=3", data=data)
        assert len((await r.json())["images"]) == 3
        # undecodable + empty bodies
        r = await c.post("/search_image", data=b"not an image at all")
        assert r.status == 400
        r = await c.post("/search_image", data=b"")
        assert r.status == 400

        # feedback round on an IMAGE query: marked results ride as ?ref=
        # params and run the Rocchio-refined search (uniform with /search)
        from image_search_tpu.utils.metrics import global_metrics

        before = global_metrics.snapshot()["counters"].get(
            "searches_with_feedback", 0
        )
        mark = body["images"][1]["image_path"]
        r = await c.post(
            "/search_image", params=[("k", "3"), ("ref", mark)], data=data
        )
        assert r.status == 200
        fb = (await r.json())["images"]
        assert len(fb) == 3
        after = global_metrics.snapshot()["counters"].get(
            "searches_with_feedback", 0
        )
        assert after == before + 1
        # the refined query equals the engine's direct feedback answer
        direct = engine.search_by_image(data, 3, [mark])
        assert [d["image_path"] for d in direct] == [d["image_path"] for d in fb]
        # unknown refs resolve to nothing -> plain image search
        r = await c.post(
            "/search_image", params=[("k", "3"), ("ref", "media/nope.jpg")], data=data
        )
        plain = (await r.json())["images"]
        direct_plain = engine.search_by_image(data, 3)
        assert [d["image_path"] for d in direct_plain] == [
            d["image_path"] for d in plain
        ]

    loop.run_until_complete(drive())


def test_remove_while_file_absent_still_excludes(tmp_path):
    """Round-3 review: /remove on a path whose file is MISSING from disk
    right now must still record the exclusion — the old os.path.exists
    filter silently dropped it, so a later reappearance resurrected the
    photo on rescan despite the user's explicit deletion."""
    media = str(tmp_path / "pics")
    make_corpus(media, n=2)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    victim = eng.search("x")[0]["image_path"]
    abs_victim = eng.to_abs_path(victim)
    img_bytes = open(abs_victim, "rb").read()
    os.remove(abs_victim)
    assert eng.prune_missing() == 1  # row gone, no exclusion yet
    # user explicitly removes it WHILE the file is absent
    assert eng.remove_images([victim]) == 0
    assert abs_victim in eng._excluded
    # the file reappears; rescans (this process AND a restart) must not
    # resurrect it
    open(abs_victim, "wb").write(img_bytes)
    assert eng.scan().embedded == 0
    eng2 = SearchEngine(args)
    assert eng2.scan().embedded == 0
    assert all(r["image_path"] != victim for r in eng2.search("x"))


def test_duplicates_async_job_flow(tmp_path):
    """Big-corpus contract (round-2 review): /duplicates?async=1 answers
    202 immediately with a job id; polling ?job=<id> yields running (with
    progress) then done+groups; unknown jobs 404; a second async request
    joins the in-flight job instead of double-scanning."""
    import time

    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    Image.fromarray(arr).save(os.path.join(media, "orig.png"))
    Image.fromarray(arr).save(os.path.join(media, "copy.png"))
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()

    # slow the scan so the running state is observable
    real = eng.find_duplicate_groups

    def slow(threshold=0.95, approx=None):
        time.sleep(0.3)
        return real(threshold, approx)

    eng.find_duplicate_groups = slow

    loop = asyncio.new_event_loop()

    async def drive():
        c = TestClient(TestServer(build_app(eng)))
        await c.start_server()
        try:
            r = await c.get("/duplicates", params={"threshold": "0.999", "async": "1"})
            assert r.status == 202
            body = await r.json()
            job = body["job"]
            assert body["state"] == "running" and body["poll"].endswith(job)

            # joining: a second async request AT THE SAME THRESHOLD returns
            # the SAME job ...
            r2 = await c.get(
                "/duplicates", params={"threshold": "0.999", "async": "1"}
            )
            assert r2.status == 202
            assert (await r2.json())["job"] == job
            # ... but a DIFFERENT threshold must not silently receive a job
            # computed at the wrong one (round-3 review): 409 names the
            # running job and its threshold
            r2b = await c.get("/duplicates", params={"async": "1"})
            assert r2b.status == 409
            conflict = await r2b.json()
            assert conflict["job"] == job and conflict["threshold"] == 0.999

            assert (await c.get("/duplicates", params={"job": "nope"})).status == 404

            for _ in range(100):
                r3 = await c.get("/duplicates", params={"job": job})
                if r3.status == 200:
                    break
                assert r3.status == 202
                st = await r3.json()
                assert st["state"] == "running"
                assert 0.0 <= st["progress"] <= 1.0
                await asyncio.sleep(0.05)
            final = await r3.json()
            assert final["state"] == "done"
            assert final["groups"] == [["media/copy.png", "media/orig.png"]]
            assert final["mode"] == "legacy_exact"

            # job finished: a NEW async request starts a fresh job, and the
            # progress gauge is RESET at creation (a fresh job must not
            # poll as "running, progress 1.0" from the previous scan)
            r4 = await c.get("/duplicates", params={"threshold": "0.999", "async": "1"})
            assert r4.status == 202
            job4 = (await r4.json())["job"]
            assert job4 != job
            r5 = await c.get("/duplicates", params={"job": job4})
            if r5.status == 202:  # almost surely: the scan sleeps 0.3 s
                assert (await r5.json())["progress"] < 1.0
        finally:
            await c.close()

    loop.run_until_complete(drive())
    loop.close()


def test_duplicates_progress_gauge_published(tmp_path):
    """find_duplicate_groups publishes duplicate_scan_progress to metrics,
    ending at 1.0."""
    from image_search_tpu.utils.metrics import global_metrics

    media = str(tmp_path / "pics")
    make_corpus(media, n=3)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    eng.find_duplicate_groups(threshold=0.999)
    assert global_metrics.snapshot()["gauges"]["duplicate_scan_progress"] == 1.0


def test_deploy_smoke_script(tmp_path):
    """tools/smoke_deploy.py drives the Docker ENTRYPOINT contract (module
    exec, port bind, scan/search/media/SPA/remove over real HTTP) without
    Docker — round-2 verdict Missing #3."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [
            _sys.executable, "tools/smoke_deploy.py", "--cpu",
            "--root", str(tmp_path / "smoke"), "--port", "3561",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS: deployment surface verified" in out.stdout


def test_offline_scan_dir_tool(tmp_path):
    """tools/scan_dir.py: batch-ingest a directory offline, then a fresh
    server engine on the same --index-dir serves the rows without
    rescanning (cron-job ingest contract; the reference's only batch
    entry point is the in-server clip.rs:42)."""
    import json as _json
    import subprocess
    import sys as _sys

    media = str(tmp_path / "pics")
    make_corpus(media, n=5)
    idx_dir = str(tmp_path / "idx")
    out = subprocess.run(
        [
            _sys.executable, "tools/scan_dir.py",
            "-m", media, "--index-dir", idx_dir,
            "--model", "clip-tiny-test",
            "-w", str(tmp_path / "missing.safetensors"),
        ],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env={**os.environ, "ISX_FORCE_CPU": "1"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["embedded"] == 5 and stats["found"] == 5

    eng = SearchEngine(ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=idx_dir,
    ))
    assert len(eng.index) == 5
    res = eng.search("anything", [])
    assert len(res) == 5
    # idempotent: a follow-up in-server scan dedups every row by path
    stats2 = eng.scan()
    assert stats2.embedded == 0 and stats2.skipped_existing == 5


def test_offline_search_tool(tmp_path):
    """tools/search.py: query an index from the command line (scripting
    counterpart of POST /search), including Rocchio --feedback marks."""
    import json as _json
    import subprocess
    import sys as _sys

    media = str(tmp_path / "pics")
    make_corpus(media, n=4)
    idx_dir = str(tmp_path / "idx")
    env = {**os.environ, "ISX_FORCE_CPU": "1"}
    cwd = os.path.join(os.path.dirname(__file__), "..")
    common = [
        "-m", media, "--index-dir", idx_dir,
        "--model", "clip-tiny-test", "-w", str(tmp_path / "missing.safetensors"),
    ]
    subprocess.run(
        [_sys.executable, "tools/scan_dir.py", *common],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env, check=True,
    )
    out = subprocess.run(
        [_sys.executable, "tools/search.py", "anything", *common,
         "--k", "2", "--feedback", "media/photo_1.jpg"],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    hits = [_json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(hits) == 2 and hits[0]["rank"] == 1
    # feedback pulls the marked image to the top (its own vector dominates)
    assert hits[0]["image_path"] == "media/photo_1.jpg"
    assert set(hits[0]) == {"rank", "id", "image_path", "score"}

    # empty index -> helpful error, nonzero exit
    out2 = subprocess.run(
        [_sys.executable, "tools/search.py", "x", "-m", media,
         "--index-dir", str(tmp_path / "empty"),
         "--model", "clip-tiny-test", "-w", str(tmp_path / "missing.safetensors")],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env,
    )
    assert out2.returncode == 1 and "index is empty" in out2.stderr

    # query-by-image (--image): the query photo itself ranks first
    out3 = subprocess.run(
        [_sys.executable, "tools/search.py",
         os.path.join(media, "photo_2.jpg"), "--image", *common, "--k", "2"],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env,
    )
    assert out3.returncode == 0, out3.stdout + out3.stderr
    hits3 = [_json.loads(l) for l in out3.stdout.strip().splitlines()]
    assert hits3[0]["image_path"] == "media/photo_2.jpg"

    # --image + --feedback: the marked photo's vector dominates the
    # Rocchio-refined image query, same as the text case above
    out4 = subprocess.run(
        [_sys.executable, "tools/search.py",
         os.path.join(media, "photo_2.jpg"), "--image", *common, "--k", "2",
         "--feedback", "media/photo_1.jpg"],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env,
    )
    assert out4.returncode == 0, out4.stdout + out4.stderr
    hits4 = [_json.loads(l) for l in out4.stdout.strip().splitlines()]
    assert {h["image_path"] for h in hits4} == {
        "media/photo_1.jpg", "media/photo_2.jpg"
    }


def test_wire_cache_is_bounded(tmp_path):
    """The per-row wire-template memo must not grow toward corpus size
    under long-lived diverse traffic (round-3 review): at the cap it is
    cleared and rebuilt, never exceeded."""
    media = str(tmp_path / "pics")
    make_corpus(media, n=5)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    eng.scan()
    eng.WIRE_CACHE_MAX = 3
    res = eng.search("anything", [], k=5)
    assert len(res) == 5
    assert len(eng._wire_cache) <= 3  # cleared at the cap mid-format
    # formatting stays correct after the clear: same answers as a cold memo
    again = eng.search("anything", [], k=5)
    assert [r["image_path"] for r in again] == [r["image_path"] for r in res]
    assert all(r["id"] for r in again)


def test_render_images_json_byte_identical(tmp_path):
    """The pre-rendered /search body (render_images_json) must be
    BYTE-identical to json.dumps on adversarial ids/paths — quotes,
    backslashes, non-ASCII, literal %22 — and obey the fragment-cache
    bound (round-4: the per-request escape was 1.78 ms of the host
    budget at k=1000)."""
    import json

    media = str(tmp_path / "pics")
    make_corpus(media, n=3)
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.safetensors"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    images = [
        {"id": "media%2Fa.jpg", "image_path": "media/a.jpg", "score": 0.5},
        {"id": "media%2Fwei%22rd.jpg", "image_path": 'media/wei"rd.jpg',
         "score": -0.0072754137217998505},
        {"id": "media%2F%C3%BC.jpg", "image_path": "media/ü\\x.jpg",
         "score": 1.0},
        {"id": "media%2F%2522.jpg", "image_path": "media/%22.jpg",
         "score": 3.0517578125e-05},
    ]
    got = eng.render_images_json(images)
    want = json.dumps({"images": images}).encode()
    assert got == want
    # warm render (fragments memoized) is still identical
    assert eng.render_images_json(images) == want
    # cache bound: never exceeded, correctness survives the clear
    eng.WIRE_CACHE_MAX = 2
    eng._frag_cache.clear()
    assert eng.render_images_json(images) == want
    assert len(eng._frag_cache) <= 2
    assert eng.render_images_json([]) == b'{"images": []}'
    # the live endpoint serves the pre-rendered body with the JSON type
    eng.scan()
    res = eng.search("anything", [], k=3)
    body = eng.render_images_json(res)
    assert json.loads(body) == {"images": res}
