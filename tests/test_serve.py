"""HTTP serving surface (cli/serve.py): streams share one compiled step.

Beyond-parity capability — drives the REAL server (ThreadingHTTPServer +
handler + Tracker) over loopback HTTP with the tiny real model.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from uvltrack_tpu.cli.serve import make_server
from uvltrack_tpu.track.tracker import Tracker
from test_model import tiny_model, tiny_inputs
from test_tracker import tiny_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


@pytest.fixture(scope="module")
def server_url():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    proto = Tracker(tiny_cfg(), model, variables, tokenizer=None)
    server = make_server(proto, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, server
    server.shutdown()
    server.server_close()


def _post(url, route, payload):
    req = urllib.request.Request(
        url + route, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    # generous: the first lockstep /track compiles the batched step on the
    # (often contended) 1-core sandbox CPU
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def _npy_b64(img):
    buf = io.BytesIO()
    np.save(buf, img)
    return base64.b64encode(buf.getvalue()).decode()


def _jpeg_b64(img):
    import cv2

    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    return base64.b64encode(enc.tobytes()).decode()


def test_two_streams_share_one_jit_tracker(server_url):
    url, server = server_url
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    for stream, box in (("a", [30, 20, 20, 24]), ("b", [10, 10, 30, 30])):
        out = _post(url, "/initialize",
                    {"stream": stream, "image": _npy_b64(img), "bbox": box,
                     "format": "npy"})
        assert out["bbox"] == [float(v) for v in box]
    outs = {}
    for stream in ("a", "b"):
        for _ in range(2):
            frame = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
            outs[stream] = _post(url, "/track",
                                 {"stream": stream, "image": _npy_b64(frame),
                                  "format": "npy"})
    for o in outs.values():
        assert len(o["bbox"]) == 4 and np.isfinite(o["bbox"]).all()
        assert np.isfinite(o["score"])
    # independent per-stream state...
    assert outs["a"]["bbox"] != outs["b"]["bbox"]
    # ...but exactly one JitTracker behind all streams (no per-stream retrace)
    jts = {id(trk.jt) for trk in server.streams.values()}
    assert len(jts) == 1

    health = json.loads(urllib.request.urlopen(url + "/health",
                                               timeout=60).read())
    assert health["streams"] == 2
    assert health["mode"] == "per-stream"

    stats = json.loads(urllib.request.urlopen(url + "/stats",
                                              timeout=60).read())["streams"]
    for s in ("a", "b"):
        assert stats[s]["frames"] == 2
        assert stats[s]["fps"] > 0
        assert np.isfinite(stats[s]["last_score"])

    assert _post(url, "/close", {"stream": "a"})["closed"] is True
    assert json.loads(urllib.request.urlopen(url + "/health",
                                             timeout=60).read())["streams"] == 1


def test_jpeg_roundtrip_tracks(server_url):
    url, _ = server_url
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    _post(url, "/initialize",
          {"stream": "j", "image": _jpeg_b64(img), "bbox": [30, 20, 20, 24]})
    out = _post(url, "/track", {"stream": "j", "image": _jpeg_b64(img)})
    assert len(out["bbox"]) == 4 and np.isfinite(out["score"])


def test_error_surfaces(server_url):
    url, _ = server_url
    img = np.zeros((40, 60, 3), np.uint8)
    # track before initialize -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/track", {"stream": "ghost", "image": _npy_b64(img),
                              "format": "npy"})
    assert e.value.code == 404
    # missing bbox in BBOX mode -> 400 (KeyError init_bbox inside tracker)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/initialize", {"stream": "x", "image": _npy_b64(img),
                                   "format": "npy"})
    assert e.value.code == 400
    # undecodable jpeg bytes -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/initialize",
              {"stream": "x", "image": base64.b64encode(b"junk").decode(),
               "bbox": [1, 1, 5, 5]})
    assert e.value.code == 400
    # unknown route -> 404; bad JSON -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/nope", {})
    assert e.value.code == 404
    req = urllib.request.Request(url + "/track", data=b"{not json",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


@pytest.fixture(scope="module")
def lockstep_url():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    proto = Tracker(tiny_cfg(), model, variables, tokenizer=None)
    from uvltrack_tpu.cli.serve import make_server as mk

    server = mk(proto, port=0, lockstep=2, batch_window=10.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, server, (tiny_cfg(), model, variables)
    server.dispatcher.stop()
    server.shutdown()
    server.server_close()


def test_lockstep_coalesces_and_matches_standalone(lockstep_url):
    url, server, (cfg, model, variables) = lockstep_url
    rng = np.random.default_rng(5)
    first = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    frames = {"a": [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                    for _ in range(3)],
              "b": [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                    for _ in range(3)]}
    boxes0 = {"a": [30, 20, 20, 24], "b": [10, 10, 30, 30]}
    for s in ("a", "b"):
        _post(url, "/initialize", {"stream": s, "image": _npy_b64(first),
                                   "bbox": boxes0[s], "format": "npy"})
    health = json.loads(urllib.request.urlopen(url + "/health",
                                               timeout=60).read())
    assert health["mode"] == "lockstep" and health["streams"] == 2

    # both streams post concurrently; the dispatcher coalesces each round
    # into ONE pool.submit (batch_window=10s would stall a lone request, so
    # passing fast proves the all-pending barrier fired, not the timeout)
    results = {"a": [], "b": []}
    for i in range(3):
        errs = []

        def go(s, i=i):
            try:
                results[s].append(_post(
                    url, "/track", {"stream": s,
                                    "image": _npy_b64(frames[s][i]),
                                    "format": "npy"}))
            except Exception as e:  # surface thread failures in the test
                errs.append((s, e))

        ts = [threading.Thread(target=go, args=(s,)) for s in ("a", "b")]
        [t.start() for t in ts]
        [t.join(timeout=600) for t in ts]
        assert not errs, errs

    for s in ("a", "b"):
        t1 = Tracker(cfg, model, variables)
        t1.initialize(first, {"init_bbox": list(boxes0[s])})
        for got, f in zip(results[s], frames[s]):
            want = t1.track(f)
            np.testing.assert_allclose(got["bbox"], want["target_bbox"],
                                       rtol=1e-5, atol=1e-4)

    # close a: b alone now dispatches immediately (all-open-pending = {b})
    _post(url, "/close", {"stream": "a"})
    out = _post(url, "/track", {"stream": "b",
                                "image": _npy_b64(frames["b"][0]),
                                "format": "npy"})
    assert np.isfinite(out["score"])
    # pool full -> 503 (capacity 2: b + c occupy it)
    _post(url, "/initialize", {"stream": "c", "image": _npy_b64(first),
                               "bbox": [5, 5, 10, 10], "format": "npy"})
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/initialize", {"stream": "d", "image": _npy_b64(first),
                                   "bbox": [5, 5, 10, 10], "format": "npy"})
    assert e.value.code == 503
    # /track on a closed stream -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/track", {"stream": "a", "image": _npy_b64(first),
                              "format": "npy"})
    assert e.value.code == 404


# --------------------------------------------------- admission + eviction


def _status_of(url, route, payload):
    req = urllib.request.Request(
        url + route, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_max_streams_admission(server_url_limited):
    """--max_streams: the N+1th NEW stream gets 429; re-initializing an
    existing stream and a post-close admission both succeed."""
    url, server = server_url_limited
    rng = np.random.default_rng(31)
    img = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
    for s in ("m1", "m2"):
        code, _ = _status_of(url, "/initialize",
                             {"stream": s, "image": _npy_b64(img),
                              "format": "npy", "bbox": [10, 10, 20, 20]})
        assert code == 200
    code, body = _status_of(url, "/initialize",
                            {"stream": "m3", "image": _npy_b64(img),
                             "format": "npy", "bbox": [10, 10, 20, 20]})
    assert code == 429 and "max_streams" in body["error"]
    # re-init of an EXISTING stream is not a new admission
    code, _ = _status_of(url, "/initialize",
                         {"stream": "m1", "image": _npy_b64(img),
                          "format": "npy", "bbox": [10, 10, 20, 20]})
    assert code == 200
    # closing frees a slot
    _post(url, "/close", {"stream": "m2"})
    code, _ = _status_of(url, "/initialize",
                         {"stream": "m3", "image": _npy_b64(img),
                          "format": "npy", "bbox": [10, 10, 20, 20]})
    assert code == 200
    _post(url, "/close", {"stream": "m1"})
    _post(url, "/close", {"stream": "m3"})


@pytest.fixture(scope="module")
def server_url_limited():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    proto = Tracker(tiny_cfg(), model, variables, tokenizer=None)
    server = make_server(proto, port=0, max_streams=2, stream_ttl=1.5)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, server
    if server.reaper is not None:
        server.reaper.stop()
    server.shutdown()
    server.server_close()


def test_stream_ttl_evicts_idle(server_url_limited):
    """--stream_ttl: an idle stream is reaped (404 on its next /track) and
    its admission slot frees up; an active stream survives."""
    import time as _time

    url, server = server_url_limited
    rng = np.random.default_rng(32)
    img = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
    # warm-up OUTSIDE the timed window: the first /track compiles the step
    # for seconds on this CPU while holding the server lock (blocking the
    # reaper), which would eat the whole keep-alive loop
    _post(url, "/initialize", {"stream": "t1", "image": _npy_b64(img),
                               "format": "npy", "bbox": [10, 10, 20, 20]})
    _post(url, "/track", {"stream": "t1", "image": _npy_b64(img),
                          "format": "npy"})
    _post(url, "/close", {"stream": "t1"})
    for s in ("t1", "t2"):
        _post(url, "/initialize", {"stream": s, "image": _npy_b64(img),
                                   "format": "npy", "bbox": [10, 10, 20, 20]})
    # keep t1 alive past the 1.5s ttl while t2 goes idle
    deadline = _time.monotonic() + 3.2
    while _time.monotonic() < deadline:
        _post(url, "/track", {"stream": "t1", "image": _npy_b64(img),
                              "format": "npy"})
        _time.sleep(0.3)
    code, _ = _status_of(url, "/track",
                         {"stream": "t1", "image": _npy_b64(img),
                          "format": "npy"})
    assert code == 200  # active stream survived
    code, body = _status_of(url, "/track",
                            {"stream": "t2", "image": _npy_b64(img),
                             "format": "npy"})
    assert code == 404  # idle stream was evicted
    _post(url, "/close", {"stream": "t1"})


def test_reaper_spares_in_flight_and_drops_counters():
    """_StreamReaper._evict_idle: (a) a stream whose frame is waiting in
    the lockstep dispatcher is mid-request, never idle — evicting it would
    fail the whole in-flight round; (b) eviction removes the stream's
    /stats counters entry, so stream churn cannot grow /stats without
    bound. Regression tests for the round-3 review findings (both direct
    unit tests on a stub server — no HTTP, no compile)."""
    import types

    from uvltrack_tpu.cli.serve import _StreamReaper

    class _Pool:
        def __init__(self):
            self.closed = []

        def close(self, s):
            self.closed.append(s)

    srv = types.SimpleNamespace(
        lock=threading.Lock(),
        last_seen={"busy": 0.0, "idle": 0.0},  # both far older than any ttl
        counters={"busy": {"frames": 1}, "idle": {"frames": 1}},
        dispatcher=types.SimpleNamespace(pending={"busy": object()}),
        pool=_Pool(), streams={}, verbose=False)
    reaper = _StreamReaper(srv, ttl_s=3600.0)  # thread idles; we call direct
    try:
        evicted = reaper._evict_idle()
    finally:
        reaper.stop()
    assert evicted == ["idle"]
    assert srv.pool.closed == ["idle"]
    assert "busy" in srv.last_seen and "busy" in srv.counters
    assert "idle" not in srv.counters, "/stats must forget evicted streams"
    assert "idle" not in srv.last_seen


# --------------------------------------------------- multichip (mesh) mode


def test_lockstep_mesh_matches_standalone():
    """cli/serve --multichip path: lockstep slots sharded over the 8-device
    virtual mesh produce the same boxes as a standalone single-stream
    Tracker — the serving-side counterpart of
    test_stream_pool.test_pool_sharded_over_mesh_matches_unsharded."""
    from uvltrack_tpu.cli.serve import make_server as mk
    from uvltrack_tpu.parallel.mesh import make_mesh

    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    cfg = tiny_cfg()
    proto = Tracker(cfg, model, variables, tokenizer=None)
    mesh = make_mesh(data=8, model=1)
    server = mk(proto, port=0, lockstep=2, batch_window=10.0, mesh=mesh)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        rng = np.random.default_rng(11)
        first = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
        frames = {s: [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                      for _ in range(2)] for s in ("a", "b")}
        boxes0 = {"a": [30, 20, 20, 24], "b": [10, 10, 30, 30]}
        for s in ("a", "b"):
            _post(url, "/initialize", {"stream": s, "image": _npy_b64(first),
                                       "bbox": boxes0[s], "format": "npy"})
        results = {"a": [], "b": []}
        for i in range(2):
            errs = []

            def go(s, i=i):
                try:
                    results[s].append(_post(
                        url, "/track", {"stream": s,
                                        "image": _npy_b64(frames[s][i]),
                                        "format": "npy"}))
                except Exception as e:
                    errs.append((s, e))

            ts = [threading.Thread(target=go, args=(s,)) for s in ("a", "b")]
            [t2.start() for t2 in ts]
            [t2.join(timeout=600) for t2 in ts]
            assert not errs, errs
        for s in ("a", "b"):
            t1 = Tracker(cfg, model, variables)
            t1.initialize(first, {"init_bbox": list(boxes0[s])})
            for got, f in zip(results[s], frames[s]):
                want = t1.track(f)
                np.testing.assert_allclose(got["bbox"], want["target_bbox"],
                                           rtol=1e-5, atol=1e-4)
    finally:
        if server.dispatcher is not None:
            server.dispatcher.stop()
        server.shutdown()
        server.server_close()
