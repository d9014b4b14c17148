"""Serving load test (VERDICT r2 ask #8): a defined request profile
through the hardened HttpBackend must complete with BOUNDED client
threads, connection reuse, measurable p50/p99, and explicit
backpressure instead of unbounded queueing.

Request profile: 200 single-image classify requests fired as fast as the
client pool allows against one http_server backend on the ref runtime
(the continuous-batching micro-profile; SURVEY.md §2 batch-streaming
row). The latency bound is deliberately loose — CI boxes vary — the
hard assertions are thread count, completion, and correctness.
"""

import threading
import time

import numpy as np
import pytest

from bnn_pynq_tpu.runtime.frontend import (BackendHandle, BackpressureError,
                                           Frontend, HttpBackend)


@pytest.fixture(scope="module")
def mini_server(tmp_path_factory):
    from bnn_pynq_tpu.compiler import compile_network, save_artifact
    from bnn_pynq_tpu.runtime.engine import InferenceEngine
    from bnn_pynq_tpu.runtime.http_server import serve
    from tests.test_finnthesizer import init_perturbed, mini_cnv

    cfg = mini_cnv(1, 1)
    _, params, stats = init_perturbed(cfg, seed=7)
    compiled = compile_network(cfg, params, stats)
    path = str(tmp_path_factory.mktemp("art") / "mini.npz")
    save_artifact(path, compiled)
    httpd, batcher = serve(path, port=0, runtime="ref", block=False)
    yield httpd, compiled, InferenceEngine(compiled, runtime="ref")
    httpd.shutdown()
    batcher.stop()


def _client_threads(prefix: str) -> int:
    return sum(1 for t in threading.enumerate()
               if t.name.startswith(prefix))


def test_load_profile_bounded_threads(mini_server):
    httpd, compiled, ref_engine = mini_server
    port = httpd.server_address[1]
    hb = HttpBackend(f"http://127.0.0.1:{port}", max_workers=8,
                     max_pending=512)
    fe = Frontend([BackendHandle("a", hb, probe=hb.probe)], heartbeat_s=5.0)

    rng = np.random.default_rng(3)
    n = 200
    imgs = rng.integers(0, 256, size=(n, 10, 10, 3)).astype(np.uint8)
    expected = ref_engine.classify(imgs)
    try:
        t0 = time.perf_counter()
        lat = []
        futures = []
        for i in range(n):
            t_req = time.perf_counter()
            f = fe.submit(imgs[i])
            f.add_done_callback(
                lambda _f, t_req=t_req: lat.append(
                    time.perf_counter() - t_req))
            futures.append(f)
        got = [f.result(60) for f in futures]
        wall = time.perf_counter() - t0

        np.testing.assert_array_equal(np.asarray(got), expected)
        # bounded client threads: the pool, not one thread per request
        assert _client_threads("httpbackend-") <= 8
        assert len(lat) == n
        p50 = float(np.percentile(lat, 50)) * 1e3
        p99 = float(np.percentile(lat, 99)) * 1e3
        assert p50 > 0 and p99 >= p50
        assert wall < 60.0
        # stats endpoint reachable over the same (reused) connections
        s = hb.stats()
        assert s["requests"] >= n
    finally:
        fe.stop()
        hb.close()


def test_http_backend_submit_many(mini_server):
    """One POST per k-image batch, classes array back, end to end over
    a live HTTP server + BatchingServer."""
    httpd, compiled, ref_engine = mini_server
    port = httpd.server_address[1]
    hb = HttpBackend(f"http://127.0.0.1:{port}")
    fe = Frontend([BackendHandle("a", hb, probe=hb.probe)], heartbeat_s=5.0)
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, size=(7, 10, 10, 3)).astype(np.uint8)
    expected = ref_engine.classify(imgs)
    try:
        got = fe.submit_many(imgs).result(60)
        np.testing.assert_array_equal(got, expected)
    finally:
        fe.stop()
        hb.close()


def test_backpressure_sheds_not_queues(mini_server):
    httpd, _, _ = mini_server
    port = httpd.server_address[1]
    hb = HttpBackend(f"http://127.0.0.1:{port}", max_workers=2,
                     max_pending=4)
    x = np.zeros((10, 10, 3), np.uint8)
    futures = [hb.submit(x) for _ in range(32)]
    rejected = 0
    for f in futures:
        try:
            f.result(30)
        except BackpressureError:
            rejected += 1
    # more requests than max_pending were in flight at once → most shed
    # (some slack: requests that complete during the submit loop free
    # capacity for later submissions)
    assert rejected >= 20
    # capacity recovers after the burst drains
    assert hb.submit(x).result(30) is not None
    hb.close()


def test_http_reload_hot_swaps_parameters(tmp_path):
    """POST /reload with artifact bytes swaps weights on the live
    server with zero downtime (SURVEY §3.2 doInit-while-live over HTTP);
    a different-topology artifact is refused with 409."""
    import io as _io
    import urllib.request
    import urllib.error
    from bnn_pynq_tpu.compiler import compile_network, save_artifact
    from bnn_pynq_tpu.runtime.engine import InferenceEngine
    from bnn_pynq_tpu.runtime.http_server import serve
    from tests.test_finnthesizer import init_perturbed, mini_cnv, mini_mlp

    cfg = mini_cnv(1, 1)
    _, p1, s1 = init_perturbed(cfg, seed=50)
    _, p2, s2 = init_perturbed(cfg, seed=51)
    c1, c2 = compile_network(cfg, p1, s1), compile_network(cfg, p2, s2)
    art1 = str(tmp_path / "a1.npz")
    save_artifact(art1, c1)
    art2_path = str(tmp_path / "a2.npz")
    save_artifact(art2_path, c2)
    art2 = open(art2_path, "rb").read()

    mcfg = mini_mlp(1, 1)
    _, mp, ms = init_perturbed(mcfg, seed=52)
    bad_path = str(tmp_path / "bad.npz")
    save_artifact(bad_path, compile_network(mcfg, mp, ms))
    bad = open(bad_path, "rb").read()

    httpd, batcher = serve(art1, port=0, runtime="ref", block=False)
    port = httpd.server_address[1]

    def post(path, body, timeout=60):
        return urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body), timeout=timeout)

    rng = np.random.default_rng(53)
    imgs = rng.integers(0, 256, size=(5, 10, 10, 3)).astype(np.uint8)
    buf = _io.BytesIO()
    np.savez(buf, x=imgs)
    try:
        import json as _json
        r1 = _json.loads(post("/classify", buf.getvalue()).read())
        np.testing.assert_array_equal(
            r1["classes"], InferenceEngine(c1, runtime="ref").classify(imgs))
        # live hot-swap
        rr = _json.loads(post("/reload", art2).read())
        assert rr["reloaded"] == cfg.name
        r2 = _json.loads(post("/classify", buf.getvalue()).read())
        np.testing.assert_array_equal(
            r2["classes"], InferenceEngine(c2, runtime="ref").classify(imgs))
        # wrong topology -> 409, server keeps serving
        try:
            post("/reload", bad)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
        r3 = _json.loads(post("/classify", buf.getvalue()).read())
        assert r3["classes"] == r2["classes"]
    finally:
        httpd.shutdown()
        batcher.stop()
