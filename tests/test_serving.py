"""Serving layer (serving.py + cli/serve.py): dynamic batching,
per-seed determinism independent of batch composition, HTTP surface,
and the hardening behaviors (multi-size variants, load shedding,
request TTL, cancellation, latency histograms)."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_image_generator_tpu.serving import SamplerServer, ServerOverloaded


def make_tiny_sample():
    """A cheap stand-in with the pipeline_sample contract:
    fn(keys [batch], batch) -> uint8 [batch, 8, 8, 3], deterministic
    per key."""
    def fn(keys, batch):
        imgs = jax.vmap(
            lambda k: jax.random.uniform(k, (8, 8, 3), maxval=255.0)
        )(keys)
        return imgs.astype(jnp.uint8)

    return fn


def test_server_batches_and_resolves_all():
    srv = SamplerServer(make_tiny_sample(), batch_buckets=(1, 2, 4),
                        max_wait_ms=50)
    srv.warmup()  # same stacked-keys contract as the worker
    with srv:
        futs = [srv.submit(i) for i in range(10)]
        imgs = [f.result(timeout=30) for f in futs]
    assert all(i.shape == (8, 8, 3) for i in imgs)
    assert srv.stats.requests == 10
    assert srv.stats.images == 10
    # concurrent submission must have produced at least one multi-image
    # batch (10 requests in << max_wait)
    assert srv.stats.batches < 10


def test_server_per_seed_determinism_across_batchings():
    fn = make_tiny_sample()
    # run seed 7 alone...
    srv1 = SamplerServer(fn, batch_buckets=(1, 2, 4), max_wait_ms=1)
    with srv1:
        alone = srv1.submit(7).result(timeout=30)
    # ...and together with other requests (different batch composition)
    srv2 = SamplerServer(fn, batch_buckets=(4,), max_wait_ms=200)
    with srv2:
        futs = [srv2.submit(s) for s in (1, 7, 3, 9)]
        together = futs[1].result(timeout=30)
    np.testing.assert_array_equal(np.asarray(alone), np.asarray(together))


def test_server_pads_partial_batches():
    srv = SamplerServer(make_tiny_sample(), batch_buckets=(4,),
                        max_wait_ms=1)
    with srv:
        img = srv.submit(0).result(timeout=30)
    assert img.shape == (8, 8, 3)
    assert srv.stats.padded_images == 3


def test_server_propagates_errors():
    def bad(keys, batch):
        raise RuntimeError("boom")

    srv = SamplerServer(bad, batch_buckets=(1,), max_wait_ms=1)
    with srv:
        fut = srv.submit(0)
        try:
            fut.result(timeout=30)
            raised = False
        except RuntimeError:
            raised = True
    assert raised


def test_server_multi_variant_routing():
    """One server, two image sizes: requests batch only with their own
    size and both variants resolve with their own shape."""
    def make(size):
        def fn(keys, batch):
            imgs = jax.vmap(
                lambda k: jax.random.uniform(k, (size, size, 3),
                                             maxval=255.0)
            )(keys)
            return imgs.astype(jnp.uint8)
        return fn

    srv = SamplerServer({8: make(8), 16: make(16)},
                        batch_buckets=(1, 2, 4), max_wait_ms=30)
    with srv:
        futs8 = [srv.submit(i, variant=8) for i in range(3)]
        futs16 = [srv.submit(i, variant=16) for i in range(3)]
        i8 = [f.result(timeout=30) for f in futs8]
        i16 = [f.result(timeout=30) for f in futs16]
    assert all(i.shape == (8, 8, 3) for i in i8)
    assert all(i.shape == (16, 16, 3) for i in i16)
    # default variant is the first key; unknown variants are rejected
    with pytest.raises(KeyError):
        srv.submit(0, variant=32)


def test_server_sheds_load_when_queue_full():
    release = threading.Event()

    def slow(keys, batch):
        release.wait(timeout=30)
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    srv = SamplerServer(slow, batch_buckets=(1,), max_wait_ms=1,
                        max_queue=2)
    with srv:
        first = srv.submit(0)
        time.sleep(0.2)  # worker dequeues it and blocks in slow()
        futs = [first] + [srv.submit(i) for i in (1, 2)]  # fill the queue
        with pytest.raises(ServerOverloaded):
            for i in range(8):  # worker may have drained one more
                srv.submit(100 + i)
        assert srv.stats.shed >= 1
        release.set()
        for f in futs:
            assert f.result(timeout=30).shape == (8, 8, 3)


def test_server_ttl_expires_queued_requests():
    release = threading.Event()
    calls = []

    def slow(keys, batch):
        calls.append(batch)
        release.wait(timeout=30)
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    srv = SamplerServer(slow, batch_buckets=(1,), max_wait_ms=1,
                        default_ttl_s=0.15)
    with srv:
        first = srv.submit(0)            # occupies the worker
        time.sleep(0.05)
        stuck = srv.submit(1)            # queued behind it, will expire
        time.sleep(0.3)                  # > ttl while worker is blocked
        release.set()
        assert first.result(timeout=30).shape == (8, 8, 3)
        with pytest.raises(TimeoutError):
            stuck.result(timeout=30)
    assert srv.stats.expired == 1
    # the expired request never burned a batch
    assert len(calls) == 1


def test_server_cancelled_future_skipped():
    release = threading.Event()
    seen = []

    def slow(keys, batch):
        seen.append(np.asarray(keys)[:, 1].tolist())
        release.wait(timeout=30)
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    srv = SamplerServer(slow, batch_buckets=(1,), max_wait_ms=1)
    with srv:
        first = srv.submit(0)
        time.sleep(0.05)
        doomed = srv.submit(7)
        assert doomed.cancel()           # still queued -> cancellable
        release.set()
        assert first.result(timeout=30).shape == (8, 8, 3)
    assert srv.stats.cancelled == 1
    assert all(7 not in s for s in seen)


def test_server_stats_snapshot_and_histogram():
    srv = SamplerServer(make_tiny_sample(), batch_buckets=(1, 2, 4),
                        max_wait_ms=5)
    with srv:
        futs = [srv.submit(i) for i in range(5)]
        [f.result(timeout=30) for f in futs]
    snap = srv.stats.snapshot()
    assert snap["requests"] == 5 and snap["images"] == 5
    assert snap["latency"]["count"] == 5
    assert snap["latency"]["p50_ms"] <= snap["latency"]["p99_ms"]
    assert sum(snap["latency"]["buckets"].values()) == 5
    assert snap["queue_wait"]["count"] == 5


def test_http_surface_end_to_end():
    """Spin the real HTTP handler over a tiny sampler and hit it with
    concurrent requests."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler

    srv = SamplerServer(make_tiny_sample(), batch_buckets=(1, 2, 4),
                        max_wait_ms=20)
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(srv, jpeg_encode))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        results = []

        def hit(seed):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            conn.request("GET", f"/sample?seed={seed}")
            r = conn.getresponse()
            results.append((r.status, r.getheader("Content-Type"),
                            r.read()))
            conn.close()

        threads = [threading.Thread(target=hit, args=(s,)) for s in range(6)]
        [x.start() for x in threads]
        [x.join(timeout=60) for x in threads]
        assert len(results) == 6
        for status, ctype, body in results:
            assert status == 200 and ctype == "image/jpeg"
            img = PIL.Image.open(io.BytesIO(body))
            assert img.size == (8, 8)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        health = r.read()
        assert r.status == 200 and b'"ok": true' in health
        conn.close()
    finally:
        httpd.shutdown()
        srv.stop()


def make_conditional_sample(num_classes):
    """Stand-in with the conditional contract fn(keys, batch, class_ids):
    the class id is encoded into the image so tests can read back which
    id each request was dispatched with."""
    def fn(keys, batch, class_ids):
        imgs = jax.vmap(
            lambda k: jax.random.uniform(k, (8, 8, 3), maxval=100.0)
        )(keys)
        imgs = imgs.at[:, 0, 0, 0].set(class_ids.astype(jnp.float32))
        return imgs.astype(jnp.uint8)

    return fn


def test_conditional_server_routes_class_ids():
    n_cls = 5
    srv = SamplerServer(make_conditional_sample(n_cls),
                        batch_buckets=(1, 2, 4), max_wait_ms=20,
                        num_classes=n_cls)
    srv.warmup()
    with srv:
        f_cond = srv.submit(1, class_id=3)
        f_uncond = srv.submit(2)
        img_c = f_cond.result(timeout=30)
        img_u = f_uncond.result(timeout=30)
    assert img_c[0, 0, 0] == 3            # the request's class id
    assert img_u[0, 0, 0] == n_cls        # null id for unconditional

    # validation: unconditional server rejects class_id; range-checked
    srv2 = SamplerServer(make_tiny_sample(), batch_buckets=(1,))
    with pytest.raises(ValueError, match="unconditional"):
        srv2.submit(0, class_id=1)
    with pytest.raises(ValueError, match="out of range"):
        srv.submit(0, class_id=n_cls)
    with pytest.raises(ValueError, match="out of range"):
        srv.submit(0, class_id=-1)


def test_http_conditional_surface():
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler

    srv = SamplerServer(make_conditional_sample(4), batch_buckets=(1, 2),
                        max_wait_ms=5, num_classes=4)
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(srv, jpeg_encode))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/sample?seed=1&class_id=2")
        r = conn.getresponse()
        assert r.status == 200 and r.getheader("Content-Type") == "image/jpeg"
        r.read()
        # out-of-range class id -> 400, not a dropped connection
        conn.request("GET", "/sample?seed=1&class_id=99")
        r = conn.getresponse()
        assert r.status == 400 and b"out of range" in r.read()
        # malformed class id -> 400
        conn.request("GET", "/sample?seed=1&class_id=abc")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()
    finally:
        httpd.shutdown()
        srv.stop()


def test_payload_variant_batching_and_validation():
    from ldm_image_generator_tpu.serving import Variant

    def fn(keys, batch, payload=None):
        # encode each request's payload mean into its image so the test
        # can verify per-request payload routing through batching
        imgs = jnp.broadcast_to(
            jnp.mean(payload, axis=(1, 2, 3))[:, None, None, None],
            (batch, 8, 8, 3),
        )
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(
        {"gen": make_tiny_sample(),
         "i2i": Variant(fn, payload_shape=(4, 4, 3))},
        batch_buckets=(1, 2, 4), max_wait_ms=20,
    )
    srv.warmup()
    with srv:
        f1 = srv.submit(1, variant="i2i", payload=np.full((4, 4, 3), 7.0))
        f2 = srv.submit(2, variant="i2i", payload=np.full((4, 4, 3), 9.0))
        f3 = srv.submit(3, variant="gen")  # other variant, same server
        a, b, c = (f.result(timeout=30) for f in (f1, f2, f3))
    assert a[0, 0, 0] == 7 and b[0, 0, 0] == 9
    assert c.shape == (8, 8, 3)

    with pytest.raises(ValueError, match="needs a payload"):
        srv.submit(0, variant="i2i")
    with pytest.raises(ValueError, match="needs a payload"):
        srv.submit(0, variant="i2i", payload=np.zeros((2, 2, 3)))
    with pytest.raises(ValueError, match="does not take"):
        srv.submit(0, variant="gen", payload=np.zeros((4, 4, 3)))


def test_guidance_variant_batching_and_validation():
    from ldm_image_generator_tpu.serving import Variant

    def fn(keys, batch, guidance_scales):
        # encode each request's scale into its image so the test can
        # verify per-request guidance routing through batching
        imgs = jnp.broadcast_to(
            guidance_scales[:, None, None, None], (batch, 8, 8, 3)
        )
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(
        {"gen": make_tiny_sample(),
         "cfg": Variant(fn, takes_guidance=True)},
        batch_buckets=(1, 2, 4), max_wait_ms=20,
    )
    srv.warmup()
    with srv:
        f1 = srv.submit(1, variant="cfg", guidance=7.0)
        f2 = srv.submit(2, variant="cfg", guidance=9.0)
        f3 = srv.submit(3, variant="cfg")  # no scale -> rides as 1.0
        a, b, c = (f.result(timeout=30) for f in (f1, f2, f3))
    assert a[0, 0, 0] == 7 and b[0, 0, 0] == 9  # mixed scales, one batch
    assert c[0, 0, 0] == 1

    with pytest.raises(ValueError, match="does not take"):
        srv.submit(0, variant="gen", guidance=3.0)
    with pytest.raises(ValueError, match="non-finite"):
        srv.submit(0, variant="cfg", guidance=float("nan"))


def test_http_guidance_scale_routes_by_cost():
    """guidance_scale != 1 routes to the ('cfg', size) variant; 1.0 or
    absent rides the plain single-eval variant (bucketing by COST:
    mixed-VALUE requests share the CFG batch, serve.py)."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler
    from ldm_image_generator_tpu.serving import Variant

    def plain(keys, batch, class_ids):
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    def cfg(keys, batch, class_ids, guidance_scales):
        return jnp.full((batch, 8, 8, 3), 200, jnp.uint8)

    srv = SamplerServer(
        {8: plain, ("cfg", 8): Variant(cfg, takes_guidance=True)},
        batch_buckets=(1, 2), max_wait_ms=5, num_classes=4,
    )
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(srv, jpeg_encode, default_size=8,
                     default_guidance=1.0),
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    def fetch_mean(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", path)
        r = conn.getresponse()
        assert r.status == 200, r.read()
        img = np.asarray(PIL.Image.open(io.BytesIO(r.read())))
        conn.close()
        return float(img.mean())

    try:
        # absent / exactly 1.0 -> plain variant (dark image)
        assert fetch_mean("/sample?seed=1&class_id=2") < 50
        assert fetch_mean(
            "/sample?seed=1&class_id=2&guidance_scale=1.0") < 50
        # any other scale -> CFG variant (bright image)
        assert fetch_mean(
            "/sample?seed=1&class_id=2&guidance_scale=3.0") > 150
        assert fetch_mean(
            "/sample?seed=1&class_id=2&guidance_scale=0.5") > 150
        # malformed scale -> 400, not a dropped connection
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/sample?seed=1&guidance_scale=abc")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_guidance_without_cfg_variant_is_400():
    """A server launched without --num-classes has no CFG variants:
    guidance_scale != 1 maps to an unknown variant -> 400."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler

    srv = SamplerServer({8: make_tiny_sample()}, batch_buckets=(1,),
                        max_wait_ms=5)
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(srv, jpeg_encode, default_size=8)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/sample?seed=1&guidance_scale=2.0")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_img2img_surface():
    import base64
    import http.client
    import io
    import json as _json
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler
    from ldm_image_generator_tpu.serving import Variant

    got = {}

    def fn(keys, batch, payload=None):
        got["payload"] = np.asarray(payload)
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    srv = SamplerServer(
        {16: make_tiny_sample(),
         ("img2img", 16): Variant(fn, payload_shape=(16, 16, 3))},
        batch_buckets=(1, 2), max_wait_ms=5,
    )
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(srv, jpeg_encode, default_size=16)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        PIL.Image.fromarray(
            np.full((16, 16, 3), 200, np.uint8)).save(buf, format="PNG")
        body = _json.dumps({
            "seed": 5, "image": base64.b64encode(buf.getvalue()).decode(),
        })
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/img2img", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200 and r.getheader("Content-Type") == "image/jpeg"
        r.read()
        # the decoded client image reached the pipeline in [-1, 1]
        assert got["payload"].shape == (1, 16, 16, 3)
        assert abs(got["payload"][0].mean() - (200 / 127.5 - 1.0)) < 0.02
        # missing image field -> 400
        conn.request("POST", "/img2img", _json.dumps({"seed": 1}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # garbage base64 -> 400
        conn.request("POST", "/img2img",
                     _json.dumps({"seed": 1, "image": "!!notb64!!"}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()

        # oversize declared body -> 413 BEFORE the body is read (a
        # request must not be able to exhaust host memory, advisor r3)
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn2.putrequest("POST", "/img2img")
        conn2.putheader("Content-Type", "application/json")
        conn2.putheader("Content-Length", str(64 * 1024 * 1024))
        conn2.endheaders()
        r = conn2.getresponse()
        assert r.status == 413
        r.read()
        conn2.close()

        # decompression bomb: tiny payload declaring 20000x20000 pixels
        # -> 413 from the header-only dimension check, no pixel decode
        import struct
        import zlib

        def png_with_dims(w, h):
            sig = b"\x89PNG\r\n\x1a\n"
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            out = sig
            for tag, data in ((b"IHDR", ihdr),
                              (b"IDAT", zlib.compress(b"\x00")),
                              (b"IEND", b"")):
                out += struct.pack(">I", len(data)) + tag + data
                out += struct.pack(">I", zlib.crc32(tag + data))
            return out

        # 100M pixels: below PIL's own ~178M-pixel bomb guard, above the
        # handler's 64M cap — exercises the explicit dimension check
        bomb = base64.b64encode(png_with_dims(10000, 10000)).decode()
        conn3 = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn3.request("POST", "/img2img",
                      _json.dumps({"seed": 1, "image": bomb}),
                      {"Content-Type": "application/json"})
        r = conn3.getresponse()
        assert r.status == 413
        r.read()
        conn3.close()
    finally:
        httpd.shutdown()
        srv.stop()


def test_saturated_server_dispatches_full_buckets():
    """Regression (found by benchmarks/serving_bench.py): while a batch
    computes, queued requests age past max_wait — the group-taker must
    still coalesce the backlog into full buckets, not dribble batch-1
    dispatches (measured 6 img/s instead of batched throughput)."""
    def slow_fn(keys, batch):
        time.sleep(0.05)  # simulated device time: lets the queue fill
        imgs = jax.vmap(
            lambda k: jax.random.uniform(k, (8, 8, 3), maxval=255.0)
        )(keys)
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(slow_fn, batch_buckets=(1, 2, 8), max_wait_ms=5)
    srv.warmup()
    with srv:
        pool = [threading.Thread(target=srv.sample_sync, args=(s,),
                                 kwargs={"timeout": 60})
                for s in range(32)]
        [t.start() for t in pool]
        [t.join(timeout=60) for t in pool]
    assert srv.stats.images == 32
    # saturated: after the first (possibly small) dispatch the backlog
    # must coalesce — well above batch-1 dribble on average
    assert srv.stats.mean_batch >= 4, srv.stats.snapshot()


def test_priority_admission_shares():
    """Admission control: under load, background traffic is shed first
    while capacity stays reserved for interactive requests
    (serving.SamplerServer admit_fractions)."""
    srv = SamplerServer(make_tiny_sample(), batch_buckets=(1,),
                        max_queue=10, admit_fractions=(1.0, 0.8, 0.5))
    # worker NOT started: the queue only fills
    for i in range(5):
        srv.submit(i, priority=2)
    with pytest.raises(ServerOverloaded):
        srv.submit(99, priority=2)      # background beyond its 50% share
    for i in range(3):
        srv.submit(10 + i, priority=1)  # normal: share 8, qsize 5..7
    with pytest.raises(ServerOverloaded):
        srv.submit(99, priority=1)      # qsize 8 >= its share 8
    srv.submit(50, priority=0)          # interactive still admitted
    srv.submit(51, priority=0)          # fills the queue to 10
    with pytest.raises(ServerOverloaded):
        srv.submit(52, priority=0)      # hard bound applies to everyone
    with pytest.raises(ValueError):
        srv.submit(1, priority=3)       # outside admit_fractions
    assert srv.stats.shed == 3


def test_priority_orders_batch_slots():
    """Within one dispatched group, interactive requests take the batch
    slots first; lower-priority leftovers lead the NEXT dispatch (no
    starvation: the max_wait trigger is oldest-request-based)."""
    seen = []

    def fn(keys, batch):
        seen.append(np.asarray(keys)[:, -1].tolist())
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    srv = SamplerServer(fn, batch_buckets=(2,), max_wait_ms=30)
    # enqueue BEFORE starting the worker so all three requests are
    # pending in one cut: two background arrivals, then one interactive
    f1 = srv.submit(101, priority=2)
    f2 = srv.submit(102, priority=2)
    f3 = srv.submit(103, priority=0)
    with srv:
        for f in (f1, f2, f3):
            f.result(timeout=30)
    # first pair: the interactive request + the oldest background one
    assert set(seen[0]) == {103, 101}, seen
    assert 102 in [s for grp in seen[1:] for s in grp], seen


def test_http_sample_batch_streams_multipart():
    """/sample_batch: all seeds submitted up front (they coalesce into
    device batches) and streamed back as multipart/mixed parts tagged
    X-Seed; bad args give 400."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler

    srv = SamplerServer(make_tiny_sample(), batch_buckets=(1, 2, 4),
                        max_wait_ms=20)
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(srv, jpeg_encode))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/sample_batch?seeds=3,9,5")
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type").startswith(
            "multipart/mixed; boundary=")
        raw = r.read()
        conn.close()
        boundary = b"--ldmframe"
        parts = [p for p in raw.split(boundary)
                 if p.strip() and p.strip() != b"--"]
        assert len(parts) == 3, raw[:200]
        seen_seeds = set()
        for p in parts:
            head, body = p.split(b"\r\n\r\n", 1)
            assert b"Content-Type: image/jpeg" in head, head
            for line in head.split(b"\r\n"):
                if line.startswith(b"X-Seed:"):
                    seen_seeds.add(int(line.split(b":")[1]))
            img = PIL.Image.open(io.BytesIO(body.rstrip(b"\r\n")))
            assert img.size == (8, 8)
        assert seen_seeds == {3, 9, 5}

        # seed+n form
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/sample_batch?seed=100&n=2")
        r = conn.getresponse()
        raw = r.read()
        conn.close()
        assert r.status == 200
        assert raw.count(b"Content-Type: image/jpeg") == 2

        # bad args -> 400
        for bad in ("/sample_batch?seeds=,,", "/sample_batch?n=9999",
                    "/sample_batch?seeds=1,x"):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=60)
            conn.request("GET", bad)
            r = conn.getresponse()
            r.read()
            conn.close()
            assert r.status == 400, bad
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_step_tiers_route_by_cost():
    """steps=N routes to the ('steps', N, size) tier variants
    (--step-tiers); the default tier keeps the bare keys; an unserved
    tier is 400; img2img requests don't take steps (400)."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler

    def final(keys, batch):
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    def preview(keys, batch):
        return jnp.full((batch, 8, 8, 3), 200, jnp.uint8)

    srv = SamplerServer(
        {8: final, ("steps", 5, 8): preview},
        batch_buckets=(1, 2), max_wait_ms=5,
    )
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(srv, jpeg_encode, default_size=8,
                     step_tiers=(5,), default_steps=20),
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def fetch(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", path)
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, body

    try:
        # default tier -> bare variant (dark)
        st, body = fetch("/sample?seed=1")
        assert st == 200
        assert np.asarray(PIL.Image.open(io.BytesIO(body))).mean() < 50
        # explicit default steps -> SAME bare variant (not a tier key)
        st, body = fetch("/sample?seed=1&steps=20")
        assert st == 200
        assert np.asarray(PIL.Image.open(io.BytesIO(body))).mean() < 50
        # preview tier -> tier variant (bright)
        st, body = fetch("/sample?seed=1&steps=5")
        assert st == 200
        assert np.asarray(PIL.Image.open(io.BytesIO(body))).mean() > 150
        # /sample_batch takes the same knob
        st, body = fetch("/sample_batch?seeds=1,2&steps=5")
        assert st == 200 and body.count(b"Content-Type: image/jpeg") == 2
        # unserved tier -> 400 naming the available tiers
        st, body = fetch("/sample?seed=1&steps=7")
        assert st == 400 and b"tiers" in body
        # malformed -> 400
        st, _ = fetch("/sample?seed=1&steps=abc")
        assert st == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_route_steps_img2img_rejected():
    from ldm_image_generator_tpu.cli.serve import make_handler

    handler = make_handler(None, None, default_size=8, step_tiers=(5,),
                           default_steps=20)
    with pytest.raises(ValueError, match="img2img"):
        handler._route(8, None, img2img=True, steps=5)
    # default steps on img2img is fine (it's a no-op)
    variant, _ = handler._route(8, None, img2img=True, steps=20)
    assert variant == ("img2img", 8)


def test_negative_variant_batching_and_validation():
    """takes_negative variants receive per-request negative-class ids
    as a traced int row; requests without one (and padding) ride the
    null id == num_classes, so mixed batches coalesce (serving.py
    Variant.takes_negative, cli/serve.py negative_class)."""
    from ldm_image_generator_tpu.serving import Variant

    n_cls = 4

    def fn(keys, batch, class_ids, guidance_scales, negative_ids):
        # encode each request's negative id into its image
        imgs = jnp.broadcast_to(
            negative_ids.astype(jnp.float32)[:, None, None, None],
            (batch, 8, 8, 3),
        )
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(
        {"gen": make_conditional_sample(n_cls),
         "cfg": Variant(fn, takes_guidance=True, takes_negative=True)},
        batch_buckets=(1, 2, 4), max_wait_ms=20, num_classes=n_cls,
    )
    srv.warmup()
    with srv:
        f1 = srv.submit(1, variant="cfg", guidance=3.0, negative_class=2)
        f2 = srv.submit(2, variant="cfg", guidance=3.0, negative_class=0)
        f3 = srv.submit(3, variant="cfg", guidance=3.0)  # -> null id
        a, b, c = (f.result(timeout=30) for f in (f1, f2, f3))
    assert a[0, 0, 0] == 2 and b[0, 0, 0] == 0  # mixed ids, one batch
    assert c[0, 0, 0] == n_cls  # absent -> the null id

    with pytest.raises(ValueError, match="does not take"):
        srv.submit(0, variant="gen", negative_class=1)
    with pytest.raises(ValueError, match="out of range"):
        srv.submit(0, variant="cfg", negative_class=n_cls)
    with pytest.raises(ValueError, match="out of range"):
        srv.submit(0, variant="cfg", negative_class=-1)

    # takes_negative needs the null id -> unconditional server rejects
    with pytest.raises(AssertionError, match="takes_negative"):
        SamplerServer({"cfg": Variant(fn, takes_negative=True)},
                      batch_buckets=(1,))


def test_http_negative_class_routes_and_validates():
    """negative_class rides guided requests to the CFG variant; at
    guidance 1.0 it is a 400 (it would silently do nothing on the
    single-eval variant)."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler
    from ldm_image_generator_tpu.serving import Variant

    def plain(keys, batch, class_ids):
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    def cfg(keys, batch, class_ids, guidance_scales, negative_ids):
        imgs = jnp.broadcast_to(
            (negative_ids * 50).astype(jnp.float32)[:, None, None, None],
            (batch, 8, 8, 3),
        )
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(
        {8: plain,
         ("cfg", 8): Variant(cfg, takes_guidance=True,
                             takes_negative=True)},
        batch_buckets=(1, 2), max_wait_ms=5, num_classes=4,
    )
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(srv, jpeg_encode, default_size=8,
                     default_guidance=1.0),
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    def fetch(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", path)
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, body

    try:
        # guided + negative_class -> CFG variant, id delivered (2*50=100)
        st, body = fetch(
            "/sample?seed=1&class_id=1&guidance_scale=3.0"
            "&negative_class=2")
        assert st == 200
        img = np.asarray(PIL.Image.open(io.BytesIO(body)))
        assert abs(float(img.mean()) - 100.0) < 10
        # guided WITHOUT negative -> null id (4*50=200)
        st, body = fetch("/sample?seed=1&class_id=1&guidance_scale=3.0")
        assert st == 200
        img = np.asarray(PIL.Image.open(io.BytesIO(body)))
        assert abs(float(img.mean()) - 200.0) < 10
        # negative at guidance 1.0 -> 400 with the explicit reason
        st, body = fetch("/sample?seed=1&class_id=1&negative_class=2")
        assert st == 400 and b"no effect" in body
        # out-of-range negative -> 400 (submit validation)
        st, body = fetch(
            "/sample?seed=1&class_id=1&guidance_scale=3.0"
            "&negative_class=9")
        assert st == 400 and b"out of range" in body
    finally:
        httpd.shutdown()
        srv.stop()


def test_rescale_variant_batching_and_validation():
    """takes_rescale variants receive per-request CFG-rescale phis as a
    traced f32 row; None and padding ride as 0.0 (exact plain CFG), so
    mixed phi/no-phi requests coalesce (serving.Variant.takes_rescale,
    cli/serve.py cfg_rescale)."""
    from ldm_image_generator_tpu.serving import Variant

    def fn(keys, batch, guidance_scales, rescales):
        # encode each request's phi into its image so the test can
        # verify per-request rescale routing through batching
        imgs = jnp.broadcast_to(
            (rescales * 100.0)[:, None, None, None], (batch, 8, 8, 3)
        )
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(
        {"gen": make_tiny_sample(),
         "cfg": Variant(fn, takes_guidance=True, takes_rescale=True)},
        batch_buckets=(1, 2, 4), max_wait_ms=20,
    )
    srv.warmup()
    with srv:
        f1 = srv.submit(1, variant="cfg", guidance=3.0, cfg_rescale=0.7)
        f2 = srv.submit(2, variant="cfg", guidance=3.0, cfg_rescale=0.25)
        f3 = srv.submit(3, variant="cfg", guidance=3.0)  # -> phi 0.0
        a, b, c = (f.result(timeout=30) for f in (f1, f2, f3))
    assert a[0, 0, 0] == 70 and b[0, 0, 0] == 25  # mixed phis, one batch
    assert c[0, 0, 0] == 0

    with pytest.raises(ValueError, match="does not take"):
        srv.submit(0, variant="gen", cfg_rescale=0.5)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        srv.submit(0, variant="cfg", guidance=3.0, cfg_rescale=1.5)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        srv.submit(0, variant="cfg", guidance=3.0,
                   cfg_rescale=float("nan"))


def test_http_cfg_rescale_per_request_and_default():
    """cfg_rescale rides per request on guided traffic (cli/serve.py):
    an explicit phi reaches the variant, an absent one falls back to the
    server's --cfg-rescale default, phi at guidance 1.0 is 400, and an
    out-of-range phi is 400 (submit validation)."""
    import http.client
    import io
    from http.server import ThreadingHTTPServer

    import PIL.Image

    from ldm_image_generator_tpu.cli.serve import make_handler
    from ldm_image_generator_tpu.serving import Variant

    def plain(keys, batch, class_ids):
        return jnp.zeros((batch, 8, 8, 3), jnp.uint8)

    def cfg(keys, batch, class_ids, guidance_scales, rescales):
        imgs = jnp.broadcast_to(
            (rescales * 100.0)[:, None, None, None], (batch, 8, 8, 3)
        )
        return imgs.astype(jnp.uint8)

    srv = SamplerServer(
        {8: plain,
         ("cfg", 8): Variant(cfg, takes_guidance=True,
                             takes_rescale=True)},
        batch_buckets=(1, 2), max_wait_ms=5, num_classes=4,
    )
    srv.start()

    def jpeg_encode(img):
        buf = io.BytesIO()
        PIL.Image.fromarray(np.asarray(img)).save(buf, format="JPEG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(srv, jpeg_encode, default_size=8,
                     default_guidance=1.0, default_rescale=0.25),
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    def fetch(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", path)
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, body

    try:
        # explicit phi reaches the variant (0.5 * 100 = 50)
        st, body = fetch("/sample?seed=1&class_id=2&guidance_scale=3.0"
                         "&cfg_rescale=0.5")
        assert st == 200
        img = np.asarray(PIL.Image.open(io.BytesIO(body)))
        assert abs(float(img.mean()) - 50.0) < 10
        # absent phi -> the server default (0.25 * 100 = 25)
        st, body = fetch("/sample?seed=1&class_id=2&guidance_scale=3.0")
        assert st == 200
        img = np.asarray(PIL.Image.open(io.BytesIO(body)))
        assert abs(float(img.mean()) - 25.0) < 10
        # explicit phi at guidance 1.0 -> 400 with the explicit reason
        st, body = fetch("/sample?seed=1&class_id=2&cfg_rescale=0.5")
        assert st == 400 and b"no effect" in body
        # out-of-range phi -> 400 (submit validation)
        st, body = fetch("/sample?seed=1&class_id=2&guidance_scale=3.0"
                         "&cfg_rescale=1.5")
        assert st == 400 and b"[0, 1]" in body
    finally:
        httpd.shutdown()
        srv.stop()
