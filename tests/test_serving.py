"""Serving layer (serving.py + cli/serve.py): dynamic batching,
per-seed determinism independent of batch composition, HTTP surface."""
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.serving import SamplerServer


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
