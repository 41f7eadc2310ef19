"""HTTP contract tests for the persistent serving daemon
(scd_resnet_tpu/infer/server.py + serve.py): /healthz, /metrics,
/warmup, and /analyse with a real (tiny) model end-to-end — upload PNG
bytes, get detections JSON back, analyzer cached per geometry (LRU),
compile time excluded from serving counters, client errors answered 400
without polluting the server-error metric.

The reference's deployment host (libtorch C++ around the traced model,
reference trace.py:15-17) has no test; this one pins the whole request
path on the device-fused tiling analyzer."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_resnet_tpu.infer.server import InferenceService, create_server
from scd_resnet_tpu.infer.wrapper import make_wrapper
from scd_resnet_tpu.models.center_net_offset import CenterNetResidual

TINY = (8, 8, 16, 32, 64, 32, 32, 32)


def _make_service(**kwargs):
    model = CenterNetResidual(num_layers=10, dims=TINY, terminal_hidden=16)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    wrapper = make_wrapper(model, variables["params"],
                           variables["batch_stats"])
    return InferenceService(wrapper=wrapper, **kwargs)


@pytest.fixture(scope="module")
def server_url():
    service = _make_service()
    httpd = create_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield "http://127.0.0.1:{}".format(port)
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=600) as resp:
        return json.loads(resp.read())


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def _png_bytes(array):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(array).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server_url):
    health = _get(server_url + "/healthz")
    assert health["status"] == "ok"
    assert health["mode"] == "device-fused"
    assert health["devices"]


def test_analyse_roundtrip_and_metrics(server_url):
    rng = np.random.default_rng(0)
    slide = rng.integers(0, 255, (700, 900), np.uint8)
    before = _get(server_url + "/metrics")
    status, payload = _post(server_url + "/analyse", _png_bytes(slide))
    assert status == 200
    assert payload["count"] == len(payload["detections"])
    for det in payload["detections"]:
        assert set(det) == {"x", "y", "rhr"}
        assert 0 <= det["x"] <= 900 and 0 <= det["y"] <= 700
    assert payload["latency_ms"] > 0

    # same geometry again: analyzer cache reused (no recompile) and a
    # per-request dedupe override is accepted
    status, second = _post(server_url + "/analyse?dedupe=16",
                           _png_bytes(slide))
    assert status == 200
    assert second["count"] <= payload["count"]

    assert "900x700" in _get(server_url + "/healthz")["geometries"]

    after = _get(server_url + "/metrics")
    assert after["requests"] == before["requests"] + 2
    assert after["clips"] > before["clips"]
    assert after["compiles"] == before["compiles"] + 1  # cache hit on #2
    # first-compile time lands in compile_seconds, not serving busy time
    assert after["compile_seconds"] > 0
    assert after["clips_per_second"] > 0


def test_raw_grayscale_matches_png(server_url):
    """application/octet-stream + X-Width/X-Height serves a raw uint8
    grayscale buffer and must return the exact detections the PNG path
    gives for the same pixels; bad geometry/size are client errors."""
    rng = np.random.default_rng(2)
    slide = rng.integers(0, 255, (700, 900), np.uint8)
    _, png_payload = _post(server_url + "/analyse", _png_bytes(slide))

    req = urllib.request.Request(
        server_url + "/analyse", data=slide.tobytes(), method="POST",
        headers={"Content-Type": "application/octet-stream",
                 "X-Width": "900", "X-Height": "700"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        raw_payload = json.loads(resp.read())
    assert raw_payload["detections"] == png_payload["detections"]

    # wrong byte count and a non-numeric geometry header are both 400
    # client errors, never 500s that trip the errors metric
    for headers in (
        {"X-Width": "900", "X-Height": "700"},      # with truncated body
        {"X-Width": "900px", "X-Height": "700"},    # bad header value
    ):
        headers["Content-Type"] = "application/octet-stream"
        bad = urllib.request.Request(
            server_url + "/analyse", data=slide.tobytes()[:-1],
            method="POST", headers=headers)
        try:
            urllib.request.urlopen(bad, timeout=600)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as err:
            assert err.code == 400
    assert _get(server_url + "/metrics")["errors"] == 0


def test_16bit_grayscale_matches_8bit(server_url):
    """16-bit scanner TIFF-style input must rescale, not wrap mod 256."""
    rng = np.random.default_rng(1)
    slide8 = rng.integers(0, 255, (700, 900), np.uint8)
    slide16 = (slide8.astype(np.uint16) * 257)

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(slide16).save(buf, format="PNG")
    status, p16 = _post(server_url + "/analyse", buf.getvalue())
    assert status == 200
    status, p8 = _post(server_url + "/analyse", _png_bytes(slide8))
    assert status == 200
    assert p16["detections"] == p8["detections"]


def test_client_errors_are_400_not_server_errors(server_url):
    before = _get(server_url + "/metrics")
    status, payload = _post(server_url + "/analyse", b"not an image")
    assert status == 400 and "error" in payload
    status, _ = _post(server_url + "/analyse?dedupe=abc", b"")
    assert status == 400
    status, _ = _post(server_url + "/warmup?width=abc", b"")
    assert status == 400
    after = _get(server_url + "/metrics")
    assert after["errors"] == before["errors"]  # client faults not counted


def test_warmup_endpoint(server_url):
    before = _get(server_url + "/metrics")
    status, payload = _post(server_url + "/warmup?width=640&height=512", b"")
    assert status == 200 and payload["compiled_seconds"] > 0
    after = _get(server_url + "/metrics")
    # warmup pre-compiles without polluting the serving counters
    assert after["requests"] == before["requests"]
    assert after["clips"] == before["clips"]
    assert after["busy_seconds"] == before["busy_seconds"]
    assert after["warmups"] == before["warmups"] + 1
    assert after["compiles"] == before["compiles"] + 1
    assert "640x512" in _get(server_url + "/healthz")["geometries"]


def test_unknown_routes(server_url):
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(server_url + "/nope", timeout=30)


def test_service_requires_exactly_one_model():
    with pytest.raises(ValueError):
        InferenceService()


def test_analyzer_cache_is_lru_bounded():
    service = _make_service(max_geometries=1)
    service.warmup(576, 512)
    service.warmup(640, 512)
    assert service.health()["geometries"] == ["640x512"]


def test_concurrent_requests_pipeline(server_url):
    """Concurrent /analyse requests must all succeed and agree with the
    serial result (device dispatch is lock-serialized; readback+stitch
    overlap)."""
    import concurrent.futures

    rng = np.random.default_rng(2)
    slide = rng.integers(0, 255, (700, 900), np.uint8)
    png = _png_bytes(slide)
    _, serial = _post(server_url + "/analyse", png)
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(
            lambda _: _post(server_url + "/analyse", png), range(4)))
    for status, payload in results:
        assert status == 200
        assert payload["detections"] == serial["detections"]


def test_traced_bundle_service(tmp_path):
    """The -m path: a StableHLO bundle served via the host-tiled
    analyzer must agree with the device-fused wrapper path."""
    from scd_resnet_tpu.infer.wrapper import load_traced, save_traced

    model = CenterNetResidual(num_layers=10, dims=TINY, terminal_hidden=16)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    wrapper = make_wrapper(model, variables["params"],
                           variables["batch_stats"])
    path = str(tmp_path / "tiny.pt")
    save_traced(path, wrapper, (4, 512, 512, 1))

    svc_traced = InferenceService(traced=load_traced(path))
    svc_live = InferenceService(wrapper=wrapper)
    assert svc_traced.health()["mode"] == "traced"
    assert svc_traced.warmup(704, 576) == 0.0  # no per-geometry programs

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 255, (576, 704)).astype(np.float32)
    det_traced = svc_traced.analyse_gray(gray)
    det_live = svc_live.analyse_gray(gray)
    assert len(det_traced) == len(det_live)
    for a, b in zip(sorted(det_traced), sorted(det_live)):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_serve_cli_subprocess(tmp_path):
    """serve.py end-to-end as a subprocess: checkpoint load via the
    shared load_wrapper, warmup flag, HTTP serving, clean SIGTERM."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from scd_resnet_tpu.core.checkpoint import save_checkpoint
    from scd_resnet_tpu.train.registry import get_model_profile

    model = get_model_profile("centerOffsetRes10q").build()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
                           train=False)
    ckpt = str(tmp_path / "tiny.pth")
    save_checkpoint(ckpt, variables["params"], variables["batch_stats"],
                    {}, 0)

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    env = dict(os.environ, SCD_JAX_PLATFORM="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    port = 18633
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "serve.py"), "-c", ckpt,
         "-a", "centerOffsetRes10q", "--port", str(port),
         "--warmup", "576x512"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 540
        health = None
        while time.time() < deadline:
            try:
                health = _get("http://127.0.0.1:{}/healthz".format(port))
                break
            except OSError:
                if proc.poll() is not None:
                    raise AssertionError(
                        "serve.py exited early:\n"
                        + proc.stdout.read().decode())
                time.sleep(2)
        assert health is not None and health["status"] == "ok"
        assert "576x512" in health["geometries"]  # --warmup took effect

        rng = np.random.default_rng(0)
        status, payload = _post(
            "http://127.0.0.1:{}/analyse".format(port),
            _png_bytes(rng.integers(0, 255, (512, 576), np.uint8)))
        assert status == 200 and "detections" in payload
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_testpy_pipelined_matches_sequential(tmp_path):
    """test.py --pipelined must produce the same detections as the
    sequential -c path (dispatch-all-then-finish reordering only)."""
    import json
    import os
    import subprocess
    import sys

    from PIL import Image

    from scd_resnet_tpu.core.checkpoint import save_checkpoint
    from scd_resnet_tpu.train.registry import get_model_profile

    model = get_model_profile("centerOffsetRes10q").build()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
                           train=False)
    ckpt = str(tmp_path / "tiny.pth")
    save_checkpoint(ckpt, variables["params"], variables["batch_stats"],
                    {}, 0)

    rng = np.random.default_rng(5)
    slides = []
    for i in range(2):
        path = str(tmp_path / "s{}.png".format(i))
        Image.fromarray(
            rng.integers(0, 255, (512, 576), np.uint8)).save(path)
        slides.append(path)

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    env = dict(os.environ, SCD_JAX_PLATFORM="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))

    def run(extra, out):
        cmd = [sys.executable, os.path.join(repo, "test.py"), *slides,
               "-c", ckpt, "-a", "centerOffsetRes10q", "-o", out] + extra
        proc = subprocess.run(cmd, env=env, capture_output=True, timeout=540)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        return json.load(open(out))

    seq = run([], str(tmp_path / "seq.json"))
    pipe = run(["--pipelined"], str(tmp_path / "pipe.json"))
    key = lambda d: (d["image"], d["x"], d["y"], d["rhr"])
    assert sorted(map(key, seq["detections"])) == \
        sorted(map(key, pipe["detections"]))
