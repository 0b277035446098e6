"""HTTP serving CLI tests: health + synthesis round-trip through a real
socket against the in-process ThreadingHTTPServer."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from unet_rir_tpu import models, train
from unet_rir_tpu.cli import serve as serve_cli


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    folder = tmp_path_factory.mktemp("export")
    model = models.UNet(number_filters_0=2)
    variables = train.init_model(
        model, (jnp.zeros((1, 144, 160, 2), jnp.float32),
                jnp.zeros((1, 2, 16), jnp.int32)))
    models.save_pretrained(str(folder), model, variables)

    args = serve_cli.build_argparser().parse_args([
        "--model-folder", str(folder), "--port", "0",  # ephemeral port
        "--buckets", "2", "4", "--no-warmup",
    ])
    srv, synth = serve_cli.make_server(args)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, synth
    srv.shutdown()
    srv.server_close()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(srv, payload: dict):
    req = urllib.request.Request(
        _url(srv, "/synthesize"), data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    srv, synth = server
    with urllib.request.urlopen(_url(srv, "/health"), timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["buckets"] == [2, 4]
    assert body["grid"] == [144, 160] and body["n_samples"] == 9600


def test_synthesize_roundtrip_matches_library(server, rng):
    srv, synth = server
    spec = rng.uniform(0, 1, (3, 144, 160, 2)).astype(np.float32)
    emb = rng.integers(0, 1500, (3, 2, 16)).astype(np.int32)
    status, body = _post(srv, {
        "spec_in": {"b64": base64.b64encode(spec.tobytes()).decode(),
                    "shape": list(spec.shape)},
        "emb": emb.tolist(),
    })
    assert status == 200, body
    wavs = np.frombuffer(base64.b64decode(body["wavs"]),
                         np.float32).reshape(body["shape"])
    assert wavs.shape == (3, 9600)
    assert body["dispatch_sizes"] == [4]  # 3 samples -> the 4-bucket program
    _, expected = synth.synthesize(spec, emb)
    np.testing.assert_allclose(wavs, expected, atol=1e-6)


def test_synthesize_by_positions(server, rng):
    srv, synth = server
    spec = rng.uniform(0, 1, (1, 144, 160, 2)).astype(np.float32)
    status, body = _post(srv, {
        "spec_in": spec.tolist(),
        "source": [["ShoeBoxRoom", "A", "Planar", 1, 1]],
        "target": [["ShoeBoxRoom", "A", "Planar", 1, 9]],
    })
    assert status == 200, body
    assert body["shape"] == [1, 9600]


def test_bad_request_is_400(server):
    srv, _ = server
    status, body = _post(srv, {"spec_in": [[1.0]]})  # wrong rank, no emb
    assert status == 400
    assert "error" in body


def test_unknown_path_404(server):
    srv, _ = server
    req = urllib.request.Request(_url(srv, "/nope"), data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 404


def test_bf16_flag_overrides_export_dtype(tmp_path, rng):
    """--bf16 serves an f32-trained export with bfloat16 compute (params
    stay f32); outputs stay finite and close to the f32 serve."""
    folder = tmp_path / "export"
    model = models.UNet(number_filters_0=2)
    variables = train.init_model(
        model, (jnp.zeros((1, 144, 160, 2), jnp.float32),
                jnp.zeros((1, 2, 16), jnp.int32)))
    models.save_pretrained(str(folder), model, variables)

    base = ["--model-folder", str(folder), "--port", "0",
            "--buckets", "2", "--no-warmup"]
    srv16, s16 = serve_cli.make_server(
        serve_cli.build_argparser().parse_args(base + ["--bf16"]))
    srv32, s32 = serve_cli.make_server(
        serve_cli.build_argparser().parse_args(base))
    try:
        assert s16.model.dtype == jnp.bfloat16
        assert s32.model.dtype == jnp.float32
        spec = rng.uniform(0, 1, (1, 144, 160, 2)).astype(np.float32)
        emb = np.zeros((1, 2, 16), np.int32)
        _, w16 = s16.synthesize(spec, emb)
        _, w32 = s32.synthesize(spec, emb)
        assert np.isfinite(w16).all()
        scale = np.abs(w32).max()
        assert np.abs(w16 - w32).max() < 0.05 * max(scale, 1e-6)
    finally:
        srv16.server_close()
        srv32.server_close()
