"""Serving daemon: HTTP surface, micro-batching, parity with Grounder."""

import base64
import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder
from zsgnet_tpu.serve import make_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = Config(
        resize_img=(64, 64), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False, bs=2,
    )
    vocab = Vocab.build(["the red box", "a blue ellipse on the left"])
    model = get_default_net(cfg, vocab_size=len(vocab))
    batch = {
        "img": np.zeros((2, 64, 64, 3), np.uint8),
        "qvec": np.ones((2, 8), np.int32),
        "qlens": np.full((2,), 3, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    g = Grounder(cfg, vocab, variables, batch_size=2)

    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(48, 80, 3)).astype(np.uint8)  # non-square
    img_path = tmp_path_factory.mktemp("imgs") / "q.png"
    Image.fromarray(arr).save(img_path)

    srv = make_server(g, port=0, window_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield g, url, img_path
    srv.shutdown()


def _post(url: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        url + "/ground", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    g, url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["ok"] and meta["batch_size"] == 2 and meta["resize_img"] == [64, 64]


def test_path_and_b64_agree_with_grounder(server):
    g, url, img_path = server
    code, via_path = _post(url, {"query": "the red box", "image_path": str(img_path)})
    assert code == 200
    code, via_b64 = _post(url, {
        "query": "the red box",
        "image_b64": base64.b64encode(img_path.read_bytes()).decode(),
    })
    assert code == 200
    (direct,) = g.ground([img_path], ["the red box"])
    # Path-served, bytes-served, and direct all decode identically and
    # report original-pixel (48×80) coordinates.
    np.testing.assert_allclose(via_path["box_xyxy"], direct["box_xyxy"], atol=1e-4)
    np.testing.assert_allclose(via_b64["box_xyxy"], direct["box_xyxy"], atol=1e-4)
    assert abs(via_path["score"] - direct["score"]) < 1e-6


def test_batched_form_and_errors(server):
    g, url, img_path = server
    code, out = _post(url, {"requests": [
        {"query": "the red box", "image_path": str(img_path)},
        {"query": "a blue ellipse", "image_path": str(img_path)},
    ]})
    assert code == 200 and len(out["results"]) == 2
    code, out = _post(url, {"image_path": str(img_path)})
    assert code == 400 and "query" in out["error"]
    code, out = _post(url, {"query": "x", "image_path": "/nonexistent.png"})
    assert code == 400 and "no such image" in out["error"]


def test_multiquery_form(server):
    """'queries' form: one image × N phrases → one shared-backbone pass;
    results equal N independent single-query requests."""
    g, url, img_path = server
    queries = ["the red box", "a blue ellipse", "the left thing"]
    code, out = _post(url, {"queries": queries, "image_path": str(img_path)})
    assert code == 200 and len(out["results"]) == 3
    direct = g.ground([img_path] * 3, queries)
    for served, d in zip(out["results"], direct):
        np.testing.assert_allclose(served["box_xyxy"], d["box_xyxy"], atol=1e-4)
        assert abs(served["score"] - d["score"]) < 1e-6
    # b64 body ships ONE image; original-pixel coordinates still restore.
    code, via_b64 = _post(url, {
        "queries": queries,
        "image_b64": base64.b64encode(img_path.read_bytes()).decode(),
    })
    assert code == 200
    for served, d in zip(via_b64["results"], direct):
        np.testing.assert_allclose(served["box_xyxy"], d["box_xyxy"], atol=1e-4)
    # Contract errors: empty list, and 'queries' nested under 'requests'.
    code, out = _post(url, {"queries": [], "image_path": str(img_path)})
    assert code == 400 and "queries" in out["error"]
    code, out = _post(url, {"requests": [
        {"queries": queries, "image_path": str(img_path)}
    ]})
    assert code == 400 and "top-level" in out["error"]


def test_serve_from_exported_artifact(server, tmp_path):
    """load_server_model auto-detects an export.json dir and serves the
    StableHLO artifact with results equal to the live-checkpoint daemon."""
    from zsgnet_tpu.export import export_serving
    from zsgnet_tpu.serve import load_server_model, make_server

    g, url, img_path = server
    art = export_serving(g, tmp_path / "art", platforms=("cpu",))
    model = load_server_model(art)
    srv = make_server(model, port=0, window_ms=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        art_url = f"http://127.0.0.1:{srv.server_address[1]}"
        code, via_art = _post(art_url, {"query": "the red box",
                                        "image_path": str(img_path)})
        assert code == 200
        (direct,) = g.ground([img_path], ["the red box"])
        np.testing.assert_allclose(via_art["box_xyxy"], direct["box_xyxy"], atol=1e-4)
        assert abs(via_art["score"] - direct["score"]) < 1e-6
    finally:
        srv.shutdown()


def test_warmup_compiles_buckets(server):
    g, url, img_path = server
    g.warmup()  # compiles (1, 2); must not change later results
    (res,) = g.ground([str(img_path)], ["the red box"])
    assert np.isfinite(res["score"])
    # Uncalibrated int8 must NOT calibrate on warmup zeros.
    gq = Grounder(
        g.cfg.replace(head_canvas=False), g.vocab, dict(g.variables),
        batch_size=32, quantize=True,
    )
    gq.warmup()
    assert "quant" not in gq.variables


def test_body_size_cap(server):
    """Oversized POST bodies get 413 before any read/parse work."""
    g, url, img_path = server
    srv = make_server(g, port=0, window_ms=5.0, max_body_mb=0.0001)  # 100 B
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        small_url = f"http://127.0.0.1:{srv.server_address[1]}"
        code, out = _post(small_url, {
            "query": "the red box", "image_path": str(img_path), "pad": "x" * 200,
        })
        assert code == 413 and "exceeds limit" in out["error"]
    finally:
        srv.shutdown()


def test_batch_predict_csv_to_jsonl(server, tmp_path):
    """Bulk mode: dataset-format CSV in, JSONL predictions out, rows equal
    to direct ground() calls; extra bbox columns are ignored."""
    from zsgnet_tpu.predict import batch_predict

    g, url, img_path = server
    csv = tmp_path / "split.csv"
    csv.write_text(
        "img_id,query,bbox\n"
        f"{img_path.name},the red box,\"[0,0,1,1]\"\n"
        f"{img_path.name},a blue ellipse,\"[0,0,1,1]\"\n"
        f"{img_path.name},box on the left,\"[0,0,1,1]\"\n"
    )
    out = tmp_path / "preds.jsonl"
    n = batch_predict(g, csv, img_path.parent, out)
    lines = [json.loads(line) for line in out.read_text().splitlines()]
    assert n == 3 and len(lines) == 3
    assert lines[1]["query"] == "a blue ellipse"
    (direct,) = g.ground([img_path], ["the red box"])
    np.testing.assert_allclose(lines[0]["box_xyxy"], direct["box_xyxy"], atol=1e-4)
    assert abs(lines[0]["score"] - direct["score"]) < 1e-6

    bad = tmp_path / "bad.csv"
    bad.write_text("image,text\nx.png,hi\n")
    with pytest.raises(ValueError, match="missing columns"):
        batch_predict(g, bad, img_path.parent, tmp_path / "x.jsonl")


def test_statz_counters(server):
    g, url, img_path = server
    code, _ = _post(url, {"query": "the red box", "image_path": str(img_path)})
    assert code == 200
    with urllib.request.urlopen(url + "/statz", timeout=30) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 1 and s["batches"] >= 1
    assert 0 < s["mean_batch_fill"] <= g.bs
    assert s["latency"]["p50_ms"] > 0 and s["latency"]["p95_ms"] >= s["latency"]["p50_ms"]
    assert s["uptime_s"] > 0 and s["batch_size"] == g.bs


def test_shape_bucketing_matches_full_batch(server):
    """A partially-filled chunk padded to a small bucket must ground
    identically to the same request padded to the full batch (eval-mode
    BatchNorm uses running stats, so batch size cannot change results)."""
    g, url, img_path = server
    assert g.bucket_sizes == (1, 2)
    single_shape = Grounder(
        g.cfg, g.vocab, g.variables, batch_size=2, bucket_sizes=(2,)
    )
    assert single_shape.bucket_sizes == (2,)
    (bucketed,) = g.ground([str(img_path)], ["the red box"])
    (padded,) = single_shape.ground([str(img_path)], ["the red box"])
    np.testing.assert_allclose(
        bucketed["box_xyxy"], padded["box_xyxy"], atol=1e-3
    )
    assert abs(bucketed["score"] - padded["score"]) < 1e-5


def test_per_bucket_head_selection_is_exact(server):
    """A throughput Grounder (bs>16, per-level head) serves small buckets
    through the canvas head — an exact reparam of the same params, so the
    routed result must match the per-level head padded to the full batch."""
    g, url, img_path = server
    base_cfg = g.cfg.replace(head_canvas=False)
    routed = Grounder(base_cfg, g.vocab, g.variables, batch_size=32)
    assert routed._infer_latency is not None
    assert routed.cfg.head_canvas is False  # big buckets stay per-level
    single_shape = Grounder(
        base_cfg, g.vocab, g.variables, batch_size=32, bucket_sizes=(32,)
    )
    assert single_shape._infer_latency is None
    (via_canvas,) = routed.ground([str(img_path)], ["the red box"])
    (via_levels,) = single_shape.ground([str(img_path)], ["the red box"])
    np.testing.assert_allclose(
        via_canvas["box_xyxy"], via_levels["box_xyxy"], atol=1e-3
    )
    assert abs(via_canvas["score"] - via_levels["score"]) < 1e-4


def test_data_parallel_grounding_matches_single_device(server):
    """Grounder(mesh=…) shards batches over the 8-device CPU mesh with
    replicated weights; results must equal single-device serving, and the
    default buckets must stay mesh-divisible."""
    from zsgnet_tpu.parallel.mesh import make_mesh

    g, url, img_path = server
    mesh = make_mesh(g.cfg, jax.devices())
    assert mesh.size == 8
    dp = Grounder(g.cfg, g.vocab, g.variables, batch_size=16, mesh=mesh)
    assert dp.bucket_sizes == (8, 16)  # multiples of the mesh size only
    imgs, queries = [str(img_path)] * 3, ["the red box", "a blue ellipse", "box"]
    res_dp = dp.ground(imgs, queries)  # 3 requests pad to the 8-bucket
    res_1 = g.ground(imgs, queries)
    for a, b in zip(res_dp, res_1):
        np.testing.assert_allclose(a["box_xyxy"], b["box_xyxy"], atol=1e-3)
        assert abs(a["score"] - b["score"]) < 1e-4

    with pytest.raises(ValueError, match="divide over"):
        Grounder(g.cfg, g.vocab, g.variables, batch_size=4, mesh=mesh)
    with pytest.raises(ValueError, match="divide over"):
        Grounder(
            g.cfg, g.vocab, g.variables, batch_size=16, mesh=mesh,
            bucket_sizes=(2, 16),
        )


def test_spatial_serving_matches_single_device(server):
    """Grounder on the 2-D (data=2, spatial=4) mesh — the image HEIGHT is
    GSPMD-sharded, the batch-1 latency-scaling case data parallelism
    cannot touch. Forward-only, so safe for the retina backbone (the
    jax-0.9 partitioner bugs are grad-only — tools/check_spatial_gspmd.py);
    results must equal single-device serving, and buckets divide over the
    DATA axis only (not mesh.size)."""
    from zsgnet_tpu.parallel.mesh import make_mesh

    g, url, img_path = server
    cfg_sp = g.cfg.replace(do_dist=True, mesh_spatial=4)
    mesh = make_mesh(cfg_sp, jax.devices())
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    sp = Grounder(cfg_sp, g.vocab, g.variables, batch_size=2, mesh=mesh)
    assert sp.bucket_sizes == (2,)  # divisibility over data=2, not 8
    imgs = [str(img_path)] * 3
    queries = ["the red box", "a blue ellipse", "box"]
    res_sp = sp.ground(imgs, queries)
    res_1 = g.ground(imgs, queries)
    for a, b in zip(res_sp, res_1):
        np.testing.assert_allclose(a["box_xyxy"], b["box_xyxy"], atol=1e-3)
        assert abs(a["score"] - b["score"]) < 1e-4


@pytest.mark.slow  # Slow tier (r5 gate re-tier): int8 fast coverage stays via
    # test_grounder_quantize_flow + the grouped int8 equality test; DP
    # fast coverage via the fp DP-grounding and DP-artifact tests.
def test_int8_data_parallel_matches_single_device(server):
    """int8 throughput serving × data-parallel mesh: both Grounders
    calibrate on the SAME first batch (calibration is unsharded), so the
    activation scales are identical; the sharded int8 forward must then
    agree with single-device int8. int8 cannot be bit-equal across
    different compilations (one-LSB round(x/scale) flips at random init
    — see test_export's int8 roundtrip), so assertions are score-close +
    IoU-majority, the repo's int8 convention."""
    from zsgnet_tpu.parallel.mesh import make_mesh

    g, url, img_path = server
    cfg = g.cfg.replace(head_canvas=False)
    mesh = make_mesh(cfg, jax.devices())
    q1 = Grounder(cfg, g.vocab, dict(g.variables), batch_size=32,
                  quantize=True, bucket_sizes=(32,))
    qd = Grounder(cfg, g.vocab, dict(g.variables), batch_size=32,
                  quantize=True, bucket_sizes=(32,), mesh=mesh)
    assert q1.quantize and qd.quantize
    imgs = [str(img_path)] * 3
    queries = ["the red box", "a blue ellipse", "box on the left"]
    r1 = q1.ground(imgs, queries)
    rd = qd.ground(imgs, queries)
    assert "quant" in q1.variables and "quant" in qd.variables
    ious = []
    for a, b in zip(r1, rd):
        assert abs(a["score"] - b["score"]) < 5e-3
        ay1, ax1, ay2, ax2 = a["box_norm"]
        by1, bx1, by2, bx2 = b["box_norm"]
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        inter = ih * iw
        union = (ay2 - ay1) * (ax2 - ax1) + (by2 - by1) * (bx2 - bx1) - inter
        ious.append(inter / union if union > 0 else 0.0)
    assert np.mean([i > 0.8 for i in ious]) >= 0.66, f"int8 DP diverged: {ious}"


def test_data_parallel_artifact_serving_matches_single_device(server, tmp_path):
    """Multi-chip ARTIFACT serving (VERDICT r4 weak #4): a v3 artifact
    loaded with data_parallel=True round-robins device batches across
    all 8 CPU devices — results must equal single-device artifact
    serving, and the dispatch must actually spread over devices. The
    shared weights.npz is placed once per device (v3); mq modules ride
    the same round-robin."""
    import jax as _jax

    from zsgnet_tpu.export import ExportedGrounder, export_serving
    from zsgnet_tpu.serve import load_server_model

    g, url, img_path = server
    art = export_serving(g, tmp_path / "art_dp", platforms=("cpu",),
                         weights_as_args=True, multiquery=True)
    single = ExportedGrounder.load(art)
    dp = load_server_model(art, data_parallel=True)
    assert dp._devices is not None and len(dp._devices) == len(_jax.local_devices())

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8) for _ in range(10)]
    queries = ["the red box" if i % 2 else "a blue ellipse on the left"
               for i in range(10)]
    want = single.ground(imgs, queries)
    got = dp.ground(imgs, queries)  # 5 chunks at bs=2 → 5 devices
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-5)
        assert abs(a["score"] - b["score"]) < 1e-6
    assert len(dp.dispatch_counts) >= 2, dp.dispatch_counts

    # Shared-backbone multiquery modules round-robin too.
    mq_want = single.ground_image(imgs[0], queries[:2])
    mq_got = dp.ground_image(imgs[0], queries[:2])
    for a, b in zip(mq_got, mq_want):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-5)

    # Single-sample sharding stays checkpoint-only.
    with pytest.raises(ValueError, match="mesh_spatial"):
        load_server_model(art, cfg_overrides={"mesh_spatial": 2})


@pytest.mark.slow
def test_daemon_lifecycle_sigterm(server, tmp_path):
    """The REAL daemon process end-to-end: `python -m zsgnet_tpu.serve
    <ckpt_dir>` boots from a self-contained checkpoint dir, warms its
    buckets, answers a request, then exits CLEANLY on SIGTERM (what a
    process manager sends) — the handler must shutdown() from another
    thread (in-handler it deadlocks serve_forever; serve.py:main)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from zsgnet_tpu.train.checkpoint import CheckpointManager

    g, url, img_path = server
    d = tmp_path / "ckpt"
    m = CheckpointManager(d)
    payload = {"params": g.variables["params"]}
    if g.variables.get("batch_stats"):
        payload["batch_stats"] = g.variables["batch_stats"]
    m.save(0, payload)
    m.wait()
    (d / "cfg.json").write_text(g.cfg.replace(vocab_size=len(g.vocab)).dumps())
    g.vocab.save(d / "vocab.json")

    proc = subprocess.Popen(
        [sys.executable, "-m", "zsgnet_tpu.serve", str(d), "--port=0",
         "--batch_size=2", "--window_ms=5", "--platform=cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        # Read stdout on a thread: a wedged daemon that stops printing
        # would otherwise block readline() forever — the deadline must
        # hold even with zero output (the exact hang class this repo's
        # backend watchdogs exist for).
        import queue

        lines_q: "queue.Queue[str]" = queue.Queue()
        reader = threading.Thread(
            target=lambda: [lines_q.put(ln) for ln in proc.stdout],
            daemon=True,
        )
        reader.start()
        port, lines = None, []
        deadline = time.time() + 420  # cold compile of both buckets
        while time.time() < deadline:
            try:
                line = lines_q.get(timeout=5)
            except queue.Empty:
                if proc.poll() is not None:
                    break
                continue
            lines.append(line)
            if line.startswith("serving "):
                port = int(line.split(":")[-1].split()[0].strip("/"))
                break
        assert port, f"daemon never came up:\n{''.join(lines)}"
        code, res = _post(f"http://127.0.0.1:{port}",
                          {"query": "the red box", "image_path": str(img_path)})
        assert code == 200 and 0 <= res["score"] <= 1
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
        reader.join(timeout=10)  # pipe closes at exit; drain the tail
        while not lines_q.empty():
            lines.append(lines_q.get())
        rest = "".join(lines)
        assert proc.returncode == 0, f"exit {proc.returncode}:\n{rest}"
        assert "daemon stopped" in rest
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_daemon_sigterm_drains_inflight_request(server, tmp_path):
    """A request already ACCEPTED when SIGTERM lands must still get its
    response (daemon_threads=False + server_close join): post with a
    3-second micro-batch window, SIGTERM mid-window, and assert the 200
    arrives and the process still exits 0."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from zsgnet_tpu.train.checkpoint import CheckpointManager

    g, url, img_path = server
    d = tmp_path / "ckpt"
    m = CheckpointManager(d)
    payload = {"params": g.variables["params"]}
    if g.variables.get("batch_stats"):
        payload["batch_stats"] = g.variables["batch_stats"]
    m.save(0, payload)
    m.wait()
    (d / "cfg.json").write_text(g.cfg.replace(vocab_size=len(g.vocab)).dumps())
    g.vocab.save(d / "vocab.json")

    proc = subprocess.Popen(
        [sys.executable, "-m", "zsgnet_tpu.serve", str(d), "--port=0",
         "--batch_size=2", "--window_ms=3000", "--platform=cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        import queue

        lines_q: "queue.Queue[str]" = queue.Queue()
        reader = threading.Thread(
            target=lambda: [lines_q.put(ln) for ln in proc.stdout],
            daemon=True,
        )
        reader.start()
        port, lines = None, []
        deadline = time.time() + 420
        while time.time() < deadline:
            try:
                line = lines_q.get(timeout=5)
            except queue.Empty:
                if proc.poll() is not None:
                    break
                continue
            lines.append(line)
            if line.startswith("serving "):
                port = int(line.split(":")[-1].split()[0].strip("/"))
                break
        assert port, f"daemon never came up:\n{''.join(lines)}"

        result: dict = {}

        def post():
            result["resp"] = _post(
                f"http://127.0.0.1:{port}",
                {"query": "the red box", "image_path": str(img_path)},
            )

        t = threading.Thread(target=post)
        t.start()
        time.sleep(1.0)  # request now sits in the 3s micro-batch window
        proc.send_signal(signal.SIGTERM)
        t.join(timeout=120)
        assert not t.is_alive(), "in-flight request never answered"
        code, res = result["resp"]
        assert code == 200 and 0 <= res["score"] <= 1, result
        proc.wait(timeout=60)
        reader.join(timeout=10)
        while not lines_q.empty():
            lines.append(lines_q.get())
        assert proc.returncode == 0, f"exit {proc.returncode}:\n{''.join(lines)}"
        assert "daemon stopped" in "".join(lines)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_concurrent_requests_coalesce_correctly(server):
    g, url, img_path = server
    (direct,) = g.ground([img_path], ["the red box"])
    results = [None] * 4
    errs = []

    def hit(i):
        try:
            code, res = _post(url, {"query": "the red box",
                                    "image_path": str(img_path)})
            assert code == 200
            results[i] = res
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs and all(r is not None for r in results)
    for r in results:
        np.testing.assert_allclose(r["box_xyxy"], direct["box_xyxy"], atol=1e-4)


def test_overload_sheds_fast_with_503(tmp_path):
    """Backpressure (VERDICT r3 weak #2): with the device stalled and the
    admission queue full, further requests get an IMMEDIATE 503 +
    Retry-After instead of queuing behind the 900 s wait; /statz exposes
    queue_depth/max_queue/shed; draining restores admission."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from zsgnet_tpu.config import Config

    class SlowGrounder:
        """Device stand-in whose ground() blocks until released."""

        bs = 1
        bucket_sizes = (1,)
        cfg = Config(resize_img=(32, 32))

        def __init__(self):
            self.release = threading.Event()
            self.entered = threading.Event()

        def ground(self, images, queries):
            self.entered.set()
            assert self.release.wait(30)
            return [
                {"box_norm": [0, 0, 0, 0], "box_xyxy": [0, 0, 0, 0], "score": 0.5}
                for _ in queries
            ]

    g = SlowGrounder()
    srv = make_server(g, port=0, window_ms=1.0, max_queue=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    img_path = tmp_path / "i.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    payload = {"query": "x", "image_path": str(img_path)}
    try:
        with ThreadPoolExecutor(4) as pool:
            f1 = pool.submit(_post, url, payload)   # admitted, stalls in ground()
            assert g.entered.wait(10)
            f2 = pool.submit(_post, url, payload)   # admitted, queued (depth 2/2)
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline:      # wait for f2's admission
                with urllib.request.urlopen(url + "/statz", timeout=10) as r:
                    stats = json.loads(r.read())
                if stats["queue_depth"] >= 2:
                    break
                time.sleep(0.05)
            assert stats["queue_depth"] == 2 and stats["max_queue"] == 2

            t0 = time.monotonic()                   # full → immediate 503
            req = urllib.request.Request(
                url + "/ground", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=30):
                    raise AssertionError("expected 503")
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert e.headers["Retry-After"] == "1"
                body = json.loads(e.read())
                assert "queue full" in body["error"]
            assert time.monotonic() - t0 < 5.0      # shed, not parked

            g.release.set()                         # drain → both succeed
            assert f1.result()[0] == 200 and f2.result()[0] == 200
        with urllib.request.urlopen(url + "/statz", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["shed"] >= 1 and stats["queue_depth"] == 0
        code, _ = _post(url, payload)               # admission restored
        assert code == 200
    finally:
        g.release.set()
        srv.shutdown()


@pytest.mark.slow
def test_daemon_soak_mixed_requests(tmp_path):
    """Daemon soak (VERDICT r4 next #8): ~10^5 pairs of mixed traffic —
    single, batched, and multiquery forms, with periodic bursts sized to
    trigger shedding — against a live in-process daemon on a real (tiny)
    model. Asserts: every client gets a terminal answer (200 or 503 —
    zero stuck clients), /statz stays coherent (served + shed accounts
    for everything, queue drains), and host RSS growth over the run
    stays bounded (no per-request leak).

    Pair count target: ZSGNET_SOAK_PAIRS (default 100_000). Requests are
    mostly batched (8 pairs) so the device, not HTTP framing, is the
    bottleneck — the shape production traffic has."""
    import base64
    import io
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    cfg = Config(
        resize_img=(32, 32), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False, bs=8,
    )
    vocab = Vocab.build(["the red box", "a blue ellipse on the left"])
    model = get_default_net(cfg, vocab_size=len(vocab))
    init_b = {
        "img": np.zeros((2, 32, 32, 3), np.uint8),
        "qvec": np.ones((2, 8), np.int32),
        "qlens": np.full((2,), 3, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), init_b
    )
    g = Grounder(cfg, vocab, variables, batch_size=8, bucket_sizes=(1, 8))
    g.warmup(multiquery=True)
    # max_queue sized so the 16-thread steady load (≤ 16 × 8 pairs)
    # never sheds, while the 64-thread burst rounds (~384 pairs offered)
    # must — the soak exercises BOTH regimes deliberately.
    srv = make_server(g, port=0, window_ms=2.0, max_queue=128)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    rng = np.random.default_rng(0)
    img_path = tmp_path / "s.png"
    arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    Image.fromarray(arr).save(img_path)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    single = {"query": "the red box", "image_path": str(img_path)}
    batched = {"requests": [
        {"query": "a blue ellipse on the left", "image_path": str(img_path)}
    ] * 8}
    mq = {"queries": ["the red box"] * 8, "image_b64": b64}
    forms = [(single, 1), (batched, 8), (mq, 8)]

    def rss_mb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    target = int(os.environ.get("ZSGNET_SOAK_PAIRS", 100_000))
    counts = {"ok": 0, "shed": 0, "pairs": 0}
    lock = threading.Lock()

    def fire(i: int) -> None:
        payload, pairs = forms[i % len(forms)]
        status, body = _post(url, payload)
        assert status in (200, 503), f"unexpected status {status}: {body}"
        with lock:
            if status == 200:
                counts["ok"] += 1
                counts["pairs"] += pairs
            else:
                counts["shed"] += 1

    # Warm the steady state, then measure RSS growth over the soak only
    # (first-touch allocations — executables, thread stacks — land early).
    with ThreadPoolExecutor(16) as pool, ThreadPoolExecutor(64) as burst_pool:
        list(pool.map(fire, range(200)))
        rss_before = rss_mb()
        t0 = time.monotonic()
        i, round_no = 200, 0
        while counts["pairs"] < target:
            if round_no % 10 == 9:
                # Burst round: 64 concurrent clients offer ~384 pairs at
                # once against the 128-pair queue — must shed, and every
                # shed client still gets its immediate 503.
                list(burst_pool.map(fire, range(i, i + 128)))
                i += 128
            else:
                # Steady round: 16-way concurrency stays under the cap.
                list(pool.map(fire, range(i, i + 64)))
                i += 64
            round_no += 1
        dt = time.monotonic() - t0
        rss_after = rss_mb()

    n_req = counts["ok"] + counts["shed"]
    assert counts["pairs"] >= target
    assert counts["ok"] > 0.5 * n_req, f"mostly shed: {counts}"
    assert counts["shed"] > 0, "burst rounds never tripped the queue bound"
    # Bounded memory: steady-state growth under 256 MB across the soak
    # (observed leak-free runs sit far below; a per-request leak of even
    # 1 KB would exceed this at 10^5 requests... within a 2.5 KB margin).
    assert rss_after - rss_before < 256, (rss_before, rss_after)

    with urllib.request.urlopen(url + "/statz", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["queue_depth"] == 0, stats  # drained
    assert stats["shed"] + stats["requests"] >= n_req - 16  # coherent tallies
    srv.shutdown()
    print(f"soak: {n_req} requests / {counts['pairs']} pairs in {dt:.1f}s "
          f"({counts['pairs']/dt:.0f} pairs/s), shed={counts['shed']}, "
          f"RSS {rss_before:.0f}->{rss_after:.0f} MB")


def test_oversized_request_admitted_on_empty_queue(tmp_path):
    """r5 regression (found live on the chip drive): a multiquery
    request carrying more pairs than --max_queue must be admitted when
    the queue is EMPTY — the old admission rejected it with a 'retry
    later' 503 that no retry could ever satisfy. Backpressure stays: at
    most one oversized request rides above the cap, and only from
    depth 0."""
    from zsgnet_tpu.serve import MicroBatcher, ServerOverloadedError

    class EchoGrounder:
        bs = 8
        bucket_sizes = (1, 8)
        cfg = Config(resize_img=(32, 32))

        def ground_image(self, image, queries):
            return [
                {"box_norm": [0, 0, 1, 1], "box_xyxy": [0, 0, 1, 1], "score": 0.5}
                for _ in queries
            ]

        def ground(self, images, queries):
            return self.ground_image(None, queries)

    b = MicroBatcher(EchoGrounder(), window_ms=1.0, max_queue=4)
    img = np.zeros((32, 32, 3), np.uint8)
    # Q=5 > max_queue=4: must be admitted from empty and complete.
    item = b.submit_multi_async(img, ["q"] * 5)
    res = b.wait(item)
    assert len(res) == 5
    # ...but NOT while anything is in flight: hold depth > 0 and retry.
    with b._stats_lock:
        b._depth += 1  # simulate one pair in flight
    with pytest.raises(ServerOverloadedError):
        b.submit_multi_async(img, ["q"] * 5)
    with b._stats_lock:
        b._depth -= 1


def test_batch_predict_grouped_matches_flat(server, tmp_path):
    """Bulk grouped mode (r5): multi-phrase images route through ONE
    ground_image backbone pass, single-phrase rows batch flat — output
    rows must equal the all-flat path in CSV order."""
    from PIL import Image

    from zsgnet_tpu.predict import batch_predict

    g, url, img_path = server
    rng = np.random.default_rng(3)
    img2 = tmp_path / "b.png"
    Image.fromarray(rng.integers(0, 255, (40, 64, 3)).astype(np.uint8)).save(img2)
    csv = tmp_path / "mix.csv"
    csv.write_text(
        "img_id,query\n"
        f"{img_path.name},the red box\n"
        f"{img2.name},a blue ellipse\n"          # single-phrase image
        f"{img_path.name},a blue ellipse\n"      # interleaved group
        f"{img_path.name},box on the left\n"
    )
    import shutil

    shutil.copy(img_path, tmp_path / img_path.name)
    out_g = tmp_path / "g.jsonl"
    out_f = tmp_path / "f.jsonl"
    assert batch_predict(g, csv, tmp_path, out_g, grouped=True) == 4
    assert batch_predict(g, csv, tmp_path, out_f, grouped=False) == 4
    got = [json.loads(x) for x in out_g.read_text().splitlines()]
    want = [json.loads(x) for x in out_f.read_text().splitlines()]
    for a, b in zip(got, want):
        assert a["img_id"] == b["img_id"] and a["query"] == b["query"]
        np.testing.assert_allclose(a["box_xyxy"], b["box_xyxy"], atol=1e-3)
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-4)
        assert abs(a["score"] - b["score"]) < 1e-5
