"""Streaming inference tests: ring buffer semantics + end-to-end
recognition for dense and SGN models."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.infer import ActionRecognition, StreamBuffer, filter_logits
from agcn_tpu.models import AGCN, SGN


def test_stream_buffer_append_and_shift():
    buf = StreamBuffer(num_joint=5, max_seq_length=4, max_person=3)
    for i in range(6):
        frame = np.full((2, 1, 5, 3), i + 1, dtype=np.float32)
        buf.append(frame)
    # after overflow, buffer holds the last 4 frames (3, 4, 5, 6)
    assert buf.data[0, 0, 0, 0] == 3.0
    assert buf.data[0, -1, 0, 0] == 6.0
    # person 2 never fed -> zero
    assert buf.data[2].sum() == 0.0


def test_stream_buffer_moving_avg():
    buf = StreamBuffer(num_joint=2, max_seq_length=8, max_person=1,
                       moving_avg=2)
    buf.append(np.full((1, 1, 2, 3), 1.0, dtype=np.float32))
    buf.append(np.full((1, 1, 2, 3), 3.0, dtype=np.float32))
    assert buf.data[0, 1, 0, 0] == 2.0  # smoothed


def test_filter_logits():
    logits = np.array([1.0, 5.0, 3.0])
    out = filter_logits(logits, [0, 2])
    assert out.argmax() == 2


def test_dense_recognizer_end_to_end():
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=7, adj=adj)
    x0 = np.zeros((1, 3, 32, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    rec = ActionRecognition(model, variables, kind="dense",
                            max_seq_length=32)
    rng = np.random.default_rng(0)
    for _ in range(10):
        rec.append_frame(rng.standard_normal((2, 1, 25, 3)).astype(
            np.float32))
    label, probs = rec.predict()
    assert 0 <= label < 7
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)


def test_sgn_recognizer_multi_crop():
    model = SGN(num_class=5, num_segment=20)
    x0 = np.zeros((1, 20, 75), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    rec = ActionRecognition(model, variables, kind="sgn", multi_test=3,
                            max_seq_length=64, normalize=False,
                            sgn_dataloader_args={"seg": 20})
    rng = np.random.default_rng(0)
    for _ in range(30):
        rec.append_frame(rng.standard_normal((2, 1, 25, 3)).astype(
            np.float32))
    label, probs = rec.predict()
    assert 0 <= label < 5
    assert rec.last_latency_ms > 0


def test_sgn_recognizer_exposes_attention(tmp_path):
    model = SGN(num_class=5, num_segment=20)
    x0 = np.zeros((1, 20, 75), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    rec = ActionRecognition(model, variables, kind="sgn",
                            max_seq_length=64, normalize=False,
                            sgn_dataloader_args={"seg": 20})
    rng = np.random.default_rng(0)
    for _ in range(25):
        rec.append_frame(rng.standard_normal((2, 1, 25, 3)).astype(
            np.float32))
    rec.predict()
    assert rec.last_attention is not None
    assert rec.last_attention[0].shape[-2:] == (25, 25)

    from agcn_tpu.utils.visualization import plot_attention

    out = tmp_path / "g.png"
    plot_attention(rec.last_attention[0][0], save_path=str(out))
    assert out.exists()


def test_live_demo_surface(tmp_path):
    """Dated live-demo capabilities (reference inference_220802.py):
    weight auto-discovery, directory streaming, G attention exposure."""
    import jax
    import numpy as np

    import infer as infer_cli
    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.infer import ActionRecognition
    from agcn_tpu.models import AGCN

    # discovery: newest checkpoint-style dir wins
    (tmp_path / "ck" / "epoch_1").mkdir(parents=True)
    (tmp_path / "ck" / "epoch_2").mkdir()
    os.utime(tmp_path / "ck" / "epoch_1", (1, 1))
    assert infer_cli.discover_weights(str(tmp_path / "ck")).endswith(
        "epoch_2")

    # directory streaming yields files in mtime order
    d = tmp_path / "stream"
    d.mkdir()
    np.save(d / "a.npy", np.zeros((1, 3, 4, 25, 2), np.float32))
    np.save(d / "b.npy", np.zeros((1, 3, 4, 25, 2), np.float32))
    os.utime(d / "b.npy", (2, 2))
    os.utime(d / "a.npy", (5, 5))
    got = [os.path.basename(p) for p in
           infer_cli.iter_stream_files(str(d), follow=False)]
    assert got == ["b.npy", "a.npy"]

    # attention exposure through the recognizer (sown intermediates)
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=4, adj=adj)
    x = np.zeros((2, 3, 8, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    rec = ActionRecognition(model, variables, kind="dense",
                            max_seq_length=8, expose_attention=True)
    for t in range(8):
        rec.append_frame(np.zeros((2, 1, 25, 3), np.float32))
    rec.predict()
    assert rec.last_attention and len(rec.last_attention) == 10
    assert rec.last_attention[0].shape == (3, 25, 25)


def test_serve_mode_cli(tmp_path, capsys):
    """infer.py --serve: a directory of recordings served as concurrent
    streams by one batched forward per tick."""
    import numpy as np
    import yaml

    import infer as infer_cli
    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.train.checkpoint import save_checkpoint

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=4, adj=adj)
    x = np.zeros((1, 3, 16, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    ckpt = tmp_path / "epoch_1.npz"
    save_checkpoint(str(ckpt), {"params": variables["params"],
                                "batch_stats": variables["batch_stats"]})
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        model="agcn", model_args=dict(num_class=4, graph="ntu_rgb_d"))))
    d = tmp_path / "streams"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(d / f"cam{i}.npy",
                rng.standard_normal((1, 3, 12, 25, 2)).astype(np.float32))
    infer_cli.main(["--config", str(cfg), "--weights", str(ckpt),
                    "--input", str(d), "--serve", "3", "--interval", "6",
                    "--max-frame", "16", "--timing"])
    out = capsys.readouterr().out
    assert "[cam0] frame 6" in out and "[cam1] frame 6" in out
    assert "2 streams in" in out


@pytest.mark.slow
def test_serve_mode_live_arrival_and_slot_reuse(tmp_path, capsys):
    """--serve with --follow: recordings that appear mid-run attach into
    freed slots (live multi-camera arrival); with more files than slots,
    the backlog drains as streams end."""
    import threading
    import time

    import numpy as np
    import yaml

    import infer as infer_cli
    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.train.checkpoint import save_checkpoint

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=4, adj=adj)
    x = np.zeros((1, 3, 16, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    ckpt = tmp_path / "epoch_1.npz"
    save_checkpoint(str(ckpt), {"params": variables["params"],
                                "batch_stats": variables["batch_stats"]})
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        model="agcn", model_args=dict(num_class=4, graph="ntu_rgb_d"))))
    d = tmp_path / "streams"
    d.mkdir()
    rng = np.random.default_rng(0)

    def rec(name):
        np.save(d / name,
                rng.standard_normal((1, 3, 12, 25, 2)).astype(np.float32))

    rec("cam0.npy")
    rec("cam1.npy")
    rec("cam2.npy")  # backlog: only 2 slots

    def late_arrival():
        time.sleep(3.0)
        rec("cam3.npy")

    t = threading.Thread(target=late_arrival)
    t.start()
    infer_cli.main(["--config", str(cfg), "--weights", str(ckpt),
                    "--input", str(d), "--serve", "2", "--interval", "6",
                    "--max-frame", "16", "--follow", "--max-idle", "6"])
    t.join()
    out = capsys.readouterr().out
    for cam in ("cam0", "cam1", "cam2", "cam3"):
        assert f"++ stream [{cam}]" in out
        assert f"[{cam}] frame" in out  # every stream got predictions
    assert "-- stream [cam0] ended" in out


def test_serve_pipeline_cli_flushes_final_tick(tmp_path, capsys):
    """--serve --pipeline: the final in-flight tick is drained when the
    streams end (NOT at loop exit — with --follow the loop keeps
    polling), so every stream's last prediction is emitted."""
    import numpy as np
    import yaml

    import infer as infer_cli
    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.train.checkpoint import save_checkpoint

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=4, adj=adj)
    x = np.zeros((1, 3, 16, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    ckpt = tmp_path / "epoch_1.npz"
    save_checkpoint(str(ckpt), {"params": variables["params"],
                                "batch_stats": variables["batch_stats"]})
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        model="agcn", model_args=dict(num_class=4, graph="ntu_rgb_d"))))
    d = tmp_path / "streams"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(d / f"cam{i}.npy",
                rng.standard_normal((1, 3, 12, 25, 2)).astype(np.float32))
    # --follow + --max-idle: the loop idles after the recordings end, so
    # the drain must happen at stream end, not at loop exit
    infer_cli.main(["--config", str(cfg), "--weights", str(ckpt),
                    "--input", str(d), "--serve", "3", "--interval", "6",
                    "--max-frame", "16", "--pipeline", "--follow",
                    "--max-idle", "1"])
    out = capsys.readouterr().out
    # both ticks' answers arrive despite the one-tick pipeline lag
    assert "[cam0] frame 6" in out and "[cam1] frame 6" in out
    assert "[cam0] frame 12" in out and "[cam1] frame 12" in out
