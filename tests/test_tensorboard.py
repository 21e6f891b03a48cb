"""Dependency-free tfevents writer: CRC golden values, roundtrip, trainer hook."""

import numpy as np

from unflow_tpu.utils.tensorboard import EventWriter, crc32c, read_events


def test_crc32c_golden():
    # Castagnoli check value (RFC 3720 / "123456789" test vector).
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # iSCSI all-zeros vector


def test_event_file_roundtrip(tmp_path, rng):
    w = EventWriter(tmp_path)
    w.scalar("loss", 1.25, step=3)
    w.scalars({"a/b": 2.5, "skip": "not-a-number"}, step=4)
    im = rng.rand(6, 8, 3).astype(np.float32)
    w.image("viz", im, step=5)
    w.close()

    (path,) = list(tmp_path.glob("events.out.tfevents.*"))
    events = read_events(path)  # CRC-checked framing
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 3 and events[1]["scalars"] == {"loss": 1.25}
    assert events[2]["scalars"] == {"a/b": 2.5}
    assert len(events) == 4  # the non-numeric scalar is dropped

    png = events[3]["images"]["viz"]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    import io

    from PIL import Image

    decoded = np.asarray(Image.open(io.BytesIO(png)))
    expect = (np.clip(im, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(decoded, expect)


def test_trainer_writes_tensorboard(tmp_path):
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer

    cfg = Config()
    cfg.dirs.log = str(tmp_path / "log")
    t = cfg.train
    t.flownet = "S"
    t.batch_size = 2
    # Same geometry as test_train.tiny_config: the init/step/summary
    # programs are byte-identical, so the persistent compilation cache
    # (conftest) compiles them once per cold suite run.
    t.height, t.width = 64, 128
    t.num_iters = 2
    t.save_interval = 2
    t.display_interval = 1
    t.image_summary_interval = 2
    t.tensorboard = True
    t.compute_dtype = "float32"
    t.corr_impl = "jnp"
    t.learning_rate = 1e-4

    ex_dir = tmp_path / "ex"
    trainer = Trainer(cfg, ex_dir, batch_iterator(2, 64, 128, seed=0),
                      mesh=create_mesh(1))
    trainer.run()
    trainer.ckpt.close()

    (path,) = list((ex_dir / "tb").glob("events.out.tfevents.*"))
    events = read_events(path)
    scalar_steps = {e["step"] for e in events if "loss" in e.get("scalars", {})}
    assert scalar_steps == {1, 2}
    image_tags = {t for e in events for t in e.get("images", {})}
    assert {"flow_fw", "im2_warped", "occ_mask"} <= image_tags


def test_crc32c_c_impl_matches_pure_python():
    """The accelerated CRC (google_crc32c when present) must be
    bit-identical to the pure-Python Castagnoli fallback the wire
    format was validated with."""
    from unflow_tpu.utils.tensorboard import _crc32c_py, crc32c

    for data in (b"", b"a", b"123456789", bytes(range(256)) * 33):
        assert crc32c(data) == _crc32c_py(data)
    # RFC 3720 check value for "123456789"
    assert crc32c(b"123456789") == 0xE3069283
