"""Data layer tests: format IO roundtrips, dataset enumeration, loader."""

import time
from pathlib import Path

import numpy as np
import pytest

from unflow_tpu.data import (
    KITTI2012,
    KITTIRaw,
    Loader,
    Sintel,
    FlyingChairs,
    Middlebury,
    Synthia,
    get_dataset,
)
from unflow_tpu.data.base import Example, fit_to_shape
from unflow_tpu.data.io import (
    read_flo,
    read_image,
    read_kitti_png_flow,
    write_flo,
    write_image,
    write_kitti_png_flow,
    pad_to_multiple,
)
from unflow_tpu.data.png16 import read_png16, write_png16


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(17, 23, 2).astype(np.float32)
    write_flo(tmp_path / "a.flo", flow)
    got = read_flo(tmp_path / "a.flo")
    np.testing.assert_array_equal(got, flow)


def test_png16_roundtrip(tmp_path, rng):
    arr = rng.randint(0, 2**16, (11, 13, 3)).astype(np.uint16)
    write_png16(tmp_path / "a.png", arr)
    got = read_png16(tmp_path / "a.png")
    np.testing.assert_array_equal(got, arr)


def test_png16_reads_pil_8bit(tmp_path, rng):
    # Our decoder must read ordinary 8-bit PNGs (PIL-written) too.
    im = rng.rand(9, 15, 3).astype(np.float32)
    write_image(tmp_path / "a.png", im)
    got = read_png16(tmp_path / "a.png")
    assert got.shape == (9, 15, 3)
    np.testing.assert_allclose(
        got.astype(np.float32) / 255.0, im, atol=1.0 / 255
    )


def test_kitti_png_flow_roundtrip(tmp_path, rng):
    flow = (rng.randn(10, 12, 2) * 30).astype(np.float32)
    valid = (rng.rand(10, 12, 1) > 0.5).astype(np.float32)
    write_kitti_png_flow(tmp_path / "f.png", flow, valid)
    got_flow, got_valid = read_kitti_png_flow(tmp_path / "f.png")
    np.testing.assert_array_equal(got_valid, valid)
    # quantization: 1/64 px
    np.testing.assert_allclose(got_flow, flow * valid, atol=1.0 / 64 + 1e-6)


def test_image_roundtrip(tmp_path, rng):
    im = rng.rand(8, 8, 3).astype(np.float32)
    write_image(tmp_path / "im.png", im)
    got = read_image(tmp_path / "im.png")
    np.testing.assert_allclose(got, im, atol=1.0 / 255)


def test_pad_to_multiple(rng):
    im = rng.rand(375, 1242, 3).astype(np.float32)
    padded, orig = pad_to_multiple(im, 64)
    assert padded.shape == (384, 1280, 3)
    assert orig == (375, 1242)
    np.testing.assert_array_equal(padded[:375, :1242], im)


def test_fit_to_shape(rng):
    im = rng.rand(20, 30, 3).astype(np.float32)
    assert fit_to_shape(im, (16, 24)).shape == (16, 24, 3)
    assert fit_to_shape(im, (32, 40)).shape == (32, 40, 3)
    assert fit_to_shape(im, (16, 40)).shape == (16, 40, 3)


# --- dataset layout fixtures -------------------------------------------------


def _make_kitti_raw(root, rng, n_frames=4):
    d = root / "kitti_raw" / "2011_09_26_drive_0001" / "image_02" / "data"
    d.mkdir(parents=True)
    for i in range(n_frames):
        write_image(d / f"{i:010d}.png", rng.rand(16, 32, 3).astype(np.float32))


def _make_kitti_2012(root, rng, n=2):
    base = root / "kitti_2012" / "training"
    for sub in ("colored_0", "flow_occ", "flow_noc"):
        (base / sub).mkdir(parents=True)
    for i in range(n):
        for suffix in ("10", "11"):
            write_image(
                base / "colored_0" / f"{i:06d}_{suffix}.png",
                rng.rand(16, 32, 3).astype(np.float32),
            )
        flow = rng.randn(16, 32, 2).astype(np.float32)
        valid = np.ones((16, 32, 1), np.float32)
        for sub in ("flow_occ", "flow_noc"):
            write_kitti_png_flow(base / sub / f"{i:06d}_10.png", flow, valid)


def test_kitti_raw_enumeration(tmp_path, rng):
    _make_kitti_raw(tmp_path, rng)
    ds = KITTIRaw(tmp_path)
    examples = ds.train_examples()
    assert len(examples) == 3  # 4 frames -> 3 consecutive pairs
    assert examples[0].flow is None


def test_kitti_raw_warns_without_exclusion_source(tmp_path, rng):
    _make_kitti_raw(tmp_path, rng)
    with pytest.warns(UserWarning, match="contaminates"):
        KITTIRaw(tmp_path).train_examples()


def test_kitti_raw_auto_exclusion_from_2015_mapping(tmp_path, rng):
    """Frames around the kitti_2015 devkit's mapped raw scenes must be
    dropped from raw training (eval-scene contamination guard)."""
    drive = "2011_09_26_drive_0001"
    d = tmp_path / "kitti_raw" / drive / "image_02" / "data"
    d.mkdir(parents=True)
    for i in range(30):
        write_image(d / f"{i:010d}.png", rng.rand(8, 16, 3).astype(np.float32))
    mapping = tmp_path / "kitti_2015" / "devkit" / "mapping"
    mapping.mkdir(parents=True)
    (mapping / "train_mapping.txt").write_text(
        f"2011_09_26 {drive} 0000000010\n\n"  # blank line: unmapped frame
    )
    ds = KITTIRaw(tmp_path, exclude_window=5)
    examples = ds.train_examples()
    kept = {int(Path(e.im1).stem) for e in examples}
    # frames 5..15 excluded; pair (4,5) touches frame 5 -> first kept
    # im1 above the window is 16; below, pairs 0..3 survive.
    assert kept == {0, 1, 2, 3} | set(range(16, 29)), sorted(kept)


def test_kitti_raw_exclude_file_scene_format(tmp_path, rng):
    _make_kitti_raw(tmp_path, rng, n_frames=6)
    exclude = tmp_path / "exclude.txt"
    exclude.write_text("# comment\n2011_09_26_drive_0001 2\n")
    ds = KITTIRaw(tmp_path, exclude_file=str(exclude), exclude_window=1)
    kept = {int(Path(e.im1).stem) for e in ds.train_examples()}
    assert kept == {4}, sorted(kept)  # frames 1..3 excluded, pair (4,5) kept


def test_kitti_raw_exclusion_off_is_silent(tmp_path, rng):
    import warnings as _warnings

    _make_kitti_raw(tmp_path, rng)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        examples = KITTIRaw(
            tmp_path, exclude="off", warn_partial_corpus=False
        ).train_examples()
    assert len(examples) == 3


def test_kitti_raw_warns_on_partial_corpus(tmp_path, rng):
    """One drive out of the ~61-drive paper corpus must warn loudly."""
    _make_kitti_raw(tmp_path, rng)
    with pytest.warns(UserWarning, match="partial corpus"):
        KITTIRaw(tmp_path, exclude="off").train_examples()


def test_kitti_raw_full_corpus_does_not_warn(tmp_path, rng):
    """All manifest drives present (with the on-disk _sync suffix) ->
    no partial-corpus warning."""
    import warnings as _warnings

    from unflow_tpu.data.bootstrap import _KITTI_RAW_DRIVES

    for drive in _KITTI_RAW_DRIVES:
        d = tmp_path / "kitti_raw" / f"{drive}_sync" / "image_02" / "data"
        d.mkdir(parents=True)
    # only one drive needs actual frames for enumeration to succeed
    first = (
        tmp_path / "kitti_raw" / f"{_KITTI_RAW_DRIVES[0]}_sync"
        / "image_02" / "data"
    )
    for i in range(3):
        write_image(first / f"{i:010d}.png", rng.rand(8, 16, 3).astype(np.float32))
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        examples = KITTIRaw(tmp_path, exclude="off").train_examples()
    assert len(examples) == 2


def test_kitti_2012_enumeration(tmp_path, rng):
    _make_kitti_2012(tmp_path, rng)
    ds = KITTI2012(tmp_path)
    train = ds.train_examples()
    assert len(train) == 2
    assert train[0].flow_format == "kitti_png"
    assert len(ds.eval_examples("noc")) == 2


def test_kitti_noc_breakdown_masks(tmp_path, rng):
    """The occ eval variant attaches flow_noc; load_example derives
    noc_mask = valid(flow_occ) & valid(flow_noc)."""
    from unflow_tpu.data.base import load_example

    base = tmp_path / "kitti_2012" / "training"
    for sub in ("colored_0", "flow_occ", "flow_noc"):
        (base / sub).mkdir(parents=True)
    for suffix in ("10", "11"):
        write_image(
            base / "colored_0" / f"000000_{suffix}.png",
            rng.rand(16, 32, 3).astype(np.float32),
        )
    flow = rng.randn(16, 32, 2).astype(np.float32)
    valid_occ = np.ones((16, 32, 1), np.float32)
    valid_occ[:2] = 0.0  # a few fully-invalid rows
    valid_noc = valid_occ.copy()
    valid_noc[8:] = 0.0  # bottom half occluded
    write_kitti_png_flow(base / "flow_occ" / "000000_10.png", flow, valid_occ)
    write_kitti_png_flow(base / "flow_noc" / "000000_10.png", flow, valid_noc)

    ds = KITTI2012(tmp_path)
    (ex,) = ds.eval_examples("occ")
    assert ex.noc is not None and ex.noc.endswith("flow_noc/000000_10.png")
    item = load_example(ex, target_hw=None, supervised=True)
    np.testing.assert_array_equal(item["mask"], valid_occ)
    np.testing.assert_array_equal(item["noc_mask"], valid_noc)
    # the noc variant evaluates against flow_noc directly, no breakdown
    (ex_noc,) = ds.eval_examples("noc")
    assert ex_noc.noc is None


def test_sintel_occlusion_mask(tmp_path, rng):
    from unflow_tpu.data.base import load_example

    base = tmp_path / "sintel" / "training"
    for sub in ("clean/alley_1", "flow/alley_1", "occlusions/alley_1"):
        (base / sub).mkdir(parents=True)
    for i in (1, 2):
        write_image(
            base / "clean" / "alley_1" / f"frame_{i:04d}.png",
            rng.rand(16, 32, 3).astype(np.float32),
        )
    write_flo(
        base / "flow" / "alley_1" / "frame_0001.flo",
        rng.randn(16, 32, 2).astype(np.float32),
    )
    occ = np.zeros((16, 32, 3), np.float32)
    occ[:, 16:] = 1.0  # right half occluded (white)
    write_image(base / "occlusions" / "alley_1" / "frame_0001.png", occ)

    (ex,) = Sintel(tmp_path, render_pass="clean").eval_examples()
    assert ex.noc_format == "occ_png" and ex.noc is not None
    item = load_example(ex, target_hw=None, supervised=True)
    expect = np.ones((16, 32, 1), np.float32)
    expect[:, 16:] = 0.0
    np.testing.assert_array_equal(item["noc_mask"], expect)


def test_sintel_enumeration(tmp_path, rng):
    base = tmp_path / "sintel" / "training"
    (base / "clean" / "alley_1").mkdir(parents=True)
    (base / "flow" / "alley_1").mkdir(parents=True)
    for i in (1, 2, 3):
        write_image(
            base / "clean" / "alley_1" / f"frame_{i:04d}.png",
            rng.rand(16, 32, 3).astype(np.float32),
        )
    for i in (1, 2):
        write_flo(
            base / "flow" / "alley_1" / f"frame_{i:04d}.flo",
            rng.randn(16, 32, 2).astype(np.float32),
        )
    ds = Sintel(tmp_path, render_pass="clean")
    assert len(ds.train_examples()) == 2
    assert len(ds.eval_examples()) == 2
    with pytest.raises(ValueError):
        Sintel(tmp_path, render_pass="bogus")

    # Final-pass training via the dataset registry (train CLI has no
    # variant flag; `dataset = sintel_final` selects the final render).
    from unflow_tpu.data import get_dataset

    (base / "final" / "alley_1").mkdir(parents=True)
    for i in (1, 2, 3):
        write_image(
            base / "final" / "alley_1" / f"frame_{i:04d}.png",
            rng.rand(16, 32, 3).astype(np.float32),
        )
    ds_final = get_dataset("sintel_final", tmp_path)
    assert ds_final.render_pass == "final"
    assert len(ds_final.train_examples()) == 2


def test_chairs_enumeration_and_split(tmp_path, rng):
    d = tmp_path / "chairs" / "data"
    d.mkdir(parents=True)
    for i in range(1, 4):
        for k in (1, 2):
            write_image(d / f"{i:05d}_img{k}.ppm", rng.rand(8, 8, 3).astype(np.float32))
        write_flo(d / f"{i:05d}_flow.flo", rng.randn(8, 8, 2).astype(np.float32))
    (tmp_path / "chairs" / "FlyingChairs_train_val.txt").write_text("1\n2\n1\n")
    ds = FlyingChairs(tmp_path)
    assert len(ds.train_examples()) == 2
    assert len(ds.eval_examples()) == 1


def test_middlebury_enumeration(tmp_path, rng):
    for scene in ("Grove2", "Urban3"):
        d = tmp_path / "middlebury" / "other-data" / scene
        d.mkdir(parents=True)
        for f in ("frame10.png", "frame11.png"):
            write_image(d / f, rng.rand(8, 8, 3).astype(np.float32))
        g = tmp_path / "middlebury" / "other-gt-flow" / scene
        g.mkdir(parents=True)
        write_flo(g / "flow10.flo", rng.randn(8, 8, 2).astype(np.float32))
    ds = Middlebury(tmp_path)
    assert len(ds.eval_examples()) == 2


def test_synthia_enumeration(tmp_path, rng):
    d = tmp_path / "synthia" / "SEQ1" / "RGB" / "Stereo_Left" / "Omni_F"
    d.mkdir(parents=True)
    for i in range(3):
        write_image(d / f"{i:06d}.png", rng.rand(8, 8, 3).astype(np.float32))
    assert len(Synthia(tmp_path).train_examples()) == 2


def test_missing_dataset_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        KITTIRaw(tmp_path).train_examples()
    with pytest.raises(KeyError):
        get_dataset("bogus", tmp_path)


def test_loader_batches_and_determinism(tmp_path, rng):
    _make_kitti_2012(tmp_path, rng, n=4)
    ds = KITTI2012(tmp_path)
    examples = ds.train_examples()

    def first_two(seed):
        loader = Loader(
            examples, batch_size=2, load_hw=(16, 32), supervised=True, seed=seed
        )
        it = iter(loader)
        return [next(it) for _ in range(2)]

    a = first_two(0)
    b = first_two(0)
    c = first_two(1)
    assert a[0]["im1"].shape == (2, 16, 32, 3)
    assert a[0]["flow"].shape == (2, 16, 32, 2)
    np.testing.assert_array_equal(a[0]["im1"], b[0]["im1"])
    np.testing.assert_array_equal(a[1]["mask"], b[1]["mask"])
    assert not np.array_equal(a[0]["im1"], c[0]["im1"])


def test_resize_to_shape_image_and_flow():
    from unflow_tpu.data.base import resize_to_shape

    # Smooth ramp image: bilinear resize of a linear function is exact.
    h, w = 8, 12
    y = np.arange(h, dtype=np.float32)[:, None, None]
    x = np.arange(w, dtype=np.float32)[None, :, None]
    im = np.concatenate([y / h + 0 * x, x / w + 0 * y], -1)
    out = resize_to_shape(im, (16, 24))
    assert out.shape == (16, 24, 2)
    yi = np.linspace(0, h - 1, 16) / h
    xi = np.linspace(0, w - 1, 24) / w
    np.testing.assert_allclose(out[..., 0], np.broadcast_to(yi[:, None], (16, 24)), atol=1e-6)
    np.testing.assert_allclose(out[..., 1], np.broadcast_to(xi[None, :], (16, 24)), atol=1e-6)

    # Constant flow doubled in width: u doubles, v scaled by h-ratio.
    flow = np.full((8, 12, 2), 2.0, np.float32)
    out = resize_to_shape(flow, (4, 24), is_flow=True)
    np.testing.assert_allclose(out[..., 0], 2.0 * (24 / 12), atol=1e-6)
    np.testing.assert_allclose(out[..., 1], 2.0 * (4 / 8), atol=1e-6)


def test_loader_resize_mode(tmp_path, rng):
    _make_kitti_2012(tmp_path, rng, n=2)
    examples = KITTI2012(tmp_path).train_examples()
    loader = Loader(
        examples, batch_size=2, load_hw=(32, 64), supervised=True,
        mode="resize",
    )
    batch = next(iter(loader))
    assert batch["im1"].shape == (2, 32, 64, 3)
    assert batch["flow"].shape == (2, 32, 64, 2)
    assert set(np.unique(batch["mask"])) <= {0.0, 1.0}


def test_loader_threaded_order_determinism(tmp_path, rng):
    """num_threads > 1 parallelizes decode but must not reorder the
    stream (pre-assigned indices, futures consumed in batch order)."""
    _make_kitti_2012(tmp_path, rng, n=6)
    examples = KITTI2012(tmp_path).train_examples()

    def stream(num_threads):
        loader = Loader(
            examples, batch_size=2, load_hw=(16, 32), supervised=True,
            seed=3, num_threads=num_threads,
        )
        it = iter(loader)
        return [next(it) for _ in range(4)]

    serial = stream(1)
    threaded = stream(4)
    for a, b in zip(serial, threaded):
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])


def test_loader_abandoned_iterator_does_not_hang(tmp_path, rng):
    """The producer must observe the stop event even when blocked on a
    full queue (timeout-checked put)."""
    import threading as _threading

    _make_kitti_2012(tmp_path, rng, n=4)
    examples = KITTI2012(tmp_path).train_examples()
    loader = Loader(
        examples, batch_size=1, load_hw=(16, 32), supervised=True, prefetch=1
    )
    before = _threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon with the queue full
    deadline = time.time() + 10.0
    while _threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert _threading.active_count() <= before


def test_loader_no_loop(tmp_path, rng):
    _make_kitti_raw(tmp_path, rng, n_frames=5)
    examples = KITTIRaw(tmp_path).train_examples()  # 4 pairs
    loader = Loader(examples, batch_size=2, load_hw=(16, 32), loop=False, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2


def test_kitti_raw_max_frame_gap(tmp_path, rng):
    """gap pairs (reference skip_frames): 6 frames with gap<=2 ->
    5 adjacent + 4 gap-2 pairs; gap pairs never straddle excluded frames
    beyond what adjacent exclusion already enforces."""
    _make_kitti_raw(tmp_path, rng, n_frames=6)
    ds = KITTIRaw(tmp_path, exclude="off", max_frame_gap=2)
    examples = ds.train_examples()
    pairs = {(int(Path(e.im1).stem), int(Path(e.im2).stem)) for e in examples}
    assert pairs == {(i, i + 1) for i in range(5)} | {(i, i + 2) for i in range(4)}


def test_max_frame_gap_config_plumbing(tmp_path, rng, monkeypatch):
    """[train] max_frame_gap reaches the KITTIRaw constructor through
    cli/train.build_batches_and_norm (was constructor-only dead plumbing,
    ADVICE r2)."""
    from unflow_tpu.cli import train as train_cli
    from unflow_tpu.config import Config

    _make_kitti_raw(tmp_path, rng, n_frames=6)
    cfg = Config()
    cfg.dirs.data = str(tmp_path)
    t = cfg.train
    t.dataset = "kitti_raw"
    t.height, t.width = 16, 32
    t.batch_size = 2
    t.max_frame_gap = 2

    captured = {}
    real = train_cli.get_dataset

    def spy(name, data_dir, **kwargs):
        captured.update(kwargs)
        return real(name, data_dir, **kwargs)

    monkeypatch.setattr(train_cli, "get_dataset", spy)
    batches, _norm = train_cli.build_batches_and_norm(cfg)
    assert captured == {"max_frame_gap": 2}
    batch = next(batches)
    assert batch["im1"].shape == (2, 16, 32, 3)


def test_loader_uint8_matches_float32(tmp_path, rng):
    """uint8 loader batches are exactly f32 batches * 255 (the on-device
    f32/255 conversion is exact, so the fast path is bit-identical)."""
    _make_kitti_raw(tmp_path, rng, n_frames=5)
    examples = KITTIRaw(tmp_path, exclude="off").train_examples()
    kw = dict(batch_size=2, load_hw=(16, 32), loop=False, shuffle=False)
    b_f = next(iter(Loader(examples, **kw)))
    b_u = next(iter(Loader(examples, image_dtype="uint8", **kw)))
    assert b_u["im1"].dtype == np.uint8
    np.testing.assert_array_equal(
        b_u["im1"].astype(np.float32) / 255.0, b_f["im1"]
    )
    np.testing.assert_array_equal(
        b_u["im2"].astype(np.float32) / 255.0, b_f["im2"]
    )


def test_loader_uint8_rejects_resize(tmp_path, rng):
    _make_kitti_raw(tmp_path, rng, n_frames=3)
    examples = KITTIRaw(tmp_path, exclude="off").train_examples()
    loader = Loader(
        examples, batch_size=1, load_hw=(16, 32), loop=False,
        mode="resize", image_dtype="uint8",
    )
    with pytest.raises(ValueError):
        next(iter(loader))


# --- packed fast path (data/packed.py) ---------------------------------------


def test_packed_matches_decode_loader(tmp_path, rng):
    """Packed memmap batches are bit-identical to the decode loader's
    uint8 batches for the same example stream (same seed/order)."""
    from unflow_tpu.data.packed import PackedExamples, pack_examples

    _make_kitti_raw(tmp_path, rng, n_frames=7)
    examples = KITTIRaw(tmp_path, exclude="off").train_examples()
    out = pack_examples(examples, tmp_path / "packed", (16, 32))
    packed = PackedExamples(out)
    assert len(packed) == len(examples)

    kw = dict(batch_size=2, load_hw=(16, 32), loop=False, seed=3)
    for b_dec, b_pack in zip(
        iter(Loader(examples, image_dtype="uint8", **kw)),
        iter(Loader(packed, image_dtype="uint8", **kw)),
    ):
        assert b_pack["im1"].dtype == np.uint8
        np.testing.assert_array_equal(b_pack["im1"], b_dec["im1"])
        np.testing.assert_array_equal(b_pack["im2"], b_dec["im2"])


def test_packed_supervised_roundtrip(tmp_path, rng):
    from unflow_tpu.data.packed import PackedExamples, pack_examples

    _make_kitti_2012(tmp_path, rng, n=3)
    examples = KITTI2012(tmp_path).train_examples()
    out = pack_examples(
        examples, tmp_path / "packed", (16, 32), supervised=True
    )
    packed = PackedExamples(out)
    kw = dict(
        batch_size=1, load_hw=(16, 32), loop=False, shuffle=False,
        supervised=True,
    )
    for b_dec, b_pack in zip(
        iter(Loader(examples, **kw)), iter(Loader(packed, **kw))
    ):
        # float32 request converts frames back on the host — exact.
        np.testing.assert_array_equal(b_pack["im1"], b_dec["im1"])
        np.testing.assert_array_equal(b_pack["flow"], b_dec["flow"])
        np.testing.assert_array_equal(b_pack["mask"], b_dec["mask"])


def test_packed_geometry_mismatch_raises(tmp_path, rng):
    from unflow_tpu.data.packed import PackedExamples, pack_examples

    _make_kitti_raw(tmp_path, rng, n_frames=3)
    examples = KITTIRaw(tmp_path, exclude="off").train_examples()
    out = pack_examples(examples, tmp_path / "packed", (16, 32))
    with pytest.raises(ValueError, match="re-pack"):
        Loader(PackedExamples(out), batch_size=1, load_hw=(32, 64))


def test_packed_unsupervised_has_no_gt(tmp_path, rng):
    from unflow_tpu.data.packed import PackedExamples, pack_examples

    _make_kitti_raw(tmp_path, rng, n_frames=3)
    examples = KITTIRaw(tmp_path, exclude="off").train_examples()
    out = pack_examples(examples, tmp_path / "packed", (16, 32))
    loader = Loader(
        PackedExamples(out), batch_size=1, load_hw=(16, 32),
        supervised=True, loop=False,
    )
    with pytest.raises(ValueError, match="no ground truth"):
        next(iter(loader))


# --- step-indexed resume (SURVEY §5: deterministic loader state) -------------


def test_loader_start_batch_resumes_stream(tmp_path, rng):
    """start_batch=k yields exactly the full stream with the first k
    global batches dropped — including across an epoch boundary."""
    for i in range(8):
        write_image(tmp_path / f"{i}.png", np.full((8, 8, 3), i / 8.0, np.float32))
    examples = [
        Example(im1=str(tmp_path / f"{i}.png"), im2=str(tmp_path / f"{i}.png"))
        for i in range(8)
    ]
    kw = dict(batch_size=2, load_hw=(8, 8), seed=3, num_threads=1)

    full = iter(Loader(examples, **kw))
    stream = [next(full)["im1"] for _ in range(10)]  # 2.5 epochs
    for k in (1, 4, 7):  # mid-epoch, boundary, mid-second-epoch
        it = iter(Loader(examples, start_batch=k, **kw))
        for j in range(3):
            np.testing.assert_array_equal(next(it)["im1"], stream[k + j])

    with pytest.raises(ValueError):
        Loader(examples, start_batch=-1, **kw)


def test_synthetic_start_batch_resumes_stream():
    from unflow_tpu.data.synthetic import batch_iterator

    full = batch_iterator(2, 16, 16, seed=5, supervised=True)
    stream = [next(full) for _ in range(6)]
    it = batch_iterator(2, 16, 16, seed=5, supervised=True, start_batch=4)
    for j in range(2):
        got = next(it)
        for key in ("im1", "im2", "flow"):
            np.testing.assert_array_equal(got[key], stream[4 + j][key])


def test_synthetic_corpus_iterator_resume_epochs_and_cache(tmp_path):
    from unflow_tpu.data.synthetic import corpus_iterator, make_corpus

    kw = dict(batch_size=2, height=16, width=16, n_pairs=6, seed=5,
              supervised=True)
    full = corpus_iterator(**kw)
    stream = [next(full) for _ in range(8)]  # > 2 epochs

    # Step-indexed resume is bit-identical, across epoch boundaries.
    for k in (1, 3, 6):
        it = corpus_iterator(start_batch=k, **kw)
        got = next(it)
        for key in ("im1", "im2", "flow", "mask"):
            np.testing.assert_array_equal(got[key], stream[k][key])

    # Each epoch covers the whole corpus exactly once (permutation).
    c = make_corpus(6, 16, 16, seed=5)
    for epoch in range(2):
        seen = np.concatenate(
            [b["flow"] for b in stream[3 * epoch:3 * epoch + 3]])
        want = np.sort(c["flow"].reshape(6, -1), axis=0)
        np.testing.assert_array_equal(np.sort(seen.reshape(6, -1), axis=0),
                                      want)

    # Disk cache round-trips bit-exactly (second call memmaps).
    c1 = make_corpus(4, 16, 16, seed=7, cache_dir=str(tmp_path))
    c2 = make_corpus(4, 16, 16, seed=7, cache_dir=str(tmp_path))
    for key in ("im1", "im2", "flow"):
        np.testing.assert_array_equal(np.asarray(c1[key]), np.asarray(c2[key]))

    with pytest.raises(ValueError):
        next(corpus_iterator(4, 16, 16, n_pairs=6))


def test_synthetic_corpus_uint8_quantizes_frames_only(tmp_path):
    """dtype="uint8" stores 8-bit frames (f32 flow); values round-trip to
    within the 1/255 quantum of the f32 corpus, and the cache keys the
    dtype so both variants coexist."""
    from unflow_tpu.data.synthetic import corpus_iterator, make_corpus

    f32 = make_corpus(4, 16, 16, seed=7, cache_dir=str(tmp_path))
    u8 = make_corpus(4, 16, 16, seed=7, cache_dir=str(tmp_path),
                     dtype="uint8")
    assert np.asarray(u8["im1"]).dtype == np.uint8
    assert np.asarray(u8["flow"]).dtype == np.float32
    np.testing.assert_array_equal(np.asarray(u8["flow"]),
                                  np.asarray(f32["flow"]))
    for key in ("im1", "im2"):
        np.testing.assert_allclose(
            np.asarray(u8[key]).astype(np.float32) / 255.0,
            np.asarray(f32[key]), atol=0.51 / 255.0)

    it = corpus_iterator(2, 16, 16, n_pairs=4, seed=7, dtype="uint8",
                         cache_dir=str(tmp_path))
    batch = next(it)
    assert batch["im1"].dtype == np.uint8

    with pytest.raises(ValueError):
        make_corpus(4, 16, 16, seed=7, dtype="float16")
