"""Data-plane tests: video backends, sampling math, datasets, augment replay,
loader. Uses real encoded videos written by cv2 into reference-layout trees."""

import os

import numpy as np
import pytest

from dfd_clip_tpu.data import augment
from dfd_clip_tpu.data.datasets import CDF, FFPP
from dfd_clip_tpu.data.loader import DataLoader
from dfd_clip_tpu.data.video import OpenCVBackend, SyntheticBackend, get_backend

from fixtures import ffpp_config, make_cdf_tree, make_ffpp_tree


@pytest.fixture
def ffpp_root(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # video-table pickle cache is CWD-relative
    return make_ffpp_tree(str(tmp_path / "ffpp"))


@pytest.fixture
def use_opencv_backend(monkeypatch):
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")


# -- backends ------------------------------------------------------------------

def test_synthetic_backend_deterministic():
    b = SyntheticBackend()
    meta = b.probe("synthetic://7?fps=25&duration=10&size=32")
    assert meta.frames == 250
    f1 = b.read_frames("synthetic://7?fps=25&duration=10&size=32", [0.0, 1.0])
    f2 = b.read_frames("synthetic://7?fps=25&duration=10&size=32", [0.0, 1.0])
    np.testing.assert_array_equal(f1, f2)


def test_native_matches_opencv(tmp_path):
    """The C++ decoder and cv2 must return identical frames & seek choices."""
    pytest.importorskip("cv2")
    from fixtures import write_video

    try:
        from dfd_clip_tpu.data.native_video import NativeVideoLib

        NativeVideoLib.get()
    except ImportError:
        pytest.skip("native lib not built")

    p = str(tmp_path / "v.avi")
    write_video(p, 100, fps=25.0, size=48, seed=3)
    times = [0.0, 0.04, 0.5, 1.02, 3.9]
    from dfd_clip_tpu.data.video import NativeBackend

    nat = NativeBackend().read_frames(p, times)
    ocv = OpenCVBackend().read_frames(p, times)
    np.testing.assert_array_equal(nat, ocv)
    m1, m2 = NativeBackend().probe(p), OpenCVBackend().probe(p)
    assert m1.fps == m2.fps and m1.frames == m2.frames


# -- FFPP ----------------------------------------------------------------------

def test_ffpp_table_and_list(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root)
    ds = FFPP(cfg, num_frames=8, clip_duration=2, split="train")
    # 4 ids -> 2 pairs; REAL videos in split: all 4; fakes: both directions = 4
    # duration 4s / clip 2s = 2 clips each
    assert len(ds.video_list) == 8
    assert len(ds) == 16
    assert ds.stack_video_clips[-1] == 16


def test_ffpp_getitem_shapes(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root)
    ds = FFPP(cfg, num_frames=8, clip_duration=2, split="train")
    frames, label, mask, speed, index = ds[0]
    assert set(frames.keys()) == {"raw"}
    assert frames["raw"].shape == (8, 3, 64, 64)
    assert frames["raw"].dtype == np.uint8
    assert mask.shape == (8,)
    assert label in (0, 1)
    assert 0.5 <= speed <= 1.0


def test_ffpp_eval_deterministic(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root)
    ds = FFPP(cfg, num_frames=8, clip_duration=2, split="val")
    a = ds.get_dict(0, block=True)
    b = ds.get_dict(0, block=True)
    np.testing.assert_array_equal(a["frames"]["raw"], b["frames"]["raw"])
    assert a["speed"] == 1.0  # no random speed at eval


def test_ffpp_sampling_math(ffpp_root, use_opencv_backend):
    """Frame choice must follow the reference's offset/stride formula
    (src/datasets.py:641-661)."""
    cfg = ffpp_config(ffpp_root, random_speed=0)
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="val")
    # clip idx 1 of first video: offset = 2s, stride = (50-1)/3/25 s
    d = ds.get_dict(1, block=True)
    _, df_type, comp, name, _ = ds.video_info(1)
    meta = ds.video_table[df_type][comp][name]
    fps = meta["fps"]
    stride = ((int(fps * 2) - 1) / 3) / fps
    times = [2 + i * stride for i in range(4)]
    expected = get_backend("opencv").read_frames(meta["path"], times)
    got = d["frames"]["raw"].transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, expected)


def test_ffpp_pair_mode(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root, pair=1)
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="train")
    frames, *_ = ds[0]
    assert set(frames.keys()) == {"raw", "c23"}


def test_ffpp_contrast_collate(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root, contrast=1)
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="train")
    item = ds[0]
    batch = ds.collate_fn([ds[0], ds[1]])
    frames, label, mask, comps, speed, index = batch
    assert frames.shape[0] == 4  # 2 items x 2 contrast samples x 1 comp
    assert len(comps) == 4
    assert label.shape == (4,)
    # contrast pairs must contain both labels
    assert set(label[:2].tolist()) == {0, 1}


def test_ffpp_pack_mode(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root, pack=1)
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="test")
    assert len(ds) == len(ds.video_list)
    frames, label, mask, speed, index = ds[0]
    assert len(frames) == 2  # 2 clips of the 4s video
    assert all(f.shape == (4, 3, 64, 64) for f in frames)


def test_ffpp_ssl_fake(ffpp_root, use_opencv_backend):
    cfg = ffpp_config(ffpp_root, contrast=1, ssl_fake=1, types=["REAL"])
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="train")
    found_fake_of_real = False
    for _ in range(10):
        frames_l, labels, *_ = ds[0]
        if labels == [0, 1]:
            found_fake_of_real = True
            break
    assert found_fake_of_real, "ssl_fake should forge positives from real clips"


# -- CDF -----------------------------------------------------------------------

def test_cdf_dataset(tmp_path, monkeypatch, use_opencv_backend):
    monkeypatch.chdir(tmp_path)
    root = make_cdf_tree(str(tmp_path / "cdf"))
    cfg = CDF.get_default_config()
    cfg.root_dir = root
    ds = CDF(cfg, num_frames=4, clip_duration=2)
    assert len(ds) == 12  # 6 videos x 2 clips
    frames, label, mask, index = ds[0]
    assert frames.shape == (4, 3, 64, 64)
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch[0].shape == (2, 4, 3, 64, 64)
    assert batch[3] == ["raw", "raw"]


# -- augmentations --------------------------------------------------------------

def test_augment_replay_identical_across_frames(rng):
    aug = augment.ClipAugmenter("normal")
    frames = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    replay = {}
    out1, replay = aug(frames.copy(), replay, np.random.default_rng(0))
    # replay on the identical input reproduces the output exactly
    out2, _ = aug(frames.copy(), dict(replay), np.random.default_rng(999))
    np.testing.assert_array_equal(out1, out2)


def test_augment_replay_across_pair(rng):
    """raw and c23 variants of a clip get the same transform (src/datasets.py:368-399)."""
    aug = augment.ClipAugmenter("normal+frame")
    raw = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    replay = {}
    _, replay = aug(raw, replay, np.random.default_rng(1))
    assert "video" in replay and "frame" in replay
    assert len(replay["frame"]) == 3


def test_elastic_transform_deterministic(rng):
    op = augment.ElasticTransform(alpha=20, sigma=4, p=1.0)
    params = op.sample(np.random.default_rng(5))
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    np.testing.assert_array_equal(op.apply(img, params), op.apply(img, params))
    assert not np.array_equal(op.apply(img, params), img)


# -- loader ---------------------------------------------------------------------

class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return np.full((2, 2), i, np.int32), i


def test_loader_basic():
    dl = DataLoader(_ToyDataset(), batch_size=3, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0][0].shape == (3, 2, 2)
    assert batches[-1][0].shape == (1, 2, 2)


def test_loader_drop_last_and_shuffle():
    dl = DataLoader(_ToyDataset(), batch_size=3, shuffle=True, drop_last=True, seed=7)
    b1 = [b[1].tolist() for b in dl]
    b2 = [b[1].tolist() for b in dl]
    assert len(b1) == 3
    assert sorted(sum(b1, [])) != list(range(9)) or b1 != b2  # epoch reshuffle


def test_loader_threaded_matches_sync():
    sync = [b[1].tolist() for b in DataLoader(_ToyDataset(), batch_size=2)]
    thr = [b[1].tolist() for b in DataLoader(_ToyDataset(), batch_size=2, num_workers=3)]
    assert sync == thr


def test_loader_slow_consumer_terminates():
    """Regression: the producer's end-of-stream sentinel used put_nowait and
    was silently dropped whenever the bounded queue was full (the normal case
    with a consumer slower than the prefetcher) — the consumer then blocked
    forever on get(). The sentinel must use the same stop-aware bounded put
    as data items (loader.py produce/finally)."""
    import threading
    import time

    dl = DataLoader(_ToyDataset(), batch_size=1, num_workers=2)
    seen = []

    def consume():
        for b in dl:
            seen.append(b[1].tolist())
            time.sleep(0.05)  # stay slower than the producer: queue stays full

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=20.0)
    assert not t.is_alive(), "loader iteration hung after the last batch"
    assert seen == [[i] for i in range(10)]


def test_loader_propagates_worker_errors():
    class Exploding:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom at 5")
            return np.zeros((2,)), i

    dl = DataLoader(Exploding(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom at 5"):
        list(dl)


def test_native_x264_encode_decode_roundtrip(tmp_path):
    """The native libx264 encoder (c23 pipeline without the ffmpeg binary)
    produces files our decoder reads; lossless CRF-0 round-trips closely."""
    try:
        from dfd_clip_tpu.data.native_video import NativeVideoLib

        lib = NativeVideoLib.get()
    except ImportError:
        pytest.skip("native lib not built")

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64
    frames = np.stack([
        np.clip(np.stack([150 + 50 * np.sin(6 * xx + f / 5), yy * 200,
                          np.full_like(yy, 80.0)], -1), 0, 255).astype(np.uint8)
        for f in range(50)
    ])
    p = str(tmp_path / "x264.mp4")
    lib.encode_video(p, frames, fps=25.0, crf=18, codec="libx264")
    fps, n, dur = lib.probe(p)
    assert n == 50 and abs(fps - 25.0) < 1.0

    dec = lib.read_frames(p, [0.0, 1.0, 1.96])
    assert dec.shape == (3, 64, 64, 3)
    diff = np.abs(dec[0].astype(int) - frames[0].astype(int)).mean()
    assert diff < 6.0, diff  # crf18 visually lossless

    # YUV fast path flags limited range for x264 output
    y, u, v, full_range = lib.read_frames_yuv(p, [0.0])
    assert not full_range


def test_native_decoder_corrupt_inputs_raise(tmp_path):
    """Hostile/broken files must raise catchable errors, never crash: the
    dataset layer's retry-resample (FFPP.get_dict, reference
    src/datasets.py:592-702 semantics) catches ANY exception and resamples,
    which only works if libdfdvideo turns every libav failure into a Python
    error. Covers: missing path, empty file, random bytes, a mid-file
    truncation, and out-of-range seek times on a valid file."""
    pytest.importorskip("cv2")
    from fixtures import write_video

    try:
        from dfd_clip_tpu.data.native_video import NativeVideoLib

        lib = NativeVideoLib.get()
    except ImportError:
        pytest.skip("native lib not built")

    ok = str(tmp_path / "ok.avi")
    write_video(ok, 20, fps=10.0, size=32, seed=0)

    bad = {
        "missing": str(tmp_path / "nope.avi"),
        "empty": str(tmp_path / "empty.avi"),
        "garbage": str(tmp_path / "garbage.avi"),
    }
    open(bad["empty"], "wb").close()
    with open(bad["garbage"], "wb") as f:
        f.write(bytes(range(256)) * 16)

    for name, path in bad.items():
        with pytest.raises(OSError):
            lib.probe(path)
        with pytest.raises(OSError):
            lib.read_frames(path, [0.0, 0.5])

    # A mid-file truncation keeps a parseable header: libav may legitimately
    # decode the surviving prefix (error resilience). The contract is weaker
    # but strict: every call either raises OSError or returns well-formed
    # frames — never crashes, never hands back misshapen buffers.
    trunc = str(tmp_path / "trunc.avi")
    data = open(ok, "rb").read()
    with open(trunc, "wb") as f:
        f.write(data[: len(data) // 3])
    for times in ([0.0, 0.5], [1.9], [0.0, 0.5, 1.0, 1.5, 1.9]):
        try:
            frames = lib.read_frames(trunc, times)
        except OSError:
            continue
        assert frames.shape == (len(times), 32, 32, 3)
        assert frames.dtype == np.uint8

    # out-of-range seeks on a VALID file also raise, not hang/garbage
    with pytest.raises(OSError):
        lib.read_frames(ok, [-1.0])
    with pytest.raises(OSError):
        lib.read_frames(ok, [100.0])
    # empty request is well-defined
    assert lib.read_frames(ok, []).shape[0] == 0


def test_loader_set_position_resumes_stream():
    """set_position(epoch, batches_done) must continue the deterministic
    (seed + epoch)-shuffled stream exactly where it left off — the Trainer
    uses it so a checkpoint resume does not replay already-trained batches."""
    from dfd_clip_tpu.data.loader import DataLoader

    data = list(range(23))

    def stream(loader, n_batches):
        out = []
        it = iter(loader)
        while len(out) < n_batches:
            try:
                out.append(next(it))
            except StopIteration:
                it = iter(loader)
        return [np.asarray(b).tolist() for b in out]

    full = stream(DataLoader(data, batch_size=4, shuffle=True, seed=5), 12)

    # resume mid-epoch-1: consumed 7 batches total, 6 per epoch -> epoch 1, 1 done
    resumed = DataLoader(data, batch_size=4, shuffle=True, seed=5)
    per_epoch = len(resumed)
    assert per_epoch == 6
    consumed = 7
    resumed.set_position(consumed // per_epoch, consumed % per_epoch)
    assert stream(resumed, 5) == full[consumed:consumed + 5]


def test_loader_set_position_skip_is_index_only():
    """Skipped batches must not touch the dataset (no decode work)."""
    from dfd_clip_tpu.data.loader import DataLoader

    touched = []

    class Recording:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            touched.append(i)
            return i

    dl = DataLoader(Recording(), batch_size=2, shuffle=False)
    dl.set_position(0, 2)
    batches = [np.asarray(b).tolist() for b in dl]
    assert batches == [[4, 5], [6, 7]]
    assert sorted(touched) == [4, 5, 6, 7]


def test_collate_python_bools_stay_bool():
    """bool is an int subclass: the int branch must not swallow Python
    bools into int64 (dtype-keyed consumers — jit caches, mask logic —
    would see int64 where bool was intended)."""
    from dfd_clip_tpu.data.loader import default_collate

    out = default_collate([True, False, True])
    assert out.dtype == np.bool_
    out = default_collate([1, 0, 2])
    assert out.dtype == np.int64


def test_prefetch_iter_producer_exits_on_early_consumer_exit():
    """utils.device.prefetch_iter: if the consumer leaves early while the
    bounded queue is full, the producer's pending puts (items AND the
    done/err sentinels) must observe stop and the thread must exit — not
    block forever pinning device-placed batches."""
    import threading

    from dfd_clip_tpu.utils.device import prefetch_iter

    threads_before = {t.ident for t in threading.enumerate()}
    it = prefetch_iter(iter(range(10)), lambda x: x, lookahead=1)
    assert next(it) == 0
    it.close()  # consumer gone; producer likely blocked mid-put
    leftover = [t for t in threading.enumerate()
                if t.ident not in threads_before and t.is_alive()]
    for t in leftover:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in leftover)


def test_ffpp_sample_content_is_stream_position_pure(ffpp_root, use_opencv_backend):
    """Sample content must be a pure function of (seed, epoch, idx) — NOT of
    fetch history or worker interleaving (datasets._SampleRNGMixin). The
    reference's global-RNG draws make sample pixels depend on everything
    fetched before (src/datasets.py:304-333); that breaks bit-exact
    checkpoint resume (tests/test_requeue.py) and multi-worker determinism."""
    cfg = ffpp_config(ffpp_root, types=["REAL", "DF"], compressions=["raw"])
    cfg.random_speed = 1
    cfg.augmentation = "normal"

    def fetch(order, epoch=0):
        ds = FFPP(cfg, 4, 2, split="train", seed=0)
        ds.set_epoch(epoch)
        out = {}
        for idx in order:
            r = ds.get_dict(idx, block=True)
            out[idx] = (r["frames"]["raw"].copy(), r["speed"])
        return out

    a = fetch([14, 2, 7])
    b = fetch([2, 7, 14])          # different history, same epoch
    for idx in a:
        np.testing.assert_array_equal(a[idx][0], b[idx][0])
        assert a[idx][1] == b[idx][1]

    c = fetch([14], epoch=1)        # a new epoch redraws
    assert (c[14][1] != a[14][1]) or not np.array_equal(c[14][0], a[14][0])


def test_loader_threaded_deterministic_with_random_speed(ffpp_root, use_opencv_backend):
    """num_workers>0 yields bit-identical batches to num_workers=0 even with
    per-sample randomness active — thread interleaving cannot reorder draws
    because there is no shared RNG stream to reorder."""
    cfg = ffpp_config(ffpp_root, types=["REAL", "DF"], compressions=["raw"])
    cfg.random_speed = 1
    cfg.augmentation = "normal"

    def run(num_workers):
        ds = FFPP(cfg, 4, 2, split="train", seed=0)
        dl = DataLoader(ds, batch_size=4, shuffle=True,
                        num_workers=num_workers, collate_fn=ds.collate_fn)
        return [(np.asarray(batch[0]), np.asarray(batch[4])) for batch in dl]

    sync, thr = run(0), run(3)
    assert len(sync) == len(thr)
    for (fs, ss), (ft, st) in zip(sync, thr):
        np.testing.assert_array_equal(fs, ft)
        np.testing.assert_array_equal(ss, st)
