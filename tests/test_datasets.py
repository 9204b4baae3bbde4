"""Dataset & sampling tests: pool bucketing, proposal-type layout, SSN segment
index math (ssn_dataset.py:318-345 oracle), test-plan geometry, transforms,
and the synthetic pipeline."""

import numpy as np
import pytest

from action_detection_tpu.config import SamplingConfig
from action_detection_tpu.data.ssn_dataset import SSNDataset, SSNInstance, FG, INCOMPLETE, BG
from action_detection_tpu.data.binary_dataset import BinaryDataset
from action_detection_tpu.data.pipeline import (
    SyntheticFrameProvider, assemble_train_batch, make_test_transform,
    iter_test_frame_batches,
)
from action_detection_tpu.data.transforms import (
    GroupMultiScaleCrop, GroupOverSample, GroupScale, GroupCenterCrop,
    GroupRandomHorizontalFlip, Stack, Compose, get_train_augmentation,
    normalize_stack,
)


def write_proposal_list(path, n_videos=3, frames_per_video=600, seed=0):
    """Synthetic denormalized proposal list with fg/incomplete/bg proposals."""
    rng = np.random.RandomState(seed)
    lines = []
    for v in range(n_videos):
        vid = f"video_{v}"
        gt = [(1 + v % 3, 100, 300), (1 + (v + 1) % 3, 400, 520)]
        props = []
        # fg: high IoU with GT
        props += [(g[0], 0.85, 0.9, g[1] - 20, g[2] + 5) for g in gt]
        props += [(g[0], 0.75, 0.95, g[1] + 5, g[2] - 15) for g in gt]
        # incomplete: low IoU but high self-overlap
        props += [(g[0], 0.2, 0.9, g[1] + 30, g[1] + 110) for g in gt]
        props += [(g[0], 0.15, 0.85, g[1] + 50, g[1] + 130) for g in gt]
        # background: near-zero IoU, decent coverage
        props += [(0, 0.0, 0.0, 530, 595), (0, 0.005, 0.0, 10, 90)]
        lines.append(f"# {v}\n{vid}\n{frames_per_video}\n1\n{len(gt)}\n")
        for g in gt:
            lines.append(f"{g[0]} {g[1]} {g[2]}\n")
        lines.append(f"{len(props)}\n")
        for p in props:
            lines.append(f"{p[0]} {p[1]:.4f} {p[2]:.4f} {p[3]} {p[4]}\n")
    with open(path, "w") as f:
        f.writelines(lines)
    return str(path)


@pytest.fixture
def prop_file(tmp_path):
    return write_proposal_list(tmp_path / "props.txt")


def test_pools_and_stats(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig())
    # per video: 4 fg props + 2 gt, 4 incomplete, 2 bg
    assert len(ds.fg_pool) == 3 * 6
    assert len(ds.incomp_pool) == 3 * 4
    assert len(ds.bg_pool) == 3 * 2
    assert ds.stats.shape == (2, 2)
    assert np.all(ds.stats[1] > 0)


def test_training_sample_layout(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig())
    rng = np.random.RandomState(0)
    s = ds.get_training_sample(0, rng)
    assert s.frame_indices.shape == (8, 9)
    # layout [1 fg | 6 incomplete | 1 bg]
    assert list(s.prop_type) == [FG] + [INCOMPLETE] * 6 + [BG]
    assert s.labels[0] > 0            # fg carries its class
    assert s.labels[-1] == 0          # bg label 0
    assert np.all(s.labels[1:7] > 0)  # incomplete carry fg labels
    # only fg rows have (normalized) regression targets
    assert np.any(s.reg_targets[0] != 0)
    assert np.all(s.reg_targets[1:] == 0)
    # frame indices are valid 1-based frame numbers
    assert s.frame_indices.min() >= 1
    assert s.frame_indices.max() <= 600


def oracle_ssn_indices(prop_start, prop_end, frame_cnt, aug_seg, body_seg,
                       new_length=1):
    """Deterministic-path oracle for segment index math (reference formulas)."""
    start_frame = prop_start + 1
    end_frame = prop_end
    duration = end_frame - start_frame + 1
    valid_length = duration - new_length
    valid_starting = max(1, start_frame - int(duration * 0.5))
    valid_ending = min(frame_cnt - new_length + 1, end_frame + int(duration * 0.5))
    valid_starting_length = start_frame - valid_starting - new_length + 1
    valid_ending_length = valid_ending - end_frame - new_length + 1
    starting_scale = (valid_starting_length + new_length - 1) / (duration * 0.5)
    ending_scale = (valid_ending_length + new_length - 1) / (duration * 0.5)

    def val_indices(valid_len, num_seg):
        if valid_len > num_seg:
            tick = valid_len / float(num_seg)
            return np.array([int(tick / 2.0 + tick * x) for x in range(num_seg)])
        return np.zeros((num_seg,))

    starting = val_indices(valid_starting_length, aug_seg) + valid_starting
    course = val_indices(valid_length, body_seg) + start_frame
    ending = val_indices(valid_ending_length, aug_seg) + end_frame
    return (np.concatenate([starting, course, ending]).astype(np.int64),
            starting_scale, ending_scale)


@pytest.mark.parametrize("span", [(100, 300), (0, 599), (10, 25), (590, 599)])
def test_sample_ssn_indices_deterministic_matches_oracle(prop_file, span):
    ds = SSNDataset(prop_file, SamplingConfig())
    prop = SSNInstance(span[0], span[1], 600, best_iou=0.9, label=1)
    offsets, s_scale, e_scale, split = ds.sample_ssn_indices(prop, 600, rng=None)
    o_off, o_s, o_e = oracle_ssn_indices(span[0], span[1], 600, 2, 5)
    np.testing.assert_array_equal(offsets, o_off)
    assert abs(s_scale - o_s) < 1e-9 and abs(e_scale - o_e) < 1e-9
    assert split == (2, 7, 9)


def test_sample_ssn_indices_random_bounds(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig())
    rng = np.random.RandomState(1)
    prop = SSNInstance(100, 300, 600, best_iou=0.9, label=1)
    for _ in range(50):
        offsets, s_scale, e_scale, _ = ds.sample_ssn_indices(prop, 600, rng)
        assert offsets.min() >= 1 and offsets.max() <= 600
        # course segments stay within [start+1, end]
        assert offsets[2:7].min() >= 101 and offsets[2:7].max() <= 300
        assert 0 <= s_scale <= 1.0001 and 0 <= e_scale <= 1.0001


def test_test_sample_geometry(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig(), test_interval=6)
    t = ds.get_test_sample(0)
    frame_cnt = 600
    n_ticks = len(np.arange(0, frame_cnt - 1, 6))
    assert len(t.frame_ticks) == n_ticks
    assert t.frame_ticks[0] == 1
    assert t.prop_ticks.shape[1] == 4
    # ticks are monotone and within [0, n_ticks]
    assert np.all(np.diff(t.prop_ticks, axis=1) >= 0)
    assert t.prop_ticks.min() >= 0 and t.prop_ticks.max() <= n_ticks
    assert np.all(t.prop_scaling >= 0) and np.all(t.prop_scaling <= 1.0)
    # rel props are fractions
    assert t.rel_props.min() >= 0 and t.rel_props.max() <= 1.0


def test_get_all_gt(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig())
    gt = ds.get_all_gt()
    assert len(gt) == 6
    vid, label, rs, re = gt[0]
    assert label >= 0 and 0 <= rs < re <= 1.0


def test_binary_dataset(prop_file):
    ds = BinaryDataset(prop_file)
    assert ds.fg_per_video == 3 and ds.bg_per_video == 9
    rng = np.random.RandomState(0)
    s = ds.get_training_sample(0, rng)
    assert s.frame_indices.shape == (12, 5)
    assert list(s.labels) == [1] * 3 + [0] * 9
    t = ds.get_test_sample(1)
    assert t.frame_ticks[0] == 1 and t.num_frames == 600


# ---------- transforms ----------


def _color_group(n=3, w=340, h=256):
    from PIL import Image

    rng = np.random.RandomState(0)
    return [Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8), "RGB")
            for _ in range(n)]


def test_multi_scale_crop_shared_randomness():
    group = _color_group(4)
    t = GroupMultiScaleCrop(224)
    out = t(group, np.random.RandomState(3))
    assert all(img.size == (224, 224) for img in out)
    # same rng seed -> same crop; all group members share the crop window
    out2 = t(group, np.random.RandomState(3))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(out2[1]))


def test_oversample_produces_10_crops():
    group = _color_group(2)
    t = GroupOverSample(224, 256)
    out = t(group)
    assert len(out) == 10 * 2
    assert all(img.size == (224, 224) for img in out)
    # crop 0 flipped equals crop group 2 (the flip group of offset 0)
    a = np.asarray(out[0])[:, ::-1]
    b = np.asarray(out[2])
    np.testing.assert_array_equal(a, b)


def test_flip_inverts_flow_x():
    from PIL import Image

    x = Image.fromarray(np.full((8, 8), 10, dtype=np.uint8), "L")
    y = Image.fromarray(np.full((8, 8), 200, dtype=np.uint8), "L")
    t = GroupRandomHorizontalFlip(is_flow=True)
    # find a seed that flips
    for seed in range(20):
        out = t([x, y], np.random.RandomState(seed))
        if np.asarray(out[0])[0, 0] != 10:
            assert np.asarray(out[0])[0, 0] == 245   # inverted flow-x
            assert np.asarray(out[1])[0, 0] == 200   # flow-y not inverted
            break
    else:
        raise AssertionError("flip never triggered in 20 seeds")


def test_stack_and_normalize_bgr():
    import jax.numpy as jnp

    group = _color_group(2, w=8, h=8)
    stacked = Stack()(group)
    assert stacked.shape == (8, 8, 6) and stacked.dtype == np.uint8

    out = normalize_stack(jnp.asarray(stacked), mean=(104.0, 117.0, 128.0),
                          std=(1.0,), bgr=True)
    ref = stacked.astype(np.float32).reshape(8, 8, 2, 3)[..., ::-1].reshape(8, 8, 6)
    ref = ref - np.array([104, 117, 128, 104, 117, 128], np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_scale_and_center_crop():
    group = _color_group(1, w=400, h=300)
    out = Compose([GroupScale(256), GroupCenterCrop(224)])(group)
    assert out[0].size == (224, 224)


def test_crop_tuple_size_is_height_width():
    """Tuple sizes follow the torchvision/reference (h, w) convention
    (reference transforms.py:27 'th, tw = self.size')."""
    from action_detection_tpu.data.transforms import GroupRandomCrop

    group = _color_group(1, w=400, h=300)
    out = GroupCenterCrop((100, 50))(group)
    assert out[0].size == (50, 100)          # PIL size is (w, h)
    out = GroupRandomCrop((100, 50))(group, np.random.RandomState(0))
    assert out[0].size == (50, 100)


# ---------- pipeline ----------


def test_prefetch_loader_propagates_batch_errors():
    """A failing batch (e.g. corrupt frame file) must raise on the consumer,
    not kill the producer thread and hang the epoch loop forever."""
    import pytest

    from action_detection_tpu.data.pipeline import PrefetchLoader

    def make_batch(i):
        if i == 1:
            raise ValueError("decode failed")
        return {"i": np.asarray(i)}

    loader = PrefetchLoader(make_batch, num_batches=4, prefetch=1,
                            num_threads=1)
    with pytest.raises(ValueError, match="decode failed"):
        for _ in loader:
            pass


def test_assemble_train_batch_shapes(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig())
    provider = SyntheticFrameProvider(width=120, height=96)
    aug = get_train_augmentation(64, "RGB")
    rng = np.random.RandomState(0)
    batch = assemble_train_batch(ds, [0, 1], provider, aug, rng)
    assert batch["frames"].shape == (16, 9, 64, 64, 3)
    assert batch["frames"].dtype == np.uint8
    assert batch["scaling"].shape == (16, 2)
    assert batch["labels"].shape == (16,)
    assert batch["prop_type"].shape == (16,)
    assert list(batch["prop_type"][:8]) == [0] + [1] * 6 + [2]


def test_iter_test_frame_batches(prop_file):
    ds = SSNDataset(prop_file, SamplingConfig(), test_interval=60)
    provider = SyntheticFrameProvider(width=120, height=96)
    t = ds.get_test_sample(0)
    transform = make_test_transform(64, 64 * 256 // 224, 10)
    chunks = list(iter_test_frame_batches(provider, t.video_id, t.frame_ticks,
                                          t.num_frames, transform,
                                          batch_ticks=4))
    total = sum(c.shape[0] for c in chunks)
    assert total == 10 * len(t.frame_ticks)
    assert chunks[0].shape[1:] == (64, 64, 3)
    assert chunks[0].dtype == np.uint8


def test_rgb_diff_transform():
    import jax.numpy as jnp
    from action_detection_tpu.data.transforms import rgb_diff

    rng = np.random.RandomState(0)
    L = 5
    frames = rng.randn(2, 4, 4, 3 * (L + 1)).astype(np.float32)
    out = np.asarray(rgb_diff(jnp.asarray(frames), L))
    assert out.shape == (2, 4, 4, 3 * L)
    x = frames.reshape(2, 4, 4, L + 1, 3)
    np.testing.assert_allclose(out.reshape(2, 4, 4, L, 3),
                               x[..., 1:, :] - x[..., :-1, :], atol=1e-6)
    kept = np.asarray(rgb_diff(jnp.asarray(frames), L, keep_rgb=True))
    assert kept.shape == frames.shape
    np.testing.assert_allclose(kept.reshape(2, 4, 4, L + 1, 3)[..., 0, :],
                               x[..., 0, :], atol=1e-6)


def test_group_random_sized_crop():
    from action_detection_tpu.data.transforms import GroupRandomSizedCrop

    group = _color_group(3, w=100, h=80)
    out = GroupRandomSizedCrop(64)(group, np.random.RandomState(0))
    assert len(out) == 3
    assert all(img.size == (64, 64) for img in out)
    # shared crop window across the group
    a = np.asarray(out[0])
    b = GroupRandomSizedCrop(64)(group, np.random.RandomState(0))[0]
    np.testing.assert_array_equal(a, np.asarray(b))


def test_binary_sampler_stage_semantics(prop_file):
    """Binary course sampling: one frame per rounded proposal stage
    (load_binary_score.py:178-195)."""
    from action_detection_tpu.data.ssn_dataset import SSNInstance

    ds = BinaryDataset(prop_file)
    prop = SSNInstance(100, 300, 600, best_iou=0.9, label=1)
    rng = np.random.RandomState(0)
    for _ in range(20):
        idx = ds._sample_course_indices(prop, 600, rng)
        assert idx.shape == (5,)
        # each index falls in its own rounded stage [round(i*d/5)+101, ...)
        duration = 300 - 101 + 1
        sd = duration / 5
        bounds = [int(np.round(i * sd)) + 101 for i in range(6)]
        for i in range(5):
            assert bounds[i] <= idx[i] < max(bounds[i + 1], bounds[i] + 1), (
                idx, bounds)
    # tiny proposal: falls back to randint over the span
    tiny = SSNInstance(10, 13, 600, best_iou=0.9, label=1)
    idx = ds._sample_course_indices(tiny, 600, rng)
    assert idx.shape == (5,) and idx.min() >= 11 and idx.max() <= 14


def test_pipeline_determinism(prop_file):
    """Same seed -> bit-identical sampled batches (reproducible training)."""
    ds = SSNDataset(prop_file, SamplingConfig())
    provider = SyntheticFrameProvider(width=48, height=40)
    aug = get_train_augmentation(32, "RGB")
    b1 = assemble_train_batch(ds, [0, 1], provider, aug, np.random.RandomState(7))
    b2 = assemble_train_batch(ds, [0, 1], provider, aug, np.random.RandomState(7))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])
    # and a different seed actually changes the pixels
    b3 = assemble_train_batch(ds, [0, 1], provider, aug, np.random.RandomState(8))
    assert not np.array_equal(b1["frames"], b3["frames"])


class _StubTestSample:
    def __init__(self, video_id, ticks, num_frames):
        self.video_id = video_id
        self.frame_ticks = np.asarray(ticks, np.int64)
        self.num_frames = num_frames


class _StubDataset:
    """video_list/get_test_sample shim for collect_calibration_frames."""

    def __init__(self, tick_counts):
        self.video_list = list(range(len(tick_counts)))
        self._ticks = [np.arange(n, dtype=np.int64) + 1 for n in tick_counts]

    def get_test_sample(self, i):
        return _StubTestSample(f"v{i}", self._ticks[i], 64)


def test_collect_calibration_frames_skips_empty_and_backfills():
    """Zero-tick videos are replaced by later non-empty ones, not dropped."""
    from action_detection_tpu.data.pipeline import (
        collect_calibration_frames, make_test_transform)

    provider = SyntheticFrameProvider(width=48, height=40)
    transform = make_test_transform(32, 36, 1)
    # 10 videos; the linspace spread over 8 would hit indices 0..9 minus two,
    # and 6 of the first 8 candidates are empty -> backfill must kick in
    ds = _StubDataset([0, 0, 3, 0, 0, 2, 0, 0, 1, 4])
    out = collect_calibration_frames(ds, provider, transform, new_length=1)
    assert out is not None
    # 4 non-empty videos exist, each contributes its batch_ticks=1 first tick
    assert out.shape[0] == 4 and out.dtype == np.uint8

    # every video empty -> None (callers fall back to lazy/no calibration)
    assert collect_calibration_frames(
        _StubDataset([0, 0, 0]), provider, transform, new_length=1) is None

    # plenty of non-empty videos: still capped at max_videos
    many = _StubDataset([2] * 20)
    out = collect_calibration_frames(many, provider, transform, new_length=1)
    assert out.shape[0] == 8
